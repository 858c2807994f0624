package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that break at 100 TB:
  *
  *  - `saltedJoin`: equi-join under heavy key skew. The skewed (large) side
  *    gets a random-but-deterministic salt derived from a uniform row id;
  *    the small-but-skew-matching side is replicated across all salt
  *    values. The shuffle then spreads each hot key over `saltFactor`
  *    reducers. Semantics are identical to a plain inner join.
  *
  *  - `bucketedTables`: co-located joins via bucketBy — both tables
  *    pre-hashed into the same bucket count on the join key, so the join
  *    plans with zero shuffle exchanges (the physical contract is pinned
  *    in ScaleJoinsSpec).
  *
  * AQE's skew-join splitting handles moderate skew automatically; salting
  * is for the pathological keys AQE cannot split (a single key larger than
  * an executor's memory).
  */
object ScaleJoins {

  /** Inner equi-join with the left (large, skewed) side salted.
    *
    * @param saltFactor number of shards per key; hot keys spread this wide
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    // deterministic salt: stable hash of the whole row spread over shards
    // (monotonically_increasing_id is partition-stable but not retry-safe;
    // a content hash is)
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(saltFactor)))
    val exploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed on the join key into the session catalog;
    * returns the (left, right) table names to join shuffle-free. */
  def bucketedTables(left: DataFrame, leftKey: String,
                     right: DataFrame, rightKey: String,
                     buckets: Int, prefix: String): (String, String) = {
    val lName = s"${prefix}_l"
    val rName = s"${prefix}_r"
    left.write.mode("overwrite").bucketBy(buckets, leftKey)
      .sortBy(leftKey).format("parquet").saveAsTable(lName)
    right.write.mode("overwrite").bucketBy(buckets, rightKey)
      .sortBy(rightKey).format("parquet").saveAsTable(rName)
    (lName, rName)
  }
}
