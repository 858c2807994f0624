package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed running total WITHOUT a per-key window — the scale-out form of
  * `SUM(value) OVER (PARTITION BY key ORDER BY order...)`. A per-key
  * window puts one key = one reducer partition: at corpus scale a single
  * key (a source, a language) is terabytes, and that reducer sorts it
  * alone (the single-partition trap chunkPack's scaladoc documents).
  * Instead:
  *
  *   1. range-partition on (key, order...) — ordered runs of each key
  *      span consecutive partitions, each bounded by partition size;
  *   2. partition-local cumsum keyed on (pid, key) — groups are at most
  *      one partition's rows, never a whole key;
  *   3. ONE bounded collect of per-(pid, key) totals (≤ partitions ×
  *      |keys| rows; keys are config-scale) builds the broadcast offset
  *      table that lifts local sums to global ones.
  *
  * Semantics equal the naive window exactly (PackLawSpec proves it on
  * random inputs); the contract needs a total order, so `order` columns
  * must be unique per key (callers tiebreak with doc_id).
  */
object KeyedCumsum {

  /** Adds `out` = running total of `value` within `key`, ordered by
    * `order`. Input columns pass through; `value` must be LONG-castable.
    * The returned frame is localCheckpoint-ed (the offset collect has
    * already materialized it). */
  def apply(s: SparkSession, df: DataFrame, key: String,
            order: Seq[String], value: String, out: String): DataFrame = {
    require(df.schema(key).dataType == org.apache.spark.sql.types.StringType,
      s"KeyedCumsum: key '$key' must be a string column " +
        "(the offset-table rebuild reads it as one); cast or stringify first")
    val w = Window.partitionBy(col("pid"), col(key))
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // checkpoint pins ONE spark_partition_id assignment for both consumers
    val local = df
      .repartitionByRange(col(key) +: order.map(col): _*)
      .withColumn("pid", spark_partition_id())
      .withColumn("local_cum", sum(col(value).cast("long")).over(w))
      .localCheckpoint()
    val totals = local.groupBy("pid", key)
      .agg(max(col("local_cum")).as("total"))
      .orderBy(col(key), col("pid")).collect() // bounded: partitions x keys
    var curKey: String = null
    var acc = 0L
    val offsets = totals.map { r =>
      if (r.getString(1) != curKey) { curKey = r.getString(1); acc = 0L }
      val off = acc; acc += r.getLong(2)
      (r.getInt(0), r.getString(1), off)
    }.toSeq
    val offDf = s.createDataFrame(offsets).toDF("pid", key, "offset")
    local.join(broadcast(offDf), Seq("pid", key))
      .withColumn(out, col("local_cum") + col("offset"))
      .drop("pid", "local_cum", "offset")
  }
}
