package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed as-of join (point-in-time lookup): for each left row, attach
  * the most recent right row with `right.ts <= left.ts` within the same key.
  *
  * Implementation is the union-and-carry-forward pattern rather than a
  * per-key collect or a range cross-join: tag both inputs, union them, and
  * run one window pass per key ordered by time, carrying the latest right
  * payload forward with `last(_, ignoreNulls = true)`. Cost is a single
  * shuffle on the key (same as any keyed join) plus a sort within
  * partitions — no blow-up, no driver-side state, so it scales linearly
  * and survives skewed keys as well as a sort-merge join does.
  *
  * Tie rule: a right row at exactly left.ts matches (inclusive), encoded by
  * sorting right-tagged rows before left-tagged rows at equal timestamps.
  */
object AsOfJoin {

  /** @param left       probe side (keeps all its columns)
    * @param right      reference side; `payload` columns are attached
    * @param key        equality key column name present on both sides
    * @param ts         event-time column name present on both sides
    * @param payload    right-side columns to carry onto matching left rows
    * @param inner      drop left rows with no preceding right row (ASOF JOIN
    *                   default); false = left outer semantics
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // The payload is carried as ONE struct column: last(ignoreNulls) over a
    // struct preserves row atomicity (an independent last() per column would
    // stitch together values from different right rows whenever a payload
    // field is null), and match-existence is the struct's own null-ness.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val tagged =
      left.select(Seq(col(key), col(ts), lit(1).as("__is_left")) ++
          leftCols.filterNot(Set(key, ts)).map(col) :+
          lit(null).cast(payloadType).as("__r"): _*)
        .unionByName(
          right.select(Seq(col(key), col(ts), lit(0).as("__is_left")) ++
            leftCols.filterNot(Set(key, ts)).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
            struct(payload.map(col): _*).as("__r"): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val matched = carried.filter(col("__is_left") === 1)
    val res =
      if (inner) matched.filter(col("__m").isNotNull)
      else matched
    res.select(leftCols.map(col) ++
      payload.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Convenience overload with distinct left/right column names resolved by
    * caller-supplied expressions. */
  def asOfExpr(left: DataFrame, right: DataFrame, key: String,
               leftTs: Column, rightTs: Column, payload: Seq[String]): DataFrame =
    asOf(left.withColumn("__ts", leftTs), right.withColumn("__ts", rightTs),
      key, "__ts", payload).drop("__ts")
}
