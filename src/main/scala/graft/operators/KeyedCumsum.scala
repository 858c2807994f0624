package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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
  * Semantics equal the naive window exactly (ChunkPackLawSpec proves it
  * on random inputs, negative values and null keys included). Contract:
  * `order` columns must be unique per key (callers tiebreak with
  * doc_id), and `value` must be NON-NULL — a window sum emits null until
  * a group's first non-null value, which a partition-local sum cannot
  * reproduce; coalesce first.
  */
object KeyedCumsum {

  /** Default ceiling on distinct keys. The offset collect is partitions ×
    * |keys| rows; the contract is config-scale keys (sources, languages) —
    * a caller keying by doc_id would otherwise collect the corpus. */
  val DefaultMaxKeys = 10000

  private val Internal = Seq("__kc_pid", "__kc_pid2", "__kc_k", "__kc_cum", "__kc_off")

  /** Adds `out` = running total of `value` within `key`, ordered by
    * `order`. Input columns pass through (null keys form their own group,
    * like the window). `value` must be LONG-castable and non-null. The
    * intermediate cumsum is localCheckpoint-ed (materialized by the
    * offset collect); the returned frame is a lazy broadcast-join over
    * it — cache/checkpoint it yourself if you act on it repeatedly.
    *
    * `maxKeys` enforces the key-cardinality contract: the offset collect
    * is hard-capped at maxKeys × partitions rows (a `limit`, so a
    * violating job can never materialize an unbounded array on the
    * driver) and the exact distinct-key count is re-checked from the
    * collected rows — misuse fails loudly instead of OOMing. */
  def apply(s: SparkSession, df: DataFrame, key: String,
            order: Seq[String], value: String, out: String,
            maxKeys: Int = DefaultMaxKeys): DataFrame = {
    require(df.schema(key).dataType == StringType,
      s"KeyedCumsum: key '$key' must be a string column " +
        "(the offset-table rebuild reads it as one); cast or stringify first")
    require(!Internal.exists(df.columns.contains),
      s"KeyedCumsum: input must not contain reserved columns ${Internal.mkString(", ")}")
    val w = Window.partitionBy(col("__kc_pid"), col(key))
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // checkpoint pins ONE spark_partition_id assignment for both consumers
    val local = df
      .repartitionByRange(col(key) +: order.map(col): _*)
      .withColumn("__kc_pid", spark_partition_id())
      .withColumn("__kc_cum", sum(col(value).cast("long")).over(w))
      .localCheckpoint()
    // group total = SUM of the group's values — NOT max of the running
    // sum, which diverges as soon as values can be negative (the running
    // max is not the final sum then)
    // bounded collect: ≤ maxKeys × partitions rows survive the limit even
    // when a caller violates the contract — the guard below then fails
    // loudly without the driver ever holding an unbounded result
    val maxRows = maxKeys.toLong * math.max(1, local.rdd.getNumPartitions)
    val collectCap = math.min(maxRows, Int.MaxValue.toLong - 1).toInt
    val totals = local.groupBy("__kc_pid", key)
      .agg(sum(col(value).cast("long")).as("total"))
      .orderBy(col(key).asc_nulls_first, col("__kc_pid"))
      .limit(collectCap + 1)
      .collect() // bounded: partitions x keys, hard-capped by the limit
    require(totals.length <= collectCap, s"KeyedCumsum: offset collect " +
      s"exceeded $collectCap rows — key '$key' breaks the config-scale " +
      "key contract (pass a higher maxKeys only if the cardinality is " +
      "genuinely bounded)")
    val distinctKeys = totals.iterator.map(r =>
      if (r.isNullAt(1)) null else r.getString(1)).toSet.size
    require(distinctKeys <= maxKeys, s"KeyedCumsum: key '$key' has " +
      s"$distinctKeys distinct values (maxKeys=$maxKeys) — a per-document " +
      "key would collect the corpus; use a window or raise maxKeys for a " +
      "genuinely bounded key")
    var curKey: String = null
    var started = false
    var acc = 0L
    val offsets = totals.map { r =>
      val k = r.getString(1)
      if (!started || k != curKey) { started = true; curKey = k; acc = 0L }
      val off = acc
      acc += (if (r.isNullAt(2)) 0L else r.getLong(2))
      (r.getInt(0), k, off)
    }.toSeq
    val offDf = s.createDataFrame(offsets)
      .toDF("__kc_pid2", "__kc_k", "__kc_off")
    // null-safe key equality: null-key rows keep their group instead of
    // silently dropping out of the equi-join
    local.join(broadcast(offDf),
        col("__kc_pid") === col("__kc_pid2") && col(key) <=> col("__kc_k"))
      .withColumn(out, col("__kc_cum") + col("__kc_off"))
      .drop(Internal: _*)
  }
}
