package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.Tables.{dec2, epochMs}
import graft.operators.AsOfJoin

/** Temporal / windowed operator surface: keep-last dedup (A2), argmax per
  * group (A7 statement disambiguation), running aggregates, chunk packing
  * (A12), SCD-2 validity-range derivation (V3 `GraphHandler.py:635-714`),
  * as-of join, incremental watermark (P5/§2.12), and tumbling-window aggs.
  *
  * All window specs partition by the natural key — one shuffle per query,
  * partition-local sorts, no driver state: the same plan works at 100 TB.
  */
object Temporal {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Keep-last dedup (A2, `HFExtractor.py:117-131`): latest event per user
    * with an explicit total order — `dropDuplicates` alone would be
    * nondeterministic. */
  def dedupKeepLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), epochMs("ts").as("last_ms"))
  }

  val dedupKeepLastSql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  epoch_ms(ts) AS last_ms
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** Argmax per group (A7 — statement disambiguation by max (confidence,
    * time), `MlentoryTransformWithGraphBuilder.py:371-516`). */
  def argmaxPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("event_id").as("winner_id"), col("value"))
  }

  val argmaxPerGroupSql: String =
    """SELECT event_type, event_id AS winner_id, value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY value DESC, ts DESC, event_id DESC) = 1""".stripMargin

  /** Running per-key sum (prefix aggregation over event time). */
  def runningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("user_id"),
        sum(dec2(col("value"))).over(w).cast("double").as("run_sum"))
  }

  val runningSumSql: String =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
      |FROM events WHERE user_id < 20""".stripMargin

  /** Partition-local stage of [[chunkPack]], exposed for the plan test:
    * range-partition by doc_id, then a cumulative sum keyed on the physical
    * partition id — every exchange is multi-partition. */
  private[graft] def chunkPackLocalOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("n_chars"))
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("local_cum", sum(col("n_chars")).over(w))
  }

  private[graft] def chunkPackLocal(s: SparkSession, dir: String): DataFrame =
    chunkPackLocalOf(t(s, dir, "documents"))

  /** Chunk packing (A12, `LoadProcessor.py:227-256`): running size in a
    * total order → floor-div bucket id.
    *
    * Scale-safe two-level formulation (the reference's own semantics are a
    * driver loop, so the engine picks the distributed plan): partition-local
    * cumulative sums after a range partition on doc_id, then broadcast
    * per-partition offsets — prefix sums over one bounded collect of the
    * ≤numPartitions partition totals (same bounded-collect pattern as the
    * IVF fit). No global-order window, no single-partition exchange; output
    * is identical because cum depends only on the global doc_id order. */
  def chunkPack(s: SparkSession, dir: String): DataFrame =
    chunkPackOf(s, t(s, dir, "documents"))

  /** Input-parameterized body of [[chunkPack]] — the equivalence law
    * against the naive global-order window is property-tested over random
    * inputs (ChunkPackLawSpec). */
  private[graft] def chunkPackOf(s: SparkSession, docs: DataFrame): DataFrame = {
    // checkpoint pins ONE spark_partition_id assignment for both consumers
    val local = chunkPackLocalOf(docs).localCheckpoint()
    val totals = local.groupBy("pid").agg(max(col("local_cum")).as("total"))
      .orderBy("pid").collect()  // bounded: one row per partition
    var acc = 0L
    val offsets = totals.map { r =>
      val off = acc; acc += r.getLong(1); (r.getInt(0), off)
    }.toSeq
    local.join(broadcast(s.createDataFrame(offsets).toDF("pid", "offset")), "pid")
      .select(col("doc_id"), (col("local_cum") + col("offset")).as("cum"))
      .withColumn("chunk", floor((col("cum") - lit(1)) / 20000))
  }

  val chunkPackSql: String =
    """SELECT doc_id, cum, CAST(floor((cum - 1) / 20000) AS BIGINT) AS chunk FROM (
      |  SELECT doc_id, CAST(SUM(n_chars) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM documents)""".stripMargin

  /** SCD-2 validity ranges from an event log (V3 shape: use_start/use_end
    * per (key, attr) version, open range marked current). */
  def scd2Ranges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        epochMs("ts").as("use_start"),
        lead(epochMs("ts"), 1).over(w).as("next_ms"))
      .select(col("user_id"), col("event_type"), col("use_start"),
        coalesce(col("next_ms"), lit(253402300799000L)).as("use_end"),
        col("next_ms").isNull.as("is_current"))
  }

  val scd2RangesSql: String =
    """SELECT user_id, event_type, use_start,
      |  COALESCE(next_ms, 253402300799000) AS use_end,
      |  next_ms IS NULL AS is_current
      |FROM (
      |  SELECT user_id, event_type, epoch_ms(ts) AS use_start,
      |    lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS next_ms
      |  FROM events)""".stripMargin

  /** As-of join: each purchase matched to the user's latest preceding click.
    * Spark side uses the union+carry-forward operator (one shuffle). */
  def asOfJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    AsOfJoin.asOf(purchases, clicks, key = "user_id", ts = "ts",
        payload = Seq("click_id"))
      .select("purchase_id", "user_id", "click_id", "purchase_value")
  }

  val asOfJoinSql: String =
    """SELECT p.purchase_id, p.user_id, c.click_id, p.purchase_value
      |FROM (SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id, ts, event_id AS click_id
      |           FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Tumbling 1-hour window aggregation (§2.12 — the batch view of the
    * Structured Streaming query in graft.streaming). */
  def hourlyWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(expr("unix_micros(h) div 1000").as("hour_ms"),
        col("event_type"), col("n"), col("sum_value"))

  val hourlyWindowSql: String =
    """SELECT epoch_ms(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_ms,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Incremental watermark predicate (P5, `HFDatasetManager.py:267-269`):
    * rows newer than the max event time of a prior load window. */
  def watermarkIncrement(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cutoff = ev.filter(col("event_id") % 2 === 0)
      .agg(max(col("ts")).as("wm"))
    ev.join(broadcast(cutoff))
      .filter(col("ts") > col("wm") - expr("INTERVAL 1 DAY"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_recent"))
  }

  val watermarkIncrementSql: String =
    """SELECT event_type, COUNT(*) AS n_recent
      |FROM events
      |WHERE ts > (SELECT MAX(ts) FROM events WHERE event_id % 2 = 0) - INTERVAL 1 DAY
      |GROUP BY event_type""".stripMargin

  /** Global min/max extraction-time window (A8, `GraphHandler.py:764-769`). */
  def minmaxTime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(min(epochMs("ts")).as("min_ms"), max(epochMs("ts")).as("max_ms"),
        count(lit(1)).as("n"))

  val minmaxTimeSql: String =
    "SELECT MIN(epoch_ms(ts)) AS min_ms, MAX(epoch_ms(ts)) AS max_ms, COUNT(*) AS n FROM events"

  /** Z-order key derivation over the event stream: the morton code the
    * layout operator ([[graft.operators.ZOrder]]) clusters files by,
    * graded bit-exactly (the interleave is pure integer arithmetic in
    * both engines). user_id × hour-of-day is the canonical box-predicate
    * pair for this table. */
  def zorderQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("event_id"),
      graft.operators.ZOrder.morton(col("user_id"), hour(col("ts")).cast("long"))
        .as("zcode"))

  val zorderSql: String =
    s"""SELECT event_id,
       |  ${graft.operators.ZOrder.mortonSql("user_id", "CAST(hour(ts) AS BIGINT)")} AS zcode
       |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> zorderQ _,
    "q_dedup_keep_last" -> dedupKeepLast _,
    "q_argmax_per_group" -> argmaxPerGroup _,
    "q_running_sum" -> runningSum _,
    "q_chunk_pack" -> chunkPack _,
    "q_scd2_ranges" -> scd2Ranges _,
    "q_asof_join" -> asOfJoinQ _,
    "q_hourly_window" -> hourlyWindow _,
    "q_watermark_increment" -> watermarkIncrement _,
    "q_minmax_time" -> minmaxTime _)

  val oracles: Map[String, String] = Map(
    "q_zorder" -> zorderSql,
    "q_dedup_keep_last" -> dedupKeepLastSql,
    "q_argmax_per_group" -> argmaxPerGroupSql,
    "q_running_sum" -> runningSumSql,
    "q_chunk_pack" -> chunkPackSql,
    "q_scd2_ranges" -> scd2RangesSql,
    "q_asof_join" -> asOfJoinSql,
    "q_hourly_window" -> hourlyWindowSql,
    "q_watermark_increment" -> watermarkIncrementSql,
    "q_minmax_time" -> minmaxTimeSql)
}
