package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (§2.12): the reference's incremental
  * batch-with-watermark semantics (`HFDatasetManager.py:214-233`) mapped to
  * a real streaming pipeline — file source → event-time watermark →
  * tumbling-window aggregation, with `foreachBatch` feeding the versioned
  * MERGE for the load path.
  *
  * The batch-mode twin of `hourlyCounts` is `queries.Temporal.hourlyWindow`
  * (same grouping, same outputs) — streaming and batch share semantics by
  * construction.
  */
object EventStreams {

  /** Declared fallback schema for an events dir with no parquet yet —
    * the micros-NTZ encoding of the two known generator vintages (the
    * normalization below maps either to session-TZ TIMESTAMP anyway). */
  private val declaredEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based stream over a directory of events parquet. Streaming
    * sources need the schema up front, and the event files have shipped
    * with two physical ts encodings (TIMESTAMP(NANOS) → nanos-as-long,
    * TIMESTAMP(MICROS) → NTZ), so the schema comes from a footer-only
    * static read of whatever is already in `dir`, then ts is normalized
    * to a session-TZ TIMESTAMP exactly like the batch reader
    * ([[graft.Tables]]) — stream and batch see one type by construction.
    * An EMPTY (or not-yet-created) source dir can't be sniffed — there
    * the declared micros-NTZ schema applies, so a stream can start
    * BEFORE its first file arrives (the production deploy order). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException =>
        declaredEventSchema
      }
    val df = spark.readStream.schema(physical).parquet(dir)
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Stream-stream interval join: each purchase attributed to the views
    * the same user made in the preceding 30 minutes — the
    * impression↔conversion correlation every event pipeline runs. Both
    * sides carry a 2-hour watermark and the join condition bounds
    * purchase_ts to [view_ts, view_ts + 30 min], which is exactly what
    * Structured Streaming needs to EVICT state: a buffered view older
    * than watermark + 30 min can never match again and is dropped, so
    * state is proportional to the window, not the stream
    * (StreamJoinSpec pins stream == batch and the state bound). The
    * same code path runs on batch frames (watermark is a no-op there) —
    * q_event_attribution grades it against the DuckDB interval join. */
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    v.join(p, expr(
        """user_id = p_user_id AND
          |purchase_ts >= view_ts AND
          |purchase_ts <= view_ts + interval 30 minutes""".stripMargin))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        expr("unix_micros(view_ts) div 1000").as("view_ms"),
        expr("unix_micros(purchase_ts) div 1000").as("purchase_ms"),
        col("value"))
  }

  /** Tumbling 1-hour counts per event type with a 2-hour watermark: late
    * events inside the watermark still land in their window; beyond it
    * they are dropped — the streaming analogue of the reference's
    * `last_modified` cutoff. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a bounded micro-batch pass over whatever is in `dir` and return
    * the aggregated result via an in-memory sink (used by tests; a
    * production deployment would use a durable sink + checkpoint). */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    // complete mode: append would hold back windows newer than the
    // watermark, which never advances past a bounded directory's max
    val q = hourlyCounts(readEvents(spark, dir))
      .writeStream.outputMode("complete").format("memory")
      .queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
