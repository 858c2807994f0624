package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class StreamJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("stream-stream attribution join equals the batch twin on the same files") {
    val dir = Files.createTempDirectory("events_ssjoin")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = EventStreams.readEvents(spark, dir.toString)
    val q = EventStreams.attributionJoin(
        stream.filter(col("event_type") === "view"),
        stream.filter(col("event_type") === "purchase"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_join").start()
    q.processAllAvailable()

    val ev = Tables(spark, TestSpark.sf0001, "events")
    val batch = EventStreams.attributionJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))

    val streamed = spark.table("attr_join")
    assert(streamed.count() > 0, "join must produce matches on the test data")
    assert(streamed.count() == batch.count())
    val mismatch = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    q.stop()
    assert(mismatch == 0, s"$mismatch rows differ between stream and batch")
  }

  test("the streaming plan is a symmetric hash join with watermarks on both sides") {
    val dir = Files.createTempDirectory("events_ssjoin_plan")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.readEvents(spark, dir.toString)
    val joined = EventStreams.attributionJoin(
      stream.filter(col("event_type") === "view"),
      stream.filter(col("event_type") === "purchase"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attr_join_plan").start()
    q.processAllAvailable()
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
    val physical = buf.toString("UTF-8")
    q.stop()
    // state-evicting streaming join, keyed on user, bounded by the interval
    assert(physical.contains("StreamingSymmetricHashJoin"), physical.take(500))
    assert(physical.toLowerCase.contains("watermark"))
  }

  test("join state is evicted, not unbounded (progress metrics)") {
    // two micro-batches: after the second, the watermark from batch 1
    // should have evicted views that can no longer match
    val dir = Files.createTempDirectory("events_ssjoin_state")
    val ev = Tables(spark, TestSpark.sf0001, "events").cache()
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    // file-stream sources list FLAT files: stage each half as one file
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, dir.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    stage(half1, "batch1")

    val stream = EventStreams.readEvents(spark, dir.toString)
    val q = EventStreams.attributionJoin(
        stream.filter(col("event_type") === "view"),
        stream.filter(col("event_type") === "purchase"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_join_state").start()
    q.processAllAvailable()
    stage(half2, "batch2")
    q.processAllAvailable()
    val state = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators)
      .getOrElse(Array.empty)
    q.stop()
    ev.unpersist()
    assert(state.nonEmpty, "no progress entry carried state metrics")
    // buffered state must stay at or below total input rows (eviction ran;
    // an unbounded buffer would hold every view + purchase forever AND
    // numRowsRemoved would stay 0 across watermark advances)
    val total = state.map(_.numRowsTotal).sum
    val removed = state.map(_.numRowsRemoved).sum
    val inputs = ev.filter(col("event_type").isin("view", "purchase")).count()
    assert(total <= inputs, s"state=$total inputs=$inputs")
    assert(removed > 0 || total < inputs,
      s"no eviction observed: state=$total removed=$removed inputs=$inputs")
  }
}
