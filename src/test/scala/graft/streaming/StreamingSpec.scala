package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streaming hourly counts equal the batch aggregation") {
    // stream source needs a directory it can list; stage the events file
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val streamed = EventStreams.runOnce(spark, dir.toString, "hourly_test")

    val batch = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

    assert(streamed.count() == batch.count())
    val joined = streamed.alias("s").join(batch.alias("b"),
      Seq("hour_start", "event_type"))
      .filter(col("s.n") =!= col("b.n"))
    assert(joined.count() == 0, "per-window counts must match batch")
  }

  test("stream can start on an empty source dir, then pick up arriving files") {
    // production deploy order: the consumer starts BEFORE the producer's
    // first file lands — schema sniffing has nothing to read, so the
    // declared fallback schema applies and the same stream later absorbs
    // a real file without restart
    val dir = Files.createTempDirectory("events_stream_empty")
    val q = EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_empty_start").start()
    q.processAllAvailable()
    assert(spark.table("hourly_empty_start").count() == 0)
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("hourly_empty_start").count() > 0)
  }
}
