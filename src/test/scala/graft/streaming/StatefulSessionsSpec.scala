package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.streaming.StatefulSessions.{Event, SessionState}

class StatefulSessionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("state update closes sessions on gap, keeps open session in state") {
    // pure-function test of the state transition (executor-side logic)
    val state = new TestGroupState[SessionState](None)
    val events = Iterator(
      Event(1, ts(0), 1.0), Event(1, ts(60000), 2.0),          // session 1
      Event(1, ts(60000 + StatefulSessions.GapMs + 1), 5.0))    // starts s2
    val closed = StatefulSessions.updateState(1, events, state).toVector
    assert(closed.size == 1)
    assert(closed.head.n_events == 2 && closed.head.sum_value == 3.0)
    assert(state.value.exists(_.n == 1)) // open session carried in state
  }

  test("streaming dedup drops in-horizon duplicates") {
    val dir = Files.createTempDirectory("dedup_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // duplicate the whole file: every event arrives twice
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.readEvents(spark, dir.toString)
    val q = StatefulSessions.dedupStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_test").start()
    q.processAllAvailable()
    q.stop()
    val n = spark.table("dedup_test").count()
    val expected = Tables(spark, TestSpark.sf0001, "events").count()
    assert(n == expected, s"streamed $n vs distinct $expected")
  }

  /** Minimal GroupState stub for driver-side unit-testing the transition
    * function (Spark's TestGroupState is private to its own tests). */
  private class TestGroupState[S](var value: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
    override def exists: Boolean = value.isDefined
    override def get: S = value.get
    override def getOption: Option[S] = value
    override def update(newValue: S): Unit = value = Some(newValue)
    override def remove(): Unit = value = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
