package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks latest right row at or before left ts, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 12:00:00"), "t2"),
      (2L, ts("2024-01-01 09:00:00"), "t3"))
      .toDF("user_id", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:30:00"), "q1"),
      (1L, ts("2024-01-01 11:00:00"), "q2"),
      (1L, ts("2024-01-01 12:00:00"), "q3"), // tie: inclusive
      (2L, ts("2024-01-01 10:00:00"), "q4")) // after t3: no match
      .toDF("user_id", "ts", "quote")

    val out = AsOfJoin.asOf(trades, quotes, "user_id", "ts", Seq("quote"))
      .select("trade", "quote").as[(String, String)].collect().toMap
    assert(out == Map("t1" -> "q1", "t2" -> "q3"))

    val outer = AsOfJoin.asOf(trades, quotes, "user_id", "ts", Seq("quote"),
      inner = false)
    assert(outer.count() == 3)
    assert(outer.filter(col("trade") === "t3").select("quote").head().isNullAt(0))
  }

  test("multi-column payload is carried atomically (no cross-row mixing)") {
    // q2 has a null in one payload column; the match must still be ALL of
    // q2's fields, never q1's bid stitched onto q2's ask
    val trades = Seq((1L, ts("2024-01-01 12:00:00"), "t1"))
      .toDF("user_id", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(10.0), Some(11.0), "q1"),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double], Some(12.0), "q2"))
      .toDF("user_id", "ts", "bid", "ask", "qid")
    val row = AsOfJoin.asOf(trades, quotes, "user_id", "ts",
      Seq("bid", "ask", "qid")).select("bid", "ask", "qid").head()
    assert(row.isNullAt(0), "bid must be q2's null, not q1's 10.0")
    assert(row.getDouble(1) == 12.0 && row.getString(2) == "q2")

    // inner filter keys on match existence, not payload non-nullness: a
    // left row whose only preceding right row is all-null payload matches
    val quotesAllNull = Seq(
      (1L, ts("2024-01-01 10:00:00"), None: Option[Double], None: Option[Double]))
      .toDF("user_id", "ts", "bid", "ask")
    val matched = AsOfJoin.asOf(trades, quotesAllNull, "user_id", "ts",
      Seq("bid", "ask"))
    assert(matched.count() == 1)
  }
}
