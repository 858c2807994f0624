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
}
