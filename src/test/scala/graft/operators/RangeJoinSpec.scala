package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("point-in-interval: boundaries, multi-bucket spans, misses") {
    val points = Seq(
      (1L, 0L, "at-lo"),      // == lo: included
      (1L, 99L, "inside"),
      (1L, 100L, "at-hi"),    // == hi: excluded
      (1L, 2500L, "span"),    // interval spanning many buckets
      (1L, 9999L, "miss"),
      (2L, 50L, "wrong-key")) // right x, wrong key
      .toDF("k", "x", "tag")
    val intervals = Seq(
      (1L, 0L, 100L, "i1"),
      (1L, 2000L, 3000L, "i2"))
      .toDF("k", "lo", "hi", "iv")
    val out = RangeJoin.pointInInterval(points, intervals,
        key = "k", x = "x", lo = "lo", hi = "hi", bucketWidth = 64L)
      .select("tag", "iv").as[(String, String)].collect().toSet
    assert(out == Set(("at-lo", "i1"), ("inside", "i1"), ("span", "i2")))
  }

  test("overlapping intervals yield one row per containing interval") {
    val points = Seq((1L, 10L)).toDF("k", "x")
    val intervals = Seq((1L, 0L, 20L, "a"), (1L, 5L, 15L, "b"))
      .toDF("k", "lo", "hi", "iv")
    val out = RangeJoin.pointInInterval(points, intervals,
        "k", "x", "lo", "hi", bucketWidth = 8L)
      .select("iv").as[String].collect().toSet
    assert(out == Set("a", "b"))
  }
}
