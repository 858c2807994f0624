package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class CmsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.sf0001

  test("sketch size is bounded by depth x width") {
    assert(Sketches.cmsSketch(spark, dir).count() <= 4 * 1024)
  }

  test("estimate never undercounts: est >= true for EVERY distinct token") {
    val sketch = Sketches.cmsSketch(spark, dir)
    val toks = Sketches.tokensOf(Tables(spark, dir, "documents"))
    val truth = toks.groupBy("token", "key").agg(count(lit(1)).as("freq"))
    // probe all distinct tokens, not just heavy hitters
    val probes = truth
      .crossJoin(broadcast(Sketches.rowParams.toDF("ri", "a", "b")))
      .withColumn("bucket",
        pmod(col("a") * col("key") + col("b"), lit(2147483647L)) % lit(1024L))
      .select(col("token"), col("freq"), col("ri").cast("long").as("row_i"),
        col("bucket"))
    val est = probes.join(sketch, Seq("row_i", "bucket"))
      .groupBy("token", "freq").agg(min("cnt").as("est"))
    val under = est.filter(col("est") < col("freq")).count()
    assert(under == 0, s"$under tokens undercounted")
  }

  test("sketches of disjoint slices merge cell-wise to the whole") {
    val docs = Tables(spark, dir, "documents")
    val whole = Sketches.buildSketch(Sketches.tokensOf(docs))
      .withColumnRenamed("cnt", "whole_cnt")
    val merged = Sketches.buildSketch(Sketches.tokensOf(docs.filter($"doc_id" % 2 === 0)))
      .union(Sketches.buildSketch(Sketches.tokensOf(docs.filter($"doc_id" % 2 === 1))))
      .groupBy("row_i", "bucket").agg(sum("cnt").as("merged_cnt"))
    val diff = whole.join(merged, Seq("row_i", "bucket"), "full_outer")
      .filter(coalesce($"whole_cnt", lit(-1L)) =!= coalesce($"merged_cnt", lit(-2L)))
      .count()
    assert(diff == 0, s"$diff cells differ between merged and whole sketches")
  }

  test("hash parameters are the documented md5 derivation (oracle parity)") {
    // a is 17-bit so a*key stays far below 2^63 in both engines
    Sketches.rowParams.foreach { case (_, a, b) =>
      assert(a >= 1 && a <= 131071, s"a=$a out of 17-bit range")
      assert(b >= 0 && b < 2147483647L, s"b=$b out of range")
    }
    assert(Sketches.rowParams.map(_._1) == Seq(0, 1, 2, 3))
  }
}
