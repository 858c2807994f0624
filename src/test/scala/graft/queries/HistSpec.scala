package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class HistSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.sf0001

  private def prices = Tables(spark, dir, "lineitem")
    .select($"l_extendedprice".as("x"))

  test("histogram size is bounded by domain/width, not rows") {
    val h = Sketches.buildHist(prices)
    assert(h.count() <= 110) // price domain ~[900, 105000) / width 1000
  }

  test("histograms of disjoint slices merge bucket-wise (ADD) to the whole") {
    val whole = Sketches.buildHist(prices).withColumnRenamed("cnt", "whole_cnt")
    val merged = Sketches.buildHist(prices.filter($"x" < 50000.0))
      .union(Sketches.buildHist(prices.filter($"x" >= 50000.0)))
      .groupBy("bucket").agg(sum("cnt").as("merged_cnt"))
    val diff = whole.join(merged, Seq("bucket"), "full_outer")
      .filter(coalesce($"whole_cnt", lit(-1L)) =!= coalesce($"merged_cnt", lit(-2L)))
      .count()
    assert(diff == 0, s"$diff buckets differ between merged and whole")
  }

  test("every quantile estimate lands within one bucket width of the exact value") {
    val est = Sketches.histQuantiles(spark, dir)
      .as[(Double, Double)].collect().toMap
    val exact = Tables(spark, dir, "lineitem")
      .select(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))"))
      .as[Seq[Double]].collect().head
    Seq(0.5, 0.9, 0.99).zip(exact).foreach { case (p, ex) =>
      val e = est(p)
      assert(math.abs(e - ex) <= 1000.0, s"p=$p est=$e exact=$ex")
    }
  }
}
