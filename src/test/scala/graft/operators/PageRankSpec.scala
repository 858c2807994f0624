package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PageRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // star: hub -> s1..s4 (sinks); plus a 2-chain a -> b -> hub
  private def edges = Seq(
    ("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("hub", "s4"),
    ("a", "b"), ("b", "hub")).toDF("src", "dst")

  test("result is independent of input partitioning (fixed-point law)") {
    val r1 = PageRank.run(edges.repartition(1), iters = 3)
      .as[(String, Long)].collect().toMap
    val r8 = PageRank.run(edges.repartition(8), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(r1 == r8)
  }

  test("mass is conserved up to integer-truncation leak") {
    val ranks = PageRank.run(edges, iters = 3).as[(String, Long)].collect()
    val total = ranks.map(_._2).sum
    val n = ranks.length
    // each of the 3 rounds loses <1 unit per node to each of its divs
    // (contrib div, dangling div, the two /100 truncations)
    val maxLeak = 3L * n * 4
    assert(total <= PageRank.Scale)
    assert(total >= PageRank.Scale - maxLeak - n,
      s"total=$total leaked more than the documented truncation bound")
  }

  test("weight accumulates on the pointed-at nodes, not the pointers") {
    val ranks = PageRank.run(edges, iters = 3).as[(String, Long)].collect().toMap
    // hub receives b's whole rank; each sink gets hub/4 — hub outranks
    // every sink, sinks outrank the unreferenced source 'a'
    assert(ranks("hub") > ranks("s1"))
    assert(ranks("s1") == ranks("s2") && ranks("s2") == ranks("s3"))
    assert(ranks("s1") > ranks("a"))
  }

  test("convergence mode equals fixed-round at the iterations it took") {
    // each round is the same deterministic integer step, so the
    // converged table must be BIT-IDENTICAL to run(edges, itersTaken)
    val eps = PageRank.Scale / 1000000 // 1e-6 of total mass
    val (conv, iters) = PageRank.runUntilConverged(edges, epsilonFp = eps,
      maxIters = 60, checkEvery = 3)
    val convM = conv.as[(String, Long)].collect().toMap
    assert(iters > 3 && iters < 60, s"took $iters rounds")
    val fixedM = PageRank.run(edges, iters)
      .as[(String, Long)].collect().toMap
    assert(convM == fixedM)
    // ...and it actually converged: one more round moves nothing past eps
    val nextM = PageRank.run(edges, iters + 1)
      .as[(String, Long)].collect().toMap
    val maxDelta = convM.map { case (k, v) => math.abs(nextM(k) - v) }.max
    assert(maxDelta <= eps, s"maxDelta=$maxDelta > eps=$eps")
  }

  test("convergence mode on the graded co-purchase graph matches fixed-round") {
    val e = graft.Tables(spark, TestSpark.sf0001, "lineitem")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val g = e.as("x").join(e.as("y"),
        col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
      .select(col("x.p").cast("string").as("src"),
        col("y.p").cast("string").as("dst")).distinct()
    val (conv, iters) = PageRank.runUntilConverged(g,
      epsilonFp = PageRank.Scale / 100000, maxIters = 40, checkEvery = 4)
    val fixed = PageRank.run(g, iters).as[(String, Long)].collect().toMap
    assert(conv.as[(String, Long)].collect().toMap == fixed,
      s"divergence at iters=$iters")
  }

  test("iters=0 returns the uniform start vector") {
    val ranks = PageRank.run(edges, iters = 0).as[(String, Long)].collect()
    val n = ranks.length
    assert(ranks.map(_._2).distinct.length == 1)
    assert(ranks.head._2 == PageRank.Scale / n)
  }
}
