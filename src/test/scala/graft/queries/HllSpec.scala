package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class HllSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.sf0001

  private def keys = Sketches.keysOf(
    Tables(spark, dir, "lineitem").select($"l_orderkey".cast("string").as("k")))

  test("register table is bounded by m and rho stays in 1..61") {
    val regs = Sketches.buildHll(keys).cache()
    assert(regs.count() <= 1024)
    val bad = regs.filter($"maxrho" < 1 || $"maxrho" > 61).count()
    assert(bad == 0, s"$bad registers with rho outside 1..61")
    regs.unpersist()
  }

  test("sketches of disjoint slices merge register-wise (MAX) to the whole") {
    val whole = Sketches.buildHll(keys).withColumnRenamed("maxrho", "whole_rho")
    val merged = Sketches.buildHll(keys.filter($"key" % 2 === 0))
      .union(Sketches.buildHll(keys.filter($"key" % 2 === 1)))
      .groupBy("idx").agg(max("maxrho").as("merged_rho"))
    val diff = whole.join(merged, Seq("idx"), "full_outer")
      .filter(coalesce($"whole_rho", lit(-1L)) =!= coalesce($"merged_rho", lit(-2L)))
      .count()
    assert(diff == 0, s"$diff registers differ between merged and whole sketches")
  }

  test("estimate is within 10% of exact at sf0.001 (linear-counting regime)") {
    val row = Sketches.hllEstimate(spark, dir).collect().head
    val exact = row.getAs[Long]("n_exact")
    val est = row.getAs[Double]("hll_est")
    val err = math.abs(est - exact) / exact.toDouble
    assert(err <= 0.10, s"exact=$exact est=$est err=$err")
    // sf0.001 cardinality sits below 2.5m — the correction branch MUST fire
    assert(row.getAs[String]("branch") == "linear")
  }

  test("rho derivation matches a direct leading-zero count (oracle parity)") {
    // the string-only derivation == Long.numberOfLeadingZeros on the
    // 60-bit value: rebuild every register directly in the JVM and
    // compare the full table
    val ks = keys.select($"k").distinct().as[String].collect()
    assert(ks.nonEmpty)
    val expected = ks.map { k =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val idx = java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024L
      val v = java.lang.Long.parseLong(hex.substring(8, 23), 16)
      val rho =
        if (v == 0L) 61L
        else (java.lang.Long.numberOfLeadingZeros(v) - 4 + 1).toLong
      (idx, rho)
    }.groupBy(_._1).map { case (i, rs) => (i, rs.map(_._2).max) }
    val viaSpark = Sketches.buildHll(keys).as[(Long, Long)].collect().toMap
    assert(viaSpark == expected)
  }

  test("raw-estimator branch fires once cardinality clears 2.5m (merge of many slices)") {
    // synthesize 10k distinct keys — well above 2.5·1024 — and check the
    // raw branch estimate lands within 2 standard errors (σ≈1.04/√m)
    val synth = Sketches.keysOf(
      spark.range(0, 10000).select(concat(lit("syn|"), $"id").as("k")))
    val regs = Sketches.buildHll(synth)
    val s = regs.agg(
      sum(expr("cast(shiftleft(cast(1 as bigint), cast(61 - maxrho as int)) as decimal(38,0))"))
        .as("sp"), count(lit(1)).as("used")).collect().head
    val sTotal = s.getDecimal(0).add(
      new java.math.BigDecimal(2.305843009213693952e18)
        .multiply(new java.math.BigDecimal(1024 - s.getLong(1))))
    val raw = Sketches.hllC / sTotal.doubleValue()
    assert(raw > 2.5 * 1024, s"raw=$raw should clear the correction cutoff")
    val err = math.abs(raw - 10000) / 10000.0
    assert(err <= 2 * 1.04 / math.sqrt(1024.0), s"raw=$raw err=$err")
  }
}
