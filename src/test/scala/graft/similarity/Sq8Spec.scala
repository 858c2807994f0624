package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class Sq8Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables(spark, TestSpark.sf0001, "embeddings")
  private lazy val model = Sq8.fit(emb)

  test("fit is deterministic and covers the embedding width") {
    val again = Sq8.fit(emb)
    assert(model.dim == 64)
    assert(model.mins.sameElements(again.mins))
    assert(model.maxs.sameElements(again.maxs))
    assert(model.mins.indices.forall(d => model.mins(d) <= model.maxs(d)))
  }

  test("codes are bytes: every code in [0, 255]") {
    val stats = emb
      .select(Sq8.encode(model)(col("embedding").cast("array<double>")).as("cs"))
      .select(min(array_min($"cs")).as("lo"), max(array_max($"cs")).as("hi"))
      .as[(Int, Int)].head()
    assert(stats._1 >= 0 && stats._2 <= 255, s"code range $stats")
  }

  test("reconstruction error is bounded by step/2 per dimension") {
    val halfSteps = model.steps.map(_ / 2)
    val perDim = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("dv", Sq8.decode(model)(Sq8.encode(model)(col("v"))))
      .select(posexplode(zip_with($"v", $"dv", (a, b) => abs(a - b))).as(Seq("d", "err")))
      .groupBy($"d").agg(max($"err").as("err"))
      .as[(Int, Double)].collect()
    perDim.foreach { case (d, err) =>
      // + tiny epsilon: the bound itself is computed in floating point
      assert(err <= halfSteps(d) + 1e-12, s"dim $d err $err > ${halfSteps(d)}")
    }
    assert(perDim.length == 64)
  }

  test("degenerate dimension codes to 0 and decodes to the constant") {
    val df = Seq(Seq(1.5, 2.0), Seq(1.5, 3.0), Seq(1.5, 2.5))
      .toDF("embedding")
    val m = Sq8.fit(df)
    assert(m.mins(0) == 1.5 && m.maxs(0) == 1.5)
    val out = df
      .select(Sq8.decode(m)(Sq8.encode(m)(col("embedding").cast("array<double>"))).as("dv"))
      .select(element_at($"dv", 1)).as[Double].collect()
    assert(out.forall(_ == 1.5))
  }

  test("packed binary roundtrip: exactly 1 byte per dim, exact code recovery") {
    val df = emb.limit(50)
      .select(col("embedding").cast("array<double>").as("v"))
    val both = df.select(
      Sq8.encode(model)(col("v")).as("cs"),
      Sq8.unpack(Sq8.encodePacked(model)(col("v"))).as("ps"))
    assert(both.filter(col("cs") =!= col("ps")).count() == 0)
    val lens = df
      .select(octet_length(Sq8.encodePacked(model)(col("v"))).as("len"))
      .distinct().as[Int].collect()
    assert(lens.toSeq == Seq(64))
  }

  test("asymmetric top-k over codes recalls the exact top-k") {
    val exact = graft.queries.VectorOps.cosineTopK(spark, TestSpark.sf0001)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.queries.Quantization.sq8TopK(spark, TestSpark.sf0001)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    // 8 bits/dim is a fine grid; on the test corpus the compressed ranking
    // should recover nearly all true neighbors
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("BQ prescreen + exact re-rank: honest 1-bit quality ledger") {
    // 1 bit/dim is the coarse end of the ladder: a pure sign-bit ranking
    // is weak on structureless vectors, but the production deployment —
    // Hamming prescreen to top-50, exact re-rank — recovers a usable
    // fraction of the true top-5, and the spec records the floor so a
    // codec regression is visible. (sf0.01 measured 0.68; the smaller
    // sf0.001 corpus is noisier, so the pin is conservative.)
    val got = graft.queries.Quantization.bqRerank(spark, TestSpark.sf0001)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = graft.queries.VectorOps.cosineTopK(spark, TestSpark.sf0001)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"BQ rerank recall@5 = $recall%.2f")
    assert(recall >= 0.4, s"recall=$recall")
  }
}
