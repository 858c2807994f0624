package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class PqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private lazy val model = Pq.fit(emb)

  test("fit shape and determinism") {
    assert(model.m == 8 && model.k == 16 && model.subDim == 8 && model.dim == 64)
    val again = Pq.fit(emb)
    assert(model.flat.sameElements(again.flat))
  }

  test("every code addresses a real cell: m codes in [0, k)") {
    val stats = emb
      .select(Pq.encode(model)(col("embedding").cast("array<double>")).as("cs"))
      .select(min(array_min($"cs")).as("lo"), max(array_max($"cs")).as("hi"),
        min(size($"cs")).as("n1"), max(size($"cs")).as("n2"))
      .as[(Int, Int, Int, Int)].head()
    assert(stats._1 >= 0 && stats._2 < 16, s"code range $stats")
    assert(stats._3 == 8 && stats._4 == 8, s"code count $stats")
  }

  test("reconstruction decodes each code to its subspace centroid") {
    val v = emb.filter($"vec_id" === 0)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
    val codes = emb.filter($"vec_id" === 0)
      .select(Pq.encode(model)(col("embedding").cast("array<double>")))
      .as[Seq[Int]].head()
    val recon = emb.filter($"vec_id" === 0)
      .select(Pq.decode(model)(Pq.encode(model)(col("embedding").cast("array<double>"))))
      .as[Seq[Double]].head()
    codes.zipWithIndex.foreach { case (c, s) =>
      assert(recon.slice(s * 8, s * 8 + 8) == model.sub(s)(c).toSeq)
    }
    assert(v.length == recon.length)
  }

  test("compression-quality ladder: PQ reconstructs coarser than SQ8") {
    val sq8 = Sq8.fit(emb)
    val errs = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("pqErr", aggregate(
        zip_with($"v", Pq.decode(model)(Pq.encode(model)($"v")), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("sqErr", aggregate(
        zip_with($"v", Sq8.decode(sq8)(Sq8.encode(sq8)($"v")), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => acc + x))
      .agg(avg($"pqErr").as("pq"), avg($"sqErr").as("sq"))
      .as[(Double, Double)].head()
    // 64x compression must cost reconstruction quality vs 8x — if it ever
    // doesn't, one of the codecs is broken
    assert(errs._1 > errs._2, s"pq=$errs")
  }

  test("PQ is a shortlist stage: exact re-rank of its top-50 recovers the exact top-5") {
    val exact = graft.queries.VectorOps.cosineTopK(spark, TestSpark.sf0001)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // shortlist by PQ-approximate cosine, top-50 per query (~10x the final k)
    val dot = graft.functions.GraftFunctions.dot_double _
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
      .withColumn("qn", sqrt(dot($"qv", $"qv")))
    val c = e.filter($"vec_id" >= 10)
      .withColumn("dv", Pq.decode(model)(Pq.encode(model)($"v")))
      .select($"vec_id".as("neighbor_id"), $"v".as("cv"), $"dv",
        sqrt(dot($"dv", $"dv")).as("dn"), sqrt(dot($"v", $"v")).as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"approx".desc, $"neighbor_id")
    val shortlist = c.join(broadcast(q))
      .withColumn("approx", dot($"qv", $"dv") / ($"qn" * $"dn"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 50)
    // exact re-rank of the shortlist
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"cos".desc, $"neighbor_id")
    val reranked = shortlist
      .withColumn("cos", dot($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rn2", row_number().over(w2)).filter($"rn2" <= 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (reranked & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"rerank recall=$recall")
    // and the raw PQ ranking alone is genuinely coarser — if these ever
    // converge the corpus stopped stressing the codec
    val raw = shortlist.filter($"rn" <= 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert((raw & exact).size <= (reranked & exact).size)
  }
}
