package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class IvfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables(spark, TestSpark.sf0001, "embeddings")
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 5)

  test("nprobe = k reproduces exact brute-force top-k") {
    val model = IvfIndex.fitSample(emb, k = 8, iters = 2)
    val exact = graft.queries.VectorOps.cosineTopK(spark, TestSpark.sf0001)
      .filter($"query_id" < 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val full = IvfIndex.topK(corpus, queries, model, k = 5, nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("small nprobe trades recall for touched vectors") {
    val model = IvfIndex.fitSample(emb, k = 8, iters = 2)
    val exact = IvfIndex.topK(corpus, queries, model, k = 5, nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.topK(corpus, queries, model, k = 5, nprobe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall")
    assert(approx.size <= exact.size)
    // every approx hit is a real corpus neighbor of the right query
    assert(approx.forall { case (q, n) => q < 5 && n >= 10 })
  }

  test("assignment covers the corpus and respects k") {
    val model = IvfIndex.fitSample(emb, k = 4, iters = 1)
    val assigned = IvfIndex.assign(emb, model)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet))
  }

  test("sampled fit: nprobe = k is still exact brute force") {
    val model = IvfIndex.fitSample(emb, k = 8, iters = 2)
    val exact = graft.queries.VectorOps.cosineTopK(spark, TestSpark.sf0001)
      .filter($"query_id" < 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val full = IvfIndex.topK(corpus, queries, model, k = 5, nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("recall floor: the q_ann_recall curve cannot silently regress") {
    // measured on the synthetic corpus: 0.78 @1, 0.88 @2, 0.92 @4, 1.0 @8
    // (sf0.001) and 0.74/0.86/0.94/1.0 at sf0.01. The floors leave margin
    // for benign index evolution but catch any real recall regression;
    // nprobe = k (= 8) must stay EXACTLY brute force.
    val curve = graft.queries.VectorOps.annRecall(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(curve(2L) >= 0.8, s"recall@5 nprobe=2 fell to ${curve(2L)}")
    assert(curve(4L) >= 0.85, s"recall@5 nprobe=4 fell to ${curve(4L)}")
    assert(curve(8L) == 1.0, s"nprobe=k must be exact, got ${curve(8L)}")
    // the curve is monotone in nprobe (more probed cells never hurt)
    assert(curve(1L) <= curve(2L) && curve(2L) <= curve(4L) &&
      curve(4L) <= curve(8L), s"non-monotone curve: $curve")
  }

  test("persisted index artifact reproduces the fresh-fit search exactly") {
    val (m1, idx1) = IvfStore.indexFor(spark, TestSpark.sf0001, k = 8, iters = 2)
    // second call must LOAD (no refit): model identical bit-for-bit
    val (m2, idx2) = IvfStore.indexFor(spark, TestSpark.sf0001, k = 8, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    assert(idx1.count() == emb.count() && idx2.count() == emb.count())

    // search over the loaded index == search over a freshly assigned corpus
    val fresh = IvfIndex.fitSample(emb, k = 8, iters = 2)
    val viaStore = IvfIndex.topKIndexed(idx2.filter($"vec_id" >= 10),
        queries, m2, k = 5, nprobe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val viaFit = IvfIndex.topK(corpus, queries, fresh, k = 5, nprobe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaStore == viaFit)
  }

  test("packed code columns roundtrip: unpack(pack(x)) is identity over 0..255") {
    val df = Seq((1L, (0 until 256).toArray)).toDF("id", "cs")
    val back = df.select(Codes.unpack(Codes.pack($"cs"), 256).as("back"))
      .as[Seq[Int]].head()
    assert(back == (0 until 256).toSeq)
    // and the blob really is 1 byte per code
    val len = df.select(octet_length(Codes.pack($"cs"))).as[Int].head()
    assert(len == 256)
  }

  test("artifact codec models roundtrip exactly; persisted codes match a fresh encode") {
    val art = IvfStore.artifactFor(spark, TestSpark.sf0001, k = 8, iters = 2)
    // loaded models reproduce a fresh fit bit-for-bit (Double.toString
    // roundtrip + deterministic fits)
    val sq8 = Sq8.fit(emb)
    assert(art.sq8.mins.toSeq == sq8.mins.toSeq &&
      art.sq8.maxs.toSeq == sq8.maxs.toSeq)
    val pq = Pq.fit(emb.select($"vec_id", $"embedding"))
    assert(art.pq.sub.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.sub.map(_.map(_.toSeq).toSeq).toSeq)
    // persisted code blobs = encode of the raw vector under the fresh model
    val freshCodes = emb
      .select($"vec_id", Sq8.encode(sq8)($"embedding".cast("array<double>")).as("cs"),
        Pq.encode(pq)($"embedding".cast("array<double>")).as("ps"))
    val joined = art.index.join(freshCodes, "vec_id")
      .select($"vec_id",
        Codes.unpack($"sq8_codes", sq8.dim).as("stored_s"), $"cs",
        Codes.unpack($"pq_codes", pq.m).as("stored_p"), $"ps")
    assert(joined.filter($"stored_s" =!= $"cs" || $"stored_p" =!= $"ps").count() == 0)
    assert(joined.count() == emb.count())
  }

  test("residual PQ reconstructs tighter than raw PQ (the IndexIVFPQ rationale)") {
    // Same m bytes per vector; the residual codec spends them on what the
    // coarse quantizer leaves behind, so its reconstruction must beat
    // raw-vector PQ on average — the reason FAISS encodes residuals.
    val art = IvfStore.artifactFor(spark, TestSpark.sf0001, k = 8, iters = 2)
    val ivfFlat = typedLit(art.ivf.centroids.flatten.toSeq)
    def meanAbsErr(recon: org.apache.spark.sql.Column): Double =
      art.index
        .withColumn("errs", zip_with($"v", recon, (a, b) => abs(a - b)))
        .select(avg(aggregate($"errs", lit(0.0), (a, x) => a + x) / lit(64.0)))
        .head().getDouble(0)
    val rawErr = meanAbsErr(Pq.decode(art.pq)(Codes.unpack($"pq_codes", art.pq.m)))
    val resErr = meanAbsErr(
      transform(Pq.decode(art.pqr)(Codes.unpack($"pqr_codes", art.pqr.m)),
        (r, i) => element_at(ivfFlat, $"cell" * lit(64) + i + 1) + r))
    info(f"mean abs reconstruction error: raw-PQ $rawErr%.5f residual-PQ $resErr%.5f")
    assert(resErr < rawErr,
      f"residual PQ ($resErr%.5f) should reconstruct tighter than raw PQ ($rawErr%.5f)")
    // and the persisted norm column matches the reconstruction it claims
    val normOff = art.index
      .withColumn("recon",
        transform(Pq.decode(art.pqr)(Codes.unpack($"pqr_codes", art.pqr.m)),
          (r, i) => element_at(ivfFlat, $"cell" * lit(64) + i + 1) + r))
      .withColumn("dn2",
        sqrt(graft.functions.GraftFunctions.dot_double($"recon", $"recon")))
      .filter(abs($"dn2" - $"pqr_dn") > 1e-12)
    assert(normOff.count() == 0)
  }
}
