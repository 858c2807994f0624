package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SemanticDedupIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("near-identical vectors drop; re-ingest is idempotent") {
    val dir = Files.createTempDirectory("sem_idx").toString
    val idx = new SemanticDedupIndex(spark, dir, threshold = 0.999)
    val v = Seq.tabulate(16)(i => (i + 1).toDouble)
    val scaled = v.map(_ * 2.0)      // same direction: cosine == 1
    val other = v.reverse            // different direction
    val s1 = idx.ingest(Seq((1L, v), (2L, scaled), (3L, other))
      .toDF("vec_id", "embedding"))
    assert(s1.nIn == 3 && s1.nAdded == 2, s1) // 2 is a scalar multiple of 1
    val s2 = idx.ingest(Seq((4L, v.map(_ * 0.5)), (5L, other.map(_ * 3.0)))
      .toDF("vec_id", "embedding"))
    assert(s2.nAdded == 0, s2) // both collapse onto accepted directions
    assert(idx.size == 2)
  }

  test("zero vectors, duplicate rows and short embeddings are handled") {
    val dir = Files.createTempDirectory("sem_edge").toString
    val idx = new SemanticDedupIndex(spark, dir, threshold = 0.9)
    val zero = Seq.fill(16)(0.0)
    val v = Seq.tabulate(16)(i => (i + 1).toDouble)
    val short = Seq(1.0, -2.0) // fewer dims than SignBits: must not throw
    val s1 = idx.ingest(Seq((1L, zero), (1L, zero), (2L, v), (3L, short))
      .toDF("vec_id", "embedding"))
    // duplicate zero rows collapse in the exact stage; all three distinct
    // vectors accepted (zero has no direction, short buckets on its bits)
    assert(s1.nIn == 4 && s1.nAdded == 3, s1)
    // replaying the zero vector is idempotent despite its NaN cosine
    val s2 = idx.ingest(Seq((4L, zero), (5L, short)).toDF("vec_id", "embedding"))
    assert(s2.nAdded == 0, s2)
    assert(idx.size == 3)
  }

  test("per-vector candidate cap stays bounded as the index grows") {
    val dir = Files.createTempDirectory("sem_cap").toString
    // adversarial dense-bucket shape: 1 band x 1 bit puts ~half the corpus
    // in each bucket, so uncapped work per probe would grow linearly with
    // the index; threshold > 1 means nothing ever drops (cosine <= 1) and
    // the index keeps growing
    val sk = SemanticSketch(nBands = 1, bitsPerBand = 1, dim = 8,
      maxCandidatesPerVector = 5)
    val idx = new SemanticDedupIndex(spark, dir, threshold = 1.1, sketch = sk)
    def vecs(ids: Range) = ids.map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 8.0 + d).abs + 0.1)))
      .toDF("vec_id", "embedding")
    idx.ingest(vecs(0 until 60))
    assert(idx.size == 60)
    val s2 = idx.ingest(vecs(60 until 80))
    // with ~60 same-bucket acceptors, each of the 20 probes would score
    // ~30 candidates uncapped; the cap bounds scored pairs at 5 per probe
    assert(idx.lastTruncated > 0, "cap must have triggered")
    assert(idx.lastCandidates - idx.lastTruncated <= 5L * 20,
      s"scored=${idx.lastCandidates - idx.lastTruncated}")
    assert(s2.nAdded == 20 && idx.size == 80,
      "capping bounds work; it never drops vectors by itself")
  }

  test("forCorpus holds bucket occupancy constant as the corpus grows") {
    // the 100x-probe law: bits ≈ log2(n / occupancy), clamped to [4, 30]
    assert(SemanticSketch.forCorpus(1L).bitsPerBand == 4)
    assert(SemanticSketch.forCorpus(2000L).bitsPerBand == 8)
    assert(SemanticSketch.forCorpus(200000L).bitsPerBand == 15)   // probe's 3.1x point
    assert(SemanticSketch.forCorpus(Long.MaxValue / 2).bitsPerBand == 30)
    // occupancy n / 2^bits stays within [target/2, target] up the decades
    Seq(1000L, 100000L, 10000000L, 1000000000L).foreach { n =>
      val occ = n.toDouble / (1L << SemanticSketch.forCorpus(n).bitsPerBand)
      assert(occ <= 8.0 + 1e-9 && occ >= 4.0 - 1e-9, s"n=$n occ=$occ")
    }
    val sk = SemanticSketch.forCorpus(50000L, dim = 32, nBands = 4,
      targetOccupancy = 16, maxCandidatesPerVector = 100)
    assert(sk.dim == 32 && sk.nBands == 4 && sk.maxCandidatesPerVector == 100)
    assert(sk.bitsPerBand == 12) // ceil(log2(50000/16)) = ceil(11.6)
  }

  test("bands OR-amplify: a pair colliding in ANY band is a candidate") {
    val dir = Files.createTempDirectory("sem_bands").toString
    // two bands, many bits: near-identical vectors agree in every band;
    // the sketch must catch them regardless of which band collides first
    val sk = SemanticSketch(nBands = 2, bitsPerBand = 12, dim = 16)
    val idx = new SemanticDedupIndex(spark, dir, threshold = 0.999, sketch = sk)
    val v = Seq.tabulate(16)(i => (i + 1).toDouble)
    val s1 = idx.ingest(Seq((1L, v), (2L, v.map(_ * 3.0)), (3L, v.reverse))
      .toDF("vec_id", "embedding"))
    assert(s1.nAdded == 2, s1) // the scalar multiple collides + drops
    assert(idx.size == 2)
  }

  test("incremental ingest equals one-shot ingest over the real corpus") {
    val incPath = Files.createTempDirectory("sem_inc").toString
    val oncePath = Files.createTempDirectory("sem_once").toString
    val inc = new SemanticDedupIndex(spark, incPath, threshold = 0.9)
    inc.ingest(emb.filter(col("vec_id") < 30))
    inc.ingest(emb.filter(col("vec_id") >= 30))
    val once = new SemanticDedupIndex(spark, oncePath, threshold = 0.9)
    once.ingest(emb)
    // theorem: incremental survivors ⊇ one-shot survivors. (Equality can
    // break on chains: a batch-1 vector dropped there is no acceptor for
    // batch 2, while the one-shot non-cascading rule still counts it.)
    val a = inc.vectors.select("vec_id").as[Long].collect().toSet
    val b = once.vectors.select("vec_id").as[Long].collect().toSet
    assert(b.subsetOf(a), s"once-only survivors should not exist: ${b -- a}")
    assert(b.nonEmpty && a.nonEmpty)
  }
}
