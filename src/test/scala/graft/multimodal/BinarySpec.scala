package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.multimodal.BinaryPipeline.{MediaRow, StubDecoder}

class BinarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary decode pipeline over real document payloads") {
    val media = Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mediaType"))
      .as[MediaRow]
    val out = BinaryPipeline.extract(media, new StubDecoder(16))
    assert(out.count() == media.count())
    val f = out.filter($"id" === 0).head()
    assert(f.ok && f.features.length == 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3) // normalized histogram
    assert(f.nBytes > 0)
    // deterministic across runs
    val again = BinaryPipeline.extract(media, new StubDecoder(16))
      .filter($"id" === 0).head()
    assert(again.features.toSeq == f.features.toSeq)
  }

  test("frame sampling emits the right windows") {
    val media = Seq((1L, Array.range(0, 100).map(_.toByte)))
      .toDF("id", "payload")
    val frames = BinaryPipeline.sampleFrames(media, frameSize = 32, stride = 16)
    val n = frames.count()
    assert(n == 5) // (100 - 32) / 16 + 1
    val first = frames.filter($"frame_idx" === 0).select("frame")
      .collect()(0).getAs[Array[Byte]](0)
    assert(first.length == 32 && first(0) == 0.toByte)
    val last = frames.filter($"frame_idx" === 4).select("frame")
      .collect()(0).getAs[Array[Byte]](0)
    assert(last(0) == 64.toByte)
  }

  test("batched decode sees real batch shapes and matches per-row decode") {
    val media = Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mediaType"))
      .as[MediaRow].repartition(2)
    // batch decoder delegating to the row stub, recording batch sizes
    val acc = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val batched = new BinaryPipeline.BatchDecoder {
      private val inner = new StubDecoder(16)
      def decodeBatch(ps: Seq[Array[Byte]], ms: Seq[String]) = {
        acc.add(ps.length)
        ps.lazyZip(ms).map((p, m) => inner.decode(p, m))
      }
    }
    val out = BinaryPipeline.extractBatched(media, batched, batchSize = 7)
      .collect().map(f => f.id -> f.features.toSeq).toMap
    val rowWise = BinaryPipeline.extract(media, new StubDecoder(16))
      .collect().map(f => f.id -> f.features.toSeq).toMap
    assert(out == rowWise)
    val sizes = acc.value.toArray.map(_.asInstanceOf[Int])
    assert(sizes.forall(_ <= 7) && sizes.max == 7, sizes.toSeq)
    assert(sizes.sum == rowWise.size)
  }

  test("decoded media features flow into the semantic dedup index") {
    // the full multimodal dedup path: opaque payloads → partition-batched
    // feature extraction → incremental semantic index. id 2 is a
    // bit-identical payload (identical features → EXACT vhash drop); id 3
    // differs in one byte, so its histogram is near-but-not-identical —
    // it must drop through the SEMANTIC path (band collision + cosine),
    // which a histogram-equal payload would never exercise.
    val bytes = Array.range(0, 64).map(_.toByte)
    val nearDup = bytes.clone(); nearDup(0) = 1.toByte
    val media = Seq(
      MediaRow(1L, bytes, "image/png"),
      MediaRow(2L, bytes.clone(), "image/png"),          // exact dup
      MediaRow(3L, nearDup, "image/png"),                // near dup
      MediaRow(4L, Array.fill(64)(7.toByte), "image/png")) // different
      .toDS()
    val features = BinaryPipeline.extract(media, new StubDecoder(16))
      .filter(_.ok)
      .select(col("id").as("vec_id"),
        col("features").cast("array<double>").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("mm_sem").toString
    val idx = new graft.similarity.SemanticDedupIndex(spark, dir,
      threshold = 0.9,
      sketch = graft.similarity.SemanticSketch(dim = 16))
    val stats = idx.ingest(features)
    assert(stats.nIn == 4 && stats.nAdded == 2, stats)
    assert(idx.vectors.select("vec_id").as[Long].collect().toSet == Set(1L, 4L))
    // precondition of the semantic claim: 3's features are NOT identical
    // to 1's (an equal histogram would have collapsed in the exact stage)
    val f = BinaryPipeline.extract(media, new StubDecoder(16))
      .collect().map(x => x.id -> x.features.toSeq).toMap
    assert(f(1L) != f(3L) && f(1L) == f(2L))
  }

  test("window-sketch simhash: a byte-perturbed payload still collides") {
    val dec = new BinaryPipeline.WindowSketchDecoder(48)
    def sig(p: Array[Byte]): Long = {
      val f = dec.decode(p, "application/octet-stream")
      (0 until 48).map(b => if (f(b) > 0) 1L << b else 0L).sum
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    def bands(s: Long): Seq[Long] = (0 until 4).map(b => (s >> (b * 12)) & 0xfff)
    // deterministic 400-byte "media" payload with enough distinct windows
    // that one changed byte (≤ 4 windows, ≤ ±8 per vote sum) cannot move
    // many sign bits
    val base = Array.tabulate(400)(i => ((i * 131 + i / 7) % 251).toByte)
    val perturbed = base.clone(); perturbed(200) = (perturbed(200) ^ 0x5a).toByte
    val (s0, s1) = (sig(base), sig(perturbed))
    assert(s0 != 0L)
    assert(hamming(s0, s1) <= 6,
      s"perturbed payload drifted ${hamming(s0, s1)} bits")
    // ...and it still lands in at least one shared 12-bit band, so the
    // banded candidate join SURFACES the pair (the near-dup contract)
    assert(bands(s0).zip(bands(s1)).exists { case (a, b) => a == b })
    // control: an unrelated payload is far away and shares no band
    val other = Array.tabulate(400)(i => ((i * 17 + 3) % 239).toByte)
    assert(hamming(s0, sig(other)) > 6)
  }

  test("media near-dup pairs: graded query shape on real documents") {
    val out = graft.queries.MediaDedup.mediaNearDup(spark, TestSpark.sf0001)
      .collect()
    assert(out.nonEmpty, "sf0.001 documents must contain near-dup media")
    out.foreach { r =>
      assert(r.getAs[Long]("doc1") < r.getAs[Long]("doc2"))
      assert(r.getAs[Long]("hamming") <= 6)
    }
    // pairs are unique
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("payload shorter than one frame emits zero frames") {
    // regression: sequence(0, n_frames-1) with n_frames = 0 is a DESCENDING
    // [0, -1] in Spark — it used to emit two bogus frames
    val media = Seq((1L, Array.range(0, 10).map(_.toByte)),
        (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val frames = BinaryPipeline.sampleFrames(media, frameSize = 32, stride = 16)
    assert(frames.count() == 0)
  }
}
