package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.BinaryPipeline.MediaRow

/** [[MediaDedupIndex.sweep]] — the compact-thorough half of the intake's
  * LSM split: the escalating batch pair discipline over the PERSISTED
  * signatures, evicting every non-keeper member of a near-dup group. */
class MediaSweepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Test-only raw write path: plants hand-crafted signatures in the
    * store, standing in for what a capped intake admitted. */
  private class RawIdx(dir: String) extends MediaDedupIndex(spark, dir) {
    def put(rows: DataFrame): Unit = append(rows, rows.count())
  }

  private def payload(seed: Int): Array[Byte] =
    Array.tabulate(400)(i => ((i * 131 + i / 7 + seed * 977) % 251).toByte)

  test("sweep evicts the near-dups and exact dups a capped intake admitted") {
    // the MediaDedupIndexSpec hot-bucket geometry: five pairwise-far
    // signatures sharing band0 = 0x7 (a bucket a cap of 5 calls hot —
    // the intake shape that ADMITS y, the near-dup of x0), plus an
    // exact duplicate of x1. A thorough sweep at the production cap
    // (bucket cold) finds both groups and keeps only the min ids.
    val xs = (0 until 5).map(j => ((0x7fL << (7 * j)) << 12) | 0x7L)
    val y = ((0x7fL ^ 1L | (1L << 12) | (1L << 24)) << 12) | 0x7L
    assert(java.lang.Long.bitCount(xs.head ^ y) == 3)
    val dir = Files.createTempDirectory("media_sweep").toString
    val idx = new RawIdx(dir)
    idx.put((xs.zipWithIndex.map { case (s, i) => (20L + i, s) } ++
      Seq((29L, y), (31L, xs(1)))).toDF("media_id", "sig"))
    val st = idx.sweep()
    assert(st == MediaDedupIndex.SweepStats(nBefore = 7, nKept = 5,
      nEvicted = 2), st)
    assert(idx.signatures.select("media_id").as[Long].collect().toSet ==
      (20L until 25L).toSet, "y swept vs x0; 31 swept vs x1")
    // idempotent: a second sweep finds nothing
    assert(idx.sweep().nEvicted == 0L)
  }

  test("sweepDecision: hot intake-cap profile recommends, the act follows") {
    // six distinct signatures all sharing band 0 (bv 5) — hot at an
    // intake cap of 2 — and pairwise near-dups (hamming <= 3 <= MaxHamming)
    val dir = Files.createTempDirectory("media_dec").toString
    val idx = new RawIdx(dir)
    idx.put((0 until 6).map(i => (10L + i, ((i + 1L) << 36) | 0x5L))
      .toDF("media_id", "sig"))
    val dec = idx.sweepDecision(intakeCap = 2)
      .select("cap_name", "hot_buckets", "hot_mass", "sweep_recommended")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(dec("intake")._3 == 1L && dec("intake")._1 >= 1L &&
      dec("intake")._2 >= 6L, s"intake row must recommend: $dec")
    assert(dec("production") == ((0L, 0L, 0L)),
      s"production row must be clean: $dec")
    // the recommended act performs (through the gated verb): the hot
    // bucket's near-dup family collapses to its min id
    val st = idx.sweepIfRecommended(intakeCap = 2)
    assert(st.map(_.nEvicted).contains(5L), st.toString)
    // and post-sweep the intake-cap profile still flags the residual
    // occupancy honestly (one survivor per bucket => nothing hot), so
    // the gated verb now declines to run at all
    val after = idx.sweepDecision(intakeCap = 2)
      .select("cap_name", "sweep_recommended")
      .as[(String, Long)].collect().toMap
    assert(after("intake") == 0L && after("production") == 0L, after.toString)
    assert(idx.sweepIfRecommended(intakeCap = 2).isEmpty)
  }

  test("sweep is a no-op on a production-intake index, rows byte-identical") {
    val dir = Files.createTempDirectory("media_sweep_noop").toString
    val idx = new MediaDedupIndex(spark, dir)
    idx.ingest((0 until 12).map(i =>
      MediaRow(i.toLong, payload(i), "image/png")).toDS())
    val before = idx.signatures.select("media_id", "sig")
      .as[(Long, Long)].collect().toSet
    val layoutBefore = new java.io.File(dir).listFiles().map(_.getName).toSet
    // a clean decision profile at the cap the intake ran at...
    assert(idx.sweepDecision(graft.operators.BandedLsh.BucketCap)
      .agg(max("sweep_recommended")).head.getLong(0) == 0L)
    // ...is the skip signal: the sweep it would gate is indeed a no-op
    val st = idx.sweep()
    assert(st.nEvicted == 0L, st)
    val after = idx.signatures.select("media_id", "sig")
      .as[(Long, Long)].collect().toSet
    assert(after == before)
    // the no-op fast path skips the rewrite entirely: no consolidation,
    // no store-version turnover — the on-disk layout is untouched
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet ==
      layoutBefore, "a no-op sweep must not rewrite the store")
  }
}
