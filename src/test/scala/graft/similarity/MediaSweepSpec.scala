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

  test("sweep is a no-op on a production-intake index, rows byte-identical") {
    val dir = Files.createTempDirectory("media_sweep_noop").toString
    val idx = new MediaDedupIndex(spark, dir)
    idx.ingest((0 until 12).map(i =>
      MediaRow(i.toLong, payload(i), "image/png")).toDS())
    val before = idx.signatures.select("media_id", "sig")
      .as[(Long, Long)].collect().toSet
    val layoutBefore = new java.io.File(dir).listFiles().map(_.getName).toSet
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
