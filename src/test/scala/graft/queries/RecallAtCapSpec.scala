package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.BinaryPipeline

/** The measured bound behind the BandedLsh conservative-accept claim
  * (`operators/BandedLsh.scala` — "forfeit recall inside a hot bucket,
  * recoverable by the sweep, never a lost document"): external-probe
  * search recall@5 AT the engaged intake cap, BEFORE and AFTER the
  * full-recall sweep. q_media_recall grades recall where production
  * buckets are cold; this spec measures the regime the LSM split exists
  * for — an index holding the near-dups a capped intake admitted, served
  * by a search at the same cap (hot buckets dropped from the candidate
  * set), then swept (dup eviction cools the buckets) and re-measured.
  *
  * Ground truth is the BANDED-REACHABLE exact top-5: the Hamming-nearest
  * candidates among corpus rows sharing at least one band bucket with
  * the probe, with NO cap. Probes that collide with nothing are generic
  * LSH misses at any cap — scoring them would dilute the cap effect this
  * spec isolates (the earlier global-exact-top-5 framing measured band
  * non-collision, not the cap: pre = post = 0.296 on sf0.001). */
class RecallAtCapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bandsOf(sig: Long): Seq[Long] =
    (0 until MediaDedup.Bands).map(b =>
      (sig >> (b * MediaDedup.BandBits)) & ((1L << MediaDedup.BandBits) - 1))

  /** recall@5 of the capped banded search against the banded-reachable
    * exact top-5, averaged over probes with a nonempty reachable set. */
  private def recallAt5(probes: Seq[(Long, Long)],
                        corpusSigs: Seq[(Long, Long)],
                        bucketCap: Int): Double = {
    val banded = MediaDedup.searchSigs(
        probes.toDF("doc_id", "sig"), corpusSigs.toDF("doc_id", "sig"),
        k = 5, bucketCap = bucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val scored = probes.flatMap { case (qid, qsig) =>
      val qb = bandsOf(qsig).zipWithIndex.map(_.swap).toSet
      val reachable = corpusSigs.filter { case (_, s) =>
        bandsOf(s).zipWithIndex.map(_.swap).toSet.intersect(qb).nonEmpty }
      if (reachable.isEmpty) None
      else {
        val truth = reachable
          .map { case (id, s) => (java.lang.Long.bitCount(qsig ^ s), id) }
          .sorted.take(5).map(_._2)
        val got = banded.getOrElse(qid, Set.empty)
        Some(truth.count(got.contains).toDouble / truth.size)
      }
    }
    scored.sum / scored.size
  }

  private class RawIdx(dir: String)
      extends graft.similarity.MediaDedupIndex(spark, dir) {
    def put(rows: DataFrame): Unit = put(rows, rows.count())
    private def put(rows: DataFrame, n: Long): Unit = append(rows, n)
  }

  test("planted dense family: capped search forfeits it, the sweep recovers it") {
    // 30 DISTINCT signatures differing only inside band 0 (low bits
    // i = 0..29, pairwise Hamming <= 5 < MaxHamming): bands 1-3 hold one
    // 30-member bucket each — hot at SweepDemoCap=8 — while band 0
    // spreads cold. This is exactly what a capped intake leaves behind
    // (the RawIdx discipline: planted rows stand for admitted near-dups).
    val base = 0x0000ABC123456000L & ((1L << 48) - 1)
    val family = (0 until 30).map(i => (100L + i, base | i))
    val fillers = Seq((500L, 0x0000111222333444L), (501L, 0x0000555666777888L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall_pl").toFile
    try {
      val idx = new RawIdx(tmp.getAbsolutePath)
      idx.put((family ++ fillers).toDF("media_id", "sig"))
      // external probe: variation 30 — shares bands 1-3 with the family,
      // its band-0 bucket is empty, Hamming <= 5 to every member
      val probes = Seq((9999L, base | 30L))
      def sigs = idx.signatures.select("media_id", "sig")
        .as[(Long, Long)].collect().toSeq
      val pre = recallAt5(probes, sigs, MediaDedup.SweepDemoCap)
      assert(pre == 0.0,
        s"every reachable candidate sits in a hot bucket — forfeited: $pre")
      val st = idx.sweep()
      assert(st.nEvicted == 29, s"the family must collapse to its keeper: $st")
      val post = recallAt5(probes, sigs, MediaDedup.SweepDemoCap)
      assert(post == 1.0,
        s"the swept keeper sits in cold buckets — recovered: $post")
    } finally graft.load.Scratch.rm(tmp)
  }

  test("graded corpus at the demo cap: sweep never loses capped-search recall") {
    // the q_media_sweep construction on real payloads: numbers reported
    // for SCALE.md; the planted test above pins the mechanism 0 -> 1
    val media = MediaDedup.mediaOf(spark, TestSpark.sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall_cap").toFile
    try {
      val idx = new graft.similarity.MediaDedupIndex(spark, tmp.getAbsolutePath)
      idx.ingest(media.filter(col("id") < 250),
        bucketCap = MediaDedup.SweepDemoCap)
      idx.ingest(media.filter(col("id") >= 250),
        bucketCap = MediaDedup.SweepDemoCap)
      def corpusSigs: Seq[(Long, Long)] = idx.signatures
        .select("media_id", "sig").as[(Long, Long)].collect().toSeq
      val pre = corpusSigs
      val probeIds = pre.map(_._1).sorted.grouped(20).map(_.head).toSeq
      val probes = MediaDedup.mediaSignatures(
        media.filter(col("id").isin(probeIds: _*))
          .map { row =>
            val p = row.payload.clone()
            p(p.length / 2) = (p(p.length / 2) ^ 0x5a).toByte
            BinaryPipeline.MediaRow(100000L + row.id, p, row.mediaType)
          })
        .as[(Long, Long)].collect().toSeq
      val recallPre = recallAt5(probes, pre, MediaDedup.SweepDemoCap)
      val st = idx.sweep()
      val post = corpusSigs
      val recallPost = recallAt5(probes, post, MediaDedup.SweepDemoCap)
      println(f"[recall-at-cap] sf0.001 pre=$recallPre%.4f post=$recallPost%.4f " +
        f"evicted=${st.nEvicted} index=${pre.size}->${post.size}")
      info(f"recall@5 at cap=${MediaDedup.SweepDemoCap}: pre $recallPre%.3f " +
        f"-> post $recallPost%.3f (${st.nEvicted} evicted)")
      assert(recallPost >= recallPre,
        f"sweep must never lose capped-search recall: $recallPre%.3f -> $recallPost%.3f")
      assert(st.nBefore == st.nKept + st.nEvicted, "never a lost document")
    } finally graft.load.Scratch.rm(tmp)
  }
}
