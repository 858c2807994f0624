package graft.similarity

import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The signature stores' concurrency contract
  * ([[BatchedSignatureStore.serialized]]): concurrent ingests SERIALIZE
  * — the whole mutation (table read, acceptance, commit target) runs
  * against one pinned batch set, an interleaved commit collides on the
  * rename, and the loser re-runs its acceptance against the winner's
  * survivors. Before the pin, the loser's append re-listed the batch
  * dirs at commit time and landed its stale acceptance silently — the
  * cross-batch duplicate survived. The TripletStore v0-pin discipline,
  * ported (`load/TripletStore.scala:268`). */
class StoreConcurrencySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a lost-race ingest re-runs acceptance against the winner's survivors") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_conc_det").toFile
    try {
      val reached = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      @volatile var appendCalls = 0
      // gated instance: its FIRST append parks between acceptance and
      // commit — the exact window the TOCTOU lived in
      val gated = new DedupIndex(spark, tmp.getAbsolutePath) {
        override protected def append(survivors: DataFrame, nAdded: Long): Unit = {
          appendCalls += 1
          if (appendCalls == 1) {
            reached.countDown()
            assert(release.await(60, TimeUnit.SECONDS))
          }
          super.append(survivors, nAdded)
        }
      }
      val plain = new DedupIndex(spark, tmp.getAbsolutePath)
      val sharedText = "the quick brown fox jumps over the lazy dog again"
      // A ingests {20 = dup of B's 10, 21 = unique}; it pins the EMPTY
      // store, accepts both, and parks pre-commit
      val fA = Future(gated.ingest(
        Seq((20L, sharedText), (21L, "a genuinely different note"))
          .toDF("doc_id", "text")))
      assert(reached.await(60, TimeUnit.SECONDS))
      // B lands doc 10 with the same text and commits b=0 first
      val sB = plain.ingest(Seq((10L, sharedText)).toDF("doc_id", "text"))
      assert(sB.nAdded == 1)
      release.countDown()
      // A's commit to b=0 collides; the retry re-pins {b=0}, re-runs
      // acceptance over B's survivor, and DROPS its duplicate
      val sA = Await.result(fA, 2.minutes)
      assert(appendCalls >= 2, "the lost race must retry the append")
      assert(sA.nAdded == 1 && sA.nDropped == 1,
        s"retried acceptance must drop the cross-batch duplicate: $sA")
      val ids = plain.signatures.select("doc_id").as[Long].collect().toSet
      assert(ids == Set(10L, 21L),
        s"index must equal the serial B-then-A outcome, got $ids")
    } finally graft.load.Scratch.rm(tmp)
  }

  test("maintenance racing an ingest fails FAST with the store unchanged") {
    // single-owner enforcement (not just contract prose): an ingest that
    // commits the compaction's target id mid-pass makes the maintenance
    // rename COLLIDE — it throws ConcurrentMaintenanceException with the
    // marker rolled back and no dir deleted, instead of the pre-protocol
    // silent Overwrite-clobber (or deletion) of the ingest's commit.
    val tmp = java.nio.file.Files.createTempDirectory("graft_conc_maint").toFile
    try {
      val plain = new DedupIndex(spark, tmp.getAbsolutePath)
      plain.ingest(Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"))
      plain.ingest(Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text"))
      // gated owner: its compact() reads `table` AFTER listing the batch
      // set; the override lands a concurrent ingest (b=2, the compaction's
      // own target id) in exactly that window
      var raced = false
      val gated = new DedupIndex(spark, tmp.getAbsolutePath) {
        override def table: org.apache.spark.sql.DataFrame = {
          val t = super.table
          if (!raced) {
            raced = true
            new DedupIndex(spark, tmp.getAbsolutePath).ingest(
              Seq((3L, "iota kappa lambda mu")).toDF("doc_id", "text"))
          }
          t
        }
      }
      val e = intercept[BatchedSignatureStore.ConcurrentMaintenanceException] {
        gated.compact()
      }
      assert(e.getMessage.contains("single-owner"))
      assert(!new java.io.File(tmp, "_COMPACT_PENDING").exists(),
        "the lost maintenance must roll its marker back")
      // exactly one side succeeded: the ingest's doc is live alongside
      // every pre-existing survivor — nothing clobbered, nothing deleted
      val after = new DedupIndex(spark, tmp.getAbsolutePath)
      assert(after.signatures.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L))
      // and a re-run maintenance (the contract's remedy) completes
      assert(after.compact() == 1)
      assert(after.size == 3)
    } finally graft.load.Scratch.rm(tmp)
  }

  test("barrier fuzz: racing ingests always land a serial-order outcome") {
    // A ingests {1, 2}, B ingests {3 = exact dup of 1, 4}, barrier-synced
    // so both pin the same (empty) snapshot. Serial A→B keeps {1,2,4};
    // serial B→A keeps {2,3,4}. Any other outcome — notably {1,2,3,4},
    // the silent-TOCTOU result — is a serializability violation.
    val sharedText = "some repeated card text for the exact duplicate pair"
    (0 until 3).foreach { round =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_conc_fuzz$round").toFile
      try {
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        def writer(rows: Seq[(Long, String)]) = Future {
          val idx = new DedupIndex(spark, tmp.getAbsolutePath)
          barrier.await(60, TimeUnit.SECONDS)
          idx.ingest(rows.toDF("doc_id", "text"))
        }
        val fA = writer(Seq((1L, sharedText), (2L, "note about evaluation")))
        val fB = writer(Seq((3L, sharedText), (4L, "note about training")))
        Await.result(fA, 2.minutes)
        Await.result(fB, 2.minutes)
        val ids = new DedupIndex(spark, tmp.getAbsolutePath)
          .signatures.select("doc_id").as[Long].collect().toSet
        assert(ids == Set(1L, 2L, 4L) || ids == Set(2L, 3L, 4L),
          s"round $round: non-serializable outcome $ids")
      } finally graft.load.Scratch.rm(tmp)
    }
  }

  test("marker restore survives a link-incapable filesystem (move-back fallback)") {
    // the rollback's foreign-marker restore uses an EXCLUSIVE hard link;
    // on a mount without hard links (or EPERM) the link always fails —
    // pre-fix, the rollback then deleted the claimed file, dropping the
    // LAST copy of a LIVE owner's marker (permanent evidence loss: that
    // owner's post-commit masking/cleanup would never run and readers
    // would double-count superseded dirs). The fallback must put the
    // claimed file itself back via a non-replacing move.
    val tmp = java.nio.file.Files.createTempDirectory("graft_nolink").toFile
    try {
      val marker = new java.io.File(tmp, "_COMPACT_PENDING")
      java.nio.file.Files.write(marker.toPath, "7\nforeign1".getBytes("UTF-8"))
      val noLink = new DedupIndex(spark, tmp.getAbsolutePath) {
        override protected def createMarkerLink(t: java.nio.file.Path,
                                                s: java.nio.file.Path): Unit =
          throw new UnsupportedOperationException("no hard links on this fs")
      }
      // a different pass's rollback claims the marker, finds a foreign
      // token, and must RESTORE it despite the stubbed link failure
      noLink.rollbackPendingMarker("mytoken9")
      assert(marker.exists(), "live foreign marker dropped by the rollback")
      assert(new String(java.nio.file.Files.readAllBytes(marker.toPath),
        "UTF-8") == "7\nforeign1")
      // nothing strands at the claim path either
      assert(!tmp.listFiles().exists(_.getName.startsWith(".tmp-rollback")),
        tmp.listFiles().map(_.getName).mkString(","))
      // and the OWN-token rollback still removes its own marker outright
      val owned = new DedupIndex(spark, tmp.getAbsolutePath)
      java.nio.file.Files.write(marker.toPath, "9\nmine0001".getBytes("UTF-8"))
      owned.rollbackPendingMarker("mine0001")
      assert(!marker.exists(), "own marker must be rolled back")
    } finally graft.load.Scratch.rm(tmp)
  }
}
