package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The ANN rebuild act: when [[VectorIndex.codecDrift]] says the frozen
  * models no longer fit the accumulated corpus, [[VectorIndex.rebuild]]
  * must re-fit + re-encode + atomically swap — and RECOVER the recall the
  * drift destroyed. A second batch shifted fully outside the frozen SQ8
  * ranges saturates every code at the clamp (all drifted vectors decode
  * to the same point), so pre-rebuild recall on drifted queries collapses;
  * post-rebuild ranges cover the union and recall must be at least as
  * good — on this construction, strictly better. */
class AnnRebuildSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(42)
  private def vec(shift: Double): Seq[Double] =
    Seq.fill(dim)(rnd.nextDouble() + shift)

  private lazy val batch1 = (100L until 400L).map(id => (id, vec(0.0)))
  private lazy val batch2 = (400L until 700L).map(id => (id, vec(3.0)))
  private lazy val queries = (0L until 20L).map(id => (id, vec(3.0)))

  private def exactTop5: Map[Long, Seq[Long]] = {
    val corpus = batch1 ++ batch2
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.lazyZip(b).map(_ * _).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    queries.map { case (qid, qv) =>
      qid -> corpus.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    }.toMap
  }

  private def recallAt5(idx: VectorIndex): Double = {
    val exact = exactTop5
    val got = idx.search(queries.toDF("vec_id", "embedding"),
        topK = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = queries.map { case (qid, _) =>
      exact(qid).count(got.getOrElse(qid, Set.empty).contains)
    }.sum
    hits.toDouble / (queries.size * 5)
  }

  test("rebuild recovers the recall the drifted frozen models destroyed") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_rebuild_spec").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath)
      idx.ingest(batch1.toDF("vec_id", "embedding"))
      idx.ingest(batch2.toDF("vec_id", "embedding"))
      // the drift instrument must be screaming before the rebuild: every
      // batch-2 value sits outside the frozen batch-1 ranges
      val (oor, _) = idx.codecDrift(batch2.toDF("vec_id", "embedding"))
      assert(oor > 0.99, s"expected saturated drift, got oor=$oor")
      val idsPre = idx.table.select("vec_id").collect().map(_.getLong(0)).toSet
      val recallPre = recallAt5(idx)

      // a crashed predecessor's staged generation (index-sized on disk)
      // must be reclaimed by the next generation writer: generation
      // temps live at the store ROOT, which the batch-level sweep in
      // compact() never visits
      val stale = graft.load.AtomicDirCommit.tmpFor(tmp, "g0")
      stale.mkdirs()
      stale.setLastModified(
        System.currentTimeMillis() - 2 * graft.load.TripletStore.TmpSweepAgeMs)
      val gen = idx.rebuild((batch1 ++ batch2).toDF("vec_id", "embedding"))
      assert(gen == 0)
      assert(!stale.exists(), "rebuild must sweep dead writers' temps")
      val idsPost = idx.table.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(idsPost == idsPre, "rebuild must preserve vec_ids verbatim")
      val recallPost = recallAt5(idx)
      assert(recallPost >= recallPre,
        s"post-rebuild recall $recallPost < drifted $recallPre")
      assert(recallPost > recallPre + 0.2,
        s"this construction must RECOVER recall: $recallPre -> $recallPost")
      // the fresh models cover the union: drift is gone
      val (oorPost, _) = idx.codecDrift(batch2.toDF("vec_id", "embedding"))
      assert(oorPost == 0.0)
      // a reopened instance serves the swapped generation
      val again = new VectorIndex(spark, tmp.getAbsolutePath)
      assert(recallAt5(again) == recallPost)
      // ingest after rebuild lands in the new generation under new models
      again.ingest(Seq((900L, vec(1.5))).toDF("vec_id", "embedding"))
      assert(again.table.count() == 601)
      // prune drops the superseded flat layout but keeps the live gen —
      // and must NOT touch a live concurrent rebuild's young staging
      // temp (deleting it would fail that writer's commit); only a dead
      // writer's aged temp is reclaimed
      val inflight = graft.load.AtomicDirCommit.tmpFor(tmp, "g1")
      inflight.mkdirs()
      val dead = graft.load.AtomicDirCommit.tmpFor(tmp, "g1")
      dead.mkdirs()
      dead.setLastModified(
        System.currentTimeMillis() - 2 * graft.load.TripletStore.TmpSweepAgeMs)
      again.pruneGenerations()
      assert(inflight.exists(),
        "prune must not delete a live writer's in-flight staging dir")
      assert(!dead.exists(), "prune reclaims dead writers' aged temps")
      graft.load.Scratch.rm(inflight)
      assert(again.table.count() == 601)
      assert(recallAt5(again) == recallPost)
    } finally graft.load.Scratch.rm(tmp)
  }
}
