package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[SemanticDedupIndex.sweep]] — the compact-thorough half of the
  * semantic intake's LSM split: the capped-and-escalated batch pair
  * discipline over the PERSISTED vectors, evicting every non-keeper
  * member of a cosine-verified near-dup component. */
class SemanticSweepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sk = SemanticSketch(dim = 64)

  /** Test-only raw write path: plants rows in the store, standing in
    * for what a capped intake admitted (the MediaSweepSpec RawIdx
    * discipline). */
  private class RawIdx(dir: String)
      extends SemanticDedupIndex(spark, dir, threshold = 0.95, sketch = sk) {
    def put(emb: DataFrame): Unit = {
      val rows = SemanticDedupIndex.withSketch(emb, sk).localCheckpoint()
      append(rows, rows.count())
    }
  }

  /** Deterministic pseudo-random 64-dim vector. */
  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(64)(d => math.sin(seed * 1000.0 + d * 7.0))

  test("sweep evicts planted near-dups and exact dups, keeps min ids") {
    // 20 = a positive scaling of 10 (cosine exactly 1, and every sign
    // projection — hence every band bucket — identical by construction);
    // 31 = a bit-identical copy of 30 (the vhash collapse + star-edge
    // path); 40/50 = unrelated fillers (sin-series cosines well under
    // the 0.95 threshold).
    val rows = Seq(
      (10L, vec(1)), (20L, vec(1).map(_ * 1.5)),
      (30L, vec(2)), (31L, vec(2)),
      (40L, vec(3)), (50L, vec(4)))
    val dir = Files.createTempDirectory("sem_sweep").toString
    val idx = new RawIdx(dir)
    idx.put(rows.toDF("vec_id", "embedding"))
    val st = idx.sweep()
    assert(st == BatchedSignatureStore.SweepStats(nBefore = 6, nKept = 4,
      nEvicted = 2), st)
    assert(idx.vectors.select("vec_id").as[Long].collect().toSet ==
      Set(10L, 30L, 40L, 50L),
      "20 swept vs 10 (near); 31 swept vs 30 (exact, via the collapse)")
    // idempotent: a second sweep finds nothing
    assert(idx.sweep().nEvicted == 0L)
  }

  test("terminal-star: a never-splittable dense cluster collapses to its hub") {
    // 30 positive scalings of one base vector: parallel vectors have
    // identical sign projections in EVERY band — primary AND escalation
    // — so no ladder level can split their bucket. Drop-mode would
    // forfeit the whole cluster; the hub-star collapses it to min id
    // at O(cluster) candidates.
    val cluster = (0 until 30).map(i =>
      (100L + i, vec(9).map(_ * (1.0 + i * 0.01))))
    val fillers = Seq((10L, vec(5)), (20L, vec(6)))
    val dir = Files.createTempDirectory("sem_sweep_star").toString
    val idx = new RawIdx(dir)
    idx.put((cluster ++ fillers).toDF("vec_id", "embedding"))
    val st = idx.sweep(bucketCap = 10)
    assert(st == BatchedSignatureStore.SweepStats(nBefore = 32, nKept = 3,
      nEvicted = 29), st)
    assert(idx.vectors.select("vec_id").as[Long].collect().toSet ==
      Set(10L, 20L, 100L), "cluster keeps its hub; fillers untouched")
  }

  test("demo-capped intake admits through hot buckets; sweep recovers") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    def build(dir: String, cap: Int): SemanticDedupIndex = {
      val idx = new SemanticDedupIndex(spark, dir, threshold = 0.2,
        sketch = SemanticSketch(maxCandidatesPerVector = cap))
      idx.ingest(emb.filter(col("vec_id") < 250))
      idx.ingest(emb.filter(col("vec_id") >= 250))
      idx
    }
    val capped = build(Files.createTempDirectory("sem_sweep_cap").toString,
      graft.queries.VectorOps.SemanticSweepCap)
    val uncapped = build(Files.createTempDirectory("sem_sweep_unc").toString,
      Int.MaxValue)
    assert(capped.lastTruncated > 0,
      "the graded demo cap must actually truncate candidates")
    assert(capped.size > uncapped.size,
      "conservative accept: truncation admits vectors the full rules drop")
    // the decision instrument reads the same story off the index: hot
    // at the intake's rank cap (schedule the sweep), clean at the
    // production budget
    val dec = capped.sweepDecision(graft.queries.VectorOps.SemanticSweepCap)
      .select("cap_name", "hot_buckets", "sweep_recommended")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(dec("intake")._2 == 1L && dec("intake")._1 > 0L, dec.toString)
    assert(dec("production") == ((0L, 0L)), dec.toString)
    // the gated verb consults the decision AND the truncation counter,
    // then acts — within a session the gate is sound: truncation is the
    // only admission path (one-pass acceptance law), and truncation
    // accumulated here
    assert(capped.truncatedSinceSweep > 0L)
    val st = capped
      .sweepIfRecommended(graft.queries.VectorOps.SemanticSweepCap).get
    assert(st.nEvicted > 0, st)
    assert(capped.truncatedSinceSweep == 0L,
      "a sweep settles the accumulated truncation debt")
    // residual invariant: no two survivors sharing a band bucket are
    // near-dups — every such pair was a sweep candidate (all buckets
    // cold at the production cap), so its larger member was evicted
    val surv = capped.vectors.select("vec_id", "v", "nrm", "buckets")
      .as[(Long, Seq[Double], Double, Seq[Int])].collect()
    val residual = for {
      a <- surv; b <- surv
      if a._1 < b._1 && a._4.zip(b._4).exists { case (x, y) => x == y }
      cos = a._2.zip(b._2).map { case (x, y) => x * y }.sum / (a._3 * b._3)
      if cos >= 0.2
    } yield (a._1, b._1, cos)
    assert(residual.isEmpty, s"near-dup pairs survived the sweep: " +
      residual.take(5).mkString(", "))
    assert(capped.sweep().nEvicted == 0L, "idempotent")
  }

  test("a sweep that fails mid-eviction keeps the truncation debt") {
    // the gate's within-session soundness rests on the counter: if the
    // eviction throws after the edge pass, the debt must SURVIVE so a
    // later sweepIfRecommended cannot wrongly skip the still-needed
    // sweep (an eager reset-before-rewrite lost it)
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("sem_sweep_fail").toString
    var boom = true
    val idx = new SemanticDedupIndex(spark, dir, threshold = 0.2,
      sketch = SemanticSketch(
        maxCandidatesPerVector = graft.queries.VectorOps.SemanticSweepCap)) {
      override protected def rewriteAll(rows: DataFrame): Unit = {
        if (boom) throw new RuntimeException("injected eviction failure")
        super.rewriteAll(rows)
      }
    }
    idx.ingest(emb.filter(col("vec_id") < 250))
    idx.ingest(emb.filter(col("vec_id") >= 250))
    val debt = idx.truncatedSinceSweep
    assert(debt > 0L, "the demo cap must truncate")
    intercept[RuntimeException](idx.sweep())
    assert(idx.truncatedSinceSweep == debt,
      "a failed sweep must not settle the debt")
    // the gate still fires, and the retried sweep settles exactly it
    boom = false
    assert(idx.sweepIfRecommended(
      graft.queries.VectorOps.SemanticSweepCap).exists(_.nEvicted > 0))
    assert(idx.truncatedSinceSweep == 0L)
  }

  test("a sweep overlapping an in-flight ingest cannot settle the ingest's debt") {
    // the race the r10 review found: ingest counts its truncation during
    // the candidate pass but its rows append later; a sweep that read the
    // PRE-append store and short-circuited on empty edges must not settle
    // debt for rows it never saw — else a later sweepIfRecommended can
    // wrongly skip. The fix adds debt only after the append commits.
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("sem_sweep_race").toString
    val reached = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var gateArmed = false
    val idx = new SemanticDedupIndex(spark, dir, threshold = 0.2,
      sketch = SemanticSketch(
        maxCandidatesPerVector = graft.queries.VectorOps.SemanticSweepCap)) {
      override protected def append(rows: DataFrame, nAdded: Long): Unit = {
        if (gateArmed) {
          gateArmed = false
          reached.countDown()
          assert(release.await(60, TimeUnit.SECONDS))
        }
        super.append(rows, nAdded)
      }
    }
    // batch 1 lands normally and its debt is swept clean
    idx.ingest(emb.filter(col("vec_id") < 250))
    idx.sweep()
    val settled = idx.truncatedSinceSweep
    // batch 2 (truncates at the demo cap) parks between its candidate
    // pass and its append — the old code had already added its debt here
    gateArmed = true
    val fIngest = Future(idx.ingest(emb.filter(col("vec_id") >= 250)))
    assert(reached.await(60, TimeUnit.SECONDS))
    // the overlapping sweep reads the pre-append store: nothing to evict
    // (batch 1 was just swept), and it must NOT settle batch 2's debt
    idx.sweep()
    release.countDown()
    Await.result(fIngest, 2.minutes)
    assert(idx.truncatedSinceSweep > settled,
      "the in-flight ingest's truncation debt must survive the " +
        "overlapping sweep — a zero here licenses a wrongly-skipped sweep")
    // and the gate still fires on it
    assert(idx.sweepIfRecommended(
      graft.queries.VectorOps.SemanticSweepCap).isDefined)
    assert(idx.truncatedSinceSweep == 0L)
  }

  test("sweep is a no-op on a production-cap index, rows identical") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 120)
    val dir = Files.createTempDirectory("sem_sweep_noop").toString
    val idx = new SemanticDedupIndex(spark, dir, threshold = 0.2)
    idx.ingest(emb)
    val before = idx.vectors.select("vec_id", "vhash")
      .as[(Long, String)].collect().toSet
    val layoutBefore = new java.io.File(dir).listFiles().map(_.getName).toSet
    val st = idx.sweep()
    assert(st.nEvicted == 0L, st)
    assert(idx.vectors.select("vec_id", "vhash")
      .as[(Long, String)].collect().toSet == before)
    // the no-op fast path skips the rewrite entirely: no consolidation,
    // no store-version turnover — the on-disk layout is untouched
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet ==
      layoutBefore, "a no-op sweep must not rewrite the store")
  }
}
