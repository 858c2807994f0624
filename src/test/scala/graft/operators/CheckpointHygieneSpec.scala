package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Long-lived-session block-storage hygiene ([[Checkpoints]]): the
  * iterative operators and the index mutators must not accumulate
  * local-checkpoint blocks across calls — on a production pipeline
  * ingesting thousands of batches per session, each leaked checkpoint
  * pins executor storage memory forever (the defect class the round-8
  * review found in PageRank's convergence loop, here pinned for every
  * owner of the shared fix). */
class CheckpointHygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("connected components frees per-round edge tables") {
    // a 200-node chain forces many alternating-star rounds (tree height
    // halves per round); without the per-round frees this pins ~2 edge
    // tables per round
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val before = persisted
    val (comp, rounds) = ConnectedComponents.applyWithRounds(edges)
    assert(comp.agg(org.apache.spark.sql.functions.countDistinct("component"))
      .head.getLong(0) == 1L)
    assert(rounds >= 3, s"chain must take multiple rounds, took $rounds")
    val leaked = (persisted -- before).size
    // survivors: `nodes` + the final edge set (both back the returned
    // DF and may not be freed here) — NOT O(rounds)
    assert(leaked <= 2, s"CC leaked $leaked checkpoints over $rounds rounds")
  }

  test("scoped reclamation is thread-confined: a concurrent caller's checkpoint survives") {
    // the repo supports overlapping mutators on one session
    // (TextOpsCapSpec's concurrent incrementalDedup); a session-global
    // persistent-RDD delta would free B's in-flight checkpoint when A's
    // scope exits — thread-local registration must not
    import java.util.concurrent.CountDownLatch
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val aOpen = new CountDownLatch(1)
    val bMade = new CountDownLatch(1)
    @volatile var bCkpt: org.apache.spark.sql.DataFrame = null
    val fA = Future(Checkpoints.scoped {
      val mine = Checkpoints.ck(spark.range(10).toDF("x"))
      aOpen.countDown()
      assert(bMade.await(60, java.util.concurrent.TimeUnit.SECONDS))
      mine.count()
    })
    val fB = Future {
      assert(aOpen.await(60, java.util.concurrent.TimeUnit.SECONDS))
      bCkpt = spark.range(7).toDF("y").localCheckpoint()
      bMade.countDown()
    }
    assert(Await.result(fA, 2.minutes) == 10L)
    Await.result(fB, 2.minutes)
    // A's scope has exited and freed ITS checkpoint; B's — created while
    // A's scope was open, on another thread — must still be readable
    assert(bCkpt.count() == 7L)
    Checkpoints.free(bCkpt)
  }

  test("index ingests and sweeps leave no persisted blocks behind") {
    val before = persisted

    val txt = new graft.similarity.DedupIndex(spark,
      Files.createTempDirectory("ckpt_txt").toString)
    txt.ingest(Seq((1L, "alpha beta gamma delta"), (2L, "other words here"))
      .toDF("doc_id", "text"))
    txt.ingest(Seq((3L, "alpha beta gamma delta")).toDF("doc_id", "text"))
    assert(txt.size == 2)

    def vec(seed: Int): Seq[Double] =
      Seq.tabulate(32)(d => math.sin(seed * 100.0 + d))
    val sem = new graft.similarity.SemanticDedupIndex(spark,
      Files.createTempDirectory("ckpt_sem").toString, threshold = 0.95,
      sketch = graft.similarity.SemanticSketch(dim = 32))
    sem.ingest(Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding"))
    sem.sweep()

    assert(persisted == before,
      s"index mutators leaked: ${(persisted -- before).toSeq.sorted}")
  }

  private def tripleBatch(ids: Range, licVer: Int, tSec: Long) = {
    import org.apache.spark.sql.functions._
    ids.map(i => (s"model:$i", "schema:license", s"lic-$licVer.$i", "literal",
        "", "parser", 0.8)).toDF(
        "subject", "predicate", "obj", "objKind", "datatype",
        "extractionMethod", "confidence")
      .withColumn("extractionTime", timestamp_seconds(lit(tSec)))
  }

  test("TripletStore merge and compact free their internal checkpoints") {
    // merge returns a scalar after a durable delta commit, so its two
    // internal checkpoints (deduped batch + MERGE join) are dead on
    // return — and StreamingLoad calls merge once per MICRO-BATCH, the
    // unbounded-growth regime Checkpoints' scaladoc warns about. 20
    // merges model a sustained stream; the block set must stay FLAT
    // after every one, not just at the end (auto-compaction fires midway
    // at the default cadence, covering compact(keep) on the same run).
    val before = persisted
    val dir = Files.createTempDirectory("ckpt_store").toFile
    try {
      val store = new graft.load.TripletStore(spark, dir.getAbsolutePath)
      (0 until 20).foreach { b =>
        store.merge(tripleBatch(0 until 30, licVer = b % 3, tSec = 1704067200L + b * 3600),
          new java.sql.Timestamp((1704067200L + b * 3600) * 1000))
        assert(persisted == before,
          s"merge leaked by micro-batch $b: ${(persisted -- before).toSeq.sorted}")
      }
      store.compact(keep = 1)
      store.compact(new java.sql.Timestamp(1704067200L * 1000 + 10L * 3600 * 1000))
      assert(persisted == before,
        s"compact leaked: ${(persisted -- before).toSeq.sorted}")
      assert(store.currentTriples.count() > 0)
    } finally graft.load.Scratch.rm(dir)
  }

  test("streaming load keeps the block store flat across 20 micro-batches") {
    // the real regime: StreamingLoad.foreachBatch → merge per
    // micro-batch on the STREAM's thread (scoped reclamation is
    // thread-confined — it must work there too)
    import org.apache.spark.sql.functions._
    val before = persisted
    val src = Files.createTempDirectory("ckpt_stream_src")
    val ckpt = Files.createTempDirectory("ckpt_stream_ck")
    val dir = Files.createTempDirectory("ckpt_stream_store").toFile
    try {
      (0 until 20).foreach { b =>
        tripleBatch(0 until 20, licVer = b % 2, tSec = 1704067200L + b * 3600)
          .coalesce(1).write.mode("overwrite")
          .parquet(src.resolve(s"stage$b").toString)
        val part = Files.list(src.resolve(s"stage$b"))
          .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
        Files.move(part, src.resolve(f"b$b%03d.parquet"))
      }
      val store = new graft.load.TripletStore(spark, dir.getAbsolutePath)
      val q = graft.streaming.StreamingLoad.start(
        graft.streaming.StreamingLoad.readTripleStream(spark, src.toString),
        store, ckpt.toString)
      q.processAllAvailable()
      q.stop()
      assert(store.currentVersion >= 19, "all 20 micro-batches must merge")
      assert(persisted == before,
        s"streamed merges leaked: ${(persisted -- before).toSeq.sorted}")
    } finally {
      graft.load.Scratch.rm(dir)
      graft.load.Scratch.rm(src.toFile)
      graft.load.Scratch.rm(ckpt.toFile)
    }
  }

  test("lifecycle rows free every intermediate; only the returned result survives") {
    // q_etl_lifecycle runs two full extraction passes (each with a
    // typed-map parse checkpoint) plus two merges and a ranges snapshot;
    // all of that is dead once the final result materializes — exactly
    // one block set (the returned eager checkpoint) may remain, and
    // Checkpoints.free must reclaim it (what graft.Bench does per query)
    val before = persisted
    val out = graft.queries.EtlLifecycle.etlLifecycle(spark, graft.TestSpark.sf0001)
    assert(out.count() > 0)
    val leaked = persisted -- before
    assert(leaked.size == 1,
      s"expected only the result checkpoint, got ${leaked.toSeq.sorted}")
    Checkpoints.free(out)
    assert(persisted == before,
      s"result block not reclaimed: ${(persisted -- before).toSeq.sorted}")
  }

  test("vector-index cell splitting frees its corpus-sized join per round") {
    // splitUntilBalanced calls splitHotCells up to maxRounds times; each
    // round localCheckpoints the corpus-sized `assigned` join — unscoped,
    // that pinned one corpus-sized block set PER ROUND for the session
    // (the one index mutator the r9 hygiene pass missed)
    val before = persisted
    val dim = 8
    val r = new scala.util.Random(31)
    def dense: Seq[Double] = Seq.fill(dim)(r.nextDouble() * 0.05)
    def sparse: Seq[Double] = Seq.fill(dim)(2.0 + r.nextDouble() * 2.0)
    val skewed = (100L until 380L).map(id => (id, dense)) ++
      (380L until 400L).map(id => (id, sparse))
    val tmp = Files.createTempDirectory("ckpt_split").toFile
    try {
      val idx = new graft.similarity.VectorIndex(spark,
        tmp.getAbsolutePath, k = 1)
      idx.ingest(skewed.toDF("vec_id", "embedding"))
      val rounds = idx.splitUntilBalanced(
        skewed.toDF("vec_id", "embedding"), 150L)
      assert(rounds >= 2, s"need a multi-round ladder, took $rounds")
      assert(persisted == before,
        s"splitHotCells leaked over $rounds rounds: " +
          s"${(persisted -- before).toSeq.sorted}")
    } finally graft.load.Scratch.rm(tmp)
  }
}
