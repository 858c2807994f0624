package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[VectorIndex.maintainIfDrifted]] — the vector family's LSM triad as
  * ONE gated verb (the `sweepIfRecommended` discipline on its third
  * index): measure (codecDrift + cell profile) → decide → act (rebuild
  * and/or splitUntilBalanced). The laws pinned here: each symptom fires
  * exactly its own act, a clean store is a measured no-op (no write),
  * and the verb is artifact-IDEMPOTENT — a second call right after a
  * firing call commits nothing, because the acts cure the symptoms that
  * triggered them. */
class MaintainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(7)
  private def vec(shift: Double): Seq[Double] =
    Seq.fill(dim)(rnd.nextDouble() + shift)

  private def gens(tmp: java.io.File): Set[String] =
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("g=")).toSet

  test("drifted store: rebuild fires, cures the drift, second call no-ops") {
    val batch1 = (100L until 400L).map(id => (id, vec(0.0)))
    val batch2 = (400L until 700L).map(id => (id, vec(3.0)))
    val all = (batch1 ++ batch2).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_d").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath)
      idx.ingest(batch1.toDF("vec_id", "embedding"))
      idx.ingest(batch2.toDF("vec_id", "embedding"))
      val st = idx.maintainIfDrifted(all, oorMax = 0.05)
      assert(st.oorFrac > 0.4, s"construction must drift hard: $st")
      assert(st.rebuilt && st.genBefore == -1 && st.genAfter == 0, st)
      // the act cured the symptom it fired on
      val (oorPost, _) = idx.codecDrift(all)
      assert(oorPost == 0.0)
      // idempotent: the second call measures, decides no, commits NOTHING
      val before = gens(tmp)
      val st2 = idx.maintainIfDrifted(all, oorMax = 0.05)
      assert(!st2.rebuilt && st2.splitRounds == 0 &&
        st2.genBefore == st2.genAfter && st2.genAfter == 0, st2)
      assert(gens(tmp) == before, "a no-op call must not commit a generation")
    } finally graft.load.Scratch.rm(tmp)
  }

  test("skewed-not-drifted store: the split leg fires, cap holds, then no-op") {
    // one tight 300-point cluster + 100 spread (the CellSplitSpec
    // construction): no codec drift — the corpus IS what the models were
    // fit on — but the profile is hot, so only splitUntilBalanced fires
    val r2 = new scala.util.Random(11)
    def tight: Seq[Double] = Seq.fill(8)(r2.nextDouble() * 0.1)
    def spread: Seq[Double] = Seq.fill(8)(r2.nextDouble() * 10.0)
    val corpus = (100L until 400L).map(id => (id, tight)) ++
      (400L until 500L).map(id => (id, spread))
    val all = corpus.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_s").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath, k = 4)
      idx.ingest(all)
      val st = idx.maintainIfDrifted(all, oorMax = 0.05, cellCap = 150L)
      assert(!st.rebuilt, s"no drift on the fitted corpus: $st")
      assert(st.splitRounds > 0 && st.genAfter > st.genBefore, st)
      val profile = idx.table.groupBy("cell").count()
        .collect().map(_.getLong(1))
      assert(profile.max <= 150L, s"cap must hold: ${profile.toSeq}")
      // idempotent: cap holds now, so nothing fires
      val before = gens(tmp)
      val st2 = idx.maintainIfDrifted(all, oorMax = 0.05, cellCap = 150L)
      assert(!st2.rebuilt && st2.splitRounds == 0 &&
        st2.genBefore == st2.genAfter, st2)
      assert(gens(tmp) == before)
    } finally graft.load.Scratch.rm(tmp)
  }

  test("clean store: measured no-op, nothing written") {
    val corpus = (100L until 300L).map(id => (id, vec(0.0)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_c").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath)
      idx.ingest(corpus.toDF("vec_id", "embedding"))
      val layout = Option(tmp.listFiles()).get.map(_.getName).toSet
      val st = idx.maintainIfDrifted(corpus.toDF("vec_id", "embedding"),
        oorMax = 0.05, cellCap = 1000L)
      assert(!st.rebuilt && st.splitRounds == 0 &&
        st.genBefore == -1 && st.genAfter == -1, st)
      assert(Option(tmp.listFiles()).get.map(_.getName).toSet == layout,
        "a clean-store call must leave the artifact untouched")
    } finally graft.load.Scratch.rm(tmp)
  }
}
