package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Acting on IVF cell imbalance: [[VectorIndex.splitHotCells]] must split
  * only the hot cells (k=2 refit inside the cell, members reassigned
  * between the two sub-centroids only), leave every unsplit cell's rows
  * byte-identical (codes NEVER rewrite — the SQ8 codec is untouched),
  * preserve search recall, and bring the profile back under the cap. */
class CellSplitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private val rnd = new scala.util.Random(11)
  private def tight: Seq[Double] = Seq.fill(dim)(rnd.nextDouble() * 0.1)
  private def spread: Seq[Double] = Seq.fill(dim)(rnd.nextDouble() * 10.0)

  // 300 points in one tight cluster + 100 spread: the first-4 Lloyd init
  // comes from the tight cluster, so one cell ends up hot by construction
  private lazy val corpus = (100L until 400L).map(id => (id, tight)) ++
    (400L until 500L).map(id => (id, spread))
  private lazy val queries = (0L until 20L).map(id => (id, tight))

  private def exactTop5: Map[Long, Seq[Long]] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.lazyZip(b).map(_ * _).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    queries.map { case (qid, qv) =>
      qid -> corpus.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    }.toMap
  }

  private def recallAt5(idx: VectorIndex, nprobe: Int): Double = {
    val exact = exactTop5
    val got = idx.search(queries.toDF("vec_id", "embedding"), 5, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    queries.map { case (qid, _) =>
      exact(qid).count(got.getOrElse(qid, Set.empty).contains)
    }.sum.toDouble / (queries.size * 5)
  }

  private def rowsOf(idx: VectorIndex): Map[Long, (Int, String, Double)] =
    idx.table.collect().map(r => r.getLong(0) ->
      ((r.getInt(1),
        r.getAs[Array[Byte]]("sq8_codes").map("%02x".format(_)).mkString,
        r.getDouble(3)))).toMap

  test("split: unsplit rows byte-identical, recall preserved, cap holds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_split_spec").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath, k = 4)
      idx.ingest(corpus.toDF("vec_id", "embedding"))
      val cap = 150L
      val pre = rowsOf(idx)
      val preProfile = pre.values.groupBy(_._1).view.mapValues(_.size).toMap
      assert(preProfile.values.max > cap,
        s"construction must yield a hot cell, got $preProfile")
      val recallPre = recallAt5(idx, nprobe = 2)

      val parentOf = idx.splitHotCells(corpus.toDF("vec_id", "embedding"), cap)
      assert(parentOf.nonEmpty, "the hot cell must actually split")
      val hotSet = parentOf.values.toSet
      val post = rowsOf(idx)
      assert(post.keySet == pre.keySet, "vec_ids preserved")
      pre.foreach { case (id, (cell, codes, dn)) =>
        val (pcell, pcodes, pdn) = post(id)
        assert(pcodes == codes && pdn == dn,
          s"codes must never rewrite (vec $id)")
        if (!hotSet.contains(cell))
          assert(pcell == cell, s"unsplit cell $cell moved vec $id to $pcell")
        else {
          val newId = parentOf.collectFirst {
            case (n, p) if p == cell => n }.get
          assert(pcell == cell || pcell == newId,
            s"hot-cell member $id reassigned OUTSIDE its cell: $cell -> $pcell")
        }
      }
      // profile-after: the cap holds
      val postProfile = post.values.groupBy(_._1).view.mapValues(_.size).toMap
      assert(postProfile.values.max <= cap,
        s"cap must hold after the split, got $postProfile")
      // recall is preserved at EQUAL SCAN BUDGET: splitting shrinks the
      // hot cell, so the same rows-scanned budget buys one more probe
      // (pre: 2 of 4 cells ≈ 300 rows for a tight-cluster query; post:
      // 3 of 5 cells covers the same ~300 rows). Comparing at a fixed
      // nprobe across different cell counts would compare different
      // scan fractions, which is not what the split changes.
      val recallPost = recallAt5(idx, nprobe = 3)
      assert(recallPost >= recallPre,
        s"equal-budget recall dropped: $recallPre -> $recallPost")
      // the act committed a generation: a reopened instance serves it
      assert(rowsOf(new VectorIndex(spark, tmp.getAbsolutePath, k = 4)) == post)
      // no hot cells -> no-op, no new generation
      assert(idx.splitHotCells(corpus.toDF("vec_id", "embedding"), cap).isEmpty)
    } finally graft.load.Scratch.rm(tmp)
  }

  /** Rows a probed search must scan per query at `nprobe`: the summed
    * populations of the query's probed cells — the cost the split act
    * exists to bound. */
  private def scanRowsPerProbe(idx: VectorIndex, nprobe: Int): Seq[Long] = {
    val (ivf, _) = idx.models.get
    val pops = idx.table.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    IvfIndex.probedCells(queries.toDF("vec_id", "embedding"), ivf, nprobe)
      .select("query_id", "cell").collect()
      .groupBy(_.getLong(0))
      .map { case (_, rows) => rows.map(r => pops(r.getInt(1))).sum }
      .toSeq
  }

  test("the split act pays off in search: same nprobe, same recall, cheaper probes") {
    // the point of splitting — a post-split search at the SAME nprobe
    // must keep its recall while the per-probe scan cost (rows read from
    // the probed cells) drops, because the hot cell's mass no longer
    // rides along with every probe that touches it
    val tmp = java.nio.file.Files.createTempDirectory("graft_split_cost").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath, k = 4)
      idx.ingest(corpus.toDF("vec_id", "embedding"))
      val cap = 150L
      val recallPre = recallAt5(idx, nprobe = 2)
      val scansPre = scanRowsPerProbe(idx, nprobe = 2)
      assert(idx.splitHotCells(corpus.toDF("vec_id", "embedding"), cap).nonEmpty)
      val recallPost = recallAt5(idx, nprobe = 2)
      val scansPost = scanRowsPerProbe(idx, nprobe = 2)
      // "maintained" within one hit in a hundred, not bit-equal: at a
      // FIXED nprobe the split strictly shrinks the scanned mass (2 of 5
      // cells cover less than 2 of 4), and cosine is scale-invariant, so
      // a spread-cell doc in some query's exact top-5 can fall out of the
      // probed set. The equal-SCAN-BUDGET comparison (nprobe 3 post vs 2
      // pre) in the first test shows recall non-decreasing; this test
      // pins the other side of the trade — near-equal recall at HALF the
      // probe cost.
      assert(recallPost >= recallPre - 0.02,
        s"same-nprobe recall must hold within one hit: $recallPre -> $recallPost")
      // every tight-cluster query probed the 300-row hot cell before; the
      // split halves what its two nearest centroids now cover
      assert(scansPost.max < scansPre.max,
        s"max per-probe scan must drop: ${scansPre.max} -> ${scansPost.max}")
      assert(scansPost.sum < scansPre.sum,
        s"total probe scan must drop: ${scansPre.sum} -> ${scansPost.sum}")
      info(s"nprobe=2 recall $recallPre -> $recallPost, max scan rows " +
        s"${scansPre.max} -> ${scansPost.max}, total ${scansPre.sum} -> ${scansPost.sum}")
    } finally graft.load.Scratch.rm(tmp)
  }

  test("an exact-duplicate clump is unsplittable: no-op, no junk generation") {
    // 200 identical vectors over the cap: 2-means has no geometry to
    // split on — splitHotCells must SKIP the cell, return empty, and
    // commit NOTHING (a degenerate dead-centroid generation per retry
    // was the failure mode), so splitUntilBalanced terminates at once
    val clumpVec = Seq.tabulate(dim)(_ * 0.25)
    val clump = (100L until 300L).map(id => (id, clumpVec))
    val tmp = java.nio.file.Files.createTempDirectory("graft_split_cl").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath, k = 2)
      idx.ingest(clump.toDF("vec_id", "embedding"))
      val pre = rowsOf(idx)
      assert(idx.splitHotCells(clump.toDF("vec_id", "embedding"), 150L).isEmpty)
      assert(rowsOf(idx) == pre, "no generation must be committed")
      assert(idx.splitUntilBalanced(clump.toDF("vec_id", "embedding"), 150L) == 0)
    } finally graft.load.Scratch.rm(tmp)
  }

  test("index rows absent from the supplied corpus slice survive a split verbatim") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_split_sl").toFile
    try {
      val idx = new VectorIndex(spark, tmp.getAbsolutePath, k = 4)
      idx.ingest(corpus.toDF("vec_id", "embedding"))
      val pre = rowsOf(idx)
      // operator mistake: pass only half the corpus to the split
      val slice = corpus.filter(_._1 % 2 == 0)
      val parentOf = idx.splitHotCells(slice.toDF("vec_id", "embedding"), 150L)
      val post = rowsOf(idx)
      assert(post.keySet == pre.keySet,
        "rows missing from the slice must never be dropped")
      // absent ids keep cell AND codes verbatim; present ids keep codes
      pre.foreach { case (id, (cell, codes, dn)) =>
        val (pcell, pcodes, pdn) = post(id)
        assert(pcodes == codes && pdn == dn)
        if (id % 2 != 0) assert(pcell == cell, s"absent vec $id moved")
      }
      assert(parentOf.nonEmpty)
    } finally graft.load.Scratch.rm(tmp)
  }

  test("splitUntilBalanced iterates when one 2-means round leaves a hot sub-cell") {
    // a dense mode (280 points) right next to a sparse one (20 points):
    // 2-means first separates the MODES (280/20), leaving the dense
    // sub-cell still hot — the ladder must keep splitting until the cap
    // holds, committing one generation per round
    val r2 = new scala.util.Random(23)
    def dense: Seq[Double] = Seq.fill(dim)(r2.nextDouble() * 0.05)
    def sparse: Seq[Double] = Seq.fill(dim)(2.0 + r2.nextDouble() * 2.0)
    val skewed = (100L until 380L).map(id => (id, dense)) ++
      (380L until 400L).map(id => (id, sparse))
    val tmp = java.nio.file.Files.createTempDirectory("graft_split_it").toFile
    try {
      // k=1: everything starts in ONE cell, so the ladder's first
      // 2-means must separate the modes (280/20) and iterate on the
      // still-hot dense side
      val idx = new VectorIndex(spark, tmp.getAbsolutePath, k = 1)
      idx.ingest(skewed.toDF("vec_id", "embedding"))
      val cap = 150L
      val profile0 = idx.table.groupBy("cell").count()
        .collect().map(_.getLong(1))
      assert(profile0.max > cap, s"need a hot start: ${profile0.toSeq}")
      val rounds = idx.splitUntilBalanced(
        skewed.toDF("vec_id", "embedding"), cap)
      assert(rounds >= 2,
        s"this construction must need more than one round, took $rounds")
      val profileN = idx.table.groupBy("cell").count()
        .collect().map(_.getLong(1))
      assert(profileN.max <= cap, s"cap must hold: ${profileN.toSeq}")
      assert(profileN.sum == 300L, "no vectors lost across the ladder")
    } finally graft.load.Scratch.rm(tmp)
  }
}
