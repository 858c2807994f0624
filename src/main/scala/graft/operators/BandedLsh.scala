package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-bucket discipline for banded-LSH candidate generation — the shared
  * scaffold behind the MinHash-band, SimHash-band and media-band near-dup
  * families.
  *
  * Banding makes pair generation bucket-local, but bucket SIZE is what a
  * duplicate-heavy corpus attacks: identical licenses / templates /
  * watermarks concentrate mass in few (band, value) buckets, and a
  * bucket-local self-join is quadratic in bucket population. Two guards,
  * both applied BEFORE any self-join:
  *
  *  1. '''Exact-collapse''': docs with an identical full signature are
  *     collapsed to one keeper (min doc_id) — the
  *     [[graft.similarity.MediaDedupIndex]] keeper rule applied to the
  *     batch paths. A group of 1M identical boilerplate docs contributes
  *     ONE row to every band bucket instead of 1M. Verified keeper pairs
  *     are expanded back to member pairs afterwards, so the guard is
  *     output-transparent: expansion emits only true near-dup pairs
  *     (hamming is signature-level, identical across members), never
  *     candidates.
  *  2. '''Bucket cap + escalation''': (band, value) buckets whose KEEPER
  *     population still exceeds `bucketCap` leave candidate generation —
  *     the [[graft.queries.TextOps.JaccardDfCap]] discipline. Post-collapse
  *     a hot bucket means many DISTINCT signatures share a band value;
  *     such a bucket carries little near-dup signal per candidate and is
  *     exactly the shape that goes quadratic at 100 TB. With
  *     `escLevels` > 0 a hot bucket is not dropped outright: its rows
  *     RE-BAND by appending the caller's next escalation key (extra
  *     signature bits, so the refinement is locality-preserving — near-dup
  *     signatures mostly share them) and re-test against the cap; only a
  *     bucket still hot after the final level is dropped, which keeps the
  *     work bound unconditional while recovering the recall a pure drop
  *     forfeits on boilerplate-heavy corpora. The cap (default
  *     [[BucketCap]]) sits far above every graded-corpus bucket
  *     (sf0.1 maxima: MinHash 8, SimHash 141, media 306 keepers), so the
  *     graded rows are byte-identical with or without it; the DuckDB
  *     oracles mirror cap AND escalation ([[oracleRefineCtes]]) so the
  *     parity holds at ANY scale. [[hotBuckets]] is the level-0
  *     diagnostic (the buckets that escalate — or drop, at escLevels=0);
  *     the refined pipeline also reports the terminally dropped set.
  *
  * Exact duplicates are therefore found by the collapse (a hash groupBy),
  * and the caps govern only the approximate candidate stage — a within-
  * group pair is emitted regardless of how hot its band buckets are.
  *
  * Input convention: `(doc_id, sig, b0..b{nBands-1}[, e0..e{L-1}])` —
  * `sig` any equality-comparable type (a LONG when Hamming verification
  * is wanted), band columns precomputed by the caller, and one escalation
  * key column per requested level (slices of the signature OUTSIDE the
  * band's own bits, or they refine nothing for that band). The input's
  * lineage is materialized ONCE here (`localCheckpoint`), so an expensive
  * signature derivation (the media decoder pass) is never re-run by the
  * self-joins.
  *
  * The media intake ([[graft.similarity.MediaDedupIndex]]) and the
  * search path deliberately stay at escLevels=0 (the text
  * [[graft.similarity.DedupIndex]] needs no cap at all: its drop rule
  * is a full-band match — a linear semi-join with no quadratic
  * candidate stage). Their caps fail CONSERVATIVELY: a row whose
  * only collisions sit in hot buckets is ACCEPTED (search: a probe
  * simply sees fewer candidates, guarded by the recall instrument), so
  * what a capped intake forfeits is dedup recall inside a hot bucket —
  * a recoverable extra near-dup in the index, never a lost document.
  * The escalating batch pair families sweep exactly those in a
  * periodic full-recall pass over the accumulated corpus — the
  * ingest-fast / compact-thorough split of an LSM store. A probe-time
  * ladder at intake IS feasible (escalation keys are signature slices,
  * derivable at any time) but couples every batch's order-dependent
  * accept decisions to two-sided (batch + index) hotness and buys
  * recall only where the conservative accept already bounds the cost;
  * the sweep gets that recall back without it.
  */
object BandedLsh {

  /** Default keeper-population cap per (band, value) bucket. */
  val BucketCap = 1000

  /** Exact-collapse: every row tagged with its group keeper
    * (`gid` = min doc_id over identical `sig`), materialized once. */
  private def collapse(in: DataFrame): DataFrame =
    Checkpoints.ck(
      in.withColumn("gid", min(col("doc_id")).over(Window.partitionBy("sig"))))

  private def bandedKeepers(collapsed: DataFrame, nBands: Int,
                            escLevels: Int = 0): DataFrame =
    collapsed.filter(col("doc_id") === col("gid"))
      .select(Seq(col("gid"), col("sig")) ++
        (0 until escLevels).map(i => col(s"e$i")) :+
        posexplode(array((0 until nBands).map(i => col(s"b$i")): _*))
          .as(Seq("band", "bv")): _*)

  /** Iterative hot-bucket refinement. Level 0 tests the raw (band, bv)
    * buckets against the cap; a hot bucket's rows re-key to
    * `bv '.' e_k` (decimal string concat — injective, and identical to
    * the oracle's `|| '.' || CAST(e AS VARCHAR)`) and re-test, up to
    * `escLevels` rounds; buckets still hot after the last round are
    * dropped. Returns `(kept rows — the union of every level's cold
    * buckets, e-columns stripped; terminally dropped (band, bv, pop))`.
    * escLevels = 0 is the pure cap (the historical drop-and-log mode,
    * a single lazy plan).
    *
    * With escLevels > 0 each level's hot set is materialized
    * (`localCheckpoint` — it holds only over-cap buckets, O(hot)) and
    * checked eagerly: an EMPTY hot set keeps every remaining row with no
    * anti-join at all and ends the ladder — so at production caps, where
    * no bucket is hot, the escalating families pay one small aggregate
    * instead of `escLevels + 1` join rounds, and when buckets ARE hot
    * the checkpointed set feeds the anti-join, the semi-join and the
    * terminal-drop diagnostic without recomputing the aggregate. Output
    * is identical either way (the union of cold buckets), so the
    * declarative oracle replay ([[oracleRefineCtes]]) is unaffected.
    *
    * Returns `(kept, dropped pop, terminal rows)` — the third element is
    * the ROWS of the terminally hot refined buckets (still keyed by
    * their refined band/bv; e-columns stripped), the input to
    * [[collapsedPairs]]'s terminal-star recovery. It shares the
    * checkpointed last-level hot set, so requesting it adds one lazy
    * semi-join, nothing else. */
  private def refineHot(banded: DataFrame, bucketCap: Int,
                        escLevels: Int): (DataFrame, DataFrame, DataFrame) = {
    var cur = if (escLevels > 0)
      banded.withColumn("bv", col("bv").cast("string")) else banded
    var kept: DataFrame = null
    var dropped: DataFrame = null
    var terminal: DataFrame = null
    var k = 0
    while (k <= escLevels) {
      val pop0 = cur.groupBy("band", "bv").agg(count(lit(1)).as("pop"))
        .filter(col("pop") > bucketCap)
      val pop = if (escLevels > 0) Checkpoints.ck(pop0) else pop0
      if (escLevels > 0 && pop.isEmpty) {
        kept = if (kept == null) cur else kept.unionByName(cur)
        dropped = pop
        terminal = cur.limit(0)
        k = escLevels + 1
      } else {
        val hot = pop.select("band", "bv")
        // not broadcast-hinted: on a web corpus many buckets can exceed the
        // cap; AQE picks broadcast when the hot set really is small
        val cold = cur.join(hot, Seq("band", "bv"), "left_anti")
        kept = if (kept == null) cold else kept.unionByName(cold)
        if (k < escLevels)
          cur = cur.join(hot, Seq("band", "bv"), "left_semi")
            .withColumn("bv",
              concat_ws(".", col("bv"), col(s"e$k").cast("string")))
        else {
          dropped = pop
          terminal = cur.join(hot, Seq("band", "bv"), "left_semi")
        }
        k += 1
      }
    }
    def strip(d: DataFrame) =
      (0 until escLevels).foldLeft(d)((x, i) => x.drop(s"e$i"))
    (strip(kept), dropped, strip(terminal))
  }

  /** The collapse map plus the cold (under-cap, possibly escalated)
    * banded keeper rows — the shared pre-join state of every capped
    * consumer: the pair families self-join the cold keepers; the search
    * path probes them. `(collapsed, coldKeepers(gid, sig, band, bv))`. */
  def collapsedColdKeepers(in: DataFrame, nBands: Int,
                           bucketCap: Int = BucketCap,
                           escLevels: Int = 0): (DataFrame, DataFrame) = {
    val collapsed = collapse(in)
    (collapsed,
      refineHot(bandedKeepers(collapsed, nBands, escLevels), bucketCap,
        escLevels)._1)
  }

  /** Hub-star candidate pairs of the terminally hot refined buckets:
    * (bucket-min keeper, every other keeper in the bucket), with both
    * sigs carried for verification. Linear in terminal-bucket
    * population — the recovery mode for NEVER-SPLITTABLE hot buckets
    * (a genuinely dense near-dup cluster agrees on the escalation bits
    * too, so the ladder can't split it and drop-mode forfeits the whole
    * cluster). Verification filters false stars; a verified star edge
    * feeds connected components, where a tight cluster collapses
    * transitively through its hub — partial pair recall by design
    * (member pairs both >= threshold from each other but < threshold
    * from the hub are missed), full GROUP recall on clusters whose
    * members are near the hub, at O(bucket) instead of O(bucket²). */
  private def terminalStarPairs(terminal: DataFrame): DataFrame = {
    val w = Window.partitionBy("band", "bv")
    terminal
      .withColumn("mn", min(struct(col("gid"), col("sig"))).over(w))
      .filter(col("gid") =!= col("mn.gid"))
      .select(col("mn.gid").as("g1"), col("gid").as("g2"),
        col("mn.sig").as("s1"), col("sig").as("s2"))
  }

  /** The collapse map `(doc_id, sig, b*, gid)` plus verified KEEPER pairs
    * `(g1, g2, hamming?)` — the un-expanded form. Group-shaped consumers
    * (connected components) should build edges from these plus the
    * member→keeper star ([[starEdges]]): the component structure is
    * identical to the full expanded pair graph, without materializing the
    * quadratic within-group pair set.
    *
    * `terminalStar` (the SWEEP mode): terminally hot refined buckets
    * contribute hub-star candidates ([[terminalStarPairs]]) instead of
    * dropping outright — still O(bucket) work, recovering group recall
    * on never-splittable dense clusters. The batch instruments keep
    * drop-mode (their bound must not depend on cluster geometry); the
    * periodic sweeps turn the star on, which is what makes the
    * ingest-fast / compact-thorough split safe on a cluster-heavy
    * corpus. Oracles mirror the star via
    * `oracleRefineCtes(terminalStar = true)`. */
  def collapsedPairs(in: DataFrame, nBands: Int, maxHamming: Option[Int],
                     bucketCap: Int = BucketCap,
                     escLevels: Int = 0,
                     terminalStar: Boolean = false): (DataFrame, DataFrame) = {
    val collapsed = collapse(in)
    val (kept, _, terminal) =
      refineHot(bandedKeepers(collapsed, nBands, escLevels), bucketCap,
        escLevels)
    val banded = kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.gid") < col("b.gid"))
      .select(col("a.gid").as("g1"), col("b.gid").as("g2"),
        col("a.sig").as("s1"), col("b.sig").as("s2"))
    val raw =
      (if (terminalStar) banded.unionByName(terminalStarPairs(terminal))
       else banded)
      .distinct()
    val pairs = maxHamming match {
      case Some(h) =>
        raw.withColumn("hamming",
            bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
          .filter(col("hamming") <= h)
          .select("g1", "g2", "hamming")
      case None => raw.select("g1", "g2")
    }
    (collapsed, pairs)
  }

  /** Member→keeper star edges of the collapse — with the keeper pairs,
    * the linear-size edge set whose connected components equal those of
    * the full expanded pair graph. */
  def starEdges(collapsed: DataFrame): DataFrame =
    collapsed.filter(col("doc_id") =!= col("gid"))
      .select(col("gid").as("doc1"), col("doc_id").as("doc2"))

  /** Expand keeper pairs back to the full member pair set:
    * within-group pairs (hamming 0 — exact signature duplicates) plus
    * every cross-group member pair of each verified keeper pair. Output
    * `(doc1, doc2[, hamming])`, doc1 < doc2, no duplicates by
    * construction (a doc belongs to exactly one group). */
  def expand(collapsed: DataFrame, keeperPairs: DataFrame,
             withHamming: Boolean): DataFrame = {
    val m = collapsed.select(col("gid"), col("doc_id"))
    val within0 = m.as("x")
      .join(m.as("y"),
        col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
    val within =
      if (withHamming) within0.withColumn("hamming", lit(0L)) else within0
    val crossCols =
      Seq(least(col("ma.doc_id"), col("mb.doc_id")).as("doc1"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc2")) ++
        (if (withHamming) Seq(col("hamming")) else Nil)
    val cross = keeperPairs
      .join(m.as("ma"), col("g1") === col("ma.gid"))
      .join(m.as("mb"), col("g2") === col("mb.gid"))
      .select(crossCols: _*)
    within.unionByName(cross)
  }

  /** Full capped near-dup pairs: collapse → cap/escalate → banded keeper
    * join → verify → expand. `(doc1, doc2[, hamming])`. */
  def cappedPairs(in: DataFrame, nBands: Int, maxHamming: Option[Int],
                  bucketCap: Int = BucketCap,
                  escLevels: Int = 0): DataFrame = {
    val (collapsed, kp) =
      collapsedPairs(in, nBands, maxHamming, bucketCap, escLevels)
    expand(collapsed, kp, maxHamming.isDefined)
  }

  /** Level-0 diagnostic: the (band, value) buckets over the cap BEFORE
    * any escalation — the set that escalates (or, at escLevels=0, drops)
    * — with their keeper populations; the observable the cap spec and
    * the adversarial scale probe assert on. Re-runs the collapse; a
    * caller already holding the collapse map from [[collapsedPairs]] /
    * [[collapsedColdKeepers]] should use [[hotBucketsOf]] instead of
    * paying the input lineage (the media decoder pass) twice. */
  def hotBuckets(in: DataFrame, nBands: Int,
                 bucketCap: Int = BucketCap): DataFrame =
    hotBucketsOf(collapse(in), nBands, bucketCap)

  /** [[hotBuckets]] over an ALREADY-COLLAPSED map — the free form of the
    * diagnostic next to a pair/search computation. */
  def hotBucketsOf(collapsed: DataFrame, nBands: Int,
                   bucketCap: Int = BucketCap): DataFrame =
    bandedKeepers(collapsed, nBands)
      .groupBy("band", "bv").agg(count(lit(1)).as("pop"))
      .filter(col("pop") > bucketCap)

  /** Terminal-drop diagnostic: the refined (band, value) buckets STILL
    * hot after every escalation level — the rows the discipline actually
    * forfeits. Empty at escLevels=0 iff [[hotBuckets]] is. */
  def droppedBuckets(in: DataFrame, nBands: Int,
                     bucketCap: Int = BucketCap,
                     escLevels: Int = 0): DataFrame =
    refineHot(bandedKeepers(collapse(in), nBands, escLevels), bucketCap,
      escLevels)._2

  /** DuckDB replay of [[refineHot]], kept next to the engine loop so the
    * two stay in lock-step. Emits CTEs over a caller-defined
    * `${p}kb(gid, sig, band, bv, e0..e{L-1})` relation — `bv` must
    * already be VARCHAR (decimal-rendered, matching Spark's
    * `cast("string")`) — ending in `${p}kkept(gid, sig, band, bv)`:
    * level-k cold buckets kept, hot ones re-keyed by
    * `bv || '.' || CAST(e_k AS VARCHAR)`, still-hot-after-last dropped.
    * At escLevels=0 this is the historical single-cap CTE.
    * With `terminalStar` it additionally emits
    * `${p}tstar(g1, g2, s1, s2)` — the hub-star candidates of the
    * terminally hot buckets ([[terminalStarPairs]]); sweep consumers
    * UNION it into their candidate relation before verification. */
  def oracleRefineCtes(p: String, bucketCap: Int, escLevels: Int,
                       terminalStar: Boolean = false): String = {
    val levels = (0 to escLevels).map { k =>
      val src = if (k == 0) s"${p}kb" else s"${p}r$k"
      val cold =
        s"""${p}c$k AS (
           |  SELECT x.* FROM $src x JOIN (
           |    SELECT band, bv FROM $src GROUP BY band, bv
           |    HAVING COUNT(*) <= $bucketCap
           |  ) cold USING (band, bv))""".stripMargin
      val next = if (k < escLevels) {
        val carry = (k + 1 until escLevels).map(i => s", e$i").mkString
        s""",
           |${p}r${k + 1} AS (
           |  SELECT gid, sig, band,
           |    bv || '.' || CAST(e$k AS VARCHAR) AS bv$carry
           |  FROM $src JOIN (
           |    SELECT band, bv FROM $src GROUP BY band, bv
           |    HAVING COUNT(*) > $bucketCap
           |  ) hot USING (band, bv))""".stripMargin
      } else ""
      cold + next
    }.mkString(",\n")
    val union = (0 to escLevels)
      .map(k => s"SELECT gid, sig, band, bv FROM ${p}c$k")
      .mkString("\n  UNION ALL\n  ")
    val star = if (!terminalStar) "" else {
      val last = if (escLevels == 0) s"${p}kb" else s"${p}r$escLevels"
      s""",
         |${p}tr AS (
         |  SELECT x.* FROM $last x JOIN (
         |    SELECT band, bv FROM $last GROUP BY band, bv
         |    HAVING COUNT(*) > $bucketCap
         |  ) th USING (band, bv)),
         |${p}tm AS (
         |  SELECT band, bv, MIN(gid) AS g1 FROM ${p}tr GROUP BY band, bv),
         |${p}tstar AS (
         |  SELECT m.g1, x.gid AS g2, h.sig AS s1, x.sig AS s2
         |  FROM ${p}tr x JOIN ${p}tm m USING (band, bv)
         |  JOIN ${p}tr h ON h.band = m.band AND h.bv = m.bv AND h.gid = m.g1
         |  WHERE x.gid <> m.g1)""".stripMargin
    }
    s"""$levels,
       |${p}kkept AS (
       |  $union)$star""".stripMargin
  }
}
