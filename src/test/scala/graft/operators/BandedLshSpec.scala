package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Hot-bucket discipline for the banded LSH candidate joins: identical
  * signatures exact-collapse to one keeper before banding, and a
  * (band, value) bucket holding more than `bucketCap` DISTINCT keepers is
  * dropped from candidate generation — the one shape that otherwise goes
  * quadratic on a duplicate-heavy corpus. The caps must be output-
  * transparent below the threshold and drop ONLY cross-group candidates
  * above it (exact duplicates always pair via the collapse). */
class BandedLshSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def in(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("doc_id", "sig")
      .select(col("doc_id"), col("sig"),
        shiftright(col("sig"), 12).bitwiseAND(lit(0xfff)).cast("int").as("b0"),
        col("sig").bitwiseAND(lit(0xfff)).cast("int").as("b1"))

  /** Uncapped reference: the pre-discipline banded self-join. */
  private def naive(rows: Seq[(Long, Long)], maxHamming: Int): Set[(Long, Long, Long)] = {
    def bands(s: Long) = Seq((s >> 12) & 0xfff, 0x1000L | (s & 0xfff))
    (for {
      (d1, s1) <- rows; (d2, s2) <- rows
      if d1 < d2 && bands(s1).intersect(bands(s2)).nonEmpty
      h = java.lang.Long.bitCount(s1 ^ s2).toLong
      if h <= maxHamming
    } yield (d1, d2, h)).toSet
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a giant exact-duplicate group never reaches the banded join") {
    // 60 identical boilerplate docs + 3 distinct: the bucket-local join
    // must see ONE keeper for the group, not 60 rows per band bucket
    val rows = (1L to 60L).map(i => (i, 0xABC123L)) ++
      Seq((100L, 0x111111L), (101L, 0x111112L), (102L, 0x777777L))
    val (collapsed, kp) = BandedLsh.collapsedPairs(in(rows), nBands = 2,
      maxHamming = Some(6), bucketCap = 10)
    // keeper pairs: only (100, 101) — hamming 2, shared band
    assert(kp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 101L)))
    // group membership: all 60 boilerplate docs collapse to keeper 1
    assert(collapsed.filter(col("gid") === 1L).count() == 60)
    // the expanded pair set still contains every true duplicate pair
    val full = pairSet(BandedLsh.cappedPairs(in(rows), 2, Some(6), 10))
    assert(full.count(_._3 == 0L) == 60 * 59 / 2)
    assert(full.contains((100L, 101L, 2L)))
    assert(full == naive(rows, 6), "collapse+expand must be output-transparent")
  }

  test("a hot band bucket (many DISTINCT sigs) is dropped; cold ones pair") {
    // 30 distinct signatures share band b1 value 0x5 (low 12 bits) but are
    // far apart in the high bits; two genuine near-dups live in a cold
    // bucket. cap=10 must kill the hot bucket's C(30,2) candidates.
    val hot = (0 until 30).map(i => (i + 1L, ((i + 1L) << 12) | 0x5L))
    val dups = Seq((200L, 0x0F0F0F0L), (201L, 0x0F0F0F1L))
    val rows = hot ++ dups
    val capped = pairSet(BandedLsh.cappedPairs(in(rows), 2, Some(60), 10))
    assert(capped == Set((200L, 201L, 1L)),
      s"hot-bucket candidates must be dropped, got ${capped.size} pairs")
    // diagnostic surface reports exactly that bucket with its population
    val hb = BandedLsh.hotBuckets(in(rows), 2, 10).collect()
    assert(hb.length == 1 && hb.head.getAs[Long]("pop") == 30L)
    // with the cap above the bucket, the same input yields the naive set
    val uncapped = pairSet(BandedLsh.cappedPairs(in(rows), 2, Some(60), 1000))
    assert(uncapped == naive(rows, 60))
  }

  // Escalation variant of the band geometry: e0 = bits 12-23 (band 0's
  // co-slice), e1 = bits 0-11 — locality-preserving extra signature bits.
  private def inEsc(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("doc_id", "sig")
      .select(col("doc_id"), col("sig"),
        shiftright(col("sig"), 12).bitwiseAND(lit(0xfff)).cast("int").as("b0"),
        col("sig").bitwiseAND(lit(0xfff)).cast("int").as("b1"),
        shiftright(col("sig"), 24).bitwiseAND(lit(0xfff)).cast("int").as("e0"),
        col("sig").bitwiseAND(lit(0xfff)).cast("int").as("e1"))

  test("a hot bucket escalates by extra signature bits instead of dropping") {
    // 30 distinct sigs share band b1 value 0x5 AND bits 24-35 differ, so
    // the level-1 re-key by e0 splits the hot bucket into singletons —
    // EXCEPT two genuine near-dups that also agree on e0 and meet again
    // in the refined bucket. Pure drop-mode forfeits that pair.
    val hot = (0 until 30).map(i => (i + 1L, ((i + 1L) << 24) | 0x5L))
    val nd = Seq((200L, (7L << 24) | (0xA0L << 12) | 0x5L),
      (201L, (7L << 24) | (0xA1L << 12) | 0x5L)) // e0 = 7 (matches doc 7's slice)
    val rows = hot ++ nd
    val dropped = pairSet(BandedLsh.cappedPairs(in(rows), 2, Some(60), 10))
    assert(!dropped.exists(p => p._1 == 200L && p._2 == 201L),
      "drop-mode forfeits the near-dup hidden in the hot bucket")
    val esc = pairSet(BandedLsh.cappedPairs(inEsc(rows), 2, Some(60), 10,
      escLevels = 2))
    assert(esc.exists(p => p._1 == 200L && p._2 == 201L),
      s"escalation must recover the in-bucket near-dup, got $esc")
    // the bound still holds: no refined bucket exceeds the cap, and the
    // candidate volume stays far below the hot bucket's C(32,2)
    assert(esc.size < 32 * 31 / 2 / 4, s"escalated pairs must stay bounded: ${esc.size}")
    // terminal-drop diagnostic is empty — every refined bucket went cold
    assert(BandedLsh.droppedBuckets(inEsc(rows), 2, 10, escLevels = 2).isEmpty)
  }

  test("a bucket still hot after every escalation level is dropped") {
    // 40 distinct sigs share band b1 = 0x5, e0 = 0x1, e1 = 0x5 (e1 equals
    // b1's slice, a no-op re-key) — the refine ladder can never split
    // them, so the terminal drop must engage and emit zero pairs.
    val rows = (0 until 40).map(i =>
      (i + 1L, ((i + 1L) << 36) | (0x1L << 24) | 0x5L))
    val esc = pairSet(BandedLsh.cappedPairs(inEsc(rows), 2, Some(60), 10,
      escLevels = 2))
    // band b0 buckets are singletons (bits 12-23 all zero... b0 = 0 for
    // all — also one hot bucket, escalated by e0 = 1 (no-op) then e1
    // (no-op): both bands' buckets terminally drop
    assert(esc.isEmpty, s"still-hot refined buckets must drop, got $esc")
    val d = BandedLsh.droppedBuckets(inEsc(rows), 2, 10, escLevels = 2)
      .collect()
    assert(d.length == 2 && d.forall(_.getAs[Long]("pop") == 40L),
      s"terminal-drop diagnostic must report both buckets: ${d.toSeq}")
  }

  test("terminal-star recovers a never-splittable bucket as hub pairs") {
    // the terminal-drop geometry above: 40 distinct sigs whose bucket no
    // escalation level can split. Drop-mode (the batch instruments)
    // forfeits the whole cluster; the SWEEP mode's hub-star emits
    // (bucket-min, member) candidates — O(bucket), Hamming-verified.
    val rows = (0 until 40).map(i =>
      (i + 1L, ((i + 1L) << 36) | (0x1L << 24) | 0x5L))
    val (_, kp) = BandedLsh.collapsedPairs(inEsc(rows), 2, Some(60), 10,
      escLevels = 2, terminalStar = true)
    val pairs = kp.select("g1", "g2").as[(Long, Long)].collect().toSet
    assert(pairs == (2L to 40L).map((1L, _)).toSet,
      s"hub-star must pair the bucket-min with every member, got $pairs")
    // verification still gates the star: a tight Hamming budget rejects
    // members whose sig is far from the hub (1 xor 30 = 31, popcount 5
    // > 4 rejected; 1 xor 2 = 3, popcount 2 verifies)
    val (_, kpTight) = BandedLsh.collapsedPairs(inEsc(rows), 2, Some(4), 10,
      escLevels = 2, terminalStar = true)
    val tight = kpTight.select("g1", "g2").as[(Long, Long)].collect().toSet
    assert(tight.contains((1L, 2L)) && !tight.contains((1L, 30L)),
      s"the star is candidates, not verified pairs: $tight")
    // and the star changes nothing when no bucket is terminally hot
    val rnd = new scala.util.Random(7)
    val cold = (1L to 50L).map(i => (i, rnd.nextLong() & 0xFFFFFFFFFL))
    val (_, kpCold) = BandedLsh.collapsedPairs(inEsc(cold), 2, Some(8), 1000,
      escLevels = 2, terminalStar = true)
    val (_, kpNoStar) = BandedLsh.collapsedPairs(inEsc(cold), 2, Some(8), 1000,
      escLevels = 2)
    assert(kpCold.select("g1", "g2").as[(Long, Long)].collect().toSet ==
      kpNoStar.select("g1", "g2").as[(Long, Long)].collect().toSet)
  }

  test("escalation is output-transparent when no bucket is hot") {
    val rnd = new scala.util.Random(11)
    val base = (1L to 60L).map(i => (i, rnd.nextLong() & 0xFFFFFFFFFL))
    val rows = base ++ Seq((301L, base(5)._2), (302L, base(5)._2 ^ 1L))
    assert(pairSet(BandedLsh.cappedPairs(inEsc(rows), 2, Some(8), 1000,
      escLevels = 2)) == naive(rows, 8))
  }

  test("capped pairs equal the naive banded join on a mixed corpus below cap") {
    val rnd = new scala.util.Random(7)
    val base = (1L to 80L).map(i => (i, rnd.nextLong() & 0xFFFFFFL))
    // seed some exact-dup clusters and near-dups
    val rows = base ++ Seq((201L, base(3)._2), (202L, base(3)._2),
      (203L, base(10)._2 ^ 1L), (204L, base(10)._2 ^ 3L))
    assert(pairSet(BandedLsh.cappedPairs(in(rows), 2, Some(8), 1000)) ==
      naive(rows, 8))
  }

  test("keeper+star edges give the same components as the expanded pairs") {
    val rows = (1L to 40L).map(i => (i, 0xAAAAAL)) ++ // one big exact group
      Seq((50L, 0xBBB00L), (51L, 0xBBB01L), (52L, 0xBBB03L), // near-dup chain
        (60L, 0x12345L)) // singleton
    val (collapsed, kp) = BandedLsh.collapsedPairs(in(rows), 2, Some(6), 1000)
    val reduced = kp.select(col("g1").as("doc1"), col("g2").as("doc2"))
      .unionByName(BandedLsh.starEdges(collapsed))
    val expanded = BandedLsh.expand(collapsed, kp, withHamming = false)
    def comps(edges: DataFrame): Map[Long, Long] =
      ConnectedComponents(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (cr, ce) = (comps(reduced), comps(expanded))
    // reduced edge count is linear (39 star + 3 keeper pairs), while the
    // expanded within-group half alone is C(40,2)
    assert(reduced.count() == 39 + 3)
    assert(expanded.count() >= 40 * 39 / 2)
    assert(cr == ce, "reduced edges must not change the components")
  }
}
