package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-band random-hyperplane sketch for semantic (embedding-space)
  * dedup. Each band hashes a vector to a `bitsPerBand`-bit bucket: bit j
  * is the sign of the vector's dot product with a deterministic ±1
  * hyperplane (derived from md5, so ANY engine — the DuckDB oracle
  * included — can reproduce the exact bucket ids). Bands are
  * OR-amplified: two vectors are candidates when they collide in ANY
  * band, the same band design [[DedupIndex]] uses for MinHash.
  *
  * Collision probability per band for vectors at angle θ is
  * (1 − θ/π)^bitsPerBand, so `bitsPerBand` sets bucket granularity
  * (expected candidates per probe ≈ |index| / 2^bitsPerBand per band) and
  * `nBands` buys recall back for near-duplicate angles. The fixed 8-bit
  * single-band sign sketch this replaces pinned pruning at 1/256 of the
  * index per candidate forever; here granularity is a dial.
  *
  * @param maxCandidatesPerVector hard per-probe candidate bound (see
  *   [[SemanticDedupIndex.ingest]]) — the backstop that keeps one dense
  *   semantic cluster from going quadratic at 100 TB.
  */
final case class SemanticSketch(
    nBands: Int = 3,
    bitsPerBand: Int = 8,
    dim: Int = 64,
    seed: String = "hp",
    maxCandidatesPerVector: Int = 10000) {
  require(nBands >= 1, "nBands must be >= 1")
  require(bitsPerBand >= 1 && bitsPerBand <= 30, "bitsPerBand in [1,30]")
  require(dim >= 1, "dim must be >= 1")
  require(maxCandidatesPerVector >= 1, "maxCandidatesPerVector must be >= 1")

  /** Deterministic ±1 hyperplane component for (band, bit, dim): the low
    * bit of the first 4 md5 bytes of "seed|band|bit|dim" — in SQL,
    * `('0x' || substr(md5(s), 1, 8))::UBIGINT % 2`. One definition,
    * shared with the native expression. */
  def component(b: Int, j: Int, d: Int): Double =
    graft.functions.Evaluators.hyperplaneSign(seed, b, j, d)

  def hyperplane(b: Int, j: Int): Array[Double] =
    Array.tabulate(dim)(d => component(b, j, d))
}

object SemanticSketch {
  /** Granularity sized to the corpus — the operating rule the 100×
    * probe measured (SCALE.md §Similarity): expected bucket occupancy
    * is n / 2^bitsPerBand, and candidate volume per band grows as
    * n × occupancy, so holding occupancy constant keeps pair formation
    * linear in the corpus while a FIXED bitsPerBand goes quadratic.
    * `bitsPerBand = clamp(ceil(log2(n / targetOccupancy)), 4, 30)`;
    * recall lost to finer buckets is bought back with `nBands`
    * (OR-amplification), which multiplies work only linearly. */
  def forCorpus(expectedVectors: Long,
                dim: Int = 64,
                nBands: Int = 6,
                targetOccupancy: Int = 8,
                seed: String = "hp",
                maxCandidatesPerVector: Int = 10000): SemanticSketch = {
    require(expectedVectors >= 1, "expectedVectors must be >= 1")
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val bits = math.min(30, math.max(4,
      math.ceil(math.log(expectedVectors.toDouble / targetOccupancy) /
        math.log(2)).toInt))
    SemanticSketch(nBands = nBands, bitsPerBand = bits, dim = dim,
      seed = seed, maxCandidatesPerVector = maxCandidatesPerVector)
  }
}

/** Incremental SEMANTIC dedup — the embedding-space sibling of
  * [[DedupIndex]]: a persisted table of (vec_id, embedding, norm, band
  * buckets) is the standing index; an incoming batch drops any vector
  * whose cosine against an already-accepted vector (index or smaller-id
  * batch member) meets the threshold. Candidate pairs come ONLY from
  * [[SemanticSketch]] band-bucket collisions — bucket-local, never
  * all-pairs — and are additionally capped per probe vector, so old
  * vectors are never re-scored against each other and no probe can fan
  * out unboundedly.
  *
  * Same non-cascading one-pass rule as [[DedupIndex]]: a smaller-id batch
  * vector counts as an acceptor even if it is itself dropped.
  */
class SemanticDedupIndex(spark: SparkSession, path: String,
                         threshold: Double = 0.95,
                         sketch: SemanticSketch = SemanticSketch())
    extends BatchedSignatureStore(spark, path) {

  import SemanticDedupIndex._

  override protected def schema: org.apache.spark.sql.types.StructType = vecSchema

  def vectors: DataFrame = table

  /** Candidate-pair volume of the latest [[ingest]] and how much of it
    * the cap truncated, both computed from (band, bucket) occupancy
    * stats BEFORE any pair row materializes (probes × acceptors summed
    * per bucket — an upper bound on distinct pairs, since a pair
    * colliding in several bands counts once per band). -1 when the cap
    * is pinned off and the stats pass is skipped. A nonzero truncation
    * count means recall loss on some dense bucket — it is logged loudly
    * and surfaced here so callers can alert on it. */
  @volatile var lastCandidates: Long = 0L
  @volatile var lastTruncated: Long = 0L

  /** [[lastTruncated]] accumulated across every [[ingest]] since the
    * last [[sweep]] — the SOUND within-session sweep trigger: the
    * one-pass acceptance law says a verified near-dup pair can survive
    * ingest ONLY via candidate truncation, so zero accumulated
    * truncation proves the sweep would be a no-op. (The occupancy
    * profile alone cannot prove that: a bucket hot at intake time can
    * cool below the cap when its other members are dropped, hiding the
    * admission site — see [[sweepIfRecommended]].) Session-local; a
    * reopened index starts at 0 and falls back to the occupancy
    * heuristic. Atomic: concurrent ingests add and a sweep settles by
    * subtraction — a plain volatile read-modify-write could lose a
    * concurrent ingest's debt and wrongly license a sweep skip. */
  private val truncationDebt = new java.util.concurrent.atomic.AtomicLong(0L)
  def truncatedSinceSweep: Long = truncationDebt.get()

  /** THIS ingest attempt's truncation count, thread-confined: the
    * `lastTruncated` volatile is a racy latest-ingest observable (two
    * concurrent ingests overwrite each other — benign for alerting),
    * but the debt a thread adds after ITS append must be exactly what
    * ITS candidate pass truncated. */
  private val myTruncated = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  /** Ingest one batch of (vec_id, embedding: array<float|double>).
    * Serialized (see [[BatchedSignatureStore.serialized]]); the
    * truncation debt is added only after the batch durably appends and
    * only for the attempt that lands, so an aborted lost-race attempt
    * contributes nothing and a concurrent sweep can never settle debt
    * for rows it has not seen. */
  def ingest(emb: DataFrame): DedupIndex.IngestStats =
    serialized { graft.operators.Checkpoints.scoped {
    val batch = graft.operators.Checkpoints.ck(withSketch(emb, sketch))
    // one stats job: batch size + loud dim guard — a vector WIDER than
    // the sketch would silently lose its tail dimensions from every
    // projection (the sketch pads the short side with zeros, so narrower
    // vectors are fine). functions.size is shadowed by the store member.
    val batchStats = batch.agg(count(lit(1)),
      max(org.apache.spark.sql.functions.size(col("v")))).head()
    val nIn = batchStats.getLong(0)
    if (!batchStats.isNullAt(1) && batchStats.getInt(1) > sketch.dim)
      throw new IllegalArgumentException(
        s"embedding dim ${batchStats.getInt(1)} exceeds sketch dim ${sketch.dim}" +
          " — configure SemanticSketch(dim = ...) to the corpus dimension")
    val idx = vectors

    // exact stage first (bit-identical vectors, keyed on the content
    // hash): collapses replayed/duplicate rows AND zero-norm vectors,
    // which the null-safe cosine below never scores — without this,
    // re-ingesting a zero vector would grow the index every time
    val exactKeep = batch.groupBy("vhash").agg(min(col("vec_id")).as("vec_id"))
      .select("vec_id")
    // Index side semi-filtered by the batch's own hashes first (the
    // semi's build side is the small batch list, AQE-broadcast): the
    // standing index is scanned, never shuffled — a raw anti-join would
    // shuffle the full index vhash column on every ingest.
    val preExact = batch.join(exactKeep, "vec_id")
      .dropDuplicates("vhash") // fully identical rows (same id too) collapse
    val idxVhashHits = idx.select("vhash")
      .join(preExact.select("vhash"), Seq("vhash"), "left_semi").distinct()
    val afterExact = preExact
      .join(idxVhashHits, Seq("vhash"), "left_anti")
      .transform(graft.operators.Checkpoints.ck) // consumed 4x: bands, two cosine joins, anti-join

    // Candidate cap, enforced BEFORE the pair join ever runs: acceptors
    // are ranked per (band, bucket) and only the perBucketCap smallest
    // ids survive into pair formation, so per-probe candidates are
    // <= nBands * perBucketCap = maxCandidatesPerVector BY CONSTRUCTION
    // and — crucially — the pre-cap pair set is never materialized. The
    // previous shape exploded ALL bucket-collision pairs and then ranked
    // them with a per-probe window: at a fixed sketch granularity the
    // pair volume grows as n²/2^bitsPerBand, and the window's sort over
    // it filled the disk at a 100x corpus (500k docs / 200k vectors)
    // while the cap never even triggered. The ranking window here sorts
    // id-only ACCEPTOR rows (|index| * nBands), linear in the corpus.
    // With the cap pinned off (MaxValue) the ranking and the stats job
    // are pure overhead and are skipped entirely.
    val cap = sketch.maxCandidatesPerVector
    val capped =
      if (cap == Int.MaxValue) {
        lastCandidates = -1L; lastTruncated = 0L; myTruncated.set(0L)
        candidatePairs(afterExact, idx)
      } else cappedCandidatePairs(afterExact, idx,
        math.max(1, cap / sketch.nBands))

    val dropped = cosineDrops(capped, afterExact, idx)
    val survivors = afterExact
      .join(dropped, Seq("vec_id"), "left_anti")
      .transform(graft.operators.Checkpoints.ck)

    val nAdded = survivors.count()
    append(survivors, nAdded)
    // debt lands only AFTER the batch durably committed: a concurrent
    // sweep that read the pre-append store must not be able to settle
    // debt for rows it never saw (and a lost-race retry now counts its
    // truncation exactly once, on the attempt that actually lands)
    truncationDebt.addAndGet(myTruncated.get())
    DedupIndex.IngestStats(nIn = nIn, nAdded = nAdded, nDropped = nIn - nAdded)
    } }

  /** Candidate-pair formation (package-private so PlanSpec can pin its
    * physical plan): one ID-ONLY (band, bucket) row per band per vector —
    * the candidate blowup (pre-cap, potentially quadratic in a dense
    * bucket) shuffles bare id pairs; the ~KB vector payloads join in only
    * for the <= cap survivors in [[cosineDrops]]. OR-amplification =
    * union of per-band collisions. Acceptors: every accepted index
    * vector, plus post-exact batch vectors restricted to smaller ids (the
    * non-cascading one-pass rule). Equi-joins only — never all-pairs. */
  private def bands(df: DataFrame, suffix: String): DataFrame =
    df.select(col("vec_id").as(s"vec$suffix"), posexplode(col("buckets")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

  /** Acceptor bands, with the index side restricted to the (band,
    * bucket) cells the batch actually probes — a semi-join whose build
    * side is the small probe set (AQE-broadcast), so the standing index
    * is scanned but never shuffled, and the cap's ranking window sorts
    * only probed buckets' acceptors instead of |index| × nBands rows.
    * Acceptors in unprobed buckets can never form a pair, and ranks
    * don't interact across buckets, so the filter is semantics-free. */
  private def acceptorBands(afterExact: DataFrame, idx: DataFrame,
                            probes: DataFrame): DataFrame =
    bands(idx, "2")
      .join(probes.select("band", "bucket"), Seq("band", "bucket"), "left_semi")
      .withColumn("from_index", lit(true))
      .unionByName(bands(afterExact, "2").withColumn("from_index", lit(false)))

  private def pairJoin(probes: DataFrame, acceptors: DataFrame): DataFrame =
    probes.join(acceptors, Seq("band", "bucket"))
      .filter(col("from_index") || col("vec2") < col("vec1"))
      .dropDuplicates("vec1", "vec2", "from_index")

  private[graft] def candidatePairs(afterExact: DataFrame, idx: DataFrame): DataFrame = {
    val probes = bands(afterExact, "1")
    pairJoin(probes, acceptorBands(afterExact, idx, probes))
  }

  /** Capped pair formation: acceptors ranked per (band, bucket) by id
    * (the same deterministic smallest-first order the per-probe window
    * used), only `perBucketCap` per bucket join probes. Work stats come
    * from bucket occupancy aggregates (tiny: <= nBands * 2^bitsPerBand
    * rows after the groupBys), never from counting pair rows. The
    * resulting `lastCandidates` / `lastTruncated` are UPPER BOUNDS on
    * joined work, not surviving-pair counts: sum(np*na) also counts a
    * probe's collision with itself and the batch-acceptor pairs the
    * pairJoin ordering filter (vec2 < vec1) discards, as well as the
    * same pair met in multiple bands — so they are NOT comparable with
    * the exact per-probe pair stats earlier bench rounds reported, and
    * truncation alert thresholds should be calibrated against this
    * inflated denominator (the bound is what the join must touch, which
    * is the quantity the cap protects). Caveat:
    * the rank window sorts one bucket's acceptor ids on one task — id-
    * only rows, so even a fully degenerate bucket (every vector in one
    * bucket) is 16 bytes/vector, not a pair explosion. */
  private[graft] def cappedCandidatePairs(afterExact: DataFrame, idx: DataFrame,
                                          perBucketCap: Int): DataFrame = {
    val probes = graft.operators.Checkpoints.ck(bands(afterExact, "1"))
    val acceptors = acceptorBands(afterExact, idx, probes)
      .withColumn("arn", row_number().over(
        Window.partitionBy("band", "bucket")
          .orderBy(col("vec2"), col("from_index"))))
      .transform(graft.operators.Checkpoints.ck)
    val pStats = probes.groupBy("band", "bucket").agg(count(lit(1)).as("np"))
    val aStats = acceptors.groupBy("band", "bucket").agg(count(lit(1)).as("na"))
    val stats = pStats.join(aStats, Seq("band", "bucket"))
      .agg(
        sum(col("np") * col("na")).as("cands"),
        sum(col("np") * greatest(col("na") - perBucketCap, lit(0))).as("trunc"))
      .head()
    lastCandidates = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    // the DEBT add happens in ingest, after the batch durably appends —
    // adding here (before the rows exist in the store) let a concurrent
    // sweep that read the pre-append store settle debt for rows it never
    // saw, re-opening the wrongly-skipped-sweep hole
    lastTruncated = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    myTruncated.set(lastTruncated)
    if (lastTruncated > 0)
      System.err.println(s"[semantic-dedup] per-bucket acceptor cap " +
        s"$perBucketCap truncated ~$lastTruncated of ~$lastCandidates " +
        s"candidate pairs at $path — possible missed near-dups in a dense " +
        "bucket; raise bitsPerBand to match the corpus size")
    pairJoin(probes, acceptors.filter(col("arn") <= perBucketCap).drop("arn"))
  }

  /** Cosine scoring on the capped pairs only (package-private for the
    * PlanSpec pin): probe vectors join in from the batch, acceptor
    * vectors from the side the pair came from — two equi-joins per
    * branch, no broadcast-nested-loop, no cartesian. */
  private[graft] def cosineDrops(capped: DataFrame, afterExact: DataFrame,
                                 idx: DataFrame): DataFrame = {
    def sides(df: DataFrame, suffix: String) =
      df.select(col("vec_id").as(s"vec$suffix"), col("v").as(s"v$suffix"),
        col("nrm").as(s"n$suffix"))
    def drops(pairs: DataFrame, acceptorVecs: DataFrame) = pairs
      .join(sides(afterExact, "1"), "vec1")
      .join(acceptorVecs, "vec2")
      .filter(cosine >= threshold)
      .select(col("vec1").as("vec_id"))
    drops(capped.filter(col("from_index")), sides(idx, "2"))
      .unionByName(drops(capped.filter(!col("from_index")), sides(afterExact, "2")))
      .distinct()
  }

  /** Decide WHETHER a [[sweep]] is worth scheduling — the semantic twin
    * of [[MediaDedupIndex.sweepDecision]] (see its doc for the triad
    * rationale). Caps are per-VECTOR candidate budgets
    * (`maxCandidatesPerVector`-style, the unit callers configure);
    * each is translated to the per-(band, bucket) acceptor RANK cap
    * the intake actually truncates at (`max(1, cap / nBands)` — the
    * [[cappedCandidatePairs]] rule), and a bucket whose stored
    * population exceeds that rank cap is exactly a site where probes
    * may have been accepted past truncated acceptors. One aggregate
    * scan of the persisted bucket assignments — no projections
    * recomputed, no candidate join. The `cap` column reports the
    * derived per-bucket rank cap. `productionCap` defaults to the
    * sketch-class default budget, NOT this instance's (a demo-capped
    * index must contrast against production, not itself). */
  def sweepDecision(intakeCap: Int,
                    productionCap: Int =
                      SemanticSketch().maxCandidatesPerVector): DataFrame = {
    val pops = vectors
      .select(posexplode(col("buckets")).as(Seq("band", "bucket")))
      .groupBy("band", "bucket").agg(count(lit(1)).as("pop"))
    val n = size
    def at(name: String, perVec: Int): DataFrame = {
      val cap = math.max(1, perVec / sketch.nBands)
      pops.agg(
        coalesce(sum(when(col("pop") > cap, 1L).otherwise(0L)), lit(0L))
          .as("hot_buckets"),
        coalesce(sum(when(col("pop") > cap, col("pop"))), lit(0L))
          .cast("long").as("hot_mass"),
        coalesce(max(col("pop")), lit(0L)).cast("long").as("max_pop"))
        .select(lit(name).as("cap_name"), lit(cap.toLong).as("cap"),
          col("hot_buckets"), col("hot_mass"), col("max_pop"),
          lit(n).as("n_rows"),
          (col("hot_buckets") > 0).cast("long").as("sweep_recommended"))
    }
    at("intake", intakeCap).unionByName(at("production", productionCap))
  }

  /** The triad as ONE operational verb — see
    * [[MediaDedupIndex.sweepIfRecommended]] for the shape. `intakeCap`
    * is the per-vector candidate budget the intakes ran at. The gate
    * here is SOUND within a session: it sweeps when the occupancy
    * profile is hot OR when [[truncatedSinceSweep]] is nonzero, and by
    * the one-pass acceptance law a needed sweep implies truncation
    * happened — so a skip can only be wrong across a session restart
    * (counter lost), where the occupancy heuristic alone can miss a
    * bucket that cooled below the cap after admitting through it.
    * Restart-heavy deployments should run `sweep()` unconditionally on
    * their cadence instead — the empty-edge short-circuit makes a
    * needless one cost one candidate pass. */
  def sweepIfRecommended(intakeCap: Int,
                         bucketCap: Int = graft.operators.BandedLsh.BucketCap,
                         escLevels: Int = 2)
      : Option[BatchedSignatureStore.SweepStats] = {
    val hot = sweepDecision(intakeCap)
      .filter(col("cap_name") === "intake")
      .agg(max(col("sweep_recommended"))).head.getLong(0)
    if (hot == 0L && truncatedSinceSweep == 0L) None
    else Some(sweep(bucketCap, escLevels))
  }

  /** Full-recall dedup SWEEP over the standing index — the semantic twin
    * of [[MediaDedupIndex.sweep]] and the compact-thorough half of this
    * index's LSM split: [[ingest]]'s per-bucket acceptor cap fails
    * CONSERVATIVELY (a probe whose true near-dup acceptor ranks past the
    * cap in a dense bucket is ACCEPTED — an extra near-dup in the index,
    * never a lost vector), and this pass recovers exactly that forfeited
    * recall on the compaction cadence. The batch pair discipline runs
    * over the PERSISTED rows — no re-embedding: vectors, norms and
    * buckets are all index columns, and the escalation keys are extra
    * hyperplane bands (band ids [[SemanticSketch.nBands]]..+escLevels-1,
    * locality-preserving by the same sign-LSH law as the primary bands)
    * derived from the stored vector. Exact-collapse keys on `vhash`
    * (ingest guarantees index-wide uniqueness, so groups are singletons
    * in practice — the collapse is kept for the discipline's shape and
    * for stores assembled by other writers), a hot (band, bucket) keeper
    * set escalates through the extra bands, and a TERMINALLY hot bucket
    * — the never-splittable dense-cluster shape — contributes hub-star
    * candidates instead of dropping
    * ([[graft.operators.BandedLsh]]), keeper candidate pairs are
    * cosine-verified at the index threshold, and every non-keeper member
    * of a verified component (keeper = min vec_id) is EVICTED; survivors
    * rewrite as one consolidated batch
    * ([[BatchedSignatureStore.rewriteAll]], compact-grade crash safety).
    * On an index built at the PRODUCTION cap the sweep is a no-op by the
    * one-pass acceptance law: a surviving pair with cosine >= threshold
    * would have dropped its larger member at its own ingest (the smaller
    * member is always an acceptor — non-cascading), so verified pairs
    * only exist where a cap actually truncated (SemanticSweepSpec pins
    * both directions). */
  def sweep(bucketCap: Int = graft.operators.BandedLsh.BucketCap,
            escLevels: Int = 2): BatchedSignatureStore.SweepStats =
    graft.operators.Checkpoints.scoped {
    // debt snapshot BEFORE the index is read: only the truncation this
    // sweep can actually see is settled, and only once the conclusion
    // (either branch) is reached — a throw mid-sweep keeps the debt, and
    // a concurrent ingest's fresh truncation (landing after this read)
    // keeps ITS debt, so a later sweepIfRecommended cannot wrongly skip
    val debt0 = truncatedSinceSweep
    val nBefore = size
    val vecs = graft.operators.Checkpoints.ck(vectors)
    val in = sweepLshInput(vecs, escLevels)
    // terminalStar: a genuinely dense semantic cluster agrees on the
    // escalation bands too (near-parallel vectors share every sign
    // projection), so the ladder can never split its bucket — the star
    // contributes (hub, member) candidates at O(bucket) and the cosine
    // verify + connected components collapse the cluster transitively
    val (collapsed, kp) = graft.operators.BandedLsh.collapsedPairs(
      in, nBands = sketch.nBands, maxHamming = None,
      bucketCap = bucketCap, escLevels = escLevels, terminalStar = true)
    val verified = kp
      .join(vecs.select(col("vec_id").as("g1"), col("v").as("v1"),
        col("nrm").as("n1")), "g1")
      .join(vecs.select(col("vec_id").as("g2"), col("v").as("v2"),
        col("nrm").as("n2")), "g2")
      .filter(cosine >= threshold)
      .select(col("g1").as("doc1"), col("g2").as("doc2"))
    // materialized once: CC scans its edge input twice (nodes + the
    // canonical edge set), which would re-run the banded join + cosine
    // verify; and an EMPTY set short-circuits the whole act
    val edges = graft.operators.Checkpoints.ck(verified
      .unionByName(graft.operators.BandedLsh.starEdges(collapsed)))
    if (edges.isEmpty) {
      // nothing to evict (provable on a production-cap index by the
      // one-pass acceptance law): skip connected components AND the
      // full-index rewrite — a no-op sweep costs one candidate pass,
      // no I/O churn, no store-version turnover. This short-circuit IS
      // a full-recall conclusion, so the snapshot debt is settled.
      truncationDebt.addAndGet(-debt0)
      BatchedSignatureStore.SweepStats(nBefore, nBefore, 0L)
    } else {
      val comp = graft.operators.ConnectedComponents(edges)
      val keep = vecs.join(comp, vecs("vec_id") === comp("node"), "left")
        .filter(coalesce(col("component"), col("vec_id")) === col("vec_id"))
        .select(vecSchema.fieldNames.map(col): _*)
        .transform(graft.operators.Checkpoints.ck)
      rewriteAll(keep)
      // debt settled only now that the eviction durably committed
      truncationDebt.addAndGet(-debt0)
      val nKept = size
      BatchedSignatureStore.SweepStats(nBefore, nKept, nBefore - nKept)
    }
    }

  /** [[graft.operators.BandedLsh]] input over the persisted rows:
    * (doc_id, sig = vhash, b0..b{nBands-1} from the STORED buckets,
    * e0..e{L-1} = the next `escLevels` hyperplane bands computed fresh
    * from the stored vector — same seed stream, band ids continuing past
    * the primary bands, so they refine with independent sign bits). */
  private def sweepLshInput(vecs: DataFrame, escLevels: Int): DataFrame = {
    val allBands = graft.functions.GraftFunctions.hyperplane_buckets(
      col("v"), sketch.nBands + escLevels, sketch.bitsPerBand, sketch.dim,
      sketch.seed)
    vecs.select(
      col("vec_id").as("doc_id") +: col("vhash").as("sig") +:
        ((0 until sketch.nBands)
          .map(i => element_at(col("buckets"), i + 1).as(s"b$i")) ++
          (0 until escLevels)
            .map(k => element_at(allBands, sketch.nBands + k + 1).as(s"e$k"))): _*)
  }
}

object SemanticDedupIndex {

  import org.apache.spark.sql.types._

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("nrm", DoubleType),
    StructField("buckets", ArrayType(IntegerType)),
    StructField("vhash", StringType)))

  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_double(a, b)

  /** Null-safe cosine: a zero norm yields NULL (nullif), not a
    * DIVIDE_BY_ZERO — under Spark 4's default ANSI mode a plain division
    * would THROW when an accepted zero vector shares a bucket with any
    * candidate, killing the whole ingest job. NULL never clears the
    * threshold filter, so zero vectors simply never near-dup. */
  private val cosine: Column =
    dot(col("v1"), col("v2")) / nullif(col("n1") * col("n2"), lit(0.0))

  def withSketch(emb: DataFrame, sk: SemanticSketch): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // all band buckets in ONE codegen'd pass (the column-HOF form below
      // pays nBands*bitsPerBand interpreted folds per row); equality of
      // the two forms is pinned by ExpressionsSpec
      .withColumn("buckets", graft.functions.GraftFunctions
        .hyperplane_buckets(col("v"), sk.nBands, sk.bitsPerBand, sk.dim, sk.seed))
      // Exact-dup content key. `x + 0.0` canonicalizes -0.0 to +0.0 before
      // the JSON rendering, so the grouping agrees with SQL list equality
      // (where -0.0 = 0.0) — the DuckDB oracle keys on `GROUP BY v`.
      // Remaining precondition (documented at the oracle SQL): no NaN
      // payloads, which JSON would render distinct while SQL groups equal.
      .withColumn("vhash",
        md5(to_json(transform(col("v"), x => x + lit(0.0)))))

  /** The declarative column formulation of the sketch buckets — the form
    * the DuckDB oracle mirrors and the parity reference for the native
    * expression. zip_with pads the SHORTER side with nulls, so coalesce→0
    * makes malformed short (or over-long) embeddings contribute zero
    * instead of nulling the whole projection (ANSI-safe — no throw). */
  private[graft] def bucketsHof(sk: SemanticSketch): Column = {
    def proj(b: Int, j: Int): Column =
      aggregate(
        zip_with(col("v"), lit(sk.hyperplane(b, j)),
          (x, h) => coalesce(x * h, lit(0.0))),
        lit(0.0), (acc, x) => acc + x)
    def bucket(b: Int): Column =
      (0 until sk.bitsPerBand)
        .map(j => when(proj(b, j) > 0, 1 << j).otherwise(0))
        .reduce(_ + _)
    array((0 until sk.nBands).map(bucket): _*)
  }
}
