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

  /** Candidate-pair count of the latest [[ingest]] (pre-cap; -1 when the
    * cap is pinned off and the counting pass is skipped), and how many of
    * those the per-vector cap truncated. A nonzero truncation count means
    * recall loss on some dense cluster — it is logged loudly and surfaced
    * here so callers can alert on it. */
  @volatile var lastCandidates: Long = 0L
  @volatile var lastTruncated: Long = 0L

  /** Ingest one batch of (vec_id, embedding: array<float|double>). */
  def ingest(emb: DataFrame): DedupIndex.IngestStats = {
    val batch = withSketch(emb, sketch).localCheckpoint()
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
    val afterExact = batch.join(exactKeep, "vec_id")
      .dropDuplicates("vhash") // fully identical rows (same id too) collapse
      .join(idx.select("vhash"), Seq("vhash"), "left_anti")
      .localCheckpoint() // consumed 4x: bands, two cosine joins, anti-join

    val candidates = candidatePairs(afterExact, idx)

    // per-probe candidate cap: a dense semantic cluster (one bucket with
    // k accepted vectors) would otherwise cost every new probe k cosines.
    // Deterministic truncation order (neighbor id); the count is the loud
    // metric — truncation trades bounded work for possible missed drops.
    // With the cap pinned off (MaxValue) the ranking window, its shuffle
    // and the stats job are pure overhead and are skipped entirely.
    val cap = sketch.maxCandidatesPerVector
    val capped =
      if (cap == Int.MaxValue) { lastCandidates = -1L; lastTruncated = 0L; candidates }
      else {
        val ranked = candidates
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec1").orderBy(col("vec2"), col("from_index"))))
          .localCheckpoint()
        val capStats = ranked.agg(
          count(lit(1)).as("n"),
          sum(when(col("rn") > cap, 1L).otherwise(0L)).as("trunc")).head()
        lastCandidates = capStats.getLong(0)
        lastTruncated = if (capStats.isNullAt(1)) 0L else capStats.getLong(1)
        if (lastTruncated > 0)
          System.err.println(s"[semantic-dedup] per-vector candidate cap $cap " +
            s"truncated $lastTruncated of $lastCandidates candidate pairs at " +
            s"$path — possible missed near-dups in a dense cluster")
        ranked.filter(col("rn") <= cap)
      }

    val dropped = cosineDrops(capped, afterExact, idx)
    val survivors = afterExact
      .join(dropped, Seq("vec_id"), "left_anti")
      .localCheckpoint()

    val nAdded = survivors.count()
    append(survivors, nAdded)
    DedupIndex.IngestStats(nIn = nIn, nAdded = nAdded, nDropped = nIn - nAdded)
  }

  /** Candidate-pair formation (package-private so PlanSpec can pin its
    * physical plan): one ID-ONLY (band, bucket) row per band per vector —
    * the candidate blowup (pre-cap, potentially quadratic in a dense
    * bucket) shuffles bare id pairs; the ~KB vector payloads join in only
    * for the <= cap survivors in [[cosineDrops]]. OR-amplification =
    * union of per-band collisions. Acceptors: every accepted index
    * vector, plus post-exact batch vectors restricted to smaller ids (the
    * non-cascading one-pass rule). Equi-joins only — never all-pairs. */
  private[graft] def candidatePairs(afterExact: DataFrame, idx: DataFrame): DataFrame = {
    def bands(df: DataFrame, suffix: String) =
      df.select(col("vec_id").as(s"vec$suffix"), posexplode(col("buckets")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val acceptors = bands(idx, "2").withColumn("from_index", lit(true))
      .unionByName(bands(afterExact, "2").withColumn("from_index", lit(false)))
    bands(afterExact, "1")
      .join(acceptors, Seq("band", "bucket"))
      .filter(col("from_index") || col("vec2") < col("vec1"))
      .dropDuplicates("vec1", "vec2", "from_index")
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
