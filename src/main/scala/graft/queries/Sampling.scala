package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling / splitting operators for a training-data
  * pipeline: train/val/test split assignment, per-stratum sampling, and
  * source-mixture reweighting. All three key on a salted md5 bucket of
  * the document id, which buys the properties a 100 TB corpus needs:
  *
  *  - content-stable: re-runs, retried partitions, and late-arriving
  *    shards assign every doc the same way (no RNG state, no seed-per-
  *    partition drift, no dependence on row order or partition count);
  *  - leak-proof: a doc can never migrate between train and test across
  *    pipeline versions as long as the salt is fixed;
  *  - shuffle-free where possible: split assignment and mixture
  *    downsampling are pure map-side projections/filters (zero
  *    shuffles); the stratified sample pays exactly one keyed shuffle
  *    of at most k rows per partition (bounded top-k buffers);
  *  - oracle-replayable: md5 is engine-neutral, so DuckDB reproduces
  *    the exact buckets (the same trick the MinHash / hyperplane-sketch
  *    oracles use).
  *
  * The reference pipeline has no sampling stage (it processes full
  * harvests); these are part of the builder-prompt's training-data
  * extensions, sized for the corpus scale the engine targets.
  */
object Sampling {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Salted content bucket in [0, mod): first 8 md5 hex digits of
    * "salt|id", reduced mod `mod` (the hash has 2^32 range, so any mod up
    * to ~10^6 keeps the buckets uniform). SQL twin: `('0x' ||
    * substr(md5('salt|' || CAST(id AS VARCHAR)), 1, 8))::UBIGINT % mod`. */
  private[queries] def bucket(salt: String, id: Column, mod: Long): Column =
    conv(substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % mod

  private[queries] def bucketSql(salt: String, id: String, mod: Long): String =
    s"('0x' || substr(md5('$salt|' || CAST($id AS VARCHAR)), 1, 8))::UBIGINT % $mod"

  /** Percent bucket in [0, 100) — shared with [[Corpus.decontaminate]] so
    * the decontamination stage sees the exact same train/test membership
    * the split stage assigned. */
  private[queries] def pctBucket(salt: String, id: Column): Column =
    bucket(salt, id, 100L)

  private[queries] def pctBucketSql(salt: String, id: String): String =
    bucketSql(salt, id, 100L)

  /** 90/5/5 train/val/test assignment, content-stable per doc. A pure
    * projection — no shuffle, no state; the split of a doc is a function
    * of its id alone. */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val b = pctBucket("split", col("doc_id"))
    t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
  }

  val splitAssignSql: String = {
    val b = pctBucketSql("split", "doc_id")
    s"""SELECT doc_id, lang,
       |  CASE WHEN $b < 90 THEN 'train'
       |       WHEN $b < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Deterministic k-per-stratum sample (here: 30 docs per language):
    * rank docs inside each stratum by their full 32-bit salted hash
    * (doc_id tiebreak) and keep the first k — a uniform sample without
    * replacement that every re-run reproduces bit-for-bit.
    *
    * Computed with the bounded map-side [[graft.functions.TopKAggregator]]
    * rather than a per-stratum window: row_number over a stratum SORTS
    * THE WHOLE STRATUM on one reducer (a language at 100 TB is a
    * terabyte-scale partition), while the aggregator's partial buffers
    * trim to k per stratum per partition before the shuffle, so at most
    * k·|strata|·partitions rows move (k·partitions per stratum) and
    * nothing ever fully sorts. Ordering contract matches
    * the window form exactly (h asc, doc_id asc — the oracle's
    * row_number); the negated hash maps it onto the aggregator's
    * (value desc, id asc) and is exact (h < 2^32 « 2^53). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TopHit, TopKAggregator}
    val h = conv(substring(md5(concat(lit("samp|"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), h.as("h"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, id, hv) => TopHit(-hv.toDouble, id) }
      .agg(new TopKAggregator(30).toColumn.name("hits"))
      .flatMap { case (lang, hits) =>
        hits.zipWithIndex.map { case (th, i) => (th.id, lang, (i + 1).toLong) }
      }
      .toDF("doc_id", "lang", "rank_in_lang")
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang, CAST(rn AS BIGINT) AS rank_in_lang FROM (
      |  SELECT doc_id, lang, row_number() OVER (
      |    PARTITION BY lang
      |    ORDER BY ('0x' || substr(md5('samp|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT, doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 30""".stripMargin

  /** Source-mixture reweighting: each source keeps a configured fraction
    * of its docs (the data-mixing stage of corpus assembly — upweight
    * curated sources, downsample the web crawl). Deterministic via the
    * percent bucket, so the mixture is reproducible and monotone in the
    * fraction (raising 25% to 50% only ADDS docs — the kept set at p is
    * a prefix of the kept set at q > p). A pure filter: zero shuffles. */
  def sourceMixture(s: SparkSession, dir: String): DataFrame =
    mixtureKept(t(s, dir, "documents"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))

  /** The mixture FILTER itself (docs the configured mixture keeps) — the
    * form a pipeline chains; [[sourceMixture]] is its graded aggregate. */
  def mixtureKept(docs: DataFrame): DataFrame = {
    val keepPct =
      when(col("source").isin("src0", "src1", "src2"), 100)
        .when(col("source").isin("src3", "src4"), 50)
        .otherwise(25)
    docs.filter(pctBucket("mix", col("doc_id")) < keepPct)
  }

  val sourceMixtureSql: String = {
    val b = pctBucketSql("mix", "doc_id")
    s"""SELECT source, COUNT(*) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
       |FROM documents
       |WHERE $b < CASE WHEN source IN ('src0','src1','src2') THEN 100
       |                WHEN source IN ('src3','src4') THEN 50
       |                ELSE 25 END
       |GROUP BY source""".stripMargin
  }

  /** Micro-bucket granularity for computed (non-config) keep fractions:
    * fractions are floored to integer millionths so the keep test is
    * integer-exact and engine-neutral, like the percent buckets. */
  private val MixMicro = 1000000L

  /** Temperature exponent for [[temperatureMix]]. α ∈ (0, 1) flattens the
    * language distribution (α→0 fully uniform, α=1 unchanged); 0.5 is
    * the square-root rebalancing common for multilingual corpora. */
  private val MixAlpha = 0.5

  /** Temperature-based LANGUAGE rebalancing (the α-power resampling used
    * to flatten multilingual mixtures — the stratum is `lang`; the
    * config-driven per-SOURCE stage is [[sourceMixture]]): after
    * downsampling, language shares are proportional to p_l^α instead of
    * p_l. Solving post_count ∝ p_l^α for a per-language keep fraction and
    * normalizing so the smallest language keeps everything gives the
    * closed form f_l = (c_min / c_l)^(1-α) — sqrt(c_min/c_l) at α = 1/2.
    * Membership is the salted micro-bucket, so the resample is
    * content-stable and monotone in f like [[mixtureKept]].
    *
    * Determinism across engines: c_min/c_l (IEEE double divide) and sqrt
    * are both correctly-rounded operations, so Spark and the oracle floor
    * the SAME double to the SAME integer micro-threshold — no float
    * comparison ever crosses the engine boundary. (General pow carries no
    * such guarantee — Java's is 1-ulp, libm varies — so the α = 1/2 form
    * computes through sqrt on both sides; other α stay in the law-tested
    * generic path, not the oracle-graded one.)
    *
    * Scale: pass 1 is a map-side-combined count per language (rows =
    * |langs|, config-scale); the thresholds broadcast back onto the
    * corpus for a map-side filter; pass 2 re-counts the kept docs. Two
    * tiny keyed shuffles, zero corpus-sized sorts. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame =
    temperatureMixOf(t(s, dir, "documents"), MixAlpha)

  /** Per-language keep thresholds — (lang, n_total, keep_micro),
    * |langs| rows. */
  private[graft] def temperatureThresholds(docs: DataFrame,
                                           alpha: Double): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
    // |langs| rows by construction — the one-row-stats broadcast pattern
    val cmin = counts.agg(min(col("n_total")).as("c_min"))
    val ratio = col("c_min").cast("double") / col("n_total")
    val f = if (1.0 - alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    counts.crossJoin(broadcast(cmin))
      .select(col("lang"), col("n_total"),
        floor(f * MixMicro).cast("long").as("keep_micro"))
  }

  /** The ONE membership test both the filter and the audit share: docs
    * surviving the given thresholds. A single code path so the graded
    * numbers and the docs a pipeline actually keeps can never drift. */
  private def keptWith(docs: DataFrame, thresholds: DataFrame): DataFrame =
    docs
      .join(broadcast(thresholds.select("lang", "keep_micro")), "lang")
      .filter(bucket("temp", col("doc_id"), MixMicro) < col("keep_micro"))

  /** The temperature FILTER itself (docs the flattened mixture keeps) —
    * the form a pipeline chains; [[temperatureMixOf]] is its graded
    * per-language audit over the same membership. */
  private[graft] def temperatureKept(docs: DataFrame, alpha: Double): DataFrame =
    keptWith(docs, temperatureThresholds(docs, alpha))
      .select(docs.columns.map(col): _*)

  private[graft] def temperatureMixOf(docs: DataFrame, alpha: Double): DataFrame = {
    val thresholds = temperatureThresholds(docs, alpha)
    val kept = keptWith(docs, thresholds)
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    thresholds.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"), col("keep_micro"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  val temperatureMixSql: String = {
    val b = bucketSql("temp", "doc_id", MixMicro)
    s"""WITH counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_total
       |  FROM documents GROUP BY lang),
       |thr AS (
       |  SELECT lang, n_total,
       |    CAST(floor(sqrt((SELECT CAST(min(n_total) AS DOUBLE) FROM counts)
       |      / n_total) * $MixMicro) AS BIGINT) AS keep_micro
       |  FROM counts),
       |kept AS (
       |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
       |  FROM documents d JOIN thr USING (lang)
       |  WHERE $b < thr.keep_micro GROUP BY d.lang)
       |SELECT thr.lang, thr.n_total, thr.keep_micro,
       |  COALESCE(kept.n_kept, 0) AS n_kept
       |FROM thr LEFT JOIN kept USING (lang)""".stripMargin
  }

  /** Per-source character budget for [[budgetCap]]. */
  private val CharBudget = 4000L

  /** Per-source CHARACTER-BUDGET cap — the budgeted-selection stage that
    * builds a fixed-size corpus: each source keeps docs greedily in
    * salted-hash order until the next doc would exceed its
    * [[CharBudget]]. Complements the other sampling stages — split is a
    * percentage, stratified is k DOCS per stratum, mixture/temperature
    * are keep FRACTIONS; this is the only one whose cut point is a
    * BYTE/char budget, which is how training-corpus size targets are
    * actually specified. Hash order makes the selection content-stable
    * (same docs on every re-run) and unbiased (a uniform sample prefix,
    * not "the earliest docs").
    *
    * Scale: the running total comes from
    * [[graft.operators.KeyedCumsum]] — range-partitioned two-level
    * cumsum, so no source is ever sorted on a single reducer. One
    * bounded collect (partitions × |sources|), one broadcast join, one
    * final aggregate. */
  def budgetCap(s: SparkSession, dir: String): DataFrame = {
    val h = bucket("cap", col("doc_id"), 4294967296L)
    val docs = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"), h.as("h"))
    graft.operators.KeyedCumsum(s, docs, key = "source",
        order = Seq("h", "doc_id"), value = "n_chars", out = "cum")
      .filter(col("cum") <= CharBudget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("chars_kept"))
  }

  val budgetCapSql: String = {
    val h = bucketSql("cap", "doc_id", 4294967296L)
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
       |FROM (
       |  SELECT source, n_chars,
       |    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM (SELECT source, doc_id, n_chars, $h AS h FROM documents))
       |WHERE cum <= $CharBudget
       |GROUP BY source""".stripMargin
  }

  /** Deterministic curriculum interleave: each source's docs get a stable
    * pseudo-random order (salted md5 hash — the same content-stable
    * shuffle the split uses), and the global training order round-robins
    * the sources: global_pos = (rank_in_source − 1)·|sources| +
    * source_idx. The training loader reads shards sorted by global_pos
    * and sees sources interleaved 1:1:… with each source internally
    * shuffled — with NO global sort or single-partition window anywhere:
    * per-source ranks come from [[graft.operators.KeyedCumsum]]'s
    * two-level cumsum (rank = running sum of 1s), the source dim is a
    * tiny broadcast, and the position is arithmetic. */
  def interleave(s: SparkSession, dir: String): DataFrame =
    interleaveOf(t(s, dir, "documents"))

  /** Frame-level interleave over any (doc_id, source) docs — the unit
    * CorpusDemo chains after packing-eligible selection. */
  def interleaveOf(docsIn: DataFrame): DataFrame = {
    val s = docsIn.sparkSession
    val h = bucket("curr", col("doc_id"), 4294967296L)
    val docs = docsIn
      .select(col("doc_id"), col("source"), h.as("h"), lit(1L).as("one"))
    val ranked = graft.operators.KeyedCumsum(s, docs, key = "source",
        order = Seq("h", "doc_id"), value = "one", out = "src_rank")
    val srcW = Window.orderBy("source") // tiny: |sources| rows
    val dim = docs.select("source").distinct()
      .withColumn("source_idx", row_number().over(srcW).cast("long") - 1)
    val ns = dim.agg(count(lit(1)).as("ns"))
    ranked
      .join(broadcast(dim), "source")
      .crossJoin(broadcast(ns))
      .select(col("doc_id"), col("source"), col("src_rank"),
        ((col("src_rank") - 1) * col("ns") + col("source_idx"))
          .as("global_pos"))
  }

  val interleaveSql: String = {
    val h = bucketSql("curr", "doc_id", 4294967296L)
    """WITH d AS (SELECT doc_id, source, HEXPR AS h FROM documents),
      |dim AS (SELECT source,
      |  CAST(row_number() OVER (ORDER BY source) AS BIGINT) - 1 AS source_idx
      |  FROM (SELECT DISTINCT source FROM d)),
      |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dim),
      |ranked AS (SELECT doc_id, source,
      |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS src_rank
      |  FROM d)
      |SELECT r.doc_id, r.source, r.src_rank,
      |  (r.src_rank - 1) * ns.n + dim.source_idx AS global_pos
      |FROM ranked r JOIN dim USING (source) CROSS JOIN ns""".stripMargin
      .replace("HEXPR", h)
  }

  /** Weight-proportional sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each doc draws a content-stable uniform u from the
    * salted hash and ranks by the exponential-race key ln(u)/w (the
    * log-monotone twin of u^(1/w)); the global top-n IS a weighted
    * sample without replacement — the standard one-pass, shuffle-free
    * way to build a quality- or length-weighted training subset. Weight
    * here = n_chars (longer docs proportionally likelier), floored at 1.
    *
    * Scale: a pure projection followed by orderBy+limit — Catalyst
    * plans TakeOrderedAndProject (per-partition top-n, then a single
    * n-row merge on one reducer; NO global sort, NO full shuffle), and
    * the rank window runs AFTER the limit, over n rows. Determinism:
    * u is a dyadic rational from the md5 bucket, and ties on the key
    * break by doc_id. */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    weightedSampleOf(t(s, dir, "documents"), "wsample", 100)
      .select(col("rank"), col("doc_id"), col("source"), col("n_chars"),
        round(col("r"), 6).as("es_key"))

  /** The reusable core: docs needs (doc_id, n_chars); returns the top-n
    * rows with their raw exponential-race key `r` and 1-based `rank`. */
  private[graft] def weightedSampleOf(docs: DataFrame, salt: String,
                                      n: Int): DataFrame = {
    val u = (bucket(salt, col("doc_id"), 4294967296L) + lit(1L))
      .cast("double") / lit(4294967296.0)
    val wt = greatest(col("n_chars"), lit(1L)).cast("double")
    val w = Window.orderBy(col("r").desc, col("doc_id"))
    docs
      .withColumn("r", log(u) / wt)
      .orderBy(col("r").desc, col("doc_id")).limit(n)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  val weightedSampleSql: String =
    s"""WITH w AS (SELECT doc_id, source, n_chars,
       |  ln((${bucketSql("wsample", "doc_id", 4294967296L)} + 1) / 4294967296.0)
       |    / GREATEST(n_chars, 1)::DOUBLE AS r
       |  FROM documents),
       |top AS (SELECT * FROM w ORDER BY r DESC, doc_id LIMIT 100)
       |SELECT row_number() OVER (ORDER BY r DESC, doc_id) AS rank,
       |  doc_id, source, n_chars, round(r, 6) AS es_key
       |FROM top""".stripMargin

  /** Largest-remainder quota allocation (Hamilton's method) + exact
    * per-source selection — how a mixture target ("train on T docs
    * apportioned by source size") becomes per-source integer quotas
    * that sum EXACTLY to T: base = floor(T·w/W) per source, and the
    * T − Σbase leftover units go to the largest remainders
    * ((T·w) mod W, ties on source). Every step is integer arithmetic —
    * no float apportionment drift in either engine — and the selection
    * leg then actually PICKS quota docs per source in content-stable
    * hash order, proving the allocation is realizable (picked =
    * min(quota, group size)).
    *
    * Scale: one groupBy over the corpus for the weights; the remainder
    * ranking windows over the SOURCE DIMENSION (bounded, ~20 rows —
    * never the corpus); selection is one keyed window per source. */
  def groupQuota(s: SparkSession, dir: String): DataFrame =
    groupQuotaOf(t(s, dir, "documents"), 200L)

  /** The reusable core: docs needs (doc_id, source, n_chars). */
  private[graft] def groupQuotaOf(docs: DataFrame, T: Long): DataFrame = {
    val g = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("w"))
    val tot = g.agg(sum(col("w")).as("wt"))
    val a = g.crossJoin(broadcast(tot)) // tot is ONE row by construction
      .withColumn("base", expr(s"($T * w) div wt"))
      .withColumn("rem", (lit(T) * col("w")) % col("wt"))
    val lr = a.agg((lit(T) - sum(col("base"))).as("leftover"))
    val wr = Window.orderBy(col("rem").desc, col("source"))
    val q = a.withColumn("rk", row_number().over(wr))
      .crossJoin(broadcast(lr)) // one row
      .withColumn("quota",
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .cast("long"))
    val wp = Window.partitionBy("source")
      .orderBy(bucket("quota", col("doc_id"), 4294967296L), col("doc_id"))
    val sel = docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(wp))
      .join(q.select(col("source"), col("quota")), "source")
      .filter(col("rn") <= col("quota"))
      .groupBy("source").agg(count(lit(1)).as("picked"))
    q.select(col("source"), col("n_docs"), col("w").as("weight"), col("quota"))
      .join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("weight"), col("quota"),
        coalesce(col("picked"), lit(0L)).as("picked"))
  }

  val groupQuotaSql: String = {
    val b = bucketSql("quota", "doc_id", 4294967296L)
    s"""WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS w FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM g),
       |a AS (SELECT g.*, (200 * w) // tot.wt AS base, (200 * w) % tot.wt AS rem
       |  FROM g, tot),
       |lr AS (SELECT CAST(200 - sum(base) AS BIGINT) AS leftover FROM a),
       |q AS (SELECT source, n_docs, w,
       |  CAST(base + CASE WHEN rk <= lr.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
       |  FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM a), lr),
       |sel AS (SELECT d.source, CAST(count(*) AS BIGINT) AS picked FROM (
       |    SELECT doc_id, source,
       |      row_number() OVER (PARTITION BY source ORDER BY $b, doc_id) AS rn
       |    FROM documents) d
       |  JOIN q ON q.source = d.source AND d.rn <= q.quota
       |  GROUP BY d.source)
       |SELECT q.source, q.n_docs, q.w AS weight, q.quota,
       |  COALESCE(sel.picked, 0) AS picked
       |FROM q LEFT JOIN sel USING (source)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_group_quota" -> groupQuota _,
    "q_weighted_sample" -> weightedSample _,
    "q_interleave" -> interleave _,
    "q_split_assign" -> splitAssign _,
    "q_stratified_sample" -> stratifiedSample _,
    "q_source_mixture" -> sourceMixture _,
    "q_temperature_mix" -> temperatureMix _,
    "q_budget_cap" -> budgetCap _)

  val oracles: Map[String, String] = Map(
    "q_group_quota" -> groupQuotaSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_interleave" -> interleaveSql,
    "q_split_assign" -> splitAssignSql,
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_source_mixture" -> sourceMixtureSql,
    "q_temperature_mix" -> temperatureMixSql,
    "q_budget_cap" -> budgetCapSql)
}
