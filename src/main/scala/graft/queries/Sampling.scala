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

  /** Percent bucket in [0, 100): first 8 md5 hex digits of "salt|id".
    * SQL twin: `('0x' || substr(md5('salt|' || CAST(id AS VARCHAR)), 1,
    * 8))::UBIGINT % 100`. Shared with [[Corpus.decontaminate]] so the
    * decontamination stage sees the exact same train/test membership the
    * split stage assigned. */
  private[queries] def pctBucket(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % 100

  private[queries] def pctBucketSql(salt: String, id: String): String =
    s"('0x' || substr(md5('$salt|' || CAST($id AS VARCHAR)), 1, 8))::UBIGINT % 100"

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
    * trim to k per partition before the shuffle, so at most k·partitions
    * rows move and nothing ever fully sorts. Ordering contract matches
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_assign" -> splitAssign _,
    "q_stratified_sample" -> stratifiedSample _,
    "q_source_mixture" -> sourceMixture _)

  val oracles: Map[String, String] = Map(
    "q_split_assign" -> splitAssignSql,
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_source_mixture" -> sourceMixtureSql)
}
