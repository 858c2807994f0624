package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Corpus-assembly audit operators for a training-data pipeline:
  * benchmark decontamination, BM25 retrieval audit, and exact length
  * quantiles. These extend the reference's harvest/clean surface with the
  * stages a 100 TB pretraining-corpus build needs between cleaning and
  * packing (the builder prompt's training-data extensions; the reference
  * pipeline itself stops at quality filtering —
  * /root/reference/code/transform per SURVEY §2.3).
  */
object Corpus {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Decontamination n-gram width. 5 keeps the probe discriminative on
    * the synthetic corpus (3-grams collide on ~90% of docs, 5-grams only
    * on planted near-duplicates); real pipelines use 8-13 (GPT-3 used 13)
    * — the plan shape is identical for any n. */
  private val DecontamN = 5

  /** Benchmark decontamination: drop from the train split every doc that
    * shares at least one word [[DecontamN]]-gram with the held-out test
    * split (the standard exact-overlap decontamination of pretraining
    * corpora against eval benchmarks). The test split stands in for the
    * benchmark suite; membership comes from the same salted-md5 percent
    * bucket [[Sampling.splitAssign]] uses, so the stage audits exactly
    * the split the pipeline ships.
    *
    * Emits one row per TRAIN doc with its contaminated-n-gram count and
    * the keep verdict — the auditable artifact (a bare filtered corpus
    * hides what was dropped and why).
    *
    * Scale: one pass computes buckets + distinct n-grams per doc
    * (codegen'd `word_ngrams`, no HOF chain); the n-gram equi-join is the
    * only data-sized shuffle. In production the benchmark side is a fixed
    * eval suite (KBs, broadcastable); here it is the 5% test split, which
    * GROWS with the corpus, so no broadcast hint — AQE picks the strategy
    * that fits the actual sizes (same size-contract reasoning as
    * TextOps' hot-shingle join).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val b = Sampling.pctBucket("split", col("doc_id"))
    val g = TextOps.spread(s, t(s, dir, "documents")).withColumn("b", b)
    decontaminateFrames(g.filter(col("b") < 90), g.filter(col("b") >= 95))
  }

  /** Two-frame form of [[decontaminate]] — the API a real pipeline calls
    * (train candidates vs an explicit benchmark corpus, each any frame
    * with (doc_id, text)). The graded query wraps it with the split
    * buckets standing in for the benchmark. */
  def decontaminateFrames(train: DataFrame, bench: DataFrame): DataFrame = {
    val tg = train.select(col("doc_id"),
      GraftFunctions.word_ngrams(col("text"), DecontamN).as("gs"))
    val bg = bench
      .select(explode(GraftFunctions.word_ngrams(col("text"), DecontamN)).as("ng"))
      .distinct()
    val hits = tg.select(col("doc_id"), explode(col("gs")).as("ng"))
      .join(bg, "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    tg.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_contaminated_ngrams"),
        (coalesce(col("n_hits"), lit(0L)) === 0).as("kept"))
  }

  val decontaminateSql: String = {
    val b = Sampling.pctBucketSql("split", "doc_id")
    s"""WITH g AS (
       |  SELECT doc_id, $b AS b,
       |    CASE WHEN len(w) >= $DecontamN
       |      THEN list_distinct(list_transform(range(1, len(w) - ${DecontamN - 2}),
       |             i -> array_to_string(w[i:i+${DecontamN - 1}], ' ')))
       |      ELSE []::VARCHAR[] END AS gs
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)),
       |bench AS (SELECT DISTINCT unnest(gs) AS ng FROM g WHERE b >= 95),
       |train AS (SELECT doc_id, unnest(gs) AS ng FROM g WHERE b < 90),
       |hits AS (SELECT t.doc_id, count(*) AS n_hits
       |         FROM train t JOIN bench USING (ng) GROUP BY t.doc_id)
       |SELECT g.doc_id,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated_ngrams,
       |  COALESCE(h.n_hits, 0) = 0 AS kept
       |FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
       |WHERE g.b < 90""".stripMargin
  }

  /** Serialized Bloom filter over the benchmark (test-split) n-grams —
    * the broadcastable form of the decontamination list. Built with the
    * public `df.stat.bloomFilter` sketch (distributed aggregate, driver
    * holds only the filter bytes: ~1.2 MB at fpp 1e-3 per million
    * n-grams, size independent of corpus text volume). */
  def benchNgramBloom(s: SparkSession, dir: String,
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.001): Array[Byte] = {
    val b = Sampling.pctBucket("split", col("doc_id"))
    ngramBloomOf(t(s, dir, "documents").filter(b >= 95), expectedItems, fpp)
  }

  /** Frame form of [[benchNgramBloom]]: the filter over any (doc_id,
    * text) benchmark frame's n-grams. EMPTY-SAFE: `df.stat.bloomFilter`
    * NPEs on a zero-row input (its tree-aggregate combiner sees a null
    * buffer), and an all-short-doc benchmark produces exactly that — so
    * the empty case builds the (reject-everything) filter directly. */
  def ngramBloomOf(bench: DataFrame, expectedItems: Long = 1000000L,
                   fpp: Double = 0.001): Array[Byte] = {
    val ngrams = bench
      .select(explode(GraftFunctions.word_ngrams(col("text"), DecontamN)).as("ng"))
    val bf =
      if (ngrams.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else ngrams.stat.bloomFilter("ng", expectedItems, fpp)
    val os = new java.io.ByteArrayOutputStream()
    bf.writeTo(os)
    os.toByteArray
  }

  /** Stateless Bloom-side decontamination: the [[decontaminate]] verdict
    * as a pure per-row projection — the doc's n-grams probe the
    * plan-constant filter in ONE codegen'd pass (`bloom_hits`; nesting
    * the probe in Spark's `filter()` HOF would fall back to interpreted
    * per-element eval), no join, no shuffle, no state. This is the form
    * that decontaminates an unbounded STREAM of arriving crawl shards
    * (StreamingCorpus wires it); error is one-sided (Bloom false
    * positives can only over-drop — the safe direction). Null text
    * matches the exact operator: zero n-grams, kept. */
  def decontaminateBloom(docs: DataFrame, filter: Array[Byte]): DataFrame = {
    val nHits = coalesce(GraftFunctions.bloom_hits(
      GraftFunctions.word_ngrams(col("text"), DecontamN), filter)
      .cast("long"), lit(0L))
    docs.select(col("doc_id"), nHits.as("n_contaminated_ngrams"))
      .withColumn("kept", col("n_contaminated_ngrams") === 0)
  }

  /** BM25 query terms + constants (Robertson k1=1.2, b=0.75). */
  private val Bm25Terms = Seq("vector", "hash", "merge")
  private val Bm25K = 20

  /** BM25 top-k retrieval over the corpus for a fixed conjunctive query —
    * the ranking leg of a quality-audit / search-over-corpus stage.
    *
    * Shape chosen for 100 TB, not for brevity:
    *  - per-doc term frequencies come from single-pass array HOF counts
    *    (no posting-list explode, so no |docs|x|terms| row blow-up and NO
    *    doc-keyed shuffle to reassemble scores);
    *  - the corpus-level stats (N, avgdl, per-term df) are ONE tiny
    *    aggregate row, broadcast back — the only other scan;
    *  - global ranking is top-k (TakeOrderedAndProject), never a full
    *    sort; the rank window runs over k rows, not the corpus.
    *
    * Per-term scores are rounded to 4dp and summed as DECIMAL so the
    * cross-term sum is order-independent (bit-stable across engines and
    * re-runs); the oracle mirrors the same rounding.
    */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    val tfCols = Bm25Terms.map(tm =>
      size(filter(col("w"), x => x === tm)).cast("long").as(s"tf_$tm"))
    val perDoc = toks.select(
      col("doc_id") +: size(col("w")).cast("long").as("dl") +: tfCols: _*)
    val statAggs = Bm25Terms.map(tm =>
      sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L)).as(s"df_$tm")) ++
      Seq(count(lit(1)).cast("long").as("n"), avg(col("dl")).as("avgdl"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val termScore: String => Column = tm => {
      val tf = col(s"tf_$tm").cast("double")
      val df = col(s"df_$tm").cast("double")
      val idf = log((col("n") - df + 0.5) / (df + 0.5) + 1.0)
      val tfPart = (tf * 2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      round(idf * tfPart, 4).cast("decimal(18,4)")
    }
    val scored = perDoc
      .filter(Bm25Terms.map(tm => col(s"tf_$tm")).reduce(_ + _) > 0)
      .crossJoin(broadcast(stats)) // stats is ONE row by construction
      .select(col("doc_id"),
        Bm25Terms.map(termScore).reduce(_ + _).as("score_d"))
    val topk = scored.orderBy(col("score_d").desc, col("doc_id")).limit(Bm25K)
    val w = Window.orderBy(col("score_d").desc, col("doc_id"))
    topk.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("score_d").cast("double").as("score"),
        col("rank"))
  }

  val bm25TopKSql: String = {
    val inList = Bm25Terms.map(tm => s"'$tm'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(w) AS t FROM toks)
       |       WHERE t IN ($inList) GROUP BY doc_id, t),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id,
       |    CAST(round(
       |      ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
       |    4) AS DECIMAL(18,4)) AS s
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
       |SELECT doc_id, CAST(score AS DOUBLE) AS score, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT doc_id, sum(s) AS score,
       |        row_number() OVER (ORDER BY sum(s) DESC, doc_id) AS rn
       |      FROM scored GROUP BY doc_id)
       |WHERE rn <= $Bm25K""".stripMargin
  }

  /** Fuzzy (near-duplicate) decontamination: exact n-gram overlap
    * ([[decontaminate]]) misses PARAPHRASED benchmark leakage, so this
    * stage runs the MinHash-LSH near-dup detector ACROSS the split
    * boundary — train docs whose signatures band-collide with a test doc,
    * verified at exact Jaccard >= [[FuzzyJaccard]] over 3-gram shingles.
    * Emits the contaminated train docs with match count + max verified
    * similarity (the audit artifact).
    *
    * Scale shape (same discipline as SemanticDedupIndex): band collisions
    * shuffle id-only candidate pairs; shingle arrays join back in ONLY
    * for the |candidates| survivors, never riding the LSH shuffle. Cost
    * is bucket-local — all-pairs never materializes.
    */
  /** Signature table for [[fuzzyDecontaminate]]: split bucket + MinHash
    * sigs + shingles per doc, checkpointed once (reused by both band
    * branches and the verify join). */
  private[graft] def fuzzySig(s: SparkSession, dir: String): DataFrame = {
    val b = Sampling.pctBucket("split", col("doc_id"))
    TextOps.shingleTable(s, dir)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id") +: col("sh") +: b.as("b") +: TextOps.mhCols: _*)
      .localCheckpoint()
  }

  /** Cross-split band collisions as BARE ID PAIRS — the shingle arrays
    * must never ride the (pre-verification, potentially fan-out) LSH
    * shuffle; PlanSpec pins that no exchange here carries an array
    * column. */
  private[graft] def fuzzyCandidates(sig: DataFrame): DataFrame = {
    def bandCand(c1: String, c2: String): DataFrame =
      sig.filter(col("b") < 90)
        .select(col("doc_id").as("train_id"), col(c1), col(c2))
        .join(sig.filter(col("b") >= 95)
          .select(col("doc_id").as("bench_id"), col(c1), col(c2)),
          Seq(c1, c2))
        .select("train_id", "bench_id")
    bandCand("mh0", "mh1").union(bandCand("mh2", "mh3")).distinct()
  }

  def fuzzyDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val sig = fuzzySig(s, dir)
    val cand = fuzzyCandidates(sig)
    val tsh = sig.select(col("doc_id").as("train_id"), col("sh").as("tsh"))
    val esh = sig.select(col("doc_id").as("bench_id"), col("sh").as("esh"))
    val inter = size(array_intersect(col("tsh"), col("esh"))).cast("double")
    cand.join(tsh, "train_id").join(esh, "bench_id")
      .select(col("train_id"),
        round(inter / (size(col("tsh")) + size(col("esh")) - inter), 4)
          .as("jacc"))
      .filter(col("jacc") >= FuzzyJaccard)
      .groupBy(col("train_id").as("doc_id"))
      .agg(count(lit(1)).as("n_bench_matches"), max(col("jacc")).as("max_jaccard"))
  }

  private val FuzzyJaccard = 0.5

  val fuzzyDecontaminateSql: String = {
    val b = Sampling.pctBucketSql("split", "doc_id")
    def mh(j: Int) =
      s"CAST(list_aggregate(list_transform(sh, x -> ('0x' || substr(md5(x || '|$j'), 1, 8))::UBIGINT), 'min') AS BIGINT) AS mh$j"
    s"""WITH sh AS (
       |  SELECT doc_id, $b AS b,
       |    list_distinct(CASE WHEN len(w) >= 3
       |      THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      ELSE []::VARCHAR[] END) AS sh
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)),
       |sig AS (
       |  SELECT doc_id, b, sh, ${mh(0)}, ${mh(1)}, ${mh(2)}, ${mh(3)}
       |  FROM sh WHERE len(sh) > 0),
       |cand AS (
       |  SELECT t.doc_id AS train_id, e.doc_id AS bench_id, t.sh AS tsh, e.sh AS esh
       |  FROM sig t JOIN sig e ON (t.mh0 = e.mh0 AND t.mh1 = e.mh1) AND t.b < 90 AND e.b >= 95
       |  UNION
       |  SELECT t.doc_id, e.doc_id, t.sh, e.sh
       |  FROM sig t JOIN sig e ON (t.mh2 = e.mh2 AND t.mh3 = e.mh3) AND t.b < 90 AND e.b >= 95),
       |verified AS (
       |  SELECT train_id, bench_id,
       |    round(CAST(len(list_intersect(tsh, esh)) AS DOUBLE)
       |      / (len(tsh) + len(esh) - len(list_intersect(tsh, esh))), 4) AS jacc
       |  FROM cand)
       |SELECT train_id AS doc_id, CAST(count(*) AS BIGINT) AS n_bench_matches,
       |  max(jacc) AS max_jaccard
       |FROM verified WHERE jacc >= $FuzzyJaccard
       |GROUP BY train_id""".stripMargin
  }

  private val QuantilePs = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))

  /** Exact per-language length quantiles (linear interpolation, the
    * `quantile_cont` definition) computed from a VALUE HISTOGRAM rather
    * than a per-group value buffer. `percentile()` / sort-based exact
    * quantiles buffer every value of a group on one machine — a scale
    * trap for corpus-sized groups. Discrete-valued columns (lengths,
    * counts, scores x 10^k) have bounded distinct values, so
    * groupBy(value)+count is a tiny map-side-combined shuffle, the
    * cumulative walk runs over the histogram (not the corpus), and the
    * result is still EXACT — same numbers `percentile` would give. For
    * genuinely continuous columns at scale, `approx_percentile` is the
    * path; this operator is the exact histogram route.
    */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "documents")
      // percentile()/quantile_cont skip NULL values; the histogram must
      // too, or a NULL row would shift every rank
      .filter(col("n_chars").isNotNull)
      .groupBy(col("lang"), col("n_chars").cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("lang").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("ntot", sum(col("c")).over(Window.partitionBy("lang")))
    // value_at(k) = min v with cum > k (0-based rank k); quantile p sits
    // at pos = (n-1)*p between value_at(floor(pos)) and value_at(ceil(pos))
    val loHi = QuantilePs.flatMap { case (nm, p) =>
      val pos = (col("ntot") - 1) * p
      Seq(min(when(col("cum") > floor(pos), col("v"))).as(s"lo_$nm"),
        min(when(col("cum") > ceil(pos), col("v"))).as(s"hi_$nm"))
    }
    val aggd = withCum.groupBy("lang")
      .agg(max(col("ntot")).as("n0"), loHi: _*)
    val outCols = QuantilePs.map { case (nm, p) =>
      val pos = (col("n0") - 1) * p
      val frac = pos - floor(pos)
      round(col(s"lo_$nm") + (col(s"hi_$nm") - col(s"lo_$nm")) * frac, 4)
        .as(nm)
    }
    aggd.select(col("lang") +: col("n0").cast("long").as("n") +: outCols: _*)
  }

  /** Oracle uses DuckDB's native `quantile_cont` — an INDEPENDENT exact
    * implementation; agreement (after 4dp rounding) is evidence the
    * histogram walk computes the textbook quantile, not just a
    * self-consistent one. */
  val lengthQuantilesSql: String =
    """SELECT lang, CAST(count(n_chars) AS BIGINT) AS n,
      |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
      |  round(quantile_cont(n_chars, 0.9), 4) AS p90,
      |  round(quantile_cont(n_chars, 0.99), 4) AS p99
      |FROM documents GROUP BY lang""".stripMargin

  /** Token budget per packed training sequence (est_bpe_tokens units —
    * the same chars/4 estimate tokenCount reports). */
  private val SeqBudget = 1024L

  /** Sequence packing (the concat-then-chunk corpus→training-batches
    * stage): docs are concatenated per source in doc_id order and split
    * into fixed [[SeqBudget]]-token sequences; a doc belongs to the
    * sequence where it STARTS (tokens-before ÷ budget). Emits per-sequence
    * packing stats (docs, token sum) — the artifact batch planners read.
    *
    * Scale: runs on [[graft.operators.KeyedCumsum]] — the two-level
    * keyed cumsum that replaces the per-source window (one source = one
    * reducer partition, the single-partition trap chunkPack's scaladoc
    * documents). ChunkPackLawSpec proves equality with the naive per-source
    * window on random inputs.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesOf(s, t(s, dir, "documents"))

  private[graft] def packSequencesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"),
      ceil(col("n_chars") / 4.0).cast("long").as("tok"))
    graft.operators.KeyedCumsum(s, toks, key = "source",
        order = Seq("doc_id"), value = "tok", out = "cum")
      .withColumn("seq", floor((col("cum") - col("tok")) / SeqBudget))
      .groupBy("source", "seq")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("seq_tokens"))
  }

  val packSequencesSql: String =
    s"""SELECT source, CAST(floor((cum - tok) / $SeqBudget) AS BIGINT) AS seq,
       |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS seq_tokens
       |FROM (
       |  SELECT source, tok,
       |    CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM (SELECT source, doc_id,
       |          CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok FROM documents))
       |GROUP BY source, seq""".stripMargin

  /** Span-detection gram width, minimum reported span (tokens), and the
    * frequency caps that bound the pair fan-out. */
  private val SpanK = 5
  private val SpanMinTokens = 8
  private val SpanDfCap = 50L
  private val SpanPosCap = 200L

  /** Exact substring duplication across documents (the span-level exact
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022): doc pairs sharing a run of at least
    * [[SpanMinTokens]] CONSECUTIVE identical tokens, found as maximal runs
    * of [[SpanK]]-gram matches at a constant position offset. Set-based
    * near-dup detectors (MinHash/SimHash) miss this — two long documents
    * sharing one verbatim paragraph have tiny Jaccard but are exactly the
    * curation problem span dedup exists for. Emits (doc_a, doc_b,
    * max_span_tokens, n_spans) — the audit artifact a span-clipping stage
    * consumes. n_spans counts reported RUNS (matches at one offset):
    * self-similar shared text (e.g. a periodic paragraph) also matches
    * itself at shifted offsets, so one physical region can contribute
    * several runs — n_spans is an upper bound on distinct duplicated
    * regions, not a count of them (the clip stage is immune: cover
    * positions union away the overlap).
    *
    * Plan shape, built for the corpus scale:
    *  - positional shingles come from ONE codegen'd pass
    *    (`word_ngrams_all`, array index = token position) — posexplode
    *    over a plain array column, no HOF inside the Generate;
    *  - gram strings NEVER ride a shuffle: both the frequency count and
    *    the position self-join key on xxhash64(gram) (8 bytes vs ~30-char
    *    strings; a cross-doc collision would need 2^-64 odds AND the
    *    colliding positions to extend a run, so the hash join is exact in
    *    practice — the string-keyed oracle agrees on every graded corpus);
    *  - the self-join is capped: grams in > [[SpanDfCap]] distinct docs or
    *    > [[SpanPosCap]] total positions are dropped BEFORE the join
    *    (boilerplate/stopword shingles would otherwise square the row
    *    count — same discipline as the n-gram Jaccard df cap), so
    *    per-gram fan-out is bounded by construction;
    *  - runs are gaps-and-islands: group matches by (pair, pa - pb), rank
    *    by pa inside the group — consecutive positions share pa - rank,
    *    so one window + one groupBy turns matches into maximal runs. The
    *    window partitions by (pair, diff): match-list-sized groups, never
    *    a corpus-sized sort.
    */
  def commonSpans(s: SparkSession, dir: String): DataFrame =
    commonSpansOf(TextOps.spread(s, t(s, dir, "documents")))

  /** Maximal match runs behind [[commonSpansOf]] / [[spanClipOf]]: one
    * row per maximal run of k-gram matches at constant offset —
    * (doc_a, doc_b, pa0, pb0, span) with pa0/pb0 the run's starting
    * token position in each doc and span its length in TOKENS. */
  private[graft] def spanRuns(docs: DataFrame, k: Int, dfCap: Long,
                              posCap: Long): DataFrame = {
    // checkpointed: three consumers (frequency count + both join sides)
    // would otherwise re-run the scan + explode + hash each; the
    // materialized table is (long, long, long) rows — strings gone
    val pos = docs
      .select(col("doc_id"), posexplode(
        GraftFunctions.word_ngrams_all(col("text"), k)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(col("gram")).as("h"))
      .localCheckpoint()
    val ok = pos.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("np"))
      .filter(col("df").between(2, dfCap) && col("np") <= posCap)
      .select("h")
    // no broadcast hint: the shared-gram set grows with the corpus (same
    // size contract as the hot-shingle join) — AQE picks the strategy
    val p = pos.join(ok, "h") // columns: (h, doc_id, pos)
    val matches = p.toDF("h", "doc_a", "pa")
      .join(p.toDF("h", "doc_b", "pb"), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"))
    val wIsl = Window.partitionBy(col("doc_a"), col("doc_b"), col("diff"))
      .orderBy(col("pa"))
    matches
      .withColumn("diff", col("pa") - col("pb"))
      .withColumn("isl", col("pa") - row_number().over(wIsl))
      .groupBy("doc_a", "doc_b", "diff", "isl")
      .agg(min(col("pa")).as("pa0"), (count(lit(1)) + k - 1).as("span"))
      .select(col("doc_a"), col("doc_b"), col("pa0"),
        (col("pa0") - col("diff")).as("pb0"), col("span"))
  }

  /** Frame form of [[commonSpans]] — any (doc_id, text) frame; caps and
    * widths parameterized for spec coverage, defaults = the graded
    * query's constants. */
  private[graft] def commonSpansOf(docs: DataFrame, k: Int = SpanK,
                                   minTokens: Int = SpanMinTokens,
                                   dfCap: Long = SpanDfCap,
                                   posCap: Long = SpanPosCap): DataFrame =
    spanRuns(docs, k, dfCap, posCap).groupBy("doc_a", "doc_b")
      .agg(max(col("span")).as("max_span_tokens"),
        sum(when(col("span") >= minTokens, 1L).otherwise(0L)).as("n_spans"))
      .filter(col("max_span_tokens") >= minTokens)

  /** Shared oracle CTE prefix: tokenize, positional grams, frequency
    * caps, position matches, gaps-and-islands runs with start positions. */
  private val spanRunCtes: String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |g0 AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= $SpanK
       |      THEN list_transform(range(1, len(w) - $SpanK + 2),
       |             i -> struct_pack(pos := i - 1, gram := array_to_string(w[i:i+${SpanK - 1}], ' ')))
       |      ELSE []::STRUCT(pos BIGINT, gram VARCHAR)[] END AS gs
       |  FROM toks),
       |g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram
       |      FROM (SELECT doc_id, unnest(gs) AS u FROM g0)),
       |ok AS (SELECT gram FROM (
       |         SELECT gram, count(DISTINCT doc_id) AS df, count(*) AS np
       |         FROM g GROUP BY gram)
       |       WHERE df BETWEEN 2 AND $SpanDfCap AND np <= $SpanPosCap),
       |p AS (SELECT g.* FROM g JOIN ok USING (gram)),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
       |       FROM p a JOIN p b ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |isl AS (SELECT doc_a, doc_b, pa, pa - pb AS diff,
       |          pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
       |        FROM pr),
       |runs AS (SELECT doc_a, doc_b, diff, min(pa) AS pa0,
       |           CAST(count(*) + $SpanK - 1 AS BIGINT) AS span
       |         FROM isl GROUP BY doc_a, doc_b, diff, isl)""".stripMargin

  val commonSpansSql: String =
    s"""$spanRunCtes
       |SELECT doc_a, doc_b, max(span) AS max_span_tokens,
       |  CAST(sum(CASE WHEN span >= $SpanMinTokens THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
       |FROM runs GROUP BY doc_a, doc_b HAVING max(span) >= $SpanMinTokens""".stripMargin

  /** Span CLIPPING — the action stage [[commonSpans]] audits: for every
    * reported duplicated span, the copy in the HIGHER-id doc is removed
    * (the lower id keeps its text — the same min-id survivor convention
    * the dedup-groups stage uses), and the clipped corpus is re-emitted.
    * This is how span-level dedup actually repairs a corpus: near-dup
    * dedup drops whole docs, span dedup drops only the duplicated bytes
    * and keeps both documents' unique content.
    *
    * Output is one row per INPUT doc — n_tokens, n_removed, and the
    * clipped text — so the stage is auditable and chainable (text_clipped
    * is the next stage's text). UNTOUCHED docs (n_removed = 0) pass their
    * text through BYTE-IDENTICAL — only actually-clipped docs are
    * reassembled from the token stream, which normalizes their whitespace
    * to single spaces (inherent to token-level surgery; the oracle
    * mirrors both branches).
    *
    * Scale shape: cover positions explode from runs (runs are rare —
    * duplication, not the corpus), and ONE pass over the marked tokens
    * computes count + removed + reassembly in the same aggregate (no
    * second tokenize of the corpus, no separate count join). Reassembly
    * sorts ONE doc's tokens inside its aggregate buffer (docs are
    * KB-scale; the corpus-level plan never globally sorts) via array_sort
    * over (pos, tok) structs — positions are unique per doc, so the sort
    * is total and the oracle's string_agg ORDER BY pos agrees exactly. */
  def spanClip(s: SparkSession, dir: String): DataFrame =
    spanClipOf(TextOps.spread(s, t(s, dir, "documents")))

  private[graft] def spanClipOf(docs: DataFrame, k: Int = SpanK,
                                minTokens: Int = SpanMinTokens,
                                dfCap: Long = SpanDfCap,
                                posCap: Long = SpanPosCap): DataFrame = {
    val cover = spanRuns(docs, k, dfCap, posCap)
      .filter(col("span") >= minTokens)
      .select(col("doc_b").as("doc_id"),
        explode(sequence(col("pb0"), col("pb0") + col("span") - 1)).as("pos"))
      .distinct()
    val toks = docs.select(col("doc_id"), posexplode(
        GraftFunctions.word_ngrams_all(col("text"), 1)).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val rebuilt = toks
      .join(cover.withColumn("cov", lit(1)), Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cov").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ", transform(array_sort(
          collect_list(when(col("cov").isNull, struct(col("pos"), col("tok"))))),
          x => x.getField("tok"))).as("text_rebuilt"))
    docs.select(col("doc_id"), col("text"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        when(col("n_removed") === 0, col("text"))
          .otherwise(col("text_rebuilt")).as("text_clipped"))
  }

  val spanClipSql: String =
    s"""$spanRunCtes,
       |cover AS (SELECT DISTINCT doc_id, pos FROM (
       |  SELECT doc_b AS doc_id, unnest(range(pa0 - diff, pa0 - diff + span)) AS pos
       |  FROM runs WHERE span >= $SpanMinTokens)),
       |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
       |    i -> struct_pack(pos := i - 1, tok := w[i]))) AS u
       |  FROM toks)),
       |reb AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |          CAST(count(c.pos) AS BIGINT) AS n_removed,
       |          string_agg(t.tok, ' ' ORDER BY t.pos)
       |            FILTER (WHERE c.pos IS NULL) AS text_rebuilt
       |        FROM tok t LEFT JOIN cover c
       |          ON t.doc_id = c.doc_id AND t.pos = c.pos
       |        GROUP BY t.doc_id)
       |SELECT d.doc_id, r.n_tokens, r.n_removed,
       |  CASE WHEN r.n_removed = 0 THEN d.text
       |       ELSE COALESCE(r.text_rebuilt, '') END AS text_clipped
       |FROM documents d LEFT JOIN reb r USING (doc_id)""".stripMargin

  /** Pointwise mutual information over token co-occurrence — the
    * association-mining stage of phrase/collocation discovery (Church &
    * Hanks 1990; tokenizer-vocab induction runs on the same statistic):
    * PMI(x,y) = ln(P(x,y) / (P(x)·P(y))) over per-document presence,
    * reported for the top-30 strongest pairs with a count floor.
    *
    * The scale story is the CANDIDATE BOUND: pairing every distinct
    * token per doc is quadratic in document vocabulary (unboundable);
    * instead each doc contributes pairs only among its top-12 tokens by
    * in-doc frequency (keyed window, ties broken on the token), so the
    * pair stage emits ≤ 66 rows/doc whatever the text length, and the
    * marginals aggregate the SAME bounded presence table — one scan of
    * the corpus, every downstream row count O(docs). Final top-30 is
    * orderBy+limit (TakeOrderedAndProject), rank window post-limit.
    *
    * Float discipline (the BM25 precedent): one ln per surviving pair,
    * rounded to 4dp — order-independent, oracle mirrors the same
    * expression tree. */
  def pmiPairs(s: SparkSession, dir: String): DataFrame =
    pmiPairsOf(t(s, dir, "documents"))

  /** The reusable core: docs needs (doc_id, text). */
  private[graft] def pmiPairsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val tc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val wz = Window.partitionBy("doc_id").orderBy(col("c").desc, col("tok"))
    val topz = tc.withColumn("rn", row_number().over(wz))
      .filter(col("rn") <= 12).select("doc_id", "tok")
      .localCheckpoint() // three consumers: marginals + both pair sides
    val cx = topz.groupBy("tok").agg(count(lit(1)).as("cx"))
    val nn = docs.agg(count(lit(1)).as("n"))
    val cp = topz.as("a").join(topz.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("x"), col("b.tok").as("y"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
    val scored = cp
      .join(cx.select(col("tok").as("x"), col("cx").as("cx1")), "x")
      .join(cx.select(col("tok").as("y"), col("cx").as("cx2")), "y")
      .crossJoin(broadcast(nn)) // one row by construction
      .select(col("x"), col("y"), col("cxy"),
        round(log((col("cxy").cast("double") * col("n").cast("double")) /
          (col("cx1").cast("double") * col("cx2").cast("double"))), 4)
          .cast("decimal(18,4)").as("pmi"))
    val top = scored.orderBy(col("pmi").desc, col("x"), col("y")).limit(30)
    val wr = Window.orderBy(col("pmi").desc, col("x"), col("y"))
    top.withColumn("rank", row_number().over(wr).cast("long"))
      .select(col("rank"), col("x").as("tok_x"), col("y").as("tok_y"),
        col("cxy").as("n_xy"), col("pmi").cast("double").as("pmi"))
  }

  val pmiPairsSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks WHERE tok <> ''
      |  GROUP BY doc_id, tok),
      |topz AS (SELECT doc_id, tok FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
      |  FROM tc) WHERE rn <= 12),
      |cx AS (SELECT tok, CAST(count(*) AS BIGINT) AS cx FROM topz GROUP BY tok),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |cp AS (SELECT a.tok AS x, b.tok AS y, CAST(count(*) AS BIGINT) AS cxy
      |  FROM topz a JOIN topz b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |sc AS (SELECT x, y, cxy,
      |  CAST(round(ln((CAST(cxy AS DOUBLE) * CAST(nn.n AS DOUBLE)) /
      |    (CAST(c1.cx AS DOUBLE) * CAST(c2.cx AS DOUBLE))), 4) AS DECIMAL(18,4)) AS pmi
      |  FROM cp JOIN cx c1 ON c1.tok = cp.x JOIN cx c2 ON c2.tok = cp.y, nn)
      |SELECT row_number() OVER (ORDER BY pmi DESC, x, y) AS rank,
      |  x AS tok_x, y AS tok_y, cxy AS n_xy, CAST(pmi AS DOUBLE) AS pmi
      |FROM (SELECT * FROM sc ORDER BY pmi DESC, x, y LIMIT 30)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pmi_pairs" -> pmiPairs _,
    "q_decontaminate" -> decontaminate _,
    "q_fuzzy_decontaminate" -> fuzzyDecontaminate _,
    "q_bm25_topk" -> bm25TopK _,
    "q_quantiles" -> lengthQuantiles _,
    "q_pack_sequences" -> packSequences _,
    "q_common_spans" -> commonSpans _,
    "q_span_clip" -> spanClip _)

  val oracles: Map[String, String] = Map(
    "q_pmi_pairs" -> pmiPairsSql,
    "q_decontaminate" -> decontaminateSql,
    "q_fuzzy_decontaminate" -> fuzzyDecontaminateSql,
    "q_bm25_topk" -> bm25TopKSql,
    "q_quantiles" -> lengthQuantilesSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_common_spans" -> commonSpansSql,
    "q_span_clip" -> spanClipSql)
}
