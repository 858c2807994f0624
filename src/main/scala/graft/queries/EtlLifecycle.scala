package graft.queries


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TagCategorizer
import graft.transform.TripleBuilder

/** The reference's COMPOSED ETL lifecycle as one graded row — its real
  * entry point is the chain, not the stages
  * (`deployment/hf_etl/run_extract_transform_load.py:402-628`, SURVEY
  * §3.1): snapshot scan (S1) → quality filter (P3) → known fields (P1)
  * + YAML front matter (Y1) + tag categorization (§2.4) → FAIR4ML
  * triples (T1) + statement disambiguation (A7,
  * `MlentoryTransformWithGraphBuilder.py:371-516`) → TWO-version
  * V1–V5 MERGE into the versioned store (`GraphHandler.py:348-419`) →
  * output = the V8 current graph with the A9 distinct-subject count.
  * Every stage has its own green row; this one grades their
  * COMPOSITION — stage ordering, provenance threading (the A7 winner's
  * method/confidence must survive the merge into the served graph),
  * and the re-load deprecation semantics of the reference's
  * `hf_transformed_fair4ml_example_small_1..4` scenario
  * (`tests/unit/hf/load/test_GraphHandler.py:115-120,263-478`): load 2
  * re-extracts the SAME snapshot with some properties changed (license
  * bump → deprecate + fresh, the small_2 arm), some vanished (gated
  * prompt dropped → deprecate with no replacement, the small_4 arm),
  * and the rest identical (extend, the small_1-reload arm).
  *
  * Deterministic card fixture per load over the documents snapshot
  * (the q_front_matter classes, parsed by the REAL
  * [[graft.text.FrontMatter]]): doc_id%5==2 carries BOTH license_name
  * and license (precedence), %5!=0 a quoted license, %5==0 only
  * other_license (fallback); the YAML language list feeds the tag
  * array, categorized by the REAL [[TagCategorizer]] (vocabulary
  * membership drops zh, arxiv: prefix → citation IRIs, pipeline_tag
  * fold → ml_task). A7 sees every triple from TWO extractors — parser
  * (0.8) and qa (0.9 on even doc_ids, 0.7 on odd) — so the winner
  * alternates per document and a disambiguation drift is visible in
  * the output's method column. The DuckDB oracle replays the whole
  * chain: quality predicate, card classes, vocabulary rules, the A7
  * argmax, both merges' arms (extend keeps the load-1 range start;
  * fresh opens at the load-2 extraction time — `start_ms` separates
  * them per row), and the two audit scalars.
  */
object EtlLifecycle {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // Logical clock: the shared lifecycle constants (LifecycleMerge).
  private val T1 = LifecycleMerge.T1
  private val T2 = LifecycleMerge.T2

  private val LangVocab = Seq("en", "de", "fr", "es")

  /** S1 + P3: the snapshot scan with the q_quality_filter predicate
    * (package-visible so PlanSpec can pin its pushdown). */
  private[graft] def qualityDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("n_chars") >= 150
        && col("lang").isNotNull
        && size(split(col("text"), " ")) >= 25
        && (length(col("text")) - length(regexp_replace(col("text"), "batch", ""))) / 5 < 8)
      .select("doc_id", "text", "lang", "source")

  /** The YAML model card for load `v` — load 2 bumps the quoted license
    * of doc_id%4==0 cards to -2.0 (visible only where the license: key
    * wins precedence, i.e. %5 not in {0,2}) and DROPS the gated prompt
    * of %6==0 cards entirely (the small_4 disappearing-property arm). */
  private def cardCol(v: Int): Column = {
    val m5 = col("doc_id") % 5
    val licVer =
      if (v == 1) lit("-1.0")
      else when(col("doc_id") % 4 === 0, lit("-2.0")).otherwise(lit("-1.0"))
    val gated = {
      val base = concat(lit("extra_gated_prompt: agree-"), col("lang"), lit("\n"))
      if (v == 1) when(col("doc_id") % 3 === 0, base).otherwise(lit(""))
      else when(col("doc_id") % 3 === 0 && col("doc_id") % 6 =!= 0, base)
        .otherwise(lit(""))
    }
    concat(
      lit("---\n"),
      when(m5 === 2, concat(lit("license_name: custom-"), col("lang"), lit("\n")))
        .otherwise(lit("")),
      when(m5 =!= 0, concat(lit("license: \""), col("source"), licVer, lit("\"\n")))
        .otherwise(concat(lit("other_license: research-"), col("source"), lit("\n"))),
      lit("language:\n- "), col("lang"), lit("\n"),
      when(col("doc_id") % 2 === 0, lit("- en\n")).otherwise(lit("")),
      gated,
      lit("---\n"), substring(col("text"), 1, 60))
  }

  /** One extraction pass (stages 2-5 of the chain) ending in the
    * merge-ready batch: exactly one metadata row per (s,p,o), carrying
    * the A7 winner's method/confidence/extractionTime. */
  private[queries] def extractionBatch(s: SparkSession, dir: String, v: Int): DataFrame = {
    import s.implicits._
    val etBase = if (v == 1) T1 else T2

    // Y1 through the REAL front-matter parser (license precedence,
    // fallback concat, language list, gated conditions-of-access)
    val parsed = qualityDocs(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), cardCol(v).as("card"))
      .as[(Long, String, String, String)]
      .map { case (id, lang, source, c) =>
        val fm = graft.text.FrontMatter.parse(c)
        (id, lang, source,
          graft.text.FrontMatter.license(fm).getOrElse(""),
          graft.text.FrontMatter.conditionsOfAccess(fm).getOrElse(""),
          fm.getOrElse("language", Seq.empty))
      }
      .toDF("doc_id", "lang", "source", "license", "gated", "langs")

    // §2.4 through the REAL categorizer: the YAML language list feeds
    // the tag array (the HF shape), plus arxiv:/library tags and the
    // pipeline_tag fold
    val none = array().cast("array<string>")
    val tagged = parsed
      .withColumn("tags", concat(
        col("langs"),
        when(col("doc_id") % 3 === 0,
          array(concat(lit("arxiv:"), (lit(1000) + col("doc_id") % 50).cast("string"))))
          .otherwise(none),
        when(col("doc_id") % 2 === 0, array(lit("libA"))).otherwise(array(lit("libB")))))
      .withColumn("pipeline_tag",
        when(col("doc_id") % 6 === 0, lit("Translation")))
    // materialized once: the eight triple arms below each re-execute
    // their upstream (Spark does not share common subplans across union
    // children), and that upstream is the per-card typed-map parse — 8
    // arms × 2 loads re-parsed every card 16× (measured at sf0.1:
    // 6.2 → 4.9 s same-harness minima; the remainder is the two MERGEs
    // — the instrument's actual subject)
    val cat = graft.operators.Checkpoints.ck(
      TagCategorizer.categorize(tagged, TagCategorizer.Vocabs(
        languages = LangVocab, libraries = Seq("libA", "libB"),
        tasks = Seq("translation"))))

    // T1: the FAIR4ML triple arms (P1 known fields inline: name, url)
    val subj = concat(lit("model:"), col("doc_id"))
    def arm(pred: String, obj: Column, kind: String) =
      cat.select(col("doc_id"), subj.as("subject"), lit(pred).as("predicate"),
        obj.as("obj"), lit(kind).as("objKind"))
    val triples =
      arm("rdf:type", lit("fair4ml:MLModel"), "iri")
        .unionByName(arm("schema:name",
          concat(col("source"), lit("/m"), col("doc_id")), "literal"))
        .unionByName(arm("schema:url",
          concat(lit("https://example.org/model/"), col("doc_id")), "iri"))
        .unionByName(arm("schema:license", col("license"), "literal"))
        .unionByName(
          cat.filter(col("gated") =!= "").select(col("doc_id"), subj.as("subject"),
            lit("schema:conditionsOfAccess").as("predicate"),
            col("gated").as("obj"), lit("literal").as("objKind")))
        .unionByName(
          cat.select(col("doc_id"), subj.as("subject"),
            lit("schema:inLanguage").as("predicate"),
            explode(col("in_language")).as("obj"), lit("literal").as("objKind")))
        .unionByName(
          cat.select(col("doc_id"), subj.as("subject"),
            lit("schema:citation").as("predicate"),
            explode(col("reference_publication")).as("obj"),
            lit("iri").as("objKind")))
        .unionByName(
          cat.select(col("doc_id"), subj.as("subject"),
            lit("fair4ml:mlTask").as("predicate"),
            explode(col("ml_task")).as("obj"), lit("literal").as("objKind")))

    // A7: every triple arrives from TWO extractors; the REAL
    // disambiguation window keeps the (confidence, extractionTime) max
    val meta = triples.withColumn("m", explode(array(
        struct(lit("parser").as("extractionMethod"),
          lit(0.8).as("confidence"),
          timestamp_seconds(lit(etBase) + col("doc_id") % 7 * 60)
            .as("extractionTime")),
        struct(lit("qa").as("extractionMethod"),
          when(col("doc_id") % 2 === 0, 0.9).otherwise(0.7).as("confidence"),
          timestamp_seconds(lit(etBase) + col("doc_id") % 5 * 60)
            .as("extractionTime")))))
      .select(col("subject"), col("predicate"), col("obj"), col("objKind"),
        col("m.extractionMethod").as("extractionMethod"),
        col("m.confidence").as("confidence"),
        col("m.extractionTime").as("extractionTime"))
    TripleBuilder.disambiguate(meta)
      .withColumn("datatype", lit(""))
  }

  /** The composed lifecycle: two extraction passes merged as versions
    * 0 and 1 of a scratch store; output = the current graph (subject,
    * predicate, obj, objkind, A7-winner method + confidence, range
    * start) plus the A9 distinct-subject count and the deprecated-range
    * count as audit columns on every row. */
  def etlLifecycle(s: SparkSession, dir: String): DataFrame =
    LifecycleMerge.twoVersionCurrentGraph(s, dir, "graft_etl_q",
      v => extractionBatch(s, dir, v),
      extra = Seq(col("extractionMethod").as("method"), col("confidence")))

  /** Whole-chain replay: quality predicate → card classes → vocabulary
    * rules → triple arms → A7 winner → both merges' arms. The current
    * graph is extend ∪ fresh (every quality doc re-extracts in load 2,
    * so every subject is touched and no untouched arm exists);
    * deprecated = load-1 rows with no load-2 (s,p,o) match. */
  val etlLifecycleSql: String = {
    def extracted(name: String, licVer: String, gatedPred: String,
                  etBaseMs: Long): String =
      s"""$name AS (
         |  SELECT q.doc_id,
         |    'model:' || q.doc_id AS subject, a.predicate, a.obj, a.objkind,
         |    CASE WHEN q.doc_id % 2 = 0 THEN 'qa' ELSE 'parser' END AS method,
         |    CASE WHEN q.doc_id % 2 = 0 THEN 0.9 ELSE 0.8 END AS confidence,
         |    $etBaseMs + (CASE WHEN q.doc_id % 2 = 0 THEN q.doc_id % 5
         |                      ELSE q.doc_id % 7 END) * 60000 AS et_ms
         |  FROM q, LATERAL (
         |    SELECT 'rdf:type' AS predicate, 'fair4ml:MLModel' AS obj, 'iri' AS objkind
         |    UNION ALL
         |    SELECT 'schema:name', q.source || '/m' || q.doc_id, 'literal'
         |    UNION ALL
         |    SELECT 'schema:url', 'https://example.org/model/' || q.doc_id, 'iri'
         |    UNION ALL
         |    SELECT 'schema:license',
         |      CASE WHEN q.doc_id % 5 = 2 THEN 'custom-' || q.lang
         |           WHEN q.doc_id % 5 <> 0 THEN q.source || $licVer
         |           ELSE 'research-' || q.source END, 'literal'
         |    UNION ALL
         |    SELECT 'schema:conditionsOfAccess',
         |      'extra_gated_prompt: agree-' || q.lang, 'literal'
         |    WHERE $gatedPred
         |    UNION ALL
         |    SELECT 'schema:inLanguage', l.x, 'literal'
         |    FROM (SELECT unnest(list_distinct(list_filter(
         |      [q.lang] || (CASE WHEN q.doc_id % 2 = 0 THEN ['en']
         |                        ELSE []::VARCHAR[] END),
         |      y -> y IN ('en', 'de', 'fr', 'es')))) AS x) l
         |    UNION ALL
         |    SELECT 'schema:citation',
         |      'https://arxiv.org/abs/' || (1000 + q.doc_id % 50), 'iri'
         |    WHERE q.doc_id % 3 = 0
         |    UNION ALL
         |    SELECT 'fair4ml:mlTask', 'translation', 'literal'
         |    WHERE q.doc_id % 6 = 0) a)""".stripMargin
    s"""WITH q AS (
       |  SELECT doc_id, lang, source FROM documents
       |  WHERE n_chars >= 150 AND lang IS NOT NULL
       |    AND len(string_split(text, ' ')) >= 25
       |    AND (length(text) - length(replace(text, 'batch', ''))) / 5 < 8),
       |${extracted("m1", "'-1.0'", "q.doc_id % 3 = 0", T1 * 1000)},
       |${extracted("m2",
      "(CASE WHEN q.doc_id % 4 = 0 THEN '-2.0' ELSE '-1.0' END)",
      "q.doc_id % 3 = 0 AND q.doc_id % 6 <> 0", T2 * 1000)},
       |cur AS (
       |  SELECT m1.subject, m1.predicate, m1.obj, m1.objkind, m1.method,
       |         m1.confidence, m1.et_ms AS start_ms
       |  FROM m1 JOIN m2 ON m1.subject = m2.subject
       |    AND m1.predicate = m2.predicate AND m1.obj = m2.obj
       |  UNION ALL
       |  SELECT m2.subject, m2.predicate, m2.obj, m2.objkind, m2.method,
       |         m2.confidence, m2.et_ms
       |  FROM m2
       |  WHERE NOT EXISTS (SELECT 1 FROM m1 WHERE m1.subject = m2.subject
       |    AND m1.predicate = m2.predicate AND m1.obj = m2.obj)),
       |dep AS (
       |  SELECT m1.subject FROM m1
       |  WHERE NOT EXISTS (SELECT 1 FROM m2 WHERE m2.subject = m1.subject
       |    AND m2.predicate = m1.predicate AND m2.obj = m1.obj))
       |SELECT cur.*,
       |  (SELECT count(DISTINCT subject) FROM cur) AS n_subjects,
       |  (SELECT count(*) FROM dep) AS n_deprecated
       |FROM cur""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_etl_lifecycle" -> etlLifecycle _)

  val oracles: Map[String, String] = Map(
    "q_etl_lifecycle" -> etlLifecycleSql)
}
