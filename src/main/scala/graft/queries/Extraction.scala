package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.extract.SchemaPropertyExtractor
import graft.extract.SchemaPropertyExtractor.{PropertyQuery, TokenOverlapScorer}
import graft.transform.CroissantBuilder

/** Oracle-graded extraction queries: the E8 `context_matching` strategy and
  * the T2 croissant JSON-LD → triples builder, both driven end-to-end
  * through the REAL extraction code paths over deterministic fixtures built
  * from the documents table, so the DuckDB harness can catch a regression
  * in either (`SchemaPropertyExtractor.py:150-227`,
  * `GraphBuilderCroissant.py:30-200`).
  */
object Extraction {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Shared tokenizer restatement for the oracle: contentTokens = lowercase,
    * split \W+, keep len>2 non-stopword, 5-char prefix, distinct. */
  private def sqlToks(expr: String): String =
    s"""list_distinct(list_transform(list_filter(
       |    string_split_regex(lower($expr), '\\W+'),
       |    t -> length(t) > 2 AND NOT list_contains(
       |      ['the','a','an','and','or','of','to','in','on','at','by','is',
       |       'are','was','were','be','been','it','its','this','that','what',
       |       'which','who','how','does','did','do','under','for','with',
       |       'from','have','has','had','not','no','can','will'], t)),
       |    t -> t[1:5]))""".stripMargin

  // ---------------------------------------------------------------- E8

  /** The three graded schema properties; card sections are built so that
    * `Markdown.hierarchical` provably returns exactly one single-paragraph
    * section per heading (single-line contents, distinct title-alphabetical
    * order Body < Language < Origin — the tie-break index the oracle
    * replays as sec_idx). */
  private val ContextQueries = Seq(
    PropertyQuery("fair4ml:languageCode", "language code the document is written in"),
    PropertyQuery("schema.org:origin", "source pipeline the document was harvested from"),
    PropertyQuery("body", "main body text excerpt content"))

  /** E8 `context_matching` over synthetic model cards: per (doc, property)
    * the top-1 token-overlap section — value is the section content,
    * confidence IS the match score. Runs the real
    * [[SchemaPropertyExtractor.contextMatch]] (markdown sectionizer +
    * TokenOverlapScorer) — only the fixture is synthetic. */
  def contextMatch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // Body excerpt sanitized to [a-zA-Z0-9 ] so the card's markdown
    // structure is exactly the three headings (no stray '#'/fence/list
    // lines) and the oracle's tokenizer sees the same byte stream.
    val card = concat(
      lit("# Language\nThe document language code is "), col("lang"), lit(" .\n"),
      lit("# Origin\nHarvested from the "), col("source"), lit(" source pipeline .\n"),
      lit("# Body\nExcerpt : "),
      regexp_replace(substring(col("text"), 1, 160), "[^a-zA-Z0-9 ]", " "))
    val models = docs.select(
      concat(lit("doc:"), col("doc_id")).as("modelId"), card.as("card"))
    SchemaPropertyExtractor.contextMatch(models, ContextQueries, new TokenOverlapScorer)
      .toDF()
      .select(col("modelId").as("model_id"), col("property"), col("value"),
        col("confidence"), col("sectionTitle").as("section_title"), col("method"))
  }

  val contextMatchSql: String =
    s"""WITH docs AS (
       |  SELECT 'doc:' || doc_id AS model_id,
       |    'The document language code is ' || lang || ' .' AS lang_c,
       |    'Harvested from the ' || source || ' source pipeline .' AS origin_c,
       |    'Excerpt : ' || regexp_replace(substr(text, 1, 160), '[^a-zA-Z0-9 ]', ' ', 'g') AS body_c
       |  FROM documents),
       |secs AS (
       |  SELECT model_id, 'Body' AS section_title, body_c AS content, 1 AS sec_idx FROM docs
       |  UNION ALL SELECT model_id, 'Language', lang_c, 2 FROM docs
       |  UNION ALL SELECT model_id, 'Origin', origin_c, 3 FROM docs),
       |st AS (
       |  SELECT model_id, section_title, content, sec_idx,
       |    ${sqlToks("section_title || ' ' || content")} AS toks
       |  FROM secs),
       |qs AS (
       |  SELECT * FROM (VALUES
       |    ('fair4ml:languageCode', 'Language Code. language code the document is written in'),
       |    ('schema.org:origin', 'Origin. source pipeline the document was harvested from'),
       |    ('body', 'Body. main body text excerpt content'))
       |    AS q(property, qtext)),
       |qt AS (SELECT property, ${sqlToks("qtext")} AS qtoks FROM qs),
       |scored AS (
       |  SELECT s.model_id, q.property, s.content, s.section_title, s.sec_idx,
       |    len(list_filter(q.qtoks, x -> list_contains(s.toks, x))) AS inter,
       |    len(q.qtoks) AS nq, len(s.toks) AS ns
       |  FROM st s CROSS JOIN qt q),
       |best AS (
       |  SELECT model_id, property, trim(content) AS value,
       |    CASE WHEN nq = 0 OR ns = 0 THEN 0.0
       |         ELSE CAST(inter AS DOUBLE) / (nq + ns - inter) END AS confidence,
       |    section_title,
       |    row_number() OVER (PARTITION BY model_id, property
       |      ORDER BY CASE WHEN nq = 0 OR ns = 0 THEN 0.0
       |                    ELSE CAST(inter AS DOUBLE) / (nq + ns - inter) END DESC,
       |               sec_idx) AS rn
       |  FROM scored)
       |SELECT model_id, property, value, confidence, section_title,
       |  'DirectContextMatch_SectionContent' AS method
       |FROM best WHERE rn = 1 AND confidence > 0""".stripMargin

  // ---------------------------------------------------------------- T2

  /** T2 croissant: a fixed-shape croissant JSON-LD document per row —
    * context term map + CURIE prefixes, @type, nested typed blank nodes
    * (Person), {"@id"} references, numeric literals, keyword arrays, and a
    * FileObject distribution — expanded by [[graft.text.JsonLd]] and
    * cleaned by the croissant surgery (file-node deletion, Dataset/Person
    * blank re-identification). The oracle enumerates the expected triple
    * set directly from the source columns. */
  def croissantTriples(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val json = format_string(
      """{"@context":{"name":"https://schema.org/name","sc":"https://schema.org/","cr":"http://mlcommons.org/croissant/","creator":{"@id":"https://schema.org/creator"},"license":{"@id":"https://schema.org/license","@type":"@id"}},""" +
        """"@type":"sc:Dataset","name":"doc-%s","sc:inLanguage":"%s","sc:keywords":["%s","%s"],"cr:charCount":%s,""" +
        """"license":{"@id":"https://licenses.example.org/%s"},""" +
        """"creator":{"@type":"sc:Person","name":"author-%s"},""" +
        """"distribution":{"@type":"cr:FileObject","name":"file-%s.txt","sc:contentUrl":"http://files.example.org/%s"}}""",
      col("doc_id"), col("lang"), col("lang"), col("source"), col("n_chars"),
      col("source"), col("doc_id") % 20, col("doc_id"), col("doc_id"))
    val models = docs.select(
      concat(lit("ds-"), col("doc_id")).as("datasetId"), json.as("croissant_json"))
    CroissantBuilder.build(models)
      .select(col("subject"), col("predicate"), col("obj"),
        col("objKind").as("obj_kind"), col("datatype"))
  }

  val croissantTriplesSql: String =
    """WITH d AS (SELECT doc_id, lang, source, n_chars,
      |  'https://w3id.org/mlentory/mlentory_graph/'
      |    || sha256('platform=hf|type=dataset|id=ds-' || doc_id) AS ds_uri,
      |  'https://w3id.org/mlentory/mlentory_graph/'
      |    || sha256('platform=hf|type=person|id=author-' || (doc_id % 20)) AS person_uri
      |  FROM documents)
      |SELECT DISTINCT * FROM (
      |  SELECT ds_uri AS subject,
      |         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS predicate,
      |         'https://schema.org/Dataset' AS obj, 'iri' AS obj_kind, '' AS datatype FROM d
      |  UNION ALL SELECT ds_uri, 'https://schema.org/name', 'doc-' || doc_id, 'literal', '' FROM d
      |  UNION ALL SELECT ds_uri, 'https://schema.org/inLanguage', lang, 'literal', '' FROM d
      |  UNION ALL SELECT ds_uri, 'https://schema.org/keywords', lang, 'literal', '' FROM d
      |  UNION ALL SELECT ds_uri, 'https://schema.org/keywords', source, 'literal', '' FROM d
      |  UNION ALL SELECT ds_uri, 'http://mlcommons.org/croissant/charCount',
      |         CAST(n_chars AS VARCHAR), 'literal',
      |         'http://www.w3.org/2001/XMLSchema#decimal' FROM d
      |  UNION ALL SELECT ds_uri, 'https://schema.org/license',
      |         'https://licenses.example.org/' || source, 'iri', '' FROM d
      |  UNION ALL SELECT ds_uri, 'https://schema.org/creator', person_uri, 'iri', '' FROM d
      |  UNION ALL SELECT person_uri, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
      |         'https://schema.org/Person', 'iri', '' FROM d
      |  UNION ALL SELECT person_uri, 'https://schema.org/name',
      |         'author-' || (doc_id % 20), 'literal', '' FROM d
      |)""".stripMargin

  // ---------------------------------------------------------------- Y1

  /** Y1 front-matter, oracle-graded: YAML cards built from the documents
    * table drive the REAL [[graft.text.FrontMatter]] parser through every
    * read path the reference uses — quoted-scalar stripping, flat lists,
    * the license precedence chain (license_name > license > any other
    * *license* key), and extra_gated conditions-of-access
    * (`ModelCardToSchemaParser.py:400-506`). Fixture classes by doc_id:
    * %5==0 has only `other_license` (fallback concat), %5==2 has BOTH
    * license_name and license (precedence), the rest a quoted `license`;
    * %2==0 gets a 2-item language list; %3==0 gets a gated prompt. */
  def frontMatter(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val m5 = col("doc_id") % 5
    val card = concat(
      lit("---\n"),
      when(m5 === 2, concat(lit("license_name: custom-"), col("lang"), lit("\n")))
        .otherwise(lit("")),
      when(m5 =!= 0, concat(lit("license: \""), col("source"), lit("-1.0\"\n")))
        .otherwise(concat(lit("other_license: research-"), col("source"), lit("\n"))),
      lit("language:\n- "), col("lang"), lit("\n"),
      when(col("doc_id") % 2 === 0, lit("- en\n")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit("extra_gated_prompt: agree-"), col("lang"), lit("\n")))
        .otherwise(lit("")),
      lit("---\n"), substring(col("text"), 1, 60))
    t(s, dir, "documents").select(col("doc_id"), card.as("card"))
      .as[(Long, String)]
      .map { case (id, c) =>
        val fm = graft.text.FrontMatter.parse(c)
        (id, graft.text.FrontMatter.license(fm).getOrElse(""),
          graft.text.FrontMatter.conditionsOfAccess(fm).getOrElse(""),
          fm.getOrElse("language", Seq.empty).size.toLong)
      }
      .toDF("doc_id", "license", "gated", "n_langs")
  }

  val frontMatterSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 2 THEN 'custom-' || lang
      |       WHEN doc_id % 5 <> 0 THEN source || '-1.0'
      |       ELSE 'research-' || source END AS license,
      |  CASE WHEN doc_id % 3 = 0 THEN 'extra_gated_prompt: agree-' || lang
      |       ELSE '' END AS gated,
      |  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END::BIGINT AS n_langs
      |FROM documents""".stripMargin

  // ------------------------------------------------------- E5-E8 (QA)

  private val QaQueries = Seq(
    PropertyQuery("alpha_lang", "alpha section language"),
    PropertyQuery("beta_src", "beta section pipeline"),
    PropertyQuery("gamma_n", "gamma section characters"))

  /** E8 `individual` QA strategy, oracle-graded end-to-end: the full
    * prompt-assembly → inference → answer-wrap flow
    * (`SchemaPropertyExtractor.py:336-433`) with the deterministic
    * EchoBackend. Cards are three SINGLE-SENTENCE sections (each ending
    * '.', no other sentence enders), which makes every step closed-form:
    * the top-3 context is all three sections in score order, the echo
    * backend's sentence split returns exactly the "title: content"
    * sentences, and its pick is max token-INTERSECTION with the question
    * (lexicographic tie-break) — distinct from the Jaccard ranking that
    * chooses sectionTitle and the confidence (mean of the top-3 Jaccards
    * folded in descending order). */
  def qaIndividual(s: SparkSession, dir: String): DataFrame = {
    val card = concat(
      lit("# Alpha\nAlpha section about "), col("lang"), lit(" language .\n"),
      lit("# Beta\nBeta section from "), col("source"), lit(" pipeline .\n"),
      lit("# Gamma\nGamma section with "), col("n_chars"), lit(" characters ."))
    val models = t(s, dir, "documents").select(
      concat(lit("doc:"), col("doc_id")).as("modelId"), card.as("card"))
    SchemaPropertyExtractor.extract(models, QaQueries, new TokenOverlapScorer,
        strategy = SchemaPropertyExtractor.Strategy.Individual)
      .toDF()
      .select(col("modelId").as("model_id"), col("property"), col("value"),
        col("confidence"), col("sectionTitle").as("section_title"), col("method"))
  }

  val qaIndividualSql: String =
    s"""WITH docs AS (
       |  SELECT 'doc:' || doc_id AS model_id,
       |    'Alpha section about ' || lang || ' language .' AS a_c,
       |    'Beta section from ' || source || ' pipeline .' AS b_c,
       |    'Gamma section with ' || n_chars || ' characters .' AS g_c
       |  FROM documents),
       |secs AS (
       |  SELECT model_id, 'Alpha' AS title, a_c AS content, 1 AS sec_idx FROM docs
       |  UNION ALL SELECT model_id, 'Beta', b_c, 2 FROM docs
       |  UNION ALL SELECT model_id, 'Gamma', g_c, 3 FROM docs),
       |st AS (
       |  SELECT model_id, title, content, sec_idx,
       |    ${sqlToks("title || ' ' || content")} AS toks
       |  FROM secs),
       |qs AS (
       |  SELECT * FROM (VALUES
       |    ('alpha_lang', 'Alpha Lang. alpha section language'),
       |    ('beta_src', 'Beta Src. beta section pipeline'),
       |    ('gamma_n', 'Gamma N. gamma section characters'))
       |    AS q(property, qtext)),
       |qt AS (SELECT property, ${sqlToks("qtext")} AS qtoks FROM qs),
       |scored AS (
       |  SELECT s.model_id, q.property, s.title, s.content, s.sec_idx,
       |    len(list_filter(q.qtoks, x -> list_contains(s.toks, x))) AS inter,
       |    len(q.qtoks) AS nq, len(s.toks) AS ns
       |  FROM st s CROSS JOIN qt q),
       |ranked AS (
       |  SELECT *,
       |    CASE WHEN nq = 0 OR ns = 0 THEN 0.0
       |         ELSE CAST(inter AS DOUBLE) / (nq + ns - inter) END AS jac,
       |    row_number() OVER (PARTITION BY model_id, property
       |      ORDER BY CASE WHEN nq = 0 OR ns = 0 THEN 0.0
       |                    ELSE CAST(inter AS DOUBLE) / (nq + ns - inter) END DESC,
       |               sec_idx) AS rank_jac,
       |    row_number() OVER (PARTITION BY model_id, property
       |      ORDER BY inter DESC, title || ': ' || content) AS rank_int
       |  FROM scored)
       |SELECT model_id, property,
       |  CASE WHEN max(inter) = 0 THEN 'Information not found'
       |       ELSE max(CASE WHEN rank_int = 1 THEN title || ': ' || content END)
       |  END AS value,
       |  ((max(CASE WHEN rank_jac = 1 THEN jac END)
       |    + max(CASE WHEN rank_jac = 2 THEN jac END))
       |    + max(CASE WHEN rank_jac = 3 THEN jac END)) / 3 AS confidence,
       |  max(CASE WHEN rank_jac = 1 THEN title END) AS section_title,
       |  'IndividualQA' AS method
       |FROM ranked GROUP BY model_id, property""".stripMargin

  /** E8 `grouped` QA strategy over the same cards: the 3-question list
    * clusters into ONE group (nClusters = max(1, 3/10)), whose
    * representative is the FIRST question — so the context ranking, the
    * mean confidence, and the section title are the representative's,
    * shared by all three properties, while each property's value is its
    * own best-sentence echo answer parsed back out of the multi-question
    * response (E4 clustering + E5 multi-prompt + E6 parseMultiAnswers
    * all execute on the graded path). */
  def qaGrouped(s: SparkSession, dir: String): DataFrame = {
    val card = concat(
      lit("# Alpha\nAlpha section about "), col("lang"), lit(" language .\n"),
      lit("# Beta\nBeta section from "), col("source"), lit(" pipeline .\n"),
      lit("# Gamma\nGamma section with "), col("n_chars"), lit(" characters ."))
    val models = t(s, dir, "documents").select(
      concat(lit("doc:"), col("doc_id")).as("modelId"), card.as("card"))
    SchemaPropertyExtractor.extract(models, QaQueries, new TokenOverlapScorer,
        strategy = SchemaPropertyExtractor.Strategy.Grouped)
      .toDF()
      .select(col("modelId").as("model_id"), col("property"), col("value"),
        col("confidence"), col("sectionTitle").as("section_title"), col("method"))
  }

  val qaGroupedSql: String =
    s"""WITH docs AS (
       |  SELECT 'doc:' || doc_id AS model_id,
       |    'Alpha section about ' || lang || ' language .' AS a_c,
       |    'Beta section from ' || source || ' pipeline .' AS b_c,
       |    'Gamma section with ' || n_chars || ' characters .' AS g_c
       |  FROM documents),
       |secs AS (
       |  SELECT model_id, 'Alpha' AS title, a_c AS content, 1 AS sec_idx FROM docs
       |  UNION ALL SELECT model_id, 'Beta', b_c, 2 FROM docs
       |  UNION ALL SELECT model_id, 'Gamma', g_c, 3 FROM docs),
       |st AS (
       |  SELECT model_id, title, content, sec_idx,
       |    ${sqlToks("title || ' ' || content")} AS toks
       |  FROM secs),
       |qs AS (
       |  SELECT * FROM (VALUES
       |    ('alpha_lang', 'Alpha Lang. alpha section language'),
       |    ('beta_src', 'Beta Src. beta section pipeline'),
       |    ('gamma_n', 'Gamma N. gamma section characters'))
       |    AS q(property, qtext)),
       |qt AS (SELECT property, ${sqlToks("qtext")} AS qtoks FROM qs),
       |scored AS (
       |  SELECT s.model_id, q.property, s.title, s.content, s.sec_idx,
       |    len(list_filter(q.qtoks, x -> list_contains(s.toks, x))) AS inter,
       |    len(q.qtoks) AS nq, len(s.toks) AS ns
       |  FROM st s CROSS JOIN qt q),
       |ranked AS (
       |  SELECT *,
       |    CASE WHEN nq = 0 OR ns = 0 THEN 0.0
       |         ELSE CAST(inter AS DOUBLE) / (nq + ns - inter) END AS jac,
       |    row_number() OVER (PARTITION BY model_id, property
       |      ORDER BY CASE WHEN nq = 0 OR ns = 0 THEN 0.0
       |                    ELSE CAST(inter AS DOUBLE) / (nq + ns - inter) END DESC,
       |               sec_idx) AS rank_jac,
       |    row_number() OVER (PARTITION BY model_id, property
       |      ORDER BY inter DESC, title || ': ' || content) AS rank_int
       |  FROM scored),
       |rep AS (
       |  SELECT model_id,
       |    ((max(CASE WHEN rank_jac = 1 THEN jac END)
       |      + max(CASE WHEN rank_jac = 2 THEN jac END))
       |      + max(CASE WHEN rank_jac = 3 THEN jac END)) / 3 AS confidence,
       |    max(CASE WHEN rank_jac = 1 THEN title END) AS section_title
       |  FROM ranked WHERE property = 'alpha_lang' GROUP BY model_id),
       |vals AS (
       |  SELECT model_id, property,
       |    CASE WHEN max(inter) = 0 THEN 'Information not found'
       |         ELSE max(CASE WHEN rank_int = 1 THEN title || ': ' || content END)
       |    END AS value
       |  FROM ranked GROUP BY model_id, property)
       |SELECT v.model_id, v.property, v.value, r.confidence, r.section_title,
       |  'GroupedQA' AS method
       |FROM vals v JOIN rep r ON v.model_id = r.model_id""".stripMargin

  // ------------------------------------------------------------- M1-M6

  /** Markdown sectionizer, oracle-graded end-to-end: two-level cards built
    * from the documents table drive the REAL
    * [[graft.text.Markdown.hierarchical]] through header hierarchy
    * ("H1 > H2" titles), blank-line paragraph splitting, list-block
    * trimming to 4 lines + "..." (M2/M4), content-hash dedup keeping the
    * shortest title (M6), and the (level, title) output order. The card
    * shape makes every emitted section's title and content a closed-form
    * function of the source columns, so the oracle enumerates the exact
    * 5-row output per doc. */
  def markdownSections(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val card = concat(
      lit("# Doc "), col("doc_id"),
      lit("\nIntro para one "), col("lang"),
      lit(".\n\nIntro para two "), col("source"),
      lit(".\n## More\n- item a "), col("lang"),
      lit("\n- item b "), col("source"),
      lit("\n- item c\n- item d\n- item e\n- item f "), col("doc_id"))
    t(s, dir, "documents").select(col("doc_id"), card.as("card"))
      .as[(Long, String)]
      .flatMap { case (id, c) =>
        graft.text.Markdown.hierarchical(c).zipWithIndex.map { case (sec, i) =>
          (id, (i + 1).toLong, sec.title, sec.content, sec.level.toLong)
        }
      }
      .toDF("doc_id", "sec_idx", "title", "content", "lvl")
  }

  val markdownSectionsSql: String =
    """WITH d AS (SELECT doc_id, lang, source FROM documents),
      |lst AS (SELECT doc_id, lang, source,
      |  '- item a ' || lang || chr(10) || '- item b ' || source || chr(10) ||
      |  '- item c' || chr(10) || '- item d' AS l4 FROM d)
      |SELECT doc_id, 1::BIGINT AS sec_idx, 'Doc ' || doc_id AS title,
      |  'Intro para one ' || lang || '.' || chr(10) || chr(10) ||
      |    'Intro para two ' || source || '.' AS content,
      |  1::BIGINT AS lvl FROM lst
      |UNION ALL SELECT doc_id, 2, 'Doc ' || doc_id || ' - Par. 1',
      |  'Intro para one ' || lang || '.', 1 FROM lst
      |UNION ALL SELECT doc_id, 3, 'Doc ' || doc_id || ' - Par. 2',
      |  'Intro para two ' || source || '.', 1 FROM lst
      |UNION ALL SELECT doc_id, 4, 'Doc ' || doc_id || ' > More',
      |  l4 || chr(10) || '- item e' || chr(10) || '- item f ' || doc_id, 2 FROM lst
      |UNION ALL SELECT doc_id, 5, 'Doc ' || doc_id || ' > More - Par. 1',
      |  l4 || chr(10) || '...', 2 FROM lst""".stripMargin

  // ---------------------------------------------------------------- A1

  /** A1 related-entity collection through the real
    * [[EntityBuilders.relatedEntities]]: long-format properties from the
    * documents table, typed by the property→entity-type config map;
    * unmapped properties (license here) drop out, output is the distinct
    * (entity_type, value) frontier (`HFExtractor.py:365-402`). */
  def relatedEntitiesQ(s: SparkSession, dir: String): DataFrame = {
    val props = t(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("m"), col("doc_id") % 7).as("bm"),
        col("source").as("ds"), col("lang").as("lic"))
      .select(expr("stack(3, 'base_model', bm, 'trained_on', ds, " +
        "'license', lic) AS (property, value)"))
    graft.transform.EntityBuilders.relatedEntities(props,
      Map("base_model" -> "model", "trained_on" -> "dataset"))
  }

  val relatedEntitiesSql: String =
    """SELECT DISTINCT 'model' AS entity_type, 'm' || (doc_id % 7) AS value
      |FROM documents
      |UNION
      |SELECT DISTINCT 'dataset', source FROM documents""".stripMargin

  // ------------------------------------------------------------- S7/S9

  /** S7 OpenML + S9 AI4Life platform extraction end-to-end through the
    * REAL [[graft.extract.PlatformPipelines]] / [[graft.extract.SchemaMapping]]
    * code paths (`OpenMLExtractor.py:322-546`, `AI4LifeExtractor.py:88-243`):
    * nested API-record fixtures built from the documents table are mapped
    * by all three rule kinds (dotted Path, Format template, Concat array),
    * the OpenML leg joins the J3 dataset-status dim (broadcast + scraped-
    * over-api coalesce; ids >= 200 miss the dim and drop their status row),
    * and the AI4Life leg exercises the recursive struct flatten. Output is
    * the union of both long-format provenance property tables. */
  def platformExtract(s: SparkSession, dir: String): DataFrame = {
    import graft.extract.{PlatformPipelines, SchemaMapping}
    import SchemaMapping.{Concat, Format, Path}
    val docs = t(s, dir, "documents")

    val runs = docs.filter(col("doc_id") < 250).select(
      col("doc_id").cast("string").as("rid"),
      struct(
        col("doc_id").as("id"),
        concat(lit("flow_"), col("source")).as("flow_name"),
        (col("doc_id") % 17).as("uploader")).as("run"),
      struct(col("lang").as("lang"), col("n_chars").as("n_chars")).as("meta"))
    // J3 status dim: doc_id-bounded (< 200 rows at every SF) — a genuine
    // broadcastable dimension by construction
    val status = docs.filter(col("doc_id") < 200).select(
      col("doc_id").cast("string").as("identifier"),
      concat(lit("api_"), col("source")).as("api_status"),
      when(col("doc_id") % 4 === 0, concat(lit("scr_"), col("lang")))
        .as("scraped_status"))
    val openmlLong = PlatformPipelines.openml(
      runs,
      Seq(
        "name" -> Format("Run {run.id} [{meta.lang}]"),
        "flow" -> Path("run.flow_name"),
        "uploader" -> Format("user_{run.uploader}"),
        "tags" -> Concat(Seq("run.flow_name", "meta.lang"))),
      idColumn = "rid", datasetStatus = Some(status))

    val records = docs.filter(col("doc_id") >= 250 && col("doc_id") < 450)
      .select(
        concat(lit("ai4life_"), col("doc_id")).as("rid"),
        struct(
          struct(concat(lit("Author "), col("source")).as("name"),
            col("lang").as("country")).as("author"),
          struct(lit("0.1").as("version"),
            col("n_chars").cast("string").as("size")).as("release"))
          .as("config"),
        col("source").as("platform"))
    val ai4lifeLong = PlatformPipelines.ai4life(
      records,
      Seq(
        "author" -> Path("config_author_name"),
        "origin" -> Format("{platform}/{config_release_version}"),
        "sizeinfo" -> Concat(Seq("config_release_size", "config_author_country"))),
      idColumn = "rid")

    openmlLong.unionByName(ai4lifeLong)
      .withColumnRenamed("modelId", "model_id")
  }

  /** Pure-SQL restatement: each rule kind is spelled out per property;
    * Concat values replay Spark's array→string cast format `[a, b]`. */
  val platformExtractSql: String =
    """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
      |om AS (SELECT CAST(doc_id AS VARCHAR) AS model_id, doc_id, lang, source
      |       FROM d WHERE doc_id < 250),
      |om_long AS (
      |  SELECT model_id, 'name' AS property,
      |         'Run ' || doc_id || ' [' || lang || ']' AS value FROM om
      |  UNION ALL SELECT model_id, 'flow', 'flow_' || source FROM om
      |  UNION ALL SELECT model_id, 'uploader', 'user_' || (doc_id % 17) FROM om
      |  UNION ALL SELECT model_id, 'tags',
      |    '[flow_' || source || ', ' || lang || ']' FROM om
      |  UNION ALL SELECT model_id, 'status',
      |    CASE WHEN doc_id % 4 = 0 THEN 'scr_' || lang
      |         ELSE 'api_' || source END
      |    FROM om WHERE doc_id < 200),
      |al AS (SELECT 'ai4life_' || doc_id AS model_id, lang, source, n_chars
      |       FROM d WHERE doc_id >= 250 AND doc_id < 450),
      |al_long AS (
      |  SELECT model_id, 'author' AS property, 'Author ' || source AS value FROM al
      |  UNION ALL SELECT model_id, 'origin', source || '/0.1' FROM al
      |  UNION ALL SELECT model_id, 'sizeinfo',
      |    '[' || n_chars || ', ' || lang || ']' FROM al)
      |SELECT model_id, property, value,
      |       'openml_python_package' AS method, CAST(1.0 AS DOUBLE) AS confidence
      |FROM om_long
      |UNION ALL
      |SELECT model_id, property, value, 'Parsed_from_AI4Life_API',
      |       CAST(1.0 AS DOUBLE)
      |FROM al_long""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_platform_extract" -> platformExtract _,
    "q_context_match" -> contextMatch _,
    "q_croissant_triples" -> croissantTriples _,
    "q_front_matter" -> frontMatter _,
    "q_markdown_sections" -> markdownSections _,
    "q_related_entities" -> relatedEntitiesQ _,
    "q_qa_individual" -> qaIndividual _,
    "q_qa_grouped" -> qaGrouped _)

  val oracles: Map[String, String] = Map(
    "q_platform_extract" -> platformExtractSql,
    "q_context_match" -> contextMatchSql,
    "q_croissant_triples" -> croissantTriplesSql,
    "q_front_matter" -> frontMatterSql,
    "q_markdown_sections" -> markdownSectionsSql,
    "q_related_entities" -> relatedEntitiesSql,
    "q_qa_individual" -> qaIndividualSql,
    "q_qa_grouped" -> qaGroupedSql)
}
