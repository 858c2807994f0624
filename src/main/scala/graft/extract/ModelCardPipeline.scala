package graft.extract

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TagCategorizer
import graft.operators.TagCategorizer.Vocabs
import graft.text.FrontMatter
import graft.extract.SchemaPropertyExtractor.{PropertyQuery, ScoringBackend}

/** The HF extract slice end-to-end (SURVEY §3.1 stage 2 /
  * `ModelCardToSchemaParser.process_dataframe`,
  * `core/ModelCardToSchemaParser.py:997-1083`):
  *
  *   snapshot → quality filter (P3) → known fields (P1) → tag buckets
  *   (§2.4) → YAML front-matter license/gating (Y1) → context-matched
  *   schema properties (E8) → ONE LONG-FORMAT property table with
  *   per-fact provenance.
  *
  * The reference keeps 45 wide columns whose cells are lists of
  * provenance dicts; the engine's native shape is the long format
  * (modelId, property, value, method, confidence) — columnar-friendly,
  * explode-free downstream, and exactly what the triple builder consumes.
  */
object ModelCardPipeline {

  final case class Provenanced(method: String, confidence: Double)

  private def longFormat(df: DataFrame, property: String, value: org.apache.spark.sql.Column,
                         method: String, confidence: Double): DataFrame =
    df.select(
      col("modelId"),
      lit(property).as("property"),
      value.cast("string").as("value"),
      lit(method).as("method"),
      lit(confidence).as("confidence"))
      .filter(col("value").isNotNull && col("value") =!= "")

  private val fmLicense = udf { card: String =>
    FrontMatter.license(FrontMatter.parse(Option(card).getOrElse(""))).orNull
  }
  private val fmGated = udf { card: String =>
    FrontMatter.conditionsOfAccess(FrontMatter.parse(Option(card).getOrElse(""))).orNull
  }

  /** @param snapshot raw HF snapshot schema (FIXTURES.md §1)
    * @param vocabs   tag vocabularies
    * @param backend  section scorer for E8 extraction
    * @param schemaQueries properties to extract
    * @param strategy  E8 extraction strategy (context_matching / grouped /
    *                  individual — `SchemaPropertyExtractor.py:122-148`)
    * @param inference QA backend for the grouped/individual strategies
    * @return long-format property table with provenance columns
    */
  def properties(snapshot: DataFrame, vocabs: Vocabs,
                 backend: ScoringBackend,
                 schemaQueries: Seq[PropertyQuery],
                 strategy: SchemaPropertyExtractor.Strategy =
                   SchemaPropertyExtractor.Strategy.ContextMatching,
                 inference: QaEngine.InferenceBackend =
                   new QaEngine.EchoBackend): DataFrame = {
    val filtered = QualityFilter(snapshot)
    val known = KnownFields(filtered)
    val tagged = TagCategorizer.categorize(known, vocabs)

    val knownMethod = "Parsed_from_HF_dataset"
    val knownCols = Seq(
      "schema.org:name" -> "name",
      "schema.org:identifier" -> "identifier",
      "fair4ml:sharedBy" -> "shared_by",
      "schema.org:dateCreated" -> "date_created",
      "schema.org:datePublished" -> "date_published",
      "schema.org:dateModified" -> "date_modified",
      "schema.org:url" -> "model_url",
      "schema.org:discussionUrl" -> "discussion_url",
      "codemeta:readme" -> "readme_url",
      "schema.org:description" -> "description")
    val knownRows = knownCols.map { case (prop, c) =>
      longFormat(known, prop, col(c), knownMethod, 1.0)
    }.reduce(_ unionByName _)

    val tagMethod = "Parsed_from_HF_tags"
    val tagCols = Seq(
      "fair4ml:trainedOn" -> "trained_on",
      "fair4ml:evaluatedOn" -> "evaluated_on",
      "codemeta:referencePublication" -> "reference_publication",
      "fair4ml:fineTunedFrom" -> "fine_tuned_from",
      "schema.org:inLanguage" -> "in_language",
      "fair4ml:mlTask" -> "ml_task",
      "schema.org:keywords" -> "keywords")
    val tagRows = tagCols.map { case (prop, c) =>
      longFormat(tagged.select(col("modelId"), explode(col(c)).as("v")),
        prop, col("v"), tagMethod, 1.0)
    }.reduce(_ unionByName _)

    val yamlMethod = "Parsed_from_YAML"
    val yamlRows =
      longFormat(filtered, "schema.org:license", fmLicense(col("card")), yamlMethod, 1.0)
        .unionByName(longFormat(filtered, "schema.org:conditionsOfAccess",
          fmGated(col("card")), yamlMethod, 1.0))

    val matched = SchemaPropertyExtractor
      .extract(filtered, schemaQueries, backend, strategy, inference)
      .toDF()
      .select(col("modelId"), col("property"), col("value").as("value"),
        col("method"), col("confidence"))

    knownRows.unionByName(tagRows).unionByName(yamlRows).unionByName(matched)
  }

  /** Property table → (triples, statement metadata), subjects by entity
    * hash (§1.4), ready for the versioned store. */
  def toTriples(props: DataFrame, platform: String,
                extractionTime: Timestamp): DataFrame = {
    props.select(
      concat(lit("https://w3id.org/mlentory/mlentory_graph/"),
        sha2(concat_ws("|", lit(s"platform=$platform"), lit("type=model"),
          col("modelId")), 256)).as("subject"),
      col("property").as("predicate"),
      col("value").as("obj"),
      when(col("value").startsWith("http://") || col("value").startsWith("https://"),
        "iri").otherwise("literal").as("objKind"),
      lit("").as("datatype"),
      col("method").as("extractionMethod"),
      col("confidence"),
      lit(extractionTime).as("extractionTime"))
  }
}
