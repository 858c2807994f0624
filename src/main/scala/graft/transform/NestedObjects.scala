package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T1's nested child-entity generation — the DatasetObject and
  * EvaluationObject trees an OpenML run expands into
  * (`GraphBuilderFAIR4ML.py:350-415` dataset-object branch,
  * `GraphBuilderFAIR4ML.py:462-484` evaluation-object branch):
  *
  *  - A DatasetObject value becomes a child entity (rdf:type, schema:name,
  *    schema:url) plus a grand-child estimationProcedure entity
  *    (rdf:type, schema:type, schema:url as xsd:anyURI) whose parameters
  *    map fans out to one `fair4ml:<param>` triple per entry; the parent
  *    run links to the child via the original predicate, and the child to
  *    the grand-child via `fair4ml:estimationProcedure`.
  *  - An EvaluationObject value becomes a child entity whose metrics fan
  *    out to one `fair4ml:<metric>` triple each, typed xsd:double for
  *    numeric metrics and xsd:string otherwise (the reference's
  *    isinstance(float) switch, restated structurally as two maps).
  *
  * Entity identity follows the repo's `sha256("platform=..|type=..|id")`
  * convention (the engine's restatement of `generate_entity_hash`,
  * `GraphBuilderBase.py:208-237`); the estimationProcedure type string
  * embeds the parent hash exactly like the reference's
  * `"estimationProcedure" + id_hash`.
  *
  * Everything is a declarative per-row array explode (fixed triples
  * concatenated with a `transform` over the map entries) — whole-stage
  * codegen, no row loops, no shuffle until the caller aggregates.
  */
object NestedObjects {

  val Base: String = EntityBuilders.Base
  val Fair4ml = "https://w3id.org/fair4ml/"
  val SchemaNs = "https://schema.org/"
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  val XsdAnyUri = "http://www.w3.org/2001/XMLSchema#anyURI"

  private def entityHash(platform: String, tpe: Column, id: Column): Column =
    sha2(concat_ws("|", lit(s"platform=$platform"),
      concat(lit("type="), tpe), id), 256)

  /** One triple struct; subject and predicate are per-row expressions. */
  private def tri(s: Column, p: Column, o: Column, kind: String,
                  dt: String): Column =
    struct(s.as("subject"), p.as("predicate"), o.cast("string").as("obj"),
      lit(kind).as("objKind"), lit(dt).as("datatype"))

  private def explodeTriples(df: DataFrame, triples: Column): DataFrame =
    df.select(explode(triples).as("t"))
      .select(col("t.subject").as("subject"), col("t.predicate").as("predicate"),
        col("t.obj").as("obj"), col("t.objKind").as("objKind"),
        col("t.datatype").as("datatype"))
      .filter(col("obj").isNotNull)

  /** DatasetObject + estimationProcedure tree. `dataset` must be a struct
    * column with fields `name`, `url`, and `estimationProcedure`
    * (itself a struct of `type`, `data_splits_url`,
    * `parameters: map<string,string>`). */
  def datasetObjectTriples(df: DataFrame, platform: String,
                           parentSubject: Column, predicate: String,
                           dataset: Column): DataFrame = {
    val ep = dataset.getField("estimationProcedure")
    val doHash = entityHash(platform, lit("DatasetObject"),
      concat_ws("|", dataset.getField("name"), dataset.getField("url")))
    val doUri = concat(lit(Base), doHash)
    // the reference keys the child on "estimationProcedure" + parent hash
    val epHash = entityHash(platform, concat(lit("estimationProcedure"), doHash),
      concat_ws("|", ep.getField("type"), ep.getField("data_splits_url")))
    val epUri = concat(lit(Base), epHash)
    val fixed = array(
      tri(parentSubject, lit(predicate), doUri, "iri", ""),
      tri(doUri, lit(RdfType), lit(Fair4ml + "DatasetObject"), "iri", ""),
      tri(doUri, lit(SchemaNs + "name"), dataset.getField("name"),
        "literal", XsdString),
      tri(doUri, lit(SchemaNs + "url"), dataset.getField("url"),
        "literal", XsdString),
      tri(doUri, lit(Fair4ml + "estimationProcedure"), epUri, "iri", ""),
      tri(epUri, lit(RdfType), lit(Fair4ml + "estimationProcedure"), "iri", ""),
      tri(epUri, lit(SchemaNs + "type"), ep.getField("type"),
        "literal", XsdString),
      tri(epUri, lit(SchemaNs + "url"), ep.getField("data_splits_url"),
        "literal", XsdAnyUri))
    val params = transform(map_entries(ep.getField("parameters")),
      kv => tri(epUri, concat(lit(Fair4ml), kv.getField("key")),
        kv.getField("value"), "literal", XsdString))
    explodeTriples(df, concat(fixed, params))
  }

  /** EvaluationObject tree: numeric metrics typed xsd:double, text metrics
    * xsd:string. Identity = sorted `key=value` entries over both maps. */
  def evaluationObjectTriples(df: DataFrame, platform: String,
                              parentSubject: Column, predicate: String,
                              numericMetrics: Column,
                              textMetrics: Column): DataFrame = {
    val entries = array_sort(concat(
      transform(map_entries(numericMetrics),
        kv => concat(kv.getField("key"), lit("="),
          kv.getField("value").cast("string"))),
      transform(map_entries(textMetrics),
        kv => concat(kv.getField("key"), lit("="), kv.getField("value")))))
    val evHash = entityHash(platform, lit("EvaluationObject"),
      array_join(entries, "|"))
    val evUri = concat(lit(Base), evHash)
    val fixed = array(
      tri(parentSubject, lit(predicate), evUri, "iri", ""),
      tri(evUri, lit(RdfType), lit(Fair4ml + "EvaluationObject"), "iri", ""))
    val numTris = transform(map_entries(numericMetrics),
      kv => tri(evUri, concat(lit(Fair4ml), kv.getField("key")),
        kv.getField("value").cast("string"), "literal", XsdDouble))
    val textTris = transform(map_entries(textMetrics),
      kv => tri(evUri, concat(lit(Fair4ml), kv.getField("key")),
        kv.getField("value"), "literal", XsdString))
    explodeTriples(df, concat(fixed, numTris, textTris))
  }
}
