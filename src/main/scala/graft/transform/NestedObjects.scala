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

  /** The run-entity URI — ONE definition shared by the nested
    * child-entity trees and any flat-property arm that must root at the
    * same subject (q_openml_lifecycle): a drift between two copies of
    * this hash would silently split one run into disjoint subjects. */
  def runEntityUri(platform: String, id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit(Base),
      org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.concat_ws("|",
          org.apache.spark.sql.functions.lit(s"platform=$platform"),
          org.apache.spark.sql.functions.lit("type=run"),
          id.cast("string")), 256))
  /** Generic typed entity URI — the same `sha256("platform=..|type=..|
    * id")` convention with a PER-ROW type column, for platforms whose
    * records fan out by entity type (AI4Life's model/dataset/application
    * grouping, `AI4LifeExtractor.py:223-243`): q_ai4life_lifecycle's
    * triple arms and its oracle must hash identically, so the formula
    * lives once, here. */
  def typedEntityUri(platform: String, tpe: org.apache.spark.sql.Column,
                     id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit(Base),
      entityHash(platform, tpe, id.cast("string")))

  val SchemaNs = "https://schema.org/"
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  val XsdAnyUri = "http://www.w3.org/2001/XMLSchema#anyURI"

  private def entityHash(platform: String, tpe: Column, id: Column): Column =
    sha2(concat_ws("|", lit(s"platform=$platform"),
      concat(lit("type="), tpe), id), 256)

  /** Composite-id field join: NUL separator AND per-field null coalescing
    * (concat_ws SKIPS nulls, which would shift field boundaries), so
    * neither embedded separators nor null/value swaps can collide two
    * distinct entities — the full TripletStore.withIdentity rule. */
  private def idJoin(fields: Column*): Column =
    concat_ws("\u0000",
      fields.map(f => coalesce(f.cast("string"), lit("\u0001<null>"))): _*)

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

  /** Map fan-out as a NATIVE map explode (one triple per entry). An array
    * HOF (`transform(map_entries(...))`) inside the generator child is
    * CodegenFallback in Spark 4 and measured ~10x slower per output row;
    * exploding the map directly stays in codegen. */
  private def mapTriples(pre: DataFrame, subject: String, m: String,
                         dt: String): DataFrame =
    pre.select(col(subject), explode(col(m)))
      .select(col(subject).as("subject"),
        concat(lit(Fair4ml), col("key")).as("predicate"),
        col("value").cast("string").as("obj"),
        lit("literal").as("objKind"), lit(dt).as("datatype"))
      .filter(col("obj").isNotNull)

  /** DatasetObject + estimationProcedure tree. `dataset` must be a struct
    * column with fields `name`, `url`, and `estimationProcedure`
    * (itself a struct of `type`, `data_splits_url`,
    * `parameters: map<string,string>`).
    *
    * The uris/hashes are projected ONCE and checkpointed before the
    * explode — inlined, each of the ~8 references to a child uri would
    * re-run its sha256 chain per array element, and the materialized
    * projection is tiny (ids + uris + scalars) relative to the 14x larger
    * triple output it generates. */
  /** Pre-projection columns for the dataset tree (uris computed once). */
  private[graft] def datasetPreColumns(platform: String, parentSubject: Column,
                                       dataset: Column): Seq[Column] = {
    val ep = dataset.getField("estimationProcedure")
    val doHash = entityHash(platform, lit("DatasetObject"),
      idJoin(dataset.getField("name"), dataset.getField("url")))
    val doUri = concat(lit(Base), doHash)
    // the reference keys the child on "estimationProcedure" + parent hash
    val epHash = entityHash(platform, concat(lit("estimationProcedure"), doHash),
      idJoin(ep.getField("type"), ep.getField("data_splits_url")))
    val epUri = concat(lit(Base), epHash)
    Seq(parentSubject.as("parent_s"), doUri.as("do_s"), epUri.as("ep_s"),
      dataset.getField("name").as("ds_name"),
      dataset.getField("url").as("ds_url"),
      ep.getField("type").as("ep_type"),
      ep.getField("data_splits_url").as("ep_url"),
      ep.getField("parameters").as("params"))
  }

  /** Dataset tree over a prepared (already materialized) projection. */
  private[graft] def datasetTreeFromPre(pre: DataFrame,
                                        predicate: String): DataFrame = {
    val fixed = explodeTriples(pre, array(
      tri(col("parent_s"), lit(predicate), col("do_s"), "iri", ""),
      tri(col("do_s"), lit(RdfType), lit(Fair4ml + "DatasetObject"), "iri", ""),
      tri(col("do_s"), lit(SchemaNs + "name"), col("ds_name"),
        "literal", XsdString),
      tri(col("do_s"), lit(SchemaNs + "url"), col("ds_url"),
        "literal", XsdString),
      tri(col("do_s"), lit(Fair4ml + "estimationProcedure"), col("ep_s"),
        "iri", ""),
      tri(col("ep_s"), lit(RdfType), lit(Fair4ml + "estimationProcedure"),
        "iri", ""),
      tri(col("ep_s"), lit(SchemaNs + "type"), col("ep_type"),
        "literal", XsdString),
      tri(col("ep_s"), lit(SchemaNs + "url"), col("ep_url"),
        "literal", XsdAnyUri)))
    fixed.unionByName(mapTriples(pre, "ep_s", "params", XsdString))
  }

  /** DatasetObject + estimationProcedure tree (standalone entry: projects
    * + checkpoints its own pre; use the `*PreColumns`/`*FromPre` pair with
    * one shared checkpoint when emitting several trees from one frame). */
  def datasetObjectTriples(df: DataFrame, platform: String,
                           parentSubject: Column, predicate: String,
                           dataset: Column): DataFrame =
    datasetTreeFromPre(
      df.select(datasetPreColumns(platform, parentSubject, dataset): _*)
        .localCheckpoint(), predicate)

  /** Pre-projection columns for the evaluation tree: identity = sorted
    * `key=value` entries over both maps (the sort HOF is computed once
    * here and never reaches a generator). */
  private[graft] def evalPreColumns(platform: String, parentSubject: Column,
                                    numericMetrics: Column,
                                    textMetrics: Column): Seq[Column] = {
    // SOH between key and value, NUL between entries: a metric key
    // containing '=' or '|' cannot shift entry boundaries
    def entry(kv: Column) =
      concat(kv.getField("key"), lit("\u0001"),
        coalesce(kv.getField("value").cast("string"), lit("\u0001<null>")))
    val entries = array_sort(concat(
      transform(map_entries(numericMetrics), kv => entry(kv)),
      transform(map_entries(textMetrics), kv => entry(kv))))
    val evHash = entityHash(platform, lit("EvaluationObject"),
      array_join(entries, "\u0000"))
    Seq(parentSubject.as("parent_s"),
      concat(lit(Base), evHash).as("ev_s"),
      numericMetrics.as("num_m"), textMetrics.as("text_m"))
  }

  /** Evaluation tree over a prepared projection. */
  private[graft] def evalTreeFromPre(pre: DataFrame,
                                     predicate: String): DataFrame = {
    val fixed = explodeTriples(pre, array(
      tri(col("parent_s"), lit(predicate), col("ev_s"), "iri", ""),
      tri(col("ev_s"), lit(RdfType), lit(Fair4ml + "EvaluationObject"),
        "iri", "")))
    fixed.unionByName(mapTriples(pre, "ev_s", "num_m", XsdDouble))
      .unionByName(mapTriples(pre, "ev_s", "text_m", XsdString))
  }

  /** EvaluationObject tree: numeric metrics typed xsd:double, text metrics
    * xsd:string. */
  def evaluationObjectTriples(df: DataFrame, platform: String,
                              parentSubject: Column, predicate: String,
                              numericMetrics: Column,
                              textMetrics: Column): DataFrame =
    evalTreeFromPre(
      df.select(evalPreColumns(platform, parentSubject, numericMetrics,
        textMetrics): _*).localCheckpoint(), predicate)
}
