package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Row → triples generation (the T1-T5 operator family, SURVEY §2.10) as a
  * declarative explode — not a row loop: each property spec contributes one
  * struct to an array column that is exploded into the triple table, so the
  * whole generation stays inside whole-stage codegen.
  *
  * Mirrors `GraphBuilderFAIR4ML.py:48-162` (drive loop) re-expressed
  * Spark-first; provenance columns ride along into the statement-metadata
  * table (`GraphBuilderBase.add_triple_with_metadata`,
  * `GraphBuilderBase.py:103-180`).
  */
object TripleBuilder {

  /** One property of the output graph: a predicate IRI plus column
    * expressions for the object value and its kind/datatype. */
  final case class PropertySpec(
      predicate: String,
      obj: Column,
      objKind: String = "literal",
      datatype: String = "")

  /** Generate the triple table for `df`: one row per (input row × spec)
    * with null objects dropped (P8 empty normalization happens in the
    * spec's column expression).
    *
    * @param subject column producing the subject IRI per row
    */
  def triples(df: DataFrame, subject: Column, specs: Seq[PropertySpec]): DataFrame = {
    val structs = array(specs.map { sp =>
      struct(
        lit(sp.predicate).as("predicate"),
        sp.obj.cast("string").as("obj"),
        lit(sp.objKind).as("objKind"),
        lit(sp.datatype).as("datatype"))
    }: _*)
    df.select(subject.as("subject"), explode(structs).as("t"))
      .select(col("subject"), col("t.predicate").as("predicate"),
        col("t.obj").as("obj"), col("t.objKind").as("objKind"),
        col("t.datatype").as("datatype"))
      .filter(col("obj").isNotNull)
  }

  /** Triples + reified statement metadata in one pass (provenance columns
    * must exist on `df`: extractionMethod, confidence, extractionTime). */
  def triplesWithMeta(df: DataFrame, subject: Column,
                      specs: Seq[PropertySpec]): (DataFrame, DataFrame) = {
    val structs = array(specs.map { sp =>
      struct(
        lit(sp.predicate).as("predicate"),
        sp.obj.cast("string").as("obj"),
        lit(sp.objKind).as("objKind"),
        lit(sp.datatype).as("datatype"))
    }: _*)
    val exploded = df.select(subject.as("subject"), col("extractionMethod"),
        col("confidence"), col("extractionTime"), explode(structs).as("t"))
      .select(col("subject"), col("t.predicate").as("predicate"),
        col("t.obj").as("obj"), col("t.objKind").as("objKind"),
        col("t.datatype").as("datatype"), col("extractionMethod"),
        col("confidence"), col("extractionTime"))
      .filter(col("obj").isNotNull)
    val kg = exploded.select("subject", "predicate", "obj", "objKind", "datatype")
      .dropDuplicates("subject", "predicate", "obj")
    val meta = exploded.select("subject", "predicate", "obj",
      "extractionMethod", "confidence", "extractionTime")
    (kg, meta)
  }

  /** A7 statement disambiguation: keep, per distinct (s,p,o), the metadata
    * row with max (confidence, extractionTime)
    * (`MlentoryTransformWithGraphBuilder.py:371-516`). */
  def disambiguate(meta: DataFrame): DataFrame = {
    val w = Window.partitionBy("subject", "predicate", "obj")
      .orderBy(col("confidence").desc, col("extractionTime").desc,
        col("extractionMethod"))
    meta.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** A5 graph union with triple-set semantics. */
  def unionGraphs(graphs: Seq[DataFrame]): DataFrame =
    graphs.reduce(_ unionByName _).dropDuplicates("subject", "predicate", "obj")

  /** A10 entity→document pivot: fold a triple table into one row per
    * subject with a deterministic `pred=obj` property list — two-level
    * aggregation, sorted for stable output
    * (`GraphHandlerForKG.py:263-340`). */
  def docPivot(triples: DataFrame): DataFrame =
    triples
      .groupBy("subject")
      .agg(array_join(array_sort(collect_list(
        concat(col("predicate"), lit("="), col("obj")))), ";").as("props"),
        count(lit(1)).as("n_props"))

  /** A10 doc pivot with the reference's platform classification: every
    * search doc is tagged OpenML / AI4Life / Hugging Face by substring of
    * the entity's first `schema:url` object
    * (`GraphHandlerForKG.py:300-315`; "first" restated deterministically
    * as min(obj)). Entities without a url triple fall to the else branch
    * like the reference's default. */
  def docPivotPlatform(triples: DataFrame,
                       urlPredicate: String = "https://schema.org/url"): DataFrame =
    // one aggregation carries the url alongside the pivot — a single
    // shuffle, where a separate url groupBy + join would shuffle twice
    triples.groupBy("subject")
      .agg(
        array_join(array_sort(collect_list(
          concat(col("predicate"), lit("="), col("obj")))), ";").as("props"),
        count(lit(1)).as("n_props"),
        min(when(col("predicate") === urlPredicate, col("obj")))
          .as("first_url"))
      .withColumn("platform",
        when(col("first_url").contains("https://www.openml.org"), "OpenML")
          .when(col("first_url").contains("https://bioimage.io"), "AI4Life")
          .otherwise("Hugging Face"))
      .drop("first_url")

  /** J7 URI→name resolution: replace object IRIs with the target entity's
    * name triple when one exists, else keep the IRI
    * (`GraphHandlerForKG.py:217-261`). */
  def resolveNames(triples: DataFrame, namePredicate: String): DataFrame = {
    val names = triples.filter(col("predicate") === namePredicate)
      .groupBy(col("subject").as("nameSubject"))
      .agg(min(col("obj")).as("entityName"))
    triples.join(names, triples("obj") === names("nameSubject"), "left")
      .select(triples("subject"), triples("predicate"),
        coalesce(col("entityName"), triples("obj")).as("obj"),
        triples("objKind"), triples("datatype"))
  }
}
