package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.transform.TripleBuilder.PropertySpec

/** The per-entity-family triple builders T3-T5 (SURVEY §2.10), each a
  * PropertySpec program over the fixture schema — declarative explodes
  * like T1, no row loops.
  */
object EntityBuilders {

  val Base = "https://w3id.org/mlentory/mlentory_graph/"
  private val Schema = "https://schema.org/"

  private def entitySubject(entityType: String, idCol: org.apache.spark.sql.Column) =
    concat(lit(Base), sha2(concat_ws("|", lit("platform=hf"),
      lit(s"type=$entityType"), idCol), 256))

  /** T3 arXiv articles (`KnowledgeGraphHandler.py:585-666`): id normalized
    * by stripping the version suffix; typed date; DOI sameAs. Input schema
    * per FIXTURES.md §4. */
  def arxivTriples(articles: DataFrame): DataFrame = {
    val normed = articles.withColumn("arxiv_id_norm",
      regexp_replace(element_at(split(col("arxiv_id"), "/"), -1), "v\\d+$", ""))
    TripleBuilder.triples(
      normed,
      entitySubject("article", col("arxiv_id_norm")),
      Seq(
        PropertySpec("${Schema}type".replace("${Schema}", Schema),
          lit(Schema + "ScholarlyArticle"), objKind = "iri"),
        PropertySpec(Schema + "name", col("title")),
        PropertySpec(Schema + "url",
          concat(lit("https://arxiv.org/abs/"), col("arxiv_id_norm")),
          objKind = "iri"),
        PropertySpec(Schema + "abstract", col("summary")),
        PropertySpec(Schema + "sameAs",
          when(col("doi").isNotNull && col("doi") =!= "",
            concat(lit("https://doi.org/"), col("doi"))), objKind = "iri"),
        PropertySpec(Schema + "datePublished", col("published"),
          datatype = "http://www.w3.org/2001/XMLSchema#date")))
      .unionByName(
        // keywords per category / author literals: array fan-out
        normed.select(entitySubject("article", col("arxiv_id_norm")).as("subject"),
            explode(col("categories")).as("obj"))
          .select(col("subject"), lit(Schema + "keywords").as("predicate"),
            col("obj"), lit("literal").as("objKind"), lit("").as("datatype")))
  }

  /** T4 keyword vocabulary (`KnowledgeGraphHandler.py:668-708`):
    * DefinedTerm per tag, lowercased hash identity. */
  def keywordTriples(vocab: DataFrame): DataFrame =
    TripleBuilder.triples(
      vocab.withColumn("tag_lc", lower(col("tag_name"))),
      entitySubject("keyword", col("tag_lc")),
      Seq(
        PropertySpec(Schema + "type", lit(Schema + "DefinedTerm"), objKind = "iri"),
        PropertySpec(Schema + "name", col("tag_lc")),
        PropertySpec(Schema + "description", col("description"))))

  /** T5 SPDX licenses (`GraphBuilderLicense.py:29-168`): CreativeWork per
    * row, identifier falling back to name. Input: FIXTURES.md §6 columns.
    */
  def licenseTriples(spdx: DataFrame): DataFrame =
    TripleBuilder.triples(
      spdx.withColumn("ident", coalesce(
        when(col("identifier") =!= "", col("identifier")), col("name"))),
      entitySubject("license", col("ident")),
      Seq(
        PropertySpec(Schema + "type", lit(Schema + "CreativeWork"), objKind = "iri"),
        PropertySpec(Schema + "name", col("name")),
        PropertySpec(Schema + "identifier", col("ident")),
        PropertySpec(Schema + "url",
          when(col("url").isNotNull && col("url") =!= "", col("url")),
          objKind = "iri"),
        PropertySpec(Schema + "description", col("license_text"))))

  /** A1 related-entity collection (`HFExtractor.py:365-402`): distinct
    * values of the given long-format properties, keyed by target entity
    * type — the frontier feed for the S3-S6 fetches and the A11 BFS. */
  def relatedEntities(props: DataFrame,
                      typeByProperty: Map[String, String]): DataFrame = {
    val typeCol = typeByProperty.foldLeft(lit(null).cast("string")) {
      case (acc, (prop, tpe)) => when(col("property") === prop, tpe).otherwise(acc)
    }
    props
      .withColumn("entity_type", typeCol)
      .filter(col("entity_type").isNotNull)
      .select("entity_type", "value")
      .distinct()
  }
}
