package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.transform.TripleBuilder
import graft.transform.TripleBuilder.PropertySpec

/** Graph-pipeline operators exercised end-to-end on the test tables:
  * T1-shaped triple generation (row → typed triples via declarative
  * explode), A10 entity→document pivot, and J7 URI→name resolution —
  * the reference's transform/load query surface restated over `customer`.
  */
object Graph {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private def customerTriples(s: SparkSession, dir: String): DataFrame = {
    val subject = concat(lit("urn:cust:"), col("c_custkey").cast("string"))
    TripleBuilder.triples(
      t(s, dir, "customer"),
      subject,
      Seq(
        PropertySpec("rdf:type", lit("schema:Person"), objKind = "iri"),
        PropertySpec("schema:name", col("c_name")),
        PropertySpec("schema:url",
          concat(lit("https://example.org/customer/"), col("c_custkey").cast("string")),
          objKind = "iri"),
        PropertySpec("schema:memberOf",
          concat(lit("urn:segment:"), lower(col("c_mktsegment"))), objKind = "iri"),
        PropertySpec("schema:knows",
          when(col("c_custkey") > 0,
            concat(lit("urn:cust:"), (col("c_custkey") - 1).cast("string"))),
          objKind = "iri")))
  }

  /** T1 triple generation: 4-5 typed triples per entity row. */
  def tripleGen(s: SparkSession, dir: String): DataFrame =
    customerTriples(s, dir)

  val tripleGenSql: String =
    """SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR) AS subject,
      |       'rdf:type' AS predicate, 'schema:Person' AS obj,
      |       'iri' AS objkind, '' AS datatype FROM customer
      |UNION ALL
      |SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:name', c_name,
      |       'literal', '' FROM customer
      |UNION ALL
      |SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:url',
      |       'https://example.org/customer/' || CAST(c_custkey AS VARCHAR),
      |       'iri', '' FROM customer
      |UNION ALL
      |SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:memberOf',
      |       'urn:segment:' || lower(c_mktsegment), 'iri', '' FROM customer
      |UNION ALL
      |SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:knows',
      |       'urn:cust:' || CAST(c_custkey - 1 AS VARCHAR), 'iri', ''
      |FROM customer WHERE c_custkey > 0""".stripMargin

  /** A10 doc pivot: one row per subject with a sorted `pred=obj` list. */
  def docPivot(s: SparkSession, dir: String): DataFrame =
    TripleBuilder.docPivot(customerTriples(s, dir))

  val docPivotSql: String =
    """WITH tri AS (
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR) AS subject,
      |         'rdf:type' AS predicate, 'schema:Person' AS obj FROM customer
      |  UNION ALL
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:name', c_name FROM customer
      |  UNION ALL
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:url',
      |         'https://example.org/customer/' || CAST(c_custkey AS VARCHAR) FROM customer
      |  UNION ALL
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:memberOf',
      |         'urn:segment:' || lower(c_mktsegment) FROM customer
      |  UNION ALL
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR), 'schema:knows',
      |         'urn:cust:' || CAST(c_custkey - 1 AS VARCHAR)
      |  FROM customer WHERE c_custkey > 0)
      |SELECT subject,
      |  string_agg(predicate || '=' || obj, ';' ORDER BY predicate || '=' || obj) AS props,
      |  COUNT(*) AS n_props
      |FROM tri GROUP BY subject""".stripMargin

  /** J7 URI→name resolution: `schema:knows` object IRIs replaced by the
    * known entity's name, IRI kept when unresolvable. */
  def nameResolution(s: SparkSession, dir: String): DataFrame =
    TripleBuilder.resolveNames(customerTriples(s, dir), "schema:name")
      .filter(col("predicate") === "schema:knows")
      .select("subject", "obj")

  val nameResolutionSql: String =
    """WITH knows AS (
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR) AS subject,
      |         'urn:cust:' || CAST(c_custkey - 1 AS VARCHAR) AS obj
      |  FROM customer WHERE c_custkey > 0),
      |names AS (
      |  SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR) AS nameSubject,
      |         MIN(c_name) AS entityName
      |  FROM customer GROUP BY 1)
      |SELECT k.subject, COALESCE(n.entityName, k.obj) AS obj
      |FROM knows k LEFT JOIN names n ON k.obj = n.nameSubject""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triple_gen" -> tripleGen _,
    "q_doc_pivot" -> docPivot _,
    "q_name_resolution" -> nameResolution _)

  val oracles: Map[String, String] = Map(
    "q_triple_gen" -> tripleGenSql,
    "q_doc_pivot" -> docPivotSql,
    "q_name_resolution" -> nameResolutionSql)
}
