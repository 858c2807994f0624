package graft.queries


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.extract.{PlatformPipelines, SchemaMapping}

/** The reference's SECOND composed ETL entry point as one graded row —
  * the OpenML lifecycle (SURVEY §3.2,
  * `deployment/openml_etl/run_extract_transform_load.py`): S7
  * schema-driven extraction over nested run records (dotted Path /
  * Format / Concat rules, `OpenMLExtractor.py:420-546`) with the J3
  * dataset-status broadcast dim and its scraped-over-api coalesce →
  * flat property triples on the hashed run URI + the T1 NESTED
  * DatasetObject/EvaluationObject child-entity trees
  * (`GraphBuilderFAIR4ML.py:350-415,462-484` — the piece scalar rule
  * mapping cannot express) → A5 graph union → two-version V1–V5 MERGE
  * → the V8 current graph with A9 audit counts. q_etl_lifecycle
  * composes the HF chain (§3.1); this row does the same for §3.2's
  * distinctive members, so BOTH production entry points are graded as
  * compositions, not stages.
  *
  * Fixture: a 500-run orders slice plays the run table (the proven
  * q_nested_entities projection — [[Graph.openmlRunsFixture]], shared);
  * the nested trees are load-invariant (all extend), while load 2
  * changes the J3 dim's api_status for o_custkey%3==0 — visible only
  * where no scraped status wins the coalesce (%4!=0), so the oracle
  * must replay the J3 precedence to predict the deprecation set — and
  * drops the `tags` property for o_orderkey%5==0 (the vanished-property
  * arm). Duplicate child entities across runs (two orders sharing a
  * customer produce the SAME DatasetObject URI and triples; equal
  * metric content produces the same EvaluationObject) are deduplicated
  * by the merge's identity grouping — the oracle replays with DISTINCT.
  */
object OpenmlLifecycle {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // Logical clock: the shared lifecycle constants (LifecycleMerge).
  private val T1 = LifecycleMerge.T1
  private val T2 = LifecycleMerge.T2

  private val SliceSql = "o_orderkey < 500"

  /** The flat-property run records for the S7 rule mapping. */
  private def flatRuns(slice: DataFrame): DataFrame =
    slice.select(
      col("o_orderkey").cast("string").as("rid"),
      struct(
        col("o_orderkey").as("id"),
        concat(lit("flow_"), col("o_orderpriority")).as("flow_name"),
        (col("o_orderkey") % 17).as("uploader")).as("run"),
      struct(col("o_orderstatus").as("status0"),
        col("o_custkey").as("cust")).as("meta"))

  /** J3 status dim for load `v`: scraped present for o_custkey%4==0
    * (always wins the coalesce), api bumped in load 2 for %3==0. */
  private def statusDim(slice: DataFrame, v: Int): DataFrame = {
    val api =
      if (v == 1) concat(lit("api_"), col("o_orderstatus"))
      else when(col("o_custkey") % 3 === 0,
          concat(lit("api2_"), col("o_orderstatus")))
        .otherwise(concat(lit("api_"), col("o_orderstatus")))
    slice.select(
      col("o_orderkey").cast("string").as("identifier"),
      api.as("api_status"),
      when(col("o_custkey") % 4 === 0,
        concat(lit("scr_"), col("o_orderstatus"))).as("scraped_status"))
  }

  /** The run-entity URI — the ONE shared hash the nested tree roots at
    * ([[graft.transform.NestedObjects.runEntityUri]]). */
  private def runSubject(id: Column): Column =
    graft.transform.NestedObjects.runEntityUri("openml", id)

  /** One extraction pass: S7 flat properties (+J3 coalesce) as triples
    * on the run URI, unioned with the nested child-entity trees, ready
    * for the merge. */
  private def extractionBatch(s: SparkSession, dir: String, v: Int): DataFrame = {
    import SchemaMapping.{Concat, Format, Path}
    val slice = t(s, dir, "orders").filter(expr(SliceSql))
    val long = PlatformPipelines.openml(
      flatRuns(slice),
      Seq(
        "name" -> Format("Run {run.id} [{meta.cust}]"),
        "flow" -> Path("run.flow_name"),
        "uploader" -> Format("user_{run.uploader}"),
        "tags" -> Concat(Seq("run.flow_name", "meta.status0"))),
      idColumn = "rid", datasetStatus = Some(statusDim(slice, v)))
    val kept =
      if (v == 1) long
      else long.filter(!(col("property") === "tags" &&
        col("modelId").cast("long") % 5 === 0))
    val flat = kept.select(
      runSubject(col("modelId")).as("subject"),
      concat(lit("openml:"), col("property")).as("predicate"),
      col("value").as("obj"),
      lit("literal").as("objKind"), lit("").as("datatype"),
      col("method").as("extractionMethod"), col("confidence"))
    val nested = PlatformPipelines.openmlNestedTriples(
        Graph.openmlRunsFixture(s, dir).filter(expr(SliceSql)), "o_orderkey")
      .withColumn("extractionMethod", lit("openml_python_package"))
      .withColumn("confidence", lit(1.0))
    flat.unionByName(nested)
      .withColumn("extractionTime",
        timestamp_seconds(lit(if (v == 1) T1 else T2)))
  }

  /** The composed §3.2 lifecycle: two extraction passes merged as
    * versions 0 and 1 of a scratch store; output = the current graph
    * (incl. the typed nested-literal datatypes) with `start_ms`
    * separating extended from fresh ranges and the A9 audit counts. */
  def openmlLifecycle(s: SparkSession, dir: String): DataFrame =
    LifecycleMerge.twoVersionCurrentGraph(s, dir, "graft_oml_q",
      v => extractionBatch(s, dir, v),
      extra = Seq(col("datatype")))

  /** Whole-chain replay: the S7 rules + J3 coalesce per load, the
    * proven nested-tree replay over the slice (load-invariant), DISTINCT
    * per load (duplicate child entities collapse under the merge's
    * identity grouping), then the merge arms and the audit scalars. */
  val openmlLifecycleSql: String = {
    val runHash = "'https://w3id.org/mlentory/mlentory_graph/' || " +
      "sha256('platform=openml|type=run|' || CAST(o_orderkey AS VARCHAR))"
    def flat(name: String, apiExpr: String, tagsPred: String): String =
      s"""$name AS (
         |  SELECT DISTINCT subject, predicate, obj, objkind, datatype FROM (
         |    SELECT $runHash AS subject, a.predicate, a.obj,
         |      'literal' AS objkind, '' AS datatype
         |    FROM sl, LATERAL (
         |      SELECT 'openml:name' AS predicate,
         |        'Run ' || o_orderkey || ' [' || o_custkey || ']' AS obj
         |      UNION ALL SELECT 'openml:flow', 'flow_' || o_orderpriority
         |      UNION ALL SELECT 'openml:uploader', 'user_' || (o_orderkey % 17)
         |      UNION ALL SELECT 'openml:tags',
         |        '[flow_' || o_orderpriority || ', ' || o_orderstatus || ']'
         |      WHERE $tagsPred
         |      UNION ALL SELECT 'openml:status',
         |        CASE WHEN o_custkey % 4 = 0 THEN 'scr_' || o_orderstatus
         |             ELSE $apiExpr END) a))""".stripMargin
    // assembled by CONCATENATION of pre-stripped pieces: the nested-tree
    // SQL contains continuation lines beginning with `||`, which a second
    // stripMargin pass over an interpolating template would mangle into
    // single pipes
    val head =
      s"""WITH sl AS (SELECT * FROM orders WHERE $SliceSql),
         |nested AS (
         |  SELECT DISTINCT subject, predicate, obj, objkind, datatype FROM (
         |""".stripMargin
    val tail =
      s"""g1 AS (SELECT * FROM nested UNION SELECT * FROM f1),
         |g2 AS (SELECT * FROM nested UNION SELECT * FROM f2),
         |cur AS (
         |  SELECT g1.subject, g1.predicate, g1.obj, g1.objkind, g1.datatype,
         |         ${T1 * 1000} AS start_ms
         |  FROM g1 JOIN g2 ON g1.subject = g2.subject
         |    AND g1.predicate = g2.predicate AND g1.obj = g2.obj
         |  UNION ALL
         |  SELECT g2.subject, g2.predicate, g2.obj, g2.objkind, g2.datatype,
         |         ${T2 * 1000}
         |  FROM g2
         |  WHERE NOT EXISTS (SELECT 1 FROM g1 WHERE g1.subject = g2.subject
         |    AND g1.predicate = g2.predicate AND g1.obj = g2.obj)),
         |dep AS (
         |  SELECT g1.subject FROM g1
         |  WHERE NOT EXISTS (SELECT 1 FROM g2 WHERE g2.subject = g1.subject
         |    AND g2.predicate = g1.predicate AND g2.obj = g1.obj))
         |SELECT cur.*,
         |  (SELECT count(DISTINCT subject) FROM cur) AS n_subjects,
         |  (SELECT count(*) FROM dep) AS n_deprecated
         |FROM cur""".stripMargin
    head + Graph.nestedTreeSql(SliceSql) + "\n  )),\n" +
      flat("f1", "'api_' || o_orderstatus", "TRUE") + ",\n" +
      flat("f2",
        "(CASE WHEN o_custkey % 3 = 0 THEN 'api2_' ELSE 'api_' END) || o_orderstatus",
        "o_orderkey % 5 <> 0") + ",\n" +
      tail
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_openml_lifecycle" -> openmlLifecycle _)

  val oracles: Map[String, String] = Map(
    "q_openml_lifecycle" -> openmlLifecycleSql)
}
