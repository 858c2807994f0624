package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.load.{Scratch, TripletStore}

/** Oracle-graded replay of the versioned-store MERGE lifecycle (V3-V6,
  * `GraphHandler.py:78-148,348-419`): two deterministic extraction batches
  * built from the documents table load into a scratch [[TripletStore]], and
  * the full Version_Range state after the second merge is the query result.
  * Every lifecycle arm is exercised and hash-compared against a pure-SQL
  * restatement of the MERGE semantics:
  *
  *  - extend (V3/V5): triples present in both batches get
  *    `useEnd = max(old useEnd, new extractionTime)`,
  *  - deprecate-changed (V4): open triples whose subject is in batch 2 but
  *    whose value changed get `deprecated = true, useEnd = now`,
  *  - untouched: subjects absent from batch 2 keep their batch-1 range,
  *  - fresh (V1/V2): new (subject, value) pairs open a new range.
  *
  * Batch design over doc_id (sf-independent): batch 1 covers ids < 300;
  * batch 2 covers [100, 400) and uppercases the language of ids % 3 == 0 —
  * so [0,100) is untouched, [100,300) splits into extended (`hasSource`,
  * unchanged `hasLang`) and deprecated+fresh (changed `hasLang`), and
  * [300,400) is all fresh. Extraction times vary per row (doc_id mod
  * offsets) so the `greatest` in the extend arm is load-bearing.
  */
object Versioned {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // Logical load times (epoch seconds, UTC): batch-1 extraction base,
  // batch-2 extraction base, batch-2 merge "now" (deprecation stamp).
  private val T1 = 1704067200L // 2024-01-01T00:00:00Z
  private val T2 = 1706745600L // 2024-02-01T00:00:00Z
  private val T3 = 1709251200L // 2024-03-01T00:00:00Z

  /** One extraction batch in TripletStore.merge's input schema: two triples
    * per document (hasLang with a caller-chosen object, hasSource). */
  private def batch(docs: DataFrame, langObj: Column, etSec: Column): DataFrame = {
    val base = docs.select(
      concat(lit("doc:"), col("doc_id")).as("subject"),
      langObj.as("langObj"), col("source"), etSec.as("etSec"))
    base.select(col("subject"), lit("hasLang").as("predicate"),
        col("langObj").as("obj"), col("etSec"))
      .unionByName(base.select(col("subject"), lit("hasSource").as("predicate"),
        col("source").as("obj"), col("etSec")))
      .withColumn("objKind", lit("literal"))
      .withColumn("datatype", lit("xsd:string"))
      .withColumn("extractionMethod", lit("parser"))
      .withColumn("confidence", lit(0.9))
      .withColumn("extractionTime", timestamp_seconds(col("etSec")))
      .drop("etSec")
  }

  def versionHistory(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val b1 = batch(docs.filter(col("doc_id") < 300), col("lang"),
      lit(T1) + col("doc_id") % 7 * 60)
    val b2 = batch(docs.filter(col("doc_id") >= 100 && col("doc_id") < 400),
      when(col("doc_id") % 3 === 0, upper(col("lang"))).otherwise(col("lang")),
      lit(T2) + col("doc_id") % 5 * 60)
    // Scratch store per invocation (same discipline as q_incremental_dedup):
    // concurrent Verify/Bench runs can never see each other's snapshots, and
    // the result is checkpointed off the scratch parquet before cleanup.
    Scratch.withScratch("graft_vh_q", dir) { tmp =>
      val store = new TripletStore(s, tmp.getAbsolutePath)
      store.merge(b1, new Timestamp(T1 * 1000))
      store.merge(b2, new Timestamp(T3 * 1000))
      store.ranges.select(col("subject"), col("predicate"), col("obj"),
          expr("unix_micros(useStart) div 1000").as("start_ms"),
          expr("unix_micros(useEnd) div 1000").as("end_ms"),
          col("deprecated"))
        .localCheckpoint()
    }
  }

  /** Pure-SQL restatement of the two-batch merge: identity equality on the
    * raw (subject, predicate, obj) fields replaces the store's md5 identity
    * hashes (equal up to md5 collisions; objKind/datatype/info constant). */
  val versionHistorySql: String =
    s"""WITH d AS (SELECT doc_id, lang, source FROM documents),
       |b1 AS (
       |  SELECT 'doc:' || doc_id AS subject, 'hasLang' AS predicate, lang AS obj,
       |         ${T1 * 1000} + (doc_id % 7) * 60000 AS et_ms
       |  FROM d WHERE doc_id < 300
       |  UNION ALL
       |  SELECT 'doc:' || doc_id, 'hasSource', source,
       |         ${T1 * 1000} + (doc_id % 7) * 60000
       |  FROM d WHERE doc_id < 300
       |),
       |b2 AS (
       |  SELECT 'doc:' || doc_id AS subject, 'hasLang' AS predicate,
       |         CASE WHEN doc_id % 3 = 0 THEN upper(lang) ELSE lang END AS obj,
       |         ${T2 * 1000} + (doc_id % 5) * 60000 AS et_ms
       |  FROM d WHERE doc_id >= 100 AND doc_id < 400
       |  UNION ALL
       |  SELECT 'doc:' || doc_id, 'hasSource', source,
       |         ${T2 * 1000} + (doc_id % 5) * 60000
       |  FROM d WHERE doc_id >= 100 AND doc_id < 400
       |),
       |touched AS (SELECT DISTINCT subject FROM b2)
       |SELECT b1.subject, b1.predicate, b1.obj, b1.et_ms AS start_ms,
       |       greatest(b1.et_ms, b2.et_ms) AS end_ms, false AS deprecated
       |FROM b1 JOIN b2 ON b1.subject = b2.subject
       |  AND b1.predicate = b2.predicate AND b1.obj = b2.obj
       |UNION ALL
       |SELECT b1.subject, b1.predicate, b1.obj, b1.et_ms,
       |       CASE WHEN b1.subject IN (SELECT subject FROM touched)
       |            THEN ${T3 * 1000} ELSE b1.et_ms END,
       |       b1.subject IN (SELECT subject FROM touched)
       |FROM b1
       |WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.subject = b1.subject
       |  AND b2.predicate = b1.predicate AND b2.obj = b1.obj)
       |UNION ALL
       |SELECT b2.subject, b2.predicate, b2.obj, b2.et_ms, b2.et_ms, false
       |FROM b2
       |WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.subject = b2.subject
       |  AND b1.predicate = b2.predicate AND b1.obj = b2.obj)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_version_history" -> versionHistory _)

  val oracles: Map[String, String] = Map(
    "q_version_history" -> versionHistorySql)
}
