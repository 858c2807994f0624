package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.load.Scratch
import graft.sinks.Sinks

/** Oracle-graded K1/K2 sink roundtrips: each query pushes a fixture with
  * hostile values (separators, quotes, embedded control characters, nulls)
  * through the REAL file sink into a scratch directory, reads it back with
  * the matching reader, and returns the content — the DuckDB oracle is the
  * identity restatement of the fixture, so any quoting/escaping/null-
  * marshalling drift in the writer OR reader hash-mismatches
  * (`HFExtractor.py:321-331`).
  *
  * Scratch discipline matches q_incremental_dedup: process-unique dir,
  * removed even on failure, result eagerly checkpointed off the scratch
  * files before cleanup.
  */
object IoQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** K1 TSV dump → CSV-reader roundtrip. The tricky column embeds the
    * separator (tab), the quote char, and a comma, forcing the writer's
    * quoting path; nulls (every 5th source) must survive as nulls, not
    * empty strings. Embedded NEWLINES are deliberately excluded: parsing
    * them back needs multiLine=true, which makes CSV files unsplittable —
    * at scale the TSV contract is one record per line (the reference dumps
    * whole model records the same way). */
  def tsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("lang")).as("lang_opt"),
      col("n_chars"),
      concat(lit("v\t\"q\","), col("lang"), lit(","), col("source")).as("tricky"))
    Scratch.withScratch("graft_tsv_q", dir) { tmp =>
      Sinks.writeTsv(src, tmp.getAbsolutePath)
      s.read.option("sep", "\t").option("header", "true")
        .schema(src.schema).csv(tmp.getAbsolutePath)
        .localCheckpoint()
    }
  }

  val tsvRoundtripSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang_opt,
       |  n_chars,
       |  'v\t"q",' || lang || ',' || source AS tricky
       |FROM documents""".stripMargin

  /** K2 JSON-records dump → JSON-reader roundtrip: embedded newline/tab/
    * quote in a string field (JSON escapes in-band, so unlike TSV the
    * files stay line-splittable), a null field (writer drops it, reader
    * restores null from schema), an array, and a nested struct (flattened
    * after read-back for the comparison). The array rides through the
    * sink/reader intact but the COMPARED column is `array_join`ed to a
    * scalar — the driver's pandas comparator sorts rows by every column
    * and cannot order raw array cells. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("source")).as("src_opt"),
      concat(lit("line1\nline2\t\""), col("lang")).as("tricky"),
      array(col("lang"), concat(lit("s_"), col("source"))).as("tags"),
      struct(col("lang").as("l"), col("n_chars").as("n")).as("meta"))
    Scratch.withScratch("graft_json_q", dir) { tmp =>
      Sinks.writeJsonRecords(src, tmp.getAbsolutePath)
      s.read.schema(src.schema).json(tmp.getAbsolutePath)
        .select(col("doc_id"), col("src_opt"), col("tricky"),
          array_join(col("tags"), "\u0001").as("tags_joined"),
          col("meta.l").as("meta_l"), col("meta.n").as("meta_n"))
        .localCheckpoint()
    }
  }

  val jsonRoundtripSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS src_opt,
       |  'line1\nline2\t"' || lang AS tricky,
       |  array_to_string([lang, 's_' || source], chr(1)) AS tags_joined,
       |  lang AS meta_l, n_chars AS meta_n
       |FROM documents""".stripMargin

  /** K5 bulk-load staging roundtrip: a triple fixture with hostile
    * literals (newline, quote, backslash, tab) staged through the REAL
    * [[Sinks.writeBulkLoadDir]] (chunked `.nt` + `.graph` sidecars +
    * manifest, `RDFHandler.py:60-111`) and read back through the K3
    * N-Triples reader over the staged chunks only — any drift in the
    * chunking, the rename, or the N3 escape/unescape pair
    * hash-mismatches against the identity oracle. */
  def ntStageRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(
      concat(lit("http://m/"), col("doc_id")).as("subject"),
      lit("http://p/title").as("predicate"),
      concat(lit("t\n\"q\"\t\\x "), col("lang")).as("obj"),
      lit("literal").as("objKind"), lit("").as("datatype"))
    val iris = t(s, dir, "documents").select(
      concat(lit("http://m/"), col("doc_id")).as("subject"),
      lit("http://p/source").as("predicate"),
      concat(lit("http://src/"), col("source")).as("obj"),
      lit("iri").as("objKind"), lit("").as("datatype"))
    val typed = t(s, dir, "documents").select(
      concat(lit("http://m/"), col("doc_id")).as("subject"),
      lit("http://p/chars").as("predicate"),
      col("n_chars").cast("string").as("obj"),
      lit("literal").as("objKind"),
      lit("http://www.w3.org/2001/XMLSchema#integer").as("datatype"))
    Scratch.withScratch("graft_nt_q", dir) { tmp =>
      Sinks.writeBulkLoadDir(src.unionByName(iris).unionByName(typed),
        tmp.getAbsolutePath, "https://example.org/g", maxTriplesPerFile = 4096L)
      Sinks.readNTriples(s, tmp.getAbsolutePath + "/*.nt")
        .withColumnRenamed("objKind", "obj_kind")
        .localCheckpoint()
    }
  }

  val ntStageRoundtripSql: String =
    s"""SELECT 'http://m/' || doc_id AS subject, p.predicate,
       |  CASE p.predicate
       |    WHEN 'http://p/title' THEN 't\n"q"\t\\x ' || lang
       |    WHEN 'http://p/source' THEN 'http://src/' || source
       |    ELSE CAST(n_chars AS VARCHAR) END AS obj,
       |  CASE p.predicate WHEN 'http://p/source' THEN 'iri'
       |    ELSE 'literal' END AS obj_kind,
       |  CASE p.predicate
       |    WHEN 'http://p/chars' THEN 'http://www.w3.org/2001/XMLSchema#integer'
       |    ELSE '' END AS datatype
       |FROM documents, (VALUES ('http://p/title'), ('http://p/source'),
       |  ('http://p/chars')) AS p(predicate)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tsv_roundtrip" -> tsvRoundtrip _,
    "q_json_roundtrip" -> jsonRoundtrip _,
    "q_nt_stage_roundtrip" -> ntStageRoundtrip _)

  val oracles: Map[String, String] = Map(
    "q_tsv_roundtrip" -> tsvRoundtripSql,
    "q_json_roundtrip" -> jsonRoundtripSql,
    "q_nt_stage_roundtrip" -> ntStageRoundtripSql)
}
