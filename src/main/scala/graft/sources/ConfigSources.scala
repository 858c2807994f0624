package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config/fixture sources (S10 + the fixture-backed API sources,
  * SURVEY §2.1): TSV vocabularies, JSON config, and the raw-snapshot
  * reader. Live-API connectors (S2-S5, S7, S9) sit behind the same
  * DataFrame contract — a production deployment implements them as
  * driver-side list + `mapPartitions` fetch; offline builds read fixtures.
  */
object ConfigSources {

  /** `tags_*.tsv`-style vocabulary file: tab-separated, with header. */
  def readTsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", header.toString)
      .option("inferSchema", "false")
      .csv(path)

  /** Single-column vocabulary → driver-side Seq for broadcast literal use
    * (vocabularies are config-sized: tens to hundreds of rows). */
  def vocab(spark: SparkSession, path: String, column: String = "tag_name"): Seq[String] = {
    val df = readTsv(spark, path)
    val c = if (df.columns.contains(column)) column else df.columns.head
    df.select(col(c)).na.drop().distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** JSON config / record file (OpenML metadata_schema.json shape). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** Raw HF snapshot fixture (FIXTURES.md §1 schema) — parquet scan with
    * pushdown intact. */
  def snapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Dotted-path projection (S7/S9 schema-driven attribute mapping,
    * `OpenMLExtractor.py:420-546`): "a.b.c" over nested struct columns. */
  def dottedPaths(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (acc, (outName, path)) =>
      acc.withColumn(outName, col(path))
    }
}
