package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Ai4lifeLifecycle, Analytics, Bpe, Corpus, EtlLifecycle, Extraction, Graph, IoQueries, MediaDedup, OpenmlLifecycle, Quantization, Relational, Sampling, Sessions, Sketches, Temporal, TextOps, VectorOps, Versioned}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * DataFrame program over the TESTDATA tables; `oracleSql` carries the
  * equivalent ANSI SQL the driver replays in DuckDB for the hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinStar(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Temporal.queries ++ TextOps.queries ++ VectorOps.queries ++ Graph.queries ++ Analytics.queries ++ Sessions.queries ++ Sampling.queries ++ Corpus.queries ++ Versioned.queries ++ Extraction.queries ++ IoQueries.queries ++ Quantization.queries ++ Sketches.queries ++ Bpe.queries ++ MediaDedup.queries ++ EtlLifecycle.queries ++ OpenmlLifecycle.queries ++ Ai4lifeLifecycle.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Temporal.oracles ++ TextOps.oracles ++ VectorOps.oracles ++ Graph.oracles ++ Analytics.oracles ++ Sessions.oracles ++ Sampling.oracles ++ Corpus.oracles ++ Versioned.oracles ++ Extraction.oracles ++ IoQueries.oracles ++ Quantization.oracles ++ Sketches.oracles ++ Bpe.oracles ++ MediaDedup.oracles ++ EtlLifecycle.oracles ++ OpenmlLifecycle.oracles ++ Ai4lifeLifecycle.oracles
}
