package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table access for the driver-provided TPC-H-ish test tables
  * (see TESTDATA.md) plus shared column helpers used across queries.
  *
  * Scale notes: every reader is a plain parquet scan so Catalyst keeps
  * filter pushdown / column pruning; no caching here — callers decide.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects; read it
    // as raw nanos and truncate to Spark's native microsecond precision.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Exact money arithmetic: cast to DECIMAL(18,2) before aggregation so
    * Spark and any ANSI-SQL oracle produce bit-identical sums regardless
    * of partition-level summation order (double sums are order-dependent;
    * decimal sums are exact).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Epoch milliseconds as BIGINT — the only timestamp representation that
    * round-trips identically between Spark (micros precision) and
    * nanosecond-precision parquet readers: both truncate toward zero.
    */
  def epochMs(colName: String): Column =
    expr(s"unix_micros($colName) div 1000")
}
