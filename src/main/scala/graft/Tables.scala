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
    // events.ts has shipped as TIMESTAMP(NANOS) (Spark 4 only reads that
    // as raw nanos longs) and as TIMESTAMP(MICROS) NTZ, depending on the
    // generator vintage. Normalize whatever arrives to a session-TZ
    // TIMESTAMP so every downstream epochMs/window/as-of sees one type;
    // sessions pin UTC, which makes the values bit-identical to an
    // ANSI-SQL oracle's epoch_ms over the same file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", normalizeTs(df.schema("ts").dataType))
    else df
  }

  /** Map any physical encoding of the event timestamp to TIMESTAMP:
    * legacy nanos-as-long → truncate to micros; micros NTZ → reinterpret
    * in the (UTC-pinned) session zone; already-TIMESTAMP passes through. */
  private def normalizeTs(dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
      case _ => col("ts")
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
