package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE SparkEntry query and dump its result + oracle SQL,
  * so a new/changed query can be checked against DuckDB without replaying
  * the whole Verify sweep. Usage: OneQuery <name> <sfDir> <outDir>. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
    }
    spark.stop()
  }
}
