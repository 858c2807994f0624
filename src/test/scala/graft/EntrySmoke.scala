package graft

import org.apache.spark.sql.SparkSession

/** Manual smoke driver for SparkEntry.entry — mirrors the harness's rows>0
  * check. Run: sbt "Test/runMain graft.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(10, truncate = false)
    spark.stop()
    assert(n > 0, "entry() must return rows")
  }
}
