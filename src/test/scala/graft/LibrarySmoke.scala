package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library surface (store + streaming +
  * transform) through public exports, against the real testdata.
  * Run: sbt "Test/runMain graft.LibrarySmoke"
  */
object LibrarySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.transform.TripleBuilder

    // triple-generate from real customer table → merge into a fresh store
    val tri = queries.Graph.tripleGen(spark, TestSpark.sf0001)
      .withColumn("extractionMethod", lit("customer_parser"))
      .withColumn("confidence", lit(1.0))
      .withColumn("extractionTime", lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    val dir = Files.createTempDirectory("smoke_store").toString
    val store = new load.TripletStore(spark, dir)
    val s1 = store.merge(tri, Timestamp.valueOf("2024-01-01 00:00:00"))
    println(s"MERGE1 new=${s1.nNew} ext=${s1.nExtended} dep=${s1.nDeprecated}")
    println(s"SUBJECTS=${store.distinctSubjectCount}")

    // second merge with one mutated subject → deprecate + new
    val mutated = tri.withColumn("obj",
      when(col("subject") === "urn:cust:0" && col("predicate") === "schema:name",
        lit("Renamed#000")).otherwise(col("obj")))
      .withColumn("extractionTime", lit(Timestamp.valueOf("2024-02-01 00:00:00")))
    val s2 = store.merge(mutated, Timestamp.valueOf("2024-02-01 00:00:00"))
    println(s"MERGE2 new=${s2.nNew} ext=${s2.nExtended} dep=${s2.nDeprecated}")
    println("CURRENT_NAME=" + store.currentTriples
      .filter(col("subject") === "urn:cust:0" && col("predicate") === "schema:name")
      .select("obj").head().getString(0))

    // streaming vs batch on real events
    val sdir = Files.createTempDirectory("smoke_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      sdir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val hourly = streaming.EventStreams.runOnce(spark, sdir.toString, "smoke_hourly")
    println(s"STREAM_WINDOWS=${hourly.count()}")

    // doc pivot + name resolution over generated triples
    println(s"PIVOT_ROWS=${TripleBuilder.docPivot(tri).count()}")
    spark.stop()
  }
}
