package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization probe: stage-level timing of the q_incremental_dedup
  * instrument (signature computation vs acceptance vs commit), noop-sink
  * discipline (guide §1.4) for the transformation timings. */
object DedupIngestProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "documents").count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    (1 to 2).foreach { round =>
      time(s"r$round signaturesFor noop") {
        graft.similarity.DedupIndex.signaturesFor(docs)
          .write.format("noop").mode("overwrite").save()
      }
      val tmp = java.nio.file.Files.createTempDirectory("prof_dedup").toFile
      val idx = new graft.similarity.DedupIndex(spark, tmp.getAbsolutePath)
      time(s"r$round ingest b1")(idx.ingest(docs.filter(col("doc_id") < 250)))
      time(s"r$round ingest b2")(idx.ingest(docs.filter(col("doc_id") >= 250)))
      time(s"r$round read back") {
        idx.signatures.select("doc_id", "fp").localCheckpoint().count()
      }
      graft.load.Scratch.rm(tmp)
    }
    spark.stop()
  }
}
