package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization probe: how many parquet files does one index ingest
  * commit, and what does the batch-dir layout of each instrument store
  * look like at sf0.1? Guide §6 (file sizing) — a 32-file commit of a
  * few-KB batch pays listing + open cost on every downstream read. */
object StoreFilesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("probe_files").toFile
    val idx = new graft.similarity.DedupIndex(spark, tmp.getAbsolutePath)
    idx.ingest(docs.filter(col("doc_id") < 250))
    idx.ingest(docs.filter(col("doc_id") >= 250))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
      else Seq(f)
    walk(tmp).groupBy(_.getParentFile.getName).toSeq.sortBy(_._1).foreach {
      case (d, fs) =>
        val pq = fs.filter(_.getName.endsWith(".parquet"))
        println(f"[files] $d%-8s total=${fs.size}%3d parquet=${pq.size}%3d " +
          f"bytes=${fs.map(_.length).sum}%8d")
    }
    graft.load.Scratch.rm(tmp)
    spark.stop()
  }
}
