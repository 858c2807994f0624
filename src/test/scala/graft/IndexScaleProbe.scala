package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-index scaling probe: ingest a corpus in equal batches and
  * print the wall time of EACH batch as the standing index grows. The
  * claim under test is the 100 TB one — per-batch cost tracks the BATCH,
  * not the index, because acceptance is equi-joins against signatures
  * and never a rescan of accepted data. Run:
  *
  *   sbt "Test/runMain graft.IndexScaleProbe"
  *
  * Measured numbers are recorded in SCALE.md.
  */
object IndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // text index: sf0.1 documents in 10 doc_id-range batches
    locally {
      val docs = Tables(spark, dir, "documents").select("doc_id", "text")
        .localCheckpoint()
      val n = docs.count()
      val step = n / 10 + 1
      val idx = new similarity.DedupIndex(spark,
        load.Scratch.dir("probe_dedup", dir).getAbsolutePath)
      println(s"[dedup] $n docs in 10 batches of ~$step")
      (0 until 10).foreach { b =>
        val batch = docs.filter(col("doc_id") >= b * step &&
          col("doc_id") < (b + 1) * step)
        val dt = timed(idx.ingest(batch))
        println(f"[dedup] batch=$b dt=$dt%6.2fs indexSize=${idx.size}")
      }
    }

    // semantic index: 20k synthetic 64-dim vectors in 10 batches (the
    // parquet embeddings table is only 500 rows — too small to show a
    // growth trend). Components are hash-uniform in (-1, 1), so
    // directions are uniform on the sphere: near-dups are rare, the
    // index grows by ~a full batch each time, and candidates-per-probe
    // grows as |index| x nBands / 2^bitsPerBand (the OR-amplified LSH
    // contract) until the per-probe cap bounds it.
    locally {
      val vecs = spark.range(20000).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> " +
          "cast(xxhash64(concat(cast(id AS STRING), '|', cast(d AS STRING))) % 1000 AS DOUBLE) / 1000.0)")
          .as("embedding"))
        .localCheckpoint()
      val idx = new similarity.SemanticDedupIndex(spark,
        load.Scratch.dir("probe_sem", dir).getAbsolutePath, threshold = 0.95)
      println(s"[semantic] 20000 vectors in 10 batches of 2000")
      (0 until 10).foreach { b =>
        val batch = vecs.filter(col("vec_id") >= b * 2000 &&
          col("vec_id") < (b + 1) * 2000)
        val dt = timed(idx.ingest(batch))
        println(f"[semantic] batch=$b dt=$dt%6.2fs indexSize=${idx.size} " +
          s"candidates=${idx.lastCandidates} truncated=${idx.lastTruncated}")
      }
    }
    spark.stop()
  }
}
