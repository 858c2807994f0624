package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Merge-induction throughput probe: sequential one-merge-per-round BPE
  * (expressed as the batched learner with batchN=1 — BpeSpec proves the
  * two identical) vs batched top-N non-interacting selection, on the
  * sf0.01 documents corpus replicated 10×. The learner state is the
  * bounded top-200 word table either way; what the batch buys is ROUNDS:
  * each round is a full Spark job cycle (count pairs → collect → apply →
  * checkpoint), so merges/sec scales with merges-per-round. Numbers go
  * to SCALE.md.
  *
  * Run: sbt "Test/runMain graft.BpeBatchProbe"
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until 10).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
      .reduce(_ union _).localCheckpoint()
    println(s"[bpeprobe] corpus rows=${corpus.count()}")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // warm the JIT/session on a throwaway run
    queries.Bpe.bpeBatchMergesOf(spark, corpus, rounds = 2, batchN = 1).count()

    val (seqRows, seqDt) = time(
      queries.Bpe.bpeBatchMergesOf(spark, corpus, rounds = 24, batchN = 1)
        .count())
    println(f"[bpeprobe] sequential  merges=$seqRows%3d rounds=24 dt=$seqDt%6.2fs rate=${seqRows / seqDt}%5.2f merges/s")

    Seq((6, 4), (3, 8), (2, 16)).foreach { case (rounds, n) =>
      val (rows, dt) = time(
        queries.Bpe.bpeBatchMergesOf(spark, corpus, rounds = rounds,
          batchN = n, topM = 50).count())
      println(f"[bpeprobe] batch n=$n%-3d merges=$rows%3d rounds=$rounds dt=$dt%6.2fs rate=${rows / dt}%5.2f merges/s")
    }
    spark.stop()
  }
}
