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

    // Recount vs delta-maintained pair counts (r8 VERDICT #7): same
    // learner, same merges — the only difference is whether each round
    // re-explodes the whole vocabulary or adjusts only affected words'
    // pairs. The graded corpus has 31 distinct words (vocab-scale cost
    // is invisible there), so this arm runs a PRODUCTION-SIZED synthetic
    // vocabulary: 50k distinct 10-char words, one merge affecting a few
    // percent of them — the shape where recount is the bottleneck.
    val bigVocab = spark.range(50000)
      .select(substring(md5(col("id").cast("string")), 1, 10).as("text"))
      .localCheckpoint()
    queries.Bpe.bpeBatchMergesOf(spark, bigVocab, rounds = 1, batchN = 1,
      vocabSize = 50000).count() // warm
    val (fullRows, fullDt) = time(
      queries.Bpe.bpeBatchMergesOf(spark, bigVocab, rounds = 12, batchN = 4,
        incremental = false, vocabSize = 50000).collect())
    println(f"[bpeprobe] recount 50k-vocab merges=${fullRows.length}%3d rounds=12 dt=$fullDt%6.2fs")
    val (incrRows, incrDt) = time(
      queries.Bpe.bpeBatchMergesOf(spark, bigVocab, rounds = 12, batchN = 4,
        incremental = true, vocabSize = 50000).collect())
    println(f"[bpeprobe] delta   50k-vocab merges=${incrRows.length}%3d rounds=12 dt=$incrDt%6.2fs speedup=${fullDt / incrDt}%4.2fx")
    require(fullRows.map(_.toString).toSeq == incrRows.map(_.toString).toSeq,
      "recount and delta modes must learn IDENTICAL merges")

    // the trend point: 4x the vocabulary again — recount scales with the
    // vocab, delta with the affected slice
    val hugeVocab = spark.range(200000)
      .select(substring(md5(col("id").cast("string")), 1, 10).as("text"))
      .localCheckpoint()
    val (f2, fDt2) = time(
      queries.Bpe.bpeBatchMergesOf(spark, hugeVocab, rounds = 12, batchN = 4,
        incremental = false, vocabSize = 200000).collect())
    val (i2, iDt2) = time(
      queries.Bpe.bpeBatchMergesOf(spark, hugeVocab, rounds = 12, batchN = 4,
        incremental = true, vocabSize = 200000).collect())
    println(f"[bpeprobe] recount 200k-vocab merges=${f2.length}%3d rounds=12 dt=$fDt2%6.2fs")
    println(f"[bpeprobe] delta   200k-vocab merges=${i2.length}%3d rounds=12 dt=$iDt2%6.2fs speedup=${fDt2 / iDt2}%4.2fx")
    require(f2.map(_.toString).toSeq == i2.map(_.toString).toSeq)
    spark.stop()
  }
}
