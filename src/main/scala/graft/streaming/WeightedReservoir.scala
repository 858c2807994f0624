package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming weighted sampling without replacement — the bounded-state
  * twin of `Sampling.weightedSampleOf`: a persisted n-row reservoir that
  * each arriving micro-batch folds into via the EXACT top-n merge law of
  * the Efraimidis–Spirakis race, top-n(A ∪ B) = top-n(top-n(A) ∪ B).
  * Because the race key ln(u)/w is a pure function of (doc_id, n_chars)
  * — salted-hash uniform, no RNG state — the law is exact, so the
  * reservoir after ANY partition of the corpus into batches, in ANY
  * batch order, equals the one-shot batch sample (WeightedReservoirSpec
  * proves both). That is the whole point: state is n rows FOREVER at any
  * stream rate, and the stream cannot drift from the batch semantics.
  *
  * A doc re-arriving with a different n_chars counts once, at its
  * maximum weight (groupBy max — deterministic, order-independent),
  * never twice.
  *
  * Storage: versioned single-dir state (`v=N`), committed via the shared
  * rename protocol ([[graft.load.AtomicDirCommit]]) — readers always see
  * a complete sample, concurrent writers fail loudly, older versions are
  * swept after commit (a crash between commit and sweep leaves extra
  * versions; readers take the max id).
  */
class WeightedReservoir(spark: SparkSession, path: String,
                        salt: String, n: Int) {

  private val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_chars", LongType)))

  private val fs = new java.io.File(path)

  private def versions: Seq[Int] = graft.load.CommittedDirs.list(fs, "v=")

  /** The standing reservoir (doc_id, n_chars) — ≤ n rows; empty-schema
    * DataFrame for a fresh store. */
  def sample: DataFrame = versions.lastOption match {
    case Some(v) => spark.read.parquet(s"$path/v=$v")
    case None => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The reservoir with race keys and ranks — the same output surface as
    * the batch sampler (recomputed from the persisted identity columns;
    * the key is a pure function, so nothing can go stale). */
  def ranked: DataFrame =
    graft.queries.Sampling.weightedSampleOf(sample, salt, n)

  def size: Long = sample.count()

  /** Fold one batch of (doc_id, n_chars, ...) into the reservoir. */
  def ingest(docs: DataFrame): Unit = {
    val candidates = sample.unionByName(
        docs.select(col("doc_id"), col("n_chars")))
      .groupBy("doc_id").agg(max(col("n_chars")).as("n_chars"))
    val next = graft.queries.Sampling.weightedSampleOf(candidates, salt, n)
      .select(col("doc_id"), col("n_chars"))
      .localCheckpoint()
    val v = versions.lastOption.getOrElse(-1) + 1
    val tmp = graft.load.AtomicDirCommit.tmpFor(fs, s"v$v")
    next.write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
    graft.load.AtomicDirCommit.commit(tmp, new java.io.File(fs, s"v=$v"))
    versions.filter(_ < v).foreach(old =>
      graft.load.Scratch.rm(new java.io.File(fs, s"v=$old")))
    graft.load.AtomicDirCommit.sweepTmp(fs,
      graft.load.TripletStore.TmpSweepAgeMs)
  }
}

object WeightedReservoir {

  /** foreachBatch intake: every arriving micro-batch folds into the
    * persisted reservoir — the [[StreamingCorpus.dedupIntake]] pattern
    * for the sampling stage. */
  def intake(docs: DataFrame, path: String, salt: String, n: Int)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        new WeightedReservoir(batch.sparkSession, path, salt, n)
          .ingest(batch.toDF())
        ()
    }
}
