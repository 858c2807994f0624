package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus intake (§2.12 × the training-data pipeline): documents
  * arrive as parquet files; the stream applies the batch corpus pipeline's
  * front half — quality floor, then exact dedup by content fingerprint —
  * and aggregates per-language counts. StreamingCorpusSpec proves the
  * stream equals the batch formulation over the same files, so the two
  * paths cannot drift.
  *
  * Scale: the fingerprint dedup keys state by md5(text) — at production
  * scale an ingestion-time column would bound it via
  * `dropDuplicatesWithinWatermark` exactly like StatefulSessions.dedupStream;
  * the synthetic corpus carries no event time, so the test path keeps
  * whole-stream state.
  */
object StreamingCorpus {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Quality floor + exact content dedup (the batch pipeline's first two
    * stages, streaming form). Works on both batch and streaming frames. */
  def clean(docs: DataFrame): DataFrame =
    docs.filter(col("n_chars") >= 150)
      .withColumn("fp", md5(col("text")))
      .dropDuplicates("fp")

  /** Per-language surviving-document counts (update/complete mode agg). */
  def langCounts(docs: DataFrame): DataFrame =
    clean(docs).groupBy("lang").agg(count(lit(1)).as("n_docs"))

  /** Streaming benchmark decontamination: every arriving doc is checked
    * against the broadcast Bloom filter of benchmark n-grams
    * ([[graft.queries.Corpus.benchNgramBloom]]) as a pure per-row
    * projection — no stream-static join, no shuffle, no state store, so
    * the stage adds zero streaming state at any corpus rate. Emits the
    * same (doc_id, n_contaminated_ngrams, kept) verdict as the batch
    * operator; StreamingCorpusSpec proves stream == batch over the same
    * files, with the Bloom side never passing a doc the exact batch
    * operator would drop (one-sided error). */
  def decontaminateStream(docs: DataFrame, filter: Array[Byte]): DataFrame =
    graft.queries.Corpus.decontaminateBloom(docs, filter)

  /** Streaming count–min sketch: the standing frequency summary
    * ([[graft.queries.Sketches]]) updated per micro-batch — the build is
    * one groupBy aggregation over tokens × a broadcast 4-row hash dim,
    * so it runs unchanged on a streaming frame (update/complete mode)
    * with state bounded at depth×width cells FOREVER, whatever the
    * stream rate. StreamingCorpusSpec proves streamed cells equal the
    * batch sketch over the same files (the cell-wise merge law CmsSpec
    * pins is exactly why micro-batch accumulation works). */
  def cmsCells(docs: DataFrame): DataFrame =
    graft.queries.Sketches.buildSketch(graft.queries.Sketches.tokensOf(docs))

  /** The production intake loop: every arriving micro-batch is ingested
    * into the persisted [[graft.similarity.DedupIndex]] — each batch
    * dedups against itself and everything that survived before it, and
    * the signature index is the only state (no reprocessing of old text).
    * Start with `maxFilesPerTrigger` on the reader to bound batch size. */
  def dedupIntake(docs: DataFrame,
                  indexPath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        new graft.similarity.DedupIndex(batch.sparkSession, indexPath)
          .ingest(batch.toDF())
        ()
      }

  /** MEDIA intake: arriving payload micro-batches dedup against the
    * standing [[graft.similarity.MediaDedupIndex]] (exact signature
    * equality + banded Hamming) — the streaming build path of the
    * multimodal dedup state; same loop shape as [[dedupIntake]]. */
  def mediaIntake(media: DataFrame, indexPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    media.select(col("id"), col("payload"), col("mediaType"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        import batch.sparkSession.implicits._
        new graft.similarity.MediaDedupIndex(batch.sparkSession, indexPath)
          .ingest(batch.as[graft.multimodal.BinaryPipeline.MediaRow])
        ()
      }

  /** ANN-index intake: arriving embedding micro-batches append to the
    * standing compressed [[graft.similarity.VectorIndex]] (frozen coarse
    * centroids + SQ8 codec from the first batch; each batch is one
    * assign+encode map stage plus a committed append) — the streaming
    * build path of the search state the probed-cell queries read. */
  def vectorIntake(emb: DataFrame, indexPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    emb.select(col("vec_id"), col("embedding"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        new graft.similarity.VectorIndex(batch.sparkSession, indexPath)
          .ingest(batch.toDF())
        ()
      }

  /** The semantic twin of [[dedupIntake]]: arriving embedding micro-batches
    * ingest into the persisted
    * [[graft.similarity.SemanticDedupIndex]] — near-duplicate vectors
    * (cosine over the configured threshold against anything already
    * accepted) drop batch-over-batch, with the standing vector table as
    * the only state. */
  def semanticIntake(emb: DataFrame, indexPath: String,
                     threshold: Double = 0.95,
                     sketch: graft.similarity.SemanticSketch =
                       graft.similarity.SemanticSketch())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    emb.select(col("vec_id"), col("embedding"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        new graft.similarity.SemanticDedupIndex(
          batch.sparkSession, indexPath, threshold, sketch)
          .ingest(batch.toDF())
        ()
      }
}
