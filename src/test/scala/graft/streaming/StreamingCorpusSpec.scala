package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Streaming corpus cleaning == batch corpus cleaning over the same files
  * (the §2.12 twin-proof pattern applied to the training-data pipeline). */
class StreamingCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed quality+dedup counts equal the batch formulation") {
    val dir = Files.createTempDirectory("corpus_stream")
    // the same file twice: every document arrives as a duplicate
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = StreamingCorpus.langCounts(
        StreamingCorpus.readDocuments(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory")
      .queryName("corpus_counts").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("corpus_counts")
      .as[(String, Long)].collect().toMap
    val batch = StreamingCorpus.langCounts(
        Tables(spark, TestSpark.sf0001, "documents"))
      .as[(String, Long)].collect().toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch.values.sum > 0)
  }

  test("streaming intake ingests each micro-batch into the dedup index") {
    val dir = Files.createTempDirectory("intake_stream")
    val idxPath = Files.createTempDirectory("intake_idx").toString
    // two identical files, forced into separate micro-batches: the second
    // batch must be fully deduped against the index built by the first
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream.schema(StreamingCorpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = StreamingCorpus.dedupIntake(stream, idxPath).start()
    q.processAllAvailable()
    q.stop()

    val idx = new graft.similarity.DedupIndex(spark, idxPath)
    // every survivor comes from the corpus once: size == one-shot ingest size
    val oneShotPath = Files.createTempDirectory("intake_once").toString
    val once = new graft.similarity.DedupIndex(spark, oneShotPath)
    once.ingest(Tables(spark, TestSpark.sf0001, "documents")
      .selectExpr("doc_id", "text"))
    assert(idx.size == once.size, s"stream=${idx.size} once=${once.size}")
  }
}
