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

  test("streaming semantic intake drops replayed vectors batch-over-batch") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("sem_stream")
    val idxPath = Files.createTempDirectory("sem_stream_idx").toString
    // the same embeddings file twice in separate micro-batches: batch 2 is
    // an exact replay and must add NOTHING to the standing index
    Files.copy(Paths.get(s"${TestSpark.sf0001}/embeddings.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"${TestSpark.sf0001}/embeddings.parquet"),
      dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = StreamingCorpus.semanticIntake(stream, idxPath, threshold = 0.2)
      .start()
    q.processAllAvailable()
    q.stop()

    val idx = new graft.similarity.SemanticDedupIndex(spark, idxPath,
      threshold = 0.2)
    val oncePath = Files.createTempDirectory("sem_stream_once").toString
    val once = new graft.similarity.SemanticDedupIndex(spark, oncePath,
      threshold = 0.2)
    once.ingest(Tables(spark, TestSpark.sf0001, "embeddings")
      .selectExpr("vec_id", "embedding"))
    assert(idx.size == once.size, s"stream=${idx.size} once=${once.size}")
    assert(idx.size > 0)
  }
}
