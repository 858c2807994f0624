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

  test("streamed count-min sketch cells equal the batch sketch") {
    val dir = Files.createTempDirectory("cms_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingCorpus.cmsCells(
        StreamingCorpus.readDocuments(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_cells").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cms_cells")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.queries.Sketches
      .cmsSketch(spark, TestSpark.sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
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

  test("streaming Bloom decontamination equals the exact batch verdicts") {
    import org.apache.spark.sql.functions._
    // sf0.01: the corpus with planted cross-split near-duplicates (sf0.001
    // happens to have zero 5-gram collisions, which would make this vacuous)
    val sf = "/root/testdata/sf0.01"
    val bloom = graft.queries.Corpus.benchNgramBloom(spark, sf)

    val dir = Files.createTempDirectory("decon_stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingCorpus.decontaminateStream(
        StreamingCorpus.readDocuments(spark, dir.toString), bloom)
      .writeStream.outputMode("append").format("memory")
      .queryName("decon_stream").start()
    q.processAllAvailable()
    // stateless stage: progress must exist AND show no stateful operators
    // (a null/empty progress list would make this check vacuous)
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(_.stateOperators.isEmpty))
    q.stop()

    val exact = graft.queries.Corpus.decontaminate(spark, sf) // train only
    val streamed = spark.table("decon_stream")
    // over-drop is allowed in principle (Bloom false positives), a pass-
    // through never is; at these sizes (about 2k benchmark n-grams in a
    // 1M-item filter) the verdicts agree EXACTLY, and deterministically
    // so. Null-safe comparisons: a NULL verdict must COUNT as a
    // disagreement, not vanish from the filter.
    val diff = exact.join(streamed, "doc_id")
      .filter(!(exact("kept") <=> streamed("kept")) ||
        !(exact("n_contaminated_ngrams") <=> streamed("n_contaminated_ngrams")))
    assert(diff.count() == 0)
    assert(exact.filter(!col("kept")).count() > 0) // the stage really fires
  }
}
