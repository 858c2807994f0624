package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.Sampling

class WeightedReservoirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("n_chars"))

  private def batchTopIds(n: Int): Set[Long] =
    Sampling.weightedSampleOf(docs, "res", n)
      .select("doc_id").as[Long].collect().toSet

  test("one-shot ingest equals the batch sampler") {
    val path = Files.createTempDirectory("wres_once").toString
    val r = new WeightedReservoir(spark, path, "res", 40)
    r.ingest(docs)
    assert(r.size == 40)
    assert(r.sample.select("doc_id").as[Long].collect().toSet == batchTopIds(40))
  }

  test("any batching, any order: reservoir equals the one-shot sample") {
    val expected = batchTopIds(40)
    Seq(Seq(0, 1, 2), Seq(2, 0, 1)).foreach { order =>
      val path = Files.createTempDirectory(s"wres_${order.mkString}").toString
      val r = new WeightedReservoir(spark, path, "res", 40)
      order.foreach(i => r.ingest(docs.filter($"doc_id" % 3 === i)))
      assert(r.size == 40)
      assert(r.sample.select("doc_id").as[Long].collect().toSet == expected,
        s"order $order diverged from the one-shot sample")
    }
  }

  test("state stays bounded and re-arrivals count once, at max weight") {
    val path = Files.createTempDirectory("wres_bound").toString
    val r = new WeightedReservoir(spark, path, "res", 25)
    (1 to 5).foreach(_ => r.ingest(docs)) // replays: same corpus 5x
    assert(r.size == 25)
    assert(r.sample.select("doc_id").as[Long].collect().distinct.length == 25)
    // a doc re-arriving longer takes its max weight (one row, new weight)
    val tweaked = docs.limit(1)
      .select($"doc_id", ($"n_chars" + 1000000L).as("n_chars"))
    val tweakedId = tweaked.select("doc_id").as[Long].head()
    r.ingest(tweaked)
    val got = r.sample.filter($"doc_id" === tweakedId)
      .select("n_chars").as[Long].collect()
    assert(got.length <= 1)
    // heavier weight -> higher race key, so the tweaked doc must now rank
    assert(got.nonEmpty, "max-weight re-arrival should enter the reservoir")
  }

  test("ranked view recomputes keys identically to the batch sampler") {
    val path = Files.createTempDirectory("wres_rank").toString
    val r = new WeightedReservoir(spark, path, "res", 40)
    r.ingest(docs)
    val a = r.ranked.select("rank", "doc_id").as[(Long, Long)].collect().sorted
    val b = Sampling.weightedSampleOf(docs, "res", 40)
      .select("rank", "doc_id").as[(Long, Long)].collect().sorted
    assert(a.sameElements(b))
  }

  test("file-source stream intake folds each micro-batch into the reservoir") {
    val dir = Files.createTempDirectory("wres_stream")
    val resPath = Files.createTempDirectory("wres_state").toString
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream.schema(StreamingCorpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = WeightedReservoir.intake(
      stream.select(col("doc_id"), col("n_chars")), resPath, "res", 40).start()
    q.processAllAvailable()
    q.stop()
    val r = new WeightedReservoir(spark, resPath, "res", 40)
    assert(r.size == 40)
    assert(r.sample.select("doc_id").as[Long].collect().toSet == batchTopIds(40))
  }
}
