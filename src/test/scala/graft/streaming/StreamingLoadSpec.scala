package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.load.TripletStore

/** Incremental streaming load: two extraction versions arriving as
  * separate micro-batches must produce the same store state as two batch
  * merges — create, then deprecate-and-replace. */
class StreamingLoadSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchDf(name: String, time: String): DataFrame =
    Seq(("m1", "schema.org:name", name),
      ("m1", "fair4ml:mlTask", "nlp"))
      .toDF("subject", "predicate", "obj")
      .withColumn("objKind", lit("literal"))
      .withColumn("datatype", lit(""))
      .withColumn("extractionMethod", lit("parser"))
      .withColumn("confidence", lit(1.0))
      .withColumn("extractionTime", lit(Timestamp.valueOf(time)))

  test("micro-batched merges reproduce batch SCD-2 semantics") {
    val inDir = Files.createTempDirectory("stream_in").toString
    val ckDir = Files.createTempDirectory("stream_ck").toString
    val storeDir = Files.createTempDirectory("stream_store").toString
    // autoCompactEvery=2: the third micro-batch's merge pushes the level
    // count to 3 > 2 and fires a real base write inside the stream — the
    // stream also proves merge-after-compact continuity
    val store = new TripletStore(spark, storeDir, autoCompactEvery = 2)

    // batch files land one at a time (maxFilesPerTrigger=1)
    batchDf("alpha", "2024-01-01 00:00:00").coalesce(1)
      .write.mode("append").parquet(inDir)
    batchDf("alpha-v2", "2024-02-01 00:00:00").coalesce(1)
      .write.mode("append").parquet(inDir)
    batchDf("alpha-v3", "2024-03-01 00:00:00").coalesce(1)
      .write.mode("append").parquet(inDir)

    val q = StreamingLoad.start(
      StreamingLoad.readTripleStream(spark, inDir), store, ckDir)
    q.processAllAvailable()
    q.stop()

    assert(store.currentVersion >= 2) // three merges happened
    // the periodic compaction ran: a base exists under the store
    assert(new java.io.File(storeDir).listFiles()
      .exists(_.getName.startsWith("base=")))
    val cur = store.currentTriples
    val names = cur.filter($"predicate" === "schema.org:name")
      .select("obj").as[String].collect().toSet
    assert(names == Set("alpha-v3"))
    val dep = store.ranges.filter($"deprecated")
    assert(dep.select("obj").as[String].collect().toSet ==
      Set("alpha", "alpha-v2"))
    // task fact extended across all batches, never deprecated
    val task = store.ranges.filter($"predicate" === "fair4ml:mlTask")
    assert(task.count() == 1)
    assert(task.select("useEnd").head().getTimestamp(0) ==
      Timestamp.valueOf("2024-03-01 00:00:00"))
  }
}
