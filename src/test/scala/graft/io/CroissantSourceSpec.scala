package graft.io

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{CroissantSource, LiveSource}
import graft.sources.LiveSource.{HttpClient, RateLimited, RetryPolicy}

/** CroissantSource: per-dataset GETs with the reference's 429 semantics
  * (`HFDatasetManager.py:459-489` — retry on 429, honor Retry-After). */
class CroissantSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("endpoint shape matches the reference") {
    assert(CroissantSource.url("https://huggingface.co")("user/squad")
      == "https://huggingface.co/api/datasets/user/squad/croissant")
  }

  test("429 with Retry-After: honored (capped), then the payload lands") {
    // Every id 429s twice with a server hint before answering. Sleeps are
    // recorded, not slept — the test asserts the exact delays used.
    Sleeps.clear()
    val client = () => new HttpClient with Serializable {
      private val hits = scala.collection.mutable.Map.empty[String, Int]
      def get(url: String): String = {
        val n = hits.updateWith(url)(c => Some(c.getOrElse(0) + 1)).get
        if (n <= 2) throw RateLimited(retryAfterMs = Some(7L))
        s"""{"fetched":"$url"}"""
      }
    }
    val policy = RetryPolicy(baseBackoffMs = 1000, maxBackoffMs = 5L,
      sleep = ms => Sleeps.q.add(ms))
    val rows = CroissantSource.fetchRaw(spark, Seq("a", "b/c"), client,
        base = "stub://hub", policy = policy, partitions = 1)
      .collect().sortBy(_.batchId)
    assert(rows.forall(_.ok))
    assert(rows.map(_.payload).toSeq == Seq(
      """{"fetched":"stub://hub/api/datasets/a/croissant"}""",
      """{"fetched":"stub://hub/api/datasets/b/c/croissant"}"""))
    // Retry-After of 7ms exceeds the 5ms policy cap → every delay is 5.
    val sleeps = Sleeps.q.toArray(Array.empty[java.lang.Long]).toSeq
    assert(sleeps == Seq(5L, 5L, 5L, 5L), sleeps.toString)
  }

  test("retry exhaustion becomes an ok=false row, not a job failure") {
    val always429 = () => new HttpClient with Serializable {
      def get(url: String): String = throw RateLimited(None)
    }
    val policy = RetryPolicy(maxRetries = 1, baseBackoffMs = 1, sleep = _ => ())
    val rows = CroissantSource.fetchRaw(spark, Seq("dead"), always429,
      base = "stub://hub", policy = policy).collect()
    assert(rows.length == 1 && !rows.head.ok)
    assert(rows.head.ids == Seq("dead"))
  }

  test("croissantInput keeps only ok rows as (datasetId, croissant_json)") {
    import spark.implicits._
    val fetched = Seq(
      LiveSource.FetchedBatch(0L, Seq("good"), """{"x":1}""", ok = true, ""),
      LiveSource.FetchedBatch(1L, Seq("bad"), null, ok = false, "boom"))
      .toDS()
    val out = CroissantSource.croissantInput(fetched)
    assert(out.columns.toSeq == Seq("datasetId", "croissant_json"))
    assert(out.as[(String, String)].collect().toSeq == Seq(("good", """{"x":1}""")))
  }
}

/** JVM-wide sleep recorder: the policy closure ships to executor threads
  * (same JVM in local mode), so a plain object field is visible to both. */
private object Sleeps {
  val q = new ConcurrentLinkedQueue[java.lang.Long]()
  def clear(): Unit = q.clear()
}
