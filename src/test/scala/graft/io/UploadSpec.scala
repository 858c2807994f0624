package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.ChunkUploader
import graft.sources.LiveSource
import graft.sources.LiveSource.RetryPolicy

/** K8 production half: chunked N-Triples upload through an injectable
  * transport (object-static stub so executor calls are observable in
  * local mode). */
object StubUpload {
  import java.util.concurrent.ConcurrentLinkedQueue
  import java.util.concurrent.atomic.AtomicInteger
  val posts = new ConcurrentLinkedQueue[(String, String)]()
  val calls = new AtomicInteger(0)
  def reset(): Unit = { posts.clear(); calls.set(0) }
  def transport(): ChunkUploader.Transport =
    new ChunkUploader.Transport with Serializable {
      def post(url: String, body: String): String = {
        // the very first chunk POST rate-limits once: exercises the retry
        if (url.contains("/chunk/") && StubUpload.calls.incrementAndGet() == 1)
          throw LiveSource.RateLimited(retryAfterMs = None)
        StubUpload.posts.add((url, body)); "ok"
      }
    }
}

class UploadSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("chunk upload: partitions POST their own chunk, one finalize, retry works") {
    StubUpload.reset()
    val triples = graft.queries.Graph.tripleGen(spark, TestSpark.sf0001)
    val n = triples.count()
    val policy = RetryPolicy(baseBackoffMs = 1, sleep = _ => ())
    val report = ChunkUploader.upload(triples, "https://stub/api", "b1",
      numChunks = 4, () => StubUpload.transport(), policy)

    val posts = StubUpload.posts.toArray.map(_.asInstanceOf[(String, String)])
    val chunkPosts = posts.filter(_._1.contains("/chunk/"))
    val finalizes = posts.filter(_._1.endsWith("/finalize"))
    assert(chunkPosts.length == 4 && finalizes.length == 1)
    // each chunk POSTs to its own idempotency key (partition id in the URL)
    assert(chunkPosts.map(_._1).distinct.length == 4,
      s"chunk URLs must be distinct per partition: ${chunkPosts.map(_._1).toSeq}")
    assert(finalizes.head._1 == "https://stub/api/upload/batch/b1/finalize")
    // every triple arrives exactly once across the chunk bodies
    val totalLines = chunkPosts.map(_._2.linesIterator.size).sum
    assert(totalLines == n && report.nTriples == n)
    assert(report.numChunks == 4)
    // the rate-limited first POST was retried (call count > post count)
    assert(StubUpload.calls.get() > chunkPosts.length + finalizes.length - 1)
  }

  test("croissant endpoint through the connector: fetch -> expand -> triples") {
    // S4's production shape: croissant JSON fetched per dataset id via
    // LiveSource, then the JSON-LD subset expander + surgery build triples
    val croissantJson =
      """{"@context": {"sc": "https://schema.org/",
        |  "name": "https://schema.org/name", "url": "https://schema.org/url"},
        | "@type": "sc:Dataset", "name": "quovadis",
        | "url": "https://huggingface.co/datasets/x/quovadis",
        | "distribution": [{"@type": "http://mlcommons.org/croissant/FileObject",
        |   "name": "data.parquet"}]}""".stripMargin
    val payloads = Map("x/quovadis" -> croissantJson)
    val client = () => new LiveSource.HttpClient with Serializable {
      def get(url: String): String =
        payloads(url.substring(url.indexOf("=") + 1))
    }
    val fetched = LiveSource.fetch(spark, Seq("x/quovadis"), client,
        id => s"stub://croissant?id=$id").toDF()
      .select(col("id").as("datasetId"), col("payload").as("croissant_json"))
    val triples = graft.transform.CroissantBuilder.build(fetched)
    val objs = triples.select("obj").collect().map(_.getString(0)).toSet
    assert(objs.contains("quovadis"))
    assert(!objs.contains("data.parquet"), "file nodes must be surgically removed")
    // re-identified root, no blank nodes
    assert(!triples.filter(col("subject").startsWith("_:")).take(1).nonEmpty)
  }
}
