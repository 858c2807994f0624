package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextOps

/** Hot-shingle document-frequency cap: a stop-phrase shingle shared by df
  * documents would generate df² rows in the inverted-index join — the cap
  * must keep one hot bucket from going quadratic while leaving genuine
  * near-dup pairs intact. */
class TextOpsCapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shingleTable = {
    // docs 1-10 share ONE hot shingle and are otherwise unique;
    // docs 11-12 are true near-dups (identical shingle sets)
    val hotDocs = (1 to 10).map(i => (i.toLong, "a", Seq("HOT", s"uniq$i")))
    val dupDocs = Seq((11L, "a", Seq("x1", "x2", "x3")),
      (12L, "a", Seq("x1", "x2", "x3")))
    (hotDocs ++ dupDocs).toDF("doc_id", "source", "sh")
  }

  test("df cap drops hot-shingle pairs, keeps genuine near-dups") {
    val capped = TextOps.ngramJaccardCapped(shingleTable, dfCap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((11L, 12L)),
      s"hot shingle (df=10 > cap=5) must generate no pairs, got $capped")
  }

  test("below the cap, the same shingle still pairs documents") {
    val uncapped = TextOps.ngramJaccardCapped(shingleTable, dfCap = 1000)
    // 10 hot docs pair all-with-all (jacc 1/3) + the true dup pair
    assert(uncapped.count() == 10 * 9 / 2 + 1)
  }

  test("a LARGE hot set (thousands of capped shingles) still anti-joins correctly") {
    // web-corpus shape: the hot set is not "few" — 2000 distinct shingles
    // all above the cap (so a broadcast-hint OOM class would be fed here).
    // Docs 1-6 share ALL hot shingles (df=6 > cap=5) and one unique each;
    // docs 11-12 are genuine near-dups on non-hot shingles.
    val hot = (1 to 2000).map(i => s"hot$i")
    val hotDocs = (1 to 6).map(i => (i.toLong, "a", hot :+ s"uniq$i"))
    val dupDocs = Seq((11L, "a", Seq("y1", "y2", "y3")),
      (12L, "a", Seq("y1", "y2", "y3")))
    val sh = (hotDocs ++ dupDocs).toDF("doc_id", "source", "sh")
    val pairs = TextOps.ngramJaccardCapped(sh, dfCap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((11L, 12L)),
      s"every hot shingle must be excluded from intersection counting: $pairs")
  }

  test("concurrent incrementalDedup invocations are isolated (scratch race)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the scratch path is process-unique per invocation: two overlapping
    // runs (the Verify-and-Bench-in-parallel scenario) must both produce
    // the full survivor set, not clear each other's index mid-ingest
    val sf = TestSpark.sf0001
    val Seq(a, b) = Await.result(Future.sequence(Seq(
      Future(TextOps.incrementalDedup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet),
      Future(TextOps.incrementalDedup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet))), 5.minutes)
    assert(a == b && a.nonEmpty, s"sizes: ${a.size} vs ${b.size}")
  }
}
