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

  test("collapsed containment equals the naive per-doc join, replicas and hot shingles included") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    // the naive (pre-collapse) form, kept inline as the reference: this
    // is what the DuckDB oracle replays
    def naive(sh: DataFrame, dfCap: Int): DataFrame = {
      val ex = sh.select(col("doc_id"), size(col("sh")).as("n"),
        explode(col("sh")).as("s"))
      val hot = ex.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap).select("s")
      val kept = ex.join(hot, Seq("s"), "left_anti")
      val a = kept.select(col("doc_id").as("doc1"), col("n").as("n1"), col("s"))
      val b = kept.select(col("doc_id").as("doc2"), col("n").as("n2"), col("s"))
      a.join(b, Seq("s")).filter(col("doc1") < col("doc2"))
        .groupBy("doc1", "doc2", "n1", "n2").agg(count(lit(1)).as("inter"))
        .withColumn("containment", round(col("inter").cast("double") /
          least(col("n1"), col("n2")).cast("double"), 4))
        .filter(col("containment") >= 0.8)
        .select(when(col("n1") <= col("n2"), col("doc1")).otherwise(col("doc2"))
          .as("contained_doc"),
          when(col("n1") <= col("n2"), col("doc2")).otherwise(col("doc1"))
            .as("container_doc"), col("containment"))
    }
    val xs = Seq("x1", "x2", "x3", "x4", "x5")
    val corpus = (
      // a 4-replica group (the web-scale verbatim-duplication shape)
      (1 to 4).map(i => (i.toLong, xs)) ++ Seq(
        (5L, xs ++ Seq("y1", "y2", "y3", "y4", "y5")), // strict container
        (6L, Seq("x1", "x2", "x3", "x4", "z5")), // equal-n tie vs the group
        (7L, Seq("h1", "h2")), (8L, Seq("h1", "h2")), // ALL shingles hot
        (9L, Seq("h1", "p1", "p2", "p3", "p4")), // partially hot replica
        (10L, Seq("h1", "p1", "p2", "p3", "p4"))) ++
      // make h1/h2 hot (df 9 > 7) with unique fillers; the x-family df is 6
      (20 to 26).map(i => (i.toLong, Seq("h1", "h2", s"f$i")))
    ).toDF("doc_id", "sh")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = rows(TextOps.containmentOf(corpus, dfCap = 7))
    val want = rows(naive(corpus, dfCap = 7))
    assert(got == want, s"collapsed != naive:\n got-want=${got -- want}\n want-got=${want -- got}")
    // and the crafted cases are all present: replica pairs at 1.0, the
    // container at 1.0, the 0.8 tie pairs, the partially-hot replica
    // pair at 0.8 — and NO pair for the all-hot group
    assert((1 to 4).combinations(2).forall { case Seq(i, j) =>
      got.contains((i.toLong, j.toLong, 1.0)) })
    assert((1 to 4).forall(i => got.contains((i.toLong, 5L, 1.0))))
    assert((1 to 4).forall(i => got.contains((i.toLong, 6L, 0.8))))
    assert(got.contains((9L, 10L, 0.8)))
    assert(!got.exists(p => p._1 == 7L || p._2 == 8L),
      s"all-hot group must yield no pair (the naive cap contract): $got")
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
