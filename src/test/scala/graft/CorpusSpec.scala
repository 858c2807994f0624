package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the corpus-audit operators (Corpus.scala). The DuckDB
  * oracle gate checks value equality; these pin the invariants a reader
  * should be able to rely on without re-deriving the SQL.
  */
class CorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  // sf0.01: the sf0.001 corpus happens to have zero cross-split 5-gram
  // collisions, which would make the "catches the planted dup" assertion
  // vacuous; sf0.01 plants 4 contaminated train docs (and is still 500
  // rows, so the test stays fast)
  private val contamDir = "/root/testdata/sf0.01"

  test("decontaminate: verdict covers exactly the train split, kept <=> zero overlaps") {
    val out = queries.Corpus.decontaminate(spark, contamDir).cache()
    val train = queries.Sampling.splitAssign(spark, contamDir)
      .filter(col("split") === "train")
    // one verdict row per train doc, no more, no less
    assert(out.count() == train.count())
    assert(out.join(train, "doc_id").count() == out.count())
    // kept is defined by the overlap count, both directions
    assert(out.filter(col("kept") =!= (col("n_contaminated_ngrams") === 0))
      .count() == 0)
    // the synthetic corpus plants near-duplicates across splits; the
    // stage must catch at least one (a decontaminator that never fires
    // is indistinguishable from a broken one)
    assert(out.filter(!col("kept")).count() > 0)
    out.unpersist()
  }

  test("bm25: k rows, dense ranks, scores non-increasing, every hit has a query term") {
    val rows = queries.Corpus.bm25TopK(spark, dir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(2)).sorted.sameElements(1L to 20L))
    val byRank = rows.sortBy(_.getLong(2)).map(_.getDouble(1))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("quantiles: histogram walk is exact (matches percentile()) and ordered") {
    val out = queries.Corpus.lengthQuantiles(spark, dir).cache()
    val rows = out.collect()
    assert(rows.forall(r =>
      r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4)))
    // strata counts cover the whole corpus
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // the histogram route must agree with Spark's own exact percentile
    // (sort-buffer based) — same interpolation, different algorithm
    val ref = Tables(spark, dir, "documents").groupBy("lang").agg(
      round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
      round(expr("percentile(n_chars, 0.9)"), 4).as("p90"),
      round(expr("percentile(n_chars, 0.99)"), 4).as("p99"))
    assert(out.select("lang", "p50", "p90", "p99")
      .except(ref).count() == 0)
    out.unpersist()
  }

  test("common spans: planted span found exactly, sub-threshold spans silent") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10-token span
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"one two three four five six $shared"),
      (3L, "totally unrelated words here nothing shared at all"),
      (4L, "y1 y2 y3 y4 y5 y6 y7 y8 y9")).toDF("doc_id", "text")
    val out = queries.Corpus.commonSpansOf(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // max span is EXACT: 10 shared tokens = island of 6 5-gram matches
    assert(r.getLong(2) == 10L && r.getLong(3) == 1L)
    // a 7-token shared run sits below the 8-token report threshold
    val below = Seq(
      (1L, "p1 p2 p3 c1 c2 c3 c4 c5 c6 c7 q1"),
      (2L, "r1 r2 c1 c2 c3 c4 c5 c6 c7 r3")).toDF("doc_id", "text")
    assert(queries.Corpus.commonSpansOf(below).isEmpty)
  }

  test("common spans: frequency caps drop boilerplate grams before the join") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val tri = Seq(
      (1L, s"$shared a1 b1 c1"),
      (2L, s"$shared a2 b2 c2"),
      (3L, s"$shared a3 b3 c3")).toDF("doc_id", "text")
    // uncapped: every pair of the triangle reports the span
    assert(queries.Corpus.commonSpansOf(tri).count() == 3)
    // df cap 2: the shared grams live in 3 docs -> excluded, no pairs
    assert(queries.Corpus.commonSpansOf(tri, dfCap = 2).isEmpty)
    // position cap below the 18 total gram occurrences -> excluded too
    assert(queries.Corpus.commonSpansOf(tri, posCap = 2).isEmpty)
  }

  test("span clip: removes exactly the duplicated copy, survivor intact") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d1 = s"alpha beta gamma $shared delta epsilon zeta"
    val d3 = "totally unrelated words here nothing shared at all"
    // irregular whitespace + no duplicated span: the passthrough branch
    // must be BYTE-identical, not a token-stream re-rendering
    val d4 = "spaced  out\twords\nhere untouched entirely still unique"
    val docs = Seq(
      (1L, d1),
      (2L, s"one two three four five six $shared"),
      (3L, d3),
      (4L, d4)).toDF("doc_id", "text")
    val out = queries.Corpus.spanClipOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the lower id keeps its copy byte-for-byte
    assert(out(1L).getLong(2) == 0 && out(1L).getString(3) == d1)
    // the higher id loses EXACTLY the shared tokens; the rest keep order
    assert(out(2L).getLong(2) == 10 &&
      out(2L).getString(3) == "one two three four five six")
    // untouched docs pass through verbatim with n_removed = 0
    assert(out(3L).getLong(2) == 0 && out(3L).getString(3) == d3)
    assert(out(4L).getLong(2) == 0 && out(4L).getString(3) == d4)
    // token accounting: n_tokens is the pre-clip count
    assert(out(2L).getLong(1) == 16)
  }

  test("lm score: self-trained bigram LM — deterministic text scores 0, " +
    "competing contexts score ln(1/k), short docs are null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "r r r r r r"), // only doc with 'r': P(r|r)=1 everywhere
      (2L, "a b"), (3L, "a c"), (4L, "a d"), (5L, "a e"), // P(.|a)=1/4
      (6L, "solo")).toDF("doc_id", "text")
    val out = queries.TextOps.lmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) == 0.0 && out(1L).getLong(1) == 5L)
    // round(ln(0.25), 4) = -1.3863 — each of the four bigrams
    (2L to 5L).foreach { id =>
      assert(out(id).getLong(1) == 1L && out(id).getDouble(2) == -1.3863)
    }
    // a 1-token doc has no bigrams: present, n = 0, score null
    assert(out(6L).getLong(1) == 0L && out(6L).isNullAt(2))
    // scores are log-probabilities: never positive
    assert(out.values.filter(!_.isNullAt(2)).forall(_.getDouble(2) <= 0.0))
  }

  test("temperature mix: alpha=1 keeps everything, alpha=0.5 flattens shares") {
    val docs = Tables(spark, dir, "documents")
    val id = queries.Sampling.temperatureMixOf(docs, 1.0).collect()
    assert(id.nonEmpty && id.forall(r => r.getLong(3) == r.getLong(1)))
    val half = queries.Sampling.temperatureMixOf(docs, 0.5).collect()
    // smallest language keeps everything (keep_micro = 10^6)
    val minTotal = half.map(_.getLong(1)).min
    assert(half.filter(_.getLong(1) == minTotal)
      .forall(_.getLong(2) == 1000000L))
    // kept counts never exceed totals and shares flatten: the max/min
    // ratio across sources strictly shrinks vs the input distribution
    assert(half.forall(r => r.getLong(3) <= r.getLong(1)))
    val preRatio = half.map(_.getLong(1)).max.toDouble / minTotal
    val postMin = half.map(_.getLong(3)).min
    val postRatio = half.map(_.getLong(3)).max.toDouble / postMin
    assert(preRatio > 1.0 && postRatio < preRatio)
  }
}
