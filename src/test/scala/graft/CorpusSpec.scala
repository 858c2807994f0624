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
}
