package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Corpus

/** Laws of the decontamination family on RANDOM corpora (a tiny vocab
  * forces heavy 5-gram collisions, the hostile case):
  *
  *  1. totality — one verdict per train doc, kept <=> zero overlaps;
  *  2. monotonicity — growing the benchmark can only shrink the kept set
  *     (a decontaminator that un-drops docs when the eval suite grows
  *     would be unsound);
  *  3. Bloom one-sidedness — the stateless Bloom pass never keeps a doc
  *     the exact operator drops, at ANY filter size (false positives may
  *     over-drop; false negatives are impossible).
  */
class DecontaminationLawSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private def docs(idBase: Int): Gen[List[(Long, String)]] = for {
    n <- Gen.choose(0, 25)
    texts <- Gen.listOfN(n, Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, word).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => ((idBase + i).toLong, t) }

  private def df(rows: List[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def keptSet(train: List[(Long, String)],
                      bench: List[(Long, String)]): Set[Long] =
    Corpus.decontaminateFrames(df(train), df(bench))
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet

  test("totality and kept <=> zero overlaps") {
    val prop = Prop.forAll(docs(0), docs(1000)) { (train, bench) =>
      val v = Corpus.decontaminateFrames(df(train), df(bench)).collect()
      v.length == train.length &&
        v.forall(r => r.getBoolean(2) == (r.getLong(1) == 0L))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("growing the benchmark only shrinks the kept set") {
    val prop = Prop.forAll(docs(0), docs(1000), docs(2000)) {
      (train, bench, extra) =>
        keptSet(train, bench ++ extra).subsetOf(keptSet(train, bench))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("bloom pass never keeps a doc the exact operator drops") {
    val prop = Prop.forAll(docs(0), docs(1000)) { (train, bench) =>
      val exactKept = keptSet(train, bench)
      // deliberately undersized filter (high fpp): over-drops allowed,
      // pass-throughs still forbidden; empty benchmarks (all-short docs)
      // exercise the empty-safe path that stat.bloomFilter would NPE on
      val bytes = Corpus.ngramBloomOf(df(bench), 50, 0.2)
      val bloomKept = Corpus.decontaminateBloom(df(train), bytes)
        .filter(col("kept")).select("doc_id").as[Long].collect().toSet
      bloomKept.subsetOf(exactKept)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
