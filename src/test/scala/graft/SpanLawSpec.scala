package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Corpus

/** Randomized cross-check of the span-dedup family against a DRIVER-SIDE
  * brute-force oracle (independent of both the Spark plan and the DuckDB
  * SQL): a tiny vocab forces heavy accidental 5-gram sharing — the
  * hostile case for islanding — and the oracle recomputes matches, runs,
  * cover positions and clipped texts directly on token arrays.
  *
  *  1. commonSpansOf == brute pairs (max span AND run count, exactly);
  *  2. spanClipOf token accounting: n_removed == |cover(doc)| and the
  *     clipped text is the original token sequence minus exactly the
  *     covered positions;
  *  3. untouched docs (n_removed = 0) pass through byte-identical.
  */
class SpanLawSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 5
  private val MinSpan = 8

  // docs as token arrays over a 5-word vocab; text roundtrips mkString(" ")
  private val word = Gen.oneOf("a", "b", "c", "d", "e")
  private val corpus: Gen[List[(Long, Array[String])]] = for {
    n <- Gen.choose(2, 8)
    docs <- Gen.listOfN(n, Gen.choose(0, 22).flatMap(len =>
      Gen.listOfN(len, word).map(_.toArray)))
  } yield docs.zipWithIndex.map { case (w, i) => (i.toLong, w) }

  /** The engine's tokenization of mkString(" "): empty text is ONE empty
    * token (split keeps it), everything else roundtrips. */
  private def toks(w: Array[String]): Array[String] =
    if (w.isEmpty) Array("") else w

  /** Brute-force maximal runs (doc_a, doc_b, pb0, span), replicating the
    * operator's declared semantics including the frequency caps. */
  private def bruteRuns(docs: List[(Long, Array[String])],
                        dfCap: Int = 50, posCap: Int = 200)
      : Seq[(Long, Long, Long, Int)] = {
    val occ = mutable.Map[String, mutable.ArrayBuffer[(Long, Int)]]()
    for ((id, w0) <- docs; w = toks(w0); i <- 0 to w.length - K)
      occ.getOrElseUpdate(w.slice(i, i + K).mkString(" "),
        mutable.ArrayBuffer()) += ((id, i))
    val ok = occ.values.filter { os =>
      val df = os.map(_._1).distinct.size
      df >= 2 && df <= dfCap && os.size <= posCap
    }
    val matches = mutable.Map[(Long, Long, Int), mutable.SortedSet[Int]]()
    for (os <- ok; (a, pa) <- os; (b, pb) <- os if a < b)
      matches.getOrElseUpdate((a, b, pa - pb),
        mutable.SortedSet[Int]()) += pa
    matches.toSeq.flatMap { case ((a, b, diff), pas) =>
      // islands of consecutive pa
      val runs = mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]()
      pas.foreach { p =>
        if (runs.nonEmpty && runs.last.last == p - 1) runs.last += p
        else runs += mutable.ArrayBuffer(p)
      }
      runs.map(r => (a, b, (r.head - diff).toLong, r.size + K - 1))
    }
  }

  test("common spans == brute force (pairs, max span, run count)") {
    val prop = Prop.forAll(corpus) { docs =>
      val df = docs.map { case (id, w) => (id, w.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Corpus.commonSpansOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val want = bruteRuns(docs)
        .groupBy(r => (r._1, r._2))
        .view.mapValues(rs => (rs.map(_._4).max.toLong,
          rs.count(_._4 >= MinSpan).toLong))
        .filter(_._2._1 >= MinSpan).toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("span clip == brute force (cover accounting + verbatim passthrough)") {
    val prop = Prop.forAll(corpus) { docs =>
      val texts = docs.map { case (id, w) => id -> w.mkString(" ") }.toMap
      val df = texts.toSeq.toDF("doc_id", "text")
      val cover = mutable.Map[Long, mutable.Set[Long]]()
      bruteRuns(docs).filter(_._4 >= MinSpan).foreach {
        case (_, b, pb0, span) =>
          cover.getOrElseUpdate(b, mutable.Set[Long]()) ++=
            (pb0 until pb0 + span)
      }
      Corpus.spanClipOf(df).collect().forall { r =>
        val id = r.getLong(0)
        val w = toks(docs.toMap.apply(id))
        val cov = cover.getOrElse(id, mutable.Set[Long]())
        val expectText =
          if (cov.isEmpty) texts(id)
          else w.zipWithIndex.collect {
            case (t, i) if !cov.contains(i.toLong) => t
          }.mkString(" ")
        r.getLong(1) == w.length && r.getLong(2) == cov.size &&
          r.getString(3) == expectText
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
