package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference greedy BPE merge: scan symbols left to right, merging
    * each (l, r) occurrence as soon as it is seen (the merged symbol is
    * never reconsidered as a left part in the same pass — standard BPE
    * application order). */
  private def greedy(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
      case a :: tail => out += a; rest = tail
    }
    out.toList
  }

  test("three-pass replace equals greedy BPE on words without 5+ runs") {
    // every word over {a, b} up to length 8, excluding same-char runs of
    // 5+ — on those the pass-restart policy provably diverges from
    // canonical greedy (pinned in the next test), everywhere else the
    // two are equal, and natural words never carry 5 identical chars
    def maxRun(w: Seq[String]): Int =
      w.foldLeft(("", 0, 0)) { case ((prev, cur, best), c) =>
        val n = if (c == prev) cur + 1 else 1
        (c, n, math.max(best, n))
      }._3
    val words = (1 to 8).flatMap(n =>
      (0 until (1 << n)).map(bits =>
        (0 until n).map(i => if ((bits >> i & 1) == 0) "a" else "b")))
      .filter(maxRun(_) <= 4)
    val merges = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toDF("id", "seg")
    merges.foreach { case (l, r) =>
      val got = df.select($"id", Bpe.applyMerge($"seg", l, r).as("m"))
        .as[(Long, String)].collect().toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val want = greedy(w.toList, l, r).mkString(" ")
        assert(got(i.toLong) == want,
          s"merge ($l,$r) on '${w.mkString(" ")}': got '${got(i.toLong)}' want '$want'")
      }
    }
  }

  test("the documented divergence: 5-run merges outer pairs, greedy merges left") {
    // " a a a a a ": replace consumes (1,2) then resumes AFTER the
    // shared delimiter, next match is (4,5) — canonical greedy takes
    // (1,2),(3,4). Same merge COUNT, different placement; both engines
    // implement the same replace policy, so parity is unaffected.
    val got = Seq(0L -> "a a a a a").toDF("id", "seg")
      .select(Bpe.applyMerge($"seg", "a", "a")).as[String].head()
    assert(got == "aa a aa", got)
    assert(greedy(List("a", "a", "a", "a", "a"), "a", "a") ==
      List("aa", "aa", "a"))
  }

  test("merge table on a hand-built corpus: counts and order are exact") {
    // "abab" x3, "ab" x2: pair (a,b) count = 3*2+2*1 = 8 beats (b,a)=3
    val docs = Seq("abab abab ab", "abab ab").toDF("text")
    val merges = Bpe.bpeMergesOf(spark, docs)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    // the toy vocabulary merges to single symbols after 2 rounds — the
    // learner must stop early, not crash or fabricate merges
    assert(merges.length == 2, merges.toSeq)
    val first = merges.head
    assert((first._2, first._3, first._4) == ("a", "b", "ab"), first)
    assert(first._5 == 8L, s"ab pair count: ${first._5}")
    // round 2: segmentations are "ab ab" (n=3) and "ab" (n=2) → the only
    // remaining pair is (ab, ab) with count 3
    val second = merges(1)
    assert((second._2, second._3, second._4) == ("ab", "ab", "abab"), second)
    assert(second._5 == 3L, second)
  }

  test("batched learner with batchN=1 IS the sequential learner") {
    // the exactness witness for the batch selection rule: with one slot
    // per round, "no conflict with any higher-ranked candidate" reduces
    // to the plain (cnt DESC, l, r) argmax — identical merges, per round
    val docs = graft.Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val seq6 = Bpe.bpeMergesOf(spark, docs)
      .select($"round", $"sym_l", $"sym_r", $"merged", $"pair_count")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val bat6 = Bpe.bpeBatchMergesOf(spark, docs, rounds = 6, batchN = 1)
      .select($"round", $"sym_l", $"sym_r", $"merged", $"pair_count")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(bat6.toSeq == seq6.toSeq)
  }

  test("batched rounds select pairwise non-interacting merges") {
    val docs = graft.Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val rows = Bpe.bpeBatchMergesOf(spark, docs).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("round")).foreach { case (round, batch) =>
      // sel_rank dense 1..k within the round
      assert(batch.map(_.getAs[Long]("sel_rank")).sorted.toSeq ==
        (1L to batch.length).toSeq, s"round $round ranks")
      val symSets = batch.map(r => Set(r.getAs[String]("sym_l"),
        r.getAs[String]("sym_r"), r.getAs[String]("merged")))
      for (i <- symSets.indices; j <- 0 until i)
        assert((symSets(i) & symSets(j)).isEmpty,
          s"round $round: merges $i and $j interact: ${symSets(i)} ${symSets(j)}")
    }
  }

  test("deterministic across runs") {
    val docs = Seq("spark scan merge", "scan merge merge spark").toDF("text")
    val a = Bpe.bpeMergesOf(spark, docs).collect().map(_.toString).sorted
    val b = Bpe.bpeMergesOf(spark, docs).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("delta-maintained pair counts equal a full recount after every merge") {
    // the incremental-maintenance law behind both learners: subtract the
    // affected words' old pairs, add their new ones, get EXACTLY the
    // table a full recount would produce (so the argmax — and every
    // learned merge — cannot drift)
    val seg0 = Seq(
      ("banana", 5L, "b a n a n a"),
      ("bandana", 3L, "b a n d a n a"),
      ("cab", 7L, "c a b"),
      ("zzz", 2L, "z z z")).toDF("word", "n", "seg")
    def counts(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    var seg = seg0.localCheckpoint()
    var pc = Bpe.pairCounts(seg).localCheckpoint()
    for (m <- Seq(("a", "n"), ("an", "a"), ("z", "z"))) {
      val adv = Bpe.applyWithDelta(seg, pc, Seq(m))
      seg = adv._1; pc = adv._2
      assert(counts(pc) == counts(Bpe.pairCounts(seg)),
        s"delta table diverged after merge $m")
    }
    // and a batched (disjoint pair) application maintains the law too
    val adv = Bpe.applyWithDelta(seg, pc, Seq(("b", "ana"), ("c", "a")))
    assert(counts(adv._2) == counts(Bpe.pairCounts(adv._1)))
  }
}
