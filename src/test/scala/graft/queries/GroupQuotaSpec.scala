package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GroupQuotaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed synthetic corpus: source s gets (s+1)*7 docs of weight 100+s
  private lazy val docs = (0 until 9).flatMap { s =>
    (0 until (s + 1) * 7).map(i => (s * 1000L + i, s"g$s", 100L + s))
  }.toDF("doc_id", "source", "n_chars")

  private def alloc(t: Long) =
    Sampling.groupQuotaOf(docs, t)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("quotas sum exactly to the target (Hamilton exactness)") {
    Seq(1L, 17L, 100L, 163L).foreach { t =>
      val a = alloc(t)
      assert(a.values.map(_._4).sum == t, s"T=$t: ${a.values.toSeq}")
    }
  }

  test("quota stays within one unit of the exact proportional share") {
    val t = 163L
    val a = alloc(t)
    val w = a.values.map(_._3).sum.toDouble
    a.values.foreach { case (src, _, wt, quota, _) =>
      val exact = t * wt / w
      assert(math.abs(quota - exact) < 1.0, s"$src: quota $quota vs $exact")
    }
  }

  test("picked equals min(quota, group size); selection is deterministic") {
    val t = 500L // larger than some small groups can serve
    val a = alloc(t)
    a.values.foreach { case (src, nDocs, _, quota, picked) =>
      assert(picked == math.min(quota, nDocs), s"$src: $quota/$nDocs/$picked")
    }
    assert(alloc(t).view.mapValues(_._5).toMap ==
      a.view.mapValues(_._5).toMap)
  }
}
