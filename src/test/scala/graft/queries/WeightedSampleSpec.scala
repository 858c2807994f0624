package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeightedSampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 200 docs: ids 0-99 weight 1, ids 100-199 weight 20
  private lazy val docs = (0L until 200L)
    .map(i => (i, if (i < 100) 1L else 20L))
    .toDF("doc_id", "n_chars")

  test("deterministic: same salt same sample; bounded; ranks 1..n") {
    val a = Sampling.weightedSampleOf(docs, "s1", 50)
      .select("rank", "doc_id").as[(Long, Long)].collect()
    val b = Sampling.weightedSampleOf(docs, "s1", 50)
      .select("rank", "doc_id").as[(Long, Long)].collect()
    assert(a.sameElements(b))
    assert(a.length == 50)
    assert(a.map(_._1).sorted.sameElements(1L to 50L))
    assert(a.map(_._2).distinct.length == 50, "without replacement")
  }

  test("inclusion tracks weight: heavy docs dominate across salts") {
    // With weights 20:1 and half the population heavy, a 50-of-200 draw
    // should be overwhelmingly heavy docs. Average over 20 salts to damp
    // single-draw noise; expected heavy share is >90%, assert >75%.
    val heavyShare = (1 to 20).map { i =>
      Sampling.weightedSampleOf(docs, s"salt$i", 50)
        .filter($"doc_id" >= 100).count().toDouble / 50.0
    }.sum / 20.0
    assert(heavyShare > 0.75, s"heavy share $heavyShare")
    assert(heavyShare < 1.0, "light docs must still appear sometimes overall")
  }

  test("key law: the sample equals the driver-side top-n by u^(1/w)") {
    val got = Sampling.weightedSampleOf(docs, "law", 30)
      .select("doc_id").as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val h = md.digest(s"law|$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) + 1).toDouble / 4294967296.0
    }
    val expect = (0L until 200L)
      .map(id => (math.log(u(id)) / (if (id < 100) 1.0 else 20.0), id))
      .sortBy { case (r, id) => (-r, id) }.take(30).map(_._2).toSet
    assert(got == expect)
  }
}
