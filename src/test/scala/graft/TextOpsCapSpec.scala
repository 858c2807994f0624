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
}
