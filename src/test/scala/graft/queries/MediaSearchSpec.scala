package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.multimodal.BinaryPipeline

/** Query-by-example media search: [[MediaDedup.mediaSearchFor]] takes
  * arbitrary EXTERNAL probe payloads — the verb a production user calls —
  * not corpus ids. A byte-perturbed copy of a corpus payload must
  * retrieve its original at rank 1 through the capped banded buckets. */
class MediaSearchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("an external byte-perturbed copy retrieves its original at rank 1") {
    val corpus = MediaDedup.mediaOf(spark, TestSpark.sf0001)
    // pick a deterministic target whose signature is ISOLATED (no other
    // corpus doc within Hamming 12 and no exact-signature twin), so
    // rank 1 is unambiguous for a lightly-perturbed probe
    val sigs = MediaDedup.mediaSignatures(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lens = corpus.select(col("id"), octet_length(col("payload")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // largest isolated payload: more distinct windows → larger vote
    // margins → a one-byte perturbation flips the fewest signature bits
    val isolated = sigs.filter { case (id, s) =>
      sigs.forall { case (o, os) =>
        o == id || java.lang.Long.bitCount(s ^ os) > 12 }
    }.map(_._1)
    assert(isolated.nonEmpty, "no isolated corpus signature at sf0.001")
    val targetId = isolated.maxBy(lens)
    val payload = corpus.filter(col("id") === targetId)
      .collect().head.payload
    assert(payload.length > 40, "need room to perturb mid-payload")
    val perturbed = payload.clone()
    perturbed(payload.length / 2) =
      (perturbed(payload.length / 2) ^ 0x5a).toByte
    // external probe: id 999999 exists nowhere in the corpus
    val probe = Seq(BinaryPipeline.MediaRow(999999L, perturbed,
      "application/octet-stream")).toDS()
    val hits = MediaDedup.mediaSearchFor(probe, corpus)
      .orderBy(col("hamming"), col("media_id")).collect()
    assert(hits.nonEmpty, "perturbed probe must still band-collide")
    assert(hits.head.getAs[Long]("query_id") == 999999L)
    assert(hits.head.getAs[Long]("media_id") == targetId,
      s"rank 1 must be the original $targetId, got ${hits.toSeq}")
  }

  test("search drops hot corpus buckets but keeps cold-band hits") {
    // corpus: 1500 DISTINCT sigs all sharing band-0 value 5 (and band-3
    // value 0) — both buckets above BucketCap=1000 — plus one cold doc.
    // The probe shares ONLY the two hot buckets with the hot family and
    // one cold band (b1) with the control doc: the capped search must
    // return the control alone, never the 1500 hot-family rows.
    val hotFam = (0 until 1500).map(i => (1000L + i, ((i + 1).toLong << 12) | 0x5L))
    val control = (9000L, (0xABCL << 12) | 0x777L) // b1 = 0xABC, cold
    val corpusSig = (hotFam :+ control).toDF("doc_id", "sig")
    val probeSig = Seq((1L, (1L << 30) | (0xABCL << 12) | 0x5L))
      .toDF("doc_id", "sig") // b0=5 (hot), b1=0xABC (cold), b3=0 (hot)
    val hits = MediaDedup.searchSigs(probeSig, corpusSig)
      .collect().map(r => r.getLong(1)).toSet
    assert(hits == Set(9000L),
      s"hot buckets must be dropped, cold hits kept: $hits")
  }

  test("the graded corpus-id instance goes through the same verb") {
    // mediaSearch == mediaSearchFor(docs<10, docs>=10) by construction;
    // pin the composition so the graded row cannot drift from the verb
    val media = MediaDedup.mediaOf(spark, TestSpark.sf0001)
    val viaVerb = MediaDedup.mediaSearchFor(
        media.filter(col("id") < 10), media.filter(col("id") >= 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val graded = MediaDedup.mediaSearch(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaVerb == graded)
  }
}
