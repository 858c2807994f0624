package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The v2 corpus-cleaning chain on a CONSTRUCTED corpus where every stage
  * and the precedence order fire: quality > exact > containment >
  * near_dup > semantic. On the synthetic graded tables the earlier
  * stages subsume some later ones (containment ⊇ the Jaccard pairs
  * there), so this spec is the witness that each dropper and each
  * precedence edge actually works. */
class CorpusPipelineV2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("every stage fires and precedence holds on a constructed corpus") {
    val longA = words("aaa", 40) // >= 150 chars
    val dupT = words("bbb", 40)
    val contA = words("ccc", 40)
    // near-dups: 4 unique + 28 shared + 4 unique words each -> 34
    // shingles, 26 shared: jacc 26/42 ≈ 0.62 (>= 0.5 fires) while
    // containment 26/34 ≈ 0.76 stays under 0.8 (must NOT fire)
    val nd1 = words("xxx", 4) + " " + words("ddd", 28) + " " + words("yyy", 4)
    val nd2 = words("zzz", 4) + " " + words("ddd", 28) + " " + words("www", 4)
    val docs = Seq(
      (1L, "tiny doc"), // quality
      (2L, dupT), (3L, dupT), // 3 -> exact
      (5L, contA), (4L, contA + " " + words("eee", 60)), // 5 contained in 4
      (6L, nd1), (7L, nd2), // 7 -> near_dup
      (8L, words("fff", 40)), (9L, words("ggg", 40))) // 9 -> semantic
    val dim = 8
    def oneHot(p: Int): Seq[Double] = Seq.tabulate(dim)(i => if (i == p) 1.0 else 0.0)
    val emb = Seq(
      (1L, oneHot(1)), (2L, oneHot(2)), (3L, oneHot(3)), (4L, oneHot(4)),
      (5L, oneHot(5)), (6L, oneHot(6)), (7L, oneHot(7)),
      (8L, oneHot(0)), (9L, oneHot(0))) // 8 and 9 collide -> 9 drops
    val tmp = java.nio.file.Files.createTempDirectory("graft_cpv2").toFile
    try {
      docs.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("int"))
        .write.parquet(s"$tmp/documents.parquet")
      emb.toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
      val out = TextOps.corpusPipelineV2(spark, tmp.getAbsolutePath)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = Map(
        1L -> "quality", 2L -> "kept", 3L -> "exact",
        4L -> "kept", 5L -> "containment",
        6L -> "kept", 7L -> "near_dup",
        8L -> "kept", 9L -> "semantic")
      assert(out == expected, s"got $out")
    } finally graft.load.Scratch.rm(tmp)
  }

  test("a zero-norm embedding never semantic-drops (NaN-vs-NULL parity)") {
    // 0/0 cosine: Spark orders NaN ABOVE every double, so an unguarded
    // `cos >= 0.2` filter silently drops an all-zero embedding, while
    // the DuckDB oracle's divide-by-zero NULL keeps it — the nullif
    // guard must make the engine keep it too (undefined cosine never
    // clears a threshold). The two zero vectors share sign-bucket 0, so
    // the pair join genuinely scores the 0/0 pair — unguarded, doc 2
    // came back 'semantic'.
    val dim = 8
    val docs = Seq(
      (1L, words("aaa", 40)), (2L, words("bbb", 40)), (3L, words("ccc", 40)))
    val emb = Seq(
      (1L, Seq.fill(dim)(0.0)), (2L, Seq.fill(dim)(0.0)),
      (3L, Seq.fill(dim)(1.0)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cpv2z").toFile
    try {
      docs.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("int"))
        .write.parquet(s"$tmp/documents.parquet")
      emb.toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
      val out = TextOps.corpusPipelineV2(spark, tmp.getAbsolutePath)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "kept", 2L -> "kept", 3L -> "kept"),
        s"zero-norm vectors must never drop: $out")
    } finally graft.load.Scratch.rm(tmp)
  }
}
