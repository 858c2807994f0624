package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Span-dedup scaling probe: measured pair counts + wall time as the
  * corpus grows, on a synthetic shape that pins the two scale claims —
  *
  *  - LINEARITY: every doc pair (2g, 2g+1) shares exactly one planted
  *    12-token span and nothing else, so reported pairs must equal n/2
  *    exactly (and each with max_span_tokens = 12) at every corpus size:
  *    output grows linearly with the corpus, never quadratically.
  *  - CAP SAFETY: every doc opens with the SAME 6-token boilerplate
  *    header. Without the frequency caps those header grams would match
  *    all-pairs (n²/4 rows before islanding); the df cap drops them
  *    before the self-join, so their contribution must be ZERO pairs and
  *    the probe's pair count stays n/2.
  *
  * Run: sbt "Test/runMain graft.SpanScaleProbe" — numbers go to SCALE.md.
  */
object SpanScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 6-token boilerplate header (in every doc) + 24 unique lead tokens +
    // 12 pair-shared span tokens + 24 unique tail tokens. Token ids come
    // from xxhash64, so accidental cross-doc 5-gram collisions are ~0.
    def mkDocs(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        lit("hdr0 hdr1 hdr2 hdr3 hdr4 hdr5"),
        expr("transform(sequence(0, 23), i -> concat('u', xxhash64(id, i)))"),
        expr("transform(sequence(0, 11), " +
          "i -> concat('s', xxhash64(CAST(id / 2 AS LONG), i, 'span')))"),
        expr("transform(sequence(24, 47), i -> concat('u', xxhash64(id, i)))")
      ).as("text"))

    for (n <- Seq(2000L, 8000L, 32000L)) {
      val docs = mkDocs(n).localCheckpoint()
      val t0 = System.nanoTime()
      val out = queries.Corpus.commonSpansOf(docs).localCheckpoint()
      val pairs = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val exact12 = out.filter(col("max_span_tokens") === 12 &&
        col("n_spans") === 1).count()
      println(f"[span] n=$n%6d pairs=$pairs%6d span12=$exact12%6d dt=$dt%6.2fs")
      // linearity + cap safety: exactly the planted pairs, nothing from
      // the all-docs header, every span found at its exact length
      require(pairs == n / 2, s"expected ${n / 2} pairs, got $pairs")
      require(exact12 == pairs, s"span lengths drifted: $exact12 != $pairs")
    }
    spark.stop()
  }
}
