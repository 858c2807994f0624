package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade scale probe for the heavy dedup family: materialize a 10×
  * corpus (sf0.1 documents/embeddings replicated with id remapping and
  * content perturbation) and measure q_incremental_dedup,
  * q_semantic_dedup, q_dedup_groups, and q_common_spans at 1× vs 10×.
  *
  * The perturbation is chosen so the 10× corpus keeps the 1× near-dup
  * structure per replica WITHOUT making replicas near-dups of each other
  * (which would densify the workload superlinearly and measure a
  * different problem): every 7th token of a replica's text is rewritten
  * to a replica-specific token (any 5-gram shingle survives in two
  * replicas only with probability (5/7)^... ≈ 0.18 → far below the LSH
  * band threshold), and embeddings get ±0.25 hash-uniform component noise
  * against ~0.1-σ components (cross-replica cosine ≪ the 0.95 production
  * threshold). Run:
  *
  *   sbt "Test/runMain graft.ScaleTenProbe"
  *
  * Measured numbers are recorded in SCALE.md.
  */
object ScaleTenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    val docs = Tables(spark, src, "documents").localCheckpoint()
    val emb = Tables(spark, src, "embeddings").localCheckpoint()
    val nDocs = docs.count()
    val nVec = emb.count()

    def corpus(mult: Int, out: java.io.File): String = {
      val reps = spark.range(mult).select(col("id").as("rep"))
      docs.crossJoin(reps)
        .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
          when(col("rep") === 0, col("text")).otherwise(
            expr("array_join(transform(split(text, ' '), (w, i) -> " +
              "CASE WHEN (i + rep) % 7 = 0 THEN concat('rp', rep, 'x', i % 13) " +
              "ELSE w END), ' ')")).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(new java.io.File(out, "documents.parquet").getPath)
      emb.crossJoin(reps)
        .select((col("vec_id") + col("rep") * nVec).as("vec_id"),
          when(col("rep") === 0, col("embedding")).otherwise(
            expr("transform(embedding, (x, d) -> cast(x + " +
              "(cast(xxhash64(concat(cast(vec_id AS STRING), '|', " +
              "cast(rep AS STRING), '|', cast(d AS STRING))) % 1000 AS DOUBLE) " +
              "/ 1000.0) * 0.25 AS FLOAT))")).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(new java.io.File(out, "embeddings.parquet").getPath)
      out.getAbsolutePath
    }

    def bestOf2(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // q_context_match is a per-card typed pass; q_rrf_fusion scans the
    // whole corpus in both retrieval arms — the round-5 additions whose
    // cost grows with data (q_version_history's fixture batches are
    // doc_id-bounded by design, so it is not a scale probe subject)
    val heavy = Seq("q_incremental_dedup", "q_semantic_dedup",
      "q_dedup_groups", "q_common_spans", "q_context_match", "q_rrf_fusion")
    val d1 = load.Scratch.dir("probe10_base", src)
    val d10 = load.Scratch.dir("probe10_ten", src)
    try {
      corpus(1, d1)
      corpus(10, d10)
      println(s"[scale10] corpus 1x: $nDocs docs / $nVec vecs; 10x: ${nDocs * 10} / ${nVec * 10}")
      heavy.foreach { q =>
        val t1 = bestOf2(q, d1.getAbsolutePath)
        val t10 = bestOf2(q, d10.getAbsolutePath)
        println(f"[scale10] $q%-22s 1x=$t1%6.2fs 10x=$t10%7.2fs ratio=${t10 / t1}%5.2f")
      }
    } finally {
      load.Scratch.rm(d1); load.Scratch.rm(d10)
    }
    spark.stop()
  }
}
