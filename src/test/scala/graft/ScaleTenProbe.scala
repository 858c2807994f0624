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

    // Library-level probe for the PRODUCTION semantic-dedup path: cap ON
    // (default) and, for the scaled variant, bitsPerBand grown with the
    // corpus (~log2(n / targetOccupancy)) — the granularity law SCALE.md
    // documents. The graded q_semantic_dedup pins the cap OFF so the
    // DuckDB oracle can replay every pair; that makes it a correctness
    // instrument whose pair volume is n²/2^bits by design, not the
    // production configuration, so it is probed here instead of via
    // SparkEntry. Two-batch ingest, same split shape as the query.
    def semIngest(dir: String, scaled: Boolean): Double = {
      import graft.similarity.{SemanticDedupIndex, SemanticSketch}
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val n = emb.count()
      val sk =
        if (scaled) SemanticSketch.forCorpus(n) // the library's own dial
        else SemanticSketch(nBands = 3, bitsPerBand = 8)
      val bits = sk.bitsPerBand
      load.Scratch.withScratch("probe_sem", dir) { tmp =>
        val idx = new SemanticDedupIndex(spark, tmp.getAbsolutePath,
          threshold = 0.95, sketch = sk)
        val t0 = System.nanoTime()
        idx.ingest(emb.filter(col("vec_id") % 2 === 0))
        idx.ingest(emb.filter(col("vec_id") % 2 =!= 0))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[scale10]   (bits=$bits%2d bands=${sk.nBands} " +
          f"candidates=${idx.lastCandidates}%,d truncated=${idx.lastTruncated}%,d)")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
    }

    // q_context_match is a per-card typed pass; q_rrf_fusion scans the
    // whole corpus in both retrieval arms — the round-5 additions whose
    // cost grows with data (q_version_history's fixture batches are
    // doc_id-bounded by design, so it is not a scale probe subject)
    val heavyAll = Seq("q_incremental_dedup", "q_semantic_dedup",
      "q_dedup_groups", "q_common_spans", "q_context_match", "q_rrf_fusion",
      // round-6 families: linear scans (sq8 top-k), probed-index search
      // (ann_sq8), bounded-cell aggregation (cms), two-level rank
      // (interleave) — each with a distinct expected scaling shape
      "q_sq8_topk", "q_ann_sq8", "q_cms_sketch", "q_cms_heavy_hitters",
      "q_interleave", "q_pq_topk", "q_ann_pq", "q_pq_rerank",
      "q_ann_pqr", "q_ann_filtered", "q_incremental_ann", "q_bq_rerank")
    // args: [multiplier] [comma-separated query subset] — e.g.
    //   Test/runMain graft.ScaleTenProbe 100 q_dedup_groups,q_common_spans
    // gives a second measured decade on a chosen subset.
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val heavy = args.drop(1).headOption
      .map(o => { val s = o.split(",").toSet; heavyAll.filter(s) })
      .getOrElse(heavyAll)
    val d1 = load.Scratch.dir("probe10_base", src)
    val dN = load.Scratch.dir("probe10_big", src)
    try {
      corpus(1, d1)
      corpus(mult, dN)
      println(s"[scale10] corpus 1x: $nDocs docs / $nVec vecs; " +
        s"${mult}x: ${nDocs * mult} / ${nVec * mult}")
      heavy.foreach { q =>
        val t1 = bestOf2(q, d1.getAbsolutePath)
        val tN = bestOf2(q, dN.getAbsolutePath)
        println(f"[scale10] $q%-22s 1x=$t1%6.2fs ${mult}x=$tN%7.2fs ratio=${tN / t1}%5.2f")
      }
      args.drop(1).headOption.map(_.split(",").toSet).getOrElse(Set.empty)
        .intersect(Set("lib_semantic_default", "lib_semantic_scaled"))
        .toSeq.sorted.foreach { q =>
          val scaled = q.endsWith("scaled")
          val t1 = semIngest(d1.getAbsolutePath, scaled)
          val tN = semIngest(dN.getAbsolutePath, scaled)
          println(f"[scale10] $q%-22s 1x=$t1%6.2fs ${mult}x=$tN%7.2fs ratio=${tN / t1}%5.2f")
        }
    } finally {
      load.Scratch.rm(d1); load.Scratch.rm(dN)
    }
    spark.stop()
  }
}
