package graft

import org.apache.spark.sql.SparkSession

/** The third bench decade — a MEASURED sf1 run of the most expensive
  * graded queries (the r8 idle top-15 plus the two r9 sweep rows),
  * converting the "plans survive 100×" claim from two-decade probe
  * extrapolation to measurement.
  *
  * Prereq: `python3 tools/gen_sf1.py` (10× sf0.1, key-shifted replicas,
  * text verbatim — a duplicate-heavy corpus by construction, the shape
  * the r9 hot-bucket discipline targets). Measures each query best-of-2
  * at sf0.1 AND sf1 in one session (apples-to-apples), prints one JSON
  * line for tools/bench_sf1_top15.json, and a per-query ratio table for
  * SCALE.md. Fixed-slice queries (the version family's doc_id∈[200,250)
  * ingest batches) are expected near 1× — their cost tracks the batch by
  * design; pair-output queries can exceed 10× where the OUTPUT contract
  * is quadratic under exact replication (flagged in the table).
  *
  * Run idle: sbt "Test/runMain graft.BenchSf1"
  */
object BenchSf1 {
  private val Top15 = Seq(
    "q_pagerank", "q_media_groups", "q_stream_merge", "q_simhash_neardup",
    "q_context_match", "q_incremental_dedup", "q_codec_recall",
    "q_media_incremental", "q_version_ttl", "q_semantic_dedup",
    "q_containment", "q_version_compacted", "q_incremental_ann",
    "q_dedup_groups", "q_version_delta",
    // the two LSM sweep rows, landed after the original top-15 ranking
    // and now the two most expensive graded queries: capped intake at
    // the demo cap + full-recall sweep (escalation ladder and terminal
    // star ENGAGE on the verbatim-replicated sf1 corpus — the one place
    // the hot-bucket machinery is exercised at the third decade)
    "q_media_sweep", "q_semantic_sweep",
    // the decision instruments (same demo-capped intake setup; the
    // decision itself is one aggregate scan of the standing index)
    "q_sweep_decision", "q_semantic_sweep_decision")

  def main(args: Array[String]): Unit = {
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    require(new java.io.File(s"$sf1Dir/documents.parquet").exists(),
      s"run tools/gen_sf1.py first (no corpus at $sf1Dir)")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def bestOf2(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      math.min(once(), once())
    }

    // warm session machinery
    Tables(spark, "/root/testdata/sf0.1", "documents").count()
    Tables(spark, sf1Dir, "documents").count()

    val rows = Top15.map { q =>
      val d01 = bestOf2(q, "/root/testdata/sf0.1")
      val d1 = bestOf2(q, sf1Dir)
      println(f"[sf1bench] $q%-22s sf0.1=$d01%6.2fs sf1=$d1%7.2fs ratio=${d1 / d01}%5.2fx")
      (q, d01, d1)
    }
    val qs = rows.map { case (q, a, b) =>
      s""""$q":{"sf01":$a,"sf1":$b,"ratio":${b / a}}""" }.mkString(",")
    val json = s"""{"metric":"sf1_top${Top15.size}","unit":"sec","sf1_dir":"$sf1Dir",""" +
      s""""total_sf01":${rows.map(_._2).sum},"total_sf1":${rows.map(_._3).sum},""" +
      s""""queries":{$qs}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"tools/bench_sf1_top${Top15.size}.json"),
      json + "\n")
    spark.stop()
  }
}
