package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What does Spark 4.1 actually PUSH for a k-literal `isin` over
  * parquet, and what does each form prune? Two write shapes (sorted;
  * sorted + subject bloom) × two probe shapes (clustered run;
  * scattered every-12th) × two pushdown paths:
  *
  *  - orTree:  session inFilterThreshold raised past k — Spark converts
  *             the In to a binary or-of-equals (measured cliff: task
  *             StackOverflowError in (1024, 1536]);
  *  - native:  threshold LEFT AT DEFAULT 10 — the above-threshold path,
  *             long documented in this repo as "collapses to min..max
  *             and prunes nothing", which the r14 store-f arm
  *             contradicted (a 5000-literal un-chunked In pruned).
  *
  * scanRows = rows the scan materialized after row-group pruning.
  * Run: sbt "Test/runMain graft.InPushProbe"; output committed as
  * tools/in_pushdown_r14.txt and decides TripletStore's literal-path
  * design (threshold raise + chunking vs native set push).
  */
object InPushProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = load.Scratch.dir("probe_inpush", "x")
    val total = 60000
    try {
      val df = spark.range(total)
        .select(format_string("http://m/%08d", col("id")).as("subject"),
          col("id").as("payload"))
      graft.sinks.Sinks.writeClustered(df, s"$root/plain", 200,
        300L, "subject")
      graft.sinks.Sinks.writeClusteredOpts(df, s"$root/bloom", 200,
        300L, Map("parquet.bloom.filter.enabled#subject" -> "true"),
        "subject")
      // present probes: clustered run from the middle; scattered uniform
      def clustered(k: Int) = (0 until k).map(i => f"http://m/${20000 + i}%08d")
      def scattered(k: Int) = (0 until k).map(i =>
        f"http://m/${(i.toLong * total / k).toInt}%08d")
      // absent probes (not in the table): what do stats/bloom drop?
      def absent(k: Int) = (0 until k).map(i => f"http://x/$i%08d")
      val thresholdKey = "spark.sql.parquet.pushdown.inFilterThreshold"
      for {
        (shape, mk) <- Seq(("clustered", clustered _),
          ("scattered", scattered _), ("absent", absent _))
        k <- Seq(100, 1024, 5000)
        (path, thr) <- Seq(("orTree", k + 1), ("native", 10))
        if !(path == "orTree" && k > 1024) // measured cliff: don't re-crash
        tbl <- Seq("plain", "bloom")
      } {
        spark.conf.set(thresholdKey, thr.toString)
        val probe = mk(k)
        val t0 = System.nanoTime()
        val res =
          try {
            val d = spark.read.parquet(s"$root/$tbl")
              .filter(col("subject").isin(probe: _*))
            val n = d.count()
            // count() prunes the payload read; run the filter df for
            // scan metrics through a collect on the real two-col scan
            val d2 = spark.read.parquet(s"$root/$tbl")
              .filter(col("subject").isin(probe: _*))
            d2.collect()
            f"ok rows=$n%5d scanRows=${PlanWalk.scanOutputRows(d2)}%6d"
          } catch {
            case e: Throwable =>
              val cause = Iterator.iterate(e)(_.getCause)
                .takeWhile(_ != null).toSeq.last
              s"FAIL ${cause.getClass.getSimpleName}"
          }
        println(f"[inpush] $shape%-9s k=$k%5d $path%-6s $tbl%-5s $res " +
          f"dt=${(System.nanoTime() - t0) / 1e9}%5.2fs")
      }
    } finally {
      load.Scratch.rm(root)
      spark.stop()
    }
  }
}
