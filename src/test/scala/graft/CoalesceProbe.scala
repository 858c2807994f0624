package graft

import org.apache.spark.sql.SparkSession

/** r16 anti-scaling probe (guide §2.2): the r15 driver measured the whole
  * suite 1.31x SLOWER at 32 cores than at 8 at sf0.1 — per-stage overhead
  * from tiny 32-way shuffles (AQE's default `parallelismFirst=true`
  * coalesces only down to the parallelism floor). This probe A/Bs the
  * byte-driven alternative the guide recommends (`parallelismFirst=false`:
  * coalesce to advisoryPartitionSizeInBytes — scale-adaptive: many
  * partitions at 100 TB, few at 17 MB) across several advisory sizes, in
  * ONE Bench-identical session, interleaved round-robin so host drift and
  * session memos cancel. Prints the biggest per-query wins AND losses of
  * each arm vs the default. Usage:
  *   sbt 'Test/runMain graft.CoalesceProbe [q_a,q_b|all] [blocksPerArm]'
  */
object CoalesceProbe {
  def main(args: Array[String]): Unit = {
    val names: Seq[String] = args.headOption match {
      case Some("all") | None => SparkEntry.queries.keys.toSeq.sorted
      case Some(s) => s.split(",").toSeq
    }
    val blocks = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "documents").count()
    val PF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

    // (label, minPartitionSize, advisory) — the 2m byte-floor arm shipped
    // mid-r16 and was then REVERTED after dedicated interleaved A/Bs
    // (tools/floor_ab_r16.json, tools/floor_full_ab_r16.json: net 1.015,
    // q_pagerank/q_containment 1.2-1.3x); earlier exploratory arms measured
    // parallelismFirst=false at advisory 64m/8m/2m (see OPTIMIZATION_r16.md)
    val arms = Seq(
      ("default", "1m", "64m"),
      ("floor2m", "2m", "64m"))

    def runBlock(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[coalesce] $name FAILED: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => Option(r.name).exists(_.startsWith("graft.memo.")))
        .foreach(_.unpersist(false))
      name -> dt
    }.toMap

    def load(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)

    // warmup block (memo construction + codegen) — discarded
    spark.conf.set(PF, "1m"); spark.conf.set(ADV, "64m")
    runBlock()
    val results = scala.collection.mutable.Map.empty[String, Vector[Map[String, Double]]]
      .withDefaultValue(Vector.empty)
    for (b <- 1 to blocks; (label, pf, adv) <- arms) {
      spark.conf.set(PF, pf); spark.conf.set(ADV, adv)
      println(s"[coalesce] block $b arm=$label load=${load()}")
      results(label) = results(label) :+ runBlock()
    }
    def minOf(arm: String, q: String): Double = results(arm).map(_(q)).min
    val base = names.map(q => q -> minOf("default", q)).toMap
    println(f"[coalesce] TOTAL default=${base.values.sum}%7.2f load=${load()}")
    for ((label, _, _) <- arms.drop(1)) {
      val rows = names.map(q => (q, base(q), minOf(label, q)))
      val tot = rows.map(_._3).sum
      println(f"[coalesce] TOTAL $label%-8s=${tot}%7.2f ratio=${tot / base.values.sum}%5.3f")
      val byDiff = rows.sortBy(r => r._2 - r._3)
      (byDiff.take(8) ++ byDiff.takeRight(8)).foreach { case (q, a, b) =>
        println(f"[coalesce]   $label%-8s $q%-28s def=$a%6.2f arm=$b%6.2f ratio=${b / a}%5.2f")
      }
    }
    spark.stop()
  }
}
