package graft

import org.apache.spark.sql.SparkSession

/** r16 anti-scaling profiler (guide §1/§2.2): the r15 driver measured the
  * whole suite 1.31x slower at local[32] than local[8] at sf0.1. This
  * runner times the full suite in a Bench-identical session at
  * $SPARK_GRAFT_CPUS and prints, per block: wall seconds, GC milliseconds
  * (all collectors), and the Spark scheduler's job/stage/task counts — so
  * the 32-core overhead can be attributed (GC pressure vs task-count
  * scheduling vs something else) instead of guessed.
  * Usage: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.ScaleProf [blocks]'
  */
object ScaleProf {
  def main(args: Array[String]): Unit = {
    val blocks = args.headOption.map(_.toInt).getOrElse(2)
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val tracker = spark.sparkContext.statusTracker

    def runBlock(label: String): Unit = {
      val g0 = gcMs(); val t0 = System.nanoTime()
      val j0 = tracker.getJobIdsForGroup(null).length
      var slowest = List.empty[(String, Double)]
      names.foreach { name =>
        val q0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[scaleprof] $name FAILED: ${e.getMessage}") }
        val dq = (System.nanoTime() - q0) / 1e9
        slowest = ((name, dq) :: slowest).sortBy(-_._2).take(10)
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(r => Option(r.name).exists(_.startsWith("graft.memo.")))
          .foreach(_.unpersist(false))
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val gc = gcMs() - g0
      val jobs = tracker.getJobIdsForGroup(null).length - j0
      println(f"[scaleprof] $label cpus=$cpus wall=$wall%7.2f s gc=${gc / 1000.0}%6.2f s " +
        f"(${100.0 * gc / 1000.0 / wall}%4.1f%%) jobs=$jobs")
      println("[scaleprof]   slowest: " + slowest.map { case (n, t) =>
        f"$n=$t%.2f" }.mkString(" "))
    }

    runBlock("warmup")
    (1 to blocks).foreach(b => runBlock(s"block$b"))
    spark.stop()
  }
}
