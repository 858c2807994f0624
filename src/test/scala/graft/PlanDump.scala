package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round instrument: dump `.explain("formatted")` for the
  * named SparkEntry queries to `plans/<tag>/<name>_<suffix>.txt`, in a
  * Bench-identical session, so plan-shape claims (Exchange count, join
  * strategy, PushedFilters/ReadSchema) are diffable before/after a
  * change. Usage:
  *   sbt 'Test/runMain graft.PlanDump q_a,q_b r15 before'
  *
  * Note: the imperative instrument queries (version family, index
  * intakes) return a localCheckpoint of their result — their top-level
  * plan is a bare `Scan ExistingRDD`, and building the DataFrame RUNS
  * the instrument; their interesting plans are internal. The dump is
  * still written (it proves that shape), but optimization evidence for
  * those lives in stage-level notes, not the top-level explain.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val tag = if (args.length > 1) args(1) else "r15"
    val suffix = if (args.length > 2) args(2) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt " +
        s"(${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
