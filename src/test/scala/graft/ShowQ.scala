package graft

import org.apache.spark.sql.SparkSession

/** Print the full result of named SparkEntry queries — the quickest way
  * to eyeball a graded row's VALUES while tuning an instrument (DriftTwin
  * only times/counts). Usage:
  *   sbt 'Test/runMain graft.ShowQ q_recall_at_cap [sfDir]'
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg"))
    val sfDir = args.drop(1).headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"== $name @ $sfDir ==")
      SparkEntry.queries(name)(spark, sfDir).show(100, truncate = false)
    }
    spark.stop()
  }
}
