package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Locate the parquet In-pushdown OR-TREE recursion cliff (r13 ADVICE:
  * 1000 was measured safe and 5000 a task-killing StackOverflowError,
  * with the actual cliff between them unprobed while a guard sat at
  * 1024). For each candidate size k the probe pushes a k-literal `isin`
  * over a subject-sorted parquet table with the session threshold
  * raised past k — the pushed filter is then a binary or-of-equals
  * tree whose row-group evaluation recurses per value, so a too-deep
  * tree dies in the scan task (a StackOverflowError surfacing wrapped
  * in a MatchError), not at plan time. Run:
  *
  *   sbt "Test/runMain graft.PushdownCliffProbe"
  *
  * Measured (tools/pushdown_cliff_r14.txt): 1024 ok, 1536 overflow —
  * the cliff sits in (1024, 1536]. This is the evidence for why
  * [[graft.load.TripletStore]] no longer raises the session
  * inFilterThreshold AT ALL: the raise was what created the or-tree
  * (and its cliff) in the first place, while the default
  * above-threshold path pushes the In natively with no recursion — see
  * [[InPushProbe]] / tools/in_pushdown_r14.txt for that matrix.
  */
object PushdownCliffProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = load.Scratch.dir("probe_cliff", "x")
    try {
      // 60k subject-sorted rows, several row groups' worth of strings
      val df = spark.range(60000)
        .select(format_string("http://m/%08d", col("id")).as("subject"),
          col("id").as("payload"))
      graft.sinks.Sinks.writeClustered(df, root.getAbsolutePath, 4,
        1L << 20, "subject")
      Seq(512, 1024, 1536, 2048, 3072, 4096, 5000).foreach { k =>
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
          (k + 1).toString)
        val lits = (0 until k).map(i => f"http://m/${i * 7}%08d")
        val t0 = System.nanoTime()
        val res =
          try {
            val n = spark.read.parquet(root.getAbsolutePath)
              .filter(col("subject").isin(lits: _*)).count()
            f"ok     rows=$n%5d"
          } catch {
            case e: Throwable =>
              val cause = Iterator.iterate(e)(_.getCause)
                .takeWhile(_ != null).toSeq.last
              if (sys.env.contains("CLIFF_DEBUG")) cause.printStackTrace()
              s"FAIL   ${cause.getClass.getSimpleName}: " +
                String.valueOf(cause.getMessage).take(80)
          }
        println(f"[cliff] k=$k%5d $res dt=${(System.nanoTime() - t0) / 1e9}%5.2fs")
      }
    } finally {
      load.Scratch.rm(root)
      spark.stop()
    }
  }
}
