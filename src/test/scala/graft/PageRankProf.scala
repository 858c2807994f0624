package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization probe: where q_pagerank's time goes — edge
  * derivation (union+distinct over orders+lineitem) vs the 3 iteration
  * rounds, and whether materializing the static tables (edges, degree)
  * once changes the wall clock (guide §2.4/§5: iterative reuse). */
object PageRankProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def edges(s: SparkSession) = {
      val c2o = Tables(s, sfDir, "orders").select(
        concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("o"), col("o_orderkey").cast("string")).as("dst"))
      val o2p = Tables(s, sfDir, "lineitem").select(
        concat(lit("o"), col("l_orderkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      c2o.unionByName(o2p).distinct()
    }
    (1 to 2).foreach { round =>
      time(s"r$round edges noop")(
        edges(spark).write.format("noop").mode("overwrite").save())
      time(s"r$round run lazy edges")(
        graft.operators.PageRank.run(edges(spark), iters = 3).count())
      time(s"r$round run ck'd edges") {
        val e = edges(spark).localCheckpoint()
        val n = graft.operators.PageRank.run(e, iters = 3).count()
        graft.operators.Checkpoints.free(e)
        n
      }
      time(s"r$round run ck every round") {
        // runUntilConverged checkpoints ranks EVERY round and is
        // spec-pinned bit-identical to run(edges, itersTaken); with
        // maxIters=3 and a high epsilon-check cadence this times the
        // flat-plan variant of the same 3 rounds.
        graft.operators.PageRank.runUntilConverged(
          edges(spark), epsilonFp = 0L, maxIters = 3, checkEvery = 4)
          ._1.count()
      }
    }
    spark.stop()
  }
}
