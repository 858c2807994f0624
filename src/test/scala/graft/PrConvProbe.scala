package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-decade probe for PageRank CONVERGENCE mode
  * (`PageRank.runUntilConverged`): the same supercritical random
  * digraph family as SketchGraphScaleProbe's fixed-round arm, run to a
  * 1e-5-of-total-mass tolerance. What must hold: iterations-to-converge
  * is a property of the GRAPH (mixing), not its size — so wall scales
  * like (rounds × per-round cost) with per-round cost ~linear in edges,
  * and the one-row Δ aggregate every `checkEvery` rounds adds no
  * per-node driver traffic. Numbers go to SCALE.md.
  *
  * Run: sbt "Test/runMain graft.PrConvProbe [maxMult]"
  */
object PrConvProbe {
  def main(args: Array[String]): Unit = {
    val maxMult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = 100000L
    Seq(1, 10, 100).filter(_ <= maxMult).foreach { m =>
      val n = base * m
      val edges = spark.range(n).select(
        concat(lit("v"), pmod(xxhash64($"id", lit("s")), lit(n * 2 / 3))).as("src"),
        concat(lit("v"), pmod(xxhash64($"id", lit("d")), lit(n * 2 / 3))).as("dst"))
        .localCheckpoint()
      // tolerance RELATIVE to the uniform rank (1% of Scale/nodes):
      // per-node ranks shrink with n, so an absolute eps would declare
      // big graphs converged on round one
      val nNodes = n * 2 / 3
      val t0 = System.nanoTime()
      val (ranks, iters) = operators.PageRank.runUntilConverged(edges,
        epsilonFp = math.max(1L, operators.PageRank.Scale / nNodes / 100),
        maxIters = 60, checkEvery = 4)
      val cnt = ranks.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prconv] edges=$n%,12d mult=$m%3dx iters=$iters%2d " +
        f"dt=$dt%7.2fs perRound=${dt / iters}%5.2fs nodes=$cnt%,d")
    }
    spark.stop()
  }
}
