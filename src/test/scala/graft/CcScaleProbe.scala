package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ConnectedComponents scaling probe: measured rounds + wall time on the
  * graph shapes that bound the algorithm —
  *
  *  - CHAIN (pathological depth: a single path of n nodes is the
  *    worst case for star-contraction; rounds should grow ~log n)
  *  - CLIQUES (the realistic near-dup shape: many small dense groups;
  *    rounds should be flat ~2-3 regardless of graph size)
  *  - RANDOM (sparse Erdős–Rényi-ish: supercritical giant component)
  *
  * Run: sbt "Test/runMain graft.CcScaleProbe" — numbers go to SCALE.md.
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(label: String, edges: org.apache.spark.sql.DataFrame,
            expectComponents: Long): Unit = {
      val t0 = System.nanoTime()
      val (comp, rounds) = operators.ConnectedComponents
        .applyWithRounds(edges.toDF("a", "b"))
      val n = comp.select("component").distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cc] $label%-28s rounds=$rounds%2d components=$n%7d dt=$dt%6.2fs")
      require(n == expectComponents, s"$label: $n != $expectComponents")
    }

    for (n <- Seq(1000L, 10000L, 100000L)) {
      val chain = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
      run(s"chain n=$n", chain, 1L)
    }
    // 20k cliques of 5 (100k nodes): the near-dup group shape
    val cliques = spark.range(100000)
      .select(col("id").as("a"), (col("id") - col("id") % 5).as("b"))
      .filter(col("a") =!= col("b"))
    run("cliques 20k x 5", cliques, 20000L)
    // sparse random: 100k nodes, 150k hash-derived edges (deterministic)
    val rnd = spark.range(150000).select(
      (abs(xxhash64(col("id"), lit("a"))) % 100000).as("a"),
      (abs(xxhash64(col("id"), lit("b"))) % 100000).as("b"))
    val nComp = {
      // oracle-free expected count: compute once with the engine itself,
      // then only pin determinism across the second run
      val (c, _) = operators.ConnectedComponents.applyWithRounds(rnd.toDF("a", "b"))
      c.select("component").distinct().count()
    }
    run("random 100k nodes 150k edges", rnd, nComp)
    spark.stop()
  }
}
