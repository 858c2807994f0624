package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end graph analysis (`sbt "runMain graft.GraphDemo"`):
  * the graph half of the engine chained the way a data-curation pipeline
  * runs it, with each stage's invariants asserted —
  *
  *   co-purchase edges → triangle census + assortativity →
  *   3-core peel (fringe filter) → PageRank over the core →
  *   duplicate-group components → deterministic random-walk corpus
  *   (validated edge-by-edge).
  *
  * CorpusDemo exercises the text/training-data half; EtlDemo the
  * harvest→KG lifecycle; this demo exercises the graph census family.
  */
object GraphDemo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. the co-purchase graph (parts sharing an order, sampled baskets)
    val edges = queries.Graph.coPurchaseEdges(spark, sf).localCheckpoint()
    val nEdges = edges.count()
    require(nEdges > 0, "empty co-purchase graph")

    // 2. census: triangles + transitivity + assortativity
    val census = operators.Triangles.count(
      edges.select(col("u").as("a"), col("v").as("b"))).head()
    val (nNodes, nE, nWedges, nTri, clustering) =
      (census.getLong(0), census.getLong(1), census.getLong(2),
        census.getLong(3), census.getDouble(4))
    require(nE == nEdges, s"census edges $nE != $nEdges")
    require(nWedges >= 3 * nTri,
      s"every triangle closes 3 wedges: $nWedges < 3*$nTri")
    require(clustering >= 0.0 && clustering <= 1.0, s"clustering $clustering")
    val assort = queries.Graph.assortativityQ(spark, sf)
      .head().getDouble(1)
    require(assort >= -1.0 && assort <= 1.0, s"assortativity $assort")

    // 3. fringe filter: 3 peel rounds toward the 3-core — node and edge
    // counts must be non-increasing (peeling never adds anything)
    val peel = queries.Graph.kCoreQ(spark, sf)
      .orderBy("round").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    require(peel.length == 3)
    peel.sliding(2).foreach { case Array((n1, e1), (n2, e2)) =>
      require(n2 <= n1 && e2 <= e1, s"peel grew: ($n1,$e1) -> ($n2,$e2)")
    }
    val (coreNodes, coreEdges) = peel.last
    require(coreNodes > 0, "3 peels emptied the demo graph")

    // 4. PageRank over the (directed-doubled) graph: every node ranked,
    // hubs strictly outrank the minimum
    val pr = operators.PageRank.run(
      edges.select(col("u").cast("string").as("src"),
          col("v").cast("string").as("dst"))
        .unionAll(edges.select(col("v").cast("string").as("src"),
          col("u").cast("string").as("dst"))), iters = 3)
      .localCheckpoint()
    require(pr.count() == nNodes, "PageRank must rank every node")
    val (prMin, prMax) = {
      val r = pr.agg(min("rank_fp"), max("rank_fp")).head()
      (r.getLong(0), r.getLong(1))
    }
    require(prMax > prMin, "degenerate rank distribution")

    // 4b. convergence mode on the same graph: run to a 1%-of-uniform
    // tolerance and confirm the terminated table IS the fixed-round one
    // at the iterations it took (the spec's equality law, exercised on
    // the demo path too)
    val doubled = edges.select(col("u").cast("string").as("src"),
        col("v").cast("string").as("dst"))
      .unionAll(edges.select(col("v").cast("string").as("src"),
        col("u").cast("string").as("dst")))
    val (prConv, prIters) = operators.PageRank.runUntilConverged(doubled,
      epsilonFp = math.max(1L, operators.PageRank.Scale / nNodes / 100),
      maxIters = 40, checkEvery = 4)
    val convMap = prConv.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fixedMap = operators.PageRank.run(doubled, prIters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(convMap == fixedMap,
      s"convergence-mode ranks diverge from fixed-round at $prIters iters")

    // 5. duplicate-group components over the co-purchase edges
    val comps = operators.ConnectedComponents(
      edges.select(col("u").as("a"), col("v").as("b"))).localCheckpoint()
    val nComps = comps.select("component").distinct().count()
    require(nComps >= 1 && nComps <= nNodes)

    // 6. random-walk corpus, validated edge by edge: every consecutive
    // (step t, step t+1) pair must be a real edge of the doubled graph
    val walks = queries.Graph.randomWalksQ(spark, sf).localCheckpoint()
    val nWalkRows = walks.count()
    require(nWalkRows == 100, s"expected 20x5 walk rows, got $nWalkRows")
    val hops = walks.as("a").join(walks.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("a.step") + 1 === col("b.step"))
      .select(col("a.node").as("x"), col("b.node").as("y"))
    val adj = edges.select(col("u").as("x"), col("v").as("y"))
      .unionAll(edges.select(col("v").as("x"), col("u").as("y")))
    val badHops = hops.join(adj, Seq("x", "y"), "left_anti").count()
    require(badHops == 0, s"$badHops walk hops are not graph edges")

    println(s"[graph] $nNodes nodes / $nEdges edges → " +
      f"$nTri triangles (transitivity $clustering%.4f), " +
      f"assortativity $assort%.4f → 3-core after 3 peels: " +
      s"$coreNodes nodes / $coreEdges edges → PageRank spread " +
      s"[$prMin, $prMax] (converged in $prIters rounds, == fixed-round) → " +
      s"$nComps components → 80 validated walk hops over 20 walks")
    spark.stop()
  }
}
