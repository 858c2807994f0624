package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree-ordered edge orientation —
  * the standard bound on the quadratic wedge blow-up (Suri & Vassilvitskii,
  * WWW 2011; Cohen's MapReduce formulation): orient every undirected edge
  * from its lower-(degree, id) endpoint to the higher one, so each
  * triangle is produced by exactly ONE wedge (at its lowest-ordered
  * corner) and a node's wedge fan-out is its OUT-degree, which the
  * orientation caps at O(√E) for any graph — a hub with a million
  * neighbors contributes no wedges at all unless both endpoints out-rank
  * it. Everything is equi-joins and aggregations: no windows, no
  * cartesian products, no driver-side state, so the shape survives a
  * 1000-executor shuffle unchanged.
  */
object Triangles {

  /** Count triangles of the undirected simple graph given as any (a, b)
    * pair table (duplicates, self-loops, and both directions tolerated —
    * normalized inside). Returns one summary row:
    * (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    * n_wedges = Σ deg·(deg−1)/2 over the UNDIRECTED degrees and
    * clustering = 3·triangles / wedges (the global transitivity). */
  def count(pairs: DataFrame): DataFrame = {
    val und = pairs.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      // two consumers below (degrees + orientation join) and the
      // triangle join reads the oriented table three times
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("dg"))
    val oriented = und
      .join(deg.select(col("id").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("dg").as("dv")), "v")
      // u < v by construction, so equal degrees orient u→v (id order)
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("src"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint()
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .join(oriented.as("e3"),
        col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"),
        "left_semi")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    val stats = und.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"),
        // dg·(dg−1) is even, so the per-node term is exact as a long;
        // `div` (integer division) keeps it in long arithmetic — `/`
        // would round-trip through double and lose exactness past 2^53
        sum(expr("dg * (dg - 1) div 2")).as("n_wedges")))
    // three one-row frames — the broadcast-cross the plan wants
    stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        // wedge-free graphs (e.g. a perfect matching) have transitivity 0
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
