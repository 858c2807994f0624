package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative frontier expansion (A11 — the reference's BFS over
  * `fineTunedFrom` base models, `HFExtractor.py:46-135`): a driver loop of
  * DataFrame joins; the frontier and visited sets stay distributed — only
  * loop control lives on the driver. Each round: frontier ⋈ edges →
  * next frontier minus visited.
  *
  * At 100 TB scale the per-round joins shuffle on the node id; checkpoint
  * every few rounds would truncate lineage for deep traversals (depth here
  * mirrors the reference's default of 2).
  */
object Bfs {

  /** @param edges  (src, dst) edge table
    * @param seeds  single-column node table (column `id`)
    * @param depth  number of expansion rounds
    * @param broadcastFrontierRows  frontiers at or below this row count are
    *        broadcast, so the edge table is scanned but never SHUFFLED for
    *        the round (base-model frontiers are tiny vs the edge table);
    *        larger frontiers fall back to the sort-merge join. The default
    *        is conservative — ~100k URI strings is a few MB — because a
    *        broadcast is built on the driver and resident on every
    *        executor; a rows cap in the millions would risk driver OOM at
    *        exactly the scale the fast path serves
    * @return (id, depth) — every reached node with its first-seen depth
    */
  def expand(edges: DataFrame, seeds: DataFrame, depth: Int,
             broadcastFrontierRows: Long = 100000L): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    var visited = seeds.select(col("id"), lit(0).as("depth"))
    var frontier = seeds.select(col("id")).localCheckpoint()
    var frontierRows = frontier.count()
    var d = 0
    while (d < depth) {
      d += 1
      val fr = if (frontierRows <= broadcastFrontierRows) broadcast(frontier)
        else frontier
      val next = edges
        .join(fr, edges(src) === fr("id"))
        .select(edges(dst).as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .localCheckpoint() // truncate lineage; each round is one join deep
      frontierRows = next.count()
      if (frontierRows == 0) {
        d = depth
      } else {
        visited = visited.unionByName(next.withColumn("depth", lit(d)))
          .localCheckpoint()
        frontier = next
      }
    }
    visited
  }
}
