package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared plan-introspection helpers for the specs/probes that assert on
  * EXECUTED plans: AQE hides finished stages inside QueryStageExec nodes
  * whose subtree is not in `.children`, so a naive tree walk reports zero
  * scans — every consumer must unwrap the same three wrappers, and a
  * future Spark bump changes the unwrapping in ONE place here. */
object PlanWalk {

  /** Every node of the FINAL executed plan, unwrapping AQE stage nodes
    * and reused exchanges. */
  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: QueryStageExec => walk(q.plan)
    case r: ReusedExchangeExec => walk(r.child)
    case other => Seq(other) ++ other.children.flatMap(walk)
  }

  /** Sum of the `numFiles` metric over every file scan in `df`'s executed
    * plan — call AFTER an action on `df` itself (executing a derived
    * plan, e.g. `df.count()`, populates different metric objects). */
  def filesRead(df: DataFrame): Long =
    walk(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }
      .sum

  /** Sum of `numOutputRows` over every file scan in `df`'s executed
    * plan — the rows the scans actually MATERIALIZED after partition
    * pruning AND parquet row-group pruning (pushed literal predicates
    * against footer min/max stats). `numFiles` cannot see row-group
    * pruning: a pushed filter still opens each planned file's footer,
    * it just skips the data pages — so "did the within-bucket subject
    * sort prune" is a rows question, not a files question. */
  def scanOutputRows(df: DataFrame): Long =
    walk(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
      .sum

  /** Parquet data files under `f`, recursively. */
  def countParquet(f: java.io.File): Long =
    if (f.isFile) { if (f.getName.endsWith(".parquet")) 1L else 0L }
    else Option(f.listFiles()).map(_.map(countParquet).sum).getOrElse(0L)
}
