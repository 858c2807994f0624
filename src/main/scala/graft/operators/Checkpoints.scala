package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Block-storage hygiene for `localCheckpoint`ed DataFrames on
  * LONG-LIVED sessions. A local checkpoint eagerly persists the
  * underlying RDD (it is not registered with the CacheManager, so
  * `Dataset.unpersist` can't see it), and the blocks live until the
  * session ends — fine inside a one-shot query, an unbounded leak in a
  * production pipeline that calls index ingests/sweeps or iterative
  * operators thousands of times per session: at 100 TB every batch pins
  * megabytes of executor storage memory forever, and storage-evicted
  * executors start recomputing or OOMing long before the job is done.
  * (The same defect class as the PageRank convergence-loop leak fixed
  * in round 9 — this is that fix made reusable.) */
private[graft] object Checkpoints {

  /** Unpersist the block storage behind a `localCheckpoint`ed
    * DataFrame. The blocks are freed through the `LogicalRDD` the
    * checkpoint left as the plan root; safe no-op on any other plan
    * shape. The freed table must never be read again — local-checkpoint
    * blocks are the ONLY copy of its data. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Run `f`, then unpersist every RDD newly persisted during it.
    * For mutators whose results are durably written (the index stores'
    * parquet batch dirs) and whose return value is a plain scalar —
    * every intermediate checkpoint is dead the moment the write action
    * completes, so the whole delta can be freed wholesale. NOT for
    * methods returning a lazy plan over data checkpointed inside.
    * Assumes no CONCURRENT persist activity on the session (the
    * single-writer-per-index contract the stores already require);
    * a foreign RDD persisted mid-scope by another thread would be
    * freed with the rest. */
  def freeingNew[T](spark: SparkSession)(f: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = f
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before(id)) rdd.unpersist(blocking = false)
    }
    out
  }
}
