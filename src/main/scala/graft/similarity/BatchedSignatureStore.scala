package graft.similarity

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Shared scaffolding for the incremental dedup indexes: a persisted
  * table of per-survivor signature rows, written as committed batch
  * directories (`b=N`, `_SUCCESS`-gated via CommittedDirs) with
  * consolidation. The acceptance logic lives in the subclasses; the
  * storage, visibility and compaction rules live once, here.
  */
abstract class BatchedSignatureStore(spark: SparkSession, path: String) {

  /** Row schema of one signature. */
  protected def schema: StructType

  private val fs = new java.io.File(path)

  protected def batches: Seq[Int] = graft.load.CommittedDirs.list(fs, "b=")

  /** The standing signature table (empty-schema DF for a fresh index). */
  def table: DataFrame =
    if (batches.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(batches.map(b => s"$path/b=$b"): _*)

  def size: Long = table.count()

  /** Append one committed batch of survivor rows (no-op when empty). */
  protected def append(survivors: DataFrame, nAdded: Long): Unit =
    if (nAdded > 0) {
      val next = batches.lastOption.getOrElse(-1) + 1
      survivors.select(schema.fieldNames.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/b=$next")
    }

  /** Rewrite all committed batches into one directory — after many small
    * ingests the per-batch layout pays a directory listing and file-open
    * per batch on every read. Crash-safe: the consolidated batch commits
    * (via _SUCCESS) before old directories are removed, and transiently
    * duplicated signatures can only re-drop incoming dups, never admit a
    * row that should have been dropped. */
  def compact(): Int = {
    val bs = batches
    if (bs.length > 1) {
      val next = bs.last + 1
      table.select(schema.fieldNames.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/b=$next")
      bs.foreach { b =>
        val d = new java.io.File(s"$path/b=$b")
        Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
      }
    }
    batches.length
  }
}
