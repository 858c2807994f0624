package graft.similarity

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Shared scaffolding for the incremental dedup indexes: a persisted
  * table of per-survivor signature rows, written as committed batch
  * directories (`b=N`, `_SUCCESS`-gated via CommittedDirs) with
  * consolidation. The acceptance logic lives in the subclasses; the
  * storage, visibility and compaction rules live once, here.
  *
  * Concurrency contract: INGESTS serialize — each runs as a
  * [[serialized]] mutation (batch set pinned once, commit to the pinned
  * next id, lost races collide on the rename and re-run acceptance
  * against the winner's state), so two concurrent ingests land as some
  * serial order with full cross-batch dedup (StoreConcurrencySpec).
  * Compaction, sweeps and generation maintenance remain SINGLE-OWNER:
  * they renumber or rewrite batch dirs, which no concurrent pin can
  * survive — run them from one owner on the compaction cadence (the
  * same split the TripletStore multi-writer demo documents).
  */
abstract class BatchedSignatureStore(spark: SparkSession, path: String) {

  /** Row schema of one signature. */
  protected def schema: StructType

  private val fs = new java.io.File(path)

  /** Root the batch dirs live under. Defaults to the store path;
    * subclasses with swap/versioning semantics ([[VectorIndex]]'s
    * `g=N` generations) point this at the ACTIVE generation — every
    * batch/compaction accessor resolves through it, so a generation
    * swap atomically retargets reads, appends and compaction. */
  protected def storageRoot: java.io.File = fs

  private def pendingMarker =
    new java.io.File(storageRoot, "_COMPACT_PENDING")
  recoverCompaction()

  /** The batch set a [[serialized]] mutation on THIS thread pinned at
    * its start — [[batches]] (and through it [[table]], [[size]] and
    * [[append]]'s commit target) all resolve through the pin, so the
    * whole mutation reads one snapshot and commits to `pin.max + 1`.
    * Batch ids are dense, so an interleaved commit owns that id first
    * and the rename COLLIDES (the TripletStore v0-pin discipline) —
    * never an acceptance computed against a stale snapshot landing
    * silently. */
  private val pinned = new ThreadLocal[Seq[Int]]

  protected def batches: Seq[Int] = {
    val p = pinned.get()
    if (p != null) p
    else graft.load.CommittedDirs.list(storageRoot, "b=")
  }

  /** Run `body` as ONE serialized mutation: pin the committed batch set,
    * compute and commit against it, and on a lost commit race
    * (ConcurrentModificationException from the rename) re-run the whole
    * body against the new state — the ingest twin of
    * [[graft.load.TripletStore.mergeWithRetry]]. Two concurrent ingests
    * therefore SERIALIZE: the loser's acceptance re-runs over the
    * winner's survivors, so cross-batch duplicates are caught whichever
    * order the commits land. Compaction / sweeps remain single-owner by
    * contract (the multi-writer rule the TripletStore demo documents):
    * they renumber batches, which no pin can survive. */
  protected def serialized[T](body: => T): T = {
    var attempts = 0
    while (true) {
      pinned.set(graft.load.CommittedDirs.list(storageRoot, "b="))
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts > BatchedSignatureStore.MaxIngestRetries) throw e
      } finally pinned.remove()
    }
    throw new IllegalStateException("unreachable")
  }

  private def rmTree(f: java.io.File): Unit = graft.load.Scratch.rm(f)

  /** All `b=N` dirs (committed or torn) with id < `next`. */
  private def dirsBelow(next: Int): Seq[java.io.File] =
    Option(storageRoot.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b=") &&
        f.getName.drop(2).toIntOption.exists(_ < next))

  /** Finish or roll back a compaction interrupted by a crash: the marker
    * (written before the consolidated batch) names the target id. If that
    * batch committed, the old dirs are permanent duplicates — finish the
    * cleanup; if it did not, remove the torn write and let the old batches
    * stand. Runs once, at construction (single-writer store). */
  private def recoverCompaction(): Unit =
    if (pendingMarker.exists()) {
      new String(java.nio.file.Files.readAllBytes(pendingMarker.toPath),
        "UTF-8").trim.toIntOption.foreach { next =>
        if (new java.io.File(new java.io.File(storageRoot, s"b=$next"),
            "_SUCCESS").exists())
          dirsBelow(next).foreach(rmTree)
        else rmTree(new java.io.File(storageRoot, s"b=$next"))
      }
      pendingMarker.delete()
    }

  /** The standing signature table (empty-schema DF for a fresh index). */
  def table: DataFrame =
    if (batches.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(
      batches.map(b => s"${storageRoot.getPath}/b=$b"): _*)

  def size: Long = table.count()

  /** Append one committed batch via the shared rename-commit protocol
    * ([[graft.load.AtomicDirCommit]]); no-op when empty. Inside a
    * [[serialized]] mutation the commit target comes from the PIN, so
    * any commit interleaved since the pin collides on the rename and
    * throws ConcurrentModificationException — which [[serialized]]
    * turns into a full acceptance re-run against the new state. */
  protected def append(survivors: DataFrame, nAdded: Long): Unit =
    if (nAdded > 0) {
      val root = storageRoot
      val next = batches.lastOption.getOrElse(-1) + 1
      val tmp = graft.load.AtomicDirCommit.tmpFor(root, s"b$next")
      survivors.select(schema.fieldNames.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      graft.load.AtomicDirCommit.commit(tmp, new java.io.File(root, s"b=$next"))
    }

  /** Rewrite all committed batches into one directory — after many small
    * ingests the per-batch layout pays a directory listing and file-open
    * per batch on every read. Crash-safe in both directions: the pending
    * marker is written FIRST, so a crash after the consolidated commit but
    * before old-dir removal is finished by [[recoverCompaction]] (without
    * it, every signature row would stay duplicated forever — acceptance
    * still correct, but size() and later compactions wrong); a crash
    * before the commit is rolled back. dropDuplicates heals any
    * duplication a pre-recovery reader-instance crash left behind. */
  def compact(): Int = {
    val root = storageRoot
    val bs = batches
    if (bs.length > 1) {
      val next = bs.last + 1
      java.nio.file.Files.write(pendingMarker.toPath,
        String.valueOf(next).getBytes("UTF-8"))
      table.dropDuplicates(schema.fieldNames.toIndexedSeq)
        .select(schema.fieldNames.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"${root.getPath}/b=$next")
      bs.foreach(b => rmTree(new java.io.File(s"${root.getPath}/b=$b")))
      pendingMarker.delete()
    }
    graft.load.AtomicDirCommit.sweepTmp(root,
      graft.load.TripletStore.TmpSweepAgeMs)
    batches.length
  }

  /** Replace the store's contents with `rows` (same schema) as ONE
    * consolidated batch — the eviction write path (a sweep that drops
    * rows, unlike [[compact]] which only consolidates). Crash-safe by
    * the same marker protocol: marker first, then the committed
    * consolidated write (its plan may still READ the old batch dirs —
    * the target is a different dir, so the scan is safe), then old-dir
    * removal; a crash after the commit is finished by
    * [[recoverCompaction]], a crash before it is rolled back. */
  protected def rewriteAll(rows: DataFrame): Unit = {
    val root = storageRoot
    val bs = batches
    if (bs.nonEmpty) {
      val next = bs.last + 1
      java.nio.file.Files.write(pendingMarker.toPath,
        String.valueOf(next).getBytes("UTF-8"))
      rows.select(schema.fieldNames.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"${root.getPath}/b=$next")
      bs.foreach(b => rmTree(new java.io.File(s"${root.getPath}/b=$b")))
      pendingMarker.delete()
    }
  }
}

object BatchedSignatureStore {

  /** Lost-race retry bound for [[BatchedSignatureStore.serialized]] —
    * each retry means another writer committed first, so the bound only
    * trips under pathological contention. */
  val MaxIngestRetries = 8

  /** Result of a full-recall dedup SWEEP over a standing index — the
    * compact-thorough half of the ingest-fast / compact-thorough split
    * every conservatively-capped intake pairs with
    * ([[MediaDedupIndex.sweep]], [[SemanticDedupIndex.sweep]]). */
  case class SweepStats(nBefore: Long, nKept: Long, nEvicted: Long)
}
