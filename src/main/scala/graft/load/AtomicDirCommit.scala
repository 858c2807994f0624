package graft.load

import java.io.File

/** Directory-rename commit protocol shared by the engine's file-backed
  * stores ([[TripletStore]] versions, `BatchedSignatureStore` batches):
  * the writer materializes its output in a process-unique `.tmp-` dir
  * (which carries the parquet `_SUCCESS` before any rename) and commits
  * with ONE atomic rename to the versioned name.
  *
  * Guarantees:
  *  - two writers racing the same version: exactly one rename wins; the
  *    loser throws `ConcurrentModificationException` and removes its
  *    temp — never a silent overwrite (the pre-rename layout committed
  *    with `SaveMode.Overwrite` straight to the target, so the loser's
  *    or even BOTH writers' rows could vanish);
  *  - a crash at any point leaves only `.tmp-` garbage invisible to
  *    readers (sweep with [[sweepTmp]] from the store's compaction); a
  *    torn committed dir cannot arise from this writer;
  *  - a rename target WITHOUT `_SUCCESS` cannot come from this protocol
  *    (renames move whole committed dirs) — it is a pre-rename-layout
  *    writer's torn leftover or tampering, so it is swept and the
  *    commit retried once, preserving torn-dir self-healing.
  */
object AtomicDirCommit {

  /** Process-unique temp sibling for `target` (same parent, so the
    * rename is a same-filesystem atomic move). */
  def tmpFor(root: File, name: String): File =
    new File(root,
      s".tmp-$name-${java.util.UUID.randomUUID().toString.take(8)}")

  /** Commit `tmp` as `target` per the protocol above. */
  def commit(tmp: File, target: File): Unit = {
    def rename(): Unit =
      java.nio.file.Files.move(tmp.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    def lostRace(e: Throwable): Nothing = {
      Scratch.rm(tmp)
      throw new java.util.ConcurrentModificationException(
        s"lost the commit race for ${target.getName} at " +
          s"${target.getParent} (another writer committed it first): " +
          s"re-read the store and retry against the new state ($e)")
    }
    try rename()
    catch {
      case e: java.nio.file.FileSystemException =>
        if (new File(target, "_SUCCESS").exists()) lostRace(e)
        Scratch.rm(target)
        try rename()
        catch { case e2: java.nio.file.FileSystemException => lostRace(e2) }
    }
  }

  /** Remove dead writers' `.tmp-` dirs under `root`: a LIVE writer's
    * temp has a fresh mtime (every landing part file touches it), so
    * anything older than `ageMs` belongs to a process that will never
    * rename it. Call from the store's compaction. */
  def sweepTmp(root: File, ageMs: Long): Unit =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(".tmp-") &&
        System.currentTimeMillis() - f.lastModified() > ageMs)
      .foreach(Scratch.rm)
}
