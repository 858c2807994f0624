package graft.load

import java.io.File

/** Shared scratch-directory helpers for the engine's temp-backed flows
  * (incremental dedup queries, store staging). One definition of the
  * recursive delete and of the process-unique naming scheme — md5 of the
  * logical key (collision-proof, unlike hashCode) plus a UUID suffix so
  * concurrent invocations can never clear each other's directory.
  */
object Scratch {

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Recursive delete; tolerates races and missing paths. */
  def rm(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  /** A fresh process-unique scratch dir under java.io.tmpdir. */
  def dir(prefix: String, key: String): File =
    new File(System.getProperty("java.io.tmpdir"),
      prefix + "_" + md5hex(key) + "_" +
        java.util.UUID.randomUUID().toString.take(8))

  /** Recursive driver-side copy of a COMMITTED directory tree — the
    * dir-level state-replication seam for instruments whose mutating
    * verbs continue from a session-shared store state (a store's layout
    * is self-contained: parquet + relative marker files, no absolute
    * paths), so a copy is byte-identical to the source it came from.
    * The source must be quiescent (no concurrent writer); KB-sized
    * fixture stores copy in milliseconds. */
  def copyDir(src: File, dst: File): Unit = {
    // fail fast, never silently copy "nothing": a missing/unreadable
    // source (e.g. a shared memoized store root swept externally between
    // its validity check and this copy) would otherwise hand the caller
    // an EMPTY replica and a wrong answer instead of a loud error
    require(src.isDirectory, s"copyDir source missing or not a directory: $src")
    dst.mkdirs()
    Option(src.listFiles()).getOrElse(Array.empty).foreach { f =>
      val t = new File(dst, f.getName)
      if (f.isDirectory) copyDir(f, t)
      else java.nio.file.Files.copy(f.toPath, t.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Run `body` with a fresh scratch dir, ALWAYS removing it afterwards —
    * a crashed run must not leak a uniquely-named directory forever.
    * Anything `body` returns must not read the directory lazily
    * (checkpoint DataFrames before returning). */
  def withScratch[T](prefix: String, key: String)(body: File => T): T = {
    val d = dir(prefix, key)
    try body(d) finally rm(d)
  }
}
