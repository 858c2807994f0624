package graft.similarity

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import IvfIndex.Model

/** Persisted IVF index artifacts: the centroid model (text) plus the
  * assigned, norm-precomputed corpus table (parquet), fit ONCE per corpus
  * version and loaded on every later query — the FAISS-style
  * index-next-to-corpus shape. Without this, every ANN query re-paid the
  * sampled fit and the full assign pass (it was the slowest query in the
  * round-1 bench).
  *
  * The version key covers the embeddings corpus identity — the sorted
  * LEAF part-file statuses (name, size, mtime), not the top-level file's —
  * and the fit parameters, so a corpus rewrite or parameter change
  * transparently produces a fresh artifact even when the rewrite keeps
  * part-file names. Centroids roundtrip through
  * `Double.toString`/`parseDouble` (exact), so a loaded model reproduces
  * the fit model's search results bit-for-bit.
  */
object IvfStore {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def storeRoot: File = new File(
    sys.env.getOrElse("GRAFT_STORE_DIR",
      System.getProperty("java.io.tmpdir") + "/graft_store"), "ivf")

  /** Leaf-file statuses under `f` (relative path, size, mtime), sorted —
    * the corpus identity. Keying on the TOP-LEVEL File alone is wrong for
    * the production shape (a Spark-written parquet DIRECTORY): a directory's
    * length is filesystem-constant and its mtime only changes when direct
    * entries are added/removed, so a corpus rewrite that keeps part-file
    * names would silently serve a stale index. Part-file mtimes always
    * change on rewrite. */
  private def leafStats(root: File): Seq[String] = {
    def walk(f: File, rel: String): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .sortBy(_.getName).flatMap(c => walk(c, s"$rel/${c.getName}"))
      else Seq(s"$rel:${f.length}:${f.lastModified}")
    walk(root, "")
  }

  private def corpusKey(dir: String, k: Int, iters: Int, sampleSize: Int): String = {
    val f = new File(dir, "embeddings.parquet")
    md5hex((f.getAbsolutePath +: leafStats(f) :+ Seq(k, iters, sampleSize)
      .mkString("|")).mkString("|"))
  }

  private def saveModel(m: Model, f: File): Unit =
    Files.writeString(f.toPath,
      m.centroids.map(_.map(java.lang.Double.toString).mkString(","))
        .mkString("\n"))

  private def loadModel(f: File): Model =
    Model(Files.readString(f.toPath).split("\n")
      .map(_.split(",").map(java.lang.Double.parseDouble)))

  /** Fit-or-load for `dir`'s embeddings table. First call per corpus
    * version fits (one bounded sample collect) and writes the artifact;
    * every later call just reads the model file and the index parquet.
    *
    * Concurrency: the artifact is built in a process-unique staging
    * directory and published with one atomic rename — concurrent first
    * callers race benignly (the loser's identical artifact is discarded),
    * and a reader can never observe a half-written index. Version-key
    * caveat: leaf (size, mtime) stats — an in-place rewrite of the SAME
    * leaf files within the filesystem's mtime resolution AND with
    * identical byte lengths would serve the previous index; pass an
    * explicit corpus commit id through the path for stores that need
    * stronger guarantees. */
  def indexFor(s: SparkSession, dir: String, k: Int, iters: Int,
               sampleSize: Int = 2048): (Model, DataFrame) = {
    val d = new File(storeRoot, corpusKey(dir, k, iters, sampleSize))
    if (!new File(d, "centroids.txt").exists()) {
      val staging = new File(d.getParentFile,
        s"${d.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      staging.mkdirs()
      val emb = Tables(s, dir, "embeddings")
      val model = IvfIndex.fitSample(emb, k, iters, sampleSize)
      IvfIndex.withNorm(IvfIndex.assign(emb, model))
        .write.mode("overwrite")
        .parquet(new File(staging, "index.parquet").getAbsolutePath)
      saveModel(model, new File(staging, "centroids.txt"))
      def rm(f: File): Unit = graft.load.Scratch.rm(f)
      // atomic publish. A rename blocked by a COMPLETE destination means a
      // concurrent winner published an equivalent artifact — discard ours.
      // A rename blocked by an INCOMPLETE destination (torn leftover from
      // an older layout/crash) must not discard the good build: clear the
      // wreck and retry.
      if (!staging.renameTo(d)) {
        if (new File(d, "centroids.txt").exists()) rm(staging)
        else {
          rm(d)
          if (!staging.renameTo(d)) {
            rm(staging)
            throw new IllegalStateException(
              s"could not publish IVF artifact at $d")
          }
        }
      }
    }
    (loadModel(new File(d, "centroids.txt")),
      s.read.parquet(new File(d, "index.parquet").getAbsolutePath))
  }
}
