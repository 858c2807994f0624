package graft.similarity

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import IvfIndex.Model

/** A loaded index artifact: the IVF centroid model, the SQ8/PQ codec
  * models fit over the same corpus version, the RESIDUAL-PQ model (fit
  * on v − centroid(cell) — FAISS IndexIVFPQ's encoding), the OPQ
  * dimension permutation with its permuted-space PQ model, and the
  * persisted index table (vec_id, v, cell, nrm, sq8_codes, sq8_dn,
  * pq_codes, pq_dn, pqr_codes, pqr_dn, opq_codes, opq_dn). */
final case class IvfArtifact(ivf: Model, sq8: Sq8Model, pq: PqModel,
                             pqr: PqModel, opq: Opq.Permutation,
                             pqo: PqModel, index: DataFrame)

/** Persisted IVF index artifacts: the centroid model (text) plus the
  * assigned, norm-precomputed corpus table (parquet), fit ONCE per corpus
  * version and loaded on every later query — the FAISS-style
  * index-next-to-corpus shape. Without this, every ANN query re-paid the
  * sampled fit and the full assign pass (it was the slowest query in the
  * round-1 bench).
  *
  * Layout generation 2 additionally persists the compressed search
  * state AT BUILD TIME: the SQ8 and PQ codec models (text, exact
  * `Double.toString` roundtrip) and, per index row, the packed code
  * blobs (`sq8_codes` 1 byte/dim, `pq_codes` 1 byte/subspace — see
  * [[Codes]]) plus the reconstruction norms (`sq8_dn`, `pq_dn`). A
  * compressed-index search reads ONLY (vec_id, cell, codes, dn) — never
  * the raw vector column — so the corpus-side state a probe touches
  * shrinks 8× (SQ8) / 64× (PQ) on disk AND in the scan, not just in
  * prose. The raw `v` stays in the artifact for exact re-ranking and
  * full-precision IVF search; parquet column pruning keeps it out of
  * the compressed scans (PlanSpec pins the ReadSchema).
  *
  * The version key covers the embeddings corpus identity — the sorted
  * LEAF part-file statuses (name, size, mtime), not the top-level file's —
  * and the fit parameters plus the layout generation, so a corpus
  * rewrite, parameter change, or layout upgrade transparently produces
  * a fresh artifact even when the rewrite keeps part-file names.
  * Centroids roundtrip through `Double.toString`/`parseDouble` (exact),
  * so a loaded model reproduces the fit model's search results
  * bit-for-bit.
  */
object IvfStore {

  /** Artifact layout generation — bump when the persisted schema or the
    * codec fit recipe changes so stale artifacts are never served.
    * 2 = persisted SQ8/PQ codes + norms; 3 = + residual-PQ (IndexIVFPQ);
    * 4 = + metadata column (`label`) carried into the index row, so a
    * filtered search never has to join back to the raw corpus;
    * 5 = + OPQ (variance-balanced dimension permutation) codes + norms
    * and the permutation/permuted-PQ model files. */
  private val Layout = 5

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
    md5hex((f.getAbsolutePath +: leafStats(f)
      :+ Seq(k, iters, sampleSize, s"layout$Layout").mkString("|")).mkString("|"))
  }

  private def writeDoubleLines(rows: Seq[Array[Double]], f: File): Unit =
    Files.writeString(f.toPath,
      rows.map(_.map(java.lang.Double.toString).mkString(",")).mkString("\n"))

  private def readDoubleLines(f: File): Array[Array[Double]] =
    Files.readString(f.toPath).split("\n")
      .map(_.split(",").map(java.lang.Double.parseDouble))

  private def saveModel(m: Model, f: File): Unit =
    writeDoubleLines(m.centroids.toSeq, f)

  private def loadModel(f: File): Model = Model(readDoubleLines(f))

  /** SQ8 model: two lines (mins, maxs). */
  private def saveSq8(m: Sq8Model, f: File): Unit =
    writeDoubleLines(Seq(m.mins, m.maxs), f)

  private def loadSq8(f: File): Sq8Model = {
    val rows = readDoubleLines(f)
    Sq8Model(rows(0), rows(1))
  }

  /** PQ model: header line `m,k,subDim`, then m·k centroid lines in
    * (subspace, cell) order. */
  private def savePq(m: PqModel, f: File): Unit =
    Files.writeString(f.toPath,
      (s"${m.m},${m.k},${m.subDim}" +:
        m.sub.flatten.map(_.map(java.lang.Double.toString).mkString(","))
          .toSeq).mkString("\n"))

  private def loadPq(f: File): PqModel = {
    val lines = Files.readString(f.toPath).split("\n")
    val Array(m, k, _) = lines.head.split(",").map(_.toInt)
    val cents = lines.tail.map(_.split(",").map(java.lang.Double.parseDouble))
    PqModel(cents.grouped(k).toArray.ensuring(_.length == m))
  }

  /** OPQ permutation: one line of comma-separated 0-based dims (integer
    * text — exact roundtrip trivially). */
  private def saveOpq(p: Opq.Permutation, f: File): Unit =
    Files.writeString(f.toPath, p.perm.mkString(","))

  private def loadOpq(f: File): Opq.Permutation =
    Opq.Permutation(Files.readString(f.toPath).trim.split(",").map(_.toInt))

  /** Back-compat surface for raw-vector IVF search: (centroid model,
    * index table). */
  def indexFor(s: SparkSession, dir: String, k: Int, iters: Int,
               sampleSize: Int = 2048): (Model, DataFrame) = {
    val a = artifactFor(s, dir, k, iters, sampleSize)
    (a.ivf, a.index)
  }

  /** Fit-or-load for `dir`'s embeddings table. First call per corpus
    * version fits (bounded sample collects: IVF + m PQ subspaces, plus
    * the dim-row SQ8 min/max agg), encodes the corpus ONCE, and writes
    * the artifact; every later call just reads the model files and the
    * index parquet.
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
  def artifactFor(s: SparkSession, dir: String, k: Int, iters: Int,
                  sampleSize: Int = 2048): IvfArtifact = {
    val d = new File(storeRoot, corpusKey(dir, k, iters, sampleSize))
    if (!new File(d, "centroids.txt").exists()) {
      val staging = new File(d.getParentFile,
        s"${d.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      staging.mkdirs()
      val emb = Tables(s, dir, "embeddings")
      val model = IvfIndex.fitSample(emb, k, iters, sampleSize)
      val sq8 = Sq8.fit(emb)
      val pq = Pq.fit(emb.select(col("vec_id"), col("embedding")),
        sampleSize = sampleSize)
      // OPQ: the permutation fit shares the sample discipline; the
      // permuted-space PQ is a plain Pq.fit over the gathered column
      val opq = Opq.fitPermutation(
        emb.select(col("vec_id"), col("embedding")), sampleSize = sampleSize)
      val pqo = Pq.fit(
        emb.select(col("vec_id"),
          Opq.permute(opq)(col("embedding").cast("array<double>"))
            .as("embedding")),
        sampleSize = sampleSize)
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        graft.functions.GraftFunctions.dot_double(a, b)
      // the assigned corpus is the base for BOTH the raw index row and
      // the residual encoding (v − centroid(cell) — what IndexIVFPQ
      // actually codes); checkpointed so the residual FIT's bounded
      // sample and the encode pass read one materialization
      // metadata rides the index row (the production filtered-search
      // shape: predicate columns live NEXT to the codes, so a filtered
      // probe never joins back to the raw corpus)
      val assigned = IvfIndex.withNorm(IvfIndex.assign(emb, model))
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
        .localCheckpoint()
      val dim = model.centroids.head.length
      val ivfFlat = typedLit(model.centroids.flatten.toSeq)
      def centD(cell: org.apache.spark.sql.Column,
                d: org.apache.spark.sql.Column) =
        element_at(ivfFlat, cell * lit(dim) + d)
      val residual = transform(col("v"), (x, i) => x - centD(col("cell"), i + 1))
      val residuals = assigned
        .select(col("vec_id"), residual.as("embedding"), col("cell"))
      val pqr = Pq.fit(residuals.select(col("vec_id"), col("embedding")),
        sampleSize = sampleSize)
      // codes + reconstruction norms computed once at build time with the
      // SAME expressions the pre-persistence search evaluated per query,
      // so persisted state is bit-identical to the on-the-fly values.
      // pqr_dn is the norm of centroid + decoded residual — the full
      // reconstruction the ADC score dots against.
      assigned
        .withColumn("sq8_arr", Sq8.encode(sq8)(col("v")))
        .withColumn("sq8_dv", Sq8.decode(sq8)(col("sq8_arr")))
        .withColumn("pq_arr", Pq.encode(pq)(col("v")))
        .withColumn("pq_dv", Pq.decode(pq)(col("pq_arr")))
        .withColumn("pqr_arr", Pq.encode(pqr)(residual))
        .withColumn("pqr_dv",
          transform(Pq.decode(pqr)(col("pqr_arr")),
            (r, i) => centD(col("cell"), i + 1) + r))
        // OPQ rows stay in PERMUTED space end-to-end (codes, recon, norm):
        // the norm is permutation-invariant in value but NOT in fold
        // order, and the searches score in permuted space, so the
        // persisted dn must be the permuted-order fold
        .withColumn("opq_arr", Pq.encode(pqo)(Opq.permute(opq)(col("v"))))
        .withColumn("opq_dv", Pq.decode(pqo)(col("opq_arr")))
        .select(col("vec_id"), col("v"), col("cell"), col("nrm"), col("label"),
          Codes.pack(col("sq8_arr")).as("sq8_codes"),
          sqrt(dot(col("sq8_dv"), col("sq8_dv"))).as("sq8_dn"),
          Codes.pack(col("pq_arr")).as("pq_codes"),
          sqrt(dot(col("pq_dv"), col("pq_dv"))).as("pq_dn"),
          Codes.pack(col("pqr_arr")).as("pqr_codes"),
          sqrt(dot(col("pqr_dv"), col("pqr_dv"))).as("pqr_dn"),
          Codes.pack(col("opq_arr")).as("opq_codes"),
          sqrt(dot(col("opq_dv"), col("opq_dv"))).as("opq_dn"))
        .write.mode("overwrite")
        .parquet(new File(staging, "index.parquet").getAbsolutePath)
      saveModel(model, new File(staging, "centroids.txt"))
      saveSq8(sq8, new File(staging, "sq8.txt"))
      savePq(pq, new File(staging, "pq.txt"))
      savePq(pqr, new File(staging, "pqr.txt"))
      saveOpq(opq, new File(staging, "opq.txt"))
      savePq(pqo, new File(staging, "pqo.txt"))
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
    IvfArtifact(
      loadModel(new File(d, "centroids.txt")),
      loadSq8(new File(d, "sq8.txt")),
      loadPq(new File(d, "pq.txt")),
      loadPq(new File(d, "pqr.txt")),
      loadOpq(new File(d, "opq.txt")),
      loadPq(new File(d, "pqo.txt")),
      s.read.parquet(new File(d, "index.parquet").getAbsolutePath))
  }
}
