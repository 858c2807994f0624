package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted PQ state: per-subspace centroid tables
  * (`sub(s)(cell)(d)`, m subspaces × k cells × dim/m dims). */
final case class PqModel(sub: Array[Array[Array[Double]]]) {
  def m: Int = sub.length
  def k: Int = sub.head.length
  def subDim: Int = sub.head.head.length
  def dim: Int = m * subDim

  /** Centroids flattened (s, cell, d)-major — the plan-literal layout
    * [[Pq.decode]] slices; k·dim doubles total (1024 at the defaults). */
  def flat: Array[Double] = sub.flatten.flatten
}

/** Product quantization (Jégou et al. 2011) for embedding columns — the
  * aggressive end of the compression ladder next to [[Sq8]]: the vector
  * splits into m subspaces, each coded by its nearest per-subspace
  * centroid, so a 64-dim double vector stores as m = 8 small codes
  * (64× smaller than raw; SQ8 is 8×) and searches score queries against
  * per-subspace reconstructions (asymmetric distance).
  *
  * Deterministic end-to-end by the same recipe the IVF oracle already
  * replays bit-exactly: each subspace fit IS [[IvfIndex.fitSample]]
  * (sample = first `sampleSize` vectors by vec_id, seeds = first k,
  * Lloyd sums folded in vec_id order) over the sliced subvector column,
  * so an ANSI-SQL engine reproduces every centroid, code, and cosine
  * with NO tolerance.
  *
  * Scale shape: the fit is m bounded sample-collects (driver-side Lloyd,
  * never a full-corpus iteration); encode is one map stage (broadcast
  * centroid tables, same as IVF assign); decode/scoring is pure column
  * ops over a k·dim plan literal — no join, no shuffle, no UDF in the
  * scoring path.
  */
object Pq {

  /** Fit per-subspace centroid tables. m bounded sample collects — one
    * [[IvfIndex.fitSample]] per subspace over the sliced column. */
  def fit(emb: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 2,
          sampleSize: Int = 2048): PqModel = {
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % m == 0, s"Pq.fit: dim $dim not divisible by m=$m")
    val subDim = dim / m
    PqModel((0 until m).map { s =>
      IvfIndex.fitSample(
        emb.select(col("vec_id"),
          slice(col("embedding").cast("array<double>"),
            s * subDim + 1, subDim).as("embedding")),
        k, iters, sampleSize).centroids
    }.toArray)
  }

  /** array<double> vector → array<int> of m codes (nearest per-subspace
    * centroid, strict `<` tie-break to the lowest cell — identical to
    * [[IvfIndex]]'s assignment). Broadcast-table UDF like IVF assign:
    * encoding is the index-build stage, not the scoring hot path. */
  def encode(model: PqModel)(v: Column): Column = {
    val bc = model.sub // serialized into the UDF closure (k·dim doubles)
    val f = udf { (vec: Seq[Double]) =>
      val m = bc.length
      val subDim = bc.head.head.length
      Array.tabulate(m) { s =>
        val cents = bc(s)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d2 = 0.0
          var i = 0
          while (i < subDim) {
            val d = vec(s * subDim + i) - cents(c)(i); d2 += d * d; i += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        best
      }
    }
    f(v)
  }

  /** array<int> codes → array<double> reconstruction: each code slices
    * its subspace centroid out of the flattened plan literal — pure
    * column ops (codegen), no UDF, which keeps scoring over a PQ corpus
    * inside whole-stage codegen. */
  def decode(model: PqModel)(codes: Column): Column = {
    val flat = typedLit(model.flat.toSeq)
    val k = model.k
    val subDim = model.subDim
    flatten(transform(codes, (c, s) =>
      slice(flat, (s * k + c) * subDim + lit(1), lit(subDim))))
  }
}
