package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Variance-balanced dimension permutation for product quantization —
  * the cheap, deterministic core of OPQ (Ge et al., "Optimized Product
  * Quantization", CVPR 2013): plain PQ quantizes FIXED contiguous
  * dimension groups, so when the energy of the embedding is concentrated
  * in a few dimensions one subspace carries most of the variance and its
  * k centroids are spread too thin while other subspaces waste theirs.
  * OPQ's full form learns a rotation; its widely deployed lightweight
  * form (FAISS calls the idea "PCA + random rotation / dimension
  * re-ordering") just PERMUTES dimensions so each subspace receives a
  * balanced share of the variance. We implement the permutation form:
  * rank dimensions by sample variance, deal them to the m subspaces in
  * snake order (s₀…s₇, s₇…s₀, …), fit/encode/decode plain [[Pq]] in the
  * permuted space, and inverse-permute reconstructions back.
  *
  * Everything is deterministic and ANSI-SQL-replayable by the Lloyd-fit
  * discipline ([[IvfIndex.fitSample]]): the variance sample is the first
  * `sampleSize` vectors by vec_id, the mean and squared-deviation sums
  * fold in vec_id order (one left fold each — the oracle's `list_reduce`
  * over `list(... ORDER BY vec_id)` reproduces every double bit-for-bit),
  * and the dimension ranking breaks variance ties on the dimension
  * index.
  *
  * Scale shape: the permutation fit is ONE bounded sample collect; the
  * permutation itself is a plan literal, so permute/inverse-permute are
  * pure column gathers (codegen, no UDF, no shuffle) and compose with
  * the existing PQ encode (index build) and ADC scoring paths unchanged.
  */
object Opq {

  /** A fitted dimension permutation: `perm(j)` = the ORIGINAL 0-based
    * dimension that lands at permuted position j. Subspace s of the
    * permuted vector holds `perm.slice(s*subDim, (s+1)*subDim)`. */
  final case class Permutation(perm: Array[Int]) {
    def dim: Int = perm.length
    /** inv(d) = permuted position of original dimension d. */
    def inv: Array[Int] = {
      val a = new Array[Int](perm.length)
      perm.indices.foreach(j => a(perm(j)) = j)
      a
    }
  }

  /** Fit the snake permutation from per-dimension sample variance.
    * Sample = first `sampleSize` vectors by vec_id (the [[IvfIndex]]
    * discipline); per dimension, mean then squared-deviation sum each
    * fold sequentially in vec_id order so an oracle's ordered-list fold
    * matches bit-for-bit. Dimensions sort by (variance DESC, dim ASC)
    * and deal to subspaces in snake order: position p goes to subspace
    * `p % m` on even rounds (p / m) and `m-1 - p % m` on odd rounds, so
    * every subspace receives one dimension from each consecutive
    * variance band — the balancing guarantee. Within a subspace,
    * dimensions keep their deal order (variance-descending). */
  def fitPermutation(emb: DataFrame, m: Int = 8,
                     sampleSize: Int = 2048): Permutation = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id").limit(sampleSize)
      .select("embedding").as[Seq[Double]].collect()
    val n = sample.length
    require(n > 0, "Opq.fitPermutation: empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"Opq.fitPermutation: dim $dim not divisible by m=$m")
    val variances = Array.tabulate(dim) { d0 =>
      var mu = 0.0
      sample.foreach(v => mu += v(d0))
      mu /= n
      var ss = 0.0
      sample.foreach { v => val dd = v(d0) - mu; ss += dd * dd }
      ss / n
    }
    val ranked = variances.zipWithIndex
      .sortBy { case (vr, d0) => (-vr, d0) }.map(_._2)
    val groups = Array.fill(m)(Vector.empty[Int])
    ranked.zipWithIndex.foreach { case (d0, p) =>
      val s = if ((p / m) % 2 == 0) p % m else m - 1 - (p % m)
      groups(s) = groups(s) :+ d0
    }
    Permutation(groups.flatten)
  }

  /** Gather `v` into permuted order — a plan-literal column gather
    * (array of element_at, codegen; no UDF). */
  def permute(p: Permutation)(v: Column): Column =
    array(p.perm.toIndexedSeq.map(d0 => element_at(v, d0 + 1)): _*)

  /** Gather a permuted-space vector back to original dimension order. */
  def inversePermute(p: Permutation)(v: Column): Column =
    array(p.inv.toIndexedSeq.map(j => element_at(v, j + 1)): _*)
}
