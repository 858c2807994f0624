package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the scale path beyond brute-force cosine top-k: partition the
  * corpus into k centroid cells (Lloyd iterations as DataFrame jobs),
  * then probe only the `nprobe` nearest cells per query.
  *
  * Scale properties: centroids are tiny (k vectors) and live broadcast;
  * assignment is one map stage over the corpus; a search touches
  * ~corpus × nprobe / k vectors. With nprobe = k the search is exactly
  * brute force (the recall knob is explicit). Everything is deterministic:
  * centroid seeds are chosen by vec_id order, not RNG.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def sqdist(a: Seq[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private[similarity] def nearest(v: Seq[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val d = sqdist(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Sampled fit — the ONLY fit entry point: Lloyd iterations on a
    * deterministic bounded sample, entirely driver-side — one Spark job
    * total (the sample collect). This is the production shape for IVF at
    * scale: centroids come from a sample (k·1000s of vectors), never a
    * full-corpus iteration; the corpus only ever sees the one-pass
    * `assign`. (A full-corpus Lloyd variant used to live here; it ran an
    * interpreted per-row UDF plus a posexplode/groupBy over the whole
    * corpus per iteration and had no quality advantage — removed so no
    * caller can pick the trap.) */
  def fitSample(emb: DataFrame, k: Int, iters: Int,
                sampleSize: Int = 2048): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id").limit(sampleSize)
      .select("embedding").as[Seq[Double]].collect().map(_.toArray)
    var cents = sample.take(k)
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](cents.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, cents)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    Model(cents)
  }

  /** Corpus cell assignment (one map stage, broadcast centroids). */
  def assign(emb: DataFrame, model: Model): DataFrame = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(model.centroids)
    val assignUdf = udf((v: Seq[Double]) => nearest(v, bc.value))
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", assignUdf(col("v")))
  }

  /** Precomputed-norm column over an assigned corpus — together with the
    * cell id this is the searchable IVF index row. */
  def withNorm(assigned: DataFrame): DataFrame =
    assigned.withColumn("nrm",
      sqrt(graft.functions.GraftFunctions.dot_double(col("v"), col("v"))))

  /** Top-k cosine search probing the `nprobe` nearest cells per query.
    * Queries and corpus are both (vec_id, embedding) tables; queries are
    * expected to be the small side (broadcast). Assigns + norms the corpus
    * inline — use [[topKIndexed]] with a persisted [[IvfStore]] index to
    * skip that pass per query. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model,
           k: Int, nprobe: Int): DataFrame =
    topKIndexed(withNorm(assign(corpus, model)), queries, model, k, nprobe)

  /** Per-query probed-cell ranking: one row per (query, probed cell) with
    * the probe order (`cell_rank` 0 = nearest centroid) plus the query
    * vector and norm. With nprobe = k every cell is listed — useful for
    * computing a whole recall curve from ONE corpus join (a row visible
    * at nprobe n is exactly one with cell_rank < n). */
  def probedCells(queries: DataFrame, model: Model, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(model.centroids)
    val probeUdf = udf { (v: Seq[Double]) =>
      bc.value.indices
        .map(c => (sqdist(v, bc.value(c)), c)).sorted.take(nprobe).map(_._2)
    }
    queries
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("cells", probeUdf(col("qv")))
      .withColumn("qn",
        sqrt(graft.functions.GraftFunctions.dot_double(col("qv"), col("qv"))))
      .select(col("query_id"), col("qv"), col("qn"),
        posexplode(col("cells")).as(Seq("cell_rank", "cell")))
  }

  /** Search over a prebuilt index table (vec_id, v, cell, nrm) — the
    * corpus pays no per-query work beyond the probed-cell join. */
  def topKIndexed(index: DataFrame, queries: DataFrame, model: Model,
                  k: Int, nprobe: Int): DataFrame = {
    val q = probedCells(queries, model, nprobe).drop("cell_rank")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    index.join(broadcast(q), "cell")
      .withColumn("dot",
        graft.functions.GraftFunctions.dot_double(col("qv"), col("v")))
      .withColumn("cos", col("dot") / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
  }
}
