package graft.extract

import graft.extract.SchemaPropertyExtractor.ScoringBackend

/** E4 question clustering (`QAMatchingEngine.py:239-360`): agglomerative
  * average-linkage clustering of the (config-sized) question list so
  * grouped-QA prompts share contexts; clusters over `maxPerGroup` split.
  * Driver-side by design — the input is tens of questions, never data.
  * Deterministic given a deterministic scoring backend.
  */
object QuestionClustering {

  /** Pairwise distance = 1 - score(qi, qj) via the pluggable backend. */
  def distances(questions: Seq[String], backend: ScoringBackend): Array[Array[Double]] = {
    val n = questions.size
    val d = Array.ofDim[Double](n, n)
    for (i <- 0 until n) {
      val scores = backend.score(questions(i), questions)
      for (j <- 0 until n) d(i)(j) = 1.0 - scores(j)
    }
    // symmetrize (backends need not be exactly symmetric)
    for (i <- 0 until n; j <- i + 1 until n) {
      val m = (d(i)(j) + d(j)(i)) / 2.0
      d(i)(j) = m; d(j)(i) = m
    }
    d
  }

  /** Average-linkage agglomerative clustering into `nClusters` INDEX
    * groups, then split oversized clusters into `maxPerGroup` chunks in
    * stable index order. Index-based so duplicate question texts keep
    * their identity (two properties can humanize to the same query). */
  def clusterIndices(questions: Seq[String], backend: ScoringBackend,
                     nClusters: Int, maxPerGroup: Int): Seq[Seq[Int]] = {
    if (questions.isEmpty) return Seq.empty
    val d = distances(questions, backend)
    var clusters: Vector[Vector[Int]] = questions.indices.map(Vector(_)).toVector

    def linkage(a: Vector[Int], b: Vector[Int]): Double =
      a.iterator.flatMap(i => b.iterator.map(j => d(i)(j))).sum / (a.size * b.size)

    while (clusters.size > math.max(1, nClusters)) {
      var best = (Double.MaxValue, 0, 1)
      for (i <- clusters.indices; j <- i + 1 until clusters.size) {
        val l = linkage(clusters(i), clusters(j))
        // deterministic tie-break on (linkage, i, j)
        if (l < best._1) best = (l, i, j)
      }
      val (_, i, j) = best
      val merged = (clusters(i) ++ clusters(j)).sorted
      clusters = clusters.zipWithIndex
        .collect { case (c, idx) if idx != i && idx != j => c } :+ merged
      clusters = clusters.sortBy(_.head)
    }
    clusters
      .flatMap(_.grouped(maxPerGroup))
      .map(_.toSeq)
      .sortBy(_.head)
  }

  /** Text view of [[clusterIndices]] (kept for callers that only need the
    * grouped question strings). */
  def cluster(questions: Seq[String], backend: ScoringBackend,
              nClusters: Int, maxPerGroup: Int): Seq[Seq[String]] =
    clusterIndices(questions, backend, nClusters, maxPerGroup)
      .map(_.map(questions))
}
