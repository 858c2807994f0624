package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Vector similarity + multimodal-column operators over `embeddings` and
  * `documents`: brute-force cosine top-k (the correctness baseline),
  * sign-bit LSH bucketed near-dup (the scale path), and opaque-binary
  * multimodal plumbing.
  *
  * Dot products and norms use `zip_with`/`aggregate` HOFs over
  * `array<double>` — sequential left-folds, so the arithmetic is
  * reproducible and oracle-matchable. The top-k query broadcasts the small
  * query side (never shuffles the corpus); the near-dup query only joins
  * within LSH buckets (never all-pairs).
  */
object VectorOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  private def embWithNorm(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      // single-split test file → spread the dot-product work across cores
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force cosine top-k: each query vector (small set, broadcast)
    * scored against the whole corpus, per-query top-5 by window. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embWithNorm(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id"))
    c.join(broadcast(q))
      .withColumn("cos_raw", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"))
  }

  val cosineTopKSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b)) AS nrm
      |  FROM embeddings)
      |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]), (a, b) -> a + b)
      |      / (q.nrm * c.nrm) AS cos_raw,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      list_reduce(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]), (a, b) -> a + b)
      |        / (q.nrm * c.nrm) DESC, c.vec_id) AS rn
      |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id >= 10)
      |WHERE rn <= 5""".stripMargin

  /** Sign-bit LSH near-dup: bucket on the sign pattern of the first 8
    * dimensions (a fixed random-hyperplane sketch for random embeddings),
    * join only within buckets, keep pairs with cosine >= 0.2. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val bucket = (1 to 8)
      .map(i => when(element_at(col("v"), i) > 0, 1 << (i - 1)).otherwise(0))
      .reduce(_ + _)
    val e = embWithNorm(s, dir).withColumn("bucket", bucket)
    val a = e.select(col("vec_id").as("vec1"), col("v").as("v1"),
      col("nrm").as("n1"), col("bucket"))
    val b = e.select(col("vec_id").as("vec2"), col("v").as("v2"),
      col("nrm").as("n2"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("vec1") < col("vec2"))
      .withColumn("cos_raw", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos_raw") >= 0.2)
      .select(col("vec1"), col("vec2"), round(col("cos_raw"), 4).as("cos"))
  }

  val embedNearDupSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b)) AS nrm,
      |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END +
      |     CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END +
      |     CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END +
      |     CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END +
      |     CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END +
      |     CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END +
      |     CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END +
      |     CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
      |  FROM embeddings)
      |SELECT vec1, vec2, round(cos_raw, 4) AS cos FROM (
      |  SELECT a.vec_id AS vec1, b.vec_id AS vec2,
      |    list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
      |      / (a.nrm * b.nrm) AS cos_raw
      |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |WHERE cos_raw >= 0.2""".stripMargin

  /** Multimodal-column plumbing: documents carried as opaque binary
    * payloads with typed metadata; the "decode" is a deterministic stub
    * (byte stats + frame-sample count) — the Spark-side schema,
    * projection, and batch shape are the real thing. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        (octet_length(col("payload")) % 256).cast("long").as("stub_feature"),
        (floor(octet_length(col("payload")) / 64) + 1).cast("long").as("n_frames"),
        col("source"))

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 256 AS BIGINT) AS stub_feature,
      |  CAST(floor(octet_length(encode(text)) / 64) + 1 AS BIGINT) AS n_frames,
      |  source
      |FROM documents""".stripMargin

  /** IVF-probed ANN top-k (oracle-less: centroid fit is engine-defined;
    * correctness vs brute force is pinned by IvfSpec's nprobe=k test). */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    // fit-or-load the persisted index: the fit (bounded sample collect) and
    // the corpus assign pass run once per corpus version, not per query
    val (model, index) = graft.similarity.IvfStore.indexFor(s, dir, k = 8, iters = 2)
    graft.similarity.IvfIndex.topKIndexed(
        index.filter(col("vec_id") >= 10),
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        model, k = 5, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> cosineTopK _,
    "q_embed_neardup" -> embedNearDup _,
    "q_multimodal_meta" -> multimodalMeta _,
    "q_ann_ivf" -> annIvf _)

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" -> cosineTopKSql,
    "q_embed_neardup" -> embedNearDupSql,
    "q_multimodal_meta" -> multimodalMetaSql)
}
