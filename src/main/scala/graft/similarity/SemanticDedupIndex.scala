package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental SEMANTIC dedup — the embedding-space sibling of
  * [[DedupIndex]]: a persisted table of (vec_id, sign-bit bucket,
  * embedding, norm) is the standing index; an incoming batch drops any
  * vector whose cosine against an already-accepted vector (index or
  * smaller-id batch member) meets the threshold. Candidate pairs come
  * ONLY from sign-bit LSH buckets (the first `SignBits` dimensions'
  * signs), so the pair space is bucket-local — never all-pairs — and old
  * vectors are never re-scored against each other.
  *
  * Same non-cascading one-pass rule as [[DedupIndex]]: a smaller-id batch
  * vector counts as an acceptor even if it is itself dropped.
  */
class SemanticDedupIndex(spark: SparkSession, path: String,
                         threshold: Double = 0.95)
    extends BatchedSignatureStore(spark, path) {

  import SemanticDedupIndex._

  override protected def schema: org.apache.spark.sql.types.StructType = vecSchema

  def vectors: DataFrame = table

  /** Ingest one batch of (vec_id, embedding: array<float|double>). */
  def ingest(emb: DataFrame): DedupIndex.IngestStats = {
    val batch = withSketch(emb).localCheckpoint()
    val idx = vectors

    // exact stage first (bit-identical vectors, keyed on the content
    // hash): collapses replayed/duplicate rows AND zero-norm vectors,
    // which the null-safe cosine below never scores — without this,
    // re-ingesting a zero vector would grow the index every time
    val exactKeep = batch.groupBy("vhash").agg(min(col("vec_id")).as("vec_id"))
      .select("vec_id")
    val afterExact = batch.join(exactKeep, "vec_id")
      .dropDuplicates("vhash") // fully identical rows (same id too) collapse
      .join(idx.select("vhash"), Seq("vhash"), "left_anti")

    def sides(df: DataFrame, suffix: String) =
      df.select(col("vec_id").as(s"vec$suffix"), col("v").as(s"v$suffix"),
        col("nrm").as(s"n$suffix"), col("bucket"))

    // vs index: any accepted vector in the same bucket at/over threshold
    val vsIndex = sides(afterExact, "1").join(sides(idx, "2"), "bucket")
      .filter(cosine >= threshold)
      .select(col("vec1").as("vec_id")).distinct()
    // within batch: a smaller-id post-exact batch vector (non-cascading)
    val within = sides(afterExact, "1").join(sides(afterExact, "2"), "bucket")
      .filter(col("vec2") < col("vec1") && cosine >= threshold)
      .select(col("vec1").as("vec_id")).distinct()

    val survivors = afterExact
      .join(vsIndex.unionByName(within).distinct(), Seq("vec_id"), "left_anti")
      .localCheckpoint()

    val nIn = batch.count()
    val nAdded = survivors.count()
    append(survivors, nAdded)
    DedupIndex.IngestStats(nIn = nIn, nAdded = nAdded, nDropped = nIn - nAdded)
  }
}

object SemanticDedupIndex {

  import org.apache.spark.sql.types._

  /** Sign bits used for the LSH bucket (first dims' signs). */
  val SignBits = 8

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("nrm", DoubleType),
    StructField("bucket", IntegerType),
    StructField("vhash", StringType)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Null-safe cosine: a zero norm yields NULL (nullif), not a
    * DIVIDE_BY_ZERO — under Spark 4's default ANSI mode a plain division
    * would THROW when an accepted zero vector shares a bucket with any
    * candidate, killing the whole ingest job. NULL never clears the
    * threshold filter, so zero vectors simply never near-dup. */
  private val cosine: Column =
    dot(col("v1"), col("v2")) / nullif(col("n1") * col("n2"), lit(0.0))

  def withSketch(emb: DataFrame): DataFrame = {
    // size guard: element_at past the end THROWS under Spark 4's default
    // ANSI mode — a malformed short embedding gets bucket bits 0 instead
    // of failing the whole batch job
    val bucket = (1 to SignBits)
      .map(i => when(size(col("v")) >= i && element_at(col("v"), i) > 0,
        1 << (i - 1)).otherwise(0))
      .reduce(_ + _)
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .withColumn("bucket", bucket)
      .withColumn("vhash", md5(to_json(col("v"))))
  }
}
