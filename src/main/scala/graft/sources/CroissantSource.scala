package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S4 production half: the croissant endpoint connector. The reference
  * GETs `/api/datasets/{id}/croissant` per dataset with a urllib3 Retry
  * that retries 429 and honors Retry-After
  * (`HFDatasetManager.py:459-489` `get_croissant_metadata`).
  *
  * Spark restatement: ids run through the batched-fetch machinery with
  * batchSize = 1 — one GET per dataset id, per-call retry where a
  * [[LiveSource.RateLimited]] carrying the server's Retry-After hint is
  * honored (capped by the policy), inter-call pacing within a partition,
  * and a dead dataset becoming an `ok = false` row instead of killing
  * the fetch fleet. Payloads feed `JsonLd`/`CroissantBuilder` downstream
  * (T2) via [[croissantInput]].
  */
object CroissantSource {

  /** The reference's endpoint shape. */
  def url(base: String)(id: String): String =
    s"$base/api/datasets/$id/croissant"

  /** Raw per-id fetch: every row is one dataset id's GET outcome. */
  def fetchRaw(spark: SparkSession, ids: Seq[String],
               clientFactory: () => LiveSource.HttpClient,
               base: String,
               pacingMs: Long = 0,
               policy: LiveSource.RetryPolicy = LiveSource.RetryPolicy(),
               partitions: Int = 0): Dataset[LiveSource.FetchedBatch] =
    LiveSource.fetchBatched(spark, ids, clientFactory,
      group => url(base)(group.head),
      batchSize = 1, pacingMs = pacingMs, policy = policy,
      partitions = partitions)

  /** Successful payloads as (datasetId, croissant_json) — the exact input
    * schema of [[graft.transform.CroissantBuilder.build]]. Failed fetches
    * are dropped here; read them from [[fetchRaw]] when the caller wants
    * the error rows. */
  def croissantInput(fetched: Dataset[LiveSource.FetchedBatch]): DataFrame =
    fetched.toDF()
      .filter(col("ok"))
      .select(element_at(col("ids"), 1).as("datasetId"),
        col("payload").as("croissant_json"))
}
