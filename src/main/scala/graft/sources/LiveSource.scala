package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Live-API connector skeleton (S2-S5/S7/S9 production half): the
  * reference's manager is a driver-side bounded LIST plus a threaded
  * per-record FETCH with 429-aware exponential backoff
  * (`HFDatasetManager.py:36-39` retry parameters, `134-167`
  * `_call_with_hf_retries`, `248-314` list + threaded card loads).
  *
  * Spark restatement: the LIST stays a bounded driver call (it is bounded
  * in the reference too — `list_models(limit=...)`); the FETCH distributes
  * ids over executors with `mapPartitions`, ONE client per partition
  * (connection reuse), per-record retry, and failures recorded as rows
  * rather than thrown — one dead record must not kill a fleet-wide fetch.
  * The transport is injectable so the offline build exercises the whole
  * control flow against a stub; production supplies a real client factory.
  */
object LiveSource {

  /** Minimal transport contract: body of a GET. Clients are constructed on
    * the EXECUTOR via the factory — never serialized from the driver. */
  trait HttpClient { def get(url: String): String }

  /** Thrown by transports on HTTP 429, carrying the server's Retry-After
    * hint when present. */
  final case class RateLimited(retryAfterMs: Option[Long])
    extends RuntimeException("rate limited")

  /** One fetched record; `ok = false` rows carry the terminal error. */
  final case class Fetched(id: String, payload: String, ok: Boolean, error: String)

  /** Retry/backoff policy with the reference's defaults (6 retries, 5 s
    * base, 400 s cap). `sleep` and `jitterMs` are injectable so tests run
    * the full backoff schedule without wall-clock waits. */
  final case class RetryPolicy(
      maxRetries: Int = 6,
      baseBackoffMs: Long = 5000,
      maxBackoffMs: Long = 400000,
      sleep: Long => Unit = Thread.sleep,
      jitterMs: () => Long = () => 0L) extends Serializable {

    /** `_call_with_hf_retries`: honor Retry-After when present, else
      * exponential backoff + jitter; EVERY delay is capped at
      * `maxBackoffMs` — a server-supplied Retry-After of hours must not
      * park an executor task thread past the policy's own bound. A
      * non-429 failure or retry exhaustion propagates to the caller. */
    def retry[T](fn: () => T): T = {
      var attempt = 0
      while (true) {
        try return fn()
        catch {
          case RateLimited(retryAfter) if attempt < maxRetries =>
            val delay = math.min(maxBackoffMs, retryAfter.getOrElse(
              baseBackoffMs * (1L << attempt) + jitterMs()))
            sleep(delay)
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Driver-side LIST: bounded id enumeration (one line per id in the
    * transport's response — the reference's `list_models(limit=...)`). */
  def listIds(client: HttpClient, listUrl: String, limit: Int): Seq[String] =
    client.get(listUrl).linesIterator.filter(_.nonEmpty).take(limit).toSeq

  /** One batched fetch: the id group sent in a single API call, the
    * response body, or the terminal error. `batchId` preserves the
    * driver-side grouping order. */
  final case class FetchedBatch(batchId: Long, ids: Seq[String],
                                payload: String, ok: Boolean, error: String)

  /** Executor-side BATCHED fetch (S5 production half,
    * `HFDatasetManager.py:564-715`): the reference fetches arXiv ids in
    * groups of `batchSize` — ONE API call per group (`:607-620` passes the
    * whole id_list to one search) — with inter-batch pacing (`:707-709`,
    * sleep between batches, never after the last).
    *
    * Spark restatement: ids are grouped into ordered batches on the
    * driver, batches distribute over executors (`mapPartitions`, one
    * client per partition), each batch is one `urlForBatch(ids)` call with
    * per-batch retry, and pacing runs between consecutive batches WITHIN a
    * partition (the reference's global sequential pacing becomes
    * per-executor — size `pacingMs` x parallelism to the API's budget). A
    * failed batch becomes an `ok = false` row carrying its ids, never a
    * job failure. `policy.sleep` injects the pacing clock, so tests replay
    * the schedule without wall-clock waits. */
  def fetchBatched(spark: SparkSession, ids: Seq[String],
                   clientFactory: () => HttpClient,
                   urlForBatch: Seq[String] => String,
                   batchSize: Int = 200,
                   pacingMs: Long = 6000,
                   policy: RetryPolicy = RetryPolicy(),
                   partitions: Int = 0): Dataset[FetchedBatch] = {
    import spark.implicits._
    require(batchSize >= 1, "batchSize must be >= 1")
    val batches = ids.grouped(batchSize).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toSeq
    val n = math.max(1, if (partitions > 0) partitions
      else math.min(batches.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(batches).repartition(n)
      .mapPartitions { it =>
        val client = clientFactory()
        var first = true
        it.map { case (batchId, group) =>
          if (!first && pacingMs > 0) policy.sleep(pacingMs)
          first = false
          try FetchedBatch(batchId, group,
            policy.retry(() => client.get(urlForBatch(group))),
            ok = true, error = "")
          catch {
            // a task kill interrupting a backoff/pacing sleep must abort
            // the task, not be misrecorded as a fetch-failure row
            case e: InterruptedException => throw e
            case e: Exception =>
              FetchedBatch(batchId, group, null, ok = false,
                String.valueOf(e.getMessage))
          }
        }
      }
  }

  /** Executor-side FETCH: ids spread over `partitions` tasks, one client
    * per partition, per-record retry; errors become `ok = false` rows. */
  def fetch(spark: SparkSession, ids: Seq[String],
            clientFactory: () => HttpClient, urlFor: String => String,
            policy: RetryPolicy = RetryPolicy(),
            partitions: Int = 0): Dataset[Fetched] = {
    import spark.implicits._
    val n = math.max(1, if (partitions > 0) partitions
      else math.min(ids.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(ids).repartition(n)
      .mapPartitions { it =>
        val client = clientFactory()
        it.map { id =>
          try Fetched(id, policy.retry(() => client.get(urlFor(id))),
            ok = true, error = "")
          catch {
            // see fetchBatched: interrupts abort the task, not become rows
            case e: InterruptedException => throw e
            case e: Exception =>
              Fetched(id, null, ok = false, String.valueOf(e.getMessage))
          }
        }
      }
  }
}
