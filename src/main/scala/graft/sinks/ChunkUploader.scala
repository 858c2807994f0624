package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.model.{N3, Triple}
import graft.sources.LiveSource.RetryPolicy

/** K8 remote chunk upload, production half (`LoadProcessor.py:123-150`
  * `send_batch_to_remote_db` + chunked file packing): the reference packs
  * the KG into fixed-size N-Triples chunks, POSTs each chunk, finalizes
  * the batch once, then triggers remote ETL.
  *
  * Spark restatement: chunks ARE partitions — the triple table is
  * round-robin repartitioned to `numChunks` and each executor serializes
  * and uploads its own partition (`foreachPartition`, one transport per
  * partition, per-chunk retry with the shared LiveSource backoff policy);
  * only the batch finalize runs on the driver, once, exactly like the
  * reference. Nothing reaches the driver, but each chunk DOES materialize
  * as one request body on its executor (the transport contract is one
  * POST per chunk, like the reference's one file per chunk) — size
  * `numChunks` so corpus/numChunks fits comfortably in executor memory.
  * The transport is injectable; the offline build exercises the full
  * protocol against a stub.
  */
object ChunkUploader {

  /** Minimal upload transport: POST body to url, return response body. */
  trait Transport { def post(url: String, body: String): String }

  final case class UploadReport(batchId: String, numChunks: Int, nTriples: Long)

  /** Upload `triples` as `numChunks` N-Triples chunks + one finalize call.
    *
    * @param transportFactory constructed ON the executor per partition
    */
  def upload(triples: DataFrame, baseUrl: String, batchId: String,
             numChunks: Int, transportFactory: () => Transport,
             policy: RetryPolicy = RetryPolicy()): UploadReport = {
    val spark = triples.sparkSession
    import spark.implicits._
    val lines = triples
      .select("subject", "predicate", "obj", "objKind", "datatype")
      .as[Triple].map(N3.formatTriple)
    val sent = spark.sparkContext.longAccumulator("uploadedTriples")
    val chunkBase = s"${baseUrl.stripSuffix("/")}/upload/batch/$batchId/chunk"
    lines.repartition(numChunks).foreachPartition {
      (it: Iterator[String]) =>
        // single pass: build the body and count rows together
        val sb = new java.lang.StringBuilder()
        var n = 0L
        it.foreach { line =>
          if (n > 0) sb.append('\n')
          sb.append(line); n += 1
        }
        if (n > 0) {
          val t = transportFactory()
          val body = sb.toString
          // chunk id in the URL: foreachPartition is at-least-once under
          // task retry/speculation, so a re-sent chunk must be idempotent
          // server-side — same key, same body, like the reference's
          // one-file-per-chunk naming (`LoadProcessor.py:123-150`)
          val url = s"$chunkBase/${org.apache.spark.TaskContext.getPartitionId()}"
          policy.retry(() => t.post(url, body))
          sent.add(n)
        }
    }
    // the finalize (and any ETL trigger) is one driver-side call per batch
    // — with the same retry policy as the chunks: a 429 here would
    // otherwise strand a fully-transmitted batch unfinalized
    policy.retry(() => transportFactory().post(
      s"${baseUrl.stripSuffix("/")}/upload/batch/$batchId/finalize", ""))
    UploadReport(batchId, numChunks, sent.value)
  }
}
