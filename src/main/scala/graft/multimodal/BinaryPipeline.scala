package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media carried as opaque `binary` payloads
  * with typed metadata, decoded/feature-extracted in partition-local
  * batches behind a `Decoder` trait.
  *
  * The image/audio libraries are not in this container, so the shipped
  * decoder is a deterministic stub — but the Spark-side contract is real:
  * schema (id, payload, mediaType), `mapPartitions` batch shape (decode
  * amortizes model/codec setup per partition, the Scala analog of
  * `mapInPandas`), and the typed feature output.
  */
object BinaryPipeline {

  final case class MediaRow(id: Long, payload: Array[Byte], mediaType: String)

  final case class Features(
      id: Long, mediaType: String, nBytes: Int, ok: Boolean,
      features: Array[Float])

  /** Per-partition decoder: `open()` once per partition (codec/model
    * setup), then `decode` per payload. Must be serializable. */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte], mediaType: String): Array[Float]
  }

  /** Deterministic stand-in for a real image/audio decoder: fixed-size
    * byte-histogram features. Replace with a JNI/codec-backed decoder in
    * production; the pipeline shape does not change. */
  final class StubDecoder(dim: Int = 16) extends Decoder {
    override def decode(payload: Array[Byte], mediaType: String): Array[Float] = {
      val f = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        f(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1f
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < dim) { f(j) /= payload.length; j += 1 }
      }
      f
    }
  }

  /** Content-window sketch decoder — the perceptual-fingerprint stand-in:
    * every DISTINCT 4-byte window of the payload casts one ±1 vote per
    * signature bit (votes come from the md5 of the window's uppercase-hex
    * spelling, so any engine can re-derive them); `features(b)` is the
    * bit-b vote sum. `sign(features)` is then a classic SimHash over the
    * payload's content windows: a byte-local perturbation touches at most
    * 4 windows, so each vote sum moves by at most 8 and the signature of
    * a large payload barely shifts. Vote sums are small integers, exact
    * in Float. */
  final class WindowSketchDecoder(bits: Int = 48) extends Decoder {
    require(bits <= 48, "md5 prefix carries 48 usable bits here")
    @transient private var md: java.security.MessageDigest = _
    override def decode(payload: Array[Byte], mediaType: String): Array[Float] = {
      if (md == null) md = java.security.MessageDigest.getInstance("MD5")
      val f = new Array[Float](bits)
      if (payload != null && payload.length >= 4) {
        val hexd = "0123456789ABCDEF"
        val seen = new java.util.HashSet[String]()
        var i = 0
        while (i <= payload.length - 4) {
          val sb = new java.lang.StringBuilder(8)
          var k = 0
          while (k < 4) {
            val b = payload(i + k) & 0xff
            sb.append(hexd.charAt(b >>> 4)).append(hexd.charAt(b & 0xf))
            k += 1
          }
          val w = sb.toString
          if (seen.add(w)) {
            md.reset()
            val dig = md.digest(
              w.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            // first 6 digest bytes == ('0x' || substr(md5_hex, 1, 12))
            var h = 0L
            var j = 0
            while (j < 6) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
            var b = 0
            while (b < bits) {
              f(b) += (if (((h >>> b) & 1L) == 1L) 1f else -1f)
              b += 1
            }
          }
          i += 1
        }
      }
      f
    }
  }

  /** Decode + featurize in partition batches. Failures yield ok=false rows
    * with empty features (zero-vector fallback, the reference's E1 failure
    * contract). */
  def extract(media: Dataset[MediaRow], decoder: Decoder): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      rows.map { r =>
        try Features(r.id, r.mediaType, r.payload.length, ok = true,
          decoder.decode(r.payload, r.mediaType))
        catch {
          case _: Exception =>
            Features(r.id, r.mediaType,
              Option(r.payload).map(_.length).getOrElse(0), ok = false,
              Array.empty[Float])
        }
      }
    }
  }

  /** Vectorized decoder: whole BATCHES of payloads at once — the shape a
    * real feature extractor wants (GPU/BLAS inference amortizes per-call
    * overhead across the batch), mirroring `mapInPandas`' Arrow-batch
    * contract in typed-Dataset form. */
  trait BatchDecoder extends Serializable {
    def open(): Unit = ()
    def decodeBatch(payloads: Seq[Array[Byte]],
                    mediaTypes: Seq[String]): Seq[Array[Float]]
  }

  /** Batched extract: payloads flow to the decoder `batchSize` at a time
    * within each partition (grouped iterator — nothing is collected, and a
    * partial tail batch is delivered as-is). A failed BATCH yields ok=false
    * rows for each of its members. */
  def extractBatched(media: Dataset[MediaRow], decoder: BatchDecoder,
                     batchSize: Int = 64): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      rows.grouped(batchSize).flatMap { batch =>
        try {
          val fs = decoder.decodeBatch(batch.map(_.payload),
            batch.map(_.mediaType))
          // a decoder returning the wrong count would silently lose rows
          // through a zip — treat it as a failed batch instead
          if (fs.length != batch.length)
            throw new IllegalStateException(
              s"decodeBatch returned ${fs.length} features for ${batch.length} payloads")
          batch.lazyZip(fs).map { (r, f) =>
            Features(r.id, r.mediaType,
              Option(r.payload).map(_.length).getOrElse(0), ok = true, f)
          }
        } catch {
          case _: Exception => batch.map(r =>
            Features(r.id, r.mediaType,
              Option(r.payload).map(_.length).getOrElse(0), ok = false,
              Array.empty[Float]))
        }
      }
    }
  }

  /** Frame sampling stub for video-like payloads: every `stride`-th byte
    * window becomes a "frame" (the partitioning/explode shape of real
    * frame extraction). */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(0),
          floor((octet_length(col("payload")) - frameSize) / stride) + 1)
          .cast("int"))
      // guard: for payloads shorter than frameSize, n_frames = 0 and
      // sequence(0, -1) would emit a DESCENDING [0, -1] — two bogus frames
      // instead of none
      .withColumn("frame_idx", explode(
        when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $stride + 1, $frameSize)"))
      .select(col("id"), col("frame_idx"), col("frame"))
}
