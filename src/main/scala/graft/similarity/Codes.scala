package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Packed code-column helpers shared by the SQ8 and PQ index paths.
  *
  * Parquet has no int8 list element, so code arrays persist as BINARY
  * blobs at exactly 1 byte per code ([[Sq8]]'s storage note). Packing is
  * a build-stage step where a Scala UDF is fine; UNPACKING sits in the
  * per-candidate scoring path of the compressed-index searches, so it is
  * pure column ops (substr → hex → conv), keeping the whole scoring
  * projection inside whole-stage codegen with no UDF boundary —
  * PlanSpec pins that property on the graded searches.
  */
object Codes {

  private val packUdf = udf((codes: Seq[Int]) => codes.map(_.toByte).toArray)

  /** array<int> codes in [0, 255] → n-byte binary blob (storage form). */
  def pack(codes: Column): Column = packUdf(codes)

  /** n-byte binary blob → array<int> codes in [0, 255], UDF-free:
    * one-byte substr, hex, base-16 parse per code. A blob shorter than
    * `n` yields null codes past its end (substr past the end is empty,
    * conv('')=null) — surfaced by any digest/compare downstream, never
    * silently wrong. */
  def unpack(bin: Column, n: Int): Column =
    transform(sequence(lit(1), lit(n)),
      i => conv(hex(bin.substr(i, lit(1))), 16, 10).cast("int"))
}
