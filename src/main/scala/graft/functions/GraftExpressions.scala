package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expressions for the engine's hot scalar functions —
  * stage (b) of the extension ladder (compose built-ins < custom
  * Expression < custom operator): both generate inline Java via
  * `doGenCode` calling a static evaluator, so they stay inside
  * whole-stage codegen spans instead of falling back to interpreted
  * ScalaUDF rows (SURVEY §4: candidate custom expressions `n3_escape`,
  * document hashing).
  */
object Evaluators {

  /** N-Triples literal escaping (shared with graft.model.N3). */
  def n3Escape(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.model.N3.escapeLiteral(s.toString))

  /** 64-bit SimHash over an array of token strings: per-bit majority vote
    * of murmur-style 64-bit token hashes. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(arr.getUTF8String(i).getBaseObject,
            arr.getUTF8String(i).getBaseOffset,
            arr.getUTF8String(i).numBytes, 42)
        // widen the 32-bit murmur to 64 bits deterministically
        val h64 = (h.toLong << 32) | (Integer.rotateLeft(h, 13).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h64 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Deterministic ±1 hyperplane component for (band, bit, dim): the low
    * bit of the first 4 md5 bytes of "seed|band|bit|dim" — reproducible
    * by any engine as `('0x' || substr(md5(s), 1, 8))::UBIGINT % 2`.
    * Shared by the sketch config (oracle parity) and the native
    * expression below. */
  def hyperplaneSign(seed: String, b: Int, j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$b|$j|$d".getBytes("UTF-8"))
    val first8hex = java.lang.Long.parseLong(
      md.take(4).map("%02x".format(_)).mkString, 16)
    if (first8hex % 2 == 1) 1.0 else -1.0
  }

  /** Flattened (nBands * bitsPerBand * dim) sign table, row-major by
    * (band, bit). */
  def hyperplaneSigns(seed: String, nBands: Int, bits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](nBands * bits * dim)
    var b = 0
    while (b < nBands) {
      var j = 0
      while (j < bits) {
        var d = 0
        while (d < dim) {
          out((b * bits + j) * dim + d) = hyperplaneSign(seed, b, j, d)
          d += 1
        }
        j += 1
      }
      b += 1
    }
    out
  }

  /** All band buckets of the multi-band random-hyperplane sketch in ONE
    * pass over the vector — the native replacement for nBands*bitsPerBand
    * interpreted `aggregate(zip_with(...))` folds (HOFs are
    * CodegenFallback in Spark 4). IEEE parity with the column form:
    * products accumulate in dimension order with null / out-of-range
    * elements contributing exactly 0 (the column form's coalesce(x*h, 0)
    * adds literal 0.0, which never changes the running sum's magnitude),
    * so the sign of every projection — all that reaches the bucket — is
    * identical bit-for-bit. */
  def hyperplaneBuckets(v: ArrayData, signs: Array[Double],
                        nBands: Int, bits: Int, dim: Int): ArrayData = {
    val out = new Array[Any](nBands)
    val n = v.numElements()
    val lim = math.min(dim, n)
    var b = 0
    while (b < nBands) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val base = (b * bits + j) * dim
        var proj = 0.0
        var d = 0
        while (d < lim) {
          if (!v.isNullAt(d)) proj += v.getDouble(d) * signs(base + d)
          d += 1
        }
        // !(proj <= 0), NOT proj > 0: Spark's GreaterThan and DuckDB both
        // order NaN ABOVE every value, so a NaN projection (NaN element,
        // or +Inf and -Inf summing) sets the bit there and must here too
        if (!(proj <= 0)) bucket |= (1 << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Left-fold dot product over two double arrays — the native
    * replacement for `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
    * (HOFs are CodegenFallback in Spark 4 AND get duplicated per
    * consuming expression by optimizer collapse). IEEE parity with the
    * HOF form: products accumulate in element order via the identical
    * `acc + (a(i) * b(i))` sequence, so results are bit-for-bit equal —
    * including NaN/Inf propagation — and the same fold with a == b is
    * bit-equal to the `aggregate(transform(a, x => x * x), ...)` norm
    * form. Null parity: `zip_with` pads a length mismatch with nulls and
    * a null product poisons the whole fold, so the HOF yields NULL iff
    * the lengths differ or any element is null — replicated here by the
    * boxed-null return. */
  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** All n MinHash signatures in ONE pass over the shingle array — the
    * native replacement for n interpreted `array_min(transform(sh,
    * md5-hash))` folds. Parity with the column form
    * `conv(substring(md5(concat(sh, '|j')), 1, 8), 16, 10).cast("long")`:
    * the value is the first 4 md5 bytes of (shingle UTF-8 ++ "|j") read
    * as an unsigned 32-bit big-endian int — computed here from the raw
    * digest, no hex-string roundtrip. Null parity: `transform` maps a
    * null shingle to a null hash and `array_min` skips nulls (returning
    * NULL for empty/all-null arrays), replicated by the null-element
    * skip + per-slot found flag. */
  /** Bloom membership probe (see BloomContainsExpr). getBytes copies, but
    * the sketch API is byte[]-based; the copy is one small allocation per
    * probe, still far inside codegen span. */
  def bloomContains(bf: org.apache.spark.util.sketch.BloomFilter,
                    s: UTF8String): Boolean =
    bf.mightContainBinary(s.getBytes)

  /** Count of array elements the filter might contain (see BloomHitsExpr);
    * null elements skipped. */
  def bloomHits(bf: org.apache.spark.util.sketch.BloomFilter,
                arr: ArrayData): Int = {
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
        bf.mightContainBinary(arr.getUTF8String(i).getBytes)) hits += 1
      i += 1
    }
    hits
  }

  def minhashSigs(arr: ArrayData, suffixes: Array[Array[Byte]]): ArrayData = {
    val n = suffixes.length
    val mins = new Array[Long](n)
    val found = new Array[Boolean](n)
    val md = md5Local.get()
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val sb = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < n) {
          md.reset()
          md.update(sb)
          md.update(suffixes(j))
          val d = md.digest()
          val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          if (!found(j) || v < mins(j)) { mins(j) = v; found(j) = true }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      out(j) = if (found(j)) java.lang.Long.valueOf(mins(j)) else null
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The ONE copy of the gram tokenization contract, shared by
    * [[wordNgrams]] and [[wordNgramsAll]]. Semantics replicate the HOF
    * column form EXACTLY: Spark `trim` strips ASCII spaces only, `split`
    * on `\s+` keeps a leading empty token, < n tokens → empty array.
    * Element i is the gram starting at token position i. */
  private def gramArray(s: UTF8String, n: Int): Array[String] = {
    val str = s.toString
    var b = 0; var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    // limit -1: Spark's split KEEPS trailing empty tokens (a text ending
    // in non-space whitespace yields a trailing ""); Java's default
    // limit-0 split would drop them and diverge from the column form
    val w = str.substring(b, e).split("\\s+", -1)
    if (w.length < n) return Array.empty[String]
    val out = new Array[String](w.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= w.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j)); j += 1
      }
      out(i) = sb.toString; i += 1
    }
    out
  }

  /** Distinct word n-gram shingles in one pass — the native replacement
    * for the `split + transform + array_distinct` HOF chain (HOFs are
    * CodegenFallback in Spark 4). `array_distinct` semantics: first
    * occurrence order preserved. */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val grams = gramArray(s, n)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < grams.length) { seen.add(grams(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ALL word n-grams in token order (non-distinct) — element i is the
    * gram starting at token position i, so `posexplode` over this array
    * yields (token_position, gram) directly: the positional shingle table
    * behind span-level duplicate detection. */
  def wordNgramsAll(s: UTF8String, n: Int): ArrayData = {
    val grams = gramArray(s, n)
    val out = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) { out(i) = UTF8String.fromString(grams(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `n3_escape(string) -> string` as a codegen'd unary expression. */
case class N3EscapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"n3_escape needs STRING, got ${child.dataType}")
  override protected def nullSafeEval(v: Any): Any =
    Evaluators.n3Escape(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.n3Escape($c)")
  override protected def withNewChildInternal(c: Expression): N3EscapeExpr = copy(c)
}

/** `simhash64(array<string>) -> bigint` as a codegen'd unary expression. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Evaluators.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(c)
}

/** `word_ngrams(string, n) -> array<string>` as a codegen'd expression:
  * distinct word n-gram shingles in one pass (the shingle tables behind
  * the MinHash/Jaccard/corpus-pipeline queries). */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Evaluators.wordNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.wordNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr =
    copy(child = c)
}

/** `word_ngrams_all(string, n) -> array<string>`: ALL n-grams in token
  * order (non-distinct) — array index = starting token position, so
  * posexplode gives the positional shingle table in one codegen'd pass. */
case class WordNgramsAllExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Evaluators.wordNgramsAll(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.wordNgramsAll($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNgramsAllExpr =
    copy(child = c)
}

object WordNgramsAllExpr {
  /** SQL-path arg check shared by register() and GraftExtensions. */
  def build(exprs: Seq[Expression]): WordNgramsAllExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"word_ngrams_all(text, n) takes 2 arguments, got ${exprs.length}")
    WordNgramsAllExpr(exprs.head,
      WordNgramsExpr.literalN(exprs(1), "word_ngrams_all(text, n): n"))
  }
}

object WordNgramsExpr {
  /** SQL-path arg check: exactly (text, n) with n a positive integer
    * literal — n <= 0 would emit a nonsense single-empty-shingle array. */
  def build(exprs: Seq[Expression]): WordNgramsExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"word_ngrams(text, n) takes 2 arguments, got ${exprs.length}")
    WordNgramsExpr(exprs.head, literalN(exprs(1)))
  }

  def literalN(e: Expression, label: String = "word_ngrams(text, n): n"): Int = {
    val n = (if (e.foldable) e.eval() else null) match {
      case i: java.lang.Integer => i.toInt
      case l: java.lang.Long => l.toInt
      case s: java.lang.Short => s.toInt
      case _ => throw new IllegalArgumentException(
        s"$label must be a constant integer, got $e")
    }
    if (n < 1) throw new IllegalArgumentException(
      s"$label must be >= 1, got $n")
    n
  }
}

/** `hyperplane_buckets(array<double>) -> array<int>`: every band bucket
  * of the multi-band hyperplane sketch, one codegen'd pass per vector.
  * The ±1 sign table is precomputed at plan time and shipped as a codegen
  * reference object — no per-row md5. */
case class HyperplaneBucketsExpr(child: Expression, nBands: Int,
                                 bitsPerBand: Int, dim: Int, seed: String)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(nBands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 30 && dim >= 1,
    s"hyperplane_buckets: bad config ($nBands, $bitsPerBand, $dim)")
  // array<float> (the common ingest type) implicit-casts to array<double>
  // at analysis; anything non-castable is an analysis error, never a
  // getDouble misread over 4-byte-packed floats at runtime. (No explicit
  // result type: AbstractDataType is private[sql]; the inferred
  // Seq[ArrayType] conforms.)
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val signs: Array[Double] =
    Evaluators.hyperplaneSigns(seed, nBands, bitsPerBand, dim)

  override protected def nullSafeEval(v: Any): Any =
    Evaluators.hyperplaneBuckets(v.asInstanceOf[ArrayData], signs,
      nBands, bitsPerBand, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("hpSigns", signs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Evaluators.hyperplaneBuckets($c, $signsRef, " +
        s"$nBands, $bitsPerBand, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketsExpr =
    copy(child = c)
}

/** `minhash_sigs(array<string>, n) -> array<long>`: all n MinHash
  * signatures of a shingle array in one codegen'd pass (element j = min
  * over shingles of the md5-derived hash for permutation j). The "|j"
  * suffix bytes are precomputed at plan time and shipped as a codegen
  * reference object. Deterministic + codegen'd, so projections selecting
  * several elements of one call are subexpression-eliminated to a single
  * evaluation per row. */
case class MinhashSigsExpr(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(n >= 1 && n <= 1024, s"minhash_sigs: bad n ($n)")
  override def inputTypes = Seq(ArrayType(StringType))
  // elements ARE nullable: an empty/all-null shingle array yields null
  // slots (array_min-over-empty parity)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(n)(j => s"|$j".getBytes("UTF-8"))

  override protected def nullSafeEval(v: Any): Any =
    Evaluators.minhashSigs(v.asInstanceOf[ArrayData], suffixes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sufRef = ctx.addReferenceObj("mhSuffixes", suffixes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.minhashSigs($c, $sufRef)")
  }
  override protected def withNewChildInternal(c: Expression): MinhashSigsExpr =
    copy(child = c)
}

object MinhashSigsExpr {
  def build(exprs: Seq[Expression]): MinhashSigsExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"minhash_sigs(shingles, n) takes 2 arguments, got ${exprs.length}")
    MinhashSigsExpr(exprs.head,
      WordNgramsExpr.literalN(exprs(1), "minhash_sigs(shingles, n): n"))
  }
}

/** `dot_double(array<double>, array<double>) -> double`: codegen'd
  * left-fold dot product — the hot inner loop of every cosine query
  * (top-k, near-dup, ANN probe, semantic dedup) and of the norm column
  * (`sqrt(dot_double(v, v))`). Bit-identical to the HOF fold it
  * replaces; equality is pinned by ExpressionsSpec. */
case class DotDoubleExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  // array<float> implicit-casts to array<double> at analysis time
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  // NULL even for non-null inputs: length mismatch or a null element
  // (matching zip_with's null-padded fold) — so never trust child
  // nullability alone
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Evaluators.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
         |java.lang.Double $boxed = graft.functions.Evaluators.dotDouble($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotDoubleExpr = copy(left = l, right = r)
}

object DotDoubleExpr {
  def build(exprs: Seq[Expression]): DotDoubleExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"dot_double(a, b) takes 2 arguments, got ${exprs.length}")
    DotDoubleExpr(exprs.head, exprs(1))
  }
}

/** Serialized-Bloom-filter holder with VALUE equality (an `Array[Byte]`
  * field would compare by reference, so two probes built from equal bytes
  * would never `semanticEquals` — defeating subexpression elimination and
  * plan canonicalization). Deserialization is lazy and happens once per
  * JVM copy of the holder; both the interpreted and codegen paths go
  * through it. Filters here are ~MB (benchmark n-gram sets); a filter in
  * the tens-of-MB range should instead ship via a broadcast variable and
  * a mapPartitions seam, not a plan constant. */
final class BloomHolder(val bytes: Array[Byte]) extends Serializable {
  @transient lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  override def equals(o: Any): Boolean = o match {
    case b: BloomHolder => java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
}

/** `bloom_might_contain(string, <filter bytes>) -> boolean`: membership
  * probe against a pre-built Bloom filter (`org.apache.spark.util.sketch
  * .BloomFilter`, the public `df.stat.bloomFilter` sketch — Spark keeps
  * its own `bloom_filter_agg`/`might_contain` pair off the public
  * registry, so the engine owns the expression). The serialized filter
  * rides the plan as a value-equal [[BloomHolder]]; each executor
  * deserializes it once, so the probe is a per-row hash with NO join,
  * NO shuffle, and no state — which is what makes Bloom-side
  * decontamination of a 100 TB stream a stateless map (Corpus
  * .decontaminateBloom). One-sided error: false positives over-drop
  * (safe direction for decontamination), never false negatives. */
case class BloomContainsExpr(child: Expression, holder: BloomHolder)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any =
    Evaluators.bloomContains(holder.filter, v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHolder", holder,
      classOf[BloomHolder].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.bloomContains($ref.filter(), $c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomContainsExpr =
    copy(child = c)
}

object BloomContainsExpr {
  /** SQL-path arg check: (value, filter) with the filter a constant
    * binary (e.g. a hex literal of the serialized sketch). */
  def build(exprs: Seq[Expression]): BloomContainsExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"bloom_might_contain(value, filter) takes 2 arguments, got ${exprs.length}")
    BloomContainsExpr(exprs.head, new BloomHolder(constBinary(
      exprs(1), "bloom_might_contain")))
  }

  private[functions] def constBinary(e: Expression, fn: String): Array[Byte] =
    (if (e.foldable) e.eval() else null) match {
      case b: Array[Byte] => b
      case _ => throw new IllegalArgumentException(
        s"$fn: filter must be a constant binary")
    }
}

/** `bloom_hits(array<string>, <filter bytes>) -> int`: number of array
  * elements the Bloom filter might contain, in ONE codegen'd pass. This
  * exists because Spark's `filter()` HOF is CodegenFallback — nesting the
  * probe in a lambda would run it interpreted per element (the same trap
  * `word_ngrams` documents). Null array → null; null elements are
  * skipped. */
case class BloomHitsExpr(child: Expression, holder: BloomHolder)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    Evaluators.bloomHits(holder.filter, v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHolder", holder,
      classOf[BloomHolder].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Evaluators.bloomHits($ref.filter(), $c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomHitsExpr =
    copy(child = c)
}

object BloomHitsExpr {
  def build(exprs: Seq[Expression]): BloomHitsExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"bloom_hits(values, filter) takes 2 arguments, got ${exprs.length}")
    BloomHitsExpr(exprs.head, new BloomHolder(BloomContainsExpr.constBinary(
      exprs(1), "bloom_hits")))
  }
}

object HyperplaneBucketsExpr {
  /** SQL-path arg check: (vec, nBands, bitsPerBand, dim, seed), the four
    * config args constant. */
  def build(exprs: Seq[Expression]): HyperplaneBucketsExpr = {
    if (exprs.length != 5)
      throw new IllegalArgumentException("hyperplane_buckets(vec, nBands, " +
        s"bitsPerBand, dim, seed) takes 5 arguments, got ${exprs.length}")
    val seed = (if (exprs(4).foldable) exprs(4).eval() else null) match {
      case s: UTF8String => s.toString
      case _ => throw new IllegalArgumentException(
        "hyperplane_buckets: seed must be a constant string")
    }
    HyperplaneBucketsExpr(exprs.head,
      WordNgramsExpr.literalN(exprs(1), "hyperplane_buckets: nBands"),
      WordNgramsExpr.literalN(exprs(2), "hyperplane_buckets: bitsPerBand"),
      WordNgramsExpr.literalN(exprs(3), "hyperplane_buckets: dim"), seed)
  }
}

object GraftFunctions {
  /** Column-API wrappers. */
  def n3_escape(c: Column): Column =
    ColumnBridge.column(N3EscapeExpr(ColumnBridge.expression(c)))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))
  def word_ngrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(c), n))
  def word_ngrams_all(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsAllExpr(ColumnBridge.expression(c), n))
  def hyperplane_buckets(c: Column, nBands: Int, bitsPerBand: Int,
                         dim: Int, seed: String): Column =
    ColumnBridge.column(HyperplaneBucketsExpr(ColumnBridge.expression(c),
      nBands, bitsPerBand, dim, seed))
  def dot_double(a: Column, b: Column): Column =
    ColumnBridge.column(DotDoubleExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def minhash_sigs(c: Column, n: Int): Column =
    ColumnBridge.column(MinhashSigsExpr(ColumnBridge.expression(c), n))
  def bloom_might_contain(c: Column, filter: Array[Byte]): Column =
    ColumnBridge.column(BloomContainsExpr(ColumnBridge.expression(c),
      new BloomHolder(filter)))
  def bloom_hits(c: Column, filter: Array[Byte]): Column =
    ColumnBridge.column(BloomHitsExpr(ColumnBridge.expression(c),
      new BloomHolder(filter)))

  /** Register for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "n3_escape", exprs => N3EscapeExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNgramsExpr.build(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams_all", exprs => WordNgramsAllExpr.build(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_buckets", exprs => HyperplaneBucketsExpr.build(exprs),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_double", exprs => DotDoubleExpr.build(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinhashSigsExpr.build(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => BloomContainsExpr.build(exprs),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_hits", exprs => BloomHitsExpr.build(exprs), "scala_udf")
  }
}

/** Session extension: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.functions.
  * GraftExtensions`) injects the engine's functions into every session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("n3_escape"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[N3EscapeExpr].getName, "n3_escape"),
      (exprs: Seq[Expression]) => N3EscapeExpr(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64Expr].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordNgramsExpr].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNgramsExpr.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams_all"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordNgramsAllExpr].getName, "word_ngrams_all"),
      (exprs: Seq[Expression]) => WordNgramsAllExpr.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hyperplane_buckets"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HyperplaneBucketsExpr].getName, "hyperplane_buckets"),
      (exprs: Seq[Expression]) => HyperplaneBucketsExpr.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_double"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotDoubleExpr].getName, "dot_double"),
      (exprs: Seq[Expression]) => DotDoubleExpr.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sigs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinhashSigsExpr].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => MinhashSigsExpr.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BloomContainsExpr].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomContainsExpr.build(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_hits"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BloomHitsExpr].getName, "bloom_hits"),
      (exprs: Seq[Expression]) => BloomHitsExpr.build(exprs)))
  }
}
