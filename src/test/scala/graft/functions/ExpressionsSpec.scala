package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.N3

class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("n3_escape expression matches the pure implementation") {
    GraftFunctions.register(spark)
    val inputs = Seq("plain", "line\nbreak", "quote\"q", "tab\there", "back\\slash")
    val df = inputs.toDF("s")
    val viaCol = df.select(GraftFunctions.n3_escape($"s").as("e"))
      .as[String].collect().toSeq
    val viaSql = df.selectExpr("n3_escape(s) AS e").as[String].collect().toSeq
    val expected = inputs.map(N3.escapeLiteral)
    assert(viaCol == expected)
    assert(viaSql == expected)
  }

  test("simhash64: similar token sets have small hamming distance") {
    GraftFunctions.register(spark)
    val base = (1 to 60).map(i => s"token$i")
    val near = base.updated(0, "changed").updated(1, "words")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq(("base", base), ("near", near), ("far", far)).toDF("id", "toks")
    val out = df.select($"id", GraftFunctions.simhash64($"toks").as("h"))
      .as[(String, Long)].collect().toMap
    val dNear = Evaluators.hamming64(out("base"), out("near"))
    val dFar = Evaluators.hamming64(out("base"), out("far"))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
    assert(dNear <= 16)
    // deterministic across Column and SQL paths
    val viaSql = df.selectExpr("id", "simhash64(toks) AS h")
      .as[(String, Long)].collect().toMap
    assert(viaSql == out)
  }

  test("expressions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // a real scan, so the plan has codegen stages (local relations fold)
    val df = graft.Tables(spark, graft.TestSpark.sf0001, "part")
      .select(GraftFunctions.n3_escape($"p_name").as("e"),
        GraftFunctions.simhash64(split($"p_name", " ")).as("h"))
    val hasCodegenStage = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegenStage, df.queryExecution.executedPlan.toString)
    assert(df.count() > 0)
  }

  test("bloom_might_contain: no false negatives, SQL form, codegen span") {
    GraftFunctions.register(spark)
    val items = graft.Tables(spark, graft.TestSpark.sf0001, "part")
      .select($"p_name".as("s"))
    val bf = items.stat.bloomFilter("s", 10000, 0.001)
    val os = new java.io.ByteArrayOutputStream(); bf.writeTo(os)
    val bytes = os.toByteArray

    // every inserted item answers true (the Bloom guarantee the
    // decontaminator leans on: contaminated docs can never slip through)
    val probed = items.select(
      GraftFunctions.bloom_might_contain($"s", bytes).as("hit"))
    assert(probed.filter(!$"hit").count() == 0)
    // absent items are overwhelmingly rejected at this fpp
    val miss = items.select(GraftFunctions.bloom_might_contain(
      concat($"s", lit("|NOT-A-PART")), bytes).as("hit"))
    assert(miss.filter($"hit").count() == 0)
    // null in, null out
    assert(items.select(GraftFunctions.bloom_might_contain(
      lit(null).cast("string"), bytes).as("hit"))
      .filter($"hit".isNotNull).count() == 0)
    // the probe runs inside a whole-stage codegen span
    assert(probed.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      probed.queryExecution.executedPlan.toString)
    // SQL registry path: constant binary literal form
    val hex = bytes.map("%02x".format(_)).mkString
    val viaSql = items.selectExpr(s"bloom_might_contain(s, X'$hex') AS hit")
    assert(viaSql.filter(!$"hit").count() == 0)

    // bloom_hits (the one-pass array form the decontaminator uses, since
    // filter() HOFs are CodegenFallback): equals the per-element probe
    val docs = graft.Tables(spark, graft.TestSpark.sf0001, "documents")
      .select(GraftFunctions.word_ngrams($"text", 5).as("gs"))
    val parity = docs.select(
      GraftFunctions.bloom_hits($"gs", bytes).as("fast"),
      size(filter($"gs",
        g => GraftFunctions.bloom_might_contain(g, bytes))).as("hof"))
    assert(parity.filter(!($"fast" <=> $"hof")).count() == 0)
    // null array -> null; stays in a codegen span
    assert(docs.limit(1).select(GraftFunctions.bloom_hits(
      lit(null).cast("array<string>"), bytes).as("h"))
      .head().isNullAt(0))
    assert(parity.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      parity.queryExecution.executedPlan.toString)
    // value-equal holders: two probes from equal bytes canonicalize
    // together (Array[Byte] fields would compare by reference)
    val probeChild = org.apache.spark.sql.catalyst.expressions.Literal("x")
    val e1 = graft.functions.BloomContainsExpr(probeChild,
      new graft.functions.BloomHolder(bytes.clone()))
    val e2 = graft.functions.BloomContainsExpr(probeChild,
      new graft.functions.BloomHolder(bytes.clone()))
    assert(e1 == e2 && e1.semanticEquals(e2))
  }

  test("word_ngrams matches the HOF column formulation on real documents") {
    GraftFunctions.register(spark)
    // real corpus + adversarial edges: blank, 1-2 tokens, repeated grams,
    // leading/trailing spaces, multi-space runs, leading tab (Spark trim
    // strips ASCII spaces ONLY — the native expr must replicate that)
    val docs = graft.Tables(spark, graft.TestSpark.sf0001, "documents")
      .select($"text").as[String].collect().toSeq ++ Seq(
      "", " ", "one", "one two", "a b c", "a b c a b c a b c",
      "  padded   with   runs  ", "\ttab lead x y z",
      // trailing non-space whitespace: Spark split KEEPS the trailing
      // empty token (limit -1) — regression for the Java split(limit 0)
      // divergence
      "x y z\t", "a b c\n", "one two\t")
    val df = docs.toDF("text").withColumn("w", split(trim($"text"), "\\s+"))
    val native = df.select(GraftFunctions.word_ngrams($"text", 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    val viaHof = df.select(graft.queries.TextOps.shinglesHof.as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(native == viaHof)
    // SQL path agrees too
    val viaSql = df.selectExpr("word_ngrams(text, 3) AS sh")
      .as[Seq[String]].collect().toSeq
    assert(viaSql == native)
  }

  test("word_ngrams_all: positional grams match the HOF form, index = position") {
    GraftFunctions.register(spark)
    val docs = graft.Tables(spark, graft.TestSpark.sf0001, "documents")
      .select($"text").as[String].collect().toSeq ++ Seq(
      "", " ", "one", "one two", "a b c", "a b c a b c a b c",
      "  padded   with   runs  ", "\ttab lead x y z",
      "x y z\t", "a b c\n", "one two\t")
    val df = docs.toDF("text").withColumn("w", split(trim($"text"), "\\s+"))
    val native = df.select(GraftFunctions.word_ngrams_all($"text", 3).as("gs"))
      .as[Seq[String]].collect().toSeq
    // HOF twin: ALL grams in order, index i-1 = starting token position
    val hof = expr("CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
      "i -> concat_ws(' ', slice(w, i, 3))) ELSE array() END")
    val viaHof = df.select(hof.cast("array<string>").as("gs"))
      .as[Seq[String]].collect().toSeq
    assert(native == viaHof)
    // non-distinct, in order: repeated grams keep every occurrence
    val rep = spark.sql("SELECT word_ngrams_all('a b a b a b', 2) AS gs")
      .as[Seq[String]].head()
    assert(rep == Seq("a b", "b a", "a b", "b a", "a b"))
    // length law: max(0, tokens - n + 1) — posexplode positions are dense
    assert(native.zip(viaHof).forall { case (a, b) => a.length == b.length })
    // stays inside whole-stage codegen over a real scan
    val planned = graft.Tables(spark, graft.TestSpark.sf0001, "documents")
      .select(GraftFunctions.word_ngrams_all($"text", 5).as("gs"))
    assert(planned.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      planned.queryExecution.executedPlan.toString)
  }

  test("hyperplane_buckets matches the HOF sketch formulation exactly") {
    GraftFunctions.register(spark)
    import graft.similarity.{SemanticDedupIndex, SemanticSketch}
    // real embeddings + adversarial edges: short vector, zero vector,
    // null elements, over-long vector (tail must be ignored identically)
    val sk = SemanticSketch(nBands = 3, bitsPerBand = 8, dim = 64)
    val edges = Seq(
      Seq(1.0, -2.0),                       // shorter than dim
      Seq.fill(64)(0.0),                    // zero vector
      Seq.tabulate(70)(i => i - 35.0),      // longer than dim
      Seq.tabulate(64)(i => math.sin(i.toDouble)))
    // null ELEMENTS and a NaN element: the native isNullAt-skip must equal
    // the HOF coalesce→0, and a NaN projection must set the bit in BOTH
    // forms (Spark orders NaN above everything — Java's `> 0` does not)
    val nullish = spark.sql(
      """SELECT array(1.0d, CAST(NULL AS DOUBLE), -3.0d) AS v
        |UNION ALL SELECT array(CAST('NaN' AS DOUBLE), 2.0d) AS v""".stripMargin)
    val base = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .select($"embedding".cast("array<double>").as("v"))
      .union(edges.toDF("v"))
      .union(nullish)
    val native = base.select(GraftFunctions
        .hyperplane_buckets($"v", sk.nBands, sk.bitsPerBand, sk.dim, sk.seed)
        .as("b"))
      .as[Seq[Int]].collect().toSeq
    val viaHof = base.select(SemanticDedupIndex.bucketsHof(sk).as("b"))
      .as[Seq[Int]].collect().toSeq
    assert(native == viaHof)
    // the NaN row's projections are all NaN → every bit set in every band
    assert(native.last == Seq.fill(sk.nBands)((1 << sk.bitsPerBand) - 1),
      s"NaN vector must set all bits: ${native.last}")
    // SQL path agrees, and array<float> implicit-casts (no getDouble
    // misread); a NULL vector row yields NULL (nullSafeEval)
    val viaSql = base.selectExpr(
        s"hyperplane_buckets(v, ${sk.nBands}, ${sk.bitsPerBand}, ${sk.dim}, '${sk.seed}') AS b")
      .as[Seq[Int]].collect().toSeq
    assert(viaSql == native)
    val asFloat = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .selectExpr(s"hyperplane_buckets(embedding, ${sk.nBands}, " +
        s"${sk.bitsPerBand}, ${sk.dim}, '${sk.seed}') AS b")
      .as[Seq[Int]].collect().toSeq
    val asDouble = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .select(GraftFunctions.hyperplane_buckets(
        $"embedding".cast("array<double>"), sk.nBands, sk.bitsPerBand,
        sk.dim, sk.seed).as("b"))
      .as[Seq[Int]].collect().toSeq
    assert(asFloat == asDouble)
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS v")
      .selectExpr(s"hyperplane_buckets(v, 3, 8, 64, 'hp') AS b").collect()
    assert(nullRow(0).isNullAt(0))
    // stays inside whole-stage codegen over a real scan
    val df = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .select(GraftFunctions.hyperplane_buckets(
        $"embedding".cast("array<double>"), 3, 8, 64, "hp").as("b"))
    assert(df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      df.queryExecution.executedPlan.toString)
  }

  test("dot_double matches the aggregate/zip_with fold bit-for-bit") {
    GraftFunctions.register(spark)
    // real embedding pairs + adversarial edges: empty arrays (fold's zero
    // element → 0.0), length mismatch (zip_with null-pads → NULL), null
    // element (poisons the fold → NULL), NaN / ±Inf propagation (must be
    // bit-identical, incl. Inf + -Inf = NaN mid-fold)
    val emb = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .select($"embedding".cast("array<double>").as("a"))
      .withColumn("b", reverse($"a"))
    val edges = spark.sql(
      """SELECT array() AS a, array() AS b
        |UNION ALL SELECT array(1.0d, 2.0d), array(3.0d)
        |UNION ALL SELECT array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)
        |UNION ALL SELECT array(CAST('NaN' AS DOUBLE), 2.0d), array(1.0d, 1.0d)
        |UNION ALL SELECT array(CAST('Infinity' AS DOUBLE), 1.0d),
        |  array(1.0d, CAST('-Infinity' AS DOUBLE))
        |UNION ALL SELECT array(1e308d, 1e308d, -1e308d), array(2.0d, 1.0d, 2.0d)
        |""".stripMargin)
    val base = emb.select($"a".cast("array<double>"), $"b".cast("array<double>"))
      .union(edges)
    // doubleToLongBits, not Raw: NaN PAYLOADS may differ between the two
    // paths (UnsafeRowWriter canonicalizes NaN to 0x7ff8... on write, but
    // constant-folded literal plans skip that writer — x86's Inf + -Inf
    // hardware QNaN keeps its sign bit there); canonicalized bits are
    // still exact for every non-NaN value including -0.0 and ±Inf
    def bits(df: org.apache.spark.sql.DataFrame): Seq[Option[Long]] =
      df.as[Option[Double]].collect().toSeq
        .map(_.map(java.lang.Double.doubleToLongBits))
    val hofDot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    assert(bits(base.select(GraftFunctions.dot_double($"a", $"b"))) ==
      bits(base.select(hofDot)))
    // norm form: dot(a, a) ≡ aggregate(transform(a, x*x)) bit-for-bit
    val hofNorm = aggregate(transform($"a", x => x * x),
      lit(0.0), (acc, x) => acc + x)
    assert(bits(base.select(GraftFunctions.dot_double($"a", $"a"))) ==
      bits(base.select(hofNorm)))
    // SQL path + array<float> implicit cast agree with the Column path
    val viaSql = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .selectExpr("dot_double(embedding, embedding) AS d")
    val viaCol = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .select(GraftFunctions.dot_double(
        $"embedding".cast("array<double>"), $"embedding".cast("array<double>")))
    assert(bits(viaSql) == bits(viaCol))
    // a NULL array input yields NULL (nullSafeEval)
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS v")
      .selectExpr("dot_double(v, array(1.0d)) AS d").collect()
    assert(nullRow(0).isNullAt(0))
    // stays inside whole-stage codegen over a real scan
    val df = graft.Tables(spark, graft.TestSpark.sf0001, "embeddings")
      .select(GraftFunctions.dot_double(
        $"embedding".cast("array<double>"),
        $"embedding".cast("array<double>")).as("d"))
    assert(df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      df.queryExecution.executedPlan.toString)
  }

  test("minhash_sigs matches the array_min/transform md5 column form") {
    GraftFunctions.register(spark)
    // real shingle tables + edges: empty array (→ all-null slots, like
    // array_min over empty), single shingle, null ELEMENT (transform maps
    // it to a null hash; array_min skips nulls), duplicate shingles
    val real = graft.Tables(spark, graft.TestSpark.sf0001, "documents")
      .select(GraftFunctions.word_ngrams($"text", 3).as("sh"))
    val edges = spark.sql(
      """SELECT array()::ARRAY<STRING> AS sh
        |UNION ALL SELECT array('only one')
        |UNION ALL SELECT array('a b c', CAST(NULL AS STRING), 'a b c')
        |UNION ALL SELECT array(CAST(NULL AS STRING))""".stripMargin)
    val base = real.union(edges)
    val native = base.select((0 until 4).map(j =>
        element_at(GraftFunctions.minhash_sigs($"sh", 4), j + 1).as(s"mh$j")): _*)
      .as[(Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    val viaHof = base.select((0 until 4).map(j =>
        graft.queries.TextOps.mhHof(j).as(s"mh$j")): _*)
      .as[(Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(native == viaHof)
    // SQL path agrees; values are unsigned 32-bit
    val viaSql = base.selectExpr(
        "element_at(minhash_sigs(sh, 4), 1) AS mh0",
        "element_at(minhash_sigs(sh, 4), 2) AS mh1",
        "element_at(minhash_sigs(sh, 4), 3) AS mh2",
        "element_at(minhash_sigs(sh, 4), 4) AS mh3")
      .as[(Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(viaSql == native)
    assert(native.flatMap(t => Seq(t._1, t._2, t._3, t._4).flatten)
      .forall(v => v >= 0L && v <= 0xffffffffL))
    // a NULL shingle-array input yields NULL (nullSafeEval)
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS sh")
      .selectExpr("minhash_sigs(sh, 4) AS m").collect()
    assert(nullRow(0).isNullAt(0))
    // stays inside whole-stage codegen over a real scan
    val df = graft.Tables(spark, graft.TestSpark.sf0001, "documents")
      .select(GraftFunctions.minhash_sigs(
        GraftFunctions.word_ngrams($"text", 3), 4).as("m"))
    assert(df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      df.queryExecution.executedPlan.toString)
  }

  test("word_ngrams rejects bad arity and non-positive n with clear errors") {
    GraftFunctions.register(spark)
    val e1 = intercept[Exception](spark.sql("SELECT word_ngrams('a b c')").collect())
    assert(e1.getMessage.contains("takes 2 arguments") ||
      Option(e1.getCause).exists(_.getMessage.contains("takes 2 arguments")), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("SELECT word_ngrams('a b c', 0)").collect())
    assert(e2.getMessage.contains("n must be >= 1") ||
      Option(e2.getCause).exists(_.getMessage.contains("n must be >= 1")), e2.getMessage)
    // BIGINT literal n works (the blind-cast used to ClassCastException)
    assert(spark.sql("SELECT word_ngrams('a b c d', CAST(3 AS BIGINT)) AS sh")
      .collect()(0).getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("GraftExtensions injects every engine function at session build") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val prev = TestSpark.spark
    // a genuinely extension-built session on the same SparkContext:
    // clearing active/default makes getOrCreate construct a NEW session,
    // and THAT is the only path where withExtensions actually applies
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val names = Seq("n3_escape", "simhash64", "word_ngrams",
        "word_ngrams_all", "hyperplane_buckets", "dot_double",
        "minhash_sigs", "bloom_might_contain", "bloom_hits")
      names.foreach(n => assert(
        s2.sessionState.functionRegistry.functionExists(FunctionIdentifier(n)),
        s"$n not injected"))
      // injected functions resolve and compute (no temp-function call)
      assert(s2.sql("SELECT n3_escape('a\nb') AS e")
        .collect()(0).getString(0) == "a\\nb")
      assert(s2.sql("SELECT word_ngrams_all('a b a b', 2) AS g")
        .collect()(0).getSeq[String](0) == Seq("a b", "b a", "a b"))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
