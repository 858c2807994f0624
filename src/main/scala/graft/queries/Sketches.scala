package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Count–min sketch (Cormode & Muthukrishnan 2005) over the document
  * token stream — fixed-size frequency summaries for heavy-hitter
  * detection at corpus scale. The sketch is depth×width counters
  * (4×1024 here): build = one partial-aggregated groupBy whose shuffle
  * carries at most depth·width rows per map partition REGARDLESS of
  * corpus size, and sketches of disjoint corpus slices merge by
  * cell-wise addition (CmsSpec pins this), so a 100 TB corpus
  * sketches in one pass with bounded memory — the standing summary a
  * training pipeline keeps per source/shard to spot vocabulary drift
  * and heavy-hitter contamination without re-scanning.
  *
  * Everything is deterministic and replayable in ANSI SQL: row hash
  * parameters derive from md5 (the convention the hyperplane sketch
  * oracles already replay), token keys are the first 8 md5 hex digits,
  * and the Carter–Wegman row hash ((a·key + b) mod p) mod w uses a
  * 17-bit `a` so the products stay far below 2^63 in BOTH engines (no
  * overflow divergence). `p` = 2^31 − 1 (Mersenne prime).
  */
object Sketches {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val depth = 4
  private val width = 1024L
  private val prime = 2147483647L // 2^31 - 1

  /** First 8 md5 hex digits of a string as an unsigned 32-bit value —
    * `('0x' || substr(md5(s), 1, 8))::UBIGINT` in the SQL replay. */
  private def md5Int32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Per-row (a, b) hash parameters, md5-derived so the oracle rebuilds
    * them from scratch; a is 17-bit (see class doc). */
  private[queries] val rowParams: Seq[(Int, Long, Long)] =
    (0 until depth).map { i =>
      (i, md5Int32(s"cms|a|$i") % 131071L + 1L, md5Int32(s"cms|b|$i") % prime)
    }

  /** Tokens exactly as q_vocab_topk defines them (whitespace split of
    * trimmed text) with their 32-bit md5 keys. */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    tokensOf(t(s, dir, "documents"))

  /** Tokenize any (text) DataFrame into keyed tokens — the sketch input. */
  def tokensOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .withColumn("key", conv(substring(md5(col("token")), 1, 8), 16, 10)
        .cast("long"))

  private def rowsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    rowParams.toDF("row_i", "a", "b")
  }

  private val bucketCol: Column =
    pmod(col("a") * col("key") + col("b"), lit(prime)) % lit(width)

  /** Build the sketch over a keyed-token DataFrame ([[tokensOf]]) — the
    * merge unit: sketches of disjoint corpus slices sum cell-wise to the
    * whole corpus's sketch (CmsSpec pins it), which is what makes this a
    * one-pass bounded summary on a cluster: every partition/shard/source
    * sketches independently and the cell-wise sum IS the global sketch. */
  def buildSketch(toks: DataFrame): DataFrame =
    toks
      .crossJoin(broadcast(rowsDf(toks.sparkSession)))
      .withColumn("bucket", bucketCol)
      .groupBy(col("row_i").cast("long").as("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The sketch itself: every nonzero cell (row, bucket, count). At most
    * depth·width rows whatever the corpus; the 4-row parameter dim rides
    * a broadcast. */
  def cmsSketch(s: SparkSession, dir: String): DataFrame =
    buildSketch(tokens(s, dir))

  /** CMS point queries vs ground truth for the 30 most frequent tokens:
    * est = min over rows of the addressed cell — always ≥ the true
    * count (CmsSpec pins the invariant corpus-wide). The production
    * read: estimate ANY token's frequency from depth probes of a
    * kilobyte-scale summary instead of a corpus groupBy. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val sketch = cmsSketch(s, dir)
    val truth = tokens(s, dir)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(30)
    val probes = truth
      .withColumn("key", conv(substring(md5(col("token")), 1, 8), 16, 10)
        .cast("long"))
      .crossJoin(broadcast(rowsDf(s)))
      .withColumn("bucket", bucketCol)
      .select(col("token"), col("freq"), col("row_i").cast("long").as("row_i"),
        col("bucket"))
    probes.join(sketch, Seq("row_i", "bucket"))
      .groupBy("token", "freq").agg(min(col("cnt")).as("est"))
  }

  // ---- DuckDB replays ------------------------------------------------

  /** Shared CTEs: tokens with md5 keys, the 4 hash rows with md5-derived
    * (a, b), and the sketch cells. */
  private val cmsCtes: String =
    s"""WITH toks AS (
       |  SELECT token,
       |    CAST(('0x' || substr(md5(token), 1, 8))::UBIGINT AS BIGINT) AS key
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
       |        FROM documents)),
       |hrows AS (
       |  SELECT i AS row_i,
       |    CAST(('0x' || substr(md5('cms|a|' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT % 131071 + 1 AS BIGINT) AS a,
       |    CAST(('0x' || substr(md5('cms|b|' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT % $prime AS BIGINT) AS b
       |  FROM range(0, $depth) ti(i)),
       |cells AS (
       |  SELECT CAST(h.row_i AS BIGINT) AS row_i,
       |    ((h.a * t.key + h.b) % $prime) % $width AS bucket,
       |    COUNT(*) AS cnt
       |  FROM toks t CROSS JOIN hrows h
       |  GROUP BY 1, 2)""".stripMargin

  val cmsSketchSql: String =
    s"""$cmsCtes
       |SELECT row_i, bucket, cnt FROM cells""".stripMargin

  val cmsHeavyHittersSql: String =
    s"""$cmsCtes,
       |truth AS (
       |  SELECT token, COUNT(*) AS freq FROM toks
       |  GROUP BY token ORDER BY freq DESC, token LIMIT 30),
       |probes AS (
       |  SELECT tr.token, tr.freq, CAST(h.row_i AS BIGINT) AS row_i,
       |    ((h.a * CAST(('0x' || substr(md5(tr.token), 1, 8))::UBIGINT AS BIGINT) + h.b) % $prime) % $width AS bucket
       |  FROM truth tr CROSS JOIN hrows h)
       |SELECT p.token, p.freq, MIN(c.cnt) AS est
       |FROM probes p JOIN cells c USING (row_i, bucket)
       |GROUP BY p.token, p.freq""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cms_sketch" -> cmsSketch _,
    "q_cms_heavy_hitters" -> cmsHeavyHitters _)

  val oracles: Map[String, String] = Map(
    "q_cms_sketch" -> cmsSketchSql,
    "q_cms_heavy_hitters" -> cmsHeavyHittersSql)
}
