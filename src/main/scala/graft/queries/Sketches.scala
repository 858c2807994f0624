package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fixed-size mergeable sketches: count–min (Cormode & Muthukrishnan
  * 2005) over the document token stream for heavy-hitter detection, and
  * HyperLogLog (Flajolet et al. 2007) over the fact-row key stream for
  * distinct counting — the two standing summaries a pipeline keeps per
  * source/shard at corpus scale. The CMS is depth×width counters
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

  // ---- HyperLogLog (Flajolet et al. 2007) -----------------------------
  //
  // The distinct-count twin of the CMS: m = 1024 registers summarize a
  // key stream in ≤ m rows, slices merge by register-wise MAX (HllSpec
  // pins it), so per-source/per-shard cardinality tracking at 100 TB is
  // one bounded pass + a kilobyte of standing state per shard. Input
  // here is the lineitem order-key stream — 60k occurrences of ~15k
  // distinct ids at sf0.01 (the raw-estimator regime); at sf0.001 the
  // cardinality sits below 2.5m, exercising the linear-counting branch.
  //
  // Cross-engine determinism: register index = the md5 key mod m; rho
  // (position of the first 1-bit) comes from md5 hex chars 9..23
  // (60 bits) computed ENTIRELY by string ops — count leading '0' hex
  // chars, then a 4-way CASE on the first nonzero nibble — so there is
  // no log2/float anywhere and DuckDB replays the exact integer path.
  // The estimator's harmonic sum is kept exact too: each register
  // contributes 2^(61-rho) to a DECIMAL(38,0)/HUGEINT accumulator
  // (absent registers contribute 2^61), and the only float ops are the
  // final constant/sum division plus the small-range ln — identical
  // IEEE inputs, equal well inside the comparator's 1e-6.

  private val hllM = 1024L
  private val two61 = "2305843009213693952" // 2^61 as an integer literal

  /** alpha_m · m² · 2^61 for m = 1024 — the estimator numerator, embedded
    * as the same double literal in the Spark plan and the SQL replay. */
  private[queries] val hllC: Double =
    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * math.pow(2.0, 61)

  /** The sketch input: one string key per fact row. Cardinality of order
    * ids in the fact stream — the "how many distinct docs/users/sessions
    * did this shard see" question a pipeline answers per source. */
  private def orderKeys(s: SparkSession, dir: String): DataFrame =
    keysOf(t(s, dir, "lineitem")
      .select(col("l_orderkey").cast("string").as("k")))

  /** Key any single-string-column frame for the HLL: the same first-8-hex
    * md5 integer the CMS uses. */
  def keysOf(vals: DataFrame): DataFrame =
    vals.withColumn("key",
      conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long"))

  /** rho of the 60-bit value spelled by a 15-char hex string: leading-zero
    * bit count + 1, via string ops only (see block comment). */
  private def rhoCol(hx: Column): Column = {
    val stripped = ltrim(hx, "0")
    val nib = substring(stripped, 1, 1)
    val nibLz = when(nib === "1", 3)
      .when(nib.isin("2", "3"), 2)
      .when(nib.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(length(stripped) === 0, lit(61))
      .otherwise((lit(15) - length(stripped)) * 4 + nibLz + 1)
  }

  /** The register table over a keyed frame ([[keysOf]]): ≤ m rows,
    * partial-aggregated MAX per map partition, merge unit of the sketch.
    * Runs unchanged on a streaming frame (update/complete mode). */
  def buildHll(keys: DataFrame): DataFrame =
    keys
      .withColumn("idx", pmod(col("key"), lit(hllM)))
      .withColumn("rho", rhoCol(substring(md5(col("k")), 9, 15)))
      .groupBy("idx").agg(max(col("rho")).cast("long").as("maxrho"))

  def hllRegisters(s: SparkSession, dir: String): DataFrame =
    buildHll(orderKeys(s, dir))

  /** Cardinality estimate from the registers vs the exact distinct count,
    * with Flajolet's small-range correction: raw E = C / S while
    * E > 2.5m; below that with empty registers present, linear counting
    * E = m·ln(m/V). Both engines compute raw E from the SAME exact
    * integer S, so they take the same branch by construction. */
  def hllEstimate(s: SparkSession, dir: String): DataFrame = {
    val keys = orderKeys(s, dir)
    val agg = buildHll(keys).agg(
      sum(expr("cast(shiftleft(cast(1 as bigint), cast(61 - maxrho as int)) as decimal(38,0))"))
        .as("s_present"),
      count(lit(1)).as("used"))
    val exact = keys.agg(count_distinct(col("k")).as("n_exact"))
    agg.crossJoin(exact)
      .withColumn("s_total",
        col("s_present") + (lit(hllM) - col("used")) * expr(s"cast($two61 as decimal(38,0))"))
      .withColumn("raw_est", lit(hllC) / col("s_total").cast("double"))
      .withColumn("zeros", lit(hllM) - col("used"))
      .withColumn("hll_est",
        when(col("raw_est") <= lit(2.5 * hllM) && col("zeros") > 0,
          lit(hllM.toDouble) * log(lit(hllM.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw_est")))
      .withColumn("branch",
        when(col("raw_est") <= lit(2.5 * hllM) && col("zeros") > 0, lit("linear"))
          .otherwise(lit("raw")))
      .withColumn("rel_err",
        (col("hll_est") - col("n_exact").cast("double")) / col("n_exact").cast("double"))
      .select(col("n_exact"), col("hll_est"), col("rel_err"), col("branch"),
        col("used").cast("long").as("used_registers"))
  }

  /** Shared CTEs for the SQL replays: keyed order ids + the registers via
    * the same string-only rho derivation. */
  private val hllCtes: String =
    s"""WITH hkeys AS (
       |  SELECT k,
       |    CAST(('0x' || substr(md5(k), 1, 8))::UBIGINT AS BIGINT) AS key
       |  FROM (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem)),
       |regs AS (
       |  SELECT key % $hllM AS idx,
       |    MAX(CASE WHEN stripped = '' THEN 61
       |        ELSE (15 - length(stripped)) * 4 +
       |          (CASE WHEN nib = '1' THEN 3
       |                WHEN nib IN ('2','3') THEN 2
       |                WHEN nib IN ('4','5','6','7') THEN 1
       |                ELSE 0 END) + 1 END) AS maxrho
       |  FROM (SELECT key, stripped, substr(stripped, 1, 1) AS nib
       |        FROM (SELECT key, ltrim(substr(md5(k), 9, 15), '0') AS stripped
       |              FROM hkeys))
       |  GROUP BY 1)""".stripMargin

  val hllRegistersSql: String =
    s"""$hllCtes
       |SELECT idx, CAST(maxrho AS BIGINT) AS maxrho FROM regs""".stripMargin

  val hllEstimateSql: String =
    s"""$hllCtes,
       |agg AS (
       |  SELECT SUM(CAST(CAST(1 AS BIGINT) << CAST(61 - maxrho AS INT) AS HUGEINT)) AS s_present,
       |    COUNT(*) AS used
       |  FROM regs),
       |est AS (
       |  SELECT used,
       |    ${hllC} / CAST(s_present + ($hllM - used) * CAST($two61 AS HUGEINT) AS DOUBLE) AS raw_est,
       |    $hllM - used AS zeros
       |  FROM agg)
       |SELECT (SELECT COUNT(DISTINCT k) FROM hkeys) AS n_exact,
       |  CASE WHEN raw_est <= ${2.5 * hllM} AND zeros > 0
       |    THEN ${hllM.toDouble} * ln(${hllM.toDouble} / CAST(zeros AS DOUBLE))
       |    ELSE raw_est END AS hll_est,
       |  (CASE WHEN raw_est <= ${2.5 * hllM} AND zeros > 0
       |    THEN ${hllM.toDouble} * ln(${hllM.toDouble} / CAST(zeros AS DOUBLE))
       |    ELSE raw_est END
       |    - CAST((SELECT COUNT(DISTINCT k) FROM hkeys) AS DOUBLE))
       |    / CAST((SELECT COUNT(DISTINCT k) FROM hkeys) AS DOUBLE) AS rel_err,
       |  CASE WHEN raw_est <= ${2.5 * hllM} AND zeros > 0
       |    THEN 'linear' ELSE 'raw' END AS branch,
       |  CAST(used AS BIGINT) AS used_registers
       |FROM est""".stripMargin

  // ---- Equi-width histogram quantiles ---------------------------------
  //
  // The third standing summary: a fixed-width histogram over a measure
  // column. Size is bounded by domain/width (not data size), slices
  // merge by bucket-wise ADDITION like the CMS, and any quantile reads
  // off the cumulative counts with one interpolation — the one-pass
  // mergeable alternative to sorting 100 TB for an exact percentile
  // (and the summary a pipeline keeps per shard/day to watch price or
  // length distributions drift). Everything before the final
  // interpolation is integer; the bucket id itself is floor(x/width),
  // a single IEEE divide+floor both engines share.

  private val histWidth = 1000.0 // price units per bucket
  private val histPs = Seq(0.5, 0.9, 0.99)

  /** The merge unit: (bucket, cnt) over any slice. */
  def buildHist(vals: DataFrame): DataFrame =
    vals.select(floor(col("x") / lit(histWidth)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  private def prices(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))

  def histSketch(s: SparkSession, dir: String): DataFrame =
    buildHist(prices(s, dir))

  /** Quantile estimates from the histogram: rank target = floor(p·n)+1,
    * walk the cumulative counts to the covering bucket, interpolate
    * linearly inside it. The window cumsum runs over the BOUNDED
    * histogram (≤ domain/width rows), not the data — single-partition
    * there is the point, not a bottleneck. */
  def histQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s2 = s
    import s2.implicits._
    val hist = histSketch(s, dir)
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val total = hist.agg(sum(col("cnt")).as("total"))
    val targets = histPs.toDF("p").crossJoin(broadcast(total))
      .select(col("p"),
        (floor(col("p") * col("total")).cast("long") + 1L).as("target"))
    val pick = broadcast(targets).as("t")
      .join(cum.as("c"), expr("c.cum_before + c.cnt >= t.target"))
      .groupBy(col("t.p").as("p"), col("t.target").as("target"))
      .agg(min(col("c.bucket")).as("bucket"))
    pick.join(cum, Seq("bucket"))
      .select(col("p"),
        (col("bucket") * lit(histWidth) + lit(histWidth) *
          (col("target") - col("cum_before")).cast("double") /
          col("cnt").cast("double")).as("est"))
  }

  private val histCtes: String =
    s"""WITH h AS (
       |  SELECT CAST(floor(l_extendedprice / $histWidth) AS BIGINT) AS bucket,
       |    COUNT(*) AS cnt
       |  FROM lineitem GROUP BY 1)""".stripMargin

  val histSketchSql: String =
    s"""$histCtes
       |SELECT bucket, cnt FROM h""".stripMargin

  val histQuantilesSql: String =
    s"""$histCtes,
       |c AS (
       |  SELECT bucket, cnt,
       |    COALESCE(SUM(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM h),
       |n AS (SELECT SUM(cnt) AS total FROM h),
       |tgt AS (
       |  SELECT p, CAST(floor(p * total) AS BIGINT) + 1 AS target
       |  FROM (VALUES (0.5), (0.9), (0.99)) ps(p), n),
       |pick AS (
       |  SELECT t.p, t.target, MIN(c.bucket) AS bucket
       |  FROM tgt t JOIN c ON c.cum_before + c.cnt >= t.target
       |  GROUP BY 1, 2)
       |SELECT p.p, p.bucket * $histWidth + $histWidth *
       |    CAST(p.target - c.cum_before AS DOUBLE) / CAST(c.cnt AS DOUBLE) AS est
       |FROM pick p JOIN c ON p.bucket = c.bucket""".stripMargin

  /** Sliding-window distinct users via per-hour HLL merge — the reason
    * sketches are kept PER BUCKET: any window's distinct estimate is a
    * register-wise MAX over its buckets' sketches (the HllSpec merge
    * law), so a 3-hour sliding estimate touches ≤ 3·m register rows per
    * window instead of re-scanning three hours of events — at 100 TB
    * the events are scanned ONCE (building hourly registers) and every
    * window after that is sketch algebra. Windows are the observed
    * hours; each covers [h−2, h]. The exact count (same window algebra
    * over distinct (hour, user) pairs) rides along, so the estimate's
    * error is graded per window, branch included. */
  def hllSliding(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(expr("(unix_micros(ts) div 1000) div 3600000").as("h"),
        col("user_id").cast("string").as("k"))
    val hours = ev.select("h").distinct()
    val regs = buildHllKeyed(ev)
    val wregs = regs
      .withColumn("w", explode(array(col("h"), col("h") + 1, col("h") + 2)))
      .join(hours.select(col("h").as("w")), "w")
      .groupBy("w", "idx").agg(max(col("maxrho")).as("maxrho"))
    val agg = wregs.groupBy("w").agg(
      sum(expr("cast(shiftleft(cast(1 as bigint), cast(61 - maxrho as int)) as decimal(38,0))"))
        .as("s_present"),
      count(lit(1)).as("used"))
    val exact = ev.dropDuplicates("h", "k")
      .withColumn("w", explode(array(col("h"), col("h") + 1, col("h") + 2)))
      .join(hours.select(col("h").as("w")), "w")
      .groupBy("w").agg(count_distinct(col("k")).as("n_exact"))
    agg.join(exact, "w")
      .withColumn("s_total",
        col("s_present") + (lit(hllM) - col("used")) * expr(s"cast($two61 as decimal(38,0))"))
      .withColumn("raw_est", lit(hllC) / col("s_total").cast("double"))
      .withColumn("zeros", lit(hllM) - col("used"))
      .withColumn("hll_est",
        when(col("raw_est") <= lit(2.5 * hllM) && col("zeros") > 0,
          lit(hllM.toDouble) * log(lit(hllM.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw_est")))
      .withColumn("branch",
        when(col("raw_est") <= lit(2.5 * hllM) && col("zeros") > 0, lit("linear"))
          .otherwise(lit("raw")))
      .select(col("w").as("window_h"), col("n_exact"),
        round(col("hll_est"), 4).as("hll_est"), col("branch"),
        col("used").cast("long").as("used_registers"))
  }

  /** Per-hour register table: [[buildHll]] keyed by the hour column. */
  private def buildHllKeyed(ev: DataFrame): DataFrame =
    ev.withColumn("key",
        conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long"))
      .withColumn("idx", pmod(col("key"), lit(hllM)))
      .withColumn("rho", rhoCol(substring(md5(col("k")), 9, 15)))
      .groupBy("h", "idx").agg(max(col("rho")).cast("long").as("maxrho"))

  val hllSlidingSql: String =
    s"""WITH ev AS (SELECT epoch_ms(ts) // 3600000 AS h,
       |    CAST(user_id AS VARCHAR) AS k FROM events),
       |hrs AS (SELECT DISTINCT h FROM ev),
       |hkeys AS (SELECT h, k,
       |  CAST(('0x' || substr(md5(k), 1, 8))::UBIGINT AS BIGINT) AS key FROM ev),
       |regs AS (
       |  SELECT h, key % $hllM AS idx,
       |    MAX(CASE WHEN stripped = '' THEN 61
       |        ELSE (15 - length(stripped)) * 4 +
       |          (CASE WHEN nib = '1' THEN 3
       |                WHEN nib IN ('2','3') THEN 2
       |                WHEN nib IN ('4','5','6','7') THEN 1
       |                ELSE 0 END) + 1 END) AS maxrho
       |  FROM (SELECT h, key, stripped, substr(stripped, 1, 1) AS nib
       |        FROM (SELECT h, key, ltrim(substr(md5(k), 9, 15), '0') AS stripped
       |              FROM hkeys))
       |  GROUP BY 1, 2),
       |mreg AS (SELECT w.h AS w, r.idx, MAX(r.maxrho) AS maxrho
       |  FROM regs r JOIN hrs w ON w.h BETWEEN r.h AND r.h + 2
       |  GROUP BY 1, 2),
       |agg AS (SELECT w,
       |  SUM(CAST(CAST(1 AS BIGINT) << CAST(61 - maxrho AS INT) AS HUGEINT)) AS s_present,
       |  COUNT(*) AS used FROM mreg GROUP BY w),
       |ex AS (SELECT w.h AS w, CAST(COUNT(DISTINCT e.k) AS BIGINT) AS n_exact
       |  FROM (SELECT DISTINCT h, k FROM ev) e
       |  JOIN hrs w ON w.h BETWEEN e.h AND e.h + 2
       |  GROUP BY 1),
       |est AS (SELECT a.w, ex.n_exact, a.used,
       |  $hllC / CAST(a.s_present + ($hllM - a.used) * CAST($two61 AS HUGEINT) AS DOUBLE) AS raw_est,
       |  $hllM - a.used AS zeros
       |  FROM agg a JOIN ex USING (w))
       |SELECT w AS window_h, n_exact,
       |  round(CASE WHEN raw_est <= ${2.5 * hllM} AND zeros > 0
       |    THEN ${hllM.toDouble} * ln(${hllM.toDouble} / CAST(zeros AS DOUBLE))
       |    ELSE raw_est END, 4) AS hll_est,
       |  CASE WHEN raw_est <= ${2.5 * hllM} AND zeros > 0
       |    THEN 'linear' ELSE 'raw' END AS branch,
       |  CAST(used AS BIGINT) AS used_registers
       |FROM est""".stripMargin

  /** Sliding-window quantiles from per-hour histograms — the ADD-merge
    * twin of [[hllSliding]]: hourly (bucket, cnt) histograms over the
    * event values merge bucket-wise by ADDITION into every 3-hour
    * window, and p50/p90/p99 interpolate from each window's cumulative
    * counts. The events are scanned once; each window is sketch algebra
    * over ≤ domain/width bucket rows, and the cumsum window is keyed by
    * (window, bucket) — bounded per key, never a global sort. Together
    * with [[hllSliding]] both standing-summary merge laws (MAX for HLL
    * registers, ADD for histogram buckets) are exercised INSIDE graded
    * queries, not just pinned in specs. */
  def histSliding(s: SparkSession, dir: String): DataFrame = {
    val W = 10.0 // value units per bucket (event values span 0..~500)
    val s2 = s
    import s2.implicits._
    val ev = t(s, dir, "events")
      .select(expr("(unix_micros(ts) div 1000) div 3600000").as("h"),
        floor(col("value") / lit(W)).cast("long").as("bucket"))
    val hrs = ev.select("h").distinct()
    val hh = ev.groupBy("h", "bucket").agg(count(lit(1)).as("cnt"))
    val merged = hh
      .withColumn("w", explode(array(col("h"), col("h") + 1, col("h") + 2)))
      .join(hrs.select(col("h").as("w")), "w")
      .groupBy("w", "bucket").agg(sum(col("cnt")).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = merged.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(win), lit(0L)))
    val total = merged.groupBy("w").agg(sum(col("cnt")).as("total"))
    val targets = total
      .withColumn("p", explode(array(histPs.map(lit): _*)))
      .select(col("w"), col("p"),
        (floor(col("p") * col("total")).cast("long") + 1L).as("target"))
    val pick = targets.as("t")
      .join(cum.as("c"),
        col("t.w") === col("c.w") &&
          expr("c.cum_before + c.cnt >= t.target"))
      .groupBy(col("t.w").as("w"), col("t.p").as("p"),
        col("t.target").as("target"))
      .agg(min(col("c.bucket")).as("bucket"))
    pick.join(cum, Seq("w", "bucket"))
      .select(col("w").as("window_h"), col("p"),
        (col("bucket") * lit(W) + lit(W) *
          (col("target") - col("cum_before")).cast("double") /
          col("cnt").cast("double")).as("est"))
  }

  val histSlidingSql: String =
    s"""WITH ev AS (SELECT epoch_ms(ts) // 3600000 AS h,
       |    CAST(floor(value / 10.0) AS BIGINT) AS bucket FROM events),
       |hrs AS (SELECT DISTINCT h FROM ev),
       |hh AS (SELECT h, bucket, count(*) AS cnt FROM ev GROUP BY 1, 2),
       |m AS (SELECT w.h AS w, x.bucket, CAST(SUM(x.cnt) AS BIGINT) AS cnt
       |  FROM hh x JOIN hrs w ON w.h BETWEEN x.h AND x.h + 2 GROUP BY 1, 2),
       |c AS (SELECT w, bucket, cnt,
       |  COALESCE(SUM(cnt) OVER (PARTITION BY w ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM m),
       |n AS (SELECT w, SUM(cnt) AS total FROM m GROUP BY w),
       |tgt AS (SELECT n.w, p, CAST(floor(p * total) AS BIGINT) + 1 AS target
       |  FROM (VALUES (0.5), (0.9), (0.99)) ps(p), n),
       |pick AS (SELECT t.w, t.p, t.target, MIN(c.bucket) AS bucket
       |  FROM tgt t JOIN c ON c.w = t.w AND c.cum_before + c.cnt >= t.target
       |  GROUP BY 1, 2, 3)
       |SELECT p.w AS window_h, p.p,
       |  p.bucket * 10.0 + 10.0 * CAST(p.target - c.cum_before AS DOUBLE)
       |    / CAST(c.cnt AS DOUBLE) AS est
       |FROM pick p JOIN c ON c.w = p.w AND c.bucket = p.bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hist_sliding" -> histSliding _,
    "q_hll_sliding" -> hllSliding _,
    "q_cms_sketch" -> cmsSketch _,
    "q_cms_heavy_hitters" -> cmsHeavyHitters _,
    "q_hll_registers" -> hllRegisters _,
    "q_hll_estimate" -> hllEstimate _,
    "q_hist_sketch" -> histSketch _,
    "q_hist_quantiles" -> histQuantiles _)

  val oracles: Map[String, String] = Map(
    "q_hist_sliding" -> histSlidingSql,
    "q_hll_sliding" -> hllSlidingSql,
    "q_cms_sketch" -> cmsSketchSql,
    "q_cms_heavy_hitters" -> cmsHeavyHittersSql,
    "q_hll_registers" -> hllRegistersSql,
    "q_hll_estimate" -> hllEstimateSql,
    "q_hist_sketch" -> histSketchSql,
    "q_hist_quantiles" -> histQuantilesSql)
}
