package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.Tables.{dec2, epochMs}
import graft.functions.GraftFunctions

/** Second analytics batch: sessionization (gap-based), ntile bucketing,
  * CUBE grouping, Levenshtein near-dup on entity names, a wide scalar
  * string-function surface, and the banded SimHash near-dup pair query
  * (oracle-graded: its 60-bit md5 fingerprint replays in DuckDB — see
  * [[simhashNearDup]]).
  */
object Sessions {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Gap-based sessionization: a >30-minute silence starts a new session —
    * lag + cumulative sum over one keyed window (one shuffle). */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("ms", epochMs("ts"))
      .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(w))
      .withColumn("is_new", when(col("gap_ms").isNull ||
        col("gap_ms") > 30 * 60 * 1000, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("session_start"),
        max(col("ms")).as("session_end"),
        sum(dec2(col("value"))).cast("double").as("session_value"))
  }

  val sessionizeSql: String =
    """SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ms) AS session_start, MAX(ms) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT user_id, ms, value,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
      |      CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000
      |        OR lag(epoch_ms(ts), 1) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS is_new
      |    FROM events))
      |GROUP BY user_id, session_id""".stripMargin

  /** NTILE quartiles by account balance within segment. */
  def ntileBuckets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"))
  }

  val ntileBucketsSql: String =
    """SELECT c_custkey, c_mktsegment,
      |  ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
      |FROM customer""".stripMargin

  /** CUBE over (priority, status): all grouping combinations. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"), col("n"))

  val cubeAggSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin

  /** Fuzzy (edit-distance) near-dup over part names, done right for
    * scale: exact-dedup to the distinct-name dictionary FIRST (hash
    * groupBy — rows collapse by orders of magnitude), fuzzy-match the
    * dictionary pairwise within brand, and carry each name's row count.
    * Row-level pairing would pay |rows|^2 edit distances for identical
    * strings; dictionary-level pairing pays |distinct names|^2. */
  def levenshteinPairs(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part")
      .groupBy(col("p_brand"), col("p_name"))
      .agg(count(lit(1)).as("n_rows"), min(col("p_partkey")).as("rep_id"))
    val a = names.select(col("p_brand"), col("p_name").as("n1"),
      col("n_rows").as("rows1"), col("rep_id").as("rep1"))
    val b = names.select(col("p_brand"), col("p_name").as("n2"),
      col("n_rows").as("rows2"), col("rep_id").as("rep2"))
    a.join(b, "p_brand")
      .filter(col("n1") < col("n2"))
      // dist <= 3 implies |len difference| <= 3: free pre-filter
      .filter(abs(length(col("n1")) - length(col("n2"))) <= 3)
      .withColumn("dist", levenshtein(col("n1"), col("n2")))
      .filter(col("dist") <= 3)
      .select("p_brand", "n1", "n2", "rows1", "rows2", "rep1", "rep2", "dist")
  }

  val levenshteinPairsSql: String =
    """WITH names AS (
      |  SELECT p_brand, p_name, COUNT(*) AS n_rows, MIN(p_partkey) AS rep_id
      |  FROM part GROUP BY p_brand, p_name)
      |SELECT a.p_brand, a.p_name AS n1, b.p_name AS n2,
      |  a.n_rows AS rows1, b.n_rows AS rows2,
      |  a.rep_id AS rep1, b.rep_id AS rep2,
      |  levenshtein(a.p_name, b.p_name) AS dist
      |FROM names a JOIN names b
      |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
      |WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
      |  AND levenshtein(a.p_name, b.p_name) <= 3""".stripMargin

  /** Wide scalar string surface: initcap-free deterministic ops shared by
    * both engines. */
  def stringOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      translate(col("p_name"), " ", "_").as("snake"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
      reverse(col("p_name")).as("rev"),
      substring(col("p_name"), 1, 3).as("prefix3"),
      regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
      concat_ws("::", col("p_brand"), col("p_type")).as("brand_type"))

  val stringOpsSql: String =
    """SELECT p_partkey,
      |  replace(p_name, ' ', '_') AS snake,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
      |  reverse(p_name) AS rev,
      |  substr(p_name, 1, 3) AS prefix3,
      |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
      |  p_brand || '::' || p_type AS brand_type
      |FROM part""".stripMargin

  /** SimHash near-dup with Hamming distance, LSH-banded by the
    * fingerprint's top 16 bits so candidate pairs stay bucket-local.
    *
    * The fingerprint is a 60-BIT md5 simhash (per-bit majority over
    * distinct word hashes, first 15 md5 hex digits per word): 60 bits
    * fit a SIGNED long in BOTH engines — a 64-bit value would overflow
    * Spark's ANSI long cast — so the whole query replays in DuckDB and
    * is hash-graded, completing the banding + Hamming verification the
    * 16-bit q_simhash doesn't cover. (The one-pass xxhash-based
    * `simhash64` expression stays on the registered SQL surface for
    * engine-internal fingerprints — bit-exactness is pinned in
    * ExpressionsSpec — but an oracle-graded query needs the
    * engine-neutral construction.) One corpus aggregate, band-local
    * self-join, no cartesian. */
  def simhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val exploded = TextOps.spread(s, t(s, dir, "documents"))
      .select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("word"))
      .withColumn("h",
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val weights = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"w$b"))
    val fp = exploded.groupBy("doc_id")
      .agg(weights.head, weights.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b =>
          when(col(s"w$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    // Hot-bucket discipline (graft.operators.BandedLsh): identical
    // fingerprints exact-collapse to one keeper before the band join, and
    // a 16-bit band value shared by more than BucketCap distinct
    // fingerprints ESCALATES — re-keys by the next 8 fingerprint bits
    // (24-bit band), then 8 more (32-bit) — with only still-hot refined
    // buckets dropped. The single band has only ~65k buckets, so at 1B
    // docs an unguarded bucket holds ~15k rows (~10⁸ candidate pairs)
    // before the Hamming filter runs; escalation bounds that while
    // keeping the near-dups that agree on the extra bits. The cap sits
    // far above every graded bucket (sf0.1 max: 141 keepers) and the
    // oracle mirrors the full refine ladder.
    graft.operators.BandedLsh.cappedPairs(
      fp.select(col("doc_id"), col("fp").as("sig"),
        shiftright(col("fp"), 44).as("b0"),
        shiftright(col("fp"), 36).bitwiseAND(lit(0xffL)).as("e0"),
        shiftright(col("fp"), 28).bitwiseAND(lit(0xffL)).as("e1")),
      nBands = 1, maxHamming = Some(12), escLevels = 2)
  }

  val simhashNearDupSql: String = {
    val weights = (0 until 60)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS w$b")
      .mkString(",\n      ")
    val assemble = (0 until 60)
      .map(b => s"CASE WHEN w$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    val cap = graft.operators.BandedLsh.BucketCap
    s"""WITH fp AS (
       |  SELECT doc_id, CAST($assemble AS BIGINT) AS fp FROM (
       |    SELECT doc_id,
       |      $weights
       |    FROM (
       |      SELECT doc_id,
       |        CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT AS BIGINT) AS h
       |      FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w
       |            FROM documents))
       |    GROUP BY doc_id)),
       |grp AS (SELECT fp AS sig, MIN(doc_id) AS gid FROM fp GROUP BY fp),
       |mem AS (SELECT f.doc_id, g.gid FROM fp f JOIN grp g ON f.fp = g.sig),
       |kb AS (SELECT gid, sig, 0 AS band, CAST(sig >> 44 AS VARCHAR) AS bv,
       |  (sig >> 36) & 255 AS e0, (sig >> 28) & 255 AS e1 FROM grp),
       |${graft.operators.BandedLsh.oracleRefineCtes("", cap, 2)},
       |kp AS (
       |  SELECT a.gid AS g1, b.gid AS g2,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM kkept a JOIN kkept b ON a.bv = b.bv AND a.gid < b.gid
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 12)
       |SELECT x.doc_id AS doc1, y.doc_id AS doc2, CAST(0 AS BIGINT) AS hamming
       |FROM mem x JOIN mem y ON x.gid = y.gid AND x.doc_id < y.doc_id
       |UNION ALL
       |SELECT LEAST(ma.doc_id, mb.doc_id) AS doc1,
       |  GREATEST(ma.doc_id, mb.doc_id) AS doc2, kp.hamming
       |FROM kp JOIN mem ma ON ma.gid = kp.g1 JOIN mem mb ON mb.gid = kp.g2""".stripMargin
  }

  /** Map-side top-k via the bounded Aggregator (shuffles k rows per group
    * per partition, not whole groups — see functions.TopKAggregator). Same
    * result contract as the window formulation. */
  def topKAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TopHit, TopKAggregator}
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, v, id) => TopHit(v, id) }
      .agg(new TopKAggregator(3).toColumn.name("hits"))
      .flatMap { case (prio, hits) =>
        hits.zipWithIndex.map { case (h, i) => (prio, i + 1, h.id, h.value) }
      }
      .toDF("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
  }

  val topKAggSql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** Bucketized point-in-interval range join: purchases located in their
    * user's activity session (operators.RangeJoin — equi-join on
    * (key, bucket) + exact refine, never a per-key nested loop). */
  def rangeJoinQ(s: SparkSession, dir: String): DataFrame = {
    val sessions = sessionize(s, dir)
      .select(col("user_id"), col("session_id"),
        col("session_start"), (col("session_end") + 1).as("session_hi"))
    val purchases = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        epochMs("ts").as("ms"))
    graft.operators.RangeJoin.pointInInterval(
        purchases, sessions, key = "user_id", x = "ms",
        lo = "session_start", hi = "session_hi", bucketWidth = 3600000L)
      .select("purchase_id", "user_id", "session_id")
  }

  val rangeJoinSql: String =
    s"""WITH sess AS (
       |${sessionizeSql.linesIterator.map("  " + _).mkString("\n")}
       |), p AS (
       |  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS ms
       |  FROM events WHERE event_type = 'purchase')
       |SELECT p.purchase_id, p.user_id, s.session_id
       |FROM p JOIN sess s ON p.user_id = s.user_id
       |  AND s.session_start <= p.ms AND p.ms < s.session_end + 1""".stripMargin

  /** View→purchase attribution through the STREAM-STREAM join code path
    * ([[graft.streaming.EventStreams.attributionJoin]]) run on batch
    * frames — grading the exact operator the watermarked streaming twin
    * executes (StreamJoinSpec proves stream == batch on the same files). */
  def eventAttributionQ(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    graft.streaming.EventStreams.attributionJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
  }

  val eventAttributionSql: String =
    """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      |  epoch_ms(v.ts) AS view_ms, epoch_ms(p.ts) AS purchase_ms, p.value
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
      |WHERE v.event_type = 'view' AND p.event_type = 'purchase'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_attribution" -> eventAttributionQ _,
    "q_topk_agg" -> topKAgg _,
    "q_range_join" -> rangeJoinQ _,
    "q_sessionize" -> sessionize _,
    "q_ntile" -> ntileBuckets _,
    "q_cube" -> cubeAgg _,
    "q_levenshtein_pairs" -> levenshteinPairs _,
    "q_string_ops" -> stringOps _,
    "q_simhash_neardup" -> simhashNearDup _)

  val oracles: Map[String, String] = Map(
    "q_event_attribution" -> eventAttributionSql,
    "q_topk_agg" -> topKAggSql,
    "q_range_join" -> rangeJoinSql,
    "q_sessionize" -> sessionizeSql,
    "q_ntile" -> ntileBucketsSql,
    "q_cube" -> cubeAggSql,
    "q_levenshtein_pairs" -> levenshteinPairsSql,
    "q_string_ops" -> stringOpsSql,
    "q_simhash_neardup" -> simhashNearDupSql)
}
