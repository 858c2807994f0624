package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.Tables.{dec2, epochMs}

/** Core relational operator surface: scans with pushdown, projections,
  * filters, the join family (broadcast / semi / anti / star / theta-substring),
  * aggregations, top-k, pivot, and set ops.
  *
  * Mirrors the reference's dataflow shapes (SURVEY.md §2.1, §2.3, §2.7,
  * §2.8): e.g. the quality filter P3 (`hf_extract/HFDatasetManager.py:717-799`),
  * known-field projection P1 (`core/ModelCardToSchemaParser.py:211-294`),
  * vocab membership J1, anti-join J4/J9, URI→name resolution J7
  * (`core/GraphHandlerForKG.py:217-261`), doc pivot A10.
  *
  * Every aggregate over money columns goes through DECIMAL(18,2) so results
  * are exact and partition-order independent (100 TB safe, oracle-identical).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** TPC-H Q1 shape: wide scan → filter → hash agg with map-side combine. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          * (one + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 6)
          .as("avg_qty"),
        round(sum(dec2(col("l_discount"))).cast("double") / count(lit(1)), 6)
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Selective scan: predicate + projection both push to the parquet reader. */
  def scanPushdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.03 && col("l_discount") <= 0.06
        && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  val scanPushdownSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.06 AND l_quantity < 10""".stripMargin

  /** Known-field projection (P1): split/element_at, URL templates, CASE
    * normalization of empty sentinels (P8). */
  def knownFields(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey").as("cust_id"),
      element_at(split(col("c_name"), "#"), -1).as("short_name"),
      concat(lit("https://example.org/customer/"),
        col("c_custkey").cast("string")).as("url"),
      when(col("c_mktsegment").isin("", "NONE"), lit(null))
        .otherwise(lower(col("c_mktsegment"))).as("segment"),
      when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos")).as("bal_sign"))

  val knownFieldsSql: String =
    """SELECT c_custkey AS cust_id,
      |  string_split(c_name, '#')[-1] AS short_name,
      |  'https://example.org/customer/' || CAST(c_custkey AS VARCHAR) AS url,
      |  CASE WHEN c_mktsegment IN ('', 'NONE') THEN NULL ELSE lower(c_mktsegment) END AS segment,
      |  CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign
      |FROM customer""".stripMargin

  /** Document quality filter (P3 shape): length floor, token floor, and a
    * substring-occurrence-count heuristic — all codegen'd built-ins. */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("n_chars") >= 150
        && col("lang").isNotNull
        && size(split(col("text"), " ")) >= 25
        && (length(col("text")) - length(regexp_replace(col("text"), "batch", ""))) / 5 < 8)
      .select("doc_id", "n_chars", "lang")

  val qualityFilterSql: String =
    """SELECT doc_id, n_chars, lang FROM documents
      |WHERE n_chars >= 150 AND lang IS NOT NULL
      |  AND len(string_split(text, ' ')) >= 25
      |  AND (length(text) - length(replace(text, 'batch', ''))) / 5 < 8""".stripMargin

  /** Deterministic paging (P6): total order by unique key, then offset+limit. */
  def limitOffset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select("doc_id", "n_chars")
      .orderBy("doc_id").offset(50).limit(100)

  val limitOffsetSql: String =
    "SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 100 OFFSET 50"

  /** Fact-to-dim broadcast join (J3 shape): no explicit hint — part grows
    * linearly with scale factor, so a hard hint would force a multi-GB
    * driver broadcast at 100×. AQE/size-threshold picks broadcast-hash
    * whenever part actually fits (it does at test scale — PlanSpec pins
    * the BroadcastHashJoin). */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val joinBroadcastSql: String =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** TPC-H Q5-shaped star join: one shuffled fact join (orders); nation and
    * region keep explicit broadcast hints (fixed 25/5 rows at ANY scale
    * factor), customer does NOT (it grows with SF — AQE decides). */
  def joinStar(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  val joinStarSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name""".stripMargin

  /** EXISTS via left-semi join (J1/J4 shape). */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)""".stripMargin

  /** NOT EXISTS via left-anti join (J4/J9 — deprecated-triple delete shape). */
  def antiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_acctbal")

  val antiJoinSql: String =
    """SELECT c_custkey, c_acctbal FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin

  /** Substring-containment theta join (J2 — schema-range lookup semantics,
    * `GraphBuilderFAIR4ML.py:292-307`): tiny dim × fact with a contains()
    * predicate → broadcast nested-loop, fact scanned once. */
  def substringJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Seq("spark", "hash", "join", "window", "vector").toDF("word")
    t(s, dir, "documents")
      .crossJoin(broadcast(words))
      .filter(col("text").contains(col("word")))
      .groupBy("word")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  val substringJoinSql: String =
    """SELECT w.word, COUNT(*) AS n_docs, CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
      |FROM documents d
      |JOIN (VALUES ('spark'),('hash'),('join'),('window'),('vector')) w(word)
      |  ON contains(d.text, w.word)
      |GROUP BY w.word""".stripMargin

  /** URI→name resolution shape (J7): left join to the name dim, coalesce to
    * a fallback derived from the key (`GraphHandlerForKG.py:217-261`).
    * No hint on customer (scale-growing dim) — AQE broadcasts when it fits. */
  def coalesceLookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(element_at(split(col("c_name"), "#"), -1),
          concat(lit("unknown-"), col("o_custkey").cast("string"))).as("buyer"))

  val coalesceLookupSql: String =
    """SELECT o_orderkey,
      |  COALESCE(string_split(c_name, '#')[-1],
      |           'unknown-' || CAST(o_custkey AS VARCHAR)) AS buyer
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Exact distinct counts per group (A9 shape). */
  def distinctCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))

  val distinctCountSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  /** Top-k by price (A4): Catalyst plans TakeOrderedAndProject — no full sort. */
  def topK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .limit(20)

  val topKSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Union + distinct (A3/A5 graph-union shape). */
  def unionDedup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.filter(col("source").isin("src0", "src1")).select("doc_id", "lang")
      .union(d.filter(col("lang") === "en").select("doc_id", "lang"))
      .distinct()
  }

  val unionDedupSql: String =
    """SELECT doc_id, lang FROM documents WHERE source IN ('src0','src1')
      |UNION
      |SELECT doc_id, lang FROM documents WHERE lang = 'en'""".stripMargin

  /** Manual pivot: per-user event-type counts as columns (A10 doc-pivot shape). */
  def pivotCounts(s: SparkSession, dir: String): DataFrame = {
    def cnt(tpe: String) = sum(when(col("event_type") === tpe, 1).otherwise(0))
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        cnt("click").as("n_click"),
        cnt("view").as("n_view"),
        cnt("purchase").as("n_purchase"),
        cnt("signup").as("n_signup"),
        cnt("error").as("n_error"),
        sum(when(col("event_type") === "purchase", dec2(col("value")))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double")
          .as("purchase_value"))
  }

  val pivotCountsSql: String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
      |FROM events GROUP BY user_id""".stripMargin

  /** Skew-safe salted join, oracle-graded against the plain join: the
    * fact side gets a deterministic content-hash salt, the dim side
    * explodes over the salt range, the join key becomes (key, salt) — hot
    * keys spread over saltFactor reducers with identical results. */
  def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val dim = t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.ScaleJoins.saltedJoin(fact, dim, "l_orderkey", saltFactor = 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
  }

  val saltedJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Deterministic entity hashing (§1.4: sha256 over fixed field order;
    * triplet md5 `GraphHandler.py:479-483`). */
  def hashIds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      md5(concat_ws("|", col("c_name"), col("c_mktsegment"))).as("h_md5"),
      sha2(concat_ws("|", lit("platform=shop"), lit("type=customer"),
        col("c_custkey").cast("string")), 256).as("h_entity"))

  val hashIdsSql: String =
    """SELECT c_custkey,
      |  md5(c_name || '|' || c_mktsegment) AS h_md5,
      |  sha256('platform=shop' || '|' || 'type=customer' || '|' || CAST(c_custkey AS VARCHAR)) AS h_entity
      |FROM customer""".stripMargin

  /** JSON field extraction + modular bucketing (props payload parsing). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))

  val jsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg _,
    "q_scan_pushdown" -> scanPushdown _,
    "q_known_fields" -> knownFields _,
    "q_quality_filter" -> qualityFilter _,
    "q_limit_offset" -> limitOffset _,
    "q_join_broadcast" -> joinBroadcast _,
    "q_join_star" -> joinStar _,
    "q_semi_join" -> semiJoin _,
    "q_anti_join" -> antiJoin _,
    "q_substring_join" -> substringJoin _,
    "q_coalesce_lookup" -> coalesceLookup _,
    "q_distinct_count" -> distinctCount _,
    "q_topk" -> topK _,
    "q_union_dedup" -> unionDedup _,
    "q_pivot_counts" -> pivotCounts _,
    "q_hash_ids" -> hashIds _,
    "q_json_extract" -> jsonExtract _,
    "q_salted_join" -> saltedJoinQ _)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q_scan_pushdown" -> scanPushdownSql,
    "q_known_fields" -> knownFieldsSql,
    "q_quality_filter" -> qualityFilterSql,
    "q_limit_offset" -> limitOffsetSql,
    "q_join_broadcast" -> joinBroadcastSql,
    "q_join_star" -> joinStarSql,
    "q_semi_join" -> semiJoinSql,
    "q_anti_join" -> antiJoinSql,
    "q_substring_join" -> substringJoinSql,
    "q_coalesce_lookup" -> coalesceLookupSql,
    "q_distinct_count" -> distinctCountSql,
    "q_topk" -> topKSql,
    "q_union_dedup" -> unionDedupSql,
    "q_pivot_counts" -> pivotCountsSql,
    "q_hash_ids" -> hashIdsSql,
    "q_json_extract" -> jsonExtractSql,
    "q_salted_join" -> saltedJoinSql)
}
