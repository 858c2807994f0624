package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.Tables.{dec2, epochMs}

/** Analytic operator surface rounding out the engine: ranking windows,
  * lag/lead, rollup grouping, set operations, correlated existence,
  * top-n per group, order-independent variance, exact median, and
  * prefix search (the Elasticsearch edge_ngram analog, SURVEY §1.6).
  *
  * Variance is computed from decimal power sums — not `var_samp` — so the
  * result is identical under any partitioning / summation order (double
  * accumulation is order-dependent and would flap between runs at scale).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** rank / dense_rank / lag / lead over per-customer order history. */
  def rankLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
  }

  val rankLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  lag(o_orderkey, 1) OVER w AS prev_order,
      |  lead(o_orderkey, 1) OVER w AS next_order
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin

  /** ROLLUP over (priority, status) with grouping-level marker. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))

  val rollupAggSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin

  /** INTERSECT: documents that are both long and English. */
  def intersectOp(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.filter(col("n_chars") > 300).select("doc_id")
      .intersect(d.filter(col("lang") === "en").select("doc_id"))
  }

  val intersectOpSql: String =
    """SELECT doc_id FROM documents WHERE n_chars > 300
      |INTERSECT
      |SELECT doc_id FROM documents WHERE lang = 'en'""".stripMargin

  /** EXCEPT: long documents that are not English. */
  def exceptOp(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.filter(col("n_chars") > 300).select("doc_id")
      .except(d.filter(col("lang") === "en").select("doc_id"))
  }

  val exceptOpSql: String =
    """SELECT doc_id FROM documents WHERE n_chars > 300
      |EXCEPT
      |SELECT doc_id FROM documents WHERE lang = 'en'""".stripMargin

  /** Top-3 orders per customer segment by price (top-n per group). */
  def topNPerGroup(s: SparkSession, dir: String): DataFrame = {
    // No broadcast hint on customer: it grows with scale factor, so a hint
    // would bypass Spark's size threshold and build a multi-GB driver
    // broadcast at 100×. AQE picks broadcast when it actually fits.
    val joined = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
  }

  val topNPerGroupSql: String =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3""".stripMargin

  /** Correlated existence (TPC-H Q4 shape): orders with at least one line
    * shipped after the order date. */
  def correlatedExists(s: SparkSession, dir: String): DataFrame = {
    val late = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey", "o_orderpriority")
      .distinct()
    late.groupBy("o_orderpriority").agg(count(lit(1)).as("n_late_orders"))
  }

  val correlatedExistsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_late_orders FROM (
      |  SELECT DISTINCT o_orderkey, o_orderpriority
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** GROUPING SETS: the explicit multi-granularity aggregation between
    * rollup and cube — (priority, status), (priority), (). */
  def groupingSetsQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"), col("n"))

  val groupingSetsSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
      |  (o_orderpriority), ())""".stripMargin

  /** Distribution window functions: percent_rank + cume_dist over a
    * deterministic per-segment order. */
  def distributionWindows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .filter(col("c_custkey") < 500)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
  }

  val distributionWindowsSql: String =
    """SELECT c_custkey, c_mktsegment,
      |  round(percent_rank() OVER (PARTITION BY c_mktsegment
      |    ORDER BY c_acctbal, c_custkey), 4) AS pct_rank,
      |  round(cume_dist() OVER (PARTITION BY c_mktsegment
      |    ORDER BY c_acctbal, c_custkey), 4) AS cume
      |FROM customer WHERE c_custkey < 500""".stripMargin

  /** HAVING: brands whose average retail price clears a floor. */
  def havingAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(dec2(col("p_retailprice"))).cast("double").as("sum_price"))
      .filter(col("sum_price") / col("n_parts") > 900.0)

  val havingAggSql: String =
    """SELECT p_brand, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM part GROUP BY p_brand
      |HAVING CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) > 900.0""".stripMargin

  /** Order-independent sample variance from decimal power sums:
    * var = (Σx² − (Σx)²/n) / (n−1), every Σ exact decimal. */
  def variance2(s: SparkSession, dir: String): DataFrame = {
    val x = dec2(col("l_quantity"))
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum((x * x).cast(DecimalType(38, 4))).cast("double").as("sum_x2"))
      .select(col("l_returnflag"), col("n"),
        round((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) /
          (col("n") - 1), 6).as("var_qty"))
  }

  val variance2Sql: String =
    """SELECT l_returnflag, n,
      |  round((sum_x2 - sum_x * sum_x / n) / (n - 1), 6) AS var_qty
      |FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sum_x2
      |  FROM lineitem GROUP BY l_returnflag)""".stripMargin

  /** Exact median via explicit positional selection (deterministic in both
    * engines, unlike interpolating quantile implementations). */
  def medianPrice(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("o_orderpriority")).as("cnt"))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("o_orderpriority"), col("o_totalprice").as("median_lo"))
  }

  val medianPriceSql: String =
    """SELECT o_orderpriority, o_totalprice AS median_lo FROM (
      |  SELECT o_orderpriority, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
      |  FROM orders)
      |WHERE rn = (cnt + 1) // 2""".stripMargin

  /** Prefix search over entity names — the engine-side equivalent of the
    * reference's edge_ngram(3,30) index (`Entities.py:25-31`): normalized
    * lowercase prefix match, ranked by key. */
  def prefixSearch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(lower(col("p_name")).startsWith("sma"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"))

  val prefixSearchSql: String =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE lower(p_name) LIKE 'sma%'""".stripMargin

  /** Materialized edge-ngram index search (the index-time half of the
    * reference's analyzer): explode each name into its 3..6-char
    * lowercase prefixes, equi-join the query term against the index —
    * at scale the index table is written once and the search is a hash
    * probe, never a LIKE scan. */
  def edgeNgramSearch(s: SparkSession, dir: String): DataFrame = {
    val index = t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        explode(expr(
          "transform(sequence(3, least(6, length(p_name))), " +
            "n -> lower(substring(p_name, 1, n)))")).as("gram"))
    index.filter(col("gram") === "small")
      .select(col("p_partkey"), col("p_name"))
  }

  val edgeNgramSearchSql: String =
    """SELECT p_partkey, p_name FROM (
      |  SELECT p_partkey, p_name,
      |    unnest(list_transform(range(3, least(6, length(p_name)) + 1),
      |      n -> lower(substr(p_name, 1, n)))) AS gram
      |  FROM part)
      |WHERE gram = 'small'""".stripMargin

  /** RANGE-frame window: per returnflag, sum of quantities of all rows
    * whose price lies within 100 below the current row's price — a value
    * frame, not a row frame. */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"))
      .rangeBetween(-100L, Window.currentRow)
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        sum(dec2(col("l_quantity"))).over(w).cast("double").as("near_qty"))
  }

  val rangeFrameSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_returnflag ORDER BY l_extendedprice
      |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_qty
      |FROM lineitem WHERE l_orderkey < 200""".stripMargin

  /** Calendar-part aggregation: orders per (year, month). */
  def dateParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))

  val datePartsSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_frame" -> rangeFrame _,
    "q_date_parts" -> dateParts _,
    "q_rank_lag" -> rankLag _,
    "q_rollup" -> rollupAgg _,
    "q_intersect" -> intersectOp _,
    "q_except" -> exceptOp _,
    "q_topn_per_group" -> topNPerGroup _,
    "q_correlated_exists" -> correlatedExists _,
    "q_grouping_sets" -> groupingSetsQ _,
    "q_distribution_windows" -> distributionWindows _,
    "q_having" -> havingAgg _,
    "q_variance" -> variance2 _,
    "q_median" -> medianPrice _,
    "q_prefix_search" -> prefixSearch _,
    "q_edge_ngram_search" -> edgeNgramSearch _)

  val oracles: Map[String, String] = Map(
    "q_range_frame" -> rangeFrameSql,
    "q_date_parts" -> datePartsSql,
    "q_rank_lag" -> rankLagSql,
    "q_rollup" -> rollupAggSql,
    "q_intersect" -> intersectOpSql,
    "q_except" -> exceptOpSql,
    "q_topn_per_group" -> topNPerGroupSql,
    "q_correlated_exists" -> correlatedExistsSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_distribution_windows" -> distributionWindowsSql,
    "q_having" -> havingAggSql,
    "q_variance" -> variance2Sql,
    "q_median" -> medianPriceSql,
    "q_prefix_search" -> prefixSearchSql,
    "q_edge_ngram_search" -> edgeNgramSearchSql)
}
