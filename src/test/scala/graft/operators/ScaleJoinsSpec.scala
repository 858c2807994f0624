package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ScaleJoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shuffles(df: DataFrame): Int = {
    df.count()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other =>
        Seq(other) ++ other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("salted join equals plain join under synthetic skew") {
    // 90% of fact rows share one hot key
    val fact = Tables(spark, TestSpark.sf0001, "lineitem")
      .withColumn("skew_key",
        when(col("l_linenumber") <= 5, lit(0L)).otherwise(col("l_orderkey")))
      .select("skew_key", "l_quantity")
    val dim = Tables(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey").as("skew_key"), col("o_orderpriority"))
      .union(Seq((0L, "HOT")).toDF("skew_key", "o_orderpriority"))
      .distinct()

    val plain = fact.join(dim, "skew_key")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = ScaleJoins.saltedJoin(fact, dim, "skew_key", saltFactor = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("HOT") > 0)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = Tables(spark, TestSpark.sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val o = Tables(spark, TestSpark.sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
      val (lName, rName) = ScaleJoins.bucketedTables(
        li, "l_orderkey", o, "o_orderkey", buckets = 8, prefix = "bkt_test")
      val joined = spark.table(lName)
        .join(spark.table(rName), col("l_orderkey") === col("o_orderkey"))
      assert(shuffles(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_test_l")
      spark.sql("DROP TABLE IF EXISTS bkt_test_r")
    }
  }
}
