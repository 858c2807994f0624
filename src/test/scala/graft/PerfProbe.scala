package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness: isolate the stages of the shingle/minhash
  * pipeline. Run: sbt "Test/runMain graft.PerfProbe"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name%-30s rows=$n")
    }

    val docs = Tables(spark, dir, "documents").repartition(32)
    time("warmup count")(docs.count())
    val w = docs.withColumn("w", split(trim(col("text")), "\\s+"))
    time("tokenize only")(w.select(size(col("w"))).agg(sum("size(w)")).count())
    val sh = w.withColumn("sh", array_distinct(
      expr("transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2)))")))
    time("shingle")(sh.select(sum(size(col("sh")))).count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    time("shingle exploded")(ex.count())
    time("md5 x4 via explode")(
      ex.select((0 until 4).map(j =>
        sum(conv(substring(md5(concat(col("s"), lit(s"|$j"))), 1, 8), 16, 10).cast("long")).as(s"m$j")): _*).count())
    val hofCols = col("doc_id") +: (0 until 4).map(j => array_min(transform(col("sh"),
        x => conv(substring(md5(concat(x, lit(s"|$j"))), 1, 8), 16, 10).cast("long"))).as(s"mh$j"))
    val hof = sh.select(hofCols: _*)
    time("minhash via HOF")(hof.count())
    // alternative: xxhash64 instead of md5+conv
    val hof2Cols = col("doc_id") +: (0 until 4).map(j => array_min(transform(col("sh"),
        x => xxhash64(x, lit(j)))).as(s"mh$j"))
    val hof2 = sh.select(hof2Cols: _*)
    time("minhash via xxhash64")(hof2.count())
    time("minhash via HOF again")(hof.count())
    // narrow the explode cost
    val shM = sh.select(col("doc_id"), col("sh")).localCheckpoint()
    time("explode from materialized")(shM.select(col("doc_id"), explode(col("sh")).as("s")).count())
    val shNoDistinct = w.withColumn("sh", expr("transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2)))"))
    time("explode no-distinct")(shNoDistinct.select(explode(col("sh")).as("s")).count())
    time("explode plain words")(w.select(explode(col("w")).as("s")).count())
    val shSlice = w.withColumn("sh", expr("array_distinct(transform(w, (x, i) -> concat_ws(' ', x, element_at(w, i+2), element_at(w, i+3))))"))
    time("sum size (full shingle compute)")(sh.select(sum(size(col("sh")))).collect()(0).getLong(0))
    // force full minhash compute (not pruned) via sum
    time("minhash full via sum")(hof.select(sum(col("mh0") + col("mh1") + col("mh2") + col("mh3"))).collect()(0).getLong(0))
    time("Q minhash_signature.count")(queries.TextOps.minhashSignature(spark, dir).count())
    time("Q minhash_band_pairs.count")(queries.TextOps.minhashBandPairs(spark, dir).count())
    time("Q ngram_jaccard.count")(queries.TextOps.ngramJaccard(spark, dir).count())
    time("Q json_extract.count")(queries.Relational.jsonExtract(spark, dir).count())
    time("Q json_extract.count 2")(queries.Relational.jsonExtract(spark, dir).count())
    time("Q levenshtein_pairs")(queries.Sessions.levenshteinPairs(spark, dir).count())
    time("Q simhash_neardup")(queries.Sessions.simhashNearDup(spark, dir).count())
    spark.stop()
  }
}
