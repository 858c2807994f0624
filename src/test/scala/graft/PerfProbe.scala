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
    // corpus pipeline stage breakdown (mirrors TextOps.corpusPipeline)
    locally {
      val base = Tables(spark, dir, "documents").filter(col("n_chars") >= 150)
      time("cp base")(base.count())
      val keepIds = base.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val kept = base.join(keepIds, "doc_id").localCheckpoint()
      time("cp kept")(kept.count())
      val w2 = kept.repartition(32).withColumn("w", split(trim(col("text")), "\\s+"))
      val sh2 = w2.select(col("doc_id"), array_distinct(
        expr("CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2))) ELSE array() END")).as("sh"))
        .filter(size(col("sh")) > 0).localCheckpoint()
      time("cp shingle+ckpt")(sh2.count())
      val sigCols = col("doc_id") +: (0 until 4).map(j => array_min(transform(col("sh"),
        x => conv(substring(md5(concat(x, lit(s"|$j"))), 1, 8), 16, 10).cast("long"))).as(s"mh$j"))
      val sig2 = sh2.select(sigCols: _*).localCheckpoint()
      time("cp sig+ckpt")(sig2.count())
      def band(c1: String, c2: String) = {
        val x = sig2.select(col("doc_id").as("doc1"), concat_ws("_", col(c1), col(c2)).as("b"))
        val y = sig2.select(col("doc_id").as("doc2"), concat_ws("_", col(c1), col(c2)).as("b"))
        x.join(y, "b").filter(col("doc1") < col("doc2")).select("doc1", "doc2")
      }
      val cand = band("mh0", "mh1").union(band("mh2", "mh3")).distinct().localCheckpoint()
      time("cp candidates")(cand.count())
      val verified = cand
        .join(sh2.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
        .join(sh2.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
        .filter(col("inter").cast("double") / (size(col("sh1")) + size(col("sh2")) - col("inter")) >= 0.5)
        .select("doc2").distinct()
      time("cp verified")(verified.count())
      val fin = kept.join(verified, kept("doc_id") === verified("doc2"), "left_anti")
      time("cp final")(fin.count())
      val finProj = fin.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"), col("lang"))
      time("cp final+proj count")(finProj.count())
      time("cp final+proj collectsum")(finProj.agg(sum("n_tokens")).count())
      val ver2 = verified.localCheckpoint()
      val fin3 = kept.join(ver2, kept("doc_id") === ver2("doc2"), "left_anti")
        .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"), col("lang"))
      time("cp final ckpt-verified")(fin3.count())
    }
    // ablation: wall cost of pipeline prefixes (fresh build each)
    locally {
      def prefix(stop: String): Long = {
        val base = Tables(spark, dir, "documents").filter(col("n_chars") >= 150)
        val keepIds = base.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
        val kept = base.join(keepIds, "doc_id")
        if (stop == "kept") return kept.count()
        val w2 = kept.repartition(32).withColumn("w", split(trim(col("text")), "\\s+"))
        val sh2 = w2.select(col("doc_id"), array_distinct(
          expr("CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2))) ELSE array() END")).as("sh"))
          .filter(size(col("sh")) > 0).localCheckpoint()
        if (stop == "sh") return sh2.count()
        val sigCols = col("doc_id") +: (0 until 4).map(j => array_min(transform(col("sh"),
          x => conv(substring(md5(concat(x, lit(s"|$j"))), 1, 8), 16, 10).cast("long"))).as(s"mh$j"))
        val sig2 = sh2.select(sigCols: _*).localCheckpoint()
        if (stop == "sig") return sig2.count()
        def band(c1: String, c2: String) = {
          val x = sig2.select(col("doc_id").as("doc1"), concat_ws("_", col(c1), col(c2)).as("b"))
          val y = sig2.select(col("doc_id").as("doc2"), concat_ws("_", col(c1), col(c2)).as("b"))
          x.join(y, "b").filter(col("doc1") < col("doc2")).select("doc1", "doc2")
        }
        val cand = band("mh0", "mh1").union(band("mh2", "mh3")).distinct()
        if (stop == "cand") return cand.count()
        val verified = cand
          .join(sh2.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
          .join(sh2.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
          .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
          .filter(col("inter").cast("double") / (size(col("sh1")) + size(col("sh2")) - col("inter")) >= 0.5)
          .select("doc2").distinct()
        if (stop == "verified") return verified.count()
        kept.join(verified, kept("doc_id") === verified("doc2"), "left_anti").count()
      }
      Seq("kept", "sh", "sig", "cand", "verified", "full").foreach { st =>
        val t0 = System.nanoTime(); val n = prefix(st)
        println(f"[abl] ${(System.nanoTime() - t0) / 1e9}%6.2f upto=$st rows=$n")
      }
    }
    time("Q corpus_pipeline 1")(queries.TextOps.corpusPipeline(spark, dir).count())
    time("Q corpus_pipeline 2")(queries.TextOps.corpusPipeline(spark, dir).count())
    spark.stop()
  }
}
