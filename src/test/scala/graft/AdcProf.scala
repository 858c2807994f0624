package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scoring-only microprobe isolating the PQ ADC win from the
  * fit-from-artifact win (the ScaleTenProbe family numbers conflate
  * both): over the SAME materialized 200k-row code table and 10
  * queries, time a full scoring scan with
  *  (a) decode-to-64-doubles + 64-mult dot per candidate (the r6 path)
  *  (b) the per-query m×k lookup table + m lookups per candidate
  *      ([[queries.Quantization.pqLut]]/[[queries.Quantization.pqAdcDot]])
  * Aggregated to one sum so neither plan pays top-k machinery.
  * Run: sbt "Test/runMain graft.AdcProf" — numbers recorded in SCALE.md.
  */
object AdcProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.{Codes, Pq}

    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "cast(xxhash64(concat(cast(id AS STRING), '|', cast(d AS STRING))) " +
        "% 1000 AS DOUBLE) / 1000.0)").as("embedding"))
      .localCheckpoint()
    val m = Pq.fit(vecs)
    val codes = vecs
      .select(col("vec_id"), Codes.pack(Pq.encode(m)(col("embedding"))).as("pq_codes"))
      .repartition(32).localCheckpoint()
    val q = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .localCheckpoint()

    def timed(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val per = ts.min / (n.toLong * 10) * 1e9
      println(f"[adc] $tag%-12s best=${ts.min}%6.2fs (${per}%5.1f ns/candidate-score)")
    }

    val unpacked = codes.withColumn("cs", Codes.unpack(col("pq_codes"), m.m))

    timed("decode+dot") {
      unpacked.join(broadcast(q))
        .select(sum(graft.functions.GraftFunctions
          .dot_double(col("qv"), Pq.decode(m)(col("cs")))).as("s"))
        .collect()
    }
    timed("lut-adc") {
      unpacked.join(broadcast(q.withColumn("lut",
          queries.Quantization.pqLut(m, col("qv")))))
        .select(sum(queries.Quantization.pqAdcDot(m, col("lut"), col("cs"))).as("s"))
        .collect()
    }
    spark.stop()
  }
}
