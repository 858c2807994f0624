package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.load.{Scratch, TripletStore}

/** r16 q_etl_lifecycle regression profiler (guide §1): time each stage of
  * the composed lifecycle separately — extraction batch 1/2 (noop sink),
  * merge 1, merge 2, ranges checkpoint, audit aggregate — and the whole
  * graded query, N times in a Bench-identical session, so the driver's
  * 4.83 -> 7.39 s regression can be pinned to a stage instead of guessed.
  * Usage: sbt 'Test/runMain graft.EtlProf [iters]'
  */
object EtlProf {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "documents").count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[etlprof]   $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }

    (1 to iters).foreach { i =>
      println(s"[etlprof] --- iter $i ---")
      graft.operators.Checkpoints.scoped {
        Scratch.withScratch("graft_etlprof", sfDir) { tmp =>
          val b1 = time("extract b1 (noop)") {
            val b = EtlLifecycle.extractionBatch(spark, sfDir, 1)
            b.write.format("noop").mode("overwrite").save(); b
          }
          val b2 = time("extract b2 (noop)") {
            val b = EtlLifecycle.extractionBatch(spark, sfDir, 2)
            b.write.format("noop").mode("overwrite").save(); b
          }
          val store = new TripletStore(spark, tmp.getAbsolutePath)
          time("merge b1")(store.merge(b1, new Timestamp(LifecycleMerge.T1 * 1000)))
          time("merge b2")(store.merge(b2, new Timestamp(LifecycleMerge.T3 * 1000)))
          val ranges = time("ranges checkpoint")(
            graft.operators.Checkpoints.ck(store.ranges))
          time("audit agg") {
            ranges.agg(
              coalesce(sum(when(col("deprecated"), 1L)), lit(0L)),
              countDistinct(when(!col("deprecated"), col("subject"))),
              coalesce(max(when(!col("deprecated") && col("subject").isNull, 1L)
                .otherwise(0L)), lit(0L))).head()
          }
          time("final select+checkpoint") {
            ranges.filter(!col("deprecated"))
              .select(col("subject"), col("predicate"), col("obj"),
                col("objKind").as("objkind"),
                expr("unix_micros(useStart) div 1000").as("start_ms"))
              .localCheckpoint().count()
          }
        }
      }
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => Option(r.name).exists(_.startsWith("graft.memo.")))
        .foreach(_.unpersist(false))
      time("WHOLE q_etl_lifecycle") {
        SparkEntry.queries("q_etl_lifecycle")(spark, sfDir).count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => Option(r.name).exists(_.startsWith("graft.memo.")))
        .foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
