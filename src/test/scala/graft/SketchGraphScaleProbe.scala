package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade scale probe for the round-7 families — sketches (HLL,
  * histogram), fixed-point PageRank, the attribution interval join, and
  * the z-order layout write. Inputs are synthesized at 1×/10×/100× with
  * the density laws that make each measurement honest:
  *
  *  - HLL / histogram: row count grows, summary size must NOT (≤ m rows
  *    and ≤ domain/width rows regardless of input) — expect ~linear wall
  *    (one scan) with bounded output.
  *  - PageRank: edges grow, iteration count fixed (3) — expect ~linear
  *    wall per decade (3 shuffles on dst + 2 broadcast scalars).
  *  - attribution join: the USER SPACE grows with the data (per-user
  *    event density constant) — the production shape; keeping users
  *    fixed while events grow would measure quadratic per-user fan-out,
  *    a different (skew) problem.
  *  - z-order: cluster + write, one range shuffle — expect ~linear.
  *
  * Run: sbt "Test/runMain graft.SketchGraphScaleProbe" (optionally pass
  * a max decade multiplier, default 100). Numbers go to SCALE.md.
  */
object SketchGraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val maxMult = args.headOption.map(_.toInt).getOrElse(100)
    val decades = Seq(1, 10, 100).filter(_ <= maxMult)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def report(fam: String, base: Long, rows: Seq[(Int, Double)]): Unit =
      rows.foreach { case (m, dt) =>
        val r = dt / rows.head._2
        println(f"[r7scale] $fam%-18s n=${base * m}%,12d mult=$m%3dx dt=$dt%7.2fs ratio=$r%6.2f")
      }

    // ---- HLL: 1M base keys ---------------------------------------------
    val hllBase = 1000000L
    report("hll_build", hllBase, decades.map { m =>
      val keys = queries.Sketches.keysOf(
        spark.range(hllBase * m).select(concat(lit("k"), $"id").as("k")))
      val (regs, dt) = time(queries.Sketches.buildHll(keys).count())
      require(regs <= 1024, s"register table grew: $regs")
      (m, dt)
    })

    // ---- histogram: 1M base values -------------------------------------
    report("hist_build", hllBase, decades.map { m =>
      val vals = spark.range(hllBase * m)
        .select((pmod(xxhash64($"id"), lit(104000L)) + 1000L).cast("double").as("x"))
      val (buckets, dt) = time(queries.Sketches.buildHist(vals).count())
      require(buckets <= 110, s"histogram grew: $buckets")
      (m, dt)
    })

    // ---- PageRank: 100k base edges, supercritical random digraph -------
    val prBase = 100000L
    report("pagerank_3it", prBase, decades.map { m =>
      val n = prBase * m
      val edges = spark.range(n).select(
        concat(lit("v"), pmod(xxhash64($"id", lit("s")), lit(n * 2 / 3))).as("src"),
        concat(lit("v"), pmod(xxhash64($"id", lit("d")), lit(n * 2 / 3))).as("dst"))
      val (_, dt) = time(operators.PageRank.run(edges, iters = 3).count())
      (m, dt)
    })

    // ---- attribution join: 100k base events, constant per-user density -
    val atBase = 100000L
    report("attribution", atBase, decades.map { m =>
      val n = atBase * m
      val users = n / 400 // ~400 events/user at every decade
      val ev = spark.range(n).select(
        $"id".as("event_id"),
        pmod(xxhash64($"id", lit("u")), lit(users)).as("user_id"),
        when(pmod(xxhash64($"id", lit("t")), lit(5)) === 0, "purchase")
          .otherwise("view").as("event_type"),
        timestamp_millis(lit(1700000000000L) +
          pmod(xxhash64($"id", lit("ms")), lit(86400000L * 30))).as("ts"),
        lit(1.0).as("value"))
      val (_, dt) = time(streaming.EventStreams.attributionJoin(
        ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "purchase")).count())
      (m, dt)
    })

    // ---- z-order layout write: 1M base rows -----------------------------
    report("zorder_write", hllBase, decades.map { m =>
      val rows = spark.range(hllBase * m).select(
        $"id".as("event_id"),
        pmod(xxhash64($"id", lit("u")), lit(1500L * m)).as("user_id"),
        pmod(xxhash64($"id", lit("h")), lit(24L)).as("h"))
      val out = java.nio.file.Files.createTempDirectory("zorder_probe")
      val (_, dt) = time(
        operators.ZOrder.cluster(rows, $"user_id", $"h", numFiles = 32 * m)
          .write.mode("overwrite").parquet(out.toString))
      org.apache.commons.io.FileUtils.deleteDirectory(out.toFile)
      (m, dt)
    })

    spark.stop()
  }
}
