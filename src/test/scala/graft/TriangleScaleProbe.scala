package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade scale probe for the triangle census, weighted sampling, and the
  * OPQ permute+encode pass. Density laws that keep each measurement
  * honest:
  *
  *  - triangles: the BASKET size stays constant (~5 items) while the
  *    basket count and catalog grow with the data — the production
  *    co-occurrence shape. Edges grow linearly; the degree-ordered
  *    orientation must keep the wedge join near-linear (an unoriented
  *    wedge join would grow with Σ deg² — superlinear as hubs emerge).
  *  - weighted sample: top-100 of n rows — TakeOrderedAndProject, so
  *    wall should track the scan (linear), never a global sort.
  *  - OPQ: the permutation fit is a bounded 2048-row sample collect
  *    (constant per decade by construction); the probed cost is the
  *    corpus-wide permute + PQ encode, one map stage — linear.
  *
  * Run: sbt "Test/runMain graft.TriangleScaleProbe" (optional arg = max
  * decade multiplier, default 100). Numbers go to SCALE.md.
  */
object TriangleScaleProbe {
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

    // ---- triangles: 30k base baskets x 5 items, catalog 2n ------------
    // catalog grows WITH the baskets so the average degree stays constant
    // (~10) — the honest sparse-graph decade: edges linear, wedges linear.
    // A fixed catalog would densify the graph and measure the quadratic
    // wedge regime instead of scale-up.
    val triBase = 30000L
    report("triangles", triBase, decades.map { m =>
      val n = triBase * m
      val catalog = n * 2
      val items = spark.range(n * 5).select(
        ($"id" / 5).cast("long").as("o"),
        pmod(xxhash64($"id", lit("p")), lit(catalog)).as("p"))
      val pairs = items.as("x").join(items.as("y"),
          $"x.o" === $"y.o" && $"x.p" < $"y.p")
        .select($"x.p".as("a"), $"y.p".as("b"))
      val (row, dt) = time(operators.Triangles.count(pairs).head())
      require(row.getLong(3) >= 0)
      (m, dt)
    })

    // ---- k-core peel: same basket graph, 3 rounds ---------------------
    // per round: one degree groupBy + two semi joins — expect the same
    // near-linear decade as the triangle census's lighter stages
    report("kcore_3peel", triBase, decades.map { m =>
      val n = triBase * m
      val catalog = n * 2
      val items = spark.range(n * 5).select(
        ($"id" / 5).cast("long").as("o"),
        pmod(xxhash64($"id", lit("p")), lit(catalog)).as("p"))
      val pairs = items.as("x").join(items.as("y"),
          $"x.o" === $"y.o" && $"x.p" < $"y.p")
        .select($"x.p".as("u"), $"y.p".as("v")).distinct()
      var edges = pairs.localCheckpoint()
      val (_, dt) = time {
        (1 to 3).foreach { _ =>
          val deg = edges.select(explode(array($"u", $"v")).as("id"))
            .groupBy("id").agg(count(lit(1)).as("dg"))
          val keep = deg.filter($"dg" >= 3).select("id")
          edges = edges
            .join(keep.select($"id".as("u")), Seq("u"), "left_semi")
            .join(keep.select($"id".as("v")), Seq("v"), "left_semi")
            .select("u", "v").localCheckpoint()
        }
        edges.count()
      }
      (m, dt)
    })

    // ---- random walks: frontier-sized joins against a growing graph ---
    // 1000 walks x 4 steps at every decade: the frontier is constant, so
    // wall should track the adjacency BUILD (one window over edges),
    // with the four step-joins frontier-bounded
    report("random_walks", triBase, decades.map { m =>
      val n = triBase * m
      val catalog = n * 2
      val items = spark.range(n * 5).select(
        ($"id" / 5).cast("long").as("o"),
        pmod(xxhash64($"id", lit("p")), lit(catalog)).as("p"))
      val e = items.as("x").join(items.as("y"),
          $"x.o" === $"y.o" && $"x.p" < $"y.p")
        .select($"x.p".as("u"), $"y.p".as("v")).distinct()
      val both = e.select($"u".as("src"), $"v".as("dst"))
        .unionAll(e.select($"v".as("src"), $"u".as("dst")))
      val adjW = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy("dst")
      val adjC = org.apache.spark.sql.expressions.Window.partitionBy("src")
      val (rows, dt) = time {
        val adj = both
          .withColumn("idx", row_number().over(adjW) - 1)
          .withColumn("deg", count(lit(1)).over(adjC))
          .localCheckpoint()
        val deg = both.groupBy($"src".as("id")).agg(count(lit(1)).as("dg"))
        var frontier = deg.orderBy($"dg".desc, $"id").limit(1000)
          .select(monotonically_increasing_id().as("walk_id"), $"id".as("node"))
          .localCheckpoint()
        var total = frontier.count()
        (1 to 4).foreach { t =>
          val h = pmod(xxhash64($"walk_id", lit(t)), $"deg")
          frontier = frontier.join(adj, frontier("node") === adj("src"))
            .filter($"idx" === h)
            .select($"walk_id", $"dst".as("node")).localCheckpoint()
          total += frontier.count()
        }
        total
      }
      require(rows == 5000L, s"walk rows $rows")
      (m, dt)
    })

    // ---- weighted sample: 1M base docs, top-100 -----------------------
    val wsBase = 1000000L
    report("weighted_sample", wsBase, decades.map { m =>
      val docs = spark.range(wsBase * m).select(
        $"id".as("doc_id"),
        (pmod(xxhash64($"id", lit("w")), lit(2000L)) + 1L).as("n_chars"))
      val (rows, dt) = time(
        queries.Sampling.weightedSampleOf(docs, s"probe$m", 100).count())
      require(rows == 100L)
      (m, dt)
    })

    // ---- OPQ: bounded fit + corpus-wide permute+encode ----------------
    val opqBase = 100000L
    report("opq_encode", opqBase, decades.map { m =>
      val emb = spark.range(opqBase * m).select(
        $"id".as("vec_id"),
        transform(sequence(lit(1), lit(64)), d =>
          pmod(xxhash64($"id", d.cast("string")), lit(1000L)).cast("double")
            / lit(100.0)).as("embedding"))
      val (_, dt) = time {
        val p = similarity.Opq.fitPermutation(emb)
        val model = similarity.Pq.fit(emb.select($"vec_id",
          similarity.Opq.permute(p)($"embedding").as("embedding")))
        // aggregate OVER the codes so the encode projection cannot be
        // pruned (a bare count() after a deterministic UDF projection
        // measures nothing — Catalyst drops the project)
        emb.select(similarity.Pq.encode(model)(
            similarity.Opq.permute(p)($"embedding")).as("cs"))
          .agg(max(element_at($"cs", 1)), sum(element_at($"cs", 8))).head()
      }
      (m, dt)
    })

    spark.stop()
  }
}
