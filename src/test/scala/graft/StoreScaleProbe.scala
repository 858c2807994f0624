package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Versioned-store scaling probe: load a growing corpus into a
  * [[graft.load.TripletStore]] in equal batches and print, for EACH
  * batch, the merge wall time and the bytes the new version wrote to
  * disk. The claim under test is the 100 TB load path: per-batch cost
  * must track the BATCH (plus the bounded delta family read by the
  * MERGE join), not the accumulated store — a store that rewrites its
  * full history per batch shows bytes-written growing linearly with
  * batch number here. Run:
  *
  *   sbt "Test/runMain graft.StoreScaleProbe"
  *
  * Measured numbers are recorded in SCALE.md. Batches are disjoint
  * subject slices of the sf0.1 documents table (3 triples per doc),
  * plus a re-extraction of the PREVIOUS slice with one changed object —
  * so every batch exercises fresh inserts, extensions, and
  * deprecations, the full V3/V4/V5 surface.
  */
object StoreScaleProbe {

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars").localCheckpoint()
    val n = docs.count()
    val nBatches = 10
    val step = n / nBatches + 1

    def slice(b: Int, changed: Boolean) = {
      val s = docs.filter(col("doc_id") >= b * step &&
        col("doc_id") < (b + 1) * step)
      val subj = concat(lit("http://m/"), col("doc_id"))
      val rows = Seq(
        s.select(subj.as("subject"), lit("http://p/source").as("predicate"),
          (if (changed) concat(lit("v2:"), col("source")) else col("source"))
            .as("obj")),
        s.select(subj.as("subject"), lit("http://p/lang").as("predicate"),
          col("lang").as("obj")),
        s.select(subj.as("subject"), lit("http://p/chars").as("predicate"),
          col("n_chars").cast("string").as("obj")))
      rows.reduce(_ unionByName _)
        .withColumn("objKind", lit("literal"))
        .withColumn("datatype", lit(""))
        .withColumn("extractionMethod", lit("probe"))
        .withColumn("confidence", lit(1.0))
    }

    val root = load.Scratch.dir("probe_store", dir)
    // arm 1 measures PURE delta growth — auto-compaction off
    val store = new load.TripletStore(spark, root.getAbsolutePath,
      autoCompactEvery = 0)
    println(s"[store] $n docs in $nBatches batches of ~$step " +
      s"(x3 triples, prev slice re-extracted with 1 changed predicate)")
    try {
      (0 until nBatches).foreach { b =>
        val t = Timestamp.valueOf(f"2024-01-${b + 1}%02d 00:00:00")
        val fresh = slice(b, changed = false)
        val batch =
          (if (b == 0) fresh
           else fresh.unionByName(slice(b - 1, changed = true)))
            .withColumn("extractionTime", lit(t))
        val dt = timed(store.merge(batch, t))
        val total = dirBytes(root)
        // the newest committed dir family for this merge (delta or full
        // snapshot, depending on the store's layout generation)
        val newest = Option(root.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.endsWith(s"=${store.currentVersion}"))
          .map(dirBytes).sum
        println(f"[store] batch=$b dt=$dt%6.2fs wroteMB=${newest / 1e6}%7.2f " +
          f"storeMB=${total / 1e6}%7.2f v=${store.currentVersion}")
      }
      val t0 = System.nanoTime()
      val cnt = store.currentTriples.count()
      println(f"[store] currentTriples=$cnt read=${(System.nanoTime() - t0) / 1e9}%5.2fs")

      // Compaction-cadence arm: same batches under the store's DEFAULT
      // auto-compaction (every 4 levels, keep 1 here) — the read side
      // (levels under the reconstruction window) must stay bounded
      // instead of growing one delta per batch, with no caller calls.
      val root2 = load.Scratch.dir("probe_store_c", dir)
      val store2 = new load.TripletStore(spark, root2.getAbsolutePath,
        autoCompactEvery = 4, autoCompactKeep = 1)
      try {
        (0 until nBatches).foreach { b =>
          val t = Timestamp.valueOf(f"2024-01-${b + 1}%02d 00:00:00")
          val fresh = slice(b, changed = false)
          val batch =
            (if (b == 0) fresh
             else fresh.unionByName(slice(b - 1, changed = true)))
              .withColumn("extractionTime", lit(t))
          val dt = timed(store2.merge(batch, t))
          val levels = Option(root2.listFiles()).getOrElse(Array.empty)
            .count(f => f.isDirectory &&
              (f.getName.startsWith("v=") || f.getName.startsWith("base=")))
          println(f"[store-c] batch=$b dt=$dt%6.2fs levels=$levels " +
            f"storeMB=${dirBytes(root2) / 1e6}%7.2f")
        }
        val t1 = System.nanoTime()
        val cnt2 = store2.currentTriples.count()
        println(f"[store-c] currentTriples=$cnt2 read=${(System.nanoTime() - t1) / 1e9}%5.2fs")
      } finally load.Scratch.rm(root2)

      // Bucket-pruning arm (r12): the UNTOUCHED store grows 10× while a
      // FIXED small merge (5 subjects) repeats — under the subject-bucket
      // partition layout the merge's level read must stay pinned to the
      // touched buckets: files-read flat (≤ touched buckets × levels) and
      // merge wall time flat, while the store's total file bytes grow.
      // Pre-bucketing, every one of these merges scanned ALL live rows.
      val root3 = load.Scratch.dir("probe_store_b", dir)
      // bucketMinRows = 1 forces the bucketed layout at probe scale (by
      // default only lake-sized levels bucket — at 100 TB the base always
      // crosses the floor; this probe's whole store is toy-sized)
      val store3 = new load.TripletStore(spark, root3.getAbsolutePath,
        autoCompactEvery = 0, bucketMinRows = 1L)
      def fixedBatch(step: Int) = {
        val s = docs.filter(col("doc_id") < 5)
        s.select(concat(lit("http://m/"), col("doc_id")).as("subject"),
            lit("http://p/source").as("predicate"),
            concat(lit(s"s$step:"), col("source")).as("obj"))
          .withColumn("objKind", lit("literal"))
          .withColumn("datatype", lit(""))
          .withColumn("extractionMethod", lit("probe"))
          .withColumn("confidence", lit(1.0))
          .withColumn("extractionTime",
            lit(Timestamp.valueOf(f"2024-02-${step + 1}%02d 00:00:00")))
      }
      try {
        println(s"[store-b] fixed 5-subject merge vs store growing in " +
          s"$nBatches untouched slices (compacted to one bucketed base each step)")
        (0 until nBatches).foreach { b =>
          val t = Timestamp.valueOf(f"2024-01-${b + 1}%02d 00:00:00")
          store3.merge(slice(b, changed = false).withColumn("extractionTime",
            lit(t)), t)
          store3.compact(keep = 1)
          val dt = timed(store3.merge(fixedBatch(b),
            Timestamp.valueOf(f"2024-02-${b + 1}%02d 00:00:00")))
          // re-run the merge's pruned level read to count the files the
          // scan actually touched (same subjects → same buckets)
          val fb = load.TripletStore.withIdentity(fixedBatch(b))
          val subjects5 = (0 until 5).map(i => s"http://m/$i")
          val pruned = store3.reconstruct(store3.currentVersion,
            openOnly = true, subjects = Some(fb.select("subject").distinct()),
            bucketsFor = Some(n => subjects5
              .map(load.TripletStore.subjectBucketLocal(_, n)).distinct))
          pruned.collect()
          val filesRead = PlanWalk.filesRead(pruned)
          println(f"[store-b] step=$b dt=$dt%6.2fs filesRead=$filesRead%3d " +
            f"of ${PlanWalk.countParquet(root3)}%4d " +
            f"storeMB=${dirBytes(root3) / 1e6}%7.2f")
        }
      } finally load.Scratch.rm(root3)

      // Saturation + within-bucket continuation arm (r13): partition
      // pruning alone SATURATES — a batch of s random subjects covers
      // ~N(1-e^(-s/N)) buckets, so past s ≈ N·ln N every partition dir
      // is touched and files-read ≈ total again. The literal subject
      // pushdown (subject-sorted level files + isin against footer
      // stats) must keep the SCAN's materialized rows at O(matching)
      // even then. Two pinned Ns show the ceiling moves with the knob
      // while the literal path's row bound does not depend on it.
      Seq(16, 64).foreach { n =>
        val rootd = load.Scratch.dir(s"probe_store_d$n", dir)
        // small target file size: several row groups per bucket, so
        // within-bucket pruning has something to skip (at 100 TB a
        // bucket holds thousands of 1M-row files; this is that geometry
        // shrunk to probe scale)
        val stored = new load.TripletStore(spark, rootd.getAbsolutePath,
          autoCompactEvery = 0, bucketMinRows = 1L, subjectBuckets = n,
          targetRowsPerFile = 256L)
        try {
          val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
          (0 until nBatches).foreach { b =>
            stored.merge(slice(b, changed = false)
              .withColumn("extractionTime", lit(t0)), t0)
          }
          stored.compact(keep = 1)
          val totalFiles = PlanWalk.countParquet(rootd)
          val totalRows = stored.ranges.count()
          println(s"[store-d] N=$n base: files=$totalFiles rows=$totalRows")
          Seq(5, 50, 200, 1000, 5000).foreach { s =>
            val subjList = (0 until s).map(i => s"http://m/$i")
            val subjDf = {
              import spark.implicits._
              subjList.toDF("subject")
            }
            val buckets = subjList
              .map(load.TripletStore.subjectBucketLocal(_, n)).distinct
            val bucketsFor = Some((_: Int) => buckets)
            // r12 shape: partition pruning + semi-join (rows filtered
            // AFTER the scan materializes the touched partitions)
            val semi = stored.reconstruct(stored.currentVersion,
              openOnly = true, subjects = Some(subjDf),
              bucketsFor = bucketsFor)
            semi.collect()
            // r13 shape: same partitions, literal pushdown prunes row
            // groups inside them
            val litDf = stored.reconstruct(stored.currentVersion,
              openOnly = true, bucketsFor = bucketsFor,
              subjectLits = Some(subjList))
            val matching = litDf.collect().length
            println(f"[store-d] N=$n subjects=$s%5d " +
              f"buckets=${buckets.length}%3d " +
              f"files=${PlanWalk.filesRead(litDf)}%4d/$totalFiles%4d " +
              f"scanRows(semi)=${PlanWalk.scanOutputRows(semi)}%8d " +
              f"scanRows(lit)=${PlanWalk.scanOutputRows(litDf)}%8d " +
              f"matching=$matching%7d")
          }
        } finally load.Scratch.rm(rootd)
      }

      // Re-pin arm (r14): a store that STARTS SMALL pins a small N at
      // its first bucketed commit; after growing ~10× its compaction
      // must RE-DERIVE the bucket count (auto-sizing only) so pruning
      // granularity tracks the store, not its day-one size. Control: an
      // explicitly seeded store (the pin-is-the-caller's-contract case)
      // grown and compacted identically keeps its N — same level count,
      // same data, different modulus → the files-read delta is the
      // re-pin's, not the compaction's.
      Seq(("pin64", 64), ("auto", 0)).foreach { case (tag, seedN) =>
        val roote = load.Scratch.dir(s"probe_store_e_$tag", dir)
        // target 64 rows/file so the grown base's auto-derivation
        // (15000/64 = 234) clears the 2x re-pin hysteresis over the
        // 64-bucket floor the day-one level pins
        val storee = new load.TripletStore(spark, roote.getAbsolutePath,
          autoCompactEvery = 0, bucketMinRows = 1L, subjectBuckets = seedN,
          targetRowsPerFile = 64L)
        try {
          val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
          // day one: one slice pins the small N
          storee.merge(slice(0, changed = false)
            .withColumn("extractionTime", lit(t0)), t0)
          val n0 = java.nio.file.Files.readString(new java.io.File(roote,
            load.TripletStore.BucketMarker).toPath).trim.toInt
          // growth: 9 more slices, then ONE compaction
          (1 until nBatches).foreach { b =>
            storee.merge(slice(b, changed = false)
              .withColumn("extractionTime", lit(t0)), t0)
          }
          storee.compact(keep = 1)
          val n1 = java.nio.file.Files.readString(new java.io.File(roote,
            load.TripletStore.BucketMarker).toPath).trim.toInt
          val lookup = storee.currentTriplesFor(
            (0 until 5).map(i => s"http://m/$i"))
          lookup.collect()
          println(f"[store-e] $tag: N day-one=$n0 after-compaction=$n1 " +
            f"lookupFilesRead=${PlanWalk.filesRead(lookup)}%4d of " +
            f"${PlanWalk.countParquet(roote)}%4d " +
            f"rows=${storee.ranges.count()}")
        } finally load.Scratch.rm(roote)
      }

      // Dead-zone arm (r14): literal batches past the r13 or-tree cap
      // (1024). r13 assumed an In above the session threshold collapsed
      // to a useless min..max range; Spark 4.1's native above-threshold
      // path actually prunes row groups by the value SET against footer
      // stats + the subject blooms commitLevel writes — so the 5000-
      // literal batch pushes as ONE In, no chunking, no threshold raise
      // (graft.InPushProbe is the controlled matrix; this arm shows it
      // end-to-end through reconstruct). What row groups CAN prune is
      // density physics: a row group holding g subjects probed with p of
      // S subjects is read with P(hit) ~ 1-e^(-pg/S) — the "scattered"
      // shape (uniform every-90th) sits near saturation at probe
      // geometry (g=256, p=5000, S=450k -> ~2.8 probes/row group) and
      // becomes prunable at lake ratios; the "clustered" shape (10 runs
      // of 500 — a crawl-frontier/platform-prefix batch) prunes to
      // O(touched row groups) at ANY scale. Both are printed; semi =
      // the join fallback reading every row of the touched buckets.
      // Two subject-space sizes: at S=450k a uniform 5000-probe has
      // λ = pg/S ≈ 2.8 expected probes per 256-subject row group (near
      // saturation — most row groups genuinely contain a probe); at
      // S=3M λ ≈ 0.43 and the skipped fraction must visibly grow,
      // measuring the λ-trend the 100 TB claim extrapolates (at lake
      // ratios λ ≪ 1 and nearly every row group skips).
      Seq(450000L, 3000000L).foreach { totalRows =>
        val rootf = load.Scratch.dir(s"probe_store_f$totalRows", dir)
        val storef = new load.TripletStore(spark, rootf.getAbsolutePath,
          autoCompactEvery = 0, bucketMinRows = 1L, subjectBuckets = 64,
          targetRowsPerFile = 256L)
        try {
          val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
          val corpus = spark.range(totalRows).select(
              format_string("http://m/%07d", col("id")).as("subject"),
              lit("http://p/x").as("predicate"),
              concat(lit("v"), col("id")).as("obj"))
            .withColumn("objKind", lit("literal"))
            .withColumn("datatype", lit(""))
            .withColumn("extractionMethod", lit("probe"))
            .withColumn("confidence", lit(1.0))
            .withColumn("extractionTime", lit(t0))
          storef.merge(corpus, t0)
          val lam = 5000.0 * 256 / totalRows
          println(f"[store-f] S=$totalRows subjects, N=64, 256-row files; " +
            f"5000-subject probes (past the r13 or-tree cap), lambda=$lam%.2f")
          val stride = (totalRows / 10).toInt
          val clustered = (0 until 10).flatMap(r =>
            (0 until 500).map(i => f"http://m/${r * stride + i}%07d"))
          val scattered = (0 until 5000).map(i =>
            f"http://m/${i.toLong * (totalRows / 5000)}%07d")
          Seq(("clustered", clustered), ("scattered", scattered)).foreach {
            case (tag, subj) =>
              val bucketsFor = Some((n: Int) => subj
                .map(load.TripletStore.subjectBucketLocal(_, n)).distinct)
              val subjDf = {
                import spark.implicits._
                subj.toDF("subject")
              }
              val semi = storef.reconstruct(storef.currentVersion,
                openOnly = true, subjects = Some(subjDf),
                bucketsFor = bucketsFor)
              semi.collect()
              val litDf = storef.reconstruct(storef.currentVersion,
                openOnly = true, bucketsFor = bucketsFor,
                subjectLits = Some(subj))
              val matching = litDf.collect().length
              println(f"[store-f] S=$totalRows $tag%-9s " +
                f"scanRows(semi)=${PlanWalk.scanOutputRows(semi)}%8d " +
                f"scanRows(lit)=${PlanWalk.scanOutputRows(litDf)}%8d " +
                f"matching=$matching%5d")
          }
        } finally load.Scratch.rm(rootf)
      }
      // Legacy-rewrite arm (r15), part 1 — bloom recovery in ONE pass:
      // a store upgraded in place keeps pre-r14 levels (no subject
      // blooms, no _SBKT_N) until a compaction cut happens to absorb
      // them; while they survive, scattered point-sets prune ~2x looser
      // (store-f measured the bloomed floor). rewriteLegacyLevels()
      // must return the read path to bloomed scan counts in one
      // claimed maintenance pass — no compaction, no waiting. The
      // "legacy" state is simulated by rewriting the committed level
      // with identical rows, bucketing, and sort but WITHOUT blooms or
      // the modulus marker (exactly what a pre-r14 binary wrote).
      val rootg = load.Scratch.dir("probe_store_g", dir)
      val storeg = new load.TripletStore(spark, rootg.getAbsolutePath,
        autoCompactEvery = 0, bucketMinRows = 1L, subjectBuckets = 64,
        targetRowsPerFile = 256L)
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
        val totalRows = 3000000L
        val corpus = spark.range(totalRows).select(
            format_string("http://m/%07d", col("id")).as("subject"),
            lit("http://p/x").as("predicate"),
            concat(lit("v"), col("id")).as("obj"))
          .withColumn("objKind", lit("literal"))
          .withColumn("datatype", lit(""))
          .withColumn("extractionMethod", lit("probe"))
          .withColumn("confidence", lit(1.0))
          .withColumn("extractionTime", lit(t0))
        storeg.merge(corpus, t0)
        val scattered = (0 until 5000).map(i =>
          f"http://m/${i.toLong * (totalRows / 5000)}%07d")
        def probeRows(): Long = {
          val litDf = storeg.reconstruct(storeg.currentVersion,
            openOnly = true,
            bucketsFor = Some((n: Int) => scattered
              .map(load.TripletStore.subjectBucketLocal(_, n)).distinct),
            subjectLits = Some(scattered))
          litDf.collect()
          PlanWalk.scanOutputRows(litDf)
        }
        val bloomed = probeRows()
        // demote v=0 to the pre-r14 layout: same rows/bucketing/sort,
        // no blooms, no self-described modulus
        val lvl = new java.io.File(rootg, "v=0")
        val legacyTmp = new java.io.File(rootg, ".tmp-legacy-sim")
        val lvlDf = spark.read
          .schema(load.TripletStore.bucketedPhysSchema)
          .parquet(lvl.getAbsolutePath)
        graft.sinks.Sinks.writeClusteredBy(lvlDf,
          legacyTmp.getAbsolutePath, (totalRows / 256).toInt, 256L,
          load.TripletStore.BucketCol, "subject", "tripletHash", "infoHash")
        load.Scratch.rm(lvl)
        java.nio.file.Files.move(legacyTmp.toPath, lvl.toPath)
        val legacy = probeRows()
        val rewritten = storeg.rewriteLegacyLevels()
        val recovered = probeRows()
        println(f"[store-g1] S=$totalRows scattered-5000 scanRows: " +
          f"bloomed=$bloomed%8d legacy=$legacy%8d " +
          f"afterRewrite=$recovered%8d (one pass: $rewritten)")
      } finally load.Scratch.rm(rootg)

      // Legacy-rewrite arm (r15), part 2 — re-pin eligibility in the
      // SAME compaction: r14's repin guard refused while a legacy
      // survivor stood (several cycles in the looser regime for a
      // recently-merged delta); now the pass rewrites the survivor
      // under the held claim first, so ONE compaction reaches both the
      // modern read path and the re-pinned bucket count.
      val rooth = load.Scratch.dir("probe_store_g2", dir)
      val storeh = new load.TripletStore(spark, rooth.getAbsolutePath,
        autoCompactEvery = 0, bucketMinRows = 1L, subjectBuckets = 0,
        targetRowsPerFile = 64L)
      try {
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
        storeh.merge(slice(0, changed = false)
          .withColumn("extractionTime", lit(t0)), t0)
        val n0 = java.nio.file.Files.readString(new java.io.File(rooth,
          load.TripletStore.BucketMarker).toPath).trim.toInt
        (1 until nBatches).foreach { b =>
          storeh.merge(slice(b, changed = false)
            .withColumn("extractionTime", lit(t0)), t0)
        }
        // the LAST delta becomes a legacy survivor of the keep=2 cut
        val survivorMarker = new java.io.File(
          new java.io.File(rooth, s"v=${storeh.currentVersion}"),
          load.TripletStore.LevelBucketMarker)
        if (!survivorMarker.delete())
          println("[store-g2] WARNING: survivor had no modulus marker")
        storeh.compact(keep = 2)
        val n1 = java.nio.file.Files.readString(new java.io.File(rooth,
          load.TripletStore.BucketMarker).toPath).trim.toInt
        val rv = new java.io.File(rooth, s"rv=${storeh.currentVersion}")
        val rvDescribed = new java.io.File(rv,
          load.TripletStore.LevelBucketMarker).exists()
        println(f"[store-g2] legacy survivor + ONE compaction: " +
          f"N day-one=$n0 after=$n1 " +
          f"survivorRewritten=${rv.exists()} selfDescribed=$rvDescribed " +
          f"rows=${storeh.ranges.count()}")
      } finally load.Scratch.rm(rooth)
    } finally {
      load.Scratch.rm(root)
      spark.stop()
    }
  }
}
