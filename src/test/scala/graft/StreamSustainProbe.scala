package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained-load probe for the streaming twins: feed a 10× corpus
  * (sf0.1 documents/embeddings replicated with the ScaleTenProbe
  * perturbation) through ≥20 real micro-batches and print, per batch,
  * the wall time and the standing state size. The claims under test:
  *
  *  - CMS stream: the aggregation state is bounded at depth×width cells
  *    FOREVER — `numRowsTotal` must plateau while batches keep arriving,
  *    and per-batch wall must track the BATCH, not the stream history.
  *  - dedup/semantic intake: the persisted signature/sketch index is the
  *    only state; per-batch ingest wall must stay ~flat as the standing
  *    index grows 20× (acceptance is equi-joins against signatures,
  *    never a rescan of accepted text).
  *
  * Run: sbt "Test/runMain graft.StreamSustainProbe [mult] [nBatches]"
  * Measured numbers are recorded in SCALE.md.
  */
object StreamSustainProbe {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    // optional third arg: run a single arm (cms|dedup|semantic|wres|attr)
    val only = args.drop(2).headOption
    def arm(name: String)(body: => Unit): Unit =
      if (only.forall(_ == name)) body
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    val docs = Tables(spark, src, "documents").localCheckpoint()
    val emb = Tables(spark, src, "embeddings").localCheckpoint()
    val nDocs = docs.count()
    val nVec = emb.count()
    println(s"[sustain] corpus ${mult}x over $nBatches micro-batches: " +
      s"${nDocs * mult} docs / ${nVec * mult} vecs total")

    // 10x replication with the ScaleTenProbe perturbation (replicas are
    // not near-dups of each other), pre-sliced into nBatches single-file
    // parquets so each file is exactly one micro-batch
    val reps = spark.range(mult).select(col("id").as("rep"))
    val bigDocs = docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          expr("array_join(transform(split(text, ' '), (w, i) -> " +
            "CASE WHEN (i + rep) % 7 = 0 THEN concat('rp', rep, 'x', i % 13) " +
            "ELSE w END), ' ')")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .localCheckpoint()
    val bigEmb = emb.crossJoin(reps)
      .select((col("vec_id") + col("rep") * nVec).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          expr("transform(embedding, (x, d) -> cast(x + " +
            "(cast(xxhash64(concat(cast(vec_id AS STRING), '|', " +
            "cast(rep AS STRING), '|', cast(d AS STRING))) % 1000 AS DOUBLE) " +
            "/ 1000.0) * 0.25 AS FLOAT))")).as("embedding"),
        col("label"))
      .localCheckpoint()

    def slices(df: DataFrame, idCol: String, total: Long): Seq[Path] = {
      val step = total / nBatches + 1
      (0 until nBatches).map { b =>
        val stage = Files.createTempDirectory(s"sustain_slice_$b")
        df.filter(col(idCol) >= b * step && col(idCol) < (b + 1) * step)
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
      }
    }

    def feed(watch: Path, slice: Path, i: Int): Unit =
      Files.copy(slice, watch.resolve(f"b$i%03d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    // ---- CMS stream: bounded-state aggregation over 20 batches --------
    arm("cms") {
      val docSlices = slices(bigDocs, "doc_id", nDocs * mult)
      val watch = Files.createTempDirectory("sustain_cms")
      val stream = spark.readStream
        .schema(streaming.StreamingCorpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
      val q = streaming.StreamingCorpus.cmsCells(stream)
        .writeStream.outputMode("complete").format("memory")
        .queryName("sustain_cms").start()
      docSlices.zipWithIndex.foreach { case (s, i) =>
        feed(watch, s, i)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val state = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        println(f"[sustain] cms     batch=$i%2d wall=$dt%6.2fs stateRows=$state")
      }
      q.stop()
    }

    // ---- dedup intake: standing signature index over 20 batches -------
    arm("dedup") {
      val docSlices = slices(bigDocs, "doc_id", nDocs * mult)
      val watch = Files.createTempDirectory("sustain_dedup")
      val idxPath = Files.createTempDirectory("sustain_dedup_idx").toString
      val stream = spark.readStream
        .schema(streaming.StreamingCorpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
      val q = streaming.StreamingCorpus.dedupIntake(stream, idxPath).start()
      docSlices.zipWithIndex.foreach { case (s, i) =>
        feed(watch, s, i)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val size = new similarity.DedupIndex(spark, idxPath).size
        println(f"[sustain] dedup   batch=$i%2d wall=$dt%6.2fs indexDocs=$size")
      }
      q.stop()
    }

    // ---- semantic intake: standing vector index over 20 batches -------
    arm("semantic") {
      import org.apache.spark.sql.types._
      val embSlices = slices(bigEmb, "vec_id", nVec * mult)
      val watch = Files.createTempDirectory("sustain_sem")
      val idxPath = Files.createTempDirectory("sustain_sem_idx").toString
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      val sk = similarity.SemanticSketch.forCorpus(nVec * mult)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
      val q = streaming.StreamingCorpus
        .semanticIntake(stream, idxPath, threshold = 0.95, sketch = sk).start()
      embSlices.zipWithIndex.foreach { case (s, i) =>
        feed(watch, s, i)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val size = new similarity.SemanticDedupIndex(spark, idxPath,
          threshold = 0.95, sketch = sk).size
        println(f"[sustain] semantic batch=$i%2d wall=$dt%6.2fs indexVecs=$size")
      }
      q.stop()
    }

    // ---- weighted reservoir: n-row state over 20 batches ---------------
    // The hardest possible bound: state is EXACTLY n rows forever (the
    // top-n merge law), so per-batch wall must track the batch alone and
    // the state column must pin at n from the first batch that fills it.
    arm("wres") {
      val docSlices = slices(bigDocs, "doc_id", nDocs * mult)
      val watch = Files.createTempDirectory("sustain_wres")
      val resPath = Files.createTempDirectory("sustain_wres_state").toString
      val stream = spark.readStream
        .schema(streaming.StreamingCorpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
      val q = streaming.WeightedReservoir.intake(
        stream.select(col("doc_id"), col("n_chars")),
        resPath, "sustain", 1000).start()
      docSlices.zipWithIndex.foreach { case (s, i) =>
        feed(watch, s, i)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val size = new streaming.WeightedReservoir(
          spark, resPath, "sustain", 1000).size
        require(size <= 1000, s"reservoir grew past n: $size")
        println(f"[sustain] wres    batch=$i%2d wall=$dt%6.2fs reservoirRows=$size")
      }
      q.stop()
    }

    // ---- media intake: standing signature index over 20 batches --------
    // Same claim as the text dedup intake: per-batch wall must track the
    // BATCH while the standing (media_id, sig) index grows — acceptance
    // is signature/band equi-joins against the index, never a re-decode
    // or rescan of accepted payloads.
    arm("media") {
      import org.apache.spark.sql.types._
      val mediaDocs = bigDocs.select(col("doc_id").as("id"),
        col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mediaType"))
      val step = nDocs * mult / nBatches + 1
      val mediaSlices = (0 until nBatches).map { b =>
        val stage = Files.createTempDirectory(s"sustain_media_$b")
        mediaDocs.filter(col("id") >= b * step && col("id") < (b + 1) * step)
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
      }
      val watch = Files.createTempDirectory("sustain_media_watch")
      val idxPath = Files.createTempDirectory("sustain_media_idx").toString
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("payload", BinaryType),
        StructField("mediaType", StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
      val q = streaming.StreamingCorpus.mediaIntake(stream, idxPath).start()
      mediaSlices.zipWithIndex.foreach { case (s, i) =>
        feed(watch, s, i)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val size = new similarity.MediaDedupIndex(spark, idxPath).size
        println(f"[sustain] media   batch=$i%2d wall=$dt%6.2fs indexMedia=$size")
      }
      q.stop()
    }

    // ---- stream-stream attribution join: watermark-evicted state -------
    // Claim under test (SCALE.md): join state is proportional to
    // watermark (2 h) + match window (30 min), NOT stream history. Each
    // micro-batch advances event time by 3 h, so the watermark passes
    // old buffered rows every batch — numRowsTotal must PLATEAU at
    // ~one time-window's worth of rows while numRowsRemoved stays hot,
    // and per-batch wall must track the batch.
    arm("attr") {
      import org.apache.spark.sql.types._
      val nPerBatch = 50000L
      val users = 2000L
      val spanMs = 3L * 3600 * 1000 // 3 h of event time per batch
      val base = 1700000000000L
      val ev = spark.range(nPerBatch * nBatches).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id"), lit("u")), lit(users)).as("user_id"),
        when(pmod(xxhash64(col("id"), lit("t")), lit(5)) === 0, "purchase")
          .otherwise("view").as("event_type"),
        timestamp_millis(lit(base) +
          (col("id") / nPerBatch).cast("long") * spanMs +
          pmod(xxhash64(col("id"), lit("ms")), lit(spanMs))).as("ts"),
        lit(1.0).as("value"),
        (col("id") / nPerBatch).cast("int").as("batch"))
        .localCheckpoint()
      val attrSlices = (0 until nBatches).map { b =>
        val stage = Files.createTempDirectory(s"sustain_attr_$b")
        ev.filter(col("batch") === b).drop("batch")
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        Files.list(stage).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
      }
      val watch = Files.createTempDirectory("sustain_attr_watch")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("ts", TimestampType), StructField("value", DoubleType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
      val joined = streaming.EventStreams.attributionJoin(
        stream.filter(col("event_type") === "view"),
        stream.filter(col("event_type") === "purchase"))
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName("sustain_attr").start()
      attrSlices.zipWithIndex.foreach { case (s, i) =>
        feed(watch, s, i)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val (state, removed) = Option(q.lastProgress)
          .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
            p.stateOperators.map(_.numRowsRemoved).sum))
          .getOrElse((-1L, -1L))
        val out = spark.table("sustain_attr").count()
        println(f"[sustain] attr    batch=$i%2d wall=$dt%6.2fs stateRows=$state removed=$removed outRows=$out")
      }
      q.stop()
    }

    spark.stop()
  }
}
