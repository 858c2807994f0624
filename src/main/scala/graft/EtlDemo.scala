package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.SchemaPropertyExtractor.{PropertyQuery, TokenOverlapScorer}
import graft.extract.{ModelCardPipeline, PlatformPipelines}
import graft.load.TripletStore
import graft.operators.TagCategorizer.Vocabs
import graft.sinks.Sinks
import graft.sources.LiveSource
import graft.transform.{EntityBuilders, MetadataReification, TripleBuilder}

/** Runnable end-to-end of the reference's ETL lifecycle (SURVEY §3.1-3.2):
  * connector fetch (LiveSource through a stub transport) → quality filter
  * → known fields / tags / YAML / context-match → document dedup intake
  * (incremental MinHash index) + semantic dedup (embedding index) →
  * triples + reified metadata → OpenML nested child-entity trees → arXiv
  * batched fetch → versioned MERGE (two versions, demonstrating
  * deprecation) → current-graph & platform-tagged doc-pivot queries →
  * N-Triples export + chunked remote upload.
  *
  *   sbt "runMain graft.EtlDemo /tmp/etl_demo"
  *
  * Uses an inline demo snapshot (FIXTURES.md §1 schema) — the TESTDATA
  * tables back the graded query surface instead; see SparkEntry.
  */
object EtlDemo {

  /** Object-static receipt tally for the demo upload: executor-side
    * transport calls must write somewhere the driver can read back, and
    * in local mode only JVM-static state survives closure serialization. */
  private[graft] object DemoUploadSink {
    val received = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  }

  private def snapshot(spark: SparkSession, card: String): DataFrame = {
    import spark.implicits._
    Seq(
      ("demo/alpha", "demo", Timestamp.valueOf("2024-01-02 00:00:00"), 120L, 7L,
        "transformers", Seq("dataset:squad", "en", "text-classification", "arxiv:1000.1"),
        "text-classification", Timestamp.valueOf("2024-01-01 00:00:00"), card),
      ("demo/short", "demo", Timestamp.valueOf("2024-01-02 00:00:00"), 1L, 0L,
        "transformers", Seq("en"), "fill-mask",
        Timestamp.valueOf("2024-01-01 00:00:00"), "too short"))
      .toDF("modelId", "author", "last_modified", "downloads", "likes",
        "library_name", "tags", "pipeline_tag", "createdAt", "card")
  }

  private def card(license: String): String =
    s"""---
       |license: $license
       |---
       |# Alpha model
       |A compact demo transformer for text classification tasks.
       |## Intended Use
       |Classify short english snippets in demo pipelines.
       |## Training Details
       |Trained on a small curated corpus for a few epochs.
       |""".stripMargin + ("filler " * 40)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/etl_demo")
    // the demo is re-runnable: the versioned store, dedup indexes and
    // sinks under `out` are THIS run's artifacts — a second invocation
    // must start from the same empty state (the lifecycle asserts below
    // check first-run merge/drop counts). Deleting is GUARDED by the
    // marker a previous run left: a mistyped path to a real directory
    // must abort, never be silently recursively removed.
    val outDir = new java.io.File(out)
    val marker = new java.io.File(outDir, ".graft_etl_demo")
    if (outDir.exists()) {
      val empty = Option(outDir.listFiles()).forall(_.isEmpty)
      require(empty || marker.exists(),
        s"refusing to clear '$out': it exists, is non-empty and was not " +
          "written by a previous EtlDemo run (no .graft_etl_demo marker). " +
          "Pass an empty or fresh directory.")
      graft.load.Scratch.rm(outDir)
    }
    outDir.mkdirs()
    java.nio.file.Files.writeString(marker.toPath, "etl demo artifacts\n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocabs = Vocabs(Seq("en", "zh"), Seq("transformers"),
      Seq("text classification", "fill mask"))
    val schemaQs = Seq(
      PropertyQuery("fair4ml:intendedUse", "intended use of the model"),
      PropertyQuery("fair4ml:trainingDetails", "training details and data"))
    val backend = new TokenOverlapScorer
    // Production operating mode: the store compacts ITSELF — after any
    // merge pushes the live level count past autoCompactEvery, the merge
    // folds the levels down to autoCompactKeep retained versions. The
    // demo runs a deliberately tight cadence (2/2) so it fires across the
    // five merge legs below; every leg asserts the resulting bound.
    val autoCompactEvery = 2
    val store = new TripletStore(spark, s"$out/store",
      autoCompactEvery = autoCompactEvery, autoCompactKeep = 2)
    def assertLevelBound(leg: String): Unit = {
      require(store.levelCount <= autoCompactEvery,
        s"auto-compaction cadence violated after $leg: " +
          s"${store.levelCount} levels > $autoCompactEvery")
      println(s"[etl] store after $leg: ${store.levelCount} level(s), " +
        s"retained v${store.oldestRetainedVersion}..v${store.currentVersion}")
    }

    def load(license: String, time: String): Unit = {
      val t = Timestamp.valueOf(time)
      // production fetch shape: driver-side list + distributed mapPartitions
      // card fetch, here against an in-memory transport
      val cards = Map("demo/alpha" -> card(license), "demo/short" -> "too short")
      val client = () => new LiveSource.HttpClient with Serializable {
        def get(url: String): String =
          if (url.endsWith("/models")) cards.keys.toSeq.sorted.mkString("\n")
          else cards(url.substring(url.indexOf("=") + 1))
      }
      val ids = LiveSource.listIds(client(), "stub://api/models", limit = 10)
      val fetched = LiveSource.fetch(spark, ids, client,
          id => s"stub://api/card?id=$id").toDF()
        .select(col("id").as("modelId"), col("payload").as("card"))
      val snap = snapshot(spark, card(license)).drop("card")
        .join(fetched, "modelId")
      val props = ModelCardPipeline.properties(snap, vocabs, backend, schemaQs)
      val inc = ModelCardPipeline.toTriples(props, "demo", t)
      val stats = store.merge(inc, t)
      println(s"[etl] merge @$time: new=${stats.nNew} extended=${stats.nExtended} " +
        s"deprecated=${stats.nDeprecated}")
      assertLevelBound(s"merge @$time")
    }

    load("apache-2.0", "2024-01-10 00:00:00")
    load("mit", "2024-02-10 00:00:00") // license change → deprecation

    // OpenML platform: T1 nested DatasetObject/EvaluationObject trees
    {
      import spark.implicits._
      val t = Timestamp.valueOf("2024-02-10 00:00:00")
      val runs = Seq(("run-1", "mnist", "https://www.openml.org/d/554",
          "crossvalidation", "https://api.openml.org/splits/1"))
        .toDF("run_id", "ds_name", "ds_url", "ep_type", "ep_url")
        .select(col("run_id"),
          struct(col("ds_name").as("name"), col("ds_url").as("url"),
            struct(col("ep_type").as("type"), col("ep_url").as("data_splits_url"),
              map(lit("folds"), lit("10")).as("parameters"))
              .as("estimationProcedure")).as("dataset"),
          map(lit("auc"), lit(0.9912).cast("decimal(18,4)")).as("num_metrics"),
          map(lit("task"), lit("classification")).as("text_metrics"))
      val nested = PlatformPipelines.openmlNestedTriples(runs, "run_id")
        .withColumn("extractionMethod", lit("openml_python_package"))
        .withColumn("confidence", lit(1.0))
        .withColumn("extractionTime", lit(t))
      val stats = store.merge(nested, t)
      println(s"[etl] openml nested trees: new=${stats.nNew}")
      assertLevelBound("openml merge")

      // S8 enrichment: the dataset stats page scraped browserless (per-
      // partition transport, selector fallbacks, kill switch) and merged
      // as provenance-wrapped properties — scraped status wins over the
      // API status and the method column records the winner
      val scrapeClient = () => new LiveSource.HttpClient with Serializable {
        def get(url: String): String =
          if (url.endsWith("=554"))
            """<span aria-label="status">active</span>
              |<span title="downloads">1.2K</span>
              |<span aria-label="likes">17</span>""".stripMargin
          else throw new RuntimeException("page unavailable")
      }
      val scraped = graft.sources.StatsScraper.scrape(spark,
        Seq("554", "999"), scrapeClient,
        id => s"stub://openml/search?type=data&id=$id",
        policy = LiveSource.RetryPolicy(maxRetries = 0, sleep = _ => ()))
      val enriched = PlatformPipelines.openmlScrapedProperties(scraped.toDF(),
        apiStatus = Some(Seq(("999", "deactivated"))
          .toDF("identifier", "api_status")))
      val won = enriched.filter(col("property") === "schema.org:status")
        .select("modelId", "value", "method").collect()
        .map(r => s"${r.getString(0)}=${r.getString(1)}(${r.getString(2)})")
        .sorted.mkString(" ")
      println(s"[etl] openml scraped stats: $won")
    }

    // S5 production half: arXiv ids from the tags, fetched in BATCHES (one
    // API call per id group, per-batch retry, pacing) through a stub
    // transport; payload rows become T3 article triples
    {
      import spark.implicits._
      val t = Timestamp.valueOf("2024-02-10 00:00:00")
      val arxivIds = Seq("1000.1", "cs/1000.2v3")
      val client = () => new LiveSource.HttpClient with Serializable {
        def get(url: String): String = {
          val ids = url.substring(url.indexOf("=") + 1).split(",")
          ids.map(id => s"$id\tPaper $id\tAbstract of $id\t2024-01-15\t10.5/x$id")
            .mkString("\n")
        }
      }
      val fetched = LiveSource.fetchBatched(spark, arxivIds, client,
        ids => s"stub://arxiv/batch?ids=${ids.mkString(",")}",
        batchSize = 200, pacingMs = 0)
      val articles = fetched.filter(_.ok)
        .flatMap(_.payload.linesIterator.map { line =>
          val f = line.split("\t")
          (f(0), f(1), f(2), f(3), f(4), Seq("cs.LG"))
        })
        .toDF("arxiv_id", "title", "summary", "published", "doi", "categories")
      val arxivStats = store.merge(
        EntityBuilders.arxivTriples(articles)
          .withColumn("extractionMethod", lit("arXiv_API"))
          .withColumn("confidence", lit(1.0))
          .withColumn("extractionTime", lit(t)), t)
      println(s"[etl] arXiv batched fetch: ${arxivStats.nNew} article triples")
      require(arxivStats.nNew > 0, "arXiv leg produced no triples")
      assertLevelBound("arXiv merge")
    }

    // S4 production half: croissant JSON-LD fetched per dataset id through
    // the CroissantSource connector (GET {base}/api/datasets/{id}/croissant,
    // 429-aware retry honoring Retry-After), expanded + surgically
    // re-identified into T2 triples. The stub transport 429s each id once
    // (with a Retry-After hint) before answering — the retry path runs live.
    {
      import graft.sources.CroissantSource
      val t = Timestamp.valueOf("2024-02-10 00:00:00")
      val croissant = (name: String) =>
        s"""{"@context": {"name": "https://schema.org/name",
           |  "url": "https://schema.org/url"},
           | "@type": "sc:Dataset", "name": "$name",
           | "url": "https://huggingface.co/datasets/demo/$name",
           | "distribution": [{"@type": "http://mlcommons.org/croissant/FileObject",
           |   "name": "$name.parquet"}]}""".stripMargin
      val client = () => new LiveSource.HttpClient with Serializable {
        private val seen = scala.collection.mutable.Set.empty[String]
        def get(url: String): String = {
          if (seen.add(url)) throw LiveSource.RateLimited(Some(5L))
          val id = url.stripSuffix("/croissant")
          croissant(id.substring(id.lastIndexOf("/") + 1))
        }
      }
      val fetched = CroissantSource.fetchRaw(spark, Seq("squad", "imdb"),
        client, base = "stub://hub",
        policy = LiveSource.RetryPolicy(baseBackoffMs = 1, sleep = _ => ()))
      val triples = graft.transform.CroissantBuilder.build(
        CroissantSource.croissantInput(fetched))
        .withColumn("extractionMethod", lit("croissant_endpoint"))
        .withColumn("confidence", lit(1.0))
        .withColumn("extractionTime", lit(t))
      val stats = store.merge(triples, t)
      println(s"[etl] croissant fetch: ${stats.nNew} dataset triples")
      require(stats.nNew > 0, "croissant leg produced no triples")
      assertLevelBound("croissant merge")
    }

    // E8 strategy dispatch: the same card answers through all three
    // extraction strategies (matching / grouped QA / individual QA) with
    // identical provenance wrapping — the reference's config switch
    {
      import graft.extract.SchemaPropertyExtractor
      import graft.extract.SchemaPropertyExtractor.Strategy
      val models = snapshot(spark, card("mit"))
        .filter(col("modelId") === "demo/alpha").select("modelId", "card")
      val perStrategy = Seq(Strategy.ContextMatching, Strategy.Grouped,
        Strategy.Individual).map { st =>
        val n = SchemaPropertyExtractor
          .extract(models, schemaQs, backend, st).count()
        require(n == schemaQs.size,
          s"strategy ${st.name} extracted $n of ${schemaQs.size} properties")
        s"${st.name}=$n"
      }
      println(s"[etl] E8 strategies: ${perStrategy.mkString(", ")}")
    }

    // Corpus intake dedup: the model cards run through the incremental
    // MinHash index (exact + near dups dropped batch-over-batch) and a
    // deterministic embedding per card through the semantic index —
    // the harvest→clean→dedup production path in miniature
    {
      import spark.implicits._
      val cards = Seq(
        (1L, card("apache-2.0")), (2L, card("apache-2.0")), // exact dup pair
        (3L, card("apache-2.0").replace(" ", "  ")),         // near dup of 1
        (4L, "a genuinely different short note about evaluation"))
        .toDF("doc_id", "text")
      val dedup = new similarity.DedupIndex(spark, s"$out/dedup_index")
      val d1 = dedup.ingest(cards.filter(col("doc_id") <= 2))
      val d2 = dedup.ingest(cards.filter(col("doc_id") > 2))
      println(s"[etl] dedup intake: batch1 added=${d1.nAdded} dropped=${d1.nDropped}; " +
        s"batch2 added=${d2.nAdded} dropped=${d2.nDropped}; index=${dedup.size}")
      require(d1.nDropped == 1 && d2.nDropped == 1 && dedup.size == 2,
        s"dedup intake drop counts wrong: $d1 / $d2 / ${dedup.size}")

      val emb = Seq(
        (1L, Seq.tabulate(16)(i => (i + 1).toDouble)),
        (2L, Seq.tabulate(16)(i => (i + 1) * 2.0)), // same direction → dup
        (3L, Seq.tabulate(16)(i => (16 - i).toDouble)))
        .toDF("vec_id", "embedding")
      val sem = new similarity.SemanticDedupIndex(
        spark, s"$out/semantic_index", threshold = 0.999)
      val s1 = sem.ingest(emb)
      println(s"[etl] semantic dedup: added=${s1.nAdded} dropped=${s1.nDropped}")
      require(s1.nDropped == 1 && s1.nAdded == 2,
        s"semantic dedup drop counts wrong: $s1")

      // Dedup GROUP formation — the end of the dedup pipeline: the LSH
      // band-pair stage emits PAIRS; connected components resolves the
      // duplicate chains into groups with one min-id survivor each (the
      // reference's same-entity collapse, `GraphHandler.py:455-546`).
      // Cards 1/2 (exact) and 3 (near) chain into one group; 4 stands alone.
      val sigs = cards
        .select(col("doc_id"),
          graft.functions.GraftFunctions.minhash_sigs(
            graft.functions.GraftFunctions.word_ngrams(col("text"), 3), 4)
            .as("sig"))
      val banded = sigs.select(col("doc_id"),
        concat_ws("_", element_at(col("sig"), 1), element_at(col("sig"), 2)).as("b1"),
        concat_ws("_", element_at(col("sig"), 3), element_at(col("sig"), 4)).as("b2"))
      def pairsOn(c: String) = banded.as("x")
        .join(banded.as("y"), col(s"x.$c") === col(s"y.$c"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      val pairs = pairsOn("b1").union(pairsOn("b2")).distinct()
      val comp = graft.operators.ConnectedComponents(pairs)
      val groups = cards.select(col("doc_id"))
        .join(comp, cards("doc_id") === comp("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
        .cache()
      val nGroups = groups.select("group_id").distinct().count()
      val survivors = groups.filter(col("doc_id") === col("group_id"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      println(s"[etl] dedup groups: $nGroups groups, survivors=${survivors.mkString(",")}")
      require(nGroups == 2 && survivors == Seq(1L, 4L),
        s"dedup group formation wrong: $nGroups groups, survivors $survivors")
      groups.unpersist()
    }

    // Retention policy: beyond the automatic cadence, an operator can
    // compact manually to narrow the VERSION-travel window (keep = 1 →
    // only the current version remains a delta/snapshot target). The
    // graph a reader sees must be identical before and after, TIMESTAMP
    // travel still answers across the full history (closed ranges are
    // folded into the base, never dropped), and a version below the new
    // horizon fails loudly instead of returning an empty snapshot.
    val preCompact = store.currentTriples.count()
    val belowHorizon = store.oldestRetainedVersion
    store.compact(keep = 1)
    require(store.currentTriples.count() == preCompact,
      "compaction changed the current graph")
    require(store.levelCount == 1 &&
        store.oldestRetainedVersion == store.currentVersion,
      "retention compact(keep=1) should leave a single base level")
    val licenseAt = (t: String) => store
      .asOf(Timestamp.valueOf(t))
      .filter(col("predicate") === "schema.org:license")
      .select("obj").collect().map(_.getString(0)).toSeq
    require(licenseAt("2024-01-15 00:00:00") == Seq("apache-2.0") &&
        licenseAt("2024-02-15 00:00:00") == Seq("mit"),
      "as-of reads changed across the retention compaction")
    val horizonError =
      try { store.delta(belowHorizon, store.currentVersion); "none" }
      catch { case e: IllegalArgumentException => e.getMessage.take(60) }
    require(horizonError != "none",
      s"version $belowHorizon below the retention horizon must throw")
    println(s"[etl] retention: compacted to 1 base level at " +
      s"v${store.currentVersion}, $preCompact triples unchanged; as-of " +
      "history intact (apache-2.0 @Jan, mit @Feb); " +
      s"v$belowHorizon read errors: '$horizonError...'")

    // TIME-horizon arm: a production history store retains "at least T of
    // time-travel", not "at least N versions" — compact(olderThan) purges
    // closed ranges that no in-horizon as-of can ever touch, keeps the
    // current graph and every in-horizon answer bit-identical, and makes
    // below-horizon as-of reads throw instead of silently dropping the
    // purged history.
    val closedBefore = store.ranges.filter(col("deprecated")).count()
    store.compact(olderThan = Timestamp.valueOf("2024-03-01 00:00:00"))
    require(store.currentTriples.count() == preCompact,
      "time retention changed the current graph")
    require(licenseAt("2024-03-15 00:00:00") == Seq("mit"),
      "in-horizon as-of changed across time retention")
    val closedAfter = store.ranges.filter(col("deprecated")).count()
    require(closedAfter < closedBefore,
      s"time retention purged nothing ($closedBefore -> $closedAfter)")
    val ttlError =
      try { store.asOf(Timestamp.valueOf("2024-01-15 00:00:00")); "none" }
      catch { case e: IllegalArgumentException => e.getMessage.take(40) }
    require(ttlError != "none",
      "as-of below the time-retention horizon must throw")
    println(s"[etl] time retention: horizon 2024-03-01, closed ranges " +
      s"$closedBefore -> $closedAfter, in-horizon as-of intact (mit @Mar); " +
      s"below-horizon read errors: '$ttlError...'")

    // Multi-writer arm: two pipelines land batches into ONE store via
    // mergeWithRetry (autoCompactEvery = 0 — the multi-writer contract:
    // compaction runs from one owner). Barrier-synced so both compute
    // against the same snapshot and race the version rename; the loser
    // re-reads and re-merges. Every batch must land, versions dense.
    locally {
      import spark.implicits._
      val mwDir = s"$out/store_mw"
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val retries = new java.util.concurrent.atomic.AtomicInteger(0)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writers = (0 until 2).map { w =>
        new Thread(() => {
          try {
            val st = new TripletStore(spark, mwDir, autoCompactEvery = 0)
            (0 until 2).foreach { s =>
              val t = Timestamp.valueOf(f"2024-0${s + 1}-0${w + 1} 00:00:00")
              val inc = Seq((s"pipeline$w", "emitted", s"batch$s"))
                .toDF("subject", "predicate", "obj")
                .withColumn("objKind", lit("literal"))
                .withColumn("datatype", lit(""))
                .withColumn("extractionMethod", lit(s"demo-w$w"))
                .withColumn("confidence", lit(1.0))
                .withColumn("extractionTime", lit(t))
              barrier.await(120, java.util.concurrent.TimeUnit.SECONDS)
              st.mergeWithRetry(inc, t,
                onRetry = _ => retries.incrementAndGet())
            }
          } catch { case e: Throwable => failures.add(e) }
        })
      }
      writers.foreach(_.start())
      writers.foreach(_.join(300000))
      require(failures.isEmpty, s"multi-writer leg failed: ${failures.peek()}")
      val mw = new TripletStore(spark, mwDir, autoCompactEvery = 0)
      require(mw.currentVersion == 3,
        s"expected 4 dense versions from 2x2 merges, got v${mw.currentVersion}")
      println(s"[etl] multi-writer: 2 pipelines x 2 batches -> " +
        s"v0..v${mw.currentVersion}, ${retries.get()} lost race(s) retried, " +
        s"${mw.currentTriples.count()} triples")
    }

    val current = store.currentTriples
    println(s"[etl] current graph: ${current.count()} triples, " +
      s"${store.distinctSubjectCount} subjects, store v${store.currentVersion}")
    println("[etl] current license: " + current
      .filter(col("predicate") === "schema.org:license")
      .select("obj").collect().map(_.getString(0)).mkString(","))

    // V7: reified metadata for the latest ranges
    val meta = store.ranges.filter(!col("deprecated"))
      .select(col("subject"), col("predicate"), col("obj"),
        col("extractionMethod"), col("confidence"),
        col("useEnd").as("extractionTime"))
    Sinks.writeNTriples(MetadataReification.emit(meta), s"$out/metadata_nt")
    Sinks.writeNTriples(current, s"$out/kg_nt")
    println(s"[etl] exported N-Triples under $out/{kg_nt,metadata_nt}")

    // A10 search documents with platform classification
    val docs = TripleBuilder.docPivotPlatform(current)
    Sinks.writeJsonRecords(docs, s"$out/docs_json")
    val byPlatform = docs.groupBy("platform").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"[etl] doc pivot: ${docs.count()} search documents ($byPlatform)")

    // K8 production half: the current graph ships as chunked N-Triples
    // POSTs (chunks = partitions, idempotent per-chunk URLs) + one
    // finalize — here against an in-memory transport that tallies chunks
    {
      val received = DemoUploadSink.received
      received.clear()
      val transport = () => new graft.sinks.ChunkUploader.Transport with Serializable {
        def post(url: String, body: String): String = {
          DemoUploadSink.received.put(url,
            Integer.valueOf(body.linesIterator.count(_.nonEmpty)))
          "ok"
        }
      }
      val report = graft.sinks.ChunkUploader.upload(
        current, "https://demo/api", "demo-batch", numChunks = 3, transport)
      val chunkLines = received.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[String, Integer]])
        .filter(_.getKey.contains("/chunk/")).map(_.getValue.intValue()).sum
      println(s"[etl] upload: ${report.nTriples} triples in ${report.numChunks} " +
        s"chunks (${chunkLines} lines received, finalize=" +
        s"${received.containsKey("https://demo/api/upload/batch/demo-batch/finalize")})")
      require(report.nTriples == current.count() && chunkLines == report.nTriples,
        s"upload lost triples: $report vs ${current.count()} ($chunkLines received)")
    }
    spark.stop()
  }
}
