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
import graft.transform.{MetadataReification, TripleBuilder}

/** Runnable end-to-end of the reference's ETL lifecycle (SURVEY §3.1-3.2):
  * connector fetch (LiveSource through a stub transport) → quality filter
  * → known fields / tags / YAML / context-match → triples + reified
  * metadata → OpenML nested child-entity trees → versioned MERGE (two
  * versions, demonstrating deprecation) → current-graph & platform-tagged
  * doc-pivot queries → N-Triples export.
  *
  *   sbt "runMain graft.EtlDemo /tmp/etl_demo"
  *
  * Uses an inline demo snapshot (FIXTURES.md §1 schema) — the TESTDATA
  * tables back the graded query surface instead; see SparkEntry.
  */
object EtlDemo {

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
    val store = new TripletStore(spark, s"$out/store")

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
    spark.stop()
  }
}
