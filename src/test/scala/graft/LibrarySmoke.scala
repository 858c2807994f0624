package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library surface (store + streaming +
  * transform) through public exports, against the real testdata.
  * Run: sbt "Test/runMain graft.LibrarySmoke"
  */
object LibrarySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.transform.TripleBuilder

    // triple-generate from real customer table → merge into a fresh store
    val tri = queries.Graph.tripleGen(spark, TestSpark.sf0001)
      .withColumn("extractionMethod", lit("customer_parser"))
      .withColumn("confidence", lit(1.0))
      .withColumn("extractionTime", lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    val dir = Files.createTempDirectory("smoke_store").toString
    val store = new load.TripletStore(spark, dir)
    val s1 = store.merge(tri, Timestamp.valueOf("2024-01-01 00:00:00"))
    println(s"MERGE1 new=${s1.nNew} ext=${s1.nExtended} dep=${s1.nDeprecated}")
    println(s"SUBJECTS=${store.distinctSubjectCount}")

    // second merge with one mutated subject → deprecate + new
    val mutated = tri.withColumn("obj",
      when(col("subject") === "urn:cust:0" && col("predicate") === "schema:name",
        lit("Renamed#000")).otherwise(col("obj")))
      .withColumn("extractionTime", lit(Timestamp.valueOf("2024-02-01 00:00:00")))
    val s2 = store.merge(mutated, Timestamp.valueOf("2024-02-01 00:00:00"))
    println(s"MERGE2 new=${s2.nNew} ext=${s2.nExtended} dep=${s2.nDeprecated}")
    println("CURRENT_NAME=" + store.currentTriples
      .filter(col("subject") === "urn:cust:0" && col("predicate") === "schema:name")
      .select("obj").head().getString(0))

    // streaming vs batch on real events
    val sdir = Files.createTempDirectory("smoke_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      sdir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val hourly = streaming.EventStreams.runOnce(spark, sdir.toString, "smoke_hourly")
    println(s"STREAM_WINDOWS=${hourly.count()}")

    // doc pivot + name resolution over generated triples
    println(s"PIVOT_ROWS=${TripleBuilder.docPivot(tri).count()}")

    // N-Triples sink/source roundtrip on the generated graph
    val ntDir = Files.createTempDirectory("smoke_nt").toString + "/g"
    sinks.Sinks.writeNTriples(tri.select("subject","predicate","obj","objKind","datatype"), ntDir)
    println(s"NT_ROUNDTRIP=${sinks.Sinks.readNTriples(spark, ntDir).count()} of ${tri.count()}")

    // custom expressions via SQL on a real scan
    functions.GraftFunctions.register(spark)
    Tables(spark, TestSpark.sf0001, "documents").createOrReplaceTempView("docs_sm")
    val sh = spark.sql(
      "SELECT doc_id, simhash64(split(text, ' ')) AS h, n3_escape(text) AS esc FROM docs_sm LIMIT 3").collect()
    println("SIMHASH_SQL=" + sh.map(r => r.getLong(1)).mkString(","))

    // IVF search on real embeddings
    val embS = Tables(spark, TestSpark.sf0001, "embeddings")
    val model = similarity.IvfIndex.fitSample(embS, k = 8, iters = 2)
    val hits = similarity.IvfIndex.topK(embS.filter(col("vec_id") >= 10),
      embS.filter(col("vec_id") < 3), model, k = 3, nprobe = 2)
    println(s"IVF_HITS=${hits.count()}")

    // croissant expansion through the builder
    val cj = """{"@context":{"sc":"https://schema.org/"},"@type":"sc:Dataset","sc:name":"d1","creator":{"@type":"sc:Person","sc:name":"A"}}"""
    import spark.implicits._
    val cro = graft.transform.CroissantBuilder.build(
      Seq(("x/d1", cj)).toDF("datasetId", "croissant_json"))
    println(s"CROISSANT_TRIPLES=${cro.count()}")

    // grouped QA + question clustering over real document text
    val docsQa = Tables(spark, TestSpark.sf0001, "documents").limit(3)
      .select(col("doc_id").cast("string").as("id"), col("text").as("context"))
      .crossJoin(Seq("which words describe speed?", "what is a spark window?").toDF("question"))
    val answers = graft.extract.QaEngine.groupedQa(docsQa, new graft.extract.QaEngine.EchoBackend)
    println(s"QA_ANSWERS=${answers.count()}")
    val groups = graft.extract.QuestionClustering.cluster(
      Seq("what datasets were used for training?", "what training datasets did it use?",
          "what license applies?", "under what license is it released?"),
      new graft.extract.SchemaPropertyExtractor.TokenOverlapScorer, nClusters = 2, maxPerGroup = 5)
    println(s"QCLUSTERS=${groups.map(_.size).mkString(",")}")
    // T3 arXiv builder on a fixture row
    val arx = graft.transform.EntityBuilders.arxivTriples(Seq(
      ("2104.01778v3", "AST", "Audio Spectrogram Transformer.", "2021-04-05",
       "10.1/abc", Seq("cs.SD"))).toDF("arxiv_id","title","summary","published","doi","categories"))
    println(s"ARXIV_TRIPLES=${arx.count()}")

    // scale joins: salted equivalence on real tables
    val factS = Tables(spark, TestSpark.sf0001, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val dimS = Tables(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val nPlain = factS.join(dimS, "k").count()
    val nSalted = operators.ScaleJoins.saltedJoin(factS, dimS, "k", 8).count()
    println(s"SALTED_JOIN=${nSalted} plain=${nPlain} equal=${nSalted == nPlain}")

    // provenance wide<->long roundtrip on the real extract output shape
    val longProps = Seq(("m1", "schema.org:name", "alpha", "p", 1.0, "2024"),
      ("m1", "fair4ml:mlTask", "nlp", "p", 1.0, "2024"))
      .toDF("modelId", "property", "value", "method", "confidence", "time")
    val wide = graft.model.Provenance.longToWide(longProps, "modelId",
      Seq("schema.org:name", "fair4ml:mlTask"))
    val back = graft.model.Provenance.wideToLong(wide, "modelId",
      Seq("schema.org:name", "fair4ml:mlTask"))
    println(s"PROV_ROUNDTRIP=${back.count()} of ${longProps.count()}")

    // streaming load into a store on disk
    val sin = Files.createTempDirectory("sm_stream_in").toString
    val sck = Files.createTempDirectory("sm_stream_ck").toString
    val sst = Files.createTempDirectory("sm_stream_store").toString
    val st2 = new load.TripletStore(spark, sst)
    Seq(("s1", "p1", "v1")).toDF("subject", "predicate", "obj")
      .withColumn("objKind", lit("literal")).withColumn("datatype", lit(""))
      .withColumn("extractionMethod", lit("m")).withColumn("confidence", lit(1.0))
      .withColumn("extractionTime", lit(Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("append").parquet(sin)
    val sq = streaming.StreamingLoad.start(
      streaming.StreamingLoad.readTripleStream(spark, sin), st2, sck)
    sq.processAllAvailable(); sq.stop()
    println(s"STREAM_LOAD_TRIPLES=${st2.currentTriples.count()} v=${st2.currentVersion}")

    // reified metadata emit -> ingest over the real customer-triple metadata
    val meta1 = tri.select(col("subject"), col("predicate"), col("obj"),
      col("extractionMethod"), col("confidence"), col("extractionTime"))
    val reified = graft.transform.MetadataReification.emit(meta1)
    val ingested = graft.transform.MetadataReification.ingest(reified)
    println(s"REIFY_ROUNDTRIP=${ingested.count()} of ${meta1.count()} (reified=${reified.count()})")
    spark.stop()
  }
}
