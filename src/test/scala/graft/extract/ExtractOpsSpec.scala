package graft.extract

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.extract.SchemaPropertyExtractor.TokenOverlapScorer
import graft.transform.EntityBuilders

class ExtractOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("T3 arXiv triples: version strip, DOI sameAs, category fan-out") {
    val articles = Seq(
      ("1234.5678v2", "Attention Is All You Need", "Abstract text.",
        "2017-06-12", "10.48550/arXiv.1234", Seq("cs.CL", "cs.LG")))
      .toDF("arxiv_id", "title", "summary", "published", "doi", "categories")
    val tri = EntityBuilders.arxivTriples(articles)
    val objs = tri.select("obj").as[String].collect().toSet
    assert(objs.contains("https://arxiv.org/abs/1234.5678"))
    assert(objs.contains("https://doi.org/10.48550/arXiv.1234"))
    assert(objs.contains("cs.CL") && objs.contains("cs.LG"))
    assert(tri.filter($"predicate" === "https://schema.org/datePublished")
      .select("datatype").as[String].head().endsWith("#date"))
  }

  test("T4/T5 keyword + license triples") {
    val kw = EntityBuilders.keywordTriples(
      Seq(("NLP", "natural language processing")).toDF("tag_name", "description"))
    assert(kw.filter($"predicate" === "https://schema.org/name")
      .select("obj").as[String].head() == "nlp")

    val lic = EntityBuilders.licenseTriples(
      Seq(("MIT License", "MIT", "https://opensource.org/license/mit", "text..."),
        ("Custom", "", null, "t"))
        .toDF("name", "identifier", "url", "license_text"))
    val idents = lic.filter($"predicate" === "https://schema.org/identifier")
      .select("obj").as[String].collect().toSet
    assert(idents == Set("MIT", "Custom")) // fallback to name when no id
    assert(lic.filter($"predicate" === "https://schema.org/url").count() == 1)
  }

  test("A1 related-entity collection from the long property table") {
    val props = Seq(
      ("m1", "fair4ml:trainedOn", "squad"),
      ("m1", "fair4ml:fineTunedFrom", "org/base"),
      ("m2", "fair4ml:trainedOn", "squad"),
      ("m2", "schema.org:name", "ignored"))
      .toDF("modelId", "property", "value")
    val rel = EntityBuilders.relatedEntities(props, Map(
      "fair4ml:trainedOn" -> "dataset",
      "fair4ml:fineTunedFrom" -> "model"))
      .as[(String, String)].collect().toSet
    assert(rel == Set(("dataset", "squad"), ("model", "org/base")))
  }

  test("E5/E6/E7 grouped QA with deterministic backend") {
    val pairs = Seq(
      ("m1", "The model was trained on squad. It supports english only.",
        "what data was it trained on?"),
      ("m1", "The model was trained on squad. It supports english only.",
        "which languages are supported?"),
      ("m1", "The model was trained on squad. It supports english only.",
        "what is the capital of France?"))
      .toDF("id", "context", "question")
    val answers = QaEngine.groupedQa(pairs, new QaEngine.EchoBackend, maxPerGroup = 2)
      .collect().map(a => a.question -> a.answer).toMap
    assert(answers("what data was it trained on?").contains("trained on squad"))
    assert(answers("which languages are supported?").contains("english"))
    assert(answers("what is the capital of France?") == "Information not found")
  }

  test("E4 question clustering groups similar questions deterministically") {
    val qs = Seq(
      "what datasets was the model trained on?",
      "which training datasets were used?",
      "what license applies to the model?",
      "under which license is it released?",
      "how many parameters does the model have?")
    val backend = new TokenOverlapScorer
    val groups = QuestionClustering.cluster(qs, backend, nClusters = 3, maxPerGroup = 5)
    assert(groups.flatten.toSet == qs.toSet)
    val training = groups.find(_.exists(_.contains("trained on"))).get
    assert(training.exists(_.contains("training datasets")))
    val license = groups.find(_.exists(_.contains("license applies"))).get
    assert(license.exists(_.contains("released")))
    // stable across invocations
    assert(groups == QuestionClustering.cluster(qs, backend, 3, 5))
  }

  test("S7/S9 schema-driven mapping: paths, format strings, concat") {
    import SchemaMapping._
    val df = spark.read.json(Seq(
      """{"run": {"id": 42, "flow_name": "weka.J48"}, "task": {"name": "t1"}, "uploader": "ada"}""").toDS())
    val out = SchemaMapping(df, Seq(
      "identifier" -> Format("Run_{run.id}"),
      "name" -> Path("run.flow_name"),
      "contributors" -> Concat(Seq("uploader", "task.name"))))
    val row = out.collect()(0)
    assert(row.getAs[String]("identifier") == "Run_42")
    assert(row.getAs[String]("name") == "weka.J48")
    assert(row.getSeq[String](out.columns.indexOf("contributors")) == Seq("ada", "t1"))
  }
}
