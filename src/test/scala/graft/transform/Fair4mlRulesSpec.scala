package graft.transform

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.transform.Fair4mlRules._

class Fair4mlRulesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Seq(
    RangeRule("identifier", "Text"),
    RangeRule("name", "Text"),
    RangeRule("trainedOn", "Dataset"),
    RangeRule("license", "CreativeWork"),
    RangeRule("datePublished", "Date"))

  test("J2 range lookup is substring containment with first-match-wins") {
    val preds = Seq(
      "schema.org:identifier",       // contains "identifier" -> Text
      "schema.org:name",             // contains "name" -> Text
      "fair4ml:trainedOn",           // -> Dataset
      "https://x/datePublished",     // -> Date
      "fair4ml:unknownThing")        // no match -> null
      .toDF("pred")
    val out = preds.select(col("pred"),
      rangeLookup(col("pred"), rules).as("range"))
      .as[(String, String)].collect().toMap
    assert(out("schema.org:identifier") == "Text")
    assert(out("fair4ml:trainedOn") == "Dataset")
    assert(out("https://x/datePublished") == "Date")
    assert(out("fair4ml:unknownThing") == null)
    // first-match-in-file-order: a predicate containing BOTH "identifier"
    // and "trainedOn" resolves to the earlier rule
    val both = Seq("x:identifier_trainedOn").toDF("pred")
      .select(rangeLookup(col("pred"), rules)).as[String].head()
    assert(both == "Text")
  }

  test("dataset objects split on the 100-char boundary") {
    val short = "squad"
    val long = "x" * 120
    val df = Seq(short, long).toDF("v")
      .select(col("v"), datasetObject(col("v")).as("o"))
    val s = df.filter(length(col("v")) < 100).select("o.*").collect()(0)
    assert(s.getAs[String]("kind") == "name")
    assert(s.getAs[String]("url") == "https://huggingface.co/datasets/squad")
    val l = df.filter(length(col("v")) >= 100).select("o.*").collect()(0)
    assert(l.getAs[String]("kind") == "description")
    assert(l.getAs[String]("name") == "x" * 50 + "...")
    assert(l.getAs[String]("description") == long)
  }

  test("DefinedTerm skip rules: colon tags and short tags dropped") {
    val out = Seq("NLP-Task", "en", "a:b", "ok")
      .toDF("t")
      .select(col("t"), definedTermId(col("t"), "urn:kw/").as("id"))
      .as[(String, String)].collect().toMap
    assert(out("en") == null)      // length <= 2
    assert(out("a:b") == null)     // colon tag
    assert(out("NLP-Task") != null && out("NLP-Task").startsWith("urn:kw/"))
    // lowercased identity: same hash regardless of case
    val same = Seq("NLP-Task", "nlp-task").toDF("t")
      .select(definedTermId(col("t"), "urn:kw/")).as[String].collect()
    assert(same(0) == same(1))
  }

  test("license values split into IRI refs vs literals") {
    val out = Seq("https://opensource.org/mit", "MIT", "http://x", "custom terms")
      .toDF("v").select(col("v"), licenseObject(col("v")).as("o"))
      .select(col("v"), col("o.objKind")).as[(String, String)].collect().toMap
    assert(out("https://opensource.org/mit") == "iri")
    assert(out("http://x") == "iri")
    assert(out("MIT") == "literal")
    assert(out("custom terms") == "literal")
  }

  private lazy val oneRun = {
    import graft.extract.PlatformPipelines
    val runs = Seq(("run-7", "mnist", "https://www.openml.org/d/554",
      "crossvalidation", "https://api.openml.org/splits/7"))
      .toDF("run_id", "ds_name", "ds_url", "ep_type", "ep_url")
      .select(col("run_id"),
        struct(col("ds_name").as("name"), col("ds_url").as("url"),
          struct(col("ep_type").as("type"), col("ep_url").as("data_splits_url"),
            map(lit("folds"), lit("10"), lit("repeats"), lit("1"))
              .as("parameters")).as("estimationProcedure")).as("dataset"),
        map(lit("auc"), lit(0.9912).cast("decimal(18,4)")).as("num_metrics"),
        map(lit("task"), lit("classification")).as("text_metrics"))
    PlatformPipelines.openmlNestedTriples(runs, "run_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
  }

  test("T1 DatasetObject tree: child + estimationProcedure grand-child") {
    val tris = oneRun
    val byPred = tris.groupBy(_._2)
    // parent → DatasetObject link, typed child, linked + typed grand-child
    val doUri = byPred(NestedObjects.Fair4ml + "trainedOn").head._3
    assert(tris.contains((doUri, NestedObjects.RdfType,
      NestedObjects.Fair4ml + "DatasetObject", "iri", "")))
    assert(tris.exists(t => t._1 == doUri &&
      t._2 == NestedObjects.SchemaNs + "name" && t._3 == "mnist" &&
      t._5 == NestedObjects.XsdString))
    val epUri = byPred(NestedObjects.Fair4ml + "estimationProcedure").head._3
    assert(tris.contains((epUri, NestedObjects.RdfType,
      NestedObjects.Fair4ml + "estimationProcedure", "iri", "")))
    assert(tris.exists(t => t._1 == epUri &&
      t._2 == NestedObjects.SchemaNs + "url" &&
      t._3 == "https://api.openml.org/splits/7" &&
      t._5 == NestedObjects.XsdAnyUri))
    // parameters fan out on the grand-child
    assert(tris.contains((epUri, NestedObjects.Fair4ml + "folds", "10",
      "literal", NestedObjects.XsdString)))
    assert(tris.contains((epUri, NestedObjects.Fair4ml + "repeats", "1",
      "literal", NestedObjects.XsdString)))
  }

  test("T1 EvaluationObject tree: metrics typed double vs string") {
    val tris = oneRun
    val evUri = tris.collect {
      case (s, p, o, _, _) if p == NestedObjects.Fair4ml + "evaluationResults" => o
    }.head
    assert(tris.contains((evUri, NestedObjects.RdfType,
      NestedObjects.Fair4ml + "EvaluationObject", "iri", "")))
    assert(tris.contains((evUri, NestedObjects.Fair4ml + "auc", "0.9912",
      "literal", NestedObjects.XsdDouble)))
    assert(tris.contains((evUri, NestedObjects.Fair4ml + "task",
      "classification", "literal", NestedObjects.XsdString)))
    // 14 triples per run: 10 dataset-tree + 4 evaluation-tree
    assert(oneRun.length == 14)
  }
}
