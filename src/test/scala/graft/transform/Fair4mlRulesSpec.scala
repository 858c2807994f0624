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
}
