package graft.transform

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TagCategorizer
import graft.operators.TagCategorizer.Vocabs
import graft.transform.TripleBuilder.PropertySpec

class TransformSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triple generation drops null objects and types correctly") {
    val df = Seq(("id1", "Alpha", Some("http://a")), ("id2", "Beta", None))
      .toDF("id", "name", "url")
    val tri = TripleBuilder.triples(df, concat(lit("urn:"), col("id")), Seq(
      PropertySpec("rdf:type", lit("schema:Thing"), objKind = "iri"),
      PropertySpec("schema:name", col("name")),
      PropertySpec("schema:url", col("url"), objKind = "iri")))
    val rows = tri.collect()
    assert(rows.length == 5) // 2 types + 2 names + 1 url
    assert(tri.filter(col("predicate") === "schema:url").count() == 1)
  }

  test("disambiguation keeps max (confidence, time) per statement") {
    val meta = Seq(
      ("s", "p", "o", "m1", 0.5, Timestamp.valueOf("2024-01-01 00:00:00")),
      ("s", "p", "o", "m2", 0.9, Timestamp.valueOf("2024-01-01 00:00:00")),
      ("s", "p", "o", "m3", 0.9, Timestamp.valueOf("2024-02-01 00:00:00")),
      ("s", "p", "o2", "m4", 0.1, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("subject", "predicate", "obj", "extractionMethod", "confidence", "extractionTime")
    val win = TripleBuilder.disambiguate(meta)
    assert(win.count() == 2)
    val m = win.filter(col("obj") === "o").select("extractionMethod").as[String].head()
    assert(m == "m3")
  }

  test("graph union has set semantics") {
    val g1 = Seq(("s", "p", "o", "iri", "")).toDF("subject", "predicate", "obj", "objKind", "datatype")
    val g2 = Seq(("s", "p", "o", "iri", ""), ("s", "p", "o2", "iri", ""))
      .toDF("subject", "predicate", "obj", "objKind", "datatype")
    assert(TripleBuilder.unionGraphs(Seq(g1, g2)).count() == 2)
  }

  test("tag categorization buckets by prefix and vocab") {
    val vocabs = Vocabs(
      languages = Seq("en", "zh"),
      libraries = Seq("transformers", "pytorch"),
      tasks = Seq("text generation", "image classification"))
    val df = Seq(
      ("m1", Seq("dataset:squad", "arxiv:1234.5678", "base_model:org/base",
        "en", "transformers", "text-generation", "custom-tag"), "text-generation"),
      ("m2", Seq("zh", "weird:thing"), null.asInstanceOf[String]))
      .toDF("modelId", "tags", "pipeline_tag")
    val out = TagCategorizer.categorize(df, vocabs)
    val m1 = out.filter(col("modelId") === "m1")
    assert(m1.select("trained_on").as[Seq[String]].head() == Seq("squad"))
    assert(m1.select("reference_publication").as[Seq[String]].head() ==
      Seq("https://arxiv.org/abs/1234.5678"))
    assert(m1.select("fine_tuned_from").as[Seq[String]].head() == Seq("org/base"))
    assert(m1.select("in_language").as[Seq[String]].head() == Seq("en"))
    assert(m1.select("ml_task").as[Seq[String]].head() == Seq("text generation"))
    val kw = m1.select("keywords").as[Seq[String]].head()
    assert(kw.contains("custom-tag") && kw.contains("transformers") &&
      kw.contains("text generation"))
    assert(!kw.contains("en"))
    val m2 = out.filter(col("modelId") === "m2")
    assert(m2.select("in_language").as[Seq[String]].head() == Seq("zh"))
    assert(m2.select("ml_task").as[Seq[String]].head().isEmpty)
    // P4 publication filter
    assert(TagCategorizer.hasPublication(out).count() == 1)
  }

  test("doc pivot emits sorted deterministic property lists") {
    val tri = Seq(
      ("s1", "b", "2", "literal", ""), ("s1", "a", "1", "literal", ""),
      ("s2", "a", "x", "literal", ""))
      .toDF("subject", "predicate", "obj", "objKind", "datatype")
    val p = TripleBuilder.docPivot(tri).orderBy("subject").collect()
    assert(p(0).getString(1) == "a=1;b=2")
    assert(p(1).getString(1) == "a=x")
  }

  test("name resolution replaces IRIs with names, keeps unresolved") {
    val tri = Seq(
      ("s1", "schema:name", "Alice", "literal", ""),
      ("s2", "schema:knows", "s1", "iri", ""),
      ("s2", "schema:knows", "s9", "iri", ""))
      .toDF("subject", "predicate", "obj", "objKind", "datatype")
    val out = TripleBuilder.resolveNames(tri, "schema:name")
      .filter(col("predicate") === "schema:knows")
      .select("obj").as[String].collect().toSet
    assert(out == Set("Alice", "s9"))
  }
}
