package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ObjKind
import graft.transform.CroissantBuilder

class JsonLdSpec extends AnyFunSuite {

  val croissant: String =
    """{
      |  "@context": {
      |    "sc": "https://schema.org/",
      |    "cr": "http://mlcommons.org/croissant/",
      |    "name": "https://schema.org/name",
      |    "url": "https://schema.org/url"
      |  },
      |  "@type": "sc:Dataset",
      |  "name": "quovadis",
      |  "url": "https://huggingface.co/datasets/x/quovadis",
      |  "creator": {
      |    "@type": "sc:Person",
      |    "name": "Jane Doe"
      |  },
      |  "distribution": [
      |    {"@type": "cr:FileObject", "name": "data.parquet",
      |     "sc:contentSize": 123},
      |    {"@type": "cr:FileSet", "name": "shards"}
      |  ],
      |  "keywords": ["malware", "benchmark"],
      |  "sc:isLiveDataset": true
      |}""".stripMargin

  test("expansion resolves terms, CURIEs, arrays, scalars, nesting") {
    val t = JsonLd.expand(croissant)
    assert(t.exists(x => x.predicate == JsonLd.RdfType &&
      x.obj == "https://schema.org/Dataset"))
    assert(t.exists(x => x.predicate == "https://schema.org/name" &&
      x.obj == "quovadis"))
    // arrays fan out
    assert(t.count(_.obj == "malware") == 1)
    assert(t.count(_.obj == "benchmark") == 1)
    // CURIE predicate + boolean typing
    assert(t.exists(x => x.predicate == "https://schema.org/isLiveDataset" &&
      x.obj == "true" && x.datatype.endsWith("boolean")))
    // nested creator node is a blank child with its own triples
    val creatorRef = t.find(_.predicate == "creator").get
    assert(creatorRef.objKind == ObjKind.Iri && creatorRef.obj.startsWith("_:"))
    assert(t.exists(x => x.subject == creatorRef.obj && x.obj == "Jane Doe"))
  }

  test("croissant surgery: files deleted, typed bnodes re-identified") {
    val out = JsonLd.croissantSurgery(JsonLd.expand(croissant), "x/quovadis",
      CroissantBuilder.Base)
    // no blank nodes survive
    assert(!out.exists(t => t.subject.startsWith("_:") ||
      (t.objKind == ObjKind.Iri && t.obj.startsWith("_:"))))
    // file nodes gone (including the triples pointing at them)
    assert(!out.exists(t => t.obj == "data.parquet" || t.obj == "shards"))
    assert(!out.exists(_.predicate == "distribution"))
    // dataset node got the platform identity
    val dsSubjects = out.filter(_.predicate == "https://schema.org/name")
      .filter(_.obj == "quovadis").map(_.subject)
    assert(dsSubjects.nonEmpty && dsSubjects.forall(_.startsWith(CroissantBuilder.Base)))
    // person kept, re-identified from the name
    assert(out.exists(t => t.obj == "Jane Doe" &&
      t.subject.startsWith(CroissantBuilder.Base)))
  }

  test("builder runs distributed and drops malformed json") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      ("x/quovadis", croissant),
      ("x/broken", "{not json")).toDF("datasetId", "croissant_json")
    val out = CroissantBuilder.build(df)
    assert(out.count() > 0)
    assert(out.filter($"obj" === "quovadis").count() == 1)
  }

  test("expander is total over random nested JSON (fuzz)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(s => "\"" + s + "\""),
      Gen.choose(-1000, 1000).map(_.toString),
      Gen.oneOf("true", "false", "null"))
    val keyGen: Gen[String] = Gen.oneOf(
      Gen.identifier.map(_.take(8)), Gen.const("@id"), Gen.const("@type"),
      Gen.const("name"), Gen.const("sc:thing"))
    def objGen(depth: Int): Gen[String] =
      if (depth <= 0) scalarGen
      else Gen.frequency(
        3 -> scalarGen,
        2 -> (for {
          n <- Gen.choose(0, 4)
          ks <- Gen.listOfN(n, keyGen)
          vs <- Gen.listOfN(n, objGen(depth - 1))
        } yield ks.zip(vs).map { case (k, v) => "\"" + k + "\": " + v }
          .mkString("{", ", ", "}")),
        1 -> (for {
          n <- Gen.choose(0, 3)
          vs <- Gen.listOfN(n, objGen(depth - 1))
        } yield vs.mkString("[", ", ", "]")))
    val docGen = objGen(4)
    val prop = Prop.forAll(docGen) { doc =>
      // total: never throws, and surgery leaves no blank nodes behind
      val triples = try JsonLd.expand(doc) catch { case _: Exception => Seq.empty }
      val out = JsonLd.croissantSurgery(triples, "fuzz/ds", CroissantBuilder.Base)
      !out.exists(t => t.subject.startsWith("_:") ||
        (t.objKind == ObjKind.Iri && t.obj.startsWith("_:")))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
