package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Hashing, N3, ObjKind, Triple}

class TextSpec extends AnyFunSuite {

  test("front-matter: scalars, lists, quoting") {
    val card =
      """---
        |license: apache-2.0
        |language:
        |  - en
        |  - "zh"
        |pipeline_tag: 'text-generation'
        |---
        |# body
        |""".stripMargin
    val fm = FrontMatter.parse(card)
    assert(fm("license") == Seq("apache-2.0"))
    assert(fm("language") == Seq("en", "zh"))
    assert(fm("pipeline_tag") == Seq("text-generation"))
  }

  test("front-matter absent → empty") {
    assert(FrontMatter.parse("# no front matter\n---\nlate---").isEmpty)
  }

  test("license resolution preference order") {
    assert(FrontMatter.license(Map("license" -> Seq("mit"))) == Some("mit"))
    assert(FrontMatter.license(Map(
      "license" -> Seq("mit"), "license_name" -> Seq("custom"))) == Some("custom"))
    assert(FrontMatter.license(Map(
      "model_license_url" -> Seq("http://x"))) == Some("http://x"))
    assert(FrontMatter.license(Map("other" -> Seq("x"))) == None)
  }

  test("gated-access keys collected") {
    val fm = Map("extra_gated_prompt" -> Seq("agree to terms"),
      "extra_gated_fields" -> Seq("email"), "license" -> Seq("mit"))
    val c = FrontMatter.conditionsOfAccess(fm).get
    assert(c.contains("extra_gated_fields: email"))
    assert(c.contains("extra_gated_prompt: agree to terms"))
  }

  test("K/M/B parsing") {
    assert(TextUtil.parseKmb("3.5K") == Some(3500L))
    assert(TextUtil.parseKmb("2M") == Some(2000000L))
    assert(TextUtil.parseKmb(" 1.2b ") == Some(1200000000L))
    assert(TextUtil.parseKmb("17") == Some(17L))
    assert(TextUtil.parseKmb("n/a") == None)
  }

  test("multi-answer parsing with markers and fallback") {
    val marked = "Question 1: yes\nnoise\nQuestion 3: maybe"
    assert(TextUtil.parseMultiAnswers(marked, 3) == Vector("yes", "", "maybe"))
    val plain = "alpha\n\nbeta"
    assert(TextUtil.parseMultiAnswers(plain, 3) == Vector("alpha", "beta", ""))
  }

  test("property humanization") {
    assert(TextUtil.humanizeProperty("fair4ml:intendedUse") == "Intended Use")
    assert(TextUtil.humanizeProperty("schema.org:datePublished") == "Date Published")
  }

  test("empty-sentinel normalization") {
    assert(TextUtil.normalizeEmpty("Information not found") == None)
    assert(TextUtil.normalizeEmpty("  ") == None)
    assert(TextUtil.normalizeEmpty(" real ") == Some("real"))
  }

  test("N3 formatting and escaping") {
    val t = Triple("http://ex/s", "http://ex/p", "line\n\"q\"", ObjKind.Literal, "")
    assert(N3.formatTriple(t) == "<http://ex/s> <http://ex/p> \"line\\n\\\"q\\\"\" .")
    val iri = Triple("http://ex/s", "http://ex/p", "http://ex/o", ObjKind.Iri, "")
    assert(N3.formatTriple(iri) == "<http://ex/s> <http://ex/p> <http://ex/o> .")
    val typed = Triple("http://ex/s", "http://ex/p", "2024-01-01", ObjKind.Literal,
      "http://www.w3.org/2001/XMLSchema#date")
    assert(N3.formatObject(typed) ==
      "\"2024-01-01\"^^<http://www.w3.org/2001/XMLSchema#date>")
    assert(N3.stripAngles("<http://x>") == "http://x")
  }

  test("hashing is deterministic with fixed field order") {
    val h1 = Hashing.entityHash("hf", "model", "org/name")
    assert(h1 == Hashing.entityHash("hf", "model", "org/name"))
    assert(h1 != Hashing.entityHash("hf", "model", "org/other"))
    assert(h1.length == 64)
    assert(Hashing.infoHash("parser", 0.923456) == Hashing.infoHash("parser", 0.923458))
    assert(Hashing.infoHash("parser", 0.9) != Hashing.infoHash("parser", 0.8))
  }

  test("N3 escape is injective and roundtrips through the N-Triples parser regexes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\n', '\t', '\r', '"', '\\', ' ')))
      .map(_.mkString)
    val prop = Prop.forAll(strGen) { v =>
      val lit = N3.formatLiteral(v, "")
      val body = lit.substring(1, lit.length - 1)
      val un = N3.unescapeLiteral(body)
      un == v && !body.contains('\n') && !body.contains('\r')
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
