package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class MarkdownSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  val card: String =
    """---
      |license: mit
      |---
      |intro text
      |# Model
      |Some description.
      |
      |## Usage
      |```python
      |# not a header
      |print("hi")
      |```
      |After code.
      |## Limits
      || a | b |
      || 1 | 2 |
      || 3 | 4 |
      || 5 | 6 |
      || 7 | 8 |
      || 9 | 10 |
      |- item 1
      |- item 2
      |# Eval
      |Numbers.
      |""".stripMargin

  test("sections split on headers with hierarchy titles") {
    val secs = Markdown.sections(card)
    val titles = secs.map(_.title)
    assert(titles.contains("Model"))
    assert(titles.contains("Model > Usage"))
    assert(titles.contains("Model > Limits"))
    assert(titles.contains("Eval"))
    // preamble (front-matter + intro) lands in the untitled section
    assert(secs.head.title == "")
  }

  test("headers inside code fences are content, not structure") {
    val usage = Markdown.sections(card).find(_.title == "Model > Usage").get
    assert(usage.content.contains("# not a header"))
    assert(!Markdown.sections(card).exists(_.title.endsWith("not a header")))
  }

  test("paragraphs keep code blocks intact and trim tables") {
    val usage = Markdown.sections(card).find(_.title == "Model > Usage").get
    val paras = Markdown.paragraphs(usage.content)
    assert(paras.exists(p => p.startsWith("```") && p.contains("print")))
    val limits = Markdown.sections(card).find(_.title == "Model > Limits").get
    val blocks = Markdown.paragraphs(limits.content, maxBlockLines = 4)
    val table = blocks.find(_.startsWith("|")).get
    assert(table.linesIterator.size == 5) // 4 lines + "..."
    assert(table.endsWith("..."))
  }

  test("chunk slices by length and loses nothing") {
    val text = "abcdefghij" * 123
    val chunks = Markdown.chunk(text, 100)
    assert(chunks.forall(_.length <= 100))
    assert(chunks.mkString == text)
  }

  test("hierarchical dedups identical content keeping shortest title") {
    val dup = "# A\nsame\n# B\nsame\n"
    val hier = Markdown.hierarchical(dup)
    val bodies = hier.map(_.content.trim).filter(_ == "same")
    assert(bodies.size == 1)
  }

  test("stripFrontMatter removes the first --- block only") {
    val out = Markdown.stripFrontMatter(card)
    assert(!out.contains("license: mit"))
    assert(out.contains("# Model"))
  }

  // property: every non-header content line of the document survives into
  // some section's content (no text is lost by sectionizing)
  test("sections cover all content lines") {
    val lineGen = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"text $s"),
      Gen.const("# H1"), Gen.const("## H2"), Gen.const("```"),
      Gen.const("plain line"))
    val docGen = Gen.listOf(lineGen).map(_.mkString("\n"))
    check(Prop.forAll(docGen) { doc =>
      val secs = Markdown.sections(doc)
      val sectionText = secs.map(_.content).mkString("\n")
      val inTitles = secs.map(_.title).mkString("\n")
      doc.linesIterator
        .filter(_.trim.nonEmpty)
        .forall { l =>
          sectionText.contains(l) ||
            (l.matches("^#{1,6}\\s+.*$") && inTitles.contains(l.dropWhile(_ == '#').trim))
        }
    })
  }

  // property: chunking never loses characters
  test("chunking reassembles exactly") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(1, 50)) { (s, n) =>
      Markdown.chunk(s, n).mkString == s
    })
  }
}
