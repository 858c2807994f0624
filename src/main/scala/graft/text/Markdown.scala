package graft.text

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala markdown sectionizer — the M1-M6 operator family of the
  * reference (`code/transform/mlentory_transform/core/MarkdownParser.py`,
  * reimplemented from its observable behavior, not translated):
  *
  *  - M1 header sectionizer: split on `#{1,6} ` headers, code-fence aware,
  *    hierarchical titles joined with " > " (`MarkdownParser.py:45-176`)
  *  - M2/M4 special blocks: tables / lists trimmed to a max line count
  *    with a "..." marker (`:178-287,451-527`)
  *  - M3 fine-grained splitter: paragraphs per section, keeping special
  *    blocks intact (`:289-449`)
  *  - M5 fixed-size chunker (`:529-541`)
  *  - M6 dedup by content hash keeping the shortest title (`:543-610`)
  *
  * Exposed to Spark as UDFs over `array<struct<...>>` output; everything
  * here is deterministic and driver/executor safe (no state).
  */
object Markdown {

  final case class Section(title: String, content: String, level: Int)

  private val HeaderRe = "^(#{1,6})\\s+(.*)$".r
  private val FenceRe = "^(```|~~~)".r

  /** M1: split into header-delimited sections. Text before the first header
    * becomes a level-0 section with an empty title. Headers inside code
    * fences are content, not structure. Titles carry the open hierarchy:
    * "H1 > H2 > H3". */
  def sections(card: String): Vector[Section] = {
    if (card == null || card.isEmpty) return Vector.empty
    val out = ArrayBuffer.empty[Section]
    val stack = ArrayBuffer.empty[(Int, String)] // (level, raw title)
    var title = ""
    var level = 0
    val content = new StringBuilder
    var inFence = false
    var fenceMark = ""

    def flush(): Unit = {
      val c = content.toString
      if (title.nonEmpty || c.trim.nonEmpty) out += Section(title, c.stripLineEnd, level)
      content.clear()
    }

    card.linesIterator.foreach { line =>
      FenceRe.findFirstIn(line) match {
        case Some(mark) if !inFence => inFence = true; fenceMark = mark.take(3)
        case Some(mark) if inFence && line.trim.startsWith(fenceMark) => inFence = false
        case _ => ()
      }
      line match {
        case HeaderRe(hashes, text) if !inFence &&
            // a closing fence line also matched above; only treat as header
            // when we are genuinely outside a fence
            !FenceRe.findFirstIn(line).isDefined =>
          flush()
          level = hashes.length
          while (stack.nonEmpty && stack.last._1 >= level) stack.remove(stack.length - 1)
          stack += ((level, text.trim))
          title = stack.map(_._2).mkString(" > ")
        case _ =>
          content.append(line).append('\n')
      }
    }
    flush()
    out.toVector
  }

  /** M2/M4: trim a special block (table / list) to at most `maxLines`
    * lines, appending "..." when truncated. */
  def trimBlock(block: String, maxLines: Int): String = {
    val lines = block.linesIterator.toVector
    if (lines.length <= maxLines) block
    else (lines.take(maxLines) :+ "...").mkString("\n")
  }

  private def isTableLine(l: String) = l.trim.startsWith("|")
  private def isListLine(l: String) = {
    val t = l.trim
    t.startsWith("- ") || t.startsWith("* ") || t.startsWith("+ ") ||
      t.headOption.exists(_.isDigit) && t.dropWhile(_.isDigit).startsWith(". ")
  }

  /** M3: split section content into paragraphs, keeping code fences,
    * tables, and lists as whole blocks (tables/lists trimmed to
    * `maxBlockLines`). */
  def paragraphs(content: String, maxBlockLines: Int = 4): Vector[String] = {
    if (content == null || content.trim.isEmpty) return Vector.empty
    val out = ArrayBuffer.empty[String]
    val cur = ArrayBuffer.empty[String]
    var mode = "text" // text | code | table | list
    var fenceMark = ""

    def flush(): Unit = {
      if (cur.nonEmpty) {
        val block = cur.mkString("\n")
        val trimmed =
          if (mode == "table" || mode == "list") trimBlock(block, maxBlockLines)
          else block
        if (trimmed.trim.nonEmpty) out += trimmed
        cur.clear()
      }
    }

    content.linesIterator.foreach { line =>
      mode match {
        case "code" =>
          cur += line
          if (line.trim.startsWith(fenceMark)) { flush(); mode = "text" }
        case _ =>
          FenceRe.findFirstIn(line) match {
            case Some(mark) =>
              flush(); mode = "code"; fenceMark = mark.take(3); cur += line
            case None =>
              val lineMode =
                if (isTableLine(line)) "table"
                else if (isListLine(line)) "list"
                else "text"
              if (line.trim.isEmpty) { flush(); mode = "text" }
              else if (lineMode != mode) { flush(); mode = lineMode; cur += line }
              else cur += line
          }
      }
    }
    flush()
    out.toVector
  }

  /** M5: slice text into fixed-size character chunks. */
  def chunk(text: String, maxLen: Int = 2000): Vector[String] =
    if (text == null || text.isEmpty) Vector.empty
    else text.grouped(maxLen).toVector

  /** M6: hierarchical sectionization = header sections ∪ their paragraphs,
    * deduplicated by content keeping the shortest title. Dedup groups by
    * the content STRING, not a content hash: equal-content sections are
    * exactly what the reference's hash key modeled, the strings are
    * already in memory, and a per-section digest (MessageDigest.getInstance
    * per call) was 95% of this function's measured CPU — 77 → 5 µs/card
    * on the q_context_match card shape (SCALE.md §Sectionizer). */
  def hierarchical(card: String, maxBlockLines: Int = 4): Vector[Section] = {
    val secs = sections(card)
    val fine = secs.flatMap { s =>
      paragraphs(s.content, maxBlockLines).zipWithIndex.map { case (p, i) =>
        Section(s"${s.title} - Par. ${i + 1}", p, s.level)
      }
    }
    (secs ++ fine)
      .groupBy(_.content)
      .values.map(_.minBy(s => (s.title.length, s.title))).toVector
      .sortBy(s => (s.level, s.title))
  }

  /** Strip YAML front-matter (the P1 description rule:
    * `re.sub(r'---.*?---', '', count=1, DOTALL)`). */
  def stripFrontMatter(card: String): String =
    if (card == null) ""
    else "(?s)---.*?---".r.replaceFirstIn(card, "")
}
