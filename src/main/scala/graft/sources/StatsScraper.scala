package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.sources.LiveSource.{HttpClient, RetryPolicy}

/** S8: OpenML web-stats scrape
  * (`OpenMLExtractor.py:21-114` browser pool, `:175-320` scrape).
  *
  * The reference drives a pooled headless browser per stats page and
  * reads four indicators (status / downloads / likes / issues), each
  * through an ordered list of CSS-selector fallbacks — the first element
  * with non-empty text wins (`:240-285`) — then K/M/B-parses the counts
  * with a regex SEARCH (`:287-305`, so "1.5K downloads" parses). Fetches
  * retry with exponential backoff (`:175-206`), and persistent transport
  * failure flips a kill switch that turns every remaining page into the
  * default row `("N/A", 0, 0, 0)` instead of hammering a dead site.
  *
  * Spark restatement: the browser pool becomes one injectable
  * [[LiveSource.HttpClient]] per partition (the page HTML is just data —
  * the JS-disabled reference browser reads server-rendered markup, so a
  * GET sees the same bytes), ids distribute via `mapPartitions`, and the
  * selector fallbacks run as a pure string-scanning matcher on executors
  * (the selector subset the reference uses: `tag[attr="v"]`, `.class`,
  * `#id`, `[attr="v"]`, and compounds). The kill switch is per partition:
  * after `disableAfter` consecutive terminal fetch failures the rest of
  * the partition short-circuits to default rows without a call — the
  * reference's global disable, localized so one bad executor cannot
  * silence healthy ones. A failed page is a default row, never a dead
  * job. K/M/B semantics match [[graft.text.TextUtil.parseKmb]] but with
  * the reference's search-anywhere + truncate-to-int behavior.
  */
object StatsScraper {

  /** One compound selector: every present part must match. `attr` value
    * `None` means presence-only (`[disabled]`). */
  final case class Selector(tag: Option[String], clazz: Option[String],
                            id: Option[String],
                            attr: Option[(String, Option[String])])

  /** Parse the supported selector subset. Descendant/sibling combinators
    * are out of scope (the reference never uses them) and are rejected
    * loudly rather than mis-matched. */
  def parseSelector(s: String): Selector = {
    val str = s.trim
    require(str.nonEmpty && !str.exists(_.isWhitespace),
      s"unsupported selector (single compound only): '$s'")
    var i = 0
    var tag: Option[String] = None
    if (str(i).isLetter) {
      val ts = i
      while (i < str.length && (str(i).isLetterOrDigit || str(i) == '-')) i += 1
      tag = Some(str.substring(ts, i).toLowerCase)
    }
    var clazz: Option[String] = None
    var id: Option[String] = None
    var attr: Option[(String, Option[String])] = None
    while (i < str.length) {
      str(i) match {
        case '.' | '#' =>
          val kind = str(i)
          val cs = i + 1
          i = cs
          while (i < str.length && !".#[".contains(str(i))) i += 1
          val v = str.substring(cs, i)
          require(v.nonEmpty, s"empty class/id in selector '$s'")
          if (kind == '.') clazz = Some(v) else id = Some(v)
        case '[' =>
          val close = str.indexOf(']', i)
          require(close > i + 1, s"unterminated attribute in selector '$s'")
          val body = str.substring(i + 1, close)
          val eq = body.indexOf('=')
          attr = Some(
            if (eq < 0) (body.toLowerCase, None)
            else {
              val v0 = body.substring(eq + 1)
              val v = if (v0.length >= 2 && "\"'".contains(v0.head) &&
                          v0.last == v0.head) v0.substring(1, v0.length - 1)
                      else v0
              (body.substring(0, eq).toLowerCase, Some(v))
            })
          i = close + 1
        case c =>
          throw new IllegalArgumentException(
            s"unsupported selector syntax '$c' in '$s'")
      }
    }
    Selector(tag, clazz, id, attr)
  }

  // ---------------------------------------------------------------- HTML

  private final case class OpenTag(name: String, attrs: Map[String, String],
                                   end: Int, selfClosing: Boolean)

  /** Elements that never have inner text (HTML void elements). */
  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")

  /** Parse the opening tag starting at `lt` (`html(lt) == '<'`); None for
    * closing tags, comments, doctypes, and malformed markup. */
  private def parseTagAt(html: String, lt: Int): Option[OpenTag] = {
    var i = lt + 1
    if (i >= html.length || !html.charAt(i).isLetter) return None
    val ns = i
    while (i < html.length &&
           (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val name = html.substring(ns, i).toLowerCase
    val attrs = Map.newBuilder[String, String]
    var selfClosing = false
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '>')
        return Some(OpenTag(name, attrs.result(), i + 1, selfClosing))
      else if (c == '/') { selfClosing = true; i += 1 }
      else if (c.isWhitespace) i += 1
      else {
        selfClosing = false // '/' not directly before '>' is not self-close
        val as = i
        while (i < html.length && !"=/>".contains(html.charAt(i)) &&
               !html.charAt(i).isWhitespace) i += 1
        val aname = html.substring(as, i).toLowerCase
        var j = i
        while (j < html.length && html.charAt(j).isWhitespace) j += 1
        if (j < html.length && html.charAt(j) == '=') {
          i = j + 1
          while (i < html.length && html.charAt(i).isWhitespace) i += 1
          if (i < html.length && "\"'".contains(html.charAt(i))) {
            val q = html.charAt(i)
            val vs = i + 1
            val ve = html.indexOf(q, vs)
            if (ve < 0) return None // unterminated quote: malformed
            attrs += aname -> html.substring(vs, ve)
            i = ve + 1
          } else {
            val vs = i
            while (i < html.length && !"/>".contains(html.charAt(i)) &&
                   !html.charAt(i).isWhitespace) i += 1
            attrs += aname -> html.substring(vs, i)
          }
        } else if (aname.nonEmpty) attrs += aname -> ""
        else i += 1 // lone stray char: skip, don't loop forever
      }
    }
    None
  }

  private def matches(t: OpenTag, sel: Selector): Boolean =
    sel.tag.forall(_ == t.name) &&
      sel.id.forall(v => t.attrs.get("id").contains(v)) &&
      sel.clazz.forall(c =>
        t.attrs.get("class").exists(_.split("\\s+").contains(c))) &&
      sel.attr.forall { case (a, v) =>
        t.attrs.contains(a) && v.forall(t.attrs(a) == _) }

  private def decodeEntities(s: String): String = s
    .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
    .replace("&amp;", "&")

  private def stripText(s: String): String =
    decodeEntities(s.replaceAll("(?s)<[^>]*>", " "))
      .replaceAll("\\s+", " ").trim

  /** Inner text of the element opened by `t`: scan to the matching close
    * with a depth counter (same-name nesting), strip nested tags, decode
    * the common entities, collapse whitespace. */
  private def innerText(html: String, t: OpenTag): String = {
    if (t.selfClosing || VoidTags(t.name)) return ""
    var depth = 1
    var p = t.end
    var endIdx = html.length
    var searching = true
    while (searching) {
      val lt = html.indexOf('<', p)
      if (lt < 0) searching = false
      else if (lt + 1 < html.length && html.charAt(lt + 1) == '/') {
        val ns = lt + 2
        var j = ns
        while (j < html.length &&
               (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
        if (html.substring(ns, j).toLowerCase == t.name) {
          depth -= 1
          if (depth == 0) { endIdx = lt; searching = false }
        }
        p = j
      } else parseTagAt(html, lt) match {
        case Some(o) =>
          if (o.name == t.name && !o.selfClosing) depth += 1
          p = o.end
        case None => p = lt + 1
      }
    }
    stripText(html.substring(t.end, endIdx))
  }

  /** Text of the FIRST element matching `selector`, in document order.
    * `<script>`/`<style>` bodies are skipped — their content is code, and
    * naive tag-scanning inside them mis-parses string literals. */
  def firstText(html: String, selector: String): Option[String] = {
    val sel = parseSelector(selector)
    var i = html.indexOf('<')
    while (i >= 0) {
      parseTagAt(html, i) match {
        case Some(t) if matches(t, sel) => return Some(innerText(html, t))
        case Some(t) if t.name == "script" || t.name == "style" =>
          val close = html.indexOf("</" + t.name, t.end)
          i = if (close < 0) -1 else html.indexOf('<', close + 2)
        case Some(t) => i = html.indexOf('<', math.max(i + 1, t.end - 1))
        case None => i = html.indexOf('<', i + 1)
      }
    }
    None
  }

  /** The reference's fallback rule (`:268-279`): first selector whose
    * element has NON-EMPTY text wins; an empty match falls through. */
  def selectFirst(html: String, selectors: Seq[String]): Option[String] =
    selectors.iterator
      .flatMap(s => firstText(html, s)).find(_.nonEmpty)

  /** The reference's selector fallback table, verbatim (`:240-264`). */
  val StatSelectors: Seq[(String, Seq[String])] =
    Seq("status", "downloads", "likes", "issues").map { stat =>
      stat -> Seq(
        s"""span[aria-label="$stat"]""",
        s"""span[title="$stat"]""",
        if (stat == "status") ".status-indicator"
        else s".${stat.dropRight(1)}-count", // downloads -> .download-count
        s"""[data-testid="$stat"]""")
    }

  /** `extract_number` (`:287-305`): regex SEARCH over the uppercased
    * text — "1.5K downloads" → 1500 — truncating like Python's int(). */
  private val NumRe = "([0-9]+(?:\\.[0-9]+)?)\\s*([KMB]?)".r
  def extractNumber(s: String): Long =
    Option(s).flatMap(t => NumRe.findFirstMatchIn(t.toUpperCase)).map { m =>
      val num = m.group(1).toDouble
      m.group(2) match {
        case "K" => (num * 1e3).toLong
        case "M" => (num * 1e6).toLong
        case "B" => (num * 1e9).toLong
        case _   => num.toLong
      }
    }.getOrElse(0L)

  /** One page's stats; `fetched = false` marks the default row emitted
    * for a failed or kill-switched fetch. */
  final case class PageStats(id: String, status: String, downloads: Long,
                             likes: Long, issues: Long, fetched: Boolean)

  def default(id: String): PageStats =
    PageStats(id, "N/A", 0L, 0L, 0L, fetched = false)

  /** Pure extraction over fetched HTML — the testable core. */
  def extractStats(id: String, html: String): PageStats = {
    val byStat = StatSelectors.toMap
    def stat(name: String): String =
      selectFirst(html, byStat(name)).getOrElse("N/A")
    PageStats(id, stat("status"), extractNumber(stat("downloads")),
      extractNumber(stat("likes")), extractNumber(stat("issues")),
      fetched = true)
  }

  /** One partition's scrape loop (package-private so the kill-switch
    * sequencing is deterministically testable): per-id retry via
    * `policy`; `disableAfter` CONSECUTIVE terminal failures flip the
    * kill switch and the rest of the iterator becomes default rows with
    * no further calls; a success resets the failure streak. */
  private[graft] def scrapePartition(it: Iterator[String],
                                     client: HttpClient,
                                     urlFor: String => String,
                                     policy: RetryPolicy,
                                     disableAfter: Int): Iterator[PageStats] = {
    var consecutiveFailures = 0
    it.map { id =>
      if (consecutiveFailures >= disableAfter) default(id)
      else try {
        val page = extractStats(id, policy.retry(() => client.get(urlFor(id))))
        consecutiveFailures = 0
        page
      } catch {
        // a task kill interrupting a backoff sleep aborts the task
        case e: InterruptedException => throw e
        case _: Exception =>
          consecutiveFailures += 1
          default(id)
      }
    }
  }

  /** Distributed scrape: ids over `mapPartitions`, one client per
    * partition, [[scrapePartition]] semantics per task. */
  def scrape(spark: SparkSession, ids: Seq[String],
             clientFactory: () => HttpClient,
             urlFor: String => String,
             policy: RetryPolicy = RetryPolicy(),
             disableAfter: Int = 3,
             partitions: Int = 0): Dataset[PageStats] = {
    import spark.implicits._
    require(disableAfter >= 1, "disableAfter must be >= 1")
    val n = math.max(1, if (partitions > 0) partitions
      else math.min(ids.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(ids).repartition(n)
      .mapPartitions(it =>
        scrapePartition(it, clientFactory(), urlFor, policy, disableAfter))
  }
}
