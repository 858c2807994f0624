package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.LiveSource.{HttpClient, RateLimited, RetryPolicy}
import graft.sources.StatsScraper._

/** Executor-side stub state lives in an object (same pattern as the
  * other live-source specs): local-mode tasks resolve the module
  * statically, so the counter is shared and asserts are exact. */
object RateStub {
  val n = new AtomicInteger(0)
  def client(): HttpClient = new HttpClient with Serializable {
    override def get(url: String): String =
      if (n.incrementAndGet() < 3) throw RateLimited(None)
      else """<span aria-label="downloads">4</span>"""
  }
}

class StatsScraperSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // a server-rendered stats page shaped like the reference's target:
  // aria-label spans for some stats, fallback markup for others
  private val page =
    """<!DOCTYPE html><html><head><title>d 42</title>
      |<style>.download-count { color: red }</style>
      |<script>var x = "<span aria-label=\"status\">bogus</span>";</script>
      |</head><body>
      |<div class="header"><span aria-label="status">  active </span></div>
      |<span class="badge download-count big">1.5K downloads</span>
      |<span title="likes"><b>2</b>&nbsp;likes</span>
      |<div data-testid="issues">no open issues</div>
      |</body></html>""".stripMargin

  test("selector parsing covers the reference's fallback syntax") {
    assert(parseSelector("""span[aria-label="status"]""") ==
      Selector(Some("span"), None, None, Some(("aria-label", Some("status")))))
    assert(parseSelector(".download-count") ==
      Selector(None, Some("download-count"), None, None))
    assert(parseSelector("""[data-testid="likes"]""") ==
      Selector(None, None, None, Some(("data-testid", Some("likes")))))
    assert(parseSelector("div#main.wide") ==
      Selector(Some("div"), Some("wide"), Some("main"), None))
    assert(parseSelector("[disabled]") ==
      Selector(None, None, None, Some(("disabled", None))))
    intercept[IllegalArgumentException](parseSelector("div span"))
    intercept[IllegalArgumentException](parseSelector("a > b"))
  }

  test("firstText: attribute match, multi-class match, entity decode, nesting") {
    assert(firstText(page, """span[aria-label="status"]""").contains("active"))
    // .download-count matches despite the other classes on the element
    assert(firstText(page, ".download-count").contains("1.5K downloads"))
    // nested <b> is stripped, &nbsp; decoded, whitespace collapsed
    assert(firstText(page, """span[title="likes"]""").contains("2 likes"))
    assert(firstText(page, """[data-testid="issues"]""").contains("no open issues"))
    assert(firstText(page, ".absent").isEmpty)
    // same-name nesting needs the depth counter
    val nested = """<div class="outer">a<div>b</div>c</div>"""
    assert(firstText(nested, ".outer").contains("a b c"))
  }

  test("script/style bodies never match (the reference reads rendered DOM)") {
    // the <script> above contains a decoy status span in a string literal
    val scriptOnly = page.replace(
      """<span aria-label="status">  active </span>""", "")
    assert(firstText(scriptOnly, """span[aria-label="status"]""").isEmpty)
  }

  test("fallbacks: first NON-EMPTY text wins, empty matches fall through") {
    val html =
      """<span aria-label="downloads"></span>
        |<span title="downloads">3M</span>""".stripMargin
    val sels = StatSelectors.toMap.apply("downloads")
    assert(selectFirst(html, sels).contains("3M"))
  }

  test("extractNumber mirrors the reference's search + truncate semantics") {
    assert(extractNumber("1.5K downloads") == 1500L)
    assert(extractNumber("2M") == 2000000L)
    assert(extractNumber("1.2B") == 1200000000L)
    assert(extractNumber("active since 523") == 523L)
    assert(extractNumber("3.9k") == 3900L) // uppercased before the search
    assert(extractNumber("N/A") == 0L)
    assert(extractNumber("no digits") == 0L)
    assert(extractNumber(null) == 0L)
  }

  test("extractStats reads the full fixture page") {
    val s = extractStats("42", page)
    assert(s == PageStats("42", "active", 1500L, 2L, 0L, fetched = true))
    // "no open issues" has no digits -> 0, like the reference's extract_number
  }

  private def stubClient(calls: AtomicInteger): HttpClient = new HttpClient {
    override def get(url: String): String = {
      calls.incrementAndGet()
      val id = url.split("=").last
      if (id.startsWith("bad")) throw new RuntimeException("boom")
      s"""<span aria-label="status">ok</span>
         |<span aria-label="downloads">${id}0</span>""".stripMargin
    }
  }

  test("kill switch: consecutive failures stop the partition's calls") {
    val calls = new AtomicInteger(0)
    val ids = Seq("1", "2", "bad-a", "bad-b", "bad-c", "7", "8")
    val out = scrapePartition(ids.iterator, stubClient(calls),
      id => s"https://example.test/search?type=data&id=$id",
      RetryPolicy(maxRetries = 0, sleep = _ => ()), disableAfter = 3)
      .toVector
    assert(out(0) == PageStats("1", "ok", 10L, 0L, 0L, fetched = true))
    assert(out(1).downloads == 20L)
    // three consecutive failures -> default rows
    assert(out.slice(2, 5) == Vector("bad-a", "bad-b", "bad-c").map(default))
    // kill switch: ids after the third failure are defaulted WITHOUT a call
    assert(out.drop(5) == Vector(default("7"), default("8")))
    assert(calls.get() == 5, s"kill switch must stop fetching, saw ${calls.get()}")
  }

  test("a success resets the failure streak (no premature kill)") {
    val calls = new AtomicInteger(0)
    val ids = Seq("bad-a", "bad-b", "1", "bad-c", "bad-d", "2")
    val out = scrapePartition(ids.iterator, stubClient(calls),
      id => s"u?id=$id", RetryPolicy(maxRetries = 0, sleep = _ => ()),
      disableAfter = 3).toVector
    assert(out.count(_.fetched) == 2 && calls.get() == 6)
  }

  // property: for any attribute order / quoting style / surrounding
  // decoy markup, the matcher finds the target element and returns its
  // exact (whitespace-normalized) text — the selector semantics must not
  // depend on how the page happens to serialize its attributes
  test("matcher is robust to attribute order, quoting, and decoys") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val textGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val extraAttr = for {
      k <- Gen.oneOf("data-x", "role", "lang")
      v <- word
    } yield s"""$k="$v""""
    val gen = for {
      value <- word
      text <- textGen
      cls <- word
      before <- Gen.oneOf(true, false)
      quote <- Gen.oneOf("\"", "'")
      extra <- Gen.listOf(extraAttr).map(_.take(3))
      decoy <- textGen
    } yield {
      val attrs = scala.util.Random.shuffle(
        extra :+ s"aria-label=$quote$value$quote" :+ s"""class="pad $cls"""")
      val target = s"""<span ${attrs.mkString(" ")}>$text</span>"""
      val noise = s"""<div class="$cls"><span title="other">$decoy</span></div>"""
      val html = if (before) s"<body>$noise$target</body>"
                 else s"<body>$target$noise</body>"
      (html, value, text)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen) { case (html, value, text) =>
        firstText(html, s"""span[aria-label="$value"]""").contains(text)
      })
    assert(res.passed, res.status.toString)
  }

  test("scrape retries rate limits and runs distributed") {
    RateStub.n.set(0)
    val out = scrape(spark, Seq("9"), () => RateStub.client(),
      id => id, policy = RetryPolicy(maxRetries = 6, sleep = _ => ()),
      partitions = 1).collect()
    assert(out.head.downloads == 4L && out.head.fetched)
    assert(RateStub.n.get() == 3)
  }
}
