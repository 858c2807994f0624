package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The §3.3 composition's distinctive seams, pinned at unit level
  * (the oracle row grades the end-to-end values; these grade the RULES
  * that produce them — each maps to a `_map_model_metadata` /
  * `_group_records_by_type` special case of the reference's
  * AI4LifeExtractor). */
class Ai4lifeLifecycleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val out =
    Ai4lifeLifecycle.ai4lifeLifecycle(spark, dir).cache()

  test("group-by-type fan-out: normalized knowns in, unknowns out") {
    // rid%7==5 records carry type ' Model ' — strip+lower admits them as
    // models; rid%7==6 ('notebook') must never reach the graph
    val types = out.filter(col("predicate") === "rdf:type")
      .select("obj").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("fair4ml:MLModel", "schema.org:Dataset",
      "schema.org:SoftwareApplication"))
    // 200 part rows at sf0.001, rid<600: %7==6 drops ~1/7
    val nSubjects = out.select("n_subjects").head.getLong(0)
    val expected = (0L until 200L).count(_ % 7 != 6)
    assert(nSubjects == expected,
      s"fan-out must keep exactly the known-type records: $nSubjects vs $expected")
  }

  test("identifier keeps only the FIRST token of the joined list") {
    val ids = out.filter(col("predicate") === "schema.org:identifier")
      .select("obj").collect().map(_.getString(0))
    assert(ids.nonEmpty)
    assert(ids.forall(_.matches("bio\\.\\d+")),
      s"alias tokens leaked into the identifier: ${ids.find(!_.matches("bio\\.\\d+"))}")
  }

  test("contributor URL synthesis: ORCID wins over a PRESENT github_user") {
    // rid%3==0 authors carry BOTH ids — the orcid URL must win; %3==1
    // carry github only; %3==2 neither (name alone)
    val au = out.filter(col("predicate") === "schema.org:author" &&
        col("obj").startsWith("au_"))
      .select("obj").collect().map(_.getString(0))
    def rid(s: String): Long = s.drop(3).takeWhile(_.isDigit).toLong
    au.foreach { o =>
      rid(o) % 3 match {
        case 0 => assert(o.contains("orcid.org") && !o.contains("github.com"), o)
        case 1 => assert(o.contains("github.com/gh_"), o)
        case _ => assert(!o.contains("("), o)
      }
    }
  }

  test("version LAST-element: the load-2 append lands as a fresh range") {
    val ver = out.filter(col("predicate") === "schema.org:version")
    val bumped = ver.filter(col("obj") === "v9")
    assert(bumped.count() > 0, "the %6==0 version-append arm must exist")
    assert(bumped.filter(col("start_ms") =!=
      LifecycleMerge.T2 * 1000).count() == 0,
      "a changed LAST element is a fresh range opening at load 2")
    // unchanged versions extend: their range keeps the load-1 start
    assert(ver.filter(col("obj") =!= "v9")
      .filter(col("start_ms") =!= LifecycleMerge.T1 * 1000).count() == 0)
  }

  test("vanished maintainer deprecates; audit count sees every changed arm") {
    // %5==0 maintainers vanish, %4==0 dates bump, %6==0 versions change:
    // each contributes deprecated ranges and the maintainer arm leaves
    // no replacement triple behind
    val nDep = out.select("n_deprecated").head.getLong(0)
    assert(nDep > 0)
    val maintRids = out
      .filter(col("predicate") === "schema.org:maintainer")
      .select(regexp_extract(col("obj"), "mt_(\\d+)", 1).cast("long").as("r"))
    assert(maintRids.filter(col("r") % 5 === 0).count() == 0,
      "vanished maintainers must not survive into the current graph")
  }
}
