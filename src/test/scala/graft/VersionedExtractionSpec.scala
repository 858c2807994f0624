package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Extraction, Versioned}

/** Semantic laws for the round-5 oracle-graded queries: the two-batch
  * versioned-load replay (V4/V5/V6 lifecycle arms), E8 context matching,
  * and T2 croissant expansion. The DuckDB hash-compare is the driver's
  * gate; these pin the *shape* each arm must produce so a regression is
  * attributable without replaying the oracle.
  */
class VersionedExtractionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val sf = TestSpark.sf0001

  // --- q_version_history -------------------------------------------------

  private lazy val vh = Versioned.versionHistory(spark, sf).cache()

  test("version history: untouched subjects keep their batch-1 point range") {
    // doc ids < 100 are never in batch 2: both rows stay open at [t1, t1]
    val untouched = vh.filter(
      col("subject").isin((0 until 100).map(i => s"doc:$i"): _*))
    assert(untouched.count() == 200)
    assert(untouched.filter(col("deprecated")).count() == 0)
    assert(untouched.filter(col("start_ms") =!= col("end_ms")).count() == 0)
  }

  test("version history: deprecated rows are exactly the changed hasLang triples") {
    val dep = vh.filter(col("deprecated")).collect()
    // changed = doc_id % 3 == 0 within the batch overlap [100, 300)
    val expected = (100 until 300).filter(_ % 3 == 0).map(i => s"doc:$i").toSet
    assert(dep.map(_.getAs[String]("subject")).toSet == expected)
    assert(dep.forall(_.getAs[String]("predicate") == "hasLang"))
    // all stamped with the batch-2 merge "now"
    assert(dep.map(_.getAs[Long]("end_ms")).toSet == Set(1709251200000L))
  }

  test("version history: extended rows span batch 1 to batch 2; fresh rows are points") {
    val t2ms = 1706745600000L
    val extended = vh.filter(!col("deprecated") &&
      col("start_ms") < lit(t2ms) && col("end_ms") >= lit(t2ms))
    // overlap [100,300): all 200 hasSource extend; hasLang extends unless changed
    val expExtended = 200 + (100 until 300).count(_ % 3 != 0)
    assert(extended.count() == expExtended)
    // every non-deprecated, non-extended row is a point range [et, et]
    val rest = vh.filter(!col("deprecated") && (col("start_ms") >= lit(t2ms) ||
      col("end_ms") < lit(t2ms)))
    assert(rest.filter(col("start_ms") =!= col("end_ms")).count() == 0)
  }

  // --- q_version_delta / q_version_asof ----------------------------------

  private lazy val vd = Versioned.versionDelta(spark, sf).cache()
  private lazy val va = Versioned.versionAsOf(spark, sf).cache()

  test("version delta: retired rows are changed hasLang triples with an added replacement") {
    val retired = vd.filter(col("change") === "retired")
    assert(retired.count() > 0)
    assert(retired.filter(col("predicate") =!= "hasLang").count() == 0)
    assert(retired.collect().forall { r =>
      val id = r.getAs[String]("subject").stripPrefix("doc:").toInt
      id >= 100 && id < 300 && id % 3 == 0
    })
    // every retired value has its uppercase replacement in the added set
    assert(retired.select("subject")
      .join(vd.filter(col("change") === "added" && col("predicate") === "hasLang"),
        Seq("subject"), "left_anti").count() == 0)
    // fresh docs [300, 400) contribute both of their triples as added
    val freshDocs = Tables(spark, sf, "documents")
      .filter(col("doc_id") >= 300 && col("doc_id") < 400).count()
    assert(vd.filter(col("change") === "added" &&
      col("subject").isin((300 until 400).map(i => s"doc:$i"): _*)).count()
      == 2 * freshDocs)
  }

  test("as-of: january sees every batch-1 range; april = january - retired + added") {
    val b1Docs = Tables(spark, sf, "documents").filter(col("doc_id") < 300).count()
    val jan = va.filter(col("as_of") === "jan").select("subject", "predicate", "obj")
    val apr = va.filter(col("as_of") === "apr").select("subject", "predicate", "obj")
    assert(jan.count() == 2 * b1Docs)
    val retired = vd.filter(col("change") === "retired")
      .select("subject", "predicate", "obj")
    val added = vd.filter(col("change") === "added")
      .select("subject", "predicate", "obj")
    val expectedApr = jan.exceptAll(retired).unionByName(added)
    assert(expectedApr.exceptAll(apr).count() == 0)
    assert(apr.exceptAll(expectedApr).count() == 0)
  }

  // --- q_platform_extract ------------------------------------------------

  test("platform extract: status dim joins broadcast and misses drop their row") {
    val pe = Extraction.platformExtract(spark, sf).cache()
    // the J3 dim lookup must be a broadcast join, never a shuffle join
    assert(pe.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val status = pe.filter(col("property") === "status")
    // ids in [200, 250) have runs but no dim row: left-join null → dropped
    assert(status.filter(col("model_id").cast("long") >= 200).count() == 0)
    // scraped status wins over api status exactly on ids % 4 == 0
    assert(status.filter(col("model_id").cast("long") % 4 === 0 &&
      !col("value").startsWith("scr_")).count() == 0)
    assert(status.filter(col("model_id").cast("long") % 4 =!= 0 &&
      !col("value").startsWith("api_")).count() == 0)
    // each leg carries its platform's provenance method
    assert(pe.filter(col("model_id").startsWith("ai4life_") &&
      col("method") =!= "Parsed_from_AI4Life_API").count() == 0)
    assert(pe.filter(!col("model_id").startsWith("ai4life_") &&
      col("method") =!= "openml_python_package").count() == 0)
    pe.unpersist()
  }

  // --- q_context_match ---------------------------------------------------

  private lazy val cm = Extraction.contextMatch(spark, sf).cache()

  test("context match: one winner per (doc, property), score in (0, 1]") {
    val docs = Tables(spark, sf, "documents").count()
    assert(cm.count() == 3 * docs)
    assert(cm.groupBy("model_id", "property").count()
      .filter(col("count") =!= 1).count() == 0)
    assert(cm.filter(col("confidence") <= 0 || col("confidence") > 1).count() == 0)
  }

  test("context match: each property deterministically selects its section") {
    val wins = cm.groupBy("property").agg(
      collect_set(col("section_title")).as("sections")).collect()
      .map(r => r.getAs[String]("property") ->
        r.getAs[Seq[String]]("sections").toSet).toMap
    assert(wins("fair4ml:languageCode") == Set("Language"))
    assert(wins("schema.org:origin") == Set("Origin"))
    assert(wins("body") == Set("Body"))
  }

  // --- q_croissant_triples -----------------------------------------------

  private lazy val cr = Extraction.croissantTriples(spark, sf).cache()

  test("croissant: surgery leaves no blank nodes and no file-node triples") {
    assert(cr.filter(col("subject").startsWith("_:") ||
      col("obj").startsWith("_:")).count() == 0)
    assert(cr.filter(col("obj").contains("files.example.org") ||
      col("predicate").contains("contentUrl") ||
      col("obj").contains("FileObject")).count() == 0)
  }

  test("croissant: every dataset node carries its full 8-triple shape") {
    val docs = Tables(spark, sf, "documents").count()
    val perSubject = cr.filter(col("predicate") === "https://schema.org/creator")
      .select("subject").distinct().count()
    assert(perSubject == docs) // one re-identified Dataset URI per doc
    val dsTripleCounts = cr
      .join(cr.filter(col("predicate") === "https://schema.org/creator")
        .select(col("subject")).distinct(), Seq("subject"), "left_semi")
      .groupBy("subject").count().select("count").distinct().collect()
    assert(dsTripleCounts.map(_.getLong(0)).toSet == Set(8L))
    // persons dedup across docs: 20 author ids, 2 triples each
    val persons = cr.filter(col("obj") === "https://schema.org/Person")
    assert(persons.count() == 20)
  }
}
