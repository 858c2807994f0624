package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.load.TripletStore

/** The composed ETL lifecycle's re-load scenarios — the reference's
  * `hf_transformed_fair4ml_example_small_1..4` matrix
  * (`tests/unit/hf/load/test_GraphHandler.py:263-478`) over the graded
  * chain's extraction batches. q_etl_lifecycle grades the changed +
  * vanished arms (small_2/small_4) end-to-end; this spec pins the two
  * arms a two-version diff can't show: the IDENTICAL re-load (small_1
  * twice → zero deprecations, every range extended in place) and the
  * ADD-new-models re-load (small_3 → new subjects open, existing ones
  * untouched because a merge only touches subjects present in the
  * batch). */
class EtlLifecycleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val tA = Timestamp.valueOf("2024-01-01 00:00:00")
  private val tB = Timestamp.valueOf("2024-03-01 00:00:00")

  test("identical re-load: zero deprecations, ranges extended in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_etl_same").toFile
    try {
      val store = new TripletStore(spark, tmp.getAbsolutePath)
      val b = EtlLifecycle.extractionBatch(spark, dir, 1).localCheckpoint()
      val s1 = store.merge(b, tA)
      val ranges1 = store.ranges.count()
      // same batch again, later extraction times are NOT in play (the
      // batch is byte-identical) — every row must extend, none deprecate
      val s2 = store.merge(b, tB)
      assert(s2.nDeprecated == 0 && s2.nNew == 0, s2)
      assert(s2.nExtended == s1.nNew, s"all ${s1.nNew} rows extend: $s2")
      assert(store.ranges.count() == ranges1, "no new ranges open")
      assert(store.ranges.filter(col("deprecated")).count() == 0)
    } finally graft.load.Scratch.rm(tmp)
  }

  test("add-new-models re-load: fresh subjects open, existing untouched") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_etl_add").toFile
    try {
      val store = new TripletStore(spark, tmp.getAbsolutePath)
      val full = EtlLifecycle.extractionBatch(spark, dir, 1).localCheckpoint()
      val half = full.filter(col("subject") < "model:3").localCheckpoint()
      val s1 = store.merge(half, tA)
      // the second load adds models (the small_3 arm): every pre-existing
      // subject's triples re-arrive unchanged (extend), the new subjects'
      // open fresh, and NOTHING deprecates
      val s2 = store.merge(full, tB)
      assert(s2.nDeprecated == 0, s2)
      assert(s2.nExtended == s1.nNew, s2)
      assert(s2.nNew == full.count() - half.count(), s2)
      val subjects = store.currentTriples.select("subject").distinct().count()
      assert(subjects == full.select("subject").distinct().count())
      assert(store.ranges.filter(col("deprecated")).count() == 0)
    } finally graft.load.Scratch.rm(tmp)
  }

  test("the graded row's deprecation set is exactly the changed + vanished slices") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_etl_dep").toFile
    try {
      val store = new TripletStore(spark, tmp.getAbsolutePath)
      store.merge(EtlLifecycle.extractionBatch(spark, dir, 1), tA)
      store.merge(EtlLifecycle.extractionBatch(spark, dir, 2), tB)
      val dep = store.ranges.filter(col("deprecated"))
        .select("subject", "predicate").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // small_2 arm: license bumped on doc_id%4==0 where the license: key
      // wins precedence (%5 not in {0,2}); small_4 arm: gated prompt
      // vanished on doc_id%6==0
      val docs = graft.Tables(spark, dir, "documents")
        .filter(col("n_chars") >= 150 && col("lang").isNotNull
          && size(split(col("text"), " ")) >= 25
          && (length(col("text")) - length(regexp_replace(col("text"), "batch", ""))) / 5 < 8)
        .select("doc_id").collect().map(_.getLong(0))
      val expected =
        docs.filter(id => id % 4 == 0 && id % 5 != 0 && id % 5 != 2)
          .map(id => (s"model:$id", "schema:license")).toSet ++
        docs.filter(_ % 6 == 0)
          .map(id => (s"model:$id", "schema:conditionsOfAccess")).toSet
      assert(dep == expected,
        s"unexpected deprecations: extra=${(dep -- expected).take(5)} " +
          s"missing=${(expected -- dep).take(5)}")
    } finally graft.load.Scratch.rm(tmp)
  }
}
