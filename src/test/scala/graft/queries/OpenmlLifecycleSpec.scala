package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.load.TripletStore

/** The §3.2 composition's distinctive seam: child entities are keyed by
  * CONTENT (a DatasetObject URI hashes its name/url), so two runs
  * sharing a customer emit the SAME DatasetObject triples — the store
  * must hold them once, and a re-load must EXTEND that one range, not
  * duplicate or deprecate it. */
class OpenmlLifecycleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("shared child entities collapse to one range and extend on re-load") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_oml_spec").toFile
    try {
      // two runs with the same o_custkey exist in the 500-run slice
      val dupCust = graft.Tables(spark, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .groupBy("o_custkey").count().filter(col("count") >= 2)
        .orderBy("o_custkey").head.getLong(0)
      val slice = Graph.openmlRunsFixture(spark, dir)
        .filter(col("o_orderkey") < 500)
      val nested = graft.extract.PlatformPipelines
        .openmlNestedTriples(slice, "o_orderkey")
        .withColumn("extractionMethod", lit("openml_python_package"))
        .withColumn("confidence", lit(1.0))
        .withColumn("extractionTime",
          lit(Timestamp.valueOf("2024-01-01 00:00:00")))
        .localCheckpoint()
      // the duplicated customer's DatasetObject name triple appears once
      // per OWNING RUN in the raw triple stream...
      val dsName = nested.filter(col("predicate")
          === "https://schema.org/name")
        .filter(col("obj") === s"ds-$dupCust")
      assert(dsName.count() >= 1 && dsName.select("subject").distinct()
        .count() == 1, "one content-keyed DatasetObject URI")
      val store = new TripletStore(spark, tmp.getAbsolutePath)
      val s1 = store.merge(nested, Timestamp.valueOf("2024-01-01 00:00:00"))
      // ...but exactly ONE range in the store
      val ranges1 = store.ranges
        .filter(col("predicate") === "https://schema.org/name" &&
          col("obj") === s"ds-$dupCust")
      assert(ranges1.count() == 1,
        "duplicate child-entity triples must collapse to one range")
      // and a re-load extends it — never duplicates, never deprecates
      val s2 = store.merge(nested, Timestamp.valueOf("2024-03-01 00:00:00"))
      assert(s2.nDeprecated == 0 && s2.nNew == 0 && s2.nExtended == s1.nNew, s2)
      assert(store.ranges
        .filter(col("predicate") === "https://schema.org/name" &&
          col("obj") === s"ds-$dupCust").count() == 1)
    } finally graft.load.Scratch.rm(tmp)
  }
}
