package graft.model

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProvenanceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val long = Seq(
    ("m1", "schema.org:name", "audio_set", "Parsed_from_HF_dataset", 1.0, "2024-07-16_09-14-40"),
    ("m1", "fair4ml:mlTask", "audio classification", "Parsed_from_HF_tags", 1.0, "2024-07-16_09-14-40"),
    ("m1", "fair4ml:mlTask", "sound tagging", "Parsed_from_HF_tags", 1.0, "2024-07-16_09-14-40"),
    ("m1", "fair4ml:mlTask", "audio classification", "context_matching", 0.8, "2024-07-16_10-00-00"),
    ("m2", "schema.org:name", "beta", "Parsed_from_HF_dataset", 1.0, "2024-07-16_09-14-40"))
    .toDF("modelId", "property", "value", "method", "confidence", "time")

  private val props = Seq("schema.org:name", "fair4ml:mlTask", "schema.org:license")

  test("long -> wide builds provenance-wrapped tagged-variant cells") {
    val wide = Provenance.longToWide(long, "modelId", props)
    assert(wide.columns.toSet == Set("modelId") ++ props)
    val m1 = wide.filter($"modelId" === "m1")
    val nameCells = m1.select("`schema.org:name`").collect()(0).getSeq[Any](0)
    assert(nameCells.length == 1)
    // multi-valued tag property: one cell per extraction method
    val taskCells = m1.select("`fair4ml:mlTask`").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(taskCells.length == 2)
    val kinds = taskCells.map(_.getAs[org.apache.spark.sql.Row]("data").getAs[String]("kind")).toSet
    assert(kinds == Set("str", "list")) // context_matching single, tags list
    // absent property -> empty cell list, not null
    assert(m1.select("`schema.org:license`").collect()(0).getSeq[Any](0).isEmpty)
  }

  test("wide -> long roundtrips the full fact set") {
    val wide = Provenance.longToWide(long, "modelId", props)
    val back = Provenance.wideToLong(wide, "modelId", props)
    val orig = long.select("modelId", "property", "value", "method", "confidence", "time")
      .as[(String, String, String, String, Double, String)].collect().toSet
    val round = back.as[(String, String, String, String, Double, String)]
      .collect().toSet
    assert(round == orig)
  }
}
