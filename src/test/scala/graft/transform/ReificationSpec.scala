package graft.transform

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class ReificationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("V7 reified metadata emit/ingest roundtrip") {
    val meta = Seq(
      ("s1", "p1", "o1", "parser", 1.0, Timestamp.valueOf("2024-07-16 09:14:40")),
      ("s1", "p1", "o1", "llm", 0.82345, Timestamp.valueOf("2024-07-16 10:00:00")),
      ("s2", "p2", "o with spaces", "parser", 0.5, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("subject", "predicate", "obj", "extractionMethod", "confidence", "extractionTime")
    val reified = MetadataReification.emit(meta)
    // 6 meta triples per statement, distinct node per (statement, method)
    assert(reified.count() == 18)
    assert(reified.select("subject").distinct().count() == 3)
    val back = MetadataReification.ingest(reified)
    val orig = meta.as[(String, String, String, String, Double, Timestamp)]
      .collect().toSet
    val round = back
      .select("subject", "predicate", "obj", "extractionMethod", "confidence", "extractionTime")
      .as[(String, String, String, String, Double, Timestamp)].collect().toSet
    assert(round == orig)
  }

  test("text-parser UDFs work from SQL") {
    TextFunctions.register(spark)
    Seq(("---\nlicense: mit\n---\n# T\nbody text here", "3.5K"))
      .toDF("card", "cnt").createOrReplaceTempView("cards_t")
    val row = spark.sql(
      """SELECT front_matter_license(card) AS lic,
        |  size(markdown_sections(card)) AS n_sec,
        |  chunk_text(card, 10)[0] AS c0,
        |  parse_kmb(cnt) AS n
        |FROM cards_t""".stripMargin).collect()(0)
    assert(row.getAs[String]("lic") == "mit")
    assert(row.getAs[Int]("n_sec") >= 2)
    assert(row.getAs[String]("c0").length == 10)
    assert(row.getAs[Long]("n") == 3500L)
  }
}
