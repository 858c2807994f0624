package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Temporal

/** Law: the two-level chunk packing (range partition → partition-local
  * cumsum → broadcast prefix offsets) equals the naive global-order window
  * on ANY input — including empty, single-row, duplicate sizes, and sizes
  * spanning many chunks. */
class ChunkPackLawSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-level cumsum == global-order window on random inputs") {
    val rowsGen = for {
      n <- Gen.choose(0, 120)
      sizes <- Gen.listOfN(n, Gen.choose(0L, 30000L))
    } yield sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }

    val prop = Prop.forAll(rowsGen) { rows =>
      val docs = rows.toDF("doc_id", "n_chars")
      val twoLevel = Temporal.chunkPackOf(spark, docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = docs
        .select(col("doc_id"), sum(col("n_chars")).over(w).as("cum"))
        .withColumn("chunk", floor((col("cum") - lit(1)) / 20000))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      twoLevel == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("keyed two-level packing == naive per-source window on random inputs") {
    val rowsGen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("s0", "s1", "s2")
        chars <- Gen.choose(0L, 30000L)
      } yield (src, chars))
    } yield rows.zipWithIndex.map { case ((s, c), i) => (i.toLong, s, c) }

    val prop = Prop.forAll(rowsGen) { rows =>
      val docs = rows.toDF("doc_id", "source", "n_chars")
      val twoLevel = graft.queries.Corpus.packSequencesOf(spark, docs)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = docs
        .select(col("source"), col("doc_id"),
          ceil(col("n_chars") / 4.0).cast("long").as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .withColumn("seq", floor((col("cum") - col("tok")) / 1024))
        .groupBy("source", "seq")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("seq_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      twoLevel == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("KeyedCumsum == naive keyed window incl. NEGATIVE values and null keys") {
    val rowsGen = for {
      n <- Gen.choose(0, 100)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf(Some("s0"), Some("s1"), Some("s2"), None)
        v <- Gen.choose(-500L, 500L) // negatives: running max != final sum
      } yield (src, v))
    } yield rows.zipWithIndex.map { case ((s, v), i) => (i.toLong, s.orNull, v) }

    val prop = Prop.forAll(rowsGen) { rows =>
      val docs = rows.toDF("doc_id", "k", "v")
      val got = graft.operators.KeyedCumsum(
          spark, docs, key = "k", order = Seq("doc_id"),
          value = "v", out = "cum")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(3)))
        .toSet
      val w = Window.partitionBy("k").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = docs
        .withColumn("cum", sum(col("v")).over(w))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(3)))
        .toSet
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("KeyedCumsum maxKeys guard fails loudly on per-document keys") {
    val perDoc = (0 until 50).map(i => (i.toLong, s"doc$i", 1L))
      .toDF("doc_id", "k", "v")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.KeyedCumsum(spark, perDoc, key = "k",
        order = Seq("doc_id"), value = "v", out = "cum", maxKeys = 8)
    }
    // either arm may fire first: the hard collect cap (when few physical
    // partitions make cap < rows) or the exact distinct-key recheck
    assert(ex.getMessage.contains("KeyedCumsum"))
    // a compliant cardinality passes under the same cap, values intact
    val ok = graft.operators.KeyedCumsum(spark,
      (0 until 50).map(i => (i.toLong, s"s${i % 3}", 1L))
        .toDF("doc_id", "k", "v"),
      key = "k", order = Seq("doc_id"), value = "v", out = "cum", maxKeys = 8)
    assert(ok.count() == 50)
  }
}
