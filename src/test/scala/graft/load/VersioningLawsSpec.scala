package graft.load

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Versioning laws (SURVEY §5 / §7.4 risk 4) under seeded-random batch
  * sequences — the invariants that must hold for ANY load order:
  *
  *  L1 idempotence: re-merging the identical batch creates nothing and
  *     deprecates nothing (only extends).
  *  L2 uniqueness: at most one open (non-deprecated) range per
  *     (tripletHash, infoHash).
  *  L3 deprecation monotonicity: a deprecated range never resurrects —
  *     deprecated count never decreases across versions.
  *  L4 currency: currentTriples equals exactly the facts asserted for each
  *     subject in its LAST batch (plus untouched subjects' last state).
  */
class VersioningLawsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batch(rows: Seq[(String, String, String)], t: String): DataFrame =
    rows.toDF("subject", "predicate", "obj")
      .withColumn("objKind", lit("literal"))
      .withColumn("datatype", lit(""))
      .withColumn("extractionMethod", lit("gen"))
      .withColumn("confidence", lit(1.0))
      .withColumn("extractionTime", lit(Timestamp.valueOf(t)))

  test("versioning laws hold over random batch sequences (seeded)") {
    val rnd = new scala.util.Random(42)
    val subjects = Seq("s0", "s1", "s2")
    val predicates = Seq("name", "task", "lang")

    (0 until 2).foreach { trial =>
      val dir = Files.createTempDirectory(s"laws_$trial").toString
      val store = new TripletStore(spark, dir)
      // last asserted fact-set per subject, to check L4
      var lastFacts = Map.empty[String, Set[(String, String)]]
      var lastDeprecated = 0L

      (1 to 4).foreach { step =>
        val time = f"2024-0$step-01 00:00:00"
        val touched = subjects.filter(_ => rnd.nextBoolean()) match {
          case Nil => Seq(subjects(rnd.nextInt(subjects.size)))
          case ts => ts
        }
        val rows = touched.flatMap { s =>
          predicates.filter(_ => rnd.nextDouble() < 0.8).map { p =>
            (s, p, s"v${rnd.nextInt(3)}")
          } match {
            case Nil => Seq((s, "name", "v0"))
            case r => r.distinct
          }
        }
        store.merge(batch(rows, time), Timestamp.valueOf(time))
        touched.foreach { s =>
          lastFacts += s -> rows.filter(_._1 == s).map(r => (r._2, r._3)).toSet
        }

        // the laws must be layout-independent: randomly compact so later
        // steps read (and merge onto) a base + delta mix, not just deltas
        if (rnd.nextDouble() < 0.4) store.compact(keep = 1 + rnd.nextInt(2))

        // L2: unique open range per identity
        val openDup = store.ranges.filter(!col("deprecated"))
          .groupBy("tripletHash", "infoHash").count().filter(col("count") > 1)
        assert(openDup.isEmpty, s"L2 violated at step $step trial $trial")

        // L3: deprecation monotone
        val dep = store.ranges.filter(col("deprecated")).count()
        assert(dep >= lastDeprecated, s"L3 violated at step $step trial $trial")
        lastDeprecated = dep

        // L4: current graph per subject == last asserted facts
        val cur = store.currentTriples
          .select("subject", "predicate", "obj")
          .as[(String, String, String)].collect()
          .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
        lastFacts.foreach { case (s, facts) =>
          assert(cur.getOrElse(s, Set.empty) == facts,
            s"L4 violated for $s at step $step trial $trial: " +
              s"cur=${cur.getOrElse(s, Set.empty)} expected=$facts")
        }
      }

      // L1: idempotent re-merge of the final state
      val finalRows = lastFacts.toSeq.flatMap { case (s, fs) =>
        fs.toSeq.map { case (p, o) => (s, p, o) }
      }
      val s5 = store.merge(batch(finalRows, "2024-06-01 00:00:00"),
        Timestamp.valueOf("2024-06-01 00:00:00"))
      assert(s5.nNew == 0 && s5.nDeprecated == 0,
        s"L1 violated: new=${s5.nNew} dep=${s5.nDeprecated}")
      assert(s5.nExtended == finalRows.size)
    }
  }
}
