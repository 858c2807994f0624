package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("morton code round-trips: decode recovers both coordinates") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 17L), (65535L, 65535L),
      (12345L, 54321L)).toDF("a", "b")
    val coded = df.withColumn("z", ZOrder.morton($"a", $"b"))
      .as[(Long, Long, Long)].collect()
    coded.foreach { case (a, b, z) =>
      var (da, db) = (0L, 0L)
      (0 until 16).foreach { i =>
        da |= ((z >> (2 * i)) & 1L) << i
        db |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((da, db) == (a, b), s"z=$z decoded to ($da,$db), expected ($a,$b)")
    }
  }

  test("morton matches the direct JVM interleave on real data (oracle parity)") {
    val rows = Tables(spark, TestSpark.sf0001, "events")
      .select($"user_id", hour($"ts").cast("long").as("h"))
      .withColumn("z", ZOrder.morton($"user_id", $"h"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (u, h, z) =>
      var expect = 0L
      (0 until 16).foreach { i =>
        expect |= ((u >> i) & 1L) << (2 * i)
        expect |= ((h >> i) & 1L) << (2 * i + 1)
      }
      assert(z == expect, s"u=$u h=$h z=$z expect=$expect")
    }
  }

  test("box predicate touches far fewer z-ordered files than linearly-sorted ones") {
    // sf0.001 has too few distinct users to spread 16 range splits;
    // synthesize the 100× shape: 1500 users x 24 hours, uniform
    val ev = spark.range(0, 150000).select(
      $"id".as("event_id"),
      pmod(conv(substring(md5(concat(lit("u"), $"id")), 1, 8), 16, 10).cast("long"),
        lit(1500L)).as("user_id"),
      pmod(conv(substring(md5(concat(lit("h"), $"id")), 1, 8), 16, 10).cast("long"),
        lit(24L)).as("h"))
      .cache()
    val nFiles = 16
    val linDir = Files.createTempDirectory("lin_layout").toString
    val zDir = Files.createTempDirectory("z_layout").toString
    // linear: sorted by user_id only (what a naive layout gives you)
    ev.repartitionByRange(nFiles, $"user_id").sortWithinPartitions($"user_id")
      .write.mode("overwrite").parquet(linDir)
    ZOrder.cluster(ev, $"user_id", $"h", numFiles = nFiles)
      .write.mode("overwrite").parquet(zDir)

    // a file can be pruned iff its [min,max] envelope misses the box on
    // EITHER dimension — exactly the footer-stats test an engine runs
    def filesTouched(dir: String, uLo: Long, uHi: Long, hLo: Long, hHi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"user_id").as("ulo"), max($"user_id").as("uhi"),
          min($"h").as("hlo"), max($"h").as("hhi"))
      val total = stats.count()
      val touched = stats.filter(
        $"uhi" >= uLo && $"ulo" <= uHi && $"hhi" >= hLo && $"hlo" <= hHi).count()
      (touched, total)
    }
    // leading-dim predicate: linear wins outright (it IS the sort key);
    // z-order must still prune to a minority of files
    val (linU, linTotal) = filesTouched(linDir, 100, 199, 0, 23)
    val (zU, zTotal) = filesTouched(zDir, 100, 199, 0, 23)
    // secondary-dim predicate: linear CANNOT prune (hour stats span the
    // whole day in every user-sorted file); z-order bounds both dims
    val (linH, _) = filesTouched(linDir, 0, 1499, 0, 5)
    val (zH, _) = filesTouched(zDir, 0, 1499, 0, 5)
    ev.unpersist()
    assert(linTotal >= nFiles - 2 && zTotal >= nFiles - 2)
    assert(linH == linTotal, "user-sorted files should all intersect an hour range")
    assert(zH.toDouble / zTotal <= 0.5,
      s"zorder should prune the hour-only query: touched $zH of $zTotal")
    assert(zU.toDouble / zTotal <= 0.5,
      s"zorder should still prune the user-only query: touched $zU of $zTotal")
    info(s"hour-range query: z-order $zH/$zTotal files vs linear $linH/$linTotal; " +
      s"user-range query: z-order $zU/$zTotal vs linear $linU/$linTotal")
  }
}
