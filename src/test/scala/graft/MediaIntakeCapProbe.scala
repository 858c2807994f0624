package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.MediaDedupIndex

/** Adversarial hot-bucket probe for the INCREMENTAL media intake — the
  * standing-index twin of [[LshCapProbe]]: the vs-index banded join's
  * output per bucket is batch-pop × INDEX-pop, and the index bucket
  * grows with everything ever accepted, so a boilerplate-heavy corpus
  * makes per-batch intake cost grow with index AGE, not batch size.
  *
  * Standing index: 200k signatures, 10% of them a hot near-miss family
  * (DISTINCT sigs all sharing one 12-bit band value — 20k keepers in one
  * bucket, 20× the production cap). Batch: 2k rows, a quarter of them
  * probing the hot band value.
  *
  * Measures the vs-index CANDIDATE-stage size (banded join output before
  * Hamming verification) and intake wall for
  *
  *  - `uncapped` — the pre-discipline acceptance plan (cap = MaxValue)
  *  - `capped`   — the production [[MediaDedupIndex.acceptancePlan]]
  *
  * and proves the cap is behavior-preserving off the hot bucket: the
  * benign batch rows' acceptance outcome is IDENTICAL either way.
  *
  * Run: sbt "Test/runMain graft.MediaIntakeCapProbe" — numbers → SCALE.md.
  */
object MediaIntakeCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nIdx = 200000L
    val hotIdx = 20000L // distinct sigs sharing band0 = 0x5
    val idx = spark.range(nIdx).select(col("id").as("media_id"),
      when(col("id") < hotIdx,
        // (i+1) << 12 | 5: shared 12-bit band0, distinct high bits
        shiftleft(col("id") + 1, 12).bitwiseOR(lit(5L)))
        .otherwise(abs(xxhash64(col("id"), lit("idx")))
          .bitwiseAND(lit((1L << 48) - 1))).as("sig"))
      .localCheckpoint()

    val nBatch = 2000L
    val hotBatch = 500L // probe the hot band0 value with far-away highs
    val batch = spark.range(nBatch).select((col("id") + 1000000L).as("media_id"),
      when(col("id") < hotBatch,
        shiftleft(abs(xxhash64(col("id"), lit("hb"))), 12)
          .bitwiseAND(lit((1L << 48) - 1)).bitwiseOR(lit(5L)))
        .otherwise(abs(xxhash64(col("id"), lit("batch")))
          .bitwiseAND(lit((1L << 48) - 1))).as("sig"))
      .localCheckpoint()

    def banded(df: org.apache.spark.sql.DataFrame) =
      df.select(col("media_id"), col("sig"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("sig"), b * 12).bitwiseAND(lit(0xfff)).cast("int")): _*))
          .as(Seq("band", "bv")))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // candidate-stage size, uncapped: vs-index banded join output
    val bb = banded(batch)
    val ib = banded(idx)
    val (rawCand, tRaw) = time(bb.as("b").join(
      ib.as("i").join(bb.select("band", "bv").distinct(),
        Seq("band", "bv"), "left_semi").as("i"), Seq("band", "bv")).count())
    // capped: drop buckets whose index pop exceeds the production cap
    val hot = ib.groupBy("band", "bv").agg(count(lit(1)).as("pop"))
      .filter(col("pop") > graft.operators.BandedLsh.BucketCap)
      .select("band", "bv")
    val (capCand, tCap) = time(bb.join(hot, Seq("band", "bv"), "left_anti")
      .as("b").join(ib.join(hot, Seq("band", "bv"), "left_anti")
        .join(bb.select("band", "bv").distinct(), Seq("band", "bv"), "left_semi")
        .as("i"), Seq("band", "bv")).count())

    // full acceptance wall + behavior equivalence off the hot bucket
    val (unc, tUnc) = time(MediaDedupIndex
      .acceptancePlan(batch, idx, Int.MaxValue)
      .select("media_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet)
    val (cap, tAcc) = time(MediaDedupIndex.acceptancePlan(batch, idx)
      .select("media_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet)
    val benign = (1000000L + hotBatch) until (1000000L + nBatch)
    val benignSame = benign.forall(id => unc.contains(id) == cap.contains(id))

    println(f"uncapped vs-index candidates: $rawCand%,d (${tRaw}%.1f s)")
    println(f"capped   vs-index candidates: $capCand%,d (${tCap}%.1f s)")
    println(f"uncapped acceptance: ${unc.size} survivors (${tUnc}%.1f s)")
    println(f"capped   acceptance: ${cap.size} survivors (${tAcc}%.1f s)")
    println(s"benign rows identical: $benignSame")
    assert(benignSame, "cap must be behavior-preserving off the hot bucket")
    // the structural guarantee: capped candidates are bounded by
    // batch-bands × cap NO MATTER how the index's buckets grow; the
    // uncapped plan has already burst through that bound at this size
    val bound = nBatch * 4 * graft.operators.BandedLsh.BucketCap
    assert(capCand <= bound, s"capped candidates $capCand exceed bound $bound")
    assert(rawCand > bound && capCand * 10 < rawCand,
      "the adversarial corpus must demonstrate the uncapped blowup")
    spark.stop()
  }
}
