package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class OpqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private lazy val perm = Opq.fitPermutation(emb)

  test("fit yields a true permutation of the dimensions, deterministically") {
    assert(perm.perm.sorted.sameElements(0 until 64))
    assert(perm.inv.sorted.sameElements(0 until 64))
    perm.perm.indices.foreach(j => assert(perm.inv(perm.perm(j)) == j))
    assert(Opq.fitPermutation(emb).perm.sameElements(perm.perm))
  }

  test("inversePermute ∘ permute is the identity gather") {
    val v = emb.filter($"vec_id" === 3)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
    val roundtrip = emb.filter($"vec_id" === 3)
      .select(Opq.inversePermute(perm)(
        Opq.permute(perm)(col("embedding").cast("array<double>"))))
      .as[Seq[Double]].head()
    assert(roundtrip == v)
  }

  test("snake deal follows the variance ranking: bands are variance-sorted") {
    // Invert the snake: ranked position p was dealt to subspace
    // snake(p) on round p/m, landing at groups(snake(p))(p/m). Recompute
    // the per-dim sample variance independently and assert the recovered
    // ranked order is variance-descending — i.e. the permutation really
    // is the (variance DESC, dim) ranking dealt in snake order, not some
    // other permutation that would also pass a structural shape check.
    val groups = perm.perm.grouped(8).toArray // subspace s -> dims in deal order
    assert(groups.length == 8 && groups.forall(_.length == 8))
    val ranked = (0 until 64).map { p =>
      val round = p / 8
      val s = if (round % 2 == 0) p % 8 else 7 - (p % 8)
      groups(s)(round)
    }
    val sample = emb.select(col("embedding").cast("array<double>"))
      .orderBy("vec_id").as[Seq[Double]].collect()
    val n = sample.length
    val variances = Array.tabulate(64) { d =>
      val mu = sample.map(_(d)).sum / n
      sample.map(v => math.pow(v(d) - mu, 2)).sum / n
    }
    ranked.sliding(2).foreach { case Seq(a, b) =>
      assert(variances(a) >= variances(b) - 1e-12,
        s"rank order violated: dim $a (${variances(a)}) before dim $b (${variances(b)})")
    }
  }

  test("on energy-concentrated vectors OPQ reconstructs tighter than plain PQ") {
    // Synthetic corpus where all the variance sits in the FIRST contiguous
    // subspace (dims 0-7): plain PQ gives that whole load to one k=16
    // codebook; the OPQ permutation spreads the 8 hot dims across all 8
    // subspaces, each getting its own codebook — reconstruction must
    // improve. Deterministic data (hash-derived), so the assertion is
    // stable across runs and testdata regenerations.
    val rows = (0 until 256).map { i =>
      val v = Array.tabulate(64) { d =>
        if (d < 8) ((i * 31 + d * 17) % 101).toDouble / 10.0 // hot dims
        else ((i + d) % 3).toDouble / 1000.0 // near-constant tail
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val p = Opq.fitPermutation(df)
    val permuted = df.select(col("vec_id"),
      Opq.permute(p)(col("embedding").cast("array<double>")).as("embedding"))
    val mPlain = Pq.fit(df)
    val mOpq = Pq.fit(permuted)
    def meanErr(d: org.apache.spark.sql.DataFrame,
                rec: org.apache.spark.sql.Column): Double =
      d.withColumn("dv", rec)
        .select(avg(aggregate(
          zip_with(col("embedding").cast("array<double>"), col("dv"),
            (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => acc + x) / lit(64.0)))
        .as[Double].head()
    val errPlain = meanErr(df,
      Pq.decode(mPlain)(Pq.encode(mPlain)(col("embedding").cast("array<double>"))))
    val errOpq = meanErr(df,
      Opq.inversePermute(p)(Pq.decode(mOpq)(Pq.encode(mOpq)(
        Opq.permute(p)(col("embedding").cast("array<double>"))))))
    assert(errOpq < errPlain * 0.8,
      s"OPQ $errOpq not clearly better than plain PQ $errPlain")
    // and the permutation indeed spread the hot dims: no subspace holds
    // more than 2 of dims 0-7 (snake deal puts exactly one per subspace
    // when the 8 hot dims occupy the top variance band)
    val hotPerSub = p.perm.grouped(8).map(_.count(_ < 8)).toSeq
    assert(hotPerSub.max <= 2, s"hot dims clustered: $hotPerSub")
  }
}
