package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BandedLsh

/** Adversarial hot-bucket probe for the banded LSH families: a
  * duplicate-heavy corpus — the NORMAL case in web-scale training data
  * (identical licenses, templates, watermarks) — at 20× the graded media
  * doc count: 50% one identical boilerplate signature, 15% a hot
  * near-miss family (DISTINCT signatures all sharing one 12-bit band
  * value, above [[BandedLsh.BucketCap]]), 35% benign random signatures.
  * Media band geometry (48-bit sig, 4 × 12-bit bands).
  *
  * Measures the CANDIDATE-stage size — the wasted work: banded self-join
  * output before Hamming verification — and wall time for
  *
  *  - `uncapped` — the pre-discipline shape: band every raw row, self-join
  *  - `capped`   — [[BandedLsh]]: exact-collapse → bucket cap → keeper join
  *
  * and proves the discipline loses nothing: the boilerplate group
  * survives as ONE keeper carrying all 10k members (every true duplicate
  * pair is still derivable / the groups path still yields one component
  * of 10k), while the hot family's quadratic bucket is dropped.
  *
  * Run: sbt "Test/runMain graft.LshCapProbe" — numbers go to SCALE.md.
  */
object LshCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 20000L
    val boiler = (n * 50 / 100).toInt // 10k identical
    val hotFam = (n * 15 / 100).toInt // 3k distinct, shared band-0 value
    val boilerSig = 0xABCDEF123456L // b0 = 0x456
    val sig = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < boiler, lit(boilerSig))
        .when(col("id") < boiler + hotFam,
          // (i << 12) | 5: b0 = 5 shared by all 3k (hot), b1 distinct
          shiftleft(col("id") - boiler + 1, 12).bitwiseOR(lit(5L)))
        .otherwise(abs(xxhash64(col("id"), lit("benign")))
          .bitwiseAND(lit((1L << 48) - 1))).as("sig"))
      .localCheckpoint()
    val in = sig.select(col("doc_id") +: col("sig") +:
      (0 until 4).map(b => shiftright(col("sig"), b * 12)
        .bitwiseAND(lit(0xfff)).cast("int").as(s"b$b")): _*)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // uncapped pre-discipline candidate stage: band raw rows, self-join
    val banded = in.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(i => col(s"b$i")): _*))
        .as(Seq("band", "bv")))
    val (rawCand, dtRaw) = time {
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .count()
    }
    println(f"[lshcap] uncapped  candidates=$rawCand%12d dt=$dtRaw%6.2fs")

    // capped discipline: collapse → cap → keeper join (candidate stage)
    val ((members, kp), dtCap) = time {
      val (m, k) = BandedLsh.collapsedPairs(in, nBands = 4,
        maxHamming = Some(6))
      (m, k.localCheckpoint())
    }
    val kpCount = kp.count()
    val hb = BandedLsh.hotBuckets(in, 4).count()
    println(f"[lshcap] capped    keeper-pairs=$kpCount%9d hotBuckets=$hb%3d dt=$dtCap%6.2fs")
    require(kpCount < 10000L,
      s"capped candidate stage must stay bounded, got $kpCount")
    require(rawCand > 100L * math.max(kpCount, 1L),
      "uncapped must dwarf capped on a dup-heavy corpus")

    // nothing lost: the boilerplate group is one keeper with all members
    val boilerMembers = members.filter(col("sig") === boilerSig).count()
    require(boilerMembers == boiler.toLong, s"boiler group: $boilerMembers")
    // groups path on the linear edge set: boilerplate = ONE component
    val edges = kp.select(col("g1").as("doc1"), col("g2").as("doc2"))
      .unionByName(BandedLsh.starEdges(members))
    val (comp, dtCc) = time {
      graft.operators.ConnectedComponents(edges).localCheckpoint()
    }
    val big = comp.groupBy("component").count().agg(max("count")).head.getLong(0)
    println(f"[lshcap] groups    largest-component=$big%6d dt=$dtCc%6.2fs")
    require(big >= boiler.toLong, s"boiler component: $big")

    // ── Scenario 2: escalation recall recovery ────────────────────────
    // A templated corpus where every true near-dup pair agrees ONLY on
    // HOT bands: 200 templates × 50 variants sig = (t<<36)|(v<<24)|0x5,
    // so b0=5 (pop 10.1k), b1=0 (pop 10k), each b2=v (pop ~300) and
    // b3=t (pop ~51) all exceed cap=20. 100 planted near-dups flip one
    // b1 bit (hamming 1): the b1 buckets differ, every agreeing band is
    // hot — pure drop-mode forfeits ALL of them. Escalation (media
    // geometry: e0 = the b3 slice, e1 = the b0 slice) re-keys the hot
    // b2 buckets by template and goes cold at pop ≈ 2, recovering every
    // planted pair with the work bound intact.
    val nT = 200; val nV = 50; val planted = 100
    val fam = spark.range(nT.toLong * nV).select(col("id").as("doc_id"),
      (shiftleft((col("id") / nV).cast("long"), 36)
        .bitwiseOR(shiftleft(col("id") % nV, 24)).bitwiseOR(lit(0x5L)))
        .as("sig"))
    val dups = spark.range(planted).select((col("id") + 20000L).as("doc_id"),
      (shiftleft(col("id"), 36).bitwiseOR(lit(7L << 24))
        .bitwiseOR(lit(0x5L)).bitwiseXOR(lit(1L << 13))).as("sig"))
    val esIn = fam.unionByName(dups).select(col("doc_id") +: col("sig") +:
      ((0 until 4).map(b => shiftright(col("sig"), b * 12)
        .bitwiseAND(lit(0xfff)).cast("int").as(s"b$b")) ++
        Seq(shiftright(col("sig"), 36).bitwiseAND(lit(0xfff)).as("e0"),
          col("sig").bitwiseAND(lit(0xfff)).as("e1"))): _*)
      .localCheckpoint()
    val want = (0 until planted)
      .map(j => (j.toLong * nV + 7, 20000L + j)).toSet
    def plantedRecall(pairs: DataFrame): Int = {
      val got = pairs.select("doc1", "doc2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      want.count(p => got.contains(p) || got.contains(p.swap))
    }
    val (dropN, dtDrop) = time {
      plantedRecall(BandedLsh.cappedPairs(esIn, 4, Some(6), bucketCap = 20))
    }
    val (escN, dtEsc) = time {
      plantedRecall(BandedLsh.cappedPairs(esIn, 4, Some(6), bucketCap = 20,
        escLevels = 2))
    }
    val term = BandedLsh.droppedBuckets(esIn, 4, 20, escLevels = 2).count()
    println(f"[lshcap] recall    planted=$planted drop-mode=$dropN " +
      f"escalated=$escN terminal-drops=$term dt=$dtDrop%5.2f/$dtEsc%5.2fs")
    require(dropN == 0, s"drop-mode should forfeit hot-band-only pairs: $dropN")
    require(escN == planted,
      s"escalation must recover every planted pair: $escN/$planted")

    // ── Scenario 3: terminal-star sweep mode on the same geometry ─────
    // The never-splittable buckets of scenario 2 (b0/b1 refine chains
    // whose every escalation slice is constant across the family) drop
    // in batch mode; the SWEEP mode recovers them as hub-star
    // candidates. Measure the candidate count — it must stay LINEAR in
    // terminal-bucket population (sum of pop per refined bucket), far
    // under the quadratic bucket-local join those buckets would cost —
    // and planted recall must be unchanged (the star only ADDS).
    val termPop = BandedLsh.droppedBuckets(esIn, 4, 20, escLevels = 2)
      .agg(sum("pop")).head.getLong(0)
    val ((starN, starCand), dtStar) = time {
      val (collapsed, kp) = BandedLsh.collapsedPairs(esIn, 4, Some(6),
        bucketCap = 20, escLevels = 2, terminalStar = true)
      val full = BandedLsh.expand(collapsed, kp, withHamming = true)
      (plantedRecall(full), kp.count())
    }
    println(f"[lshcap] star      terminal-pop=$termPop%7d " +
      f"verified-keeper-pairs=$starCand%8d recall=$starN dt=$dtStar%5.2fs")
    require(starN == planted,
      s"terminal-star must keep every escalated pair: $starN/$planted")
    require(starCand <= termPop + 10000L,
      s"star candidates must stay linear in terminal population: " +
        s"$starCand vs pop $termPop")
    spark.stop()
  }
}
