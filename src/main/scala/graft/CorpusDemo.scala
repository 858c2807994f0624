package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{Corpus, Sampling, TextOps}
import graft.sinks.Sinks

/** Runnable end-to-end corpus assembly (`sbt "runMain graft.CorpusDemo"`):
  * the training-data half of the engine chained the way a pretraining
  * pipeline runs it, with each stage's counts asserted —
  *
  *   split → exact decontamination (two-frame API) → fuzzy (near-dup)
  *   decontamination → Bloom cross-check → span-level exact dedup
  *   (clip duplicated spans, keep min-id copy) → source mixture →
  *   temperature (α-power) language flattening → quality floor →
  *   bigram-LM scoring audit → sequence packing → clustered layout
  *   write → bounded health sketches (CMS/HLL/histogram) → hybrid
  *   BM25+cosine RRF retrieval audit → incremental vector index.
  *
  * EtlDemo exercises the reference's harvest→KG lifecycle; this demo
  * exercises the corpus operators the builder prompt adds on top.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = java.nio.file.Files.createTempDirectory("corpus_demo").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, sf, "documents")
    val nAll = docs.count()

    // 1. content-stable split: train candidates vs held-out benchmark
    val split = Sampling.splitAssign(spark, sf).select("doc_id", "split")
    val train = docs.join(split.filter(col("split") === "train"), "doc_id")
      .select(docs.columns.map(col): _*)
    val bench = docs.join(split.filter(col("split") === "test"), "doc_id")
      .select(docs.columns.map(col): _*)
    val (nTrain, nBench) = (train.count(), bench.count())
    require(nTrain + nBench <= nAll && nTrain > 0 && nBench > 0)

    // 2. exact decontamination against the benchmark (two-frame API) —
    // corpus-level, BEFORE any sampling, so contamination lists are
    // complete regardless of later mixture choices
    val verdicts = Corpus.decontaminateFrames(train, bench).localCheckpoint()
    val nContaminated = verdicts.filter(!col("kept")).count()
    require(nContaminated > 0, "demo corpus has planted contamination; 0 caught")
    val kept = train.join(verdicts.filter(col("kept")), "doc_id")
      .select(train.columns.map(col): _*).localCheckpoint()

    // 3. fuzzy decontamination: near-dups across the boundary the exact
    // pass may miss (corpus-level list, applied to the survivors)
    val fuzzyDrops = Corpus.fuzzyDecontaminate(spark, sf).select("doc_id")
    val decon = kept.join(fuzzyDrops, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // 4. Bloom cross-check. The guarantee is ONE-SIDED: the Bloom pass
    // may over-drop (false positives) but must never pass a doc the
    // exact operator drops. Null-safe comparison (<=>) so a NULL verdict
    // could never hide in the filter.
    val bloom = Corpus.benchNgramBloom(spark, sf)
    val bloomV = Corpus.decontaminateBloom(train, bloom)
    val joined = verdicts.as("e").join(bloomV.as("s"), "doc_id")
    val falseNegatives = joined
      .filter(!col("e.kept") && col("s.kept") <=> true).count()
    require(falseNegatives == 0,
      s"bloom passed $falseNegatives docs the exact operator drops")
    val overDrops = joined
      .filter((col("e.kept") <=> true) && !(col("s.kept") <=> true)).count()

    // 5. span-level exact dedup: duplicated spans keep only the min-id
    // copy; everything else in both docs survives. n_chars is recomputed
    // from the clipped text so downstream gates see the real lengths.
    val clipStats = Corpus.spanClipOf(decon.select(col("doc_id"), col("text")))
      .localCheckpoint()
    val nClippedDocs = clipStats.filter(col("n_removed") > 0).count()
    val nTokensClipped = clipStats.agg(sum("n_removed")).head().getLong(0)
    require(nClippedDocs > 0, "demo corpus has planted span dups; 0 clipped")
    val clipped = decon.drop("text", "n_chars")
      .join(clipStats.select(col("doc_id"), col("text_clipped").as("text")),
        "doc_id")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .localCheckpoint()
    require(clipped.count() == decon.count(), "clipping must not drop docs")

    // 6. source mixture (upweight curated, downsample crawl)
    val mixed = Sampling.mixtureKept(clipped).localCheckpoint()
    val nMixed = mixed.count()
    require(nMixed > 0 && nMixed <= clipped.count(), s"mixture kept $nMixed")

    // 7. temperature-flatten the language mixture (α = 1/2): the dominant
    // language's share must strictly shrink, the smallest language keeps
    // everything
    val tempered = Sampling.temperatureKept(mixed, 0.5).localCheckpoint()
    val nTempered = tempered.count()
    require(nTempered > 0 && nTempered <= nMixed, s"temperature kept $nTempered")
    def topShare(df: org.apache.spark.sql.DataFrame): Double = {
      val counts = df.groupBy("lang").count().collect()
      counts.map(_.getLong(1)).max.toDouble / counts.map(_.getLong(1)).sum
    }
    require(topShare(tempered) < topShare(mixed),
      "temperature mix must flatten the dominant language share")

    // 8. quality floor (the corpus pipeline's first gate)
    val survivors = tempered.filter(col("n_chars") >= 150).localCheckpoint()
    val nSurvivors = survivors.count()
    require(nSurvivors > 0)

    // 8b. bigram-LM scoring audit over the survivors (the perplexity
    // half of quality filtering): every multi-token doc gets a score,
    // scores are log-probs (<= 0), and the worst outliers are visible
    val lm = TextOps.lmScoreOf(survivors).localCheckpoint()
    require(lm.count() == nSurvivors, "LM scoring must cover every doc")
    require(lm.filter(col("n_bigrams") > 0 && col("avg_logprob") > 0).count() == 0,
      "log-probabilities must be non-positive")
    // null-safe: min over an empty set (no multi-token survivor) is null
    val lmMinRow = lm.filter(col("n_bigrams") > 0)
      .agg(min("avg_logprob")).head()
    val lmMin =
      if (lmMinRow.isNullAt(0)) "n/a" else f"${lmMinRow.getDouble(0)}%.3f"

    // 9. pack survivors into fixed-token training sequences
    val packed = Corpus.packSequencesOf(spark, survivors).localCheckpoint()
    val nSeqs = packed.count()
    val nPackedDocs = packed.agg(sum("n_docs")).head().getLong(0)
    require(nPackedDocs == nSurvivors,
      s"packing lost docs: $nPackedDocs != $nSurvivors")

    // 9b. curriculum interleave: the deterministic global order a
    // training loader reads — sources round-robined, each internally
    // hash-shuffled, no global sort anywhere. Positions must be unique,
    // and the earliest |sources| positions can contain at most one doc
    // per source (the round-robin property).
    val order = Sampling.interleaveOf(survivors).localCheckpoint()
    require(order.count() == nSurvivors, "interleave must cover every doc")
    require(order.select("global_pos").distinct().count() == nSurvivors,
      "interleave positions must be unique")
    val nSources = order.select("source").distinct().count()
    val firstRound = order.orderBy("global_pos").limit(nSources.toInt)
    require(firstRound.select("source").distinct().count() ==
      firstRound.count(), "first interleave round must round-robin sources")

    // 9c. audit subsets: a per-source Hamilton quota (integer-exact —
    // quotas sum to the target and every source can serve its quota or
    // its whole group) plus a length-weighted Efraimidis–Spirakis draw
    // (the "pull me 50 docs for human review, longer docs likelier"
    // request) — both content-stable, so tomorrow's audit pulls the
    // same docs unless the corpus changed
    val quota = Sampling.groupQuotaOf(survivors, 100L).localCheckpoint()
    require(quota.agg(sum("quota")).head().getLong(0) == 100L,
      "quotas must sum exactly to the target")
    require(quota.filter(col("picked") =!=
      least(col("quota"), col("n_docs"))).count() == 0,
      "every source must serve min(quota, group size)")
    val audit = Sampling.weightedSampleOf(survivors, "audit", 50)
      .localCheckpoint()
    require(audit.count() == math.min(50L, nSurvivors))
    require(audit.join(survivors, "doc_id").count() == audit.count(),
      "audit sample must draw from the survivors only")

    // 10. land the corpus in query-ready layout (disjoint key ranges)
    Sinks.writeClustered(survivors, s"$out/corpus", nFiles = 4,
      maxRecordsPerFile = 1000L, "source", "doc_id")
    val nWritten = spark.read.parquet(s"$out/corpus").count()
    require(nWritten == nSurvivors, s"write lost docs: $nWritten")

    // 10b. standing health summaries over the landed corpus: the three
    // bounded sketches a pipeline keeps per shard — token CMS (heavy
    // hitters / vocabulary drift), HLL over content fingerprints
    // (distinct-content ≈ dedup health), and the n_chars histogram
    // (length-distribution drift). Each is kilobyte-scale REGARDLESS of
    // corpus size and merges across shards (CmsSpec/HllSpec/HistSpec pin
    // the merge laws), so a 100 TB corpus keeps one per shard/day and
    // diffs them instead of re-scanning.
    val landed = spark.read.parquet(s"$out/corpus")
    val cmsCells = queries.Sketches.buildSketch(
      queries.Sketches.tokensOf(landed)).count()
    require(cmsCells <= 4 * 1024, s"CMS grew past its bound: $cmsCells")
    val hllRegs = queries.Sketches.buildHll(
      queries.Sketches.keysOf(landed.select(md5(col("text")).as("k"))))
      .count()
    require(hllRegs <= 1024, s"HLL grew past its bound: $hllRegs")
    val lenBuckets = queries.Sketches.buildHist(
      landed.select(col("n_chars").cast("double").as("x"))).count()
    require(lenBuckets <= 64, s"length histogram grew: $lenBuckets")
    // 10c. collocation audit: strongest PMI pairs over the landed corpus
    // (bounded candidates: top-12 tokens/doc) — the vocabulary-health
    // report a curator reads next to the sketches
    val pmi = Corpus.pmiPairsOf(landed.select(col("doc_id"), col("text")))
      .collect()
    require(pmi.length <= 30, s"pmi must cap at 30 rows: ${pmi.length}")
    require(pmi.forall(r => !r.getAs[Double]("pmi").isNaN &&
      !r.getAs[Double]("pmi").isInfinite), "pmi scores must be finite")
    require(pmi.map(_.getAs[Long]("rank")).toSeq ==
      (1L to pmi.length).toSeq, "pmi ranks must be dense 1..k")

    // 10d. tokenizer induction over the landed corpus: learn the BPE
    // merge table, tokenize everything under it, and assert the merges
    // actually compress (BPE symbols strictly fewer than character
    // symbols corpus-wide — the whole point of the merge table)
    val bpeStats = queries.Bpe.bpeMergesOf(spark,
      landed.select(col("doc_id"), col("text")))
      .orderBy("round").collect()
    require(bpeStats.nonEmpty, "BPE learner found no merges")
    // tokenize the landed corpus under the merge table just induced from
    // it — the compression assertion exercises THAT table, not a re-learn
    val tok = queries.Bpe
      .bpeTokenizeOf(landed.select(col("doc_id"), col("text")), bpeStats)
      .agg(sum("n_char_syms").cast("long"), sum("n_bpe_syms").cast("long"))
      .head()
    val (charSyms, bpeSyms) = (tok.getLong(0), tok.getLong(1))
    require(bpeSyms < charSyms,
      s"BPE must compress: $bpeSyms !< $charSyms")

    // 11. hybrid retrieval audit: BM25 + cosine arms fused by reciprocal
    // rank — the "find me the docs most like this probe" query a data
    // curator runs against the landed corpus
    val fused = queries.VectorOps.rrfFusion(spark, sf).collect()
    require(fused.length > 0 && fused.length <= 20)
    require(fused.map(_.getAs[Long]("fused_rank")).toSeq ==
      (1L to fused.length).toSeq, "fused ranks must be dense 1..k")
    val rrfs = fused.map(_.getAs[Double]("rrf")).toSeq
    require(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
      "rrf scores must be non-increasing in fused rank")
    require(fused.forall(r => r.getAs[Long]("lex_rank") > 0 ||
      r.getAs[Long]("sem_rank") > 0), "every fused doc needs an arm")

    // 12. searchable embedding index for the landed corpus: the
    // embeddings stream into an incremental compressed VectorIndex in
    // two batches (frozen models after batch 1 — the production IVF
    // discipline), then the retrieval probes run against codes, not raw
    // vectors; drift instruments stay quiet on in-distribution data.
    val embT = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vidx = new similarity.VectorIndex(spark,
      new java.io.File(out, "vector_index").getAbsolutePath)
    vidx.ingest(embT.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0))
    vidx.ingest(embT.filter(col("vec_id") >= 10 && col("vec_id") % 2 =!= 0))
    val hits = vidx.search(embT.filter(col("vec_id") < 3), topK = 3, nprobe = 2)
      .collect()
    require(hits.nonEmpty && hits.length <= 9, s"vector search: ${hits.length}")
    // the frozen ranges come from batch 1 only, so a few full-table
    // values legitimately clip (≈0.5% here); a drifted distribution is
    // orders of magnitude beyond this
    val (oor, maxShare) = vidx.codecDrift(embT)
    require(oor < 0.02, s"in-distribution drift flagged: oor=$oor")

    println(s"[corpus] vector index: ${vidx.size} code rows in 2 batches, " +
      f"top-3 probe hits=${hits.length}, drift oor=$oor%.3f maxCellShare=$maxShare%.2f")

    // 13. multimodal arm: the landed corpus as opaque media payloads
    // through the incremental media dedup index (two batches, exact +
    // banded-Hamming near acceptance) — the media twin of step 12's
    // standing state, plus a frame-overlap audit of what it kept.
    locally {
      import spark.implicits._
      val media = landed
        .select(col("doc_id").as("id"),
          col("text").cast("binary").as("payload"),
          lit("application/octet-stream").as("mediaType"))
        .filter(octet_length(col("payload")) >= 4)
        .as[multimodal.BinaryPipeline.MediaRow]
      val midx = new similarity.MediaDedupIndex(spark,
        new java.io.File(out, "media_index").getAbsolutePath)
      val m1 = midx.ingest(media.filter(col("id") % 2 === 0))
      val m2 = midx.ingest(media.filter(col("id") % 2 =!= 0))
      val kept = midx.size
      require(kept == m1.nAdded + m2.nAdded, "index size != accepted rows")
      require(kept <= m1.nIn + m2.nIn)
      // the acceptance guarantee, checked on the final state: no two
      // INDEX signatures share a 12-bit band at Hamming ≤ 6 — exactly
      // the pair class every ingest (within-batch and vs-index) drops
      val sigs = midx.signatures
      val bandExpr = (b: Int) => shiftright(col("sig"), b * 12)
        .bitwiseAND(lit(4095))
      val banded = sigs.select(col("media_id"), col("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), bandExpr(b).as("bv"))): _*)).as("bb"))
        .select(col("media_id"), col("sig"),
          col("bb.band").as("band"), col("bb.bv").as("bv"))
      val residualDups = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.media_id") < col("y.media_id"))
        .filter(bit_count(col("x.sig").bitwiseXOR(col("y.sig"))) <= 6)
        .count()
      require(residualDups == 0,
        s"$residualDups banded near-dup pairs survived media dedup")
      println(s"[corpus] media index: $kept payloads kept of " +
        s"${m1.nIn + m2.nIn} (${m1.nDropped + m2.nDropped} near/exact dups " +
        "dropped), 0 residual banded near-dup pairs in the index")
    }
    println(s"[corpus] $nAll docs → split train=$nTrain bench=$nBench → " +
      s"exact-decon dropped $nContaminated (bloom: 0 false negatives, " +
      s"$overDrops over-drops) → fuzzy-decon → span-clip " +
      s"($nClippedDocs docs, $nTokensClipped tokens) → mixture=$nMixed → " +
      s"temperature=$nTempered → quality survivors=$nSurvivors " +
      s"(worst LM score $lmMin) → $nSeqs sequences ($nPackedDocs docs) " +
      s"→ interleaved over $nSources sources " +
      s"→ clustered parquet at $out/corpus → health sketches " +
      s"(cms=$cmsCells cells, hll=$hllRegs regs, hist=$lenBuckets buckets) " +
      s"→ quota audit (100 exact) + weighted audit draw (${audit.count()}) " +
      s"→ pmi top-${pmi.length} collocations " +
      s"→ bpe ${bpeStats.length} merges ($charSyms char-syms → $bpeSyms) " +
      s"→ rrf top-${fused.length} retrieval audit ok")
    spark.stop()
  }
}
