package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.load.{Scratch, TripletStore}

/** Oracle-graded replay of the versioned-store MERGE lifecycle (V3-V6,
  * `GraphHandler.py:78-148,348-419`): two deterministic extraction batches
  * built from the documents table load into a scratch [[TripletStore]], and
  * the full Version_Range state after the second merge is the query result.
  * Every lifecycle arm is exercised and hash-compared against a pure-SQL
  * restatement of the MERGE semantics:
  *
  *  - extend (V3/V5): triples present in both batches get
  *    `useEnd = max(old useEnd, new extractionTime)`,
  *  - deprecate-changed (V4): open triples whose subject is in batch 2 but
  *    whose value changed get `deprecated = true, useEnd = now`,
  *  - untouched: subjects absent from batch 2 keep their batch-1 range,
  *  - fresh (V1/V2): new (subject, value) pairs open a new range.
  *
  * Batch design over doc_id (sf-independent): batch 1 covers ids < 300;
  * batch 2 covers [100, 400) and uppercases the language of ids % 3 == 0 —
  * so [0,100) is untouched, [100,300) splits into extended (`hasSource`,
  * unchanged `hasLang`) and deprecated+fresh (changed `hasLang`), and
  * [300,400) is all fresh. Extraction times vary per row (doc_id mod
  * offsets) so the `greatest` in the extend arm is load-bearing.
  */
object Versioned {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // Logical load times (epoch seconds, UTC): batch-1 extraction base,
  // batch-2 extraction base, batch-2 merge "now" (deprecation stamp).
  private val T1 = 1704067200L // 2024-01-01T00:00:00Z
  private val T2 = 1706745600L // 2024-02-01T00:00:00Z
  private val T3 = 1709251200L // 2024-03-01T00:00:00Z

  /** One extraction batch in TripletStore.merge's input schema: two triples
    * per document (hasLang with a caller-chosen object, hasSource). */
  private def batch(docs: DataFrame, langObj: Column, etSec: Column): DataFrame = {
    val base = docs.select(
      concat(lit("doc:"), col("doc_id")).as("subject"),
      langObj.as("langObj"), col("source"), etSec.as("etSec"))
    base.select(col("subject"), lit("hasLang").as("predicate"),
        col("langObj").as("obj"), col("etSec"))
      .unionByName(base.select(col("subject"), lit("hasSource").as("predicate"),
        col("source").as("obj"), col("etSec")))
      .withColumn("objKind", lit("literal"))
      .withColumn("datatype", lit("xsd:string"))
      .withColumn("extractionMethod", lit("parser"))
      .withColumn("confidence", lit(0.9))
      .withColumn("extractionTime", timestamp_seconds(col("etSec")))
      .drop("etSec")
  }

  private def fixtureBatches(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents")
    val b1 = batch(docs.filter(col("doc_id") < 300), col("lang"),
      lit(T1) + col("doc_id") % 7 * 60)
    val b2 = batch(docs.filter(col("doc_id") >= 100 && col("doc_id") < 400),
      when(col("doc_id") % 3 === 0, upper(col("lang"))).otherwise(col("lang")),
      lit(T2) + col("doc_id") % 5 * 60)
    (b1, b2)
  }

  def versionHistory(s: SparkSession, dir: String): DataFrame =
    withFixtureStore(s, dir) { store =>
      store.ranges.select(col("subject"), col("predicate"), col("obj"),
          expr("unix_micros(useStart) div 1000").as("start_ms"),
          expr("unix_micros(useEnd) div 1000").as("end_ms"),
          col("deprecated"))
        .localCheckpoint()
    }

  /** The legacy-level rewrite verb graded end-to-end: the two-batch
    * fixture loads into a scratch BUCKETED store (`bucketMinRows = 1` so
    * the layout engages at fixture scale), both level dirs are stripped
    * of their per-level modulus markers — simulating a store written
    * before self-description and subject blooms shipped — and
    * [[graft.load.TripletStore.rewriteLegacyLevels]] modernizes them in
    * ONE claimed pass. The full ranges state then reads back THROUGH
    * the rewritten sibling generations (`rv=` dirs, preferred by the
    * level picker) and must hash-match the same pure-SQL two-batch
    * MERGE restatement as q_version_history: identical rows, different
    * physical read path — any drift in the rewrite's row fidelity, its
    * modulus choice, or the generation preference mismatches here. */
  def legacyRewrite(s: SparkSession, dir: String): DataFrame = {
    // the intake is byte-for-byte the lookup verbs' bucketed fixture
    // store (same geometry, same two merges) — the rewrite MUTATES its
    // store, so it continues from a private replica of the
    // session-shared state, replicated through the store's own commit
    // protocol ([[TripletStore.replicateTo]]; 8 buckets not the 64
    // floor, same geometry rationale as [[fixtureStoreRoot]])
    val root = fixtureStoreRoot(s, dir)
    Scratch.withScratch("graft_lr_q", dir) { tmp =>
      new TripletStore(s, root.getAbsolutePath,
        bucketMinRows = 1L, subjectBuckets = 8).replicateTo(tmp)
      val store = new TripletStore(s, tmp.getAbsolutePath,
        bucketMinRows = 1L, subjectBuckets = 8)
      Seq("v=0", "v=1").foreach { n =>
        val m = new java.io.File(new java.io.File(tmp, n),
          TripletStore.LevelBucketMarker)
        require(m.delete(), s"fixture level $n was not self-described")
      }
      val rewritten = store.rewriteLegacyLevels()
      require(rewritten.toSet == Set("rv=0", "rv=1"),
        s"expected both fixture levels rewritten, got $rewritten")
      store.ranges.select(col("subject"), col("predicate"), col("obj"),
          expr("unix_micros(useStart) div 1000").as("start_ms"),
          expr("unix_micros(useEnd) div 1000").as("end_ms"),
          col("deprecated"))
        .localCheckpoint()
    }
  }

  /** V6 delta emit, oracle-graded: triples added / retired between the two
    * snapshots — pure anti-joins over versions (`GraphHandler.py:78-148`).
    * Added = batch-2 fresh triples; retired = the deprecate-changed set. */
  def versionDelta(s: SparkSession, dir: String): DataFrame =
    withFixtureStore(s, dir) { store =>
      val (added, retired) = store.delta(0, 1)
      added.withColumn("change", lit("added"))
        .unionByName(retired.withColumn("change", lit("retired")))
        .localCheckpoint()
    }

  /** V8 as-of queries, oracle-graded at two probe times: mid-January
    * (before batch 2: every batch-1 range is live, including the ones
    * later deprecated) and April (after the deprecation stamp: the
    * current graph — extended + untouched + fresh, deprecated excluded). */
  def versionAsOf(s: SparkSession, dir: String): DataFrame =
    withFixtureStore(s, dir) { store =>
      val jan = new Timestamp(1705276800L * 1000) // 2024-01-15T00:00:00Z
      val apr = new Timestamp(1711929600L * 1000) // 2024-04-01T00:00:00Z
      store.asOf(jan).withColumn("as_of", lit("jan"))
        .unionByName(store.asOf(apr).withColumn("as_of", lit("apr")))
        .select("as_of", "subject", "predicate", "obj")
        .localCheckpoint()
    }

  // Batch-3 logical times: extraction base and merge "now" (deprecation
  // stamp) for the post-compaction merge.
  private val T4 = 1711929600L // 2024-04-01T00:00:00Z
  private val T5 = 1714521600L // 2024-05-01T00:00:00Z

  /** The delta-layout lifecycle, oracle-graded end-to-end: after the
    * two-batch load the store COMPACTS (keep=1 — the full state
    * materializes as a `base=` snapshot and every delta dir is dropped),
    * then a third batch merges ON TOP of the base ([200,250) forced to
    * `hasLang = newlang`: its `hasSource` rows extend, its `hasLang`
    * rows deprecate + refresh). The result is the full Version_Range
    * state read through the base + delta reconstruction — any drift in
    * the base materialization, the leftover-delta exclusion, or the
    * latest-writer-wins window hash-mismatches against a pure-SQL
    * three-batch MERGE restatement. */
  def versionCompacted(s: SparkSession, dir: String): DataFrame = {
    val b3 = batch(
      t(s, dir, "documents").filter(col("doc_id") >= 200 && col("doc_id") < 250),
      lit("newlang"), lit(T4))
    // compaction + merge-on-base continue from the session-shared
    // two-merge state on a private replica (the verb mutates), replicated
    // through the store's own commit protocol ([[TripletStore.replicateTo]]
    // — committed levels + durable markers only, never a claim marker or
    // tmp garbage), not a raw dir copy
    val root = mergedDefaultStoreRoot(s, dir)
    Scratch.withScratch("graft_vc_q", dir) { tmp =>
      new TripletStore(s, root.getAbsolutePath).replicateTo(tmp)
      val store = new TripletStore(s, tmp.getAbsolutePath)
      store.compact(keep = 1)
      store.merge(b3, new Timestamp(T5 * 1000))
      store.ranges.select(col("subject"), col("predicate"), col("obj"),
          expr("unix_micros(useStart) div 1000").as("start_ms"),
          expr("unix_micros(useEnd) div 1000").as("end_ms"),
          col("deprecated"))
        .localCheckpoint()
    }
  }

  /** Shared fixture CTEs for the three oracles: the two batches as pure
    * SQL over the raw identity fields (equal to the store's md5 identity
    * up to collisions; objKind/datatype/info constant). */
  private val fixtureCte: String =
    s"""d AS (SELECT doc_id, lang, source FROM documents),
       |b1 AS (
       |  SELECT 'doc:' || doc_id AS subject, 'hasLang' AS predicate, lang AS obj,
       |         ${T1 * 1000} + (doc_id % 7) * 60000 AS et_ms
       |  FROM d WHERE doc_id < 300
       |  UNION ALL
       |  SELECT 'doc:' || doc_id, 'hasSource', source,
       |         ${T1 * 1000} + (doc_id % 7) * 60000
       |  FROM d WHERE doc_id < 300
       |),
       |b2 AS (
       |  SELECT 'doc:' || doc_id AS subject, 'hasLang' AS predicate,
       |         CASE WHEN doc_id % 3 = 0 THEN upper(lang) ELSE lang END AS obj,
       |         ${T2 * 1000} + (doc_id % 5) * 60000 AS et_ms
       |  FROM d WHERE doc_id >= 100 AND doc_id < 400
       |  UNION ALL
       |  SELECT 'doc:' || doc_id, 'hasSource', source,
       |         ${T2 * 1000} + (doc_id % 5) * 60000
       |  FROM d WHERE doc_id >= 100 AND doc_id < 400
       |),
       |touched AS (SELECT DISTINCT subject FROM b2)""".stripMargin

  /** Pure-SQL restatement of the two-batch merge (body only, so
    * q_version_compacted can reuse it as a CTE). `dep2Ms` is the
    * deprecation stamp of the second merge — the caller-passed `now` in
    * batch mode, the batch's max extraction time in streaming mode. */
  private def versionHistoryBody(dep2Ms: Long): String =
    s"""SELECT b1.subject, b1.predicate, b1.obj, b1.et_ms AS start_ms,
       |       greatest(b1.et_ms, b2.et_ms) AS end_ms, false AS deprecated
       |FROM b1 JOIN b2 ON b1.subject = b2.subject
       |  AND b1.predicate = b2.predicate AND b1.obj = b2.obj
       |UNION ALL
       |SELECT b1.subject, b1.predicate, b1.obj, b1.et_ms,
       |       CASE WHEN b1.subject IN (SELECT subject FROM touched)
       |            THEN $dep2Ms ELSE b1.et_ms END,
       |       b1.subject IN (SELECT subject FROM touched)
       |FROM b1
       |WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.subject = b1.subject
       |  AND b2.predicate = b1.predicate AND b2.obj = b1.obj)
       |UNION ALL
       |SELECT b2.subject, b2.predicate, b2.obj, b2.et_ms, b2.et_ms, false
       |FROM b2
       |WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.subject = b2.subject
       |  AND b1.predicate = b2.predicate AND b1.obj = b2.obj)""".stripMargin

  val versionHistorySql: String =
    s"WITH $fixtureCte\n${versionHistoryBody(T3 * 1000)}"

  val versionDeltaSql: String =
    s"""WITH $fixtureCte
       |SELECT subject, predicate, obj, 'added' AS change
       |FROM b2
       |WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.subject = b2.subject
       |  AND b1.predicate = b2.predicate AND b1.obj = b2.obj)
       |UNION ALL
       |SELECT subject, predicate, obj, 'retired'
       |FROM b1
       |WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.subject = b1.subject
       |  AND b2.predicate = b1.predicate AND b2.obj = b1.obj)
       |  AND subject IN (SELECT subject FROM touched)""".stripMargin

  /** Body of the two-probe-time as-of oracle — shared verbatim by
    * q_version_asof (whole store) and q_subject_asof (the same read
    * restricted to the lookup subjects). */
  private val versionAsOfBody: String =
    s"""SELECT 'jan' AS as_of, subject, predicate, obj FROM b1
       |UNION ALL
       |SELECT 'apr', subject, predicate, obj FROM b1
       |WHERE NOT (subject IN (SELECT subject FROM touched)
       |  AND NOT EXISTS (SELECT 1 FROM b2 WHERE b2.subject = b1.subject
       |    AND b2.predicate = b1.predicate AND b2.obj = b1.obj))
       |UNION ALL
       |SELECT 'apr', subject, predicate, obj FROM b2
       |WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.subject = b2.subject
       |  AND b1.predicate = b2.predicate AND b1.obj = b2.obj)""".stripMargin

  val versionAsOfSql: String = s"WITH $fixtureCte\n$versionAsOfBody"

  /** The three-batch restatement: `s2` is the two-batch state (the
    * q_version_history oracle verbatim), then batch 3's MERGE arms apply
    * over it — closed rows immutable, matched open rows extended,
    * unmatched open rows of touched subjects deprecated at T5, untouched
    * open rows carried, unmatched batch rows fresh. */
  val versionCompactedSql: String = versionCompactedSqlAt(T3 * 1000, T5 * 1000)

  /** The three-batch restatement with caller-chosen deprecation stamps
    * (`dep2Ms` for the second merge, `dep3Ms` for the third) — shared by
    * q_version_compacted (batch `now` stamps) and q_stream_merge (the
    * stream stamps each merge at its batch's max extraction time). */
  private def versionCompactedSqlAt(dep2Ms: Long, dep3Ms: Long): String =
    s"""WITH $fixtureCte,
       |s2 AS MATERIALIZED (${versionHistoryBody(dep2Ms)}),
       |b3 AS (
       |  SELECT 'doc:' || doc_id AS subject, 'hasLang' AS predicate,
       |         'newlang' AS obj, ${T4 * 1000} AS et_ms
       |  FROM d WHERE doc_id >= 200 AND doc_id < 250
       |  UNION ALL
       |  SELECT 'doc:' || doc_id, 'hasSource', source, ${T4 * 1000}
       |  FROM d WHERE doc_id >= 200 AND doc_id < 250
       |),
       |t3 AS (SELECT DISTINCT subject FROM b3)
       |SELECT subject, predicate, obj, start_ms, end_ms, deprecated
       |FROM s2 WHERE deprecated
       |UNION ALL
       |SELECT s2.subject, s2.predicate, s2.obj, s2.start_ms,
       |       greatest(s2.end_ms, b3.et_ms), false
       |FROM s2 JOIN b3 ON s2.subject = b3.subject
       |  AND s2.predicate = b3.predicate AND s2.obj = b3.obj
       |WHERE NOT s2.deprecated
       |UNION ALL
       |SELECT subject, predicate, obj, start_ms, $dep3Ms, true
       |FROM s2
       |WHERE NOT deprecated AND subject IN (SELECT subject FROM t3)
       |  AND NOT EXISTS (SELECT 1 FROM b3 WHERE b3.subject = s2.subject
       |    AND b3.predicate = s2.predicate AND b3.obj = s2.obj)
       |UNION ALL
       |SELECT subject, predicate, obj, start_ms, end_ms, deprecated
       |FROM s2
       |WHERE NOT deprecated AND subject NOT IN (SELECT subject FROM t3)
       |UNION ALL
       |SELECT b3.subject, b3.predicate, b3.obj, b3.et_ms, b3.et_ms, false
       |FROM b3
       |WHERE NOT EXISTS (SELECT 1 FROM s2 WHERE NOT s2.deprecated
       |  AND s2.subject = b3.subject AND s2.predicate = b3.predicate
       |  AND s2.obj = b3.obj)""".stripMargin

  /** Time-based retention, oracle-graded: the three-batch lifecycle
    * (merge, merge@T3, merge@T5 — so closed ranges carry TWO distinct
    * deprecation stamps), then `compact(olderThan = T4)`. T4 sits
    * between the stamps, so the purge is PARTIAL: the T3-closed ranges
    * (which no as-of at or after T4 can ever return) drop, the
    * T5-closed ranges and every open range survive, and the whole
    * surviving state re-reads through the purged base the retention
    * pass wrote. The oracle is the proven three-batch MERGE restatement
    * filtered by the retention rule — any drift in the purge predicate,
    * the horizon fold, or the base rewrite hash-mismatches. (The
    * below-horizon THROW and horizon monotonicity are spec-pinned in
    * TripletStoreSpec; a refusal cannot be a DataFrame row.) */
  def versionTtl(s: SparkSession, dir: String): DataFrame = {
    val b3 = batch(
      t(s, dir, "documents").filter(col("doc_id") >= 200 && col("doc_id") < 250),
      lit("newlang"), lit(T4))
    // third merge + retention continue from the session-shared
    // two-merge state on a private replica (the verb mutates), via the
    // store's commit-protocol replication (see versionCompacted)
    val root = mergedDefaultStoreRoot(s, dir)
    Scratch.withScratch("graft_vt_q", dir) { tmp =>
      new TripletStore(s, root.getAbsolutePath).replicateTo(tmp)
      val store = new TripletStore(s, tmp.getAbsolutePath)
      store.merge(b3, new Timestamp(T5 * 1000))
      store.compact(olderThan = new Timestamp(T4 * 1000))
      store.ranges.select(col("subject"), col("predicate"), col("obj"),
          expr("unix_micros(useStart) div 1000").as("start_ms"),
          expr("unix_micros(useEnd) div 1000").as("end_ms"),
          col("deprecated"))
        .localCheckpoint()
    }
  }

  /** The three-batch state filtered by the retention rule: keep open
    * ranges and closed ranges still answerable at or after the T4
    * horizon. */
  val versionTtlSql: String =
    s"""SELECT * FROM (
       |${versionCompactedSqlAt(T3 * 1000, T5 * 1000)}
       |) WHERE NOT deprecated OR end_ms >= ${T4 * 1000}""".stripMargin

  /** §2.12 streaming load, oracle-graded end-to-end: the SAME three
    * fixture batches arrive as separate parquet files consumed by a real
    * Structured Streaming file source ([[graft.streaming.StreamingLoad]]),
    * each micro-batch merging into a scratch store with
    * `autoCompactEvery = 1` — so the stream itself exercises
    * merge → auto-compact → merge-on-base continuity, not just the merge
    * arms. The stream stamps each merge at its batch's max extraction
    * time (the logical load clock; `StreamingLoad.start`), so the oracle
    * is the three-batch MERGE restatement with deprecation stamps
    * `max(et(b2)) = T2 + 4min` and `max(et(b3)) = T4` instead of the
    * batch-mode `now` arguments. Any drift between the streaming path
    * and batch semantics — micro-batch ordering, foreachBatch state,
    * compaction inside the stream — hash-mismatches here. */
  /** The three fixture INPUT FILES staged once per (session, dir) — r16,
    * guide §6 on the stream's non-graded scaffolding: the three
    * `coalesce(1).write.parquet` jobs wrote byte-identical fixture files
    * per invocation (pure input staging, ~3 full batch computations
    * before the stream even starts). The stream, its store, and its
    * checkpoint stay fully PRIVATE per invocation — only the input bytes
    * are shared, copied driver-side into each run's own in-dir in the
    * same arrival order. */
  private val streamInputMemo = new graft.operators.SessionMemo[java.io.File]
  private def stagedStreamInputs(s: SparkSession, dir: String): java.io.File =
    streamInputMemo.getOrCompute(s, dir)(
      f => (1 to 3).forall(i =>
        new java.io.File(new java.io.File(f, s"b$i"), "_SUCCESS").exists())) {
      val tmp = Scratch.dir("graft_sm_in", dir)
      sharedStoreDirs.add(tmp)
      val (b1, b2) = fixtureBatches(s, dir)
      val b3 = batch(
        t(s, dir, "documents").filter(col("doc_id") >= 200 && col("doc_id") < 250),
        lit("newlang"), lit(T4))
      Seq("b1" -> b1, "b2" -> b2, "b3" -> b3).foreach { case (n, b) =>
        b.coalesce(1).write.mode("overwrite")
          .parquet(new java.io.File(tmp, n).getAbsolutePath)
      }
      tmp
    }

  /** Copy one staged batch's data files into the stream's in-dir (the
    * `mode("append")` drop, minus the recomputation): data files only —
    * `_SUCCESS`/hidden files are source-ignored anyway — with their
    * staged names (part-file UUIDs are globally unique, so drops never
    * collide). */
  private def dropStaged(staged: java.io.File, n: String, inDir: String): Unit = {
    val dst = new java.io.File(inDir)
    dst.mkdirs()
    Option(new java.io.File(staged, n).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .foreach(f => java.nio.file.Files.copy(f.toPath,
        new java.io.File(dst, f.getName).toPath))
  }

  def streamMerge(s: SparkSession, dir: String): DataFrame = {
    val staged = stagedStreamInputs(s, dir)
    Scratch.withScratch("graft_sm_q", dir) { tmp =>
      val inDir = new java.io.File(tmp, "in").getAbsolutePath
      val ckDir = new java.io.File(tmp, "ck").getAbsolutePath
      val store = new TripletStore(s, new java.io.File(tmp, "store").getAbsolutePath,
        autoCompactEvery = 1, autoCompactKeep = 1)
      // one file per logical batch; processAllAvailable between drops
      // pins the arrival order regardless of file-listing tiebreaks
      dropStaged(staged, "b1", inDir)
      val q = graft.streaming.StreamingLoad.start(
        graft.streaming.StreamingLoad.readTripleStream(s, inDir), store, ckDir)
      try {
        q.processAllAvailable()
        dropStaged(staged, "b2", inDir)
        q.processAllAvailable()
        dropStaged(staged, "b3", inDir)
        q.processAllAvailable()
      } finally q.stop()
      store.ranges.select(col("subject"), col("predicate"), col("obj"),
          expr("unix_micros(useStart) div 1000").as("start_ms"),
          expr("unix_micros(useEnd) div 1000").as("end_ms"),
          col("deprecated"))
        .localCheckpoint()
    }
  }

  /** Stream deprecation stamps: batch 2's max extraction time is
    * `T2 + (max doc_id%5)*60s`; batch 3's is flat `T4`. */
  val streamMergeSql: String =
    versionCompactedSqlAt(T2 * 1000 + 4 * 60000, T4 * 1000)

  /** The five lookup subjects, one per fixture regime: untouched
    * (doc:42), extended-unchanged (doc:103), deprecated + refreshed
    * (doc:105 — %3 == 0 flips its hasLang), fresh-in-batch-2 (doc:350),
    * and absent (doc:99999 — the lookup must return nothing, not fail). */
  private val LookupSubjects =
    Seq("doc:42", "doc:103", "doc:105", "doc:350", "doc:99999")

  /** V8 point lookup graded end-to-end — the reference's hash index on
    * subject (`init.sql:28-38`) as an engine verb: the two-batch fixture
    * loads into a scratch store built with `bucketMinRows = 1` (the
    * bucketed layout engages at fixture scale; by default only
    * lake-sized levels bucket), then
    * [[graft.load.TripletStore.currentTriplesFor]] reads exactly the
    * five [[LookupSubjects]] through the bucket-pruned level scan —
    * PartitionFilters on every bucketed level, PlanSpec-pinned. */
  /** Load the two-batch fixture into a scratch BUCKETED store and hand
    * it to `body` — shared by the FIVE read-only verbs over the
    * two-merge state (history, delta, the two-probe as-of, and the two
    * point lookups). `subjectBuckets = 8` (not the 64 floor): the
    * instrument's cost is store construction, and with
    * `bucketMinRows = 1` every level fans out one dir+file per touched
    * bucket — 8 buckets cut that 8x while still proving multi-bucket
    * pruning (the five lookup subjects span several of the 8).
    *
    * The store itself BUILDS ONCE per (session, dir) — the same
    * memoization the media family's decode got
    * ([[MediaDedup.corpusSignatures]]): r14 shared it between the two
    * lookup verbs (~3 s of pure instrument cost recovered per bench
    * sweep); r15 extends it to versionHistory / versionDelta /
    * versionAsOf, which each rebuilt an IDENTICAL two-merge fixture
    * store per invocation (~1.2 s apiece of pure instrument cost),
    * while in production every one of these verbs reads a store that
    * already exists. Each verb's READ stays end-to-end (full
    * reconstruction for ranges/delta/as-of; bucket-pruned
    * literal-pushdown scans for the lookups) — only the fixture build
    * is shared, and the mutating verbs (legacy rewrite, compaction,
    * TTL, the streaming load) still build private stores. The read
    * verbs' rows are layout-independent by construction (bucketing is
    * physical placement only; q_subject_lookup's oracle pinned that in
    * r13). The scratch dir outlives the query and is removed by a JVM
    * shutdown hook; a swept/deleted dir re-builds. */
  private val lookupStoreMemo = new graft.operators.SessionMemo[java.io.File]

  // ONE shutdown hook sweeping a registry instead of a hook per build:
  // a long-lived JVM cycling sessions would otherwise grow the hook set
  // (and each superseded dir lives until exit regardless — ~100 KB per
  // (session, dir), removed here in one pass). Holds EVERY session-shared
  // store root this object memoizes: the lookup-verb bucketed fixture
  // store AND the default-geometry merged store the mutating verbs copy
  // from.
  private val sharedStoreDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  sys.addShutdownHook {
    sharedStoreDirs.forEach(d => Scratch.rm(d))
  }

  private def fixtureStoreRoot(s: SparkSession, dir: String): java.io.File =
    lookupStoreMemo.getOrCompute(s, dir)(
      f => new java.io.File(f, TripletStore.FormatMarker).exists()) {
      val tmp = Scratch.dir("graft_lk_q", dir)
      sharedStoreDirs.add(tmp)
      val (b1, b2) = fixtureBatches(s, dir)
      val store = new TripletStore(s, tmp.getAbsolutePath,
        bucketMinRows = 1L, subjectBuckets = 8)
      store.merge(b1, new Timestamp(T1 * 1000))
      store.merge(b2, new Timestamp(T3 * 1000))
      tmp
    }

  private def withFixtureStore[T](s: SparkSession, dir: String)
                                 (body: TripletStore => T): T =
    body(new TripletStore(s, fixtureStoreRoot(s, dir).getAbsolutePath,
      bucketMinRows = 1L, subjectBuckets = 8))

  /** The DEFAULT-geometry two-merge state (b1@T1, b2@T3 under a plain
    * `new TripletStore(s, path)`) shared by the two mutating retention
    * verbs: q_version_compacted and q_version_ttl each continue from
    * this exact state with their own compaction/merge tail. Built once
    * per (session, dir) like [[fixtureStoreRoot]]; each verb MUTATES its
    * store, so it runs on a private dir-copy replica
    * ([[Scratch.copyDir]] — the store layout is self-contained, so the
    * copy is byte-identical and the continuation reads precisely the
    * state a private rebuild would have produced). The streaming load
    * (q_stream_merge) keeps its private store: the stream IS its verb. */
  private val mergedStoreMemo = new graft.operators.SessionMemo[java.io.File]
  private def mergedDefaultStoreRoot(s: SparkSession, dir: String): java.io.File =
    mergedStoreMemo.getOrCompute(s, dir)(
      f => new java.io.File(f, TripletStore.FormatMarker).exists()) {
      val tmp = Scratch.dir("graft_vm_q", dir)
      sharedStoreDirs.add(tmp)
      val (b1, b2) = fixtureBatches(s, dir)
      val store = new TripletStore(s, tmp.getAbsolutePath)
      store.merge(b1, new Timestamp(T1 * 1000))
      store.merge(b2, new Timestamp(T3 * 1000))
      tmp
    }

  def subjectLookup(s: SparkSession, dir: String): DataFrame =
    withFixtureStore(s, dir) { store =>
      store.currentTriplesFor(LookupSubjects)
        .select("subject", "predicate", "obj")
        .localCheckpoint()
    }

  /** V8 point lookup AT A TIMESTAMP, graded end-to-end: the same five
    * subjects read as of mid-January (pre-batch-2: doc:105's original
    * hasLang still answers, doc:350 absent) and as of April (the
    * current graph's slice) through
    * [[graft.load.TripletStore.currentTriplesFor(subjects:Seq[String],asOf:java.sql.Timestamp)*]]
    * — the bucket-pruned, literal-pushdown scan over open AND closed
    * ranges, against the q_version_asof oracle restricted to the lookup
    * set. The reference's most natural history read ("what did this
    * card say in January") composed from the two graded verbs. */
  def subjectAsOf(s: SparkSession, dir: String): DataFrame =
    withFixtureStore(s, dir) { store =>
      val jan = new Timestamp(1705276800L * 1000) // 2024-01-15T00:00:00Z
      val apr = new Timestamp(1711929600L * 1000) // 2024-04-01T00:00:00Z
      store.currentTriplesFor(LookupSubjects, jan)
        .withColumn("as_of", lit("jan"))
        .unionByName(store.currentTriplesFor(LookupSubjects, apr)
          .withColumn("as_of", lit("apr")))
        .select("as_of", "subject", "predicate", "obj")
        .localCheckpoint()
    }

  /** The current graph (the q_version_asof 'apr' arms) restricted to the
    * lookup subjects. */
  val subjectLookupSql: String = {
    val in = LookupSubjects.map(sub => s"'$sub'").mkString(", ")
    s"""WITH $fixtureCte
       |SELECT subject, predicate, obj FROM (
       |  SELECT subject, predicate, obj FROM b1
       |  WHERE NOT (subject IN (SELECT subject FROM touched)
       |    AND NOT EXISTS (SELECT 1 FROM b2 WHERE b2.subject = b1.subject
       |      AND b2.predicate = b1.predicate AND b2.obj = b1.obj))
       |  UNION ALL
       |  SELECT subject, predicate, obj FROM b2
       |  WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.subject = b2.subject
       |    AND b1.predicate = b2.predicate AND b1.obj = b2.obj))
       |WHERE subject IN ($in)""".stripMargin
  }

  /** The q_version_asof oracle restricted to the lookup subjects. */
  val subjectAsOfSql: String = {
    val in = LookupSubjects.map(sub => s"'$sub'").mkString(", ")
    s"""WITH $fixtureCte
       |SELECT as_of, subject, predicate, obj FROM (
       |$versionAsOfBody
       |) WHERE subject IN ($in)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_version_history" -> versionHistory _,
    "q_legacy_rewrite" -> legacyRewrite _,
    "q_version_delta" -> versionDelta _,
    "q_version_asof" -> versionAsOf _,
    "q_version_compacted" -> versionCompacted _,
    "q_version_ttl" -> versionTtl _,
    "q_subject_lookup" -> subjectLookup _,
    "q_subject_asof" -> subjectAsOf _,
    "q_stream_merge" -> streamMerge _)

  val oracles: Map[String, String] = Map(
    "q_version_history" -> versionHistorySql,
    // identical state through the rewritten-generation read path: the
    // oracle IS the two-batch MERGE restatement
    "q_legacy_rewrite" -> versionHistorySql,
    "q_version_delta" -> versionDeltaSql,
    "q_version_asof" -> versionAsOfSql,
    "q_version_compacted" -> versionCompactedSql,
    "q_version_ttl" -> versionTtlSql,
    "q_subject_lookup" -> subjectLookupSql,
    "q_subject_asof" -> subjectAsOfSql,
    "q_stream_merge" -> streamMergeSql)
}
