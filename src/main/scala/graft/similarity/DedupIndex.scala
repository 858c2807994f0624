package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus dedup index — the production shape of the dedup
  * pipeline at 100 TB: the corpus is NOT re-deduplicated per batch;
  * instead a persisted signature table (one row per surviving document:
  * content fingerprint + MinHash signature) is the standing index, and
  * each incoming batch is checked (a) within itself, (b) against the
  * index, by exact fingerprint and by LSH band match — all equi-joins on
  * fingerprint/band, never all-pairs, never a rescan of old text.
  *
  * Batch acceptance rules (mirroring the batch corpus pipeline's
  * semantics, `queries.TextOps.corpusPipeline`):
  *  - exact dup: same md5(text) as the index or a smaller-id batch doc;
  *  - near dup: shares a full MinHash band ((mh0,mh1) or (mh2,mh3)) with
  *    the index or with ANY smaller-id batch doc that passed the exact
  *    stage (non-cascading: the smaller doc counts even if it is itself
  *    dropped by a band match — same one-pass rule as the batch corpus
  *    pipeline and the q_incremental_dedup oracle);
  *  - survivors' signatures are appended as a new committed batch
  *    directory (parquet `_SUCCESS` gating, like the triple store).
  */
class DedupIndex(spark: SparkSession, path: String)
    extends BatchedSignatureStore(spark, path) {

  import DedupIndex._

  override protected def schema: org.apache.spark.sql.types.StructType = sigSchema

  /** The standing signature table (empty-schema DF for a fresh index). */
  def signatures: DataFrame = table

  /** Ingest one batch of (doc_id, text); returns survivors + stats.
    * One signature computation per batch doc, ever. */
  def ingest(docs: DataFrame): IngestStats =
    serialized { graft.operators.Checkpoints.scoped {
      val batch = graft.operators.Checkpoints.ck(signaturesFor(docs))
      val survivors =
        graft.operators.Checkpoints.ck(DedupIndex.acceptancePlan(batch, signatures))
      val nIn = batch.count()
      val nAdded = survivors.count()
      append(survivors, nAdded)
      IngestStats(nIn = nIn, nAdded = nAdded, nDropped = nIn - nAdded)
    } }
}

object DedupIndex {

  import org.apache.spark.sql.types._

  final case class IngestStats(nIn: Long, nAdded: Long, nDropped: Long)

  /** The batch-acceptance dataflow — exact + band stages over (batch,
    * index) signature tables, returning the surviving batch rows. Exposed
    * separately from [[DedupIndex.ingest]] so PlanSpec can pin its shape:
    * every join is an equi-join on fingerprint or band, never all-pairs. */
  private[graft] def acceptancePlan(batch: DataFrame, idx: DataFrame): DataFrame = {
    // Index-side discipline (same shape as the store's touched-slice
    // MERGE): every probe of the standing index first SEMI-FILTERS it by
    // the batch's own keys — the semi's build side is the small batch
    // list, which AQE broadcasts, so the index is scanned but never
    // shuffled, and every downstream join runs against O(batch) rows. A
    // plain anti-join against the raw index would shuffle the full index
    // per ingest (the batch is the anti's streamed side, so it can never
    // be the broadcast build).

    // (a) exact: smallest id per fingerprint within the batch...
    val exactKeep = batch.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // ...then anti-join the batch-hit slice of the index fingerprints.
    // dropDuplicates collapses fully identical batch rows (same doc_id
    // AND text), which the min-id-per-fingerprint keep alone would let
    // through twice.
    val preExact = batch.join(exactKeep, "doc_id")
      .dropDuplicates("fp")
    val idxFpHits = idx.select("fp")
      .join(preExact.select("fp"), Seq("fp"), "left_semi").distinct()
    val afterExact = preExact.join(idxFpHits, Seq("fp"), "left_anti")

    // (b) near: LSH band hit against the index drops the batch doc; a
    // band shared with a smaller-id post-exact batch doc drops the larger
    // (non-cascading — see class doc)
    def bands(df: DataFrame, idCol: String) =
      df.select(col("doc_id").as(idCol),
          concat_ws("_", col("mh0"), col("mh1")).as("band"))
        .unionByName(df.select(col("doc_id").as(idCol),
          concat_ws("_", col("mh2"), col("mh3")).as("band")))
    val batchBands = bands(afterExact, "doc_id")
    val idxBandHits = bands(idx, "idx_id").select("band")
      .join(batchBands.select("band"), Seq("band"), "left_semi").distinct()
    val vsIndex = batchBands.join(idxBandHits, "band")
      .select("doc_id").distinct()
    // within batch, a full-band match alone IS the drop criterion (no
    // further verification), so "∃ smaller-id doc sharing a band" is
    // just "doc_id > min(doc_id) of the bucket" — a window min, linear
    // output, instead of the band self-join whose output is quadratic in
    // bucket population on a boilerplate-heavy batch
    val withinBatch = batchBands
      .withColumn("mn", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band")))
      .filter(col("doc_id") > col("mn"))
      .select("doc_id").distinct()

    afterExact
      .join(vsIndex.unionByName(withinBatch).distinct(), Seq("doc_id"), "left_anti")
  }

  val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", StringType),
    StructField("mh0", LongType), StructField("mh1", LongType),
    StructField("mh2", LongType), StructField("mh3", LongType)))

  /** Fingerprint + 4-permutation MinHash over word 3-gram shingles (the
    * native `word_ngrams` expression; shingle-less docs hash on their
    * fingerprint so empty texts still dedup exactly). */
  def signaturesFor(docs: DataFrame): DataFrame = {
    // all 4 signatures in one native minhash_sigs pass (codegen
    // subexpression elimination collapses the element_at projections);
    // shingle-less docs yield null slots → fall back to the fp hash
    val sigs = graft.functions.GraftFunctions.minhash_sigs(col("sh"), 4)
    def mh(j: Int) =
      coalesce(element_at(sigs, j + 1),
        conv(substring(md5(concat(col("fp"), lit(s"|$j"))), 1, 8), 16, 10)
          .cast("long"))
    docs.select(col("doc_id"),
        md5(col("text")).as("fp"),
        graft.functions.GraftFunctions.word_ngrams(col("text"), 3).as("sh"))
      .select(col("doc_id"), col("fp"),
        mh(0).as("mh0"), mh(1).as("mh1"), mh(2).as("mh2"), mh(3).as("mh3"))
  }
}
