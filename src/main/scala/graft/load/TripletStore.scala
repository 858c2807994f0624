package graft.load

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporally versioned triple store — the Spark restatement of the
  * reference's Postgres history schema and its V1-V8 load operators
  * (`code/load/mlentory_load/core/GraphHandler.py:348-714`,
  * `init.sql`): an SCD-2 fact table of (triple, extraction-info) validity
  * ranges maintained by join-based MERGE, snapshotted to parquet versions
  * (no Delta in the offline jar set — SURVEY §7.3).
  *
  * Merge semantics per update batch at logical time `now`:
  *  - V1/V2 get-or-create: identity via md5 hashes computed with Spark
  *    built-ins (codegen'd), never collected to the driver.
  *  - V3 extend: an open range matched by an incoming (triple, info) gets
  *    `useEnd := max(useEnd, extractionTime)`.
  *  - V4 deprecate-changed: open ranges whose subject appears in the batch
  *    but whose (triple, info) does not → `deprecated := true, useEnd := now`
  *    (`GraphHandler.py:372-419`).
  *  - V6 delta emit: merge returns the new-triple and deprecated-triple
  *    sets for downstream graph sinks.
  *
  * Scale: one shuffle on tripletHash+infoHash (the MERGE join) and one on
  * subject (the deprecation semi-join); snapshot rewrite is a straight
  * columnar write. At 100 TB the ranges table would be partitioned by
  * a subject-hash bucket so the MERGE join co-partitions with incoming
  * batches; the join structure is unchanged.
  */
class TripletStore(spark: SparkSession, path: String) {

  import TripletStore._

  private val fs = new java.io.File(path)

  /** Only COMMITTED snapshots are visible (shared `_SUCCESS` gating —
    * see CommittedDirs); additionally, a non-empty store must carry the
    * current identity-format marker: the tripletHash formula changed once
    * (NUL-separated, null-coalesced fields), and silently merging into a
    * store keyed by the old formula would mis-extend/deprecate every
    * pre-existing range. Fail loudly instead. */
  private def versions: Seq[Int] = {
    val vs = CommittedDirs.list(fs, "v=")
    if (vs.nonEmpty) {
      val marker = new java.io.File(fs, FormatMarker)
      // compare the CONTENT, not mere existence — a future format bump
      // must also refuse stores carrying today's marker
      val recorded =
        if (marker.exists())
          java.nio.file.Files.readString(marker.toPath).trim
        else ""
      if (recorded != IdentityFormat.toString)
        throw new IllegalStateException(
          s"TripletStore at $path was written with identity-hash format " +
            s"'$recorded' (current: $IdentityFormat); replay its batches " +
            "into a fresh store to re-key it")
    }
    vs
  }

  def currentVersion: Int = versions.lastOption.getOrElse(-1)

  /** Full ranges table at the latest snapshot (empty schema-typed DF when
    * the store is new). */
  def ranges: DataFrame =
    if (currentVersion < 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rangeSchema)
    else spark.read.parquet(s"$path/v=$currentVersion")

  /** V8 current-graph scan: non-deprecated triples. */
  def currentTriples: DataFrame =
    ranges.filter(!col("deprecated"))
      .select("subject", "predicate", "obj", "objKind", "datatype")
      .distinct()

  /** As-of query over validity ranges (§7.1 query layer). */
  def asOf(t: Timestamp): DataFrame =
    ranges.filter(col("useStart") <= lit(t) &&
        (lit(t) <= col("useEnd") || !col("deprecated")))
      .select("subject", "predicate", "obj", "objKind", "datatype")
      .distinct()

  /** A9 sanity count: distinct current subjects. */
  def distinctSubjectCount: Long =
    currentTriples.select("subject").distinct().count()

  /** MERGE one extraction batch.
    *
    * @param incoming columns: subject, predicate, obj, objKind, datatype,
    *                 extractionMethod, confidence, extractionTime
    * @param now      logical load time used for deprecation stamps
    */
  def merge(incoming: DataFrame, now: Timestamp): MergeStats = {
    // Checkpointed once: the batch is scanned a single time even though it
    // feeds both the MERGE join and the touched-subjects semi-join.
    val inc = withIdentity(incoming)
      .groupBy("tripletHash", "infoHash")
      .agg(
        first("subject").as("subject"), first("predicate").as("predicate"),
        first("obj").as("obj"), first("objKind").as("objKind"),
        first("datatype").as("datatype"),
        first("extractionMethod").as("extractionMethod"),
        first("confidence").as("confidence"),
        max("extractionTime").as("extractionTime"))
      .localCheckpoint()

    val cur = ranges
    val open = cur.filter(!col("deprecated"))
    val closed = cur.filter(col("deprecated"))

    // The MERGE join executes exactly ONCE (eager checkpoint); extended /
    // fresh / deprecation / stats / snapshot below all read the
    // materialized result instead of re-running the join lineage — at
    // 100 TB the previous shape re-scanned the ranges table 4x per batch.
    val j = open.as("o").join(inc.as("i"),
      col("o.tripletHash") === col("i.tripletHash") &&
        col("o.infoHash") === col("i.infoHash"), "full_outer")
      .localCheckpoint()

    val extended = j.filter(col("o.tripletHash").isNotNull && col("i.tripletHash").isNotNull)
      .select(
        col("o.tripletHash").as("tripletHash"), col("o.subject").as("subject"),
        col("o.predicate").as("predicate"), col("o.obj").as("obj"),
        col("o.objKind").as("objKind"), col("o.datatype").as("datatype"),
        col("o.infoHash").as("infoHash"),
        col("o.extractionMethod").as("extractionMethod"),
        col("o.confidence").as("confidence"), col("o.useStart").as("useStart"),
        greatest(col("o.useEnd"), col("i.extractionTime")).as("useEnd"),
        lit(false).as("deprecated"))

    val fresh = j.filter(col("o.tripletHash").isNull)
      .select(
        col("i.tripletHash").as("tripletHash"), col("i.subject").as("subject"),
        col("i.predicate").as("predicate"), col("i.obj").as("obj"),
        col("i.objKind").as("objKind"), col("i.datatype").as("datatype"),
        col("i.infoHash").as("infoHash"),
        col("i.extractionMethod").as("extractionMethod"),
        col("i.confidence").as("confidence"),
        col("i.extractionTime").as("useStart"),
        col("i.extractionTime").as("useEnd"), lit(false).as("deprecated"))

    val touchedSubjects = inc.select("subject").distinct()
    val openUnmatched = j.filter(col("i.tripletHash").isNull)
      .select(col("o.*"))
    val toDeprecate = openUnmatched.join(touchedSubjects, Seq("subject"), "left_semi")
      .withColumn("deprecated", lit(true))
      .withColumn("useEnd", lit(now))
      .select(rangeCols: _*)
    val untouched = openUnmatched
      .join(touchedSubjects, Seq("subject"), "left_anti")
      .select(rangeCols: _*)

    val next = extended.select(rangeCols: _*)
      .unionByName(fresh.select(rangeCols: _*))
      .unionByName(toDeprecate)
      .unionByName(untouched)
      .unionByName(closed.select(rangeCols: _*))

    // One stats job over the checkpointed join instead of three counts
    // that each re-ran the full merge lineage.
    val kinds = fresh.select(lit("new").as("k"))
      .unionByName(extended.select(lit("extended").as("k")))
      .unionByName(toDeprecate.select(lit("deprecated").as("k")))
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = MergeStats(
      nNew = kinds.getOrElse("new", 0L),
      nExtended = kinds.getOrElse("extended", 0L),
      nDeprecated = kinds.getOrElse("deprecated", 0L))

    val v = currentVersion + 1
    // marker BEFORE the snapshot commit: written after, a crash between
    // the two would brick a correctly-keyed store (the format check only
    // fires once a committed snapshot exists, so the early write is safe)
    fs.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(fs, FormatMarker).toPath, IdentityFormat.toString)
    next.write.mode(SaveMode.Overwrite).parquet(s"$path/v=$v")
    stats
  }

  /** Snapshot GC: drop all but the newest `keep` versions (time travel /
    * delta queries only reach back that far afterwards). The latest
    * snapshot is never touched, so readers of `ranges` are unaffected. */
  def compact(keep: Int = 2): Seq[Int] = {
    val drop = versions.dropRight(math.max(1, keep))
    drop.foreach { v =>
      val d = new java.io.File(s"$path/v=$v")
      Option(d.listFiles()).foreach(_.foreach(_.delete()))
      d.delete()
    }
    drop
  }

  /** V6 delta: triples in version b but not a (new) / in a but not b
    * (retired). Pure anti-joins over snapshots. */
  def delta(fromV: Int, toV: Int): (DataFrame, DataFrame) = {
    def tri(v: Int): DataFrame =
      spark.read.parquet(s"$path/v=$v").filter(!col("deprecated"))
        .select("subject", "predicate", "obj").distinct()
    val a = tri(fromV); val b = tri(toV)
    (b.join(a, Seq("subject", "predicate", "obj"), "left_anti"),
      a.join(b, Seq("subject", "predicate", "obj"), "left_anti"))
  }
}

object TripletStore {

  import org.apache.spark.sql.types._

  final case class MergeStats(nNew: Long, nExtended: Long, nDeprecated: Long)

  /** Identity-hash format generation (bumped when withIdentity changes). */
  val IdentityFormat = 2
  val FormatMarker = "_FORMAT"

  val rangeSchema: StructType = StructType(Seq(
    StructField("tripletHash", StringType), StructField("subject", StringType),
    StructField("predicate", StringType), StructField("obj", StringType),
    StructField("objKind", StringType), StructField("datatype", StringType),
    StructField("infoHash", StringType),
    StructField("extractionMethod", StringType),
    StructField("confidence", DoubleType),
    StructField("useStart", TimestampType), StructField("useEnd", TimestampType),
    StructField("deprecated", BooleanType)))

  private val rangeCols = rangeSchema.fieldNames.toSeq.map(col)

  /** Null-safe field form for identity hashing: `concat_ws` SKIPS null
    * fields, so without coalescing, a null shifts later fields left and
    * two different triples can concatenate identically. The marker keeps
    * null distinct from "" and from any real term. */
  private def idField(c: org.apache.spark.sql.Column) =
    coalesce(c.cast("string"), lit("\u0001<null>"))

  /** Identity hashes computed with codegen'd built-ins: tripletHash =
    * md5 over the 5 triple fields joined with an explicit `\u0000` field
    * separator and null-coalesced fields — delimiter-safe like the
    * reference's md5-of-n3 (`GraphHandler.py:479-483`), kept in pure
    * column form; infoHash = md5(method + confidence rounded to 5 dp)
    * (`GraphHandler.py:548-633`). */
  def withIdentity(df: DataFrame): DataFrame =
    df.withColumn("tripletHash", md5(concat_ws("\u0000",
        idField(col("subject")), idField(col("predicate")),
        idField(col("obj")), idField(col("objKind")),
        idField(col("datatype")))))
      .withColumn("infoHash", md5(concat(col("extractionMethod"),
        format_string("%.5f", col("confidence")))))
}
