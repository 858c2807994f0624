package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.model.{N3, ObjKind, Triple}

/** File sinks (K1-K3, SURVEY §2.2): TSV dump, JSON records, and N-Triples
  * serialization. All distributed writers — formatting happens per
  * partition, never on the driver. External-system sinks (Postgres /
  * Virtuoso / ES, K4-K7) are replaced by the engine-owned parquet store
  * (graft.load.TripletStore) + the doc-pivot/search queries.
  */
object Sinks {

  /** K1 raw TSV dump (`HFExtractor.py:321-325`). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** K2 JSON records dump (`HFExtractor.py:327-331`). */
  def writeJsonRecords(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Layout-aware parquet writer — the shape every TB-scale table in this
    * engine should land in:
    *
    *  - `repartitionByRange(sortCols)` clusters rows so each output file
    *    covers a narrow key range → min/max footer stats make downstream
    *    range/point predicates prune whole files (the poor man's z-order
    *    for a single key family);
    *  - `sortWithinPartitions` makes rows inside each file ordered →
    *    page-level predicate pushdown and better encodings (RLE/delta on
    *    sorted columns routinely halve file size);
    *  - `maxRecordsPerFile` bounds file size independently of partition
    *    count, so one skewed range cannot emit a 50 GB file that a single
    *    downstream task then has to read (AQE rebalances the write-side
    *    partitions; this caps the files themselves).
    *
    * `nFiles` sizes the range partitioning (at scale: total bytes /
    * target file size); ordering columns double as the cluster key.
    */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
                     maxRecordsPerFile: Long, sortCols: String*): Unit =
    writeClusteredOpts(df, path, nFiles, maxRecordsPerFile, Map.empty,
      sortCols: _*)

  /** [[writeClustered]] with extra per-write parquet options — e.g.
    * `parquet.bloom.filter.enabled#<col> -> true` to emit a column
    * bloom filter per row group: point-in-set predicates (`In`/`=`)
    * then skip row groups whose min/max RANGE overlaps the probe but
    * whose value SET does not — the case sorted-file footer stats
    * cannot prune (a wide-range row group at a sort boundary, or an
    * unsorted legacy file). */
  def writeClusteredOpts(df: DataFrame, path: String, nFiles: Int,
                         maxRecordsPerFile: Long,
                         options: Map[String, String],
                         sortCols: String*): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .options(options)
      .parquet(path)
  }

  /** [[writeClustered]] with a hive-style partition column in front:
    * `partitionCol` becomes `path/<partitionCol>=<value>/` dirs (and is
    * dropped from the data files), so downstream readers filtering on it
    * get planning-time PartitionFilters — whole files pruned, not rows.
    * The range partitioning leads with the partition column, keeping the
    * per-task partition-value fan-out (and thus the file count) bounded:
    * each write task covers a contiguous (partitionCol, sortCols) range. */
  def writeClusteredBy(df: DataFrame, path: String, nFiles: Int,
                       maxRecordsPerFile: Long, partitionCol: String,
                       sortCols: String*): Unit =
    writeClusteredByOpts(df, path, nFiles, maxRecordsPerFile, Map.empty,
      partitionCol, sortCols: _*)

  /** [[writeClusteredBy]] with extra per-write parquet options (see
    * [[writeClusteredOpts]]). */
  def writeClusteredByOpts(df: DataFrame, path: String, nFiles: Int,
                           maxRecordsPerFile: Long,
                           options: Map[String, String],
                           partitionCol: String,
                           sortCols: String*): Unit = {
    val cols = (partitionCol +: sortCols).map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .options(options)
      .partitionBy(partitionCol)
      .parquet(path)
  }

  private def ntLines(triples: DataFrame) = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples
      .select("subject", "predicate", "obj", "objKind", "datatype")
      .as[Triple]
      .map(N3.formatTriple)
  }

  /** K3 N-Triples serialization (`MlentoryTransform.py:145-155`): each
    * triple row formatted via the pure N3 layer. */
  def writeNTriples(triples: DataFrame, path: String): Unit =
    ntLines(triples).write.mode(SaveMode.Overwrite).text(path)

  /** K5 Virtuoso bulk-load staging (`dbHandler/RDFHandler.py:60-111`):
    * the reference serializes the graph to ONE file, moves it into the
    * loader's watched directory, registers `(dir, pattern, graph)` with
    * `ld_dir` and runs `rdf_loader_run(); checkpoint;` through isql —
    * the database then bulk-loads the staged files itself.
    *
    * Spark restatement: the staging IS the data-path work, so the
    * engine writes the watched directory directly and distributed —
    * chunked `.nt` part files (`maxTriplesPerFile` bounds each chunk so
    * the loader's parallel workers balance instead of one worker eating
    * one giant file), a `<file>.graph` sidecar per chunk naming the
    * target graph (the bulk loader's public per-file graph convention),
    * a `manifest.tsv` (file → graph), and `loader.sql` carrying exactly
    * the registration the reference executes. The isql invocation stays
    * external by design — the reference, too, only reaches it via
    * `docker exec`. Driver-side staging ops are O(output files) =
    * O(triples / maxTriplesPerFile), never O(triples).
    *
    * `loaderDir`: the staged directory's path AS SEEN BY the database
    * process (the reference registers the container-internal path);
    * defaults to `path`. Returns the staged chunk file names.
    */
  def writeBulkLoadDir(triples: DataFrame, path: String, graphIri: String,
                       maxTriplesPerFile: Long = 1000000L,
                       loaderDir: String = ""): Seq[String] = {
    require(graphIri.nonEmpty &&
      !graphIri.exists(c => c.isWhitespace || c == '\'' || c == '<' || c == '>'),
      s"graph IRI unsafe for a loader registration: '$graphIri'")
    val spark = triples.sparkSession
    ntLines(triples)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxTriplesPerFile)
      .text(path)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val staged = parts.zipWithIndex.map { case (p, i) =>
      val name = f"chunk-$i%05d.nt"
      fs.rename(p, new org.apache.hadoop.fs.Path(dir, name))
      writeString(fs, new org.apache.hadoop.fs.Path(dir, name + ".graph"),
        graphIri)
      name
    }.toSeq
    writeString(fs, new org.apache.hadoop.fs.Path(dir, "manifest.tsv"),
      staged.map(n => s"$n\t$graphIri").mkString("", "\n", "\n"))
    val regDir = if (loaderDir.isEmpty) path else loaderDir
    writeString(fs, new org.apache.hadoop.fs.Path(dir, "loader.sql"),
      s"""DELETE FROM DB.DBA.LOAD_LIST;
         |ld_dir('$regDir', '*.nt', '$graphIri');
         |DB.DBA.rdf_loader_run();
         |checkpoint;
         |""".stripMargin)
    staged
  }

  private def writeString(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Parse N-Triples text back to a triple table (load-from-file mode,
    * `run_extract_transform_load.py:423-452`). Handles the subset K3
    * emits: IRIs, plain + typed literals. */
  def readNTriples(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val Line =
      "^<([^>]*)> <([^>]*)> (.*) \\.\\s*$".r
    val TypedLit = "^\"(.*)\"\\^\\^<([^>]*)>$".r
    val PlainLit = "^\"(.*)\"$".r
    val Iri = "^<([^>]*)>$".r
    spark.read.textFile(path)
      .flatMap {
        case Line(s, p, o) =>
          o match {
            case Iri(u) => Some(Triple(s, p, u, ObjKind.Iri, ""))
            case TypedLit(v, dt) => Some(Triple(s, p, unescape(v), ObjKind.Literal, dt))
            case PlainLit(v) => Some(Triple(s, p, unescape(v), ObjKind.Literal, ""))
            case _ => None
          }
        case _ => None
      }
      .toDF()
  }

  private def unescape(s: String): String = N3.unescapeLiteral(s)
}
