package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Bfs
import graft.sinks.Sinks
import graft.sources.ConfigSources

class IoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TSV vocab roundtrip (S10/K1)") {
    val dir = Files.createTempDirectory("tsv").toString + "/vocab"
    val df = Seq(("en", "english"), ("zh", "chinese"), ("de", "german"))
      .toDF("tag_name", "description")
    Sinks.writeTsv(df, dir)
    val back = ConfigSources.readTsv(spark, dir)
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("tag_name", "description"))
    assert(ConfigSources.vocab(spark, dir) == Seq("de", "en", "zh"))
  }

  test("JSON records sink (K2)") {
    val dir = Files.createTempDirectory("json").toString + "/recs"
    Sinks.writeJsonRecords(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.filter($"id" === 1).select("v").as[String].head() == "a")
  }

  test("N-Triples write/read roundtrip incl. escaping and datatypes (K3)") {
    val dir = Files.createTempDirectory("nt").toString + "/graph"
    val tri = Seq(
      ("http://s1", "http://p", "http://o", "iri", ""),
      ("http://s1", "http://p2", "multi\nline \"quoted\"", "literal", ""),
      ("http://s2", "http://p3", "2024-01-01", "literal",
        "http://www.w3.org/2001/XMLSchema#date"))
      .toDF("subject", "predicate", "obj", "objKind", "datatype")
    Sinks.writeNTriples(tri, dir)
    val back = Sinks.readNTriples(spark, dir)
    assert(back.count() == 3)
    val lit = back.filter($"predicate" === "http://p2").select("obj").as[String].head()
    assert(lit == "multi\nline \"quoted\"")
    val typed = back.filter($"predicate" === "http://p3")
    assert(typed.select("datatype").as[String].head().endsWith("#date"))
  }

  test("bulk-load staging dir: chunked .nt, .graph sidecars, manifest (K5)") {
    val dir = Files.createTempDirectory("bulk").toString + "/stage"
    val graph = "https://example.org/graph/main"
    val tri = (1 to 10).map(i =>
        (s"http://s$i", "http://p", s"v$i", "literal", ""))
      .toDF("subject", "predicate", "obj", "objKind", "datatype")
    val staged = Sinks.writeBulkLoadDir(tri.repartition(2), dir, graph,
      maxTriplesPerFile = 3L)

    val f = new java.io.File(dir)
    val ntFiles = f.listFiles().filter(_.getName.endsWith(".nt")).sortBy(_.getName)
    assert(staged.sorted == ntFiles.map(_.getName).toSeq.sorted)
    // maxTriplesPerFile bounds every chunk; all 10 triples land
    val perFile = ntFiles.map(n =>
      scala.io.Source.fromFile(n).getLines().count(_.nonEmpty))
    assert(perFile.forall(_ <= 3) && perFile.sum == 10, perFile.mkString(","))
    // every chunk has a sidecar naming the target graph (the loader's
    // per-file graph convention)
    ntFiles.foreach { n =>
      val sidecar = new java.io.File(dir, n.getName + ".graph")
      assert(sidecar.isFile)
      assert(scala.io.Source.fromFile(sidecar).mkString == graph)
    }
    // manifest covers exactly the staged chunks; loader.sql registers
    // the directory + pattern + graph like the reference's isql call
    val manifest = scala.io.Source.fromFile(new java.io.File(dir, "manifest.tsv"))
      .getLines().toSeq
    assert(manifest == staged.map(n => s"$n\t$graph"))
    val sql = scala.io.Source.fromFile(new java.io.File(dir, "loader.sql")).mkString
    assert(sql.contains(s"ld_dir('$dir', '*.nt', '$graph')"))
    assert(sql.contains("rdf_loader_run") && sql.contains("checkpoint"))
    // the staged chunks are still valid N-Triples: read back through K3
    assert(Sinks.readNTriples(spark, dir + "/*.nt").count() == 10)
    // an unsafe graph IRI is refused, not splice-quoted into loader.sql
    intercept[IllegalArgumentException](
      Sinks.writeBulkLoadDir(tri, dir + "2", "bad graph'iri"))
  }

  test("clustered writer: bounded files, sorted inside, disjoint key ranges") {
    val dir = Files.createTempDirectory("clustered").toString + "/li"
    val li = graft.Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_quantity")
    val total = li.count()
    Sinks.writeClustered(li, dir, nFiles = 4, maxRecordsPerFile = 1000L,
      "l_shipdate")

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    // maxRecordsPerFile bounds every file regardless of range skew
    assert(files.length >= (total / 1000).toInt, files.length.toString)
    val perFile = files.map { f =>
      val rows = spark.read.parquet(f).select("l_shipdate")
        .collect() // timestamp_ntz surfaces as LocalDateTime
        .map(_.getAs[java.time.LocalDateTime](0)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      assert(rows.nonEmpty, s"$f is an empty file")
      assert(rows.length <= 1000, s"$f has ${rows.length} rows")
      // sorted inside the file (page-level stats + encodings depend on it)
      assert(rows.zip(rows.tail).forall { case (a, b) => a <= b }, f)
      (rows.min, rows.max)
    }
    // files cover disjoint key ranges (footer min/max prunes whole files):
    // sorted by min, each file ends before-or-where the next begins
    val byMin = perFile.sortBy(_._1)
    byMin.zip(byMin.tail).foreach { case ((_, aMax), (bMin, _)) =>
      assert(aMax <= bMin, s"overlapping file ranges: $aMax > $bMin")
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(dir).count() == total)
  }

  test("dotted-path projection (S7/S9)") {
    val df = spark.read.json(Seq(
      """{"run": {"id": 7, "flow": {"name": "f1"}}, "score": 0.9}""").toDS())
    val out = ConfigSources.dottedPaths(df,
      Map("run_id" -> "run.id", "flow_name" -> "run.flow.name"))
    assert(out.select("run_id").as[Long].head() == 7L)
    assert(out.select("flow_name").as[String].head() == "f1")
  }

  test("BFS frontier expansion with depth tracking (A11)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = Bfs.expand(edges, seeds, depth = 2)
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 2))
    // depth 3 reaches node 4; disconnected 9/10 never reached
    val out3 = Bfs.expand(edges, seeds, depth = 3).as[(Long, Int)].collect().toMap
    assert(out3(4L) == 3 && !out3.contains(10L))
    // the sort-merge fallback (huge-frontier path) produces the same result
    val smj = Bfs.expand(edges, seeds, depth = 3, broadcastFrontierRows = 0L)
      .as[(Long, Int)].collect().toMap
    assert(smj == out3)
  }
}
