package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Sq8

/** SQ8 storage-compression probe: materialize the same embedding corpus
  * as (a) raw array<double>, (b) array<int> codes, and (c) the packed
  * 1-byte-per-dim BINARY form, and print the on-disk parquet bytes of
  * each — the measured version of the "8× smaller searchable state"
  * claim in [[graft.similarity.Sq8]]. Also times an asymmetric top-k
  * scored from the packed form vs the raw form. Run:
  *
  *   sbt "Test/runMain graft.Sq8SizeProbe"
  *
  * Measured numbers are recorded in SCALE.md. The corpus is the sf0.1
  * embeddings table replicated 20× (100k vectors) so file sizes dwarf
  * parquet footer overhead.
  */
object Sq8SizeProbe {

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val reps = 20
    val corpus = (0 until reps).map(r =>
        base.withColumn("vec_id", col("vec_id") + lit(r.toLong * 1000000)))
      .reduce(_ union _)
      .repartition(32)
      .localCheckpoint()
    val n = corpus.count()
    val m = Sq8.fit(corpus, "v")

    val scratch = java.nio.file.Files.createTempDirectory("sq8probe").toFile
    def write(name: String)(df: org.apache.spark.sql.DataFrame): Long = {
      val p = new java.io.File(scratch, name)
      df.write.mode("overwrite").parquet(p.getAbsolutePath)
      dirBytes(p)
    }
    val rawB = write("raw")(corpus)
    val codesB = write("codes")(
      corpus.select(col("vec_id"), Sq8.encode(m)(col("v")).as("cs")))
    val packedB = write("packed")(
      corpus.select(col("vec_id"), Sq8.encodePacked(m)(col("v")).as("blob")))
    println(f"n=$n raw=${rawB / 1e6}%.1f MB codes=${codesB / 1e6}%.1f MB " +
      f"packed=${packedB / 1e6}%.1f MB raw/packed=${rawB.toDouble / packedB}%.1fx")

    // asymmetric top-k wall time: raw corpus vs packed-then-decoded corpus
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val dot = graft.functions.GraftFunctions.dot_double _
    val packed = spark.read.parquet(new java.io.File(scratch, "packed").getAbsolutePath)
      .localCheckpoint()
    val q = base.filter(col("vec_id") < 8)
      .select(col("v").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    def topk(c: org.apache.spark.sql.DataFrame): Unit = {
      c.join(broadcast(q))
        .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * sqrt(dot(col("cv"), col("cv")))))
        .orderBy(col("cos").desc).limit(5).count()
    }
    val tRaw = timed(topk(corpus.select(col("vec_id"), col("v").as("cv"))))
    val tPacked = timed(topk(packed.select(col("vec_id"),
      Sq8.decode(m)(Sq8.unpack(col("blob"))).as("cv"))))
    println(f"topk_raw=$tRaw%.2f s topk_packed=$tPacked%.2f s")

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(scratch)
    spark.stop()
  }
}
