package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decides SURVEY §7.3's open question: should `Markdown.hierarchical`
  * be promoted from a typed flatMap to a codegen'd Catalyst Expression?
  *
  * A native `markdown_sections` Expression would still execute the SAME
  * JVM parser per row (`doGenCode` can only call into it — a string
  * parser does not fuse into generated code); what it could save is the
  * evaluation boundary: the typed path's Encoder ser/de, or the ScalaUDF
  * path's converter overhead, and the WholeStageCodegen break around the
  * call. So the probe measures, on a 100x card corpus (sf0.1 documents
  * replicated with the q_context_match card shape):
  *
  *  - `flatmap`: the production shape — typed Dataset flatMap over
  *    (id, card), parse, count sections,
  *  - `udf`: the same parse behind a ScalaUDF (what swapping the seam
  *    buys/costs at the boundary a native Expression would also sit on),
  *  - `baseline`: an identical scan + aggregate with a trivial
  *    `length(card)` instead of the parse — the no-parse floor.
  *
  * parse share = (udf - baseline) / udf. If the parse dominates and the
  * flatmap/udf delta is within noise, NO boundary change (Expression
  * included) can repay its complexity; the lever for a production hot
  * loop would be the parser itself, not the seam. Measured numbers and
  * the decision are recorded in SCALE.md §Sectionizer.
  *
  *   sbt "Test/runMain graft.SectionizerProbe [mult]"
  */
object SectionizerProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"
    val mult = args.headOption.map(_.toInt).getOrElse(100)

    // q_context_match's card shape over a replicated documents corpus;
    // materialized once so every arm reads the same parquet bytes
    val docs = Tables(spark, src, "documents")
    val reps = spark.range(mult).select(col("id").as("rep"))
    val card = concat(
      lit("# Language\nThe document language code is "), col("lang"), lit(" .\n"),
      lit("# Origin\nHarvested from the "), col("source"), lit(" source pipeline .\n"),
      lit("# Body\nExcerpt : "),
      regexp_replace(substring(col("text"), 1, 160), "[^a-zA-Z0-9 ]", " "))
    val out = load.Scratch.dir("probe_sec", src)
    try {
      // repartition(32): a crossJoin of a small table writes a couple of
      // fat row groups, and an unsplittable row group serializes the whole
      // probe onto one task — the first probe run measured exactly that
      // (42.8 s ≈ 500k × 77 µs single-threaded)
      docs.crossJoin(reps)
        .select(concat(lit("doc:"), col("doc_id") + col("rep") * 10000000L)
          .as("modelId"), card.as("card"))
        .repartition(32)
        .write.mode("overwrite").parquet(out.getAbsolutePath)
      val models = spark.read.parquet(out.getAbsolutePath)
      val n = models.count()
      println(s"[sectionizer] $n cards (${mult}x sf0.1 documents)")

      def bestOf2(name: String)(run: => Long): Unit = {
        def once(): Double = {
          val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
        }
        val t = math.min(once(), once())
        println(f"[sectionizer] $name%-10s $t%6.2f s")
      }

      bestOf2("baseline") {
        models.select(sum(length(col("card")))).head().getLong(0)
      }
      val secCountUdf = udf((c: String) =>
        text.Markdown.hierarchical(Option(c).getOrElse("")).length)
      bestOf2("udf") {
        models.select(sum(secCountUdf(col("card")))).head().getLong(0)
      }
      bestOf2("flatmap") {
        models.select(col("modelId"), col("card")).as[(String, String)]
          .map { case (_, c) =>
            text.Markdown.hierarchical(Option(c).getOrElse("")).length.toLong
          }.reduce(_ + _)
      }
    } finally load.Scratch.rm(out)
    spark.stop()
  }
}
