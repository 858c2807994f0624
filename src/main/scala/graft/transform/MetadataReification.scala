package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reified statement-metadata graph, both directions (V7 ingest
  * `GraphHandlerForKG.py:117-215`; emit `GraphBuilderBase.py:103-180`):
  *
  * The reference serializes per-statement provenance as reified nodes:
  *   _:m <meta:subject> s; <meta:predicate> p; <meta:object> o;
  *   <meta:extractionMethod> m; <meta:confidence> c; <meta:extractionTime> t.
  *
  * `emit` produces that triple form from the flat StatementMeta table (the
  * node id is a deterministic hash of the statement + method — no counter
  * state, so it distributes); `ingest` pivots it back with one
  * groupBy(node) + map_from_entries — the Spark restatement of the
  * reference's 50k-row batched dict pivot.
  */
object MetadataReification {

  val MetaNs = "https://w3id.org/mlentory/meta/"

  private val fields = Seq("subject", "predicate", "object",
    "extractionMethod", "confidence", "extractionTime")

  /** StatementMeta table → reified triple rows. */
  def emit(meta: DataFrame): DataFrame = {
    val node = concat(lit("_:m"), md5(concat_ws("\u0000",
      coalesce(col("subject").cast("string"), lit("\u0001<null>")),
      coalesce(col("predicate").cast("string"), lit("\u0001<null>")),
      coalesce(col("obj").cast("string"), lit("\u0001<null>")),
      coalesce(col("extractionMethod").cast("string"), lit("\u0001<null>")),
      coalesce(col("extractionTime").cast("string"), lit("\u0001<null>")))))
    val pairs = array(
      struct(lit(MetaNs + "subject").as("p"), col("subject").cast("string").as("o")),
      struct(lit(MetaNs + "predicate").as("p"), col("predicate").cast("string").as("o")),
      struct(lit(MetaNs + "object").as("p"), col("obj").cast("string").as("o")),
      struct(lit(MetaNs + "extractionMethod").as("p"),
        col("extractionMethod").cast("string").as("o")),
      struct(lit(MetaNs + "confidence").as("p"),
        format_string("%.5f", col("confidence")).as("o")),
      struct(lit(MetaNs + "extractionTime").as("p"),
        date_format(col("extractionTime"), "yyyy-MM-dd_HH-mm-ss").as("o")))
    meta.select(node.as("subject0"), explode(pairs).as("t"))
      .select(col("subject0").as("subject"), col("t.p").as("predicate"),
        col("t.o").as("obj"), lit("literal").as("objKind"),
        lit("").as("datatype"))
  }

  /** Reified triple rows → StatementMeta table (V7 pivot). Timestamps use
    * the reference's "yyyy-MM-dd_HH-mm-ss" wire format. */
  def ingest(reified: DataFrame): DataFrame = {
    val m = reified
      .filter(col("predicate").startsWith(MetaNs))
      .groupBy(col("subject").as("node"))
      .agg(map_from_entries(collect_list(struct(
        col("predicate"), col("obj")))).as("m"))
    m.select(
      element_at(col("m"), MetaNs + "subject").as("subject"),
      element_at(col("m"), MetaNs + "predicate").as("predicate"),
      element_at(col("m"), MetaNs + "object").as("obj"),
      element_at(col("m"), MetaNs + "extractionMethod").as("extractionMethod"),
      element_at(col("m"), MetaNs + "confidence").cast("double").as("confidence"),
      to_timestamp(element_at(col("m"), MetaNs + "extractionTime"),
        "yyyy-MM-dd_HH-mm-ss").as("extractionTime"))
      .filter(col("subject").isNotNull)
  }
}
