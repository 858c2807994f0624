package graft.transform

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Triple
import graft.text.JsonLd

/** T2 dataset builder: croissant JSON-LD column → triple table via the
  * subset expander + blank-node surgery, one flatMap per document
  * (`GraphBuilderCroissant.py:30-100`). Input schema:
  * (datasetId, croissant_json) + provenance columns.
  */
object CroissantBuilder {

  val Base = "https://w3id.org/mlentory/mlentory_graph/"

  def build(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val triples: Dataset[Triple] =
      df.select(col("datasetId"), col("croissant_json"))
        .as[(String, String)]
        .flatMap { case (id, json) =>
          try JsonLd.croissantSurgery(JsonLd.expand(json), id, Base)
          catch { case _: Exception => Seq.empty } // malformed payloads drop
        }
    triples.toDF()
      .dropDuplicates("subject", "predicate", "obj")
  }
}
