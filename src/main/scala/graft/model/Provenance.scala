package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's provenance-wrapped wide format (SURVEY §1.1/§1.7): one
  * column per schema property, every cell a LIST of extraction records
  * `{data, extraction_method, confidence, extraction_time}` where `data`
  * is heterogeneous (string | array). Spark columns are homogeneous, so
  * `data` becomes the tagged variant struct (kind, data_str, data_arr) —
  * exactly the mapping table in SURVEY §1.7.
  *
  * The engine's native processing shape is the LONG format
  * (id, property, value, method, confidence, time); these converters give
  * format parity with the reference's fixtures at the boundary.
  */
object Provenance {

  val ValueStruct: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("data_str", StringType),
    StructField("data_arr", ArrayType(StringType))))

  val CellStruct: StructType = StructType(Seq(
    StructField("data", ValueStruct),
    StructField("extraction_method", StringType),
    StructField("confidence", DoubleType),
    StructField("extraction_time", StringType)))

  /** Long → wide: one row per id, one `array<CellStruct>` column per
    * property. Multi-valued properties fold into a single cell whose data
    * is the sorted value array (kind="list"); single values keep
    * kind="str". Deterministic output ordering throughout. */
  def longToWide(long: DataFrame, idCol: String, properties: Seq[String]): DataFrame = {
    val byProp = long
      .groupBy(col(idCol), col("property"), col("method"), col("confidence"),
        col("time"))
      .agg(sort_array(collect_list(col("value"))).as("vals"))
      .withColumn("cell", struct(
        when(size(col("vals")) === 1, struct(
          lit("str").as("kind"),
          element_at(col("vals"), 1).as("data_str"),
          lit(null).cast(ArrayType(StringType)).as("data_arr")))
          .otherwise(struct(
            lit("list").as("kind"),
            lit(null).cast(StringType).as("data_str"),
            col("vals").as("data_arr"))).as("data"),
        col("method").as("extraction_method"),
        col("confidence"),
        col("time").as("extraction_time")))
      .groupBy(col(idCol), col("property"))
      .agg(sort_array(collect_list(col("cell"))).as("cells"))
    properties.foldLeft(
      byProp.groupBy(col(idCol))
        .agg(map_from_entries(collect_list(struct(col("property"), col("cells"))))
          .as("__m"))) { (acc, p) =>
      acc.withColumn(p, coalesce(element_at(col("__m"), p),
        array().cast(ArrayType(CellStruct))))
    }.drop("__m")
  }

  /** Wide → long: explode every property column's cell list, unfolding the
    * tagged variant back to one row per (id, property, scalar value). */
  def wideToLong(wide: DataFrame, idCol: String, properties: Seq[String]): DataFrame =
    properties.map { p =>
      wide.select(col(idCol), explode_outer(col(s"`$p`")).as("cell"))
        .select(
          col(idCol),
          lit(p).as("property"),
          when(col("cell.data.kind") === "str", array(col("cell.data.data_str")))
            .otherwise(col("cell.data.data_arr")).as("vals"),
          col("cell.extraction_method").as("method"),
          col("cell.confidence").as("confidence"),
          col("cell.extraction_time").as("time"))
        .select(col(idCol), col("property"), explode(col("vals")).as("value"),
          col("method"), col("confidence"), col("time"))
    }.reduce(_ unionByName _)
      .filter(col("value").isNotNull)
}
