package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven attribute mapping (S7/S9 — the OpenML/AI4Life extraction
  * schemas, `data/configuration/openml/extract/metadata_schema.json` and
  * `ai4life/extract/model_mapping.tsv`; applied at
  * `OpenMLExtractor.py:420-546`, `AI4LifeExtractor.py:142-243`):
  * each target property is produced by one of three rule kinds over the
  * nested source record:
  *
  *  - Path("run.flow_name")             → dotted struct access
  *  - Format("Run_{run.id}")            → literal template with {path} holes
  *  - Concat(Seq("a.b", "c.d"))         → array of the listed paths' values
  *
  * All three compile to Column expressions — the whole mapping is one
  * codegen'd projection, regardless of config size.
  */
object SchemaMapping {

  sealed trait Rule
  final case class Path(path: String) extends Rule
  final case class Format(template: String) extends Rule
  final case class Concat(paths: Seq[String]) extends Rule

  private val Hole = "\\{([^}]+)\\}".r

  def compile(rule: Rule): Column = rule match {
    case Path(p) => col(p).cast("string")
    case Concat(ps) => array(ps.map(p => col(p).cast("string")): _*)
    case Format(t) =>
      // split the template into literal runs and {path} holes
      val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
      var last = 0
      Hole.findAllMatchIn(t).foreach { m =>
        if (m.start > last) parts += lit(t.substring(last, m.start))
        parts += col(m.group(1)).cast("string")
        last = m.end
      }
      if (last < t.length) parts += lit(t.substring(last))
      if (parts.isEmpty) lit(t) else concat(parts.toSeq: _*)
  }

  /** Apply a property → rule mapping as one projection, keeping `keep`
    * passthrough columns. */
  def apply(df: DataFrame, mapping: Seq[(String, Rule)],
            keep: Seq[String] = Seq.empty): DataFrame =
    df.select(keep.map(col) ++
      mapping.map { case (name, rule) => compile(rule).as(name) }: _*)
}
