package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import graft.text.{FrontMatter, Markdown, TextUtil}

/** UDF surface for the pure-Scala text library (§2.13): the markdown
  * sectionizer family (M1-M6), YAML front-matter (Y1), and the scalar
  * helpers, exposed as Columns so SQL/DataFrame pipelines can call the
  * parsers without dropping to Datasets. The hot paths (n3_escape,
  * simhash64) have native codegen'd Expressions in GraftExpressions; these
  * parser UDFs are cold-path (run once per document).
  */
object TextFunctions {

  /** M1: array<struct<title,content,level>> of header sections. */
  val markdownSections = udf { card: String =>
    Markdown.sections(Option(card).getOrElse(""))
      .map(s => (s.title, s.content, s.level))
  }

  /** M6: hierarchical sections (headers ∪ paragraphs, deduped). */
  val markdownHierarchical = udf { card: String =>
    Markdown.hierarchical(Option(card).getOrElse(""))
      .map(s => (s.title, s.content, s.level))
  }

  /** M5: fixed-size character chunks. */
  val chunkText = udf { (text: String, maxLen: Int) =>
    Markdown.chunk(Option(text).getOrElse(""), math.max(1, maxLen))
  }

  /** Y1: resolved license from YAML front-matter. */
  val frontMatterLicense = udf { card: String =>
    FrontMatter.license(FrontMatter.parse(Option(card).getOrElse(""))).orNull
  }

  /** Y1: gated-access conditions from front-matter. */
  val frontMatterGated = udf { card: String =>
    FrontMatter.conditionsOfAccess(
      FrontMatter.parse(Option(card).getOrElse(""))).orNull
  }

  /** K/M/B suffixed count parse → long (null when unparseable). */
  val parseKmb = udf { s: String =>
    TextUtil.parseKmb(Option(s).getOrElse("")).map(Long.box).orNull
  }

  /** Register all parser UDFs for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("markdown_sections", markdownSections)
    spark.udf.register("markdown_hierarchical", markdownHierarchical)
    spark.udf.register("chunk_text", chunkText)
    spark.udf.register("front_matter_license", frontMatterLicense)
    spark.udf.register("front_matter_gated", frontMatterGated)
    spark.udf.register("parse_kmb", parseKmb)
  }
}
