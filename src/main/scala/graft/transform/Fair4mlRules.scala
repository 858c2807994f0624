package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's quirky-but-observable T1 object-generation rules
  * (SURVEY §7.4 risk 2), encoded table-driven so each branch is testable:
  *
  *  - J2 range lookup: the 45-row FAIR4ML schema is probed by SUBSTRING
  *    CONTAINMENT of the row's Property in the predicate — not equality —
  *    and the FIRST match in file order wins
  *    (`GraphBuilderFAIR4ML.py:292-307`).
  *  - Dataset objects: a value under 100 chars is a dataset NAME (emit
  *    name + platform URL); 100+ chars is a DESCRIPTION (emit description
  *    + name truncated to 50 chars + "...")
  *    (`GraphBuilderFAIR4ML.py:428-458`).
  *  - DefinedTerm skip rules: HF tags containing ':' or of length <= 2 are
  *    dropped; surviving terms get a lowercased hash identity
  *    (`GraphBuilderFAIR4ML.py:604-607`).
  *  - License objects: an http(s) value is an IRI reference; anything else
  *    is a CreativeWork literal (`GraphBuilderFAIR4ML.py:632-644`).
  */
object Fair4mlRules {

  /** One schema row: (property fragment, range). Order = file order. */
  final case class RangeRule(propertyFragment: String, range: String)

  /** J2: first rule (in file order) whose fragment is CONTAINED IN the
    * predicate. Config-sized table → a chained CASE expression, evaluated
    * left to right exactly like the reference's first-match loop. */
  def rangeLookup(predicate: Column, rules: Seq[RangeRule]): Column =
    rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(predicate.contains(r.propertyFragment), r.range).otherwise(acc)
    }

  /** Dataset value classification: kind + emitted fields. */
  def datasetObject(value: Column): Column =
    when(length(value) < 100, struct(
      lit("name").as("kind"),
      value.as("name"),
      concat(lit("https://huggingface.co/datasets/"), value).as("url"),
      lit(null).cast("string").as("description")))
      .otherwise(struct(
        lit("description").as("kind"),
        concat(substring(value, 1, 50), lit("...")).as("name"),
        lit(null).cast("string").as("url"),
        value.as("description")))

  /** DefinedTerm admission: drop ':'-tags and <=2-char tags; survivors get
    * the lowercased-hash identity. */
  def definedTermId(term: Column, base: String): Column =
    when(!term.contains(":") && length(term) > 2,
      concat(lit(base), sha2(lower(term), 256)))

  /** License object: URI reference vs literal. */
  def licenseObject(value: Column): Column =
    struct(
      when(value.startsWith("http://") || value.startsWith("https://"), "iri")
        .otherwise("literal").as("objKind"),
      value.as("obj"))
}
