package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tag categorization — the reference's central relational transform
  * (`parse_fields_from_tags_HF`, `core/ModelCardToSchemaParser.py:296-398`,
  * SURVEY §2.4): bucket each model's tag array into typed output columns by
  * prefix rules and vocabulary membership.
  *
  * Spark-first: array higher-order functions over the tags column with
  * vocabularies as broadcast-sized literal arrays — zero UDFs, zero
  * explodes, one projection; every rule is codegen'd. At 100 TB this is a
  * pure map stage.
  */
object TagCategorizer {

  /** Config vocabularies (`data/configuration/hf/extract/tags_*.tsv`). */
  final case class Vocabs(
      languages: Seq[String],
      libraries: Seq[String],
      tasks: Seq[String])

  private def inVocab(x: Column, vocab: Seq[String]): Column =
    array_contains(typedLit(vocab), x)

  /** @param df       input with `tags: array<string>` and `pipeline_tag`
    * @param vocabs   language / library / task vocabularies
    * @return df with the 7 bucket columns of §2.4 appended
    */
  def categorize(df: DataFrame, vocabs: Vocabs): DataFrame = {
    val tags = col("tags")
    val norm = (t: Column) => lower(regexp_replace(t, "-", " "))

    val datasets = transform(
      filter(tags, t => t.startsWith("dataset:")),
      t => substring_index(t, "dataset:", -1))
    val arxiv = transform(
      filter(tags, t => t.startsWith("arxiv:")),
      t => concat(lit("https://arxiv.org/abs/"), substring_index(t, "arxiv:", -1)))
    val baseModels = transform(
      filter(tags, t => t.startsWith("base_model:")),
      t => element_at(split(t, ":"), -1))
    val languages = filter(tags, t => inVocab(lower(t), vocabs.languages))
    val libraries = filter(tags, t => inVocab(t, vocabs.libraries))
    val tasks = transform(
      filter(tags, t => inVocab(norm(t), vocabs.tasks)), norm)
    val plainKeywords = filter(tags, t =>
      !t.contains(":") && !inVocab(lower(t), vocabs.languages) &&
        !inVocab(t, vocabs.libraries) && !inVocab(norm(t), vocabs.tasks))

    // pipeline_tag folds into tasks + keywords when it is a known task
    val pipeNorm = norm(col("pipeline_tag"))
    val pipeAsTask = when(col("pipeline_tag").isNotNull &&
      inVocab(pipeNorm, vocabs.tasks), array(pipeNorm))
      .otherwise(array().cast("array<string>"))

    df.withColumn("trained_on", array_distinct(datasets))
      .withColumn("evaluated_on", array_distinct(datasets))
      .withColumn("reference_publication", array_distinct(arxiv))
      .withColumn("fine_tuned_from", array_distinct(baseModels))
      .withColumn("in_language", array_distinct(transform(languages, lower _)))
      .withColumn("ml_task",
        array_distinct(concat(tasks, pipeAsTask)))
      .withColumn("keywords",
        array_distinct(concat(plainKeywords, libraries, pipeAsTask)))
  }

  /** P4 has-publication filter (`ModelCardToSchemaParser.py:1034-1035`). */
  def hasPublication(df: DataFrame): DataFrame =
    df.filter(size(col("reference_publication")) > 0)
}
