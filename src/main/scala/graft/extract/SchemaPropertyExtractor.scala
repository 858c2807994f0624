package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Markdown, TextUtil}

/** ML-assisted property extraction (E8/E9,
  * `core/SchemaPropertyExtractor.py:72-433`): per schema property, build a
  * query text from its humanized name + description, then extract a value
  * from the model card by one of the reference's three strategies
  * (`extract_schema_properties_from_model_card`, `:122-148`):
  *
  *  - `context_matching` (`:150-227`): top-1 scoring section's content IS
  *    the value, match score is the confidence — fully deterministic.
  *  - `grouped` (`:229-334`): questions are clustered (E4), each cluster
  *    scores sections by its FIRST question as representative, the top-k
  *    sections are joined into one context, and ONE multi-question prompt
  *    per group runs through the inference backend (E7); confidence is the
  *    mean of the section scores.
  *  - `individual` (`:336-433`): each property scores its own top-k
  *    sections, joined into a context, and gets its own single-question
  *    prompt; the prompts batch into one backend call per card (the
  *    reference's `batch_inference`).
  *
  * All three wrap results identically: (modelId, property, value,
  * confidence, sectionTitle, method). The scoring and inference backends
  * are traits: production calls embedding/LLM services from
  * `mapPartitions`-style batches; the deterministic stubs (token-overlap
  * scorer, echo QA) exercise the whole dataflow offline (SURVEY §7.4
  * risk 6).
  */
object SchemaPropertyExtractor {

  /** Pluggable section scorer (E1/E2 seam). Must be serializable — it ships
    * to executors. */
  trait ScoringBackend extends Serializable {
    /** Score each text against the query; higher = better match. */
    def score(query: String, texts: Seq[String]): Seq[Double]
  }

  /** Deterministic stub: Jaccard overlap of lowercased token sets —
    * the offline stand-in for cosine-over-embeddings (E2). */
  final class TokenOverlapScorer extends ScoringBackend {
    private def toks(s: String): Set[String] = TextUtil.contentTokens(s)
    override def score(query: String, texts: Seq[String]): Seq[Double] = {
      val q = toks(query)
      texts.map { t =>
        val tt = toks(t)
        val inter = (q & tt).size
        if (q.isEmpty || tt.isEmpty) 0.0
        else inter.toDouble / (q.size + tt.size - inter)
      }
    }
  }

  /** One property to extract (E9): query text = humanized name +
    * description (`SchemaPropertyExtractor.py:72-120`). */
  final case class PropertyQuery(property: String, description: String) {
    def queryText: String =
      s"${TextUtil.humanizeProperty(property)}. $description"
  }

  /** The reference's strategy switch (`:122-148`); `parse` accepts its
    * config-file spellings and, like the reference, defaults anything
    * unknown to individual QA. */
  sealed abstract class Strategy(val name: String)
  object Strategy {
    case object ContextMatching extends Strategy("context_matching")
    case object Grouped extends Strategy("grouped")
    case object Individual extends Strategy("individual")
    def parse(s: String): Strategy = s match {
      case "context_matching" => ContextMatching
      case "grouped"          => Grouped
      case _                  => Individual
    }
  }

  final case class Extracted(
      modelId: String, property: String, value: String, confidence: Double,
      sectionTitle: String, method: String)

  /** Strategy dispatch — one call site for all three extraction flows,
    * mirroring `extract_schema_properties_from_model_card`. */
  def extract(models: DataFrame, queries: Seq[PropertyQuery],
              scorer: ScoringBackend,
              strategy: Strategy = Strategy.ContextMatching,
              inference: QaEngine.InferenceBackend = new QaEngine.EchoBackend,
              maxPerGroup: Int = 10, topK: Int = 3,
              minScore: Double = 0.0): Dataset[Extracted] = strategy match {
    case Strategy.ContextMatching =>
      contextMatch(models, queries, scorer, minScore)
    case Strategy.Grouped =>
      qaExtract(models, queries, scorer, inference, grouped = true,
        maxPerGroup, topK)
    case Strategy.Individual =>
      qaExtract(models, queries, scorer, inference, grouped = false,
        maxPerGroup, topK)
  }

  /** `context_matching`: per (model, property) emit the best-scoring
    * section. Runs as a typed flatMap — one section parse per card, all
    * properties scored against it (the reference's question-embedding
    * reuse, E3). */
  def contextMatch(models: DataFrame, queries: Seq[PropertyQuery],
                   backend: ScoringBackend,
                   minScore: Double = 0.0): Dataset[Extracted] = {
    val spark = models.sparkSession
    import spark.implicits._
    models.select(col("modelId"), col("card")).as[(String, String)]
      .flatMap { case (id, card) =>
        val sections = Markdown.hierarchical(Option(card).getOrElse(""))
          .filter(_.content.trim.nonEmpty)
        if (sections.isEmpty) Iterator.empty
        else {
          // score over title + content: the hierarchical title carries the
          // heading semantics a production embedding model would capture
          val texts = sections.map(s => s.title + "\n" + s.content)
          queries.iterator.flatMap { pq =>
            val scores = backend.score(pq.queryText, texts)
            val (best, idx) = scores.zipWithIndex.maxBy { case (sc, i) => (sc, -i) }
            if (best > minScore)
              Some(Extracted(id, pq.property, sections(idx).content.trim,
                best, sections(idx).title, "DirectContextMatch_SectionContent"))
            else None
          }
        }
      }
  }

  /** Shared grouped/individual QA flow. Question clustering is
    * card-independent (the reference re-derives the same groups inside
    * every per-card call from the question embeddings alone,
    * `QAMatchingEngine.py:285-292`), so it runs ONCE on the driver over
    * the config-sized question list and ships with the closure. Per card:
    * score sections by the group representative (its first question),
    * join the top-k sections into one context, one prompt per group
    * (multi-question for grouped, single for individual — the individual
    * prompts still batch into one backend call per card). */
  private def qaExtract(models: DataFrame, queries: Seq[PropertyQuery],
                        scorer: ScoringBackend,
                        inference: QaEngine.InferenceBackend,
                        grouped: Boolean, maxPerGroup: Int,
                        topK: Int): Dataset[Extracted] = {
    val spark = models.sparkSession
    import spark.implicits._
    val method = if (grouped) "GroupedQA" else "IndividualQA"
    val groups: Seq[Seq[PropertyQuery]] =
      if (!grouped) queries.map(Seq(_))
      else
        // index-based grouping: two properties can humanize to the SAME
        // query text (e.g. fair4ml:license / schema.org:license), and a
        // text-keyed lookup would extract one twice and drop the other
        QuestionClustering.clusterIndices(queries.map(_.queryText), scorer,
            nClusters = math.max(1, queries.size / maxPerGroup), maxPerGroup)
          .map(_.map(queries))

    models.select(col("modelId"), col("card")).as[(String, String)]
      .flatMap { case (id, rawCard) =>
        val card = Option(rawCard).getOrElse("")
        if (card.trim.isEmpty) Iterator.empty
        else {
          val parsed = Markdown.hierarchical(card).filter(_.content.trim.nonEmpty)
          // reference fallback (`QAMatchingEngine.py:201-205`): a card with
          // no sections is itself the single context, score 1.0
          val (titles, texts) =
            if (parsed.isEmpty) (Vector(""), Vector(card))
            else (parsed.map(_.title).toVector,
              parsed.map(s => s.title + "\n" + s.content).toVector)
          val contents =
            if (parsed.isEmpty) Vector(card) else parsed.map(_.content).toVector

          // per group: top-k sections for the representative question,
          // joined "title: content" with the reference's newline format
          val prepared = groups.map { group =>
            val rep = group.head.queryText
            val scores =
              if (parsed.isEmpty) Seq(1.0) else scorer.score(rep, texts)
            val top = scores.zipWithIndex
              .sortBy { case (sc, i) => (-sc, i) }.take(topK)
            val context = top
              .map { case (_, i) => s"${titles(i)}: ${contents(i)}" }
              .mkString("\n")
            val conf = top.map(_._1).sum / top.size
            val topTitle = titles(top.head._2)
            (group, context, conf, topTitle)
          }
          // one backend call per card: grouped → one multi-question prompt
          // per group; individual → all single prompts in one batch
          val prompts = prepared.map { case (group, context, _, _) =>
            if (grouped) QaEngine.multiPrompt(context, group.map(_.queryText))
            else QaEngine.singlePrompt(context, group.head.queryText)
          }
          val responses = inference.complete(prompts)
          prepared.iterator.zip(responses.iterator).flatMap {
            case ((group, _, conf, topTitle), resp) =>
              val answers =
                if (grouped) TextUtil.parseMultiAnswers(resp, group.size)
                else Seq(resp.trim)
              group.iterator.zip(answers.iterator).map { case (pq, ans) =>
                Extracted(id, pq.property, ans, conf, topTitle, method)
              }
          }
        }
      }
  }
}
