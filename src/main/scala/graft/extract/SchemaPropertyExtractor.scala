package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Markdown, TextUtil}

/** ML-assisted property extraction (E8/E9,
  * `core/SchemaPropertyExtractor.py:72-227`): per schema property, build a
  * query text from its humanized name + description, score it against the
  * model card's hierarchical sections, and take the top-scoring section's
  * content as the property value with the match score as confidence —
  * the reference's fully deterministic `context_matching` strategy.
  *
  * The scoring backend is a trait: production would call an embedding
  * service from `mapPartitions` (micro-batched); the default
  * token-overlap scorer is deterministic and dependency-free, so the whole
  * dataflow is testable offline (SURVEY §7.4 risk 6).
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

  final case class Extracted(
      modelId: String, property: String, value: String, confidence: Double,
      sectionTitle: String)

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
                best, sections(idx).title))
            else None
          }
        }
      }
  }
}
