package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.text.TextUtil

/** Generative-QA extraction shapes (E5-E7,
  * `core/QAInferenceEngine.py:18-38,118-503`) behind an inference trait:
  * prompt construction, context-grouped batching, and multi-answer
  * parsing are the engine's dataflow; the model call is pluggable and
  * stubbed deterministically offline.
  */
object QaEngine {

  /** The reference's prompt contracts (temperature-0 determinism; the
    * "Information not found" fallback is part of the contract). */
  def singlePrompt(context: String, question: String): String =
    s"""Context information is below.
       |---------------------
       |$context
       |---------------------
       |Given the context information and no prior knowledge, answer the query.
       |If the answer is not in the context, reply exactly "Information not found".
       |Query: $question
       |Answer:""".stripMargin

  def multiPrompt(context: String, questions: Seq[String]): String =
    s"""Context information is below.
       |---------------------
       |$context
       |---------------------
       |Answer each question from the context only; reply "Information not found"
       |when the context does not contain the answer. Format each line as
       |"Question N: <answer>".
       |${questions.zipWithIndex.map { case (q, i) => s"Question ${i + 1}: $q" }.mkString("\n")}""".stripMargin

  /** Pluggable inference backend (vLLM/service in production, called from
    * `mapPartitions` so the client is created once per partition). */
  trait InferenceBackend extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Deterministic offline stub: answers with the context sentence that
    * shares the most tokens with each question (or the not-found
    * contract) — enough to exercise batching + parsing end-to-end. */
  final class EchoBackend extends InferenceBackend {
    private def toks(s: String) = TextUtil.contentTokens(s)
    override def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      val ctx = p.linesIterator.toVector
        .dropWhile(_ != "---------------------").drop(1)
        .takeWhile(_ != "---------------------").mkString(" ")
      val sentences = ctx.split("(?<=[.!?])\\s+").filter(_.trim.nonEmpty)
      val questions = p.linesIterator.filter(_.matches("^Question \\d+: .*")).toVector
      if (questions.isEmpty) {
        val q = p.linesIterator.find(_.startsWith("Query:"))
          .map(_.stripPrefix("Query:").trim).getOrElse("")
        bestSentence(sentences, q).getOrElse("Information not found")
      } else {
        questions.zipWithIndex.map { case (qline, i) =>
          val q = qline.replaceFirst("^Question \\d+: ", "")
          s"Question ${i + 1}: ${bestSentence(sentences, q).getOrElse("Information not found")}"
        }.mkString("\n")
      }
    }
    private def bestSentence(sentences: Seq[String], q: String): Option[String] = {
      val qt = toks(q)
      val scored = sentences.map(s => ((toks(s) & qt).size, s))
      scored.sortBy { case (sc, s) => (-sc, s) }.headOption
        .filter(_._1 > 0).map(_._2.trim)
    }
  }

  final case class Answer(id: String, question: String, answer: String)

  /** E7 context-grouped QA: group questions by identical context, one
    * multi-question prompt per group of `maxPerGroup`, parse with the E6
    * marker grammar. Input: (id, context, question) rows. */
  def groupedQa(pairs: DataFrame, backend: InferenceBackend,
                maxPerGroup: Int = 5): Dataset[Answer] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select("id", "context", "question")
      .as[(String, String, String)]
      .groupByKey { case (id, ctx, _) => (id, ctx) }
      .flatMapGroups { (key: (String, String), rows: Iterator[(String, String, String)]) =>
        val (id, ctx) = key
        val questions = rows.map(_._3).toVector
        questions.grouped(maxPerGroup).flatMap { grp =>
          val resp = backend.complete(Seq(multiPrompt(ctx, grp))).head
          val parsed = TextUtil.parseMultiAnswers(resp, grp.size)
          grp.zip(parsed).map { case (q, a) => Answer(id, q, a) }
        }
      }
  }
}
