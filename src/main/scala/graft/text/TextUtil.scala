package graft.text

/** Small pure scalar helpers from SURVEY §2.9 that have no Spark built-in:
  * K/M/B suffix number parsing (`OpenMLExtractor.py:289-305`) and the
  * multi-question answer parser (E6, `QAInferenceEngine.py:240-403`).
  */
object TextUtil {

  private val Kmb = "(?i)^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([KMB]?)\\s*$".r

  /** Parse "3.5K" → 3500, "2M" → 2000000, "1.2B" → 1200000000. */
  def parseKmb(s: String): Option[Long] = s match {
    case Kmb(num, suffix) =>
      val mult = suffix.toUpperCase match {
        case "K" => 1e3
        case "M" => 1e6
        case "B" => 1e9
        case _ => 1.0
      }
      Some(math.round(num.toDouble * mult))
    case _ => None
  }

  private val AnswerRe = "(?m)^\\s*Question\\s+(\\d+)\\s*:\\s*(.*)$".r

  /** Parse a multi-question LLM response of the form `Question N: answer`
    * into position → answer; falls back to one answer per non-empty line
    * when no markers are present (E6 semantics). */
  def parseMultiAnswers(response: String, nQuestions: Int): Vector[String] = {
    if (response == null) return Vector.fill(nQuestions)("")
    val marked = AnswerRe.findAllMatchIn(response).toVector
    if (marked.nonEmpty) {
      val byIdx = marked.map(m => m.group(1).toInt -> m.group(2).trim).toMap
      (1 to nQuestions).map(i => byIdx.getOrElse(i, "")).toVector
    } else {
      val lines = response.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
      (0 until nQuestions).map(i => lines.lift(i).getOrElse("")).toVector
    }
  }

  /** Humanize a schema property name (E9): "fair4ml:intendedUse" →
    * "Intended Use". */
  def humanizeProperty(prop: String): String = {
    val base = prop.split(':').last
    base.replaceAll("([a-z0-9])([A-Z])", "$1 $2")
      .split("[\\s_]+").filter(_.nonEmpty)
      .map(w => w.head.toUpper + w.tail).mkString(" ")
  }

  /** Minimal stopword list for deterministic token-overlap scoring. */
  val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "by",
    "is", "are", "was", "were", "be", "been", "it", "its", "this", "that",
    "what", "which", "who", "how", "does", "did", "do", "under", "for",
    "with", "from", "have", "has", "had", "not", "no", "can", "will")

  /** Content-bearing tokens for overlap scoring: lowercase, drop
    * stopwords and short tokens, crude prefix stemming so inflections
    * ("supports"/"supported") collide. */
  def contentTokens(s: String): Set[String] =
    s.toLowerCase.split("\\W+")
      .filter(t => t.length > 2 && !Stopwords.contains(t))
      .map(_.take(5)).toSet

  /** Empty-value sentinel normalization (P8,
    * `core/GraphBuilderFAIR4ML.py:323-330`). */
  val EmptySentinels: Set[String] =
    Set("", "None", "No context to answer the question", "Information not found")

  def normalizeEmpty(s: String): Option[String] =
    Option(s).map(_.trim).filterNot(EmptySentinels.contains)
}
