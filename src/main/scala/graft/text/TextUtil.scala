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

  /** Empty-value sentinel normalization (P8,
    * `core/GraphBuilderFAIR4ML.py:323-330`). */
  val EmptySentinels: Set[String] =
    Set("", "None", "No context to answer the question", "Information not found")

  def normalizeEmpty(s: String): Option[String] =
    Option(s).map(_.trim).filterNot(EmptySentinels.contains)
}
