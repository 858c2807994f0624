package graft.text

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** YAML front-matter subset parser (Y1,
  * `core/ModelCardToSchemaParser.py:400-506`). The reference only reads
  * top-level scalars and flat lists from model-card front-matter, so that
  * is exactly what we parse — no external YAML lib needed (snakeyaml is
  * not in the offline jar set, SURVEY §7.1).
  */
object FrontMatter {

  private val Delim = "^---\\s*$".r

  /** Extract the raw front-matter body between the leading `---` pair, or
    * None if the card does not start with one. */
  def raw(card: String): Option[String] = {
    if (card == null) return None
    val lines = card.linesIterator.toVector
    val start = lines.indexWhere(l => Delim.matches(l.trim))
    if (start != 0) return None
    val end = lines.indexWhere(l => Delim.matches(l.trim), 1)
    if (end < 0) None else Some(lines.slice(1, end).mkString("\n"))
  }

  /** Parse top-level `key: value` scalars and `key:` + `- item` lists.
    * Nested mappings are flattened as `parent.child` keys (the reference
    * reads `extra_gated_*` keys at any top level). Values keep insertion
    * order; quotes around scalars are stripped. */
  def parse(card: String): Map[String, Seq[String]] = {
    val body = raw(card).getOrElse(return Map.empty)
    val out = LinkedHashMap.empty[String, ArrayBuffer[String]]
    var currentKey: Option[String] = None
    val KeyVal = "^([A-Za-z0-9_.-]+):\\s*(.*)$".r
    val ListItem = "^\\s*-\\s+(.*)$".r

    def clean(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }

    body.linesIterator.foreach {
      case KeyVal(k, v) if !v.trim.startsWith("|") && !v.trim.startsWith(">") =>
        currentKey = Some(k)
        val vv = clean(v)
        val buf = out.getOrElseUpdate(k, ArrayBuffer.empty)
        if (vv.nonEmpty) buf += vv
      case ListItem(item) if currentKey.isDefined =>
        out(currentKey.get) += clean(item)
      case _ => () // block scalars / nested maps: out of the read subset
    }
    out.map { case (k, v) => k -> v.toSeq }.toMap
  }

  /** License resolution (`ModelCardToSchemaParser.py:455-506`): prefer
    * `license_name`, then `license` (first element when list-valued), else
    * concatenate every other `*license*` key's values. */
  def license(fm: Map[String, Seq[String]]): Option[String] = {
    fm.get("license_name").flatMap(_.headOption.filter(_.nonEmpty))
      .orElse(fm.get("license").flatMap(_.headOption.filter(_.nonEmpty)))
      .orElse {
        val rest = fm.toSeq.sortBy(_._1)
          .filter { case (k, _) => k != "license" && k != "license_name" && k.toLowerCase.contains("license") }
          .flatMap(_._2)
        if (rest.isEmpty) None else Some(rest.mkString(", "))
      }
  }

  /** Gated-access conditions: any `extra_gated*` key present
    * (`ModelCardToSchemaParser.py:430-453`). */
  def conditionsOfAccess(fm: Map[String, Seq[String]]): Option[String] = {
    val gated = fm.toSeq.sortBy(_._1).filter(_._1.startsWith("extra_gated"))
    if (gated.isEmpty) None
    else Some(gated.map { case (k, v) => s"$k: ${v.mkString(" ")}" }.mkString("; "))
  }
}
