package graft.model

import java.security.MessageDigest
import java.sql.Timestamp

/** Core data model of the engine (SURVEY.md §1): RDF-ish triples with a
  * tagged object kind, reified per-statement extraction metadata, and SCD-2
  * validity ranges — the Spark restatement of the reference's
  * rdflib-Graph + Postgres history schema
  * (`data/configuration/hf/load/sql_files/init.sql`,
  * `code/load/mlentory_load/core/GraphHandler.py:479-483`).
  */
final case class Triple(
    subject: String,
    predicate: String,
    obj: String,
    objKind: String, // ObjKind.Iri | ObjKind.Literal
    datatype: String) // empty = plain literal / not applicable

object ObjKind {
  val Iri = "iri"
  val Literal = "literal"
}

/** Reified statement provenance (one row per asserted triple per extraction
  * method — `GraphBuilderBase.add_triple_with_metadata`,
  * `core/GraphBuilderBase.py:103-180`). Keyed by the triple itself; no
  * blank nodes needed. */
final case class StatementMeta(
    subject: String,
    predicate: String,
    obj: String,
    extractionMethod: String,
    confidence: Double,
    extractionTime: Timestamp)

/** SCD-2 validity range over (triple, extraction-info) — the reference's
  * `"Version_Range"` table. */
final case class VersionRange(
    tripletHash: String,
    subject: String,
    predicate: String,
    obj: String,
    objKind: String,
    datatype: String,
    infoHash: String,
    extractionMethod: String,
    confidence: Double,
    useStart: Timestamp,
    useEnd: Timestamp,
    deprecated: Boolean)

/** N3 serialization of triples — pure string work
  * (`core/GraphHandler.py:196-203` formats via rdflib `.n3()`). */
object N3 {

  /** Escape per N-Triples: backslash, quote, and control whitespace. */
  def escapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Inverse of escapeLiteral. Must scan left-to-right: sequential
    * String.replace is order-sensitive and corrupts inputs like a literal
    * backslash followed by 'n' (escaped "\\n", which a naive
    * replace("\\n", "\n") pass turns into backslash-newline). */
  def unescapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def formatIri(uri: String): String = s"<$uri>"

  def formatLiteral(value: String, datatype: String): String =
    if (datatype == null || datatype.isEmpty) "\"" + escapeLiteral(value) + "\""
    else "\"" + escapeLiteral(value) + "\"^^<" + datatype + ">"

  def formatObject(t: Triple): String =
    if (t.objKind == ObjKind.Iri) formatIri(t.obj)
    else formatLiteral(t.obj, t.datatype)

  def formatTriple(t: Triple): String =
    s"${formatIri(t.subject)} ${formatIri(t.predicate)} ${formatObject(t)} ."

  /** Strip surrounding angle brackets from an IRI n3 form (J7 fallback,
    * `GraphHandlerForKG.py:293-298`). */
  def stripAngles(s: String): String =
    if (s.length >= 2 && s.head == '<' && s.last == '>') s.substring(1, s.length - 1)
    else s
}

/** Deterministic identity hashing (§1.4). The reference hashes
  * `json.dumps({"platform","type","id"}, sort_keys=True)`
  * (`GraphBuilderBase.py:208-237`); we pin an explicit field order instead
  * (Spark `to_json` is not key-sorted — SURVEY §2.9). */
object Hashing {

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  def sha256(s: String): String =
    hex(MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8")))

  def md5(s: String): String =
    hex(MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))

  /** Entity URI hash: fixed key order platform|type|id. */
  def entityHash(platform: String, entityType: String, id: String): String =
    sha256(s"platform=$platform|type=$entityType|id=$id")

  /** Triplet identity = md5 over the n3 forms (`GraphHandler.py:479-483`). */
  def tripletHash(t: Triple): String =
    md5(N3.formatIri(t.subject) + N3.formatIri(t.predicate) + N3.formatObject(t))

  /** Extraction-info identity = md5(method + confidence rounded to 5 dp)
    * (`GraphHandler.py:548-633`). */
  def infoHash(method: String, confidence: Double): String =
    md5(method + BigDecimal(confidence).setScale(5, BigDecimal.RoundingMode.HALF_UP).toString)
}
