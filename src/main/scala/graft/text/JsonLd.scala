package graft.text

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.{Hashing, ObjKind, Triple}

/** JSON-LD subset expander for Croissant documents (T2, SURVEY §7.3/§7.4
  * risk 5: no jsonld library offline, and the croissant payloads only use a
  * flat `@context` prefix/term map with nested node objects — exactly the
  * subset implemented here; `GraphBuilderCroissant.py:30-200`).
  *
  * Expansion: every JSON object is a node (subject = `@id` or a fresh
  * blank `_:bN`), `@type` emits rdf:type triples, every other key resolves
  * through the context (term map first, then CURIE prefix, else kept
  * verbatim), scalars become literals, `{"@id": …}` and nested objects
  * become IRI/child references, arrays fan out.
  */
object JsonLd {

  private val mapper = new ObjectMapper()

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  def parseContext(root: JsonNode): Map[String, String] = {
    val ctx = root.get("@context")
    if (ctx == null || !ctx.isObject) Map.empty
    else ctx.fields().asScala.collect {
      case e if e.getValue.isTextual => e.getKey -> e.getValue.asText
      // {"@id": "...", "@type": "@id"}-style term definitions
      case e if e.getValue.isObject && e.getValue.has("@id") =>
        e.getKey -> e.getValue.get("@id").asText
    }.toMap
  }

  /** Resolve a key/type through the context: exact term, then CURIE
    * prefix:suffix, else verbatim. */
  def resolve(term: String, ctx: Map[String, String]): String =
    ctx.get(term) match {
      case Some(uri) => uri
      case None =>
        val i = term.indexOf(':')
        if (i > 0) {
          val (p, rest) = (term.substring(0, i), term.substring(i + 1))
          ctx.get(p).map(_ + rest).getOrElse(term)
        } else term
    }

  /** Expand a JSON-LD document into triples. Blank nodes get deterministic
    * `_:b{N}` ids in document order (stable for a given document). */
  def expand(json: String): Seq[Triple] = {
    val root = mapper.readTree(json)
    if (root == null || !root.isObject) return Seq.empty
    val ctx = parseContext(root)
    val out = Vector.newBuilder[Triple]
    var blankCounter = -1
    def freshBlank(): String = { blankCounter += 1; s"_:b$blankCounter" }

    def nodeId(n: JsonNode): String =
      if (n.has("@id") && n.get("@id").isTextual) resolve(n.get("@id").asText, ctx)
      else freshBlank()

    def walk(n: JsonNode, id: String): Unit = {
      n.fields().asScala.foreach { e =>
        val (key, v) = (e.getKey, e.getValue)
        key match {
          case "@context" | "@id" => ()
          case "@type" =>
            val types = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            types.filter(_.isTextual).foreach { t =>
              out += Triple(id, RdfType, resolve(t.asText, ctx), ObjKind.Iri, "")
            }
          case _ =>
            val pred = resolve(key, ctx)
            val values = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            values.foreach {
              case s if s.isTextual =>
                out += Triple(id, pred, s.asText, ObjKind.Literal, "")
              case s if s.isNumber =>
                out += Triple(id, pred, s.numberValue.toString, ObjKind.Literal,
                  "http://www.w3.org/2001/XMLSchema#decimal")
              case s if s.isBoolean =>
                out += Triple(id, pred, s.asBoolean.toString, ObjKind.Literal,
                  "http://www.w3.org/2001/XMLSchema#boolean")
              case s if s.isObject && s.size == 1 && s.has("@id") =>
                out += Triple(id, pred, resolve(s.get("@id").asText, ctx),
                  ObjKind.Iri, "")
              case s if s.isObject =>
                val childId = nodeId(s)
                out += Triple(id, pred, childId, ObjKind.Iri, "")
                walk(s, childId)
              case _ => () // null / nested arrays: outside the subset
            }
        }
      }
    }

    walk(root, nodeId(root))
    out.result()
  }

  private def isBlank(s: String) = s.startsWith("_:")

  /** Croissant graph surgery (`GraphBuilderCroissant.py:103-200,343-405`):
    *  1. delete File/FileSet/FileObject/FileObjectSet nodes entirely,
    *  2. re-identify typed blank nodes — the Dataset node becomes the
    *     platform entity id; Person/Organization blanks become hashed IRIs
    *     from their name,
    *  3. drop any triple still touching a blank node.
    */
  def croissantSurgery(triples: Seq[Triple], datasetId: String,
                       base: String): Seq[Triple] = {
    val typeOf: Map[String, Seq[String]] = triples
      .filter(t => t.predicate == RdfType)
      .groupBy(_.subject).view.mapValues(_.map(_.obj)).toMap
    def hasType(n: String, suffix: String) =
      typeOf.getOrElse(n, Seq.empty).exists(_.endsWith(suffix))

    val fileNodes = typeOf.keys.filter(n =>
      Seq("FileObjectSet", "FileObject", "FileSet")
        .exists(sfx => hasType(n, sfx)) ||
        (hasType(n, "File") && !hasType(n, "Field"))).toSet

    val nameOf: Map[String, String] = triples
      .filter(t => t.predicate.endsWith("name") && isBlank(t.subject))
      .groupBy(_.subject).view.mapValues(_.map(_.obj).min).toMap

    val rename: Map[String, String] = typeOf.keys.filter(isBlank).flatMap { n =>
      if (hasType(n, "Dataset"))
        Some(n -> (base + Hashing.entityHash("hf", "dataset", datasetId)))
      else if (hasType(n, "Person") || hasType(n, "Organization"))
        nameOf.get(n).map(nm => n -> (base + Hashing.entityHash("hf",
          if (hasType(n, "Person")) "person" else "organization", nm)))
      else None
    }.toMap

    triples
      .filterNot(t => fileNodes.contains(t.subject) ||
        (t.objKind == ObjKind.Iri && fileNodes.contains(t.obj)))
      .map { t =>
        val s2 = rename.getOrElse(t.subject, t.subject)
        val o2 = if (t.objKind == ObjKind.Iri) rename.getOrElse(t.obj, t.obj) else t.obj
        t.copy(subject = s2, obj = o2)
      }
      .filterNot(t => isBlank(t.subject) ||
        (t.objKind == ObjKind.Iri && isBlank(t.obj)))
  }
}
