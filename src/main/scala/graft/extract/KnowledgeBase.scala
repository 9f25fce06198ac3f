package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One gazetteer entity: fires when all evidence substrings occur in the
  * normalized chunk text. */
final case class KbEntity(
    name: String,
    entityType: String,
    description: String,
    evidence: Vector[String]) extends Serializable

/** One distant-supervision triple: fires when all evidence substrings
  * occur and no forbid substring occurs. Derived from the reference's
  * golden fixture by tools/build_kb.py (see kb.json header). */
final case class KbTriple(
    subj: String,
    pred: String,
    obj: String,
    description: String,
    evidence: Vector[String],
    forbid: Vector[String]) extends Serializable

/** One event spec: fires like a triple; `ord` is the within-chunk event
  * ordinal ("event_N" in the reference id scheme,
  * promt.py:5-18), `participants` the entity names linked via
  * event_indices (pydantic_schema.py:10,29). */
final case class KbEvent(
    content: String,
    eventType: String,
    participants: Vector[String],
    evidence: Vector[String],
    forbid: Vector[String],
    ord: Int) extends Serializable

/** One event-relation spec (时序/因果/层级/条件 — the step-4 contract of
  * the extraction prompt, promt.py:152-154). Endpoints reference events
  * BY CONTENT — the post-resolution form the reference produces
  * (event_GraphExtractor.py:178-204) and stores by
  * (event_graphrag_neo4j.py:428-477). Fires in a chunk iff both
  * endpoint events fired there (plus evidence/forbid, usually empty). */
final case class KbEventRelation(
    headContent: String,
    tailContent: String,
    relationType: String,
    description: String,
    evidence: Vector[String],
    forbid: Vector[String]) extends Serializable

/** The broadcastable extraction dictionary — the deterministic stand-in
  * for the reference's LLM extraction contract
  * (reference examples/graph_extract/promt.py:110-166; replacement
  * rationale in SURVEY.md §7.5). */
final case class KnowledgeBase(
    entities: Vector[KbEntity],
    triples: Vector[KbTriple],
    events: Vector[KbEvent] = Vector.empty,
    eventRelations: Vector[KbEventRelation] = Vector.empty) extends Serializable {

  /** All distinct evidence/forbid patterns, for the Aho-Corasick scan. */
  lazy val patterns: Vector[String] =
    (entities.flatMap(_.evidence) ++
      triples.flatMap(t => t.evidence ++ t.forbid) ++
      events.flatMap(e => e.evidence ++ e.forbid) ++
      eventRelations.flatMap(r => r.evidence ++ r.forbid)).distinct

  /** Gazetteer augmented with alias-decorated variants (entity-linking
    * surface forms the canonicalizer must merge back): a decoration
    * suffix (clean-prompt rule path), a hyphen-inserted form
    * (embedding-LSH path), and a lowercase form (G12 path). The alias
    * keeps its own name — linking it to the base is the canonicalizer's
    * job, not the gazetteer's. */
  def withAliases: KnowledgeBase = {
    val variants = entities.filter(_.name.length >= 4).flatMap { e =>
      KnowledgeBase.aliasVariants(e.name).map { v =>
        KbEntity(v, e.entityType, e.description,
          Vector(KnowledgeBase.normalize(v)))
      }
    }
    copy(entities = entities ++ variants)
  }
}

object KnowledgeBase {

  /** Deterministic alias surface forms for an entity name. */
  def aliasVariants(name: String): Vector[String] = {
    val suffix = name + "装置"
    val hyphen = name.take(2) + "-" + name.drop(2)
    val lower = name.toLowerCase
    (Vector(suffix, hyphen) ++
      (if (lower != name) Vector(lower) else Vector.empty)).distinct
  }

  /** Text normalization applied before evidence matching (mirrors
    * tools/build_kb.py `norm`): strip all whitespace, map full-width
    * parens to ASCII. */
  def normalize(s: String): String = normalizeWithOffsets(s)._1

  /** [[normalize]] plus, for each output char, its index in the input —
    * so structural regex passes can evaluate word-boundary conditions
    * against the ORIGINAL text. Whitespace stripping concatenates
    * "model KJ-12345" into "modelKJ-12345", where a lookbehind on the
    * normalized string wrongly sees 'l' adjacent to 'K'; the offset map
    * lets the caller see the stripped space and treat it as a boundary. */
  def normalizeWithOffsets(s: String): (String, Array[Int]) = {
    val buf = new Array[Char](s.length)
    val offs = new Array[Int](s.length)
    var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!graft.text.Chars.isWs(c)) {
        buf(n) =
          if (c == '（') '(' else if (c == '）') ')' else c
        offs(n) = i
        n += 1
      }
      i += 1
    }
    (new String(buf, 0, n), java.util.Arrays.copyOf(offs, n))
  }

  /** Load the committed KB resource. */
  def load(): KnowledgeBase = loadFrom("/graft/kb.json")

  def loadFrom(resource: String): KnowledgeBase = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"KB resource $resource not found")
    val root = new ObjectMapper().readTree(in)
    in.close()
    def strs(n: JsonNode): Vector[String] =
      if (n == null) Vector.empty
      else n.elements().asScala.map(_.asText()).toVector
    val ents = root.get("entities").elements().asScala.map { e =>
      KbEntity(
        e.get("name").asText(),
        e.get("type").asText(),
        Option(e.get("description")).map(_.asText()).getOrElse(""),
        strs(e.get("evidence")).map(normalize))
    }.toVector
    val trs = root.get("triples").elements().asScala.map { t =>
      KbTriple(
        t.get("subj").asText(),
        t.get("pred").asText(),
        t.get("obj").asText(),
        Option(t.get("description")).map(_.asText()).getOrElse(""),
        strs(t.get("evidence")).map(normalize),
        strs(t.get("forbid")).map(normalize))
    }.toVector
    val evs = Option(root.get("events")).map(_.elements().asScala.map { e =>
      KbEvent(
        e.get("content").asText(),
        Option(e.get("type")).map(_.asText()).getOrElse(""),
        strs(e.get("participants")),
        strs(e.get("evidence")).map(normalize),
        strs(e.get("forbid")).map(normalize),
        e.get("ord").asInt())
    }.toVector).getOrElse(Vector.empty)
    val rels = Option(root.get("event_relations")).map(_.elements().asScala.map { r =>
      KbEventRelation(
        r.get("head_content").asText(),
        r.get("tail_content").asText(),
        Option(r.get("type")).map(_.asText()).getOrElse(""),
        Option(r.get("description")).map(_.asText()).getOrElse(""),
        strs(r.get("evidence")).map(normalize),
        strs(r.get("forbid")).map(normalize))
    }.toVector).getOrElse(Vector.empty)
    KnowledgeBase(ents, trs, evs, rels)
  }
}
