package graft.extract

/** Per-chunk extraction result rows. `chunkId` threads provenance
  * through the whole DAG (SURVEY.md §1.1). */
final case class Mention(
    chunkId: String,
    url: String,
    surface: String,
    entityName: String,
    entityType: String,
    entityDescription: String)

final case class Triple(
    chunkId: String,
    url: String,
    subj: String,
    pred: String,
    obj: String,
    description: String)

/** Per-chunk event (reference Event schema, promt.py:5-18 +
  * participants from pydantic_schema.py:10,29). `ord` preserves the
  * reference's "event_N" within-chunk numbering. */
final case class EventRow(
    chunkId: String,
    url: String,
    ord: Int,
    content: String,
    eventType: String,
    participants: Vector[String])

/** Per-chunk event relation, endpoints resolved to the fired events'
  * within-chunk ordinals + contents (the reference's
  * `_process_event_relations` output shape: head/tail event CONTENT,
  * relation_type ∈ {时序,因果,层级,条件}, description —
  * event_GraphExtractor.py:178-204). */
final case class EventRelRow(
    chunkId: String,
    url: String,
    headOrd: Int,
    tailOrd: Int,
    relationType: String,
    description: String)

/** Deterministic mention detection + (subj, pred, obj) triple extraction
  * over chunk text — the Spark replacement for the reference's LLM
  * extraction loop (reference
  * core/file_management/extractor/event_GraphExtractor.py:52-124, see
  * SURVEY.md §2.3 E1-E7 and §7.5 for the deviation rationale).
  *
  * Matching model: the broadcast [[KnowledgeBase]] carries evidence
  * substring specs; a single Aho-Corasick pass over the normalized chunk
  * yields the matched-pattern set; an entity fires when all its evidence
  * patterns matched, a triple when all evidence matched and no forbid
  * matched. One scan per chunk — O(len) regardless of KB size.
  *
  * Post-extraction cleaning mirrors the reference order:
  *  - kill-list pre-filter on entity names (E5,
  *    event_GraphExtractor.py:242-312);
  *  - relation cleaning (E7, event_GraphExtractor.py:315-402): drop
  *    triples whose endpoints were filtered, self-loops, and pairs whose
  *    names match case-insensitively;
  *  - within-chunk dedup keyed like the reference's history merge (E2,
  *    event_GraphExtractor.py:126-175): entities by name, relations by
  *    (subj, pred, obj) — order-preserving first-wins.
  */
final class TripleExtractor(kb: KnowledgeBase) extends Serializable {

  private val patternIndex: Map[String, Int] =
    kb.patterns.zipWithIndex.toMap

  @transient private lazy val automaton: AhoCorasick =
    AhoCorasick(kb.patterns)

  // The kill-list (E5) and the self-loop/same-name relation checks (E7)
  // apply to KB-CONSTANT names, so they are evaluated once here at
  // construction (driver side, pre-broadcast) by dropping dead specs —
  // profiling showed the per-chunk regex evaluation of these constants
  // was ~15% of extraction CPU. Evidence/forbid ids are Array[Int] and
  // the firing checks run over a BitSet: the old Vector[Int].forall over
  // a mutable.Set[Int] boxed every id per spec per chunk (JFR: boxed
  // equals + set probes were ~7% of extraction-stage CPU).
  private val entitySpecs: Vector[(KbEntity, Array[Int])] =
    kb.entities
      .filter(e => EntityFilters.keep(e.name))
      .map(e => (e, e.evidence.map(patternIndex).toArray))

  private val tripleSpecs: Vector[(KbTriple, Array[Int], Array[Int])] =
    kb.triples
      .filter(t => EntityFilters.keep(t.subj) && EntityFilters.keep(t.obj) &&
        !t.subj.equalsIgnoreCase(t.obj))
      .map(t =>
        (t, t.evidence.map(patternIndex).toArray, t.forbid.map(patternIndex).toArray))

  private val eventSpecs: Vector[(KbEvent, Array[Int], Array[Int])] =
    kb.events.map(e =>
      (e, e.evidence.map(patternIndex).toArray, e.forbid.map(patternIndex).toArray))

  private val eventRelSpecs: Vector[(KbEventRelation, Array[Int], Array[Int])] =
    kb.eventRelations.map(r =>
      (r, r.evidence.map(patternIndex).toArray, r.forbid.map(patternIndex).toArray))

  /** all ids set (true on empty — Vector.forall semantics). */
  @inline private def allSet(bits: java.util.BitSet, ids: Array[Int]): Boolean = {
    var k = 0
    while (k < ids.length) {
      if (!bits.get(ids(k))) return false
      k += 1
    }
    true
  }

  /** any id set (false on empty — Vector.exists semantics). */
  @inline private def anySet(bits: java.util.BitSet, ids: Array[Int]): Boolean = {
    var k = 0
    while (k < ids.length) {
      if (bits.get(ids(k))) return true
      k += 1
    }
    false
  }

  // ---- open-vocabulary pattern detection ------------------------------
  // A closed gazetteer bounds entity cardinality at dictionary size;
  // real web NER is dictionary + pattern hybrid. Component model codes
  // (prefix + separator + 5 base-36 chars) are detected structurally —
  // unbounded vocabulary, zero dictionary, one scan per chunk.
  // The 属于 template additionally yields (code, 属于关系, category)
  // triples — the open-vocabulary relation stream that scales the edge
  // table with the corpus instead of the KB.
  // The mention scan is the hand-rolled [[TripleExtractor.findCode]]
  // rather than a Pattern: the `(?i:KJ|XH|BJ|DZ)...` alternation has no
  // literal prefix, so java.util.regex probes every position through
  // the alternation — measured at ~50% of total extraction CPU; the
  // char-level scanner is ~15x cheaper and equivalence-property-tested
  // against the regex in ExtractorSpec. codeRelRe keeps its Pattern:
  // its literal 部件型号 prefix gives the engine a Boyer-Moore skip
  // (measured cheap).
  // No regex lookarounds here: word boundaries are checked against the
  // ORIGINAL text via the normalization offset map (a lookbehind on the
  // whitespace-stripped string would wrongly reject "model KJ-12345",
  // whose space vanishes in normalization) — see origBoundaryOk.
  @transient private lazy val codeRelRe =
    java.util.regex.Pattern.compile(
      "部件型号[:：]((?i:KJ|XH|BJ|DZ)[-._/]?[0-9A-Za-z]{5})，属于([^，。]{2,24}组件)。")

  /** Extract mentions + triples from one chunk. */
  def extract(chunkId: String, url: String, content: String)
      : (Vector[Mention], Vector[Triple]) = {
    val r = extractAll(chunkId, url, content)
    (r._1, r._2)
  }

  /** Word-boundary check for a [start, endExcl) match in the normalized
    * string, evaluated against the ORIGINAL content through the offset
    * map: the physically-adjacent original chars decide, so a stripped
    * space still separates ("model KJ-12345" detects; "modelKJ-12345"
    * does not). */
  private def origBoundaryOk(content: String, offs: Array[Int],
      start: Int, endExcl: Int): Boolean = {
    // same predicate as the scanner's allAlnum — the boundary check and
    // the match body must agree on what counts as word material
    import TripleExtractor.isAlnumAscii
    val before = offs(start) - 1
    val after = offs(endExcl - 1) + 1
    (before < 0 || !isAlnumAscii(content.charAt(before))) &&
      (after >= content.length || !isAlnumAscii(content.charAt(after)))
  }

  def extractAll(chunkId: String, url: String, content: String)
      : (Vector[Mention], Vector[Triple], Vector[EventRow], Vector[EventRelRow]) = {
    val (ms, ts, es, rs) = extractAllCompact(content)
    (ms.map { c =>
      val (s, n, ty, d) = expandMention(c); Mention(chunkId, url, s, n, ty, d)
     },
     ts.map { c =>
       val (s, p, o, d) = expandTriple(c); Triple(chunkId, url, s, p, o, d)
     },
     es.map { c =>
       val (ord, ct, ty, pp) = expandEvent(c); EventRow(chunkId, url, ord, ct, ty, pp)
     },
     rs.map { c =>
       val (h, t, ty, d) = expandEventRel(c); EventRelRow(chunkId, url, h, t, ty, d)
     })
  }

  // ---- compact (dictionary-encoded) extraction -------------------------
  // Every spec-fired row's strings are a pure function of the SPEC, and
  // the spec table is vocabulary-bounded while the corpus is not — so the
  // per-chunk result arrays that cross the consolidation shuffle carry
  // the spec's POSITION in this extractor's (deterministically ordered)
  // spec vectors instead of repeating the same name/description strings
  // once per firing chunk. At 1M pages this shrinks the extraction
  // shuffle from full-string structs to int-dominated rows; expansion
  // back to the full schema happens once, AFTER the survivor aggregate
  // (KGPipeline.consolidate). Index stability: KnowledgeBase.load() is
  // deterministic and the kill-list construction filter is pure, so the
  // same library version always assigns the same indexes — a staged
  // compact table is only readable by the extractor recipe that wrote it
  // (same contract as the chunk-id recipe, Lineage.FormatVersion).
  //
  // Encodings (open-vocabulary rows carry their short literals inline):
  //  - mention  (idx, s):       idx >= 0 -> entitySpecs(idx), s null;
  //                             idx == -1 -> component code, surface s;
  //                             idx == -2 -> category, surface s
  //  - triple   (idx, s1, s2):  idx >= 0 -> tripleSpecs(idx);
  //                             idx == -1 -> (s1, 属于关系, s2)
  //  - event    (ord, idx):     eventSpecs(idx), ord = dense within-chunk
  //  - eventRel (hOrd, tOrd, idx): eventRelSpecs(idx)

  /** Expand one compact mention to (surface, name, type, description). */
  def expandMention(c: (Int, String)): (String, String, String, String) =
    c._1 match {
      case -1 => (c._2, c._2, "部件型号", "")
      case -2 => (c._2, c._2, "部件类别", "")
      case i =>
        val e = entitySpecs(i)._1
        (e.evidence.headOption.getOrElse(e.name), e.name, e.entityType,
          e.description)
    }

  /** Expand one compact triple to (subj, pred, obj, description). */
  def expandTriple(c: (Int, String, String)): (String, String, String, String) =
    if (c._1 == -1) (c._2, "属于关系", c._3, "")
    else {
      val t = tripleSpecs(c._1)._1
      (t.subj, t.pred, t.obj, t.description)
    }

  /** Expand one compact event to (ord, content, type, participants). */
  def expandEvent(c: (Int, Int)): (Int, String, String, Vector[String]) = {
    val e = eventSpecs(c._2)._1
    (c._1, e.content, e.eventType, e.participants)
  }

  /** Expand one compact event relation to (headOrd, tailOrd, type,
    * description). */
  def expandEventRel(c: (Int, Int, Int)): (Int, Int, String, String) = {
    val r = eventRelSpecs(c._3)._1
    (c._1, c._2, r.relationType, r.description)
  }

  // ---- spec dimension tables (driver-side, vocabulary-bounded) --------
  // One row per spec index, for the broadcast-join expansion of staged
  // compact tables (KGPipeline.consolidate): the consumers stay whole-
  // stage-codegen DataFrame plans — explode ints, broadcast-join the
  // dim, project — instead of a mapPartitions string materialization.

  /** (idx, surface, name, type, description) per gazetteer entity. */
  def mentionSpecRows: Seq[(Int, String, String, String, String)] =
    entitySpecs.zipWithIndex.map { case ((e, _), i) =>
      (i, e.evidence.headOption.getOrElse(e.name), e.name, e.entityType,
        e.description)
    }

  /** (idx, subj, pred, obj, description) per triple spec. */
  def tripleSpecRows: Seq[(Int, String, String, String, String)] =
    tripleSpecs.zipWithIndex.map { case ((t, _, _), i) =>
      (i, t.subj, t.pred, t.obj, t.description)
    }

  /** (idx, content, type, participants) per event spec. */
  def eventSpecRows: Seq[(Int, String, String, Seq[String])] =
    eventSpecs.zipWithIndex.map { case ((e, _, _), i) =>
      (i, e.content, e.eventType, e.participants)
    }

  /** (idx, type, description) per event-relation spec. */
  def eventRelSpecRows: Seq[(Int, String, String)] =
    eventRelSpecs.zipWithIndex.map { case ((r, _, _), i) =>
      (i, r.relationType, r.description)
    }

  /** Compact-form [[extractAll]]: identical firing/dedup/order logic,
    * spec-index payloads (see the encoding table above). [[extractAll]]
    * is expand-of-this, so the ScalaTest extraction pins cover both. */
  def extractAllCompact(content: String)
      : (Vector[(Int, String)], Vector[(Int, String, String)],
         Vector[(Int, Int)], Vector[(Int, Int, Int)]) = {
    val (normalized, offs) = KnowledgeBase.normalizeWithOffsets(content)
    val hits = automaton.matchedBits(normalized)

    // E3 gazetteer pass + E5 kill-list + E2 name-keyed dedup
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val mentions = Vector.newBuilder[(Int, String)]
    var mIdx = -1
    entitySpecs.foreach { case (e, ids) =>
      mIdx += 1
      if (ids.length > 0 && allSet(hits, ids) && seen.add(e.name)) {
        mentions += ((mIdx, null))
      }
    }

    // open-vocabulary pass: structural code mentions + 属于 template
    // triples (categories become mentions too, so both triple endpoints
    // resolve in the canonical name map)
    // a boundary-REJECTED match must not consume its span (a plain
    // resume at the match end would skip a valid code overlapping the
    // rejected one, e.g. "XH.BJ12345" where XH.BJ123 rejects but
    // BJ12345 is real — hence the start+1 re-seek)
    var pos = 0
    var code = TripleExtractor.findCode(normalized, pos)
    while (code >= 0) {
      val start = (code >>> 32).toInt
      val end = code.toInt
      if (origBoundaryOk(content, offs, start, end)) {
        val s = normalized.substring(start, end)
        if (seen.add(s)) {
          mentions += ((-1, s))
        }
        pos = end
      } else pos = start + 1
      code = TripleExtractor.findCode(normalized, pos)
    }
    val crm = codeRelRe.matcher(normalized)
    val codeTriples = Vector.newBuilder[(String, String)]
    while (crm.find()) {
      val cat = crm.group(2)
      if (seen.add(cat)) {
        mentions += ((-2, cat))
      }
      codeTriples += ((crm.group(1), cat))
    }

    // triples + E7 cleaning + (subj,pred,obj) dedup
    val seenT = scala.collection.mutable.LinkedHashSet.empty[(String, String, String)]
    val triples = Vector.newBuilder[(Int, String, String)]
    var tIdx = -1
    tripleSpecs.foreach { case (t, ev, fb) =>
      tIdx += 1
      val fires = ev.length > 0 && allSet(hits, ev) && !anySet(hits, fb)
      if (fires && seenT.add((t.subj, t.pred, t.obj))) {
        triples += ((tIdx, null, null))
      }
    }
    codeTriples.result().foreach { case (code, cat) =>
      if (seenT.add((code, "属于关系", cat))) {
        triples += ((-1, code, cat))
      }
    }

    // events: same firing rule; dedup by content (specs from different
    // source chunks can share an ord, so content is the identity here —
    // mirrors the reference's dedup-by-id within one extraction round).
    // The emitted ord is the within-CHUNK position (the reference's
    // event_N numbering of one extraction response, promt.py:5-7), so
    // event ids stay dense and collision-free however many source
    // specs fired.
    val seenE = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val events = Vector.newBuilder[(Int, Int)]
    var eIdx = -1
    eventSpecs.foreach { case (e, ev, fb) =>
      eIdx += 1
      if (ev.length > 0 && allSet(hits, ev) && !anySet(hits, fb) &&
          !seenE.contains(e.content)) {
        val ord = seenE.size
        seenE.put(e.content, ord)
        events += ((ord, eIdx))
      }
    }

    // event relations (E4): a spec fires when BOTH endpoint events fired
    // in this chunk (content lookup — the reference drops relations
    // referencing unknown events, event_GraphExtractor.py:190-194),
    // plus its own evidence/forbid; dedup by (head, tail, type) like
    // the history merge.
    val seenR = scala.collection.mutable.LinkedHashSet.empty[(Int, Int, String)]
    val eventRels = Vector.newBuilder[(Int, Int, Int)]
    var rIdx = -1
    eventRelSpecs.foreach { case (r, ev, fb) =>
      rIdx += 1
      (seenE.get(r.headContent), seenE.get(r.tailContent)) match {
        case (Some(h), Some(t)) if allSet(hits, ev) && !anySet(hits, fb) &&
            seenR.add((h, t, r.relationType)) =>
          eventRels += ((h, t, rIdx))
        case _ =>
      }
    }
    (mentions.result(), triples.result(), events.result(), eventRels.result())
  }
}

object TripleExtractor {

  /** Process-wide default extractor over the deterministic alias-closed
    * KB — the instance every pipeline path broadcasts. A singleton so
    * the (one-per-JVM) Aho-Corasick automaton build and KB load are
    * paid once and shared: per-call construction rebuilt the automaton
    * inside every timed run even though local-mode broadcasts share the
    * driver object by reference (on a cluster the build is per-executor
    * either way). Custom KBs (tests, fixtures) still construct their
    * own instances. */
  lazy val default: TripleExtractor =
    new TripleExtractor(KnowledgeBase.load().withAliases)

  @inline private def foldUp(c: Char): Char =
    if (c >= 'a' && c <= 'z') (c - 32).toChar else c

  @inline private[extract] def isAlnumAscii(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  @inline private def isSep(c: Char): Boolean =
    c == '-' || c == '.' || c == '_' || c == '/'

  @inline private def allAlnum(s: String, from: Int, untilExcl: Int): Boolean = {
    var i = from
    while (i < untilExcl) {
      if (!isAlnumAscii(s.charAt(i))) return false
      i += 1
    }
    true
  }

  /** End (exclusive) of a component-code match anchored at `i`, or -1.
    * Exactly the regex `(?i:KJ|XH|BJ|DZ)[-._/]?[0-9A-Za-z]{5}` at one
    * position: ASCII-folded 2-char prefix, then the greedy optional
    * separator (with-separator first; on failure the backtracked no-
    * separator path needs the separator char itself to be alphanumeric,
    * which it never is — so the two arms below are the full backtrack
    * tree). */
  @inline private def codeMatchAt(s: String, i: Int, n: Int): Int = {
    if (i + 7 > n) return -1
    val a = foldUp(s.charAt(i))
    val b = foldUp(s.charAt(i + 1))
    val pref = (a == 'K' && b == 'J') || (a == 'X' && b == 'H') ||
      (a == 'B' && b == 'J') || (a == 'D' && b == 'Z')
    if (!pref) return -1
    val j = i + 2
    if (isSep(s.charAt(j))) {
      if (j + 6 <= n && allAlnum(s, j + 1, j + 6)) j + 6 else -1
    } else if (allAlnum(s, j, j + 5)) j + 5
    else -1
  }

  /** Leftmost component-code match at or after `from`, packed as
    * (start << 32 | endExcl), or -1 if none — the hand-rolled
    * equivalent of `matcher.find(from)` on the code-mention regex
    * (see the codeRelRe comment for why). Equivalence with the regex
    * is property-tested in ExtractorSpec. */
  private[graft] def findCode(s: String, from: Int): Long = {
    val n = s.length
    var i = if (from < 0) 0 else from
    val last = n - 7
    while (i <= last) {
      val e = codeMatchAt(s, i, n)
      if (e >= 0) return (i.toLong << 32) | e.toLong
      i += 1
    }
    -1L
  }
}
