package graft.html

import scala.collection.mutable

/** Deterministic HTML -> markdown text extraction: the Spark-side
  * reimplementation of the reference HtmlParser._parser_html pipeline
  * (reference core/file_management/parser/html_parser.py:26-38:
  * readability main-content extraction + markdownify ATX + "# {title}"
  * prefix). This is the byte-identity stage — a pure function used in a
  * narrow Dataset.map, no UDF nondeterminism.
  *
  * Supported HTML subset (documented per SURVEY.md §7.4 — the invariant
  * is evaluated on the generator corpus whose dialect this covers):
  *
  *  - title: text of the first <title> element;
  *  - main-content selection (readability-style scoring): every <div> /
  *    <article> is scored `textLen - 3*anchorTextLen + 2*commas` (both
  *    ASCII and CJK commas) and the best block wins (first on ties) —
  *    link-dense nav/footer boilerplate loses to article bodies;
  *  - conversion (ATX): h1..h6 -> "#"*n; p/div -> paragraph; li -> "* ";
  *    pre/code -> ``` fence; img -> ![alt](src); a -> bare text;
  *    <table> blocks are preserved verbatim as single-line inline HTML
  *    (the form the reference corpus carries tables in — see the golden
  *    fixture chunks); all other markup stripped, text kept;
  *  - entities: amp/lt/gt/quot/apos/nbsp + numeric;
  *  - output: "# {title}\n\n{markdown}" with paragraphs separated by
  *    exactly one blank line and no trailing whitespace.
  */
object HtmlToMarkdown {

  sealed trait Tok
  /** `selfClose` = element has no close tag (void or XML-style);
    * `literalSlash` = the source spelled a trailing "/" (preserved on
    * re-serialization so table-embedded content round-trips bytewise).
    * Attributes stay as the raw source slice and parse lazily: only
    * `img` handling and table re-serialization ever read them, and the
    * per-tag regex parse was the tokenizer's hottest allocation.
    *
    * NOTE on equality: case-class equality keys on the RAW attribute
    * slice, so `<td >` != `<td>` and attribute order/quoting matter —
    * unlike the pre-round-4 parsed-map form. No call site compares Open
    * tokens (pattern matching only); documented so a future comparer
    * doesn't assume map semantics. */
  final case class Open(name: String, attrsRaw: String,
      selfClose: Boolean, literalSlash: Boolean = false) extends Tok {
    lazy val attrs: Map[String, String] =
      if (attrsRaw.isEmpty) Map.empty else parseAttrs(attrsRaw)
  }
  final case class Close(name: String) extends Tok
  final case class Text(s: String) extends Tok

  def apply(html: String): String = {
    val toks = tokenize(html)
    val title = firstText(toks, "title").map(t => decode(t).strip()).getOrElse("")
    val body = selectContent(toks)
    val md = convert(body)
    s"# $title\n\n$md"
  }

  // --- tokenizer ---------------------------------------------------------

  def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { out += Text(html.substring(i)); i = n }
      else {
        if (lt > i) out += Text(html.substring(i, lt))
        val gt = html.indexOf('>', lt)
        if (gt < 0) { out += Text(html.substring(lt)); i = n }
        else {
          // tag parse by INDEX into html — the former substring+trim+
          // drop chain allocated 3-4 intermediate strings per tag
          // (~26 GB sampled at 1M pages). Trim semantics = String.trim
          // (chars <= U+0020), applied at the same points as before.
          var s = lt + 1
          var e = gt
          while (s < e && html.charAt(s) <= ' ') s += 1
          while (e > s && html.charAt(e - 1) <= ' ') e -= 1
          if (e - s >= 3 && html.charAt(s) == '!' &&
              html.charAt(s + 1) == '-' && html.charAt(s + 2) == '-') {
            // comment: skip to -->
            val end = html.indexOf("-->", lt)
            i = if (end < 0) n else end + 3
          } else if (s < e && html.charAt(s) == '/') {
            // close tag: name = raw.drop(1).trim (trailing already clean)
            var cs = s + 1
            while (cs < e && html.charAt(cs) <= ' ') cs += 1
            out += Close(html.substring(cs, e).toLowerCase)
            i = gt + 1
          } else if (s == e) {
            i = gt + 1
          } else {
            val selfClose = html.charAt(e - 1) == '/'
            var ce = if (selfClose) e - 1 else e // core = raw.dropRight(1).trim
            while (ce > s && html.charAt(ce - 1) <= ' ') ce -= 1
            var sp = s
            while (sp < ce && !Character.isWhitespace(html.charAt(sp))) sp += 1
            val name = html.substring(s, if (sp < ce) sp else ce).toLowerCase
            val attrsRaw = if (sp < ce) html.substring(sp + 1, ce) else ""
            val void = name == "img" || name == "br" || name == "hr" || name == "meta" || name == "link" || name == "input"
            out += Open(name, attrsRaw, selfClose || void, selfClose)
            i = gt + 1
          }
        }
      }
    }
    out.result()
  }

  // compiled once — attr parsing runs per open tag in the hot path
  private val attrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s"'>]+))""".r

  private def parseAttrs(s: String): Map[String, String] = {
    val m = mutable.LinkedHashMap.empty[String, String]
    for (g <- attrRe.findAllMatchIn(s)) {
      val v = Option(g.group(3)).orElse(Option(g.group(4))).orElse(Option(g.group(5))).getOrElse("")
      m(g.group(1).toLowerCase) = v
    }
    m.toMap
  }

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s // fast path: nothing to decode
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 8) {
          s.substring(i + 1, semi) match {
            case "amp" => sb += '&'; i = semi + 1
            case "lt" => sb += '<'; i = semi + 1
            case "gt" => sb += '>'; i = semi + 1
            case "quot" => sb += '"'; i = semi + 1
            case "apos" => sb += '\''; i = semi + 1
            case "nbsp" => sb += ' '; i = semi + 1
            case e if e.startsWith("#") =>
              val code = try {
                if (e.startsWith("#x") || e.startsWith("#X")) Integer.parseInt(e.drop(2), 16)
                else Integer.parseInt(e.drop(1))
              } catch { case _: NumberFormatException => -1 }
              if (code >= 0) { sb.appendAll(Character.toChars(code)); i = semi + 1 }
              else { sb += c; i += 1 }
            case _ => sb += c; i += 1
          }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def firstText(toks: Vector[Tok], tag: String): Option[String] = {
    val start = toks.indexWhere { case Open(`tag`, _, false, _) => true; case _ => false }
    if (start < 0) None
    else {
      val sb = new StringBuilder
      var i = start + 1
      var done = false
      while (i < toks.length && !done) {
        toks(i) match {
          case Close(`tag`) => done = true
          case Text(t) => sb ++= t
          case _ =>
        }
        i += 1
      }
      Some(sb.toString)
    }
  }

  // --- readability-style content selection -------------------------------

  private val blockTags = Set("div", "article", "main", "section")

  /** Spans (start, end) of candidate block elements, with end exclusive
    * of the closing tag token. */
  private def candidateSpans(toks: Vector[Tok]): Vector[(Int, Int, String)] = {
    val spans = Vector.newBuilder[(Int, Int, String)]
    val stack = mutable.Stack.empty[(String, Int)]
    // indexed loop: zipWithIndex materialized a tuple Vector per page
    // (~11 GB sampled at 1M pages — pure garbage on the hot parse path)
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Open(nm, _, false, _) if blockTags(nm) => stack.push((nm, i))
        case Close(nm) if blockTags(nm) && stack.nonEmpty && stack.top._1 == nm =>
          val (_, s) = stack.pop()
          spans += ((s + 1, i, nm))
        case _ =>
      }
      i += 1
    }
    spans.result()
  }

  def score(toks: Vector[Tok]): Double = score(toks, 0, toks.length)

  /** Range form: candidate spans nest, so scoring them in place (no
    * per-candidate `slice` copy) keeps selection linear in span bytes. */
  private def score(toks: Vector[Tok], from: Int, until: Int): Double = {
    var textLen = 0
    var anchorLen = 0
    var commas = 0
    var inAnchor = 0
    var i = from
    while (i < until) {
      toks(i) match {
        case Open("a", _, false, _) => inAnchor += 1
        case Close("a") => if (inAnchor > 0) inAnchor -= 1
        case Text(t) =>
          // manual loop: StringOps.count boxes every char via an
          // unspecialized Char => Boolean (hot path, every text token)
          val d = decode(t)
          var j = 0
          var len = 0
          while (j < d.length) {
            val c = d.charAt(j)
            if (!graft.text.Chars.isWs(c)) len += 1
            if (c == ',' || c == '，' || c == '、') commas += 1
            j += 1
          }
          textLen += len
          if (inAnchor > 0) anchorLen += len
        case _ =>
      }
      i += 1
    }
    textLen - 3.0 * anchorLen + 2.0 * commas
  }

  /** Pick the best-scoring candidate block; fall back to <body>, then to
    * the whole token stream. */
  def selectContent(toks: Vector[Tok]): Vector[Tok] = {
    val cands = candidateSpans(toks)
    if (cands.nonEmpty) {
      val best = cands.maxBy { case (s, e, _) =>
        (score(toks, s, e), -s.toDouble)
      }
      toks.slice(best._1, best._2)
    } else {
      val b = toks.indexWhere { case Open("body", _, false, _) => true; case _ => false }
      if (b >= 0) {
        val e = toks.lastIndexWhere { case Close("body") => true; case _ => false }
        toks.slice(b + 1, if (e > b) e else toks.length)
      } else toks
    }
  }

  // --- ATX markdown conversion -------------------------------------------

  /** h1..h6 level, or 0 — the regex-unapply form ran a Pattern match
    * per open tag in the conversion loop. */
  @inline private def headingLevel(name: String): Int =
    if (name.length == 2 && name.charAt(0) == 'h' &&
      name.charAt(1) >= '1' && name.charAt(1) <= '6') name.charAt(1) - '0'
    else 0

  def convert(toks: Vector[Tok]): String = {
    val blocks = Vector.newBuilder[String]
    val para = new StringBuilder
    var i = 0

    def flushPara(): Unit = {
      val t = collapseWs(para.toString)
      if (t.nonEmpty) blocks += t
      para.clear()
    }

    /** Collect decoded text until the matching close of `tag`. */
    def inner(tag: String, from: Int): (String, Int) = {
      val sb = new StringBuilder
      var depth = 1
      var j = from
      while (j < toks.length && depth > 0) {
        toks(j) match {
          case Open(`tag`, _, false, _) => depth += 1
          case Close(`tag`) => depth -= 1
          case Text(t) if depth > 0 => sb ++= decode(t)
          case _ =>
        }
        j += 1
      }
      (sb.toString, j)
    }

    /** Raw HTML span until matching close (inclusive), re-serialized
      * compactly on one line. */
    def rawSpan(tag: String, openTok: Open, from: Int): (String, Int) = {
      val sb = new StringBuilder
      sb ++= serializeOpen(openTok)
      var depth = 1
      var j = from
      while (j < toks.length && depth > 0) {
        toks(j) match {
          case o @ Open(nm, _, sc, _) =>
            if (nm == tag && !sc) depth += 1
            sb ++= serializeOpen(o)
          case Close(nm) =>
            if (nm == tag) depth -= 1
            sb ++= s"</$nm>"
          case Text(t) => sb ++= collapseWs(t)
        }
        j += 1
      }
      (sb.toString, j)
    }

    while (i < toks.length) {
      toks(i) match {
        case o @ Open(name, _, selfClose, _) =>
          val hLvl = headingLevel(name)
          name match {
            case _ if hLvl > 0 && !selfClose =>
              flushPara()
              val (t, j) = inner(name, i + 1)
              blocks += ("#" * hLvl) + " " + collapseWs(t)
              i = j
            case "p" | "blockquote" if !selfClose =>
              flushPara()
              val (t, j) = inner(name, i + 1)
              val c = collapseWs(t)
              if (c.nonEmpty) blocks += c
              i = j
            case "li" if !selfClose =>
              flushPara()
              val (t, j) = inner(name, i + 1)
              blocks += "* " + collapseWs(t)
              i = j
            case "pre" if !selfClose =>
              flushPara()
              val (t, j) = inner(name, i + 1)
              blocks += "```\n" + t.strip() + "\n```"
              i = j
            case "img" =>
              flushPara()
              val alt = decode(o.attrs.getOrElse("alt", ""))
              val src = decode(o.attrs.getOrElse("src", ""))
              blocks += s"![$alt]($src)"
              i += 1
            case "table" if !selfClose =>
              flushPara()
              val (raw, j) = rawSpan("table", o, i + 1)
              blocks += raw
              i = j
            case "br" =>
              flushPara(); i += 1
            case "div" | "section" | "article" | "main" | "ul" | "ol" =>
              flushPara(); i += 1
            case _ => i += 1
          }
        case Close("div") | Close("section") | Close("article") | Close("main") |
             Close("ul") | Close("ol") | Close("p") =>
          flushPara(); i += 1
        case Close(_) => i += 1
        case Text(t) => para ++= decode(t); i += 1
      }
    }
    flushPara()
    // assemble in ONE builder: consecutive "* " items join with "\n"
    // (list grouping), everything else with "\n\n" — byte-identical to
    // the former group-then-mkString("\n\n") but without the merged
    // Vector, the per-group drop/takeWhile copies, and the final join
    // copy (~25 GB of sampled garbage at 1M pages)
    val bs = blocks.result()
    val out = new java.lang.StringBuilder
    var k = 0
    var prevLi = false
    while (k < bs.length) {
      val b = bs(k)
      val isLi = b.startsWith("* ")
      if (k > 0) out.append(if (prevLi && isLi) "\n" else "\n\n")
      out.append(b)
      prevLi = isLi
      k += 1
    }
    out.toString.strip()
  }

  private def serializeOpen(o: Open): String = {
    // attr-less tags (most table-inner cells) never force the lazy parse
    val attrs =
      if (o.attrsRaw.isEmpty) ""
      else o.attrs.map { case (k, v) => s""" $k="$v"""" }.mkString
    val slash = if (o.literalSlash || (o.selfClose && o.name == "img")) "/" else ""
    s"<${o.name}$attrs$slash>"
  }

  /** Whitespace-run collapse without regex (hot path: every text token
    * flows through here). Semantics identical to
    * `replaceAll("\\p{javaWhitespace}+", " ").strip()` (Chars.isWs ≡
    * Character.isWhitespace — property-pinned in HtmlToMarkdownSpec).
    * Zero-allocation fast path for
    * the already-clean string (no edge whitespace, no runs, spaces
    * only) — the common case for CJK text tokens, and JFR measured the
    * rebuild at ~4% of extraction-stage CPU. */
  def collapseWs(s: String): String = {
    val n = s.length
    var i = 0
    var clean = true
    var prevWs = true // doubles as the leading-edge check
    while (clean && i < n) {
      val c = s.charAt(i)
      if (graft.text.Chars.isWs(c)) {
        if (c != ' ' || prevWs) clean = false else prevWs = true
      } else prevWs = false
      i += 1
    }
    if (clean && !prevWs) return s // prevWs here = trailing whitespace
    if (clean && n == 0) return s
    collapseWsSlow(s)
  }

  private def collapseWsSlow(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (graft.text.Chars.isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
