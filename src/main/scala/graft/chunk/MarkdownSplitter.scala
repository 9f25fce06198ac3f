package graft.chunk

/** A markdown section emitted by the header splitter. */
final case class Header(level: Int, name: String)
final case class Section(content: String, header: Header)

/** Header-based markdown splitter, semantics-equivalent to the
  * reference MarkdownHeaderTextSplitter
  * (reference core/file_management/chunker/spliter.py:17-121):
  *
  *  - split on configured header prefixes (longest-first match), a
  *    header line must be the prefix alone or prefix + space;
  *  - lines are header-matched on their *stripped, printable-filtered*
  *    form (spliter.py:60-61) but accumulated raw;
  *  - code-fence awareness: ``` opens only when the stripped line starts
  *    with ``` and contains exactly one occurrence; ~~~ opens
  *    unconditionally on prefix; the closing line is NOT treated as
  *    inside the block (spliter.py:63-77);
  *  - each flushed section is joined with "\n" and Unicode-stripped;
  *  - optional fixed-size slicing of section content (spliter.py:43-47);
  *  - `stripHeaders=false` keeps the stripped header line plus an extra
  *    "\n" in content (spliter.py:110-111).
  *
  * Pure function: used inside Dataset.flatMap — a narrow, deterministic,
  * order-preserving transform.
  */
object MarkdownSplitter {

  /** Python str.isprintable semantics: false for Cc/Cf/Cs/Co/Cn and
    * Zl/Zp/Zs — except the ASCII space. Fast paths cover the two char
    * classes that dominate the corpus (visible ASCII and CJK Unified
    * Ideographs, both always printable) before the general
    * `Character.getType` lookup, which JFR measured at ~4% of
    * extraction-stage CPU when taken per char. */
  def isPrintable(c: Char): Boolean = {
    if (c >= ' ' && c <= '~') true // visible ASCII + space (0x7F is Cc, excluded)
    // CJK Unified Ideographs U+4E00-U+9FA5: assigned since Unicode 1.0,
    // so always-printable on EVERY JDK. The block tail U+9FA6-U+9FFF
    // (added Unicode 4.1-14.0) falls through to getType so the answer
    // tracks the running JDK's Unicode tables exactly — a wider
    // hardcoded bound would diverge from getType on pre-JDK-15 runtimes
    // (round-4 ADVICE). The tail is rare in real text; the fast path
    // still covers the whole working CJK range.
    else if (c >= 0x4E00 && c <= 0x9FA5) true
    else Character.getType(c) match {
      case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
           Character.PRIVATE_USE | Character.UNASSIGNED |
           Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR |
           Character.SPACE_SEPARATOR => false
      case _ => true
    }
  }

  def split(
      text: String,
      headersToSplitOn: Seq[String] = Seq("#", "##"),
      stripHeaders: Boolean = true,
      chunkSize: Int = 0): Vector[Section] = {

    val seps = headersToSplitOn.sortBy(-_.length)
    val out = Vector.newBuilder[Section]
    // section lines accumulate straight into one builder ('\n'-joined)
    // instead of a Vector[String] + mkString per section — the join and
    // the vector were ~18 GB of sampled garbage at 1M pages; `hasLines`
    // preserves the content.nonEmpty flush gate (a section of one empty
    // line must still flush — sb.length alone cannot tell them apart)
    val content = new java.lang.StringBuilder
    var hasLines = false
    var header = Header(0, "")
    var inCode = false
    var fence = ""

    def slices(s: String): Vector[String] =
      if (chunkSize <= 0) Vector(s)
      else s.grouped(chunkSize).toVector

    def addLine(l: String): Unit = {
      if (hasLines) content.append('\n')
      content.append(l)
      hasLines = true
    }

    def flush(): Unit = {
      if (hasLines) {
        val sectionText = content.toString.strip()
        slices(sectionText).foreach(c => out += Section(c, header))
        content.setLength(0)
        hasLines = false
      }
    }

    for (line <- text.split("\n", -1)) {
      val stripped = strippedPrintable(line)

      if (!inCode) {
        if (stripped.startsWith("```") &&
            countOccurrences(stripped, "```") == 1) {
          inCode = true; fence = "```"
        } else if (stripped.startsWith("~~~")) {
          inCode = true; fence = "~~~"
        }
      } else if (stripped.startsWith(fence)) {
        inCode = false; fence = ""
      }

      if (inCode) {
        addLine(line)
      } else {
        val matched = seps.find(sep =>
          stripped.startsWith(sep) &&
            (stripped.length == sep.length || stripped.charAt(sep.length) == ' '))
        matched match {
          case Some(sep) =>
            flush()
            val level = sep.count(_ == '#')
            header = Header(level, stripped.drop(sep.length).strip())
            if (!stripHeaders) addLine(stripped + "\n")
          case None =>
            addLine(line)
        }
      }
    }
    flush()
    out.result()
  }

  /** `line.strip().filter(isPrintable)` without the per-char boxing of
    * StringOps.filter, with a zero-allocation fast path for the common
    * all-printable line (this runs once per input line — the hottest
    * loop of the chunker per profile). */
  private def strippedPrintable(line: String): String = {
    val t = line.strip()
    var i = 0
    while (i < t.length && isPrintable(t.charAt(i))) i += 1
    if (i == t.length) t
    else {
      val sb = new java.lang.StringBuilder(t.length)
      sb.append(t, 0, i)
      i += 1
      while (i < t.length) {
        val c = t.charAt(i)
        if (isPrintable(c)) sb.append(c)
        i += 1
      }
      sb.toString
    }
  }

  private def countOccurrences(s: String, sub: String): Int = {
    var n = 0; var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }
}
