package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity golden tests for the deterministic HTML->markdown
  * stage (FIXTURES.md §3): expected outputs are committed literals;
  * any byte drift in the converter fails here.
  */
class HtmlToMarkdownSpec extends AnyFunSuite {

  test("readability scoring strips link-dense boilerplate") {
    val html =
      """<html><head><title>Hello World</title></head><body>
        |<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></div>
        |<div class="content"><h1>Hello</h1><p>First paragraph, with a comma.</p><h2>Sec</h2><p>Body text here.</p></div>
        |<div class="footer"><a href="/c">C</a> <a href="/d">D</a></div>
        |</body></html>""".stripMargin
    val expected =
      """# Hello World
        |
        |# Hello
        |
        |First paragraph, with a comma.
        |
        |## Sec
        |
        |Body text here.""".stripMargin
    assert(HtmlToMarkdown(html) == expected)
  }

  test("tables verbatim, lists, code fences, images") {
    val html =
      """<html><head><title>T2</title></head><body>
        |<div id="main"><h1>T</h1><p>Intro text about things.</p>
        |<table><tr><td>A</td><td>B</td></tr></table>
        |<ul><li>one</li><li>two</li></ul>
        |<pre><code>line1
        |line2</code></pre>
        |<img src="/x.png" alt="pic"/></div>
        |<div class="f"><a href="/">x</a><a href="/">y</a></div>
        |</body></html>""".stripMargin
    val expected =
      "# T2\n\n# T\n\nIntro text about things.\n\n" +
        "<table><tr><td>A</td><td>B</td></tr></table>\n\n" +
        "* one\n* two\n\n" +
        "```\nline1\nline2\n```\n\n" +
        "![pic](/x.png)"
    assert(HtmlToMarkdown(html) == expected)
  }

  test("entity decoding incl. numeric and CJK") {
    val html = "<html><head><title>E &amp; F</title></head><body>" +
      "<div><p>&lt;b&gt; &amp; &#20013;文 &quot;q&quot;</p><p>x, y, z comma text.</p></div>" +
      "<div><a href=\"/\">n</a><a href=\"/\">m</a></div></body></html>"
    assert(HtmlToMarkdown(html) ==
      "# E & F\n\n<b> & 中文 \"q\"\n\nx, y, z comma text.")
  }

  test("nested div: inner article beats link-wrapped outer") {
    val html = "<html><head><title>N</title></head><body>" +
      "<div class=\"outer\"><a href=\"/1\">nav one</a><a href=\"/2\">nav two</a>" +
      "<div class=\"inner\"><p>Real article body, quite long, with commas, here.</p></div>" +
      "</div></body></html>"
    assert(HtmlToMarkdown(html) ==
      "# N\n\nReal article body, quite long, with commas, here.")
  }

  test("no div: falls back to body") {
    val html = "<html><head><title>B</title></head><body><p>Only text.</p></body></html>"
    assert(HtmlToMarkdown(html) == "# B\n\nOnly text.")
  }

  test("whitespace collapse inside paragraphs is stable") {
    val html = "<html><head><title>W</title></head><body><div><p>a\n   b\t c</p></div>" +
      "<div><a href=\"/\">z</a><a href=\"/\">w</a></div></body></html>"
    assert(HtmlToMarkdown(html) == "# W\n\na b c")
  }

  test("collapseWs equals the regex spec (incl. the clean fast path)") {
    // Chars.isWs ≡ Character.isWhitespace ≡ \p{javaWhitespace}; strip()
    // trims by the same predicate
    def spec(s: String): String =
      s.replaceAll("\\p{javaWhitespace}+", " ").strip()
    val alphabet = " \t\n 　ab汉 ,".toCharArray
    val rnd = new scala.util.Random(11)
    for (len <- Seq(0, 1, 2, 5, 17); _ <- 1 to 400) {
      val s = new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
      assert(HtmlToMarkdown.collapseWs(s) == spec(s),
        s.map(c => f"\\u$c%04x").mkString)
    }
    for (s <- Seq("", " ", "a", "a b", "a  b", " a", "a ", "a\nb", "汉 字"))
      assert(HtmlToMarkdown.collapseWs(s) == spec(s), s"<$s>")
  }

  test("generator pages round-trip: text column equals html conversion") {
    for (id <- 0L until 20L) {
      val p = graft.pages.PagesGenerator.page(id)
      val recomputed = HtmlToMarkdown(
        new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      assert(recomputed == p.text, s"byte drift on page $id")
    }
  }

  test("planted fragments survive conversion + normalization intact") {
    // the extraction correctness precondition at scale: a fragment
    // planted in page HTML must appear, normalized, in the converted
    // text — i.e. every evidence substring that fires on the original
    // fixture chunk also fires on the page
    import graft.extract.KnowledgeBase.normalize
    var found = 0
    for (id <- 0L until 50L) {
      val p = graft.pages.PagesGenerator.page(id)
      val normText = normalize(p.text)
      graft.pages.PagesGenerator.fragments.foreach { frag =>
        if (normText.contains(normalize(frag))) found += 1
      }
      // at least one fragment per page must be present verbatim
      assert(graft.pages.PagesGenerator.fragments.exists(f =>
        normText.contains(normalize(f))), s"page $id lost its fragments")
    }
    // strictly more hits than the per-page minimum the loop already
    // guarantees: pages carry MULTIPLE planted fragments on average, so
    // a converter regression that keeps exactly one surviving fragment
    // per page trips this even though the loop assert stays green
    assert(found > 50, s"only $found fragment hits across 50 pages")
  }
}
