package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven port tests for MarkdownHeaderTextSplitter semantics
  * (reference core/file_management/chunker/spliter.py:17-121). */
class MarkdownSplitterSpec extends AnyFunSuite {

  test("splits on # and ## with header levels and names") {
    val md = "# Title\nintro text\n## Section A\na body\n## Section B\nb body"
    val got = MarkdownSplitter.split(md)
    assert(got == Vector(
      Section("intro text", Header(1, "Title")),
      Section("a body", Header(2, "Section A")),
      Section("b body", Header(2, "Section B"))))
  }

  test("content before any header carries level-0 empty header") {
    val got = MarkdownSplitter.split("preamble\n# H\nbody")
    assert(got.head == Section("preamble", Header(0, "")))
  }

  test("### is NOT split by default (only #, ##) and stays in content") {
    val got = MarkdownSplitter.split("# H\n### sub\ntext")
    assert(got == Vector(Section("### sub\ntext", Header(1, "H"))))
  }

  test("header requires space or end-of-line after the prefix") {
    val got = MarkdownSplitter.split("#notaheader\n# real\nbody\n##\nafter-empty")
    assert(got(0) == Section("#notaheader", Header(0, "")))
    assert(got(1) == Section("body", Header(1, "real")))
    assert(got(2) == Section("after-empty", Header(2, "")))
  }

  test("code fences shield header-like lines") {
    val md = "# H\nbefore\n```\n# not a header\n```\nafter"
    val got = MarkdownSplitter.split(md)
    assert(got == Vector(
      Section("before\n```\n# not a header\n```\nafter", Header(1, "H"))))
  }

  test("~~~ fences work too") {
    val md = "# H\n~~~\n## inside\n~~~\nout"
    val got = MarkdownSplitter.split(md)
    assert(got.length == 1 && got.head.content.contains("## inside"))
  }

  test("a line with two ``` does not open a fence (reference quirk)") {
    val md = "# H\n```code```\n## S\nbody"
    val got = MarkdownSplitter.split(md)
    assert(got == Vector(
      Section("```code```", Header(1, "H")),
      Section("body", Header(2, "S"))))
  }

  test("non-printable chars are stripped for header matching only") {
    val md = "\u0000# H\u0007\nbody"   // NUL and BEL around the header line
    val got = MarkdownSplitter.split(md)
    assert(got == Vector(Section("body", Header(1, "H"))))
  }

  test("stripHeaders=false keeps header line plus extra newline") {
    val got = MarkdownSplitter.split("# H\nbody", stripHeaders = false)
    assert(got == Vector(Section("# H\n\nbody", Header(1, "H"))))
  }

  test("chunkSize slices long section content") {
    val got = MarkdownSplitter.split("# H\n" + "x" * 10, chunkSize = 4)
    assert(got.map(_.content) == Vector("xxxx", "xxxx", "xx"))
    assert(got.forall(_.header == Header(1, "H")))
  }

  test("longest-prefix match wins: ## before #") {
    val got = MarkdownSplitter.split("## Only\nbody")
    assert(got == Vector(Section("body", Header(2, "Only"))))
  }

  test("total coverage: every non-header line appears in exactly one section") {
    val md = (1 to 50).map {
      case i if i % 7 == 0 => s"# H$i"
      case i if i % 5 == 0 => s"## S$i"
      case i => s"line $i"
    }.mkString("\n")
    val got = MarkdownSplitter.split(md)
    val lines = got.flatMap(_.content.split("\n")).filter(_.nonEmpty)
    val expected = (1 to 50).filter(i => i % 7 != 0 && i % 5 != 0).map(i => s"line $i")
    assert(lines == expected)
  }

  test("isPrintable fast paths equal the getType reference over the whole BMP") {
    // the original getType-only implementation is the executable spec;
    // the ASCII/CJK fast paths must not change a single char's answer
    // on the RUNNING JDK's Unicode tables (U+9FFD-U+9FFF are assigned
    // only from Unicode 14, so they must keep following getType)
    def reference(c: Char): Boolean =
      if (c == ' ') true
      else Character.getType(c) match {
        case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
             Character.PRIVATE_USE | Character.UNASSIGNED |
             Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR |
             Character.SPACE_SEPARATOR => false
        case _ => true
      }
    var c = 0
    while (c <= Char.MaxValue) {
      assert(MarkdownSplitter.isPrintable(c.toChar) == reference(c.toChar),
        f"U+$c%04X")
      c += 1
    }
  }
}
