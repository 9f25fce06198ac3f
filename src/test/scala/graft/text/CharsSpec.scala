package graft.text

import org.scalatest.funsuite.AnyFunSuite

class CharsSpec extends AnyFunSuite {
  test("utf8Lt equals unsigned UTF-8 byte order on surrogate/BMP boundary cases") {
    def utf8Cmp(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    val cases = Seq("", "a", "z", "é", "　", "", "￿",
      "𠀀", "z￿", "z𠀀", "𠀀a", "￿a")
    for (a <- cases; b <- cases)
      assert(graft.text.Chars.utf8Lt(a, b) == (utf8Cmp(a, b) < 0),
        s"utf8Lt(${a.map(c => f"\\u${c.toInt}%04x").mkString}, " +
          s"${b.map(c => f"\\u${c.toInt}%04x").mkString})")
  }

  test("isWs equals Character.isWhitespace for every char") {
    var c = 0
    while (c <= 0xffff) {
      assert(Chars.isWs(c.toChar) == Character.isWhitespace(c.toChar),
        f"mismatch at U+$c%04X")
      c += 1
    }
  }
}
