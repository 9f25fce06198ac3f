package graft.text

import org.scalatest.funsuite.AnyFunSuite

class CharsSpec extends AnyFunSuite {
  test("isWs equals Character.isWhitespace for every char") {
    var c = 0
    while (c <= 0xffff) {
      assert(Chars.isWs(c.toChar) == Character.isWhitespace(c.toChar),
        f"mismatch at U+$c%04X")
      c += 1
    }
  }
}
