package graft.text

/** Character predicates with fast paths for the hot loops (profiling
  * showed Character.isWhitespace's CharacterData00 table lookup on CJK
  * input as a top-5 CPU sink across normalize/score/collapse). */
object Chars {

  /** Exactly Character.isWhitespace, with O(1) outs for ASCII and for
    * everything above U+3000 (IDEOGRAPHIC SPACE — the highest Java
    * whitespace codepoint; CJK ideographs all sort above it). */
  @inline def isWs(c: Char): Boolean = {
    if (c < 128) c == ' ' || (c >= '\t' && c <= '\r') ||
      (c >= 28 && c <= 31)
    else if (c > '　') false
    else Character.isWhitespace(c)
  }

  /** String "less than" under CODE POINT order — identical to Spark's
    * UTF8String binary comparison, and different from Java's
    * UTF-16 code-unit `compareTo` for supplementary-plane characters
    * (a surrogate pair starts at 0xD800 and would sort before
    * U+E000..U+FFFF, but its code point sorts after all of the BMP).
    * Used wherever driver-side code must order strings the way a
    * Spark `min`/`sort_array` would. */
  def utf8Lt(a: String, b: String): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      var ca = a.charAt(i)
      var cb = b.charAt(i)
      if (ca != cb) {
        // map both into code-point order (Lucene's UTF-16→UTF-8 trick):
        // surrogates (>= 0xD800, < 0xE000) shift above the BMP tail
        if (ca >= 0xd800 && cb >= 0xd800) {
          ca = if (ca >= 0xe000) (ca - 0x800).toChar else (ca + 0x2000).toChar
          cb = if (cb >= 0xe000) (cb - 0x800).toChar else (cb + 0x2000).toChar
        }
        return ca < cb
      }
      i += 1
    }
    a.length < b.length
  }
}
