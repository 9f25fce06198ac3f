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
}
