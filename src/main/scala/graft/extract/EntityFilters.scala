package graft.extract

/** Entity kill-list, a faithful port of the reference's pre-filter
  * (reference core/file_management/extractor/event_GraphExtractor.py:242-312):
  * pure numbers/decimals, CJK date-time tokens, temporal adverbs,
  * interrogatives, pronouns, quantifiers, degree words, conjunctions,
  * punctuation-only strings, single characters, and digit+punct-only
  * names are dropped. Pure function, used inside the extractor and as a
  * column predicate.
  */
object EntityFilters {

  private val patterns: Vector[scala.util.matching.Regex] = Vector(
    "^\\d+$",
    "^\\d+\\.\\d+$",
    "^\\d+年$", "^\\d+月$", "^\\d+日$", "^\\d+时$", "^\\d+分$", "^\\d+秒$",
    "^(昨天|今天|明天|上午|下午|晚上|现在|刚才|马上|立刻|立即)$",
    "^(这个|那个|什么|怎么|为什么|哪里|何时|如何|哪个|哪些)$",
    "^(我|你|他|她|它|我们|你们|他们|她们|它们)$",
    "^(一些|许多|几个|大量|少量|很多|很少|不少|不多)$",
    "^(很|非常|特别|极其|十分|相当|比较|稍微|略微)$",
    "^(和|或|但是|因为|所以|如果|虽然|尽管|然而|而且)$",
    "^[！？。，；：“”‘’（）【】《》\\s]+$",
    "^.$"
  ).map(_.r)

  private val digitPunct = "^[\\d\\s.,;:!?()\\[\\]{}“”‘’\\-_]+$".r

  /** True if the entity name survives the kill-list. (Python re.match
    * anchors at the start only; all patterns carry their own ^...$, so
    * lookingAt is equivalent.) */
  def keep(name: String): Boolean = {
    val t = name.strip()
    t.nonEmpty &&
      t.length > 1 &&
      !patterns.exists(_.pattern.matcher(t).lookingAt()) &&
      !digitPunct.pattern.matcher(name).lookingAt()
  }
}
