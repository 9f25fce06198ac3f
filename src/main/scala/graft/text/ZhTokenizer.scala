package graft.text

/** Dictionary-based Chinese segmentation as a single regex — the
  * deterministic, cross-engine form of the reference's jieba
  * pre-tokenization plug-in (reference examples/test/tantivy_example
  * .py:10-12; `preprocess_func` slot at core/retrieval/bm25.py:85-89).
  *
  * Mechanism: lexicon entries sorted longest-first become one ordered
  * alternation `(?:w1|w2|…|[\s\S])`. Regex alternation is
  * leftmost-FIRST in both Java regex and RE2 (verified: `(?:a|ab)` on
  * "ab" yields "a" in both), and scanning resumes after each match —
  * so `regexp_extract_all` over this pattern IS a greedy longest-match
  * segmenter, with single-character fallback for out-of-vocabulary
  * text (jieba's OOV behavior). Because the same pattern string runs
  * in Spark (Java regex) and DuckDB (RE2), the BM25-zh oracle is an
  * exact cross-engine check, not an approximation.
  *
  * At scale the lexicon is a driver-built constant folded into the
  * plan (equivalently: a broadcast); segmentation stays a narrow
  * per-row map with no shuffle.
  */
object ZhTokenizer {

  /** Corpus function words beyond the KB entity names (generator
    * filler vocabulary — see PagesGenerator.fillerZh). */
  private val commonWords = Vector(
    "质量", "通报", "生产", "过程", "情况", "整改", "进展", "部门",
    "要求", "落实", "措施", "反馈", "内容", "公司", "内部", "技术",
    "文件", "记录", "管理", "体系", "问题", "闭环", "数据", "来源",
    "产线", "检验", "供应商", "来料", "报告", "摘录", "相关", "部件",
    "详见", "附录", "编号", "首页", "标准", "设计", "规范", "蒸发器")

  /** Only regex-metachar-free entries (CJK + ASCII alphanumerics) are
    * admitted, so the alternation needs no escaping in either engine. */
  private val safe = "[\\p{IsHan}A-Za-z0-9]+".r

  /** Lexicon: KB entity names + corpus function words, longest first
    * (makes leftmost-first == longest-match), ties lexicographic. */
  lazy val lexicon: Vector[String] = {
    val kbNames = graft.extract.KnowledgeBase.load().entities.map(_.name)
    (kbNames ++ commonWords)
      .filter(w => safe.matches(w))
      .distinct
      .sortBy(w => (-w.length, w))
  }

  /** The segmentation pattern (identical semantics in Java and RE2). */
  lazy val pattern: String =
    lexicon.mkString("(?:", "|", "|[\\s\\S])")

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  /** Local segmentation (Java regex) — test oracle and driver-side use. */
  def tokenize(text: String): Vector[String] = {
    val m = compiled.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) {
      val t = m.group()
      if (!(t.length == 1 && " \t\n\u000B\f\r".indexOf(t.charAt(0)) >= 0))
        out += t
    }
    out.result()
  }
}
