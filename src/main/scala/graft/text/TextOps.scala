package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline:
  * token counting, quality scoring, language-ID heuristics, document
  * fingerprinting. All are pure Catalyst column expressions (codegen'd,
  * no UDFs) so they stay inside whole-stage codegen and the parquet
  * scan only reads the referenced columns.
  *
  * Reference semantics: whitespace tokenization mirrors RAG-ARC's BM25
  * default preprocess (reference core/retrieval/bm25.py:16-25); the
  * fingerprint mirrors its md5 chunk identity
  * (encapsulation/database/graph_db/Base_Neo4j.py:95-107).
  *
  * Every function here has a 1:1 ANSI-SQL equivalent (used as the
  * DuckDB oracle in SparkEntry.oracleSql) so correctness is externally
  * checkable.
  */
object TextOps {

  /** Whitespace token count over trimmed text; empty string counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** Characters outside printable ASCII (anything > U+007E or < U+0020). */
  def nonAsciiCount(text: Column): Column =
    length(regexp_replace(text, "[\\x20-\\x7e]", "")).cast("long")

  /** Count of ASCII punctuation characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")).cast("long")

  /** Count of ASCII digits. */
  def digitCount(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("long")

  /** Mean whitespace-token length (0.0 for empty text), rounded to 6dp. */
  def meanTokenLen(text: Column): Column = {
    val nTok = tokenCount(text)
    val charLen = length(regexp_replace(text, "\\s+", "")).cast("double")
    round(when(nTok === 0, lit(0.0)).otherwise(charLen / nTok), 6)
  }

  /** Stopword sets for the language-ID vote (disjoint across languages
    * so each token votes for at most one language). */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "mit", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "con", "para"))

  /** Exact token-match count of any word in `words` over the
    * whitespace-tokenized, lowercased text. */
  def stopwordVotes(text: Column, words: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => words.map(w => t === lit(w)).reduce(_ || _)))
  }

  /** Heuristic language ID: script ratio first (CJK => zh), then a
    * stopword vote among {en, de, fr, es} on whitespace tokens, with a
    * fixed en>de>fr>es tie-break. Deterministic, column-only,
    * oracle-expressible.
    */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val total = greatest(length(text), lit(1))
    val en = stopwordVotes(text, langStopwords("en"))
    val de = stopwordVotes(text, langStopwords("de"))
    val fr = stopwordVotes(text, langStopwords("fr"))
    val es = stopwordVotes(text, langStopwords("es"))
    when(cjk * lit(10) > total, lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Quality score in [0,1]: penalizes very short docs, high punctuation
    * and digit ratios; rewards healthy mean token length. Deterministic
    * arithmetic, rounded to 6dp so the oracle compare is exact.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val len = greatest(length(text), lit(1)).cast("double")
    val punctRatio = punctCount(text) / len
    val digitRatio = digitCount(text) / len
    val lenScore = least(nTok / lit(20.0), lit(1.0))
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl >= 3 && mtl <= 10, lit(1.0)).otherwise(lit(0.5))
    round(lenScore * mtlScore * (lit(1.0) - least(punctRatio * 2, lit(1.0)))
      * (lit(1.0) - least(digitRatio * 2, lit(1.0))), 6)
  }

  /** BPE-style pre-tokenizer pattern (the GPT-2 family shape:
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs) restricted to constructs with identical
    * semantics in Java regex and RE2, so the DuckDB oracle can run the
    * same pattern. Two deliberate deviations from the GPT-2 original:
    * whitespace-run tokens are not counted (the `\s+(?!\S)` / `\s+`
    * alternatives are dropped — RE2 has no lookahead), and the
    * whitespace class is spelled explicitly because Java's `\s`
    * includes U+000B while RE2's does not. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"

  /** BPE-ish token count: number of non-whitespace pre-tokenizer
    * matches. Unlike the whitespace count, CJK text tokenizes as
    * letter runs and punctuation separates — the closer proxy for
    * model token cost (exact BPE would additionally count whitespace
    * runs of length >= 2). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  /** Normalized-content fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text (rolling-hash stand-in that is
    * exactly reproducible in any SQL engine).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** RAG-ARC chunk identity: "chunk_" + md5(content)[:8]
    * (reference Base_Neo4j.py:95-107). */
  def chunkId(content: Column): Column =
    concat(lit("chunk_"), substring(md5(content), 1, 8))
}
