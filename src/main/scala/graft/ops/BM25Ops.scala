package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational BM25 (SURVEY.md §2.5 R1): the reference wraps rank_bm25's
  * BM25Okapi with a whitespace `text.split()` preprocess
  * (reference core/retrieval/bm25.py:16-25,151-238 via from_texts; scoring
  * get_scores -> argsort -> top-k at :276-317). This is the same math as a
  * join + aggregate over a postings table:
  *
  *   idf_raw(t) = ln((N - df + 0.5) / (df + 0.5))
  *   idf(t)     = idf_raw < 0 ? epsilon * avg(idf_raw over vocab) : idf_raw
  *   score(d)   = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  *
  * with BM25Okapi defaults k1=1.5, b=0.75, epsilon=0.25 (incl. the
  * negative-idf epsilon flooring quirk, ported exactly).
  *
  * Scale shape: postings = one explode + two hash aggregates; scoring =
  * a semi-join on the (tiny, broadcast) query-term list, then a
  * groupBy(doc) sum — no cross product, no per-doc loop. Top-k is
  * TakeOrderedAndProject.
  */
object BM25Ops {

  val K1 = 1.5
  val B = 0.75
  val Epsilon = 0.25

  /** (doc_id, tok) with repetitions — `text.split()` semantics. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(
      when(length(trim(col("text"))) === 0, array())
        .otherwise(split(trim(col("text")), "\\s+"))).as("tok"))

  /** Top-k docs for a fixed query-term list. Emits (doc_id, rank,
    * score rounded to 6dp); ranking ties broken by doc_id. */
  def topK(spark: SparkSession, sfDir: String,
      query: Seq[String] = Seq("spark", "join", "vector"),
      k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    okapiTopK(spark, docs, tokens(docs), query, k)
  }

  /** CJK-aware BM25 (the reference demonstrates jieba pre-tokenization
    * for Chinese as BM25's `preprocess_func` plug-in —
    * examples/test/tantivy_example.py:10-12, core/retrieval/bm25.py:
    * 85-89). Whitespace splitting scores zh sentences as single tokens;
    * this variant segments with [[graft.text.ZhTokenizer]]: greedy
    * longest-match over a broadcast-in-the-plan lexicon, compiled to an
    * alternation regex whose semantics are identical in Java regex and
    * RE2 — so the DuckDB oracle runs the very same pattern. The corpus
    * is the deterministic zh page text ([[zhCorpus]]). */
  def topKZh(spark: SparkSession,
      query: Seq[String] = Seq("蒸发器设计规范", "质量", "整改"),
      k: Int = 20, nPages: Long = 400): DataFrame = {
    val docs = zhCorpus(spark, nPages)
    val toks = docs.select(col("doc_id"), explode(
        regexp_extract_all(col("text"),
          lit(graft.text.ZhTokenizer.pattern), lit(0))).as("tok"))
      // drop whitespace fallback tokens (class spelled explicitly:
      // Java \s and RE2 \s disagree on U+000B)
      .filter(!col("tok").rlike("^[ \\t\\n\\x0B\\f\\r]$"))
    okapiTopK(spark, docs, toks, query, k)
  }

  /** Deterministic zh corpus: the synthetic pages' markdown text
    * (zh-language pages only) — the pipeline's own input, so the BM25
    * oracle can re-read it from the Verify dump. */
  def zhCorpus(spark: SparkSession, nPages: Long = 400): DataFrame = {
    import spark.implicits._
    spark.range(0, nPages, 1, 8).map { id =>
      val p = graft.pages.PagesGenerator.page(id)
      (id, p.text, p.lang)
    }.toDF("doc_id", "text", "lang")
      .filter(col("lang") === "zh")
      .select("doc_id", "text")
  }

  /** Lazy scoring plans for PlanSpec pins — the public entries collect
    * their ≤ k rows (so callers can't accidentally re-run the corpus
    * tokenization uncached), which would make their plans opaque
    * LocalTableScans; the joins to pin live here. Leaves `toks` cached
    * (test-scope use only). */
  private[graft] def topKPlanForTest(spark: SparkSession, sfDir: String,
      query: Seq[String] = Seq("spark", "join", "vector"),
      k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    okapiRanked(spark, docs, tokens(docs).persist(), query, k)
  }

  private[graft] def topKZhPlanForTest(spark: SparkSession,
      query: Seq[String] = Seq("蒸发器设计规范", "质量", "整改"),
      k: Int = 20, nPages: Long = 400): DataFrame = {
    val docs = zhCorpus(spark, nPages)
    val toks = docs.select(col("doc_id"), explode(
        regexp_extract_all(col("text"),
          lit(graft.text.ZhTokenizer.pattern), lit(0))).as("tok"))
      .filter(!col("tok").rlike("^[ \\t\\n\\x0B\\f\\r]$"))
    okapiRanked(spark, docs, toks.persist(), query, k)
  }

  /** Okapi scoring over a prepared (doc_id, tok) stream. The ≤ k result
    * rows are collected BEFORE the finally releases toks (driver-sized
    * by construction): the returned frame was previously lazy, and the
    * caller's later action re-ran the whole corpus tokenization
    * UNCACHED once per consumer branch (tf + dl — measured ~4 s of pure
    * recompute on the zh path, whose corpus is itself generated; same
    * collect-then-localize discipline as writtenStats /
    * withZeroAnchor). */
  private def okapiTopK(spark: SparkSession, docs: DataFrame,
      toks0: DataFrame, query: Seq[String], k: Int): DataFrame = {
    val toks = toks0.persist()
    try {
      import spark.implicits._
      val rows = okapiRanked(spark, docs, toks, query, k)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      rows.toSeq.toDF("doc_id", "rank", "score")
    } finally toks.unpersist()
  }

  /** The lazy ranked plan over a CACHED token stream (factored out so
    * PlanSpec keeps pinning the join strategy after the collect move). */
  private def okapiRanked(spark: SparkSession, docs: DataFrame,
      toks: DataFrame, query: Seq[String], k: Int): DataFrame = {
      val nDocs = docs.count().toDouble
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      // rank_bm25 semantics: avgdl = total token count / CORPUS size
      // (BM25Okapi._initialize: num_doc / corpus_size) — averaging over
      // only docs that produced tokens would inflate avgdl whenever the
      // corpus contains empty documents (their dl is 0, not absent)
      val avgdl = toks.count().toDouble / nDocs

      val df = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val withIdfRaw = df.withColumn("idf_raw",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)))
      val avgIdf = withIdfRaw.agg(avg("idf_raw")).head().getDouble(0)
      val idf = withIdfRaw.withColumn("idf",
        when(col("idf_raw") < 0, lit(Epsilon * avgIdf)).otherwise(col("idf_raw")))

      val queryDf = {
        import spark.implicits._
        // distinct: a repeated query term would otherwise duplicate
        // (tok, idf) rows AND double-count tf through the joins; the
        // oracle's `tok IN (...)` has set semantics, matched here
        query.distinct.toDF("tok")
      }
      val tf = toks
        .join(broadcast(queryDf), Seq("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // Restrict idf to the query terms BEFORE broadcasting: the idf
      // aggregate covers the whole corpus vocabulary (multi-GB at web
      // scale), but the scoring join only ever probes |query| rows of it.
      // Semi-joining against the tiny query frame first makes the
      // broadcast side <= |query| rows instead of |vocabulary|.
      val idfQ = idf.join(broadcast(queryDf), Seq("tok")).select("tok", "idf")
      val scored = tf
        .join(broadcast(idfQ), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .withColumn("contrib",
          col("idf") * col("tf") * lit(K1 + 1) /
            (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))))
        .groupBy("doc_id")
        .agg(round(sum("contrib"), 6).as("score"))
      // top-k first (TakeOrderedAndProject — no global single-partition
      // window over the full scored set), then rank the k survivors
      import org.apache.spark.sql.expressions.Window
      scored
        .orderBy(desc("score"), asc("doc_id"))
        .limit(k)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("score"), asc("doc_id"))))
        .select("doc_id", "rank", "score")
  }

}
