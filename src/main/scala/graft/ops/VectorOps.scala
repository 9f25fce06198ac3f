package graft.ops

import graft.Tables
import graft.embed.CosineSimilarity
import graft.lsh.HyperplaneLSH
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search family over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT) — the Spark
  * re-expression of the reference's FAISS dense retrieval
  * (reference encapsulation/database/vector_db/VectorStore_Faiss.py:
  * 225-274 search, 16-62 MMR; SURVEY.md §2.5 R3-R5).
  *
  * Exact brute-force is the correctness baseline (oracle-checkable);
  * the hyperplane-LSH variant is the scale path: candidates come from
  * an equi-join on LSH table keys instead of a full cross product, then
  * the exact cosine verifies candidates only (same pattern as entity
  * canonicalization G9). Cosine runs through the codegen'd
  * [[CosineSimilarity]] expression in both paths.
  */
object VectorOps {

  /** Exact top-k cosine neighbors for each query vector (vec_id <
    * nQueries), excluding self. Queries are broadcast (bounded set);
    * candidates stream through one narrow pass per query batch —
    * no shuffle until the per-query top-k.
    *
    * Scores are intentionally NOT emitted: engines disagree at ~1e-8
    * (float vs double accumulation), ranks are stable (measured rank-
    * boundary gaps >= 2e-5 on the testdata). Rank ties broken by
    * vec_id for cross-engine determinism.
    */
  def annTopK(spark: SparkSession, sfDir: String,
      k: Int = 10, nQueries: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        CosineSimilarity(col("embedding"), col("qv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** LSH-bucketed approximate top-k: candidates = vectors sharing at
    * least one hyperplane-LSH table key with the query, verified by
    * exact cosine, then per-query top-k. The equi-join on `bucket`
    * replaces the cross product — the 10^12-scale path. Approximate by
    * design (no SQL oracle; P(candidate | cos) set by table/bit params
    * in [[HyperplaneLSH]]). */
  def annTopKLsh(spark: SparkSession, sfDir: String,
      k: Int = 10, nQueries: Int = 10): DataFrame = {
    val bucketsUdf = udf((v: Seq[Float]) => HyperplaneLSH.tableKeys(v.toArray))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        explode(bucketsUdf(col("embedding"))).as("bucket"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket"))
    val cands = emb
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("embedding"), col("qv"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    cands
      .withColumn("cos", CosineSimilarity(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) with
    * cosine >= threshold. Exact all-pairs — the oracle-checkable
    * baseline; the threshold (0.4) sits >= 1e-5 away from every pair in
    * the testdata so float-vs-double engine differences cannot flip
    * membership. At web scale the LSH candidate join (annTopKLsh
    * machinery) replaces the cross product. */
  def nearDupPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(CosineSimilarity(col("ea"), col("eb")) >= threshold)
      .select("vec_a", "vec_b")
  }

  /** MMR re-selection (reference VectorStore_Faiss.py:16-62): fetch the
    * top `fetchK` candidates for the query vector, then greedily pick k
    * maximizing lambda*sim(q,d) - (1-lambda)*max sim(d, selected).
    * Inherently sequential over <= fetchK rows, so the greedy loop runs
    * on the driver (same as the reference); candidate fetch is
    * distributed. Deterministic: ties broken by vec_id. */
  def mmrRerank(spark: SparkSession, sfDir: String, queryId: Long = 0L,
      k: Int = 10, fetchK: Int = 20, lambdaMult: Double = 0.5): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val qv = emb.filter(col("vec_id") === queryId)
      .select("embedding").head().getSeq[Float](0).toArray
    val cands = emb.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        CosineSimilarity(col("embedding"), typedLit(qv.toSeq)).as("cos"),
        col("embedding"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(fetchK)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val scoredNow = remaining.map { case (id, simQ, v) =>
        val maxSel = if (selected.isEmpty) 0.0
          else selected.map { case (_, sid) =>
            val sv = cands.find(_._1 == sid).get._3
            graft.embed.HashingEmbedder.cosine(v, sv)
          }.max
        (lambdaMult * simQ - (1 - lambdaMult) * maxSel, id, simQ, v)
      }
      val pick = scoredNow.maxBy { case (s, id, _, _) => (s, -id) }
      selected += ((selected.length + 1, pick._2))
      remaining --= remaining.filter(_._1 == pick._2)
    }
    selected.toSeq.toDF("rank", "vec_id")
  }
}
