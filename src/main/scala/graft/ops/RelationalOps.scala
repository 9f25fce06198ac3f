package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational operator family the reference engine uses implicitly
  * (SURVEY.md §2.6): hash aggregation with set semantics, anti/semi
  * joins (the resume/idempotence primitive), dimension joins, window
  * top-k per group, global top-k, and RRF rank fusion
  * (reference core/utils/Fusion.py:35-76).
  *
  * Each query is written scale-first:
  *  - aggregations are partial-aggregated map-side by Catalyst (hash agg),
  *  - small dimension tables are broadcast explicitly,
  *  - top-k is orderBy+limit => TakeOrderedAndProject (no full sort),
  *  - anti/semi joins avoid materializing the non-qualifying side.
  */
object RelationalOps {

  /** Hash aggregate with set-union semantics — the Spark form of the
    * reference's per-name entity upsert (event_graphrag_neo4j.py:324-371):
    * first-writer-wins becomes min(), list-append-if-absent becomes
    * count(DISTINCT). Grouped on a low-cardinality key => map-side
    * partial aggregation carries almost all the reduction. */
  def aggUpsert(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(
        countDistinct("source").as("n_sources"),
        count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"),
        sum("n_chars").as("total_chars"))

  /** TPC-H Q1-shaped aggregation; sums stay exact (integer-valued or
    * rounded) so the external oracle compare is bit-stable. */
  def aggPricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("count_order"),
        round(avg("l_discount"), 6).as("avg_disc"))

  /** Global top-k: TakeOrderedAndProject — never a full shuffle sort. */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Per-group top-k via window row_number (reference KNN topK=10 per
    * node, event_graphrag_neo4j.py:641-646). Deterministic tie-break. */
  def windowTopPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
    Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** Left-anti join — the reference's chunk-exists resume filter
    * (Base_Neo4j.py:109-158): rows with no match on the right. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("o_orderkey"))
    o.join(l, Seq("o_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
  }

  /** Left-semi join — the reference's relation-endpoint validity check
    * (event_GraphExtractor.py:349-361). */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir).select(col("l_partkey").as("p_partkey"))
    p.join(l, Seq("p_partkey"), "left_semi").select("p_partkey", "p_name", "p_size")
  }

  /** Star join: fact x two broadcast dims, then hash agg. nation/region
    * are tiny => explicit broadcast, no shuffle on the dimension side. */
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select("o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
  }

  /** ROLLUP over the Q1 aggregation: per-(flag, status) subtotals plus
    * per-flag and grand totals in ONE shuffle (Catalyst expands the
    * grouping sets map-side; no second pass over the fact table).
    * grouping_id disambiguates subtotal levels from real NULL keys. */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("count_order"),
        grouping_id().as("gid"))

  /** CUBE over orders: all 2^2 grouping sets of (status, priority) in
    * one aggregate — the "counts by every class combination" G14-style
    * statistic generalized. */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"),
        grouping_id().as("gid"))

  /** Reciprocal-rank fusion of two retrieval orderings
    * (reference Fusion.py:35-76: score = sum 1/(60+rank), dedup by doc,
    * sort desc, top-k). Rankings: by n_chars and by fingerprint — two
    * independent deterministic signals over the same corpus. */
  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars", "text")
    // Top-k FIRST (TakeOrderedAndProject, scales), then rank the k rows —
    // a global row_number over the full corpus would serialize one task.
    val byChars = docs
      .orderBy(desc("n_chars"), asc("doc_id")).limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("n_chars"), asc("doc_id"))))
    // doc_id tie-break on BOTH the cut and the rank: duplicate texts
    // hash identically (the corpus contains exact-dup groups by
    // construction), and an md5-only order would make both the top-50
    // SET and the rank assignment within a tie partition-order-
    // dependent — intermittent divergence from the deterministic oracle
    val byHash = docs
      .withColumn("h", md5(col("text")))
      .orderBy(asc("h"), asc("doc_id")).limit(50)
      .withColumn("rank",
        row_number().over(Window.orderBy(asc("h"), asc("doc_id"))))
    byChars.select("doc_id", "rank")
      .unionByName(byHash.select("doc_id", "rank"))
      .groupBy("doc_id")
      .agg(round(sum(lit(1.0) / (lit(60) + col("rank"))), 9).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(20)
  }
}
