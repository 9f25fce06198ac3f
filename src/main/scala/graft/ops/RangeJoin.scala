package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to intervals. Spark plans a
  * plain `point BETWEEN lo AND hi` theta-join as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * broadcasts): every point is checked against every interval.
  *
  * The scalable encoding banded here: quantize time into fixed-width
  * buckets, explode each interval over the buckets it overlaps, and
  * equi-join points to intervals on (key, bucket) before the exact
  * range predicate. With bucket width >= the interval width each
  * interval lands in <= 2 buckets, so the join is a hash join whose
  * fan-out is bounded by per-bucket density — the same banding idea as
  * the LSH candidate joins (SURVEY.md G9), applied to time.
  */
object RangeJoin {

  /** Clicks matched to the purchase windows they fall into: each
    * purchase opens a `windowMinutes` window; emit (click, purchase)
    * for same-user clicks with purchase.ts <= click.ts < purchase.ts +
    * window. Bucket width == window width => <= 2 buckets per
    * interval. */
  def clicksInPurchaseWindow(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 60): DataFrame = {
    val winSec = windowMinutes * 60L
    val e = Tables.events(spark, sfDir)
    val bucketOf = (ts: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(ts) / winSec)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), bucketOf(col("ts")).as("bucket"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withColumn("bucket", explode(array(
        bucketOf(col("purchase_ts")), bucketOf(col("purchase_ts")) + 1)))
    // exact predicate at full timestamp precision (unix_timestamp would
    // truncate to whole seconds and wrongly exclude a click whose
    // fractional seconds cross the boundary); the second-truncated
    // bucket computation above is still a superset of candidates
    clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("click_ts") >= col("purchase_ts") &&
        col("click_ts") < col("purchase_ts") + expr(s"INTERVAL $winSec SECOND"))
      .select("click_id", "user_id", "purchase_id")
    // no dedup needed: a click has ONE bucket and the interval's two
    // buckets are distinct, so each qualifying pair joins exactly once
  }
}
