package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("banded range join matches a local inequality-join oracle") {
    import spark.implicits._
    val got = RangeJoin.clicksInPurchaseWindow(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    // microsecond precision (parquet ts precision): the implementation
    // compares full-precision timestamps on both window bounds
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map { r =>
        val i = r.getAs[java.time.LocalDateTime](2).toInstant(java.time.ZoneOffset.UTC)
        (r.getLong(0), r.getLong(1),
          i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getString(3))
      }
    val clicks = ev.filter(_._4 == "click")
    val purchases = ev.filter(_._4 == "purchase")
    val expected = (for {
      c <- clicks
      p <- purchases
      if c._2 == p._2 && c._3 >= p._3 && c._3 < p._3 + 3600000000L
    } yield (c._1, c._2, p._1)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "degenerate fixture: no in-window pairs")
  }

  test("banded encoding plans as a hash join, not a nested-loop product") {
    val p = RangeJoin.clicksInPurchaseWindow(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
