package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoundedAggSpec extends SparkSpec {

  test("distinctMin equals slice(sort_array(collect_set))") {
    import spark.implicits._
    // groups with duplicates, skew (one hot group), nulls absent by schema
    val rows = (0 until 5000).map { i =>
      val g = if (i % 3 == 0) "hot" else s"g${i % 17}"
      (g, f"v${(i * 7919) % 200}%03d")
    }
    val df = rows.toDF("g", "v").repartition(7)
    val a = df.groupBy("g")
      .agg(BoundedAgg.distinctMin(col("v"), 8).as("s"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val b = df.groupBy("g")
      .agg(slice(sort_array(collect_set("v")), 1, 8).as("s"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(a.toSeq == b.toSeq)
  }

  test("distinctMin matches Spark ordering on supplementary-plane strings") {
    import spark.implicits._
    // U+FFFF sorts BEFORE U+20000 in UTF-8/code-point order but AFTER
    // it under Java compareTo — the cap must cut the same way Spark's
    // sort_array does
    val vals = Seq("a", "￿", "𠀀", "", "b", "𠀁")
    val df = vals.map(("g", _)).toDF("g", "v")
    val a = df.groupBy("g").agg(BoundedAgg.distinctMin(col("v"), 3).as("s"))
      .head().getSeq[String](1)
    val b = df.groupBy("g").agg(slice(sort_array(collect_set("v")), 1, 3).as("s"))
      .head().getSeq[String](1)
    assert(a == b)
  }

  test("two-phase distinctMinFlat equals single-phase over the union") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => (s"k${i % 5}", i % 13, f"c${i % 40}%02d"))
    val df = rows.toDF("k", "salt", "v").repartition(5)
    val twoPhase = df.groupBy("k", "salt")
      .agg(BoundedAgg.distinctMin(col("v"), 8).as("partial"))
      .groupBy("k")
      .agg(BoundedAgg.distinctMinFlat(col("partial"), 8).as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val onePhase = df.groupBy("k")
      .agg(slice(sort_array(collect_set("v")), 1, 8).as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(twoPhase.toSeq == onePhase.toSeq)
  }
}
