package graft.sink

import graft.SparkSpec
import graft.pipeline.KGPipeline
import org.apache.spark.sql.functions._

class GraphSinkSpec extends SparkSpec {

  private lazy val result = KGPipeline.run(spark, 150, partitions = 4)

  test("nodes carry the three labels; edges exactly the six types") {
    val labels = GraphSink.nodes(result).select("label").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels == Set("Chunk", "Event", "Entity"))
    // SET equality, not contains(): losing a union branch in
    // GraphSink.edges (or emitting an unexpected extra type) must fail
    val types = GraphSink.edges(result).select("edge_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("CONTAINS", "MENTIONS", "PARTICIPATES_IN",
      "ENTITY_RELATION", "SIMILAR_TO", "EVENT_RELATION"), types.toString)
  }

  test("edge endpoints resolve to existing nodes (no dangling)") {
    val nodeIds = GraphSink.nodes(result).select(col("node_id")).distinct()
    val e = GraphSink.edges(result)
    val danglingSrc = e.join(nodeIds, e("src") === nodeIds("node_id"), "left_anti")
    val danglingDst = e.join(nodeIds, e("dst") === nodeIds("node_id"), "left_anti")
    assert(danglingSrc.count() == 0)
    assert(danglingDst.count() == 0)
  }

  test("write partitions by class; stats match; delete-by-class drops a partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    GraphSink.write(result, dir)
    val nodesBack = spark.read.parquet(s"$dir/nodes")
    val statRows = GraphSink.stats(result).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val entityCount = nodesBack.filter(col("label") === "Entity").count()
    assert(statRows(("node", "Entity")) == entityCount)
    assert(new java.io.File(s"$dir/nodes/label=Event").isDirectory)
    GraphSink.deleteClass(spark, dir, "Event")
    assert(!new java.io.File(s"$dir/nodes/label=Event").exists())
    // remaining classes untouched
    val after = spark.read.parquet(s"$dir/nodes")
      .select("label").distinct().collect().map(_.getString(0)).toSet
    assert(after == Set("Chunk", "Entity"))
  }

  test("deleteClass resolves the target PATH's filesystem (mockfs scheme)") {
    // same registry trick as the Lineage resume test: a mockfs://
    // scheme backed by RawLocalFileSystem — FileSystem.get(conf) (the
    // default FS) would not resolve it, path.getFileSystem must
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockfs.impl", classOf[graft.pipeline.MockFs].getName)
    val local = java.nio.file.Files.createTempDirectory("graft_sink_mockfs")
    java.nio.file.Files.createDirectories(local.resolve("nodes/label=Event"))
    java.nio.file.Files.writeString(
      local.resolve("nodes/label=Event/part-0"), "x")
    GraphSink.deleteClass(spark, s"mockfs://$local", "Event")
    assert(!java.nio.file.Files.exists(local.resolve("nodes/label=Event")),
      "partition under the non-default scheme was not dropped")
  }
}
