package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Physical-plan audits: the scale-critical plan properties the design
  * relies on (SURVEY.md §4.2-4.3), asserted so a refactor that silently
  * loses them fails CI rather than a 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Collect file scans through AQE wrappers: `AdaptiveSparkPlanExec` and
    * `QueryStageExec` are leaves to `collect`, so descend explicitly. */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten

  private def allExprs(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allExprs(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allExprs(s.plan)
      case op => op.expressions.map(_.toString)
    }.flatten

  test("global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val p = plan(RelationalOps.topK(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("star join broadcasts the dimension tables (no fact-side shuffle join)") {
    val p = plan(RelationalOps.joinAgg(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("column pruning reaches the parquet scan (2-column projection reads 2 columns)") {
    val p = plan(graft.SparkEntry.textStats(spark, sf0001))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("query-vector predicate pushes down to the embeddings scan") {
    val p = plan(VectorOps.annTopK(spark, sf0001))
    assert(p.contains("LessThan(vec_id,10)"), p)
  }

  test("anti join plans as a join, not a filter-after-materialize") {
    val p = plan(RelationalOps.antiJoin(spark, sf0001))
    assert(p.contains("LeftAnti"), p)
  }

  test("triple endpoint rewrite broadcasts the name map (no triple-stream shuffle join)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val triples = Seq(("c1", "a", "属于关系", "b", ""), ("c2", "b", "属于关系", "a", ""))
      .toDF("chunkId", "subj", "pred", "obj", "description")
    val nameMap = Seq(("a", 1L), ("b", 2L)).toDF("entity_name", "canonical_id")
      .localCheckpoint(true)
    val p = plan(graft.canon.Canonicalizer.rewriteTriples(triples, nameMap))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("zh BM25 scoring joins stay broadcast on the query/idf side") {
    // the public entries collect their <= k rows (r6: the lazy frame
    // re-ran the corpus tokenization uncached per consumer branch), so
    // the pins target the factored-out lazy scoring plan they execute
    val p = plan(BM25Ops.topKZhPlanForTest(spark, nPages = 50))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("BM25 broadcasts query-term-restricted idf, not the full vocabulary") {
    // every broadcast exchange whose output carries the idf column must
    // have the query-term LocalTableScan in its subtree: the broadcast
    // side is then <= |query| rows, never the corpus-vocabulary aggregate
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val df = BM25Ops.topKPlanForTest(spark, sf0001)
    val builds = df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec =>
        j.buildSide match { case BuildLeft => j.left; case BuildRight => j.right }
    }
    val idfSides = builds.filter(_.output.exists(_.name == "idf"))
    assert(idfSides.nonEmpty, df.queryExecution.sparkPlan.toString)
    idfSides.foreach { b =>
      assert(b.collectLeaves().exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
        s"idf broadcast side is not query-term-restricted:\n$b")
    }
  }

  test("dense_lsh probe reuses the cached bucket index: no per-query corpus UDF") {
    // materialize once (the retriever default), then the probe plan must
    // be a filter on `bucket` over the cached index — not a fresh
    // embeddings scan + per-row LSH UDF (round-3 verdict #2)
    VectorOps.lshBucketIndexCached(spark, sf0001).count() // warm the cache
    val df = graft.retrieval.DenseRetriever.lshRetriever()
      .retrieve(spark, sf0001, "spark join vector", 10)
    val p = plan(df)
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.toLowerCase.contains("bucket"), p)
    // structural: the probe tree itself reads NO source scan (the plan
    // STRING shows one inside the InMemoryRelation's cached-child
    // printout, which is the build-once cost, not the probe). MUST
    // descend through the AQE wrapper ([[fileScans]]): a plain
    // executedPlan.collect sees AdaptiveSparkPlanExec as a leaf and
    // both asserts below would be vacuously true. Checks BOTH scan
    // families (v1 FileSourceScanExec AND DSv2 BatchScanExec) so a
    // datasource-routing change cannot make the assert vacuous again.
    def sourceScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          sourceScans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          sourceScans(s.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
      }.flatten
    val probeScans = sourceScans(df.queryExecution.executedPlan)
    assert(probeScans.isEmpty, probeScans.mkString(", "))
    // the UDF may appear inside the InMemoryRelation's CACHED child plan
    // printout; what matters is no UDF executes per probe — assert the
    // probe's own operators (everything above the cache scan) carry
    // none. Same AQE-aware descent, stopping at the cache scan (its
    // own attributes are the cached columns, not probe-side exprs).
    def probeExprs(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          probeExprs(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          probeExprs(s.plan)
        case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq.empty[String]
        case other => other.expressions.map(_.toString)
      }.flatten
    val exprs = probeExprs(df.queryExecution.executedPlan)
    assert(exprs.nonEmpty, "probe-plan traversal saw no operators — vacuous")
    assert(!exprs.exists(_.contains("UDF")), exprs.mkString("\n"))
  }

  test("durable LSH index probe: partition-pruned scan, no UDF, same top-k") {
    // the cross-job form of the bucket index: written once partitioned
    // by bucket, a probe's `bucket IN (<= 16 keys)` must plan as a
    // PARTITION filter (<= 16 of ~4096 directories read) with no UDF
    // and no corpus scan, and return exactly the cached-path top-k
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx").toString
    try {
      VectorOps.writeLshBucketIndex(spark, sf0001, dir)
      val qv = graft.retrieval.DenseRetriever.queryVec("spark join vector").toArray
      val viaIdx = VectorOps.lshTopKForVector(spark, sf0001, qv, 10,
        index = Some(VectorOps.readLshBucketIndex(spark, dir)))
      val viaCache = VectorOps.lshTopKForVector(spark, sf0001, qv, 10)
      assert(viaIdx.collect().toSeq == viaCache.collect().toSeq)
      // the retriever surface reaches the same durable index
      val viaRetriever = graft.retrieval.DenseRetriever.lshRetriever(Some(dir))
        .retrieve(spark, sf0001, "spark join vector", 10)
      assert(viaRetriever.collect().toSeq == viaIdx.collect().toSeq)
      val scans = fileScans(viaIdx.queryExecution.executedPlan)
      assert(scans.nonEmpty, plan(viaIdx))
      scans.foreach { s =>
        assert(s.partitionFilters.nonEmpty,
          s"probe scan has no partition filter:\n$s")
        assert(s.partitionFilters.exists(_.toString.contains("bucket")),
          s.partitionFilters.mkString(", "))
      }
      // metrics filled by the collect above: the scan must have touched
      // at most one partition per LSH table
      val touched = scans.flatMap(_.metrics.get("numPartitions")).map(_.value)
      assert(touched.nonEmpty && touched.sum <= graft.lsh.HyperplaneLSH.Tables,
        s"partitions read: $touched")
      val exprs = allExprs(viaIdx.queryExecution.executedPlan)
      assert(!exprs.exists(_.contains("UDF")), exprs.mkString("\n"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("durable IVF index probe: partition-pruned list scan, no UDF, agrees with in-memory path") {
    // symmetric with the durable LSH index: assignments written once
    // partitioned by list_id; a probe's `list_id IN (nprobe ids)` must
    // plan as a partition filter and return the same neighbors as the
    // in-memory ivfTopK (same deterministic centroids by construction)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    try {
      IvfIndex.writeIvfIndex(spark, sf0001, dir)
      val qv = graft.Tables.embeddings(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
        .collect().head.getSeq[Float](1).toArray
      val viaIdx = IvfIndex.ivfTopKForVector(spark, dir, qv, k = 11)
      // the probe includes the query vector itself (cos 1.0); drop it
      val got = viaIdx.collect().map(_.getLong(0)).filter(_ != 0L).take(10).toSeq
      val mem = IvfIndex.ivfTopK(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("query_id") === 0L)
        .orderBy("rank").collect().map(_.getLong(2)).toSeq
      assert(got == mem, s"durable probe $got != in-memory $mem")
      val scans = fileScans(viaIdx.queryExecution.executedPlan)
      assert(scans.nonEmpty, plan(viaIdx))
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.toString.contains("list_id")),
          s"probe scan not partition-pruned on list_id:\n$s")
      }
      assert(!allExprs(viaIdx.queryExecution.executedPlan)
        .exists(_.contains("UDF")), plan(viaIdx))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dense retrieval scans the precomputed embeddings table with no corpus UDF") {
    val df = new graft.retrieval.DenseRetriever()
      .retrieve(spark, sf0001, "spark join vector", 50)
    val p = plan(df)
    assert(p.contains("embeddings.parquet"), p)
    assert(!p.contains("UDF"), p) // embedder runs only on the query string
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("durable multi-query LSH probe equals the in-memory annTopKLsh, partition-pruned") {
    // the driver-graded ann_topk_lsh_durable query: one partition-pruned
    // scan serves all 10 queries, rows identical to the in-memory path
    // (same shared-table-key candidate rule, same exact-cosine rank)
    val durable = VectorOps.annTopKLshDurable(spark, sf0001)
    val mem = VectorOps.annTopKLsh(spark, sf0001)
    assert(durable.collect().map(_.toString).sorted.toSeq ==
      mem.collect().map(_.toString).sorted.toSeq)
    val scans = fileScans(durable.queryExecution.executedPlan)
      .filter(_.toString.contains("graft_lsh_idx"))
    assert(scans.nonEmpty, plan(durable))
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.toString.contains("bucket")),
        s"durable probe scan not partition-pruned on bucket:\n$s")
    }
  }

  test("durable multi-query IVF probe equals the in-memory ivfTopK, partition-pruned") {
    val durable = IvfIndex.ivfTopKDurable(spark, sf0001)
    val mem = IvfIndex.ivfTopK(spark, sf0001)
    assert(durable.collect().map(_.toString).sorted.toSeq ==
      mem.collect().map(_.toString).sorted.toSeq)
    val scans = fileScans(durable.queryExecution.executedPlan)
      .filter(_.toString.contains("graft_ivf_idx"))
    assert(scans.nonEmpty, plan(durable))
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.toString.contains("list_id")),
        s"durable probe scan not partition-pruned on list_id:\n$s")
    }
  }

  test("lsh bucket index cache keys on the canonical path (one copy per dir)") {
    val a = VectorOps.lshBucketIndexCached(spark, sf0001)
    val b = VectorOps.lshBucketIndexCached(spark, sf0001 + "/")
    val c = VectorOps.lshBucketIndexCached(spark,
      "/root/testdata/../testdata/sf0.001")
    assert((a eq b) && (a eq c),
      "same dir under different spellings built separate cached indexes")
  }
}
