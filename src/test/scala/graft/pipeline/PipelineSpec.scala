package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A local-FS-backed FileSystem under its own scheme — stands in for
  * hdfs://s3a:// in the resume test (zero-egress sandbox). */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

class PipelineSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.sortBy(_.name).map { f =>
      if (f.dataType == org.apache.spark.sql.types.BinaryType) md5(col(f.name))
      else col(f.name)
    }
    df.select(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  test("chunking generated pages from text equals chunking from html") {
    // the r6 run() optimization rests on this invariant: generated
    // pages carry text ≡ HtmlToMarkdown(html), so the fromHtml=false
    // chunk path (one parse per page, in the generator) must be
    // bit-identical to re-parsing the html a second time
    val pages = graft.pages.PagesGenerator.pages(spark, 200, 4)
    val fromHtml = KGPipeline.chunk(pages, fromHtml = true).collect()
      .map(_.toString).sorted.toSeq
    val fromText = KGPipeline.chunk(pages, fromHtml = false).collect()
      .map(_.toString).sorted.toSeq
    assert(fromHtml == fromText)
    assert(fromHtml.nonEmpty)
  }

  test("pipeline is deterministic under different parallelism") {
    val a = KGPipeline.run(spark, 150, partitions = 3)
    val b = KGPipeline.run(spark, 150, partitions = 7)
    assert(sortedRows(a.triples) == sortedRows(b.triples))
    assert(sortedRows(a.entities) == sortedRows(b.entities))
    assert(sortedRows(a.edges) == sortedRows(b.edges))
    // the ordinal-id tables too — events/eventEdges/mentions carry
    // within-chunk positions, exactly where a partition-order
    // dependence would first show up
    assert(sortedRows(a.mentions) == sortedRows(b.mentions))
    assert(sortedRows(a.events) == sortedRows(b.events))
    assert(sortedRows(a.eventEdges) == sortedRows(b.eventEdges))
    assert(sortedRows(a.eventRels) == sortedRows(b.eventRels))
    assert(sortedRows(a.participates) == sortedRows(b.participates))
  }

  test("alias variants merge back into base entities") {
    val r = KGPipeline.run(spark, 200, partitions = 4)
    val merged = r.entities.filter(col("n_merged_names") > 1)
    // the planted suffix/hyphen alias surfaces must not survive as
    // canonical entity names — a surviving one means a missed merge.
    // A pure CASE variant of a base MAY survive as the display name:
    // the reference's lowercase merge keeps the first-created node,
    // name included (Base_Neo4j.py:922-950), and canonicalize ports
    // that as first-writer-by-(chunkId, ord).
    val variantSet = graft.pages.PagesGenerator.aliasSurfaces.toSet
    val baseLower = graft.pages.PagesGenerator.aliasBases.map(_.toLowerCase).toSet
    val names = r.entities.select("entity_name").collect().map(_.getString(0))
    val leaked = names.filter(n =>
      variantSet.contains(n) && !baseLower.contains(n.toLowerCase))
    assert(leaked.isEmpty, s"unmerged alias variants: ${leaked.mkString(", ")}")
    assert(merged.count() > 0, "no merges happened at all")
  }

  test("edges endpoints resolve to canonical ids (no dangling)") {
    val r = KGPipeline.run(spark, 100, partitions = 4)
    val ids = r.entities.select(col("canonical_id")).distinct()
    val dangling = r.edges
      .join(ids.withColumnRenamed("canonical_id", "subj_id"), Seq("subj_id"), "left_anti")
    assert(dangling.count() == 0)
  }

  test("resume reproduces an uninterrupted run exactly") {
    val full = Files.createTempDirectory("kg_full").toString
    val part = Files.createTempDirectory("kg_part").toString
    KGJob.run(spark, 120, full, resume = false, partitions = 4)
    KGJob.run(spark, 120, part, resume = false, partitions = 4)
    def pagesMetricRows: Long = spark.read.parquet(s"$part/_metrics")
      .filter(col("stage") === "pages").count()
    val pagesRowsBefore = pagesMetricRows
    // simulate a kill after "triples": drop all downstream outputs
    Seq("entities", "name_map", "edges").foreach { s =>
      val dir = new java.io.File(s"$part/$s")
      if (dir.exists) { dir.listFiles.foreach(_.delete()); dir.delete() }
    }
    KGJob.run(spark, 120, part, resume = true, partitions = 4)
    for (t <- Seq("pages", "chunks", "mentions", "triples", "entities", "edges")) {
      val a = sortedRows(spark.read.parquet(s"$full/$t"))
      val b = sortedRows(spark.read.parquet(s"$part/$t"))
      assert(a == b, s"table $t differs after resume")
    }
    // upstream stages committed exactly once (no replays): the metrics
    // row COUNT for the stage must not grow across the resume —
    // countDistinct(committed_at) would miss a recommit landing on the
    // same coarse timestamp
    assert(pagesMetricRows == pagesRowsBefore,
      "resumed run recommitted an upstream stage")
  }

  test("entity type and display name are first-writer-wins by (chunkId, ord)") {
    import spark.implicits._
    // one name under two types and two cases: the mention with the
    // smallest (chunkId, ord) must fix both, matching the reference's
    // MERGE ... ON CREATE SET (event_graphrag_neo4j.py:336-360)
    val mentions = Seq(
      ("chunk_bb", 0, "Widget", "ToolB", "later chunk"),
      ("chunk_aa", 1, "WIDGET", "ToolA", "first chunk, second mention"),
      ("chunk_aa", 0, "widget", "ToolZ", "first chunk, first mention"),
      ("chunk_cc", 0, "Widget", "ToolC", "third chunk")
    ).toDF("chunkId", "ord", "entityName", "entityType", "entityDescription")
    val (entities, _) = graft.canon.Canonicalizer.canonicalize(mentions)
    val row = entities.select("entity_name", "entity_type", "n_mentions").head()
    assert(row.getString(0) == "widget", s"display: ${row.getString(0)}")
    assert(row.getString(1) == "ToolZ", s"type: ${row.getString(1)}")
    assert(row.getLong(2) == 4L)
    // without an ord column the per-chunk order defaults flat (ord=0)
    // but chunk order still decides deterministically
    val (e2, _) = graft.canon.Canonicalizer.canonicalize(
      mentions.drop("ord").filter(col("chunkId") =!= "chunk_aa"))
    assert(e2.select("entity_type").head().getString(0) == "ToolB")
  }

  test("resume works against a non-local filesystem scheme (Hadoop FS API)") {
    // mockfs:// resolves through the Hadoop FileSystem registry (backed
    // by the local FS); java.nio Files.exists cannot see this scheme, so
    // the test fails if the _SUCCESS probe regresses to driver-local IO
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockfs.impl", classOf[MockFs].getName)
    val dir = Files.createTempDirectory("kg_mockfs").toString
    val out = s"mockfs://$dir"
    KGJob.run(spark, 60, out, resume = false, partitions = 2)
    val m1 = spark.read.parquet(s"$out/_metrics")
      .filter(col("stage") === "pages").count()
    // resumed run: every stage already committed => no new metrics rows
    KGJob.run(spark, 60, out, resume = true, partitions = 2)
    val m2 = spark.read.parquet(s"$out/_metrics")
      .filter(col("stage") === "pages").count()
    assert(m1 == m2, "resume re-ran a committed stage through mockfs://")
    assert(spark.read.parquet(s"$out/chunks").count() > 0)
  }

  test("open-vocabulary codes: variant surfaces merge, 属于 edges resolve") {
    import org.apache.spark.sql.functions.col
    val r = KGPipeline.run(spark, 300, partitions = 4)
    val codes = r.entities.filter(col("entity_type") === "部件型号").persist()
    val n = codes.count()
    assert(n > 50, s"open vocabulary too small: $n")
    // every punctuation/case/space variant of one code embeds to the
    // same key — if two canonical entities share one, a merge was missed
    val keys = codes.select("entity_name").collect()
      .map(row => graft.canon.Canonicalizer.embedKey(row.getString(0)))
    assert(keys.distinct.length == keys.length,
      s"unmerged code variants: ${keys.diff(keys.distinct).take(5).mkString(", ")}")
    // Zipf head: hot codes were seen under >1 surface and merged
    assert(codes.filter(col("n_merged_names") > 1).count() > 0,
      "no variant merges happened in the open vocabulary")
    // the 属于 relation stream reaches the edge table with both
    // endpoints canonical (inner-join semantics drop nothing silently
    // here because category mentions are emitted alongside)
    val belongEdges = r.edges.filter(col("pred") === "属于关系")
    assert(belongEdges.count() > 0, "no 属于 edges materialized")
    codes.unpersist()
  }

  test("event-relation edges materialize non-vacuously with resolved endpoints") {
    val r = KGPipeline.run(spark, 150, partitions = 4)
    val edges = r.eventEdges.persist()
    assert(edges.count() > 0, "no event-relation edges fired (G6 vacuous)")
    // all four prompt-contract relation types reach the graph
    val types = edges.select("relation_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("时序关系", "因果关系", "层级关系", "条件关系"),
      s"missing relation types: got $types")
    // endpoints resolve to existing event nodes (MATCH-by-content
    // semantics: dangling endpoints are impossible by construction)
    val eventIds = r.events.select(col("event_id").as("head_id"))
    val dangling = edges.join(eventIds, Seq("head_id"), "left_anti")
    assert(dangling.count() == 0, "edge references a missing event")
    // no self-loops: distinct contents by construction
    assert(edges.filter(col("head_id") === col("tail_id")).count() == 0)
    edges.unpersist()
  }

  test("resume recomputes a committed stage whose schema predates required columns") {
    val dir = Files.createTempDirectory("kg_schema").toString
    KGJob.run(spark, 40, dir, resume = false, partitions = 2)
    // simulate an outDir written by an older library version: the
    // chunks stage without content_hash
    val oldDf = spark.read.parquet(s"$dir/chunks")
      .drop("content_hash").localCheckpoint(true)
    oldDf.write.mode("overwrite").parquet(s"$dir/chunks")
    // restore the (overwrite-wiped) format stamp so THIS test exercises
    // the requires guard, not the version guard
    val stampP = new org.apache.hadoop.fs.Path(s"$dir/chunks/_graft_format")
    val stampFs = stampP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stampOut = stampFs.create(stampP, true)
    try stampOut.write(Lineage.stampFor(40).getBytes("UTF-8"))
    finally stampOut.close()
    // a naive resume would reuse the stale schema and crash downstream;
    // the requires guard recomputes it instead
    KGJob.run(spark, 40, dir, resume = true, partitions = 2)
    assert(spark.read.parquet(s"$dir/chunks").columns.contains("content_hash"))
  }

  test("resume recomputes stages stamped with a different semantic format version") {
    val dir = Files.createTempDirectory("kg_fmt").toString
    KGJob.run(spark, 40, dir, resume = false, partitions = 2)
    // simulate an outDir written by an older library version: identical
    // columns, different output semantics (e.g. the event-ordinal
    // recipe behind event_id) — only the stamp can tell them apart.
    // Written through the Hadoop FS API (raw java.nio would leave the
    // LocalFileSystem's .crc sidecar stale)
    val stale = new org.apache.hadoop.fs.Path(s"$dir/events/_graft_format")
    val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(stale, true)
    try out.write("0".getBytes("UTF-8")) finally out.close()
    def metricRows(stage: String): Long = spark.read
      .parquet(s"$dir/_metrics").filter(col("stage") === stage).count()
    val (evBefore, pgBefore) = (metricRows("events"), metricRows("pages"))
    KGJob.run(spark, 40, dir, resume = true, partitions = 2)
    assert(metricRows("events") > evBefore,
      "stale-format events stage was reused on resume")
    assert(metricRows("pages") == pgBefore, "unaffected stage was recomputed")
  }

  test("resume under different tuning flags recomputes only the cfg-dependent tail") {
    val dir = Files.createTempDirectory("kg_cfgfp").toString
    KGJob.run(spark, 40, dir, resume = false, partitions = 2)
    def metricRows(stage: String): Long = spark.read
      .parquet(s"$dir/_metrics").filter(col("stage") === stage).count()
    val (entBefore, chBefore) = (metricRows("entities"), metricRows("chunks"))
    // a resumed run with a retuned canonicalization flag must NOT serve
    // the old run's entities (the flags would be silently ignored), but
    // the extraction front is cfg-independent and must be reused
    KGJob.run(spark, 40, dir, resume = true, partitions = 2,
      cfg = graft.GraftConfig.default.copy(mergeThreshold = 0.999))
    assert(metricRows("entities") > entBefore,
      "resume served entities computed under different flags")
    assert(metricRows("chunks") == chBefore,
      "cfg-independent extraction stage was recomputed on a flag change")
    // and a second resume with the SAME retuned flags reuses everything
    val entAfter = metricRows("entities")
    KGJob.run(spark, 40, dir, resume = true, partitions = 2,
      cfg = graft.GraftConfig.default.copy(mergeThreshold = 0.999))
    assert(metricRows("entities") == entAfter,
      "matching-flag resume recomputed the canonicalization tail")
  }

  test("canonicalization is a fixpoint: re-canonicalizing representatives is a no-op") {
    // if two representatives were still >= 0.95-similar they would have
    // been one component in round 1, so round 2 must produce singleton
    // components only — the dedup-idempotence property (SURVEY.md §5.2)
    val r = KGPipeline.run(spark, 150, partitions = 4)
    val asMentions = r.entities.select(
      col("entity_name").as("entityName"),
      col("entity_type").as("entityType"),
      lit("").as("entityDescription"),
      col("canonical_id").as("chunkId"))
    val (round2, _) = graft.canon.Canonicalizer.canonicalize(asMentions)
    assert(round2.count() == r.entities.count(), "entity count changed on re-run")
    assert(round2.filter(col("n_merged_names") > 1).count() == 0,
      "representatives merged again on re-run")
  }

  test("extraction on planted fragments matches a local single-threaded oracle") {
    import spark.implicits._
    val r = KGPipeline.run(spark, 80, partitions = 4)
    val got = r.triples.select("chunk_id", "subj", "pred", "obj")
      .as[(String, String, String, String)].collect().toSet
    // local oracle: same pure functions, no Spark
    val ex = new graft.extract.TripleExtractor(
      graft.extract.KnowledgeBase.load().withAliases)
    val expected = (0L until 80L).flatMap { id =>
      val p = graft.pages.PagesGenerator.page(id)
      graft.chunk.MarkdownSplitter.split(p.text).filter(_.content.nonEmpty).flatMap { s =>
        val cid = "chunk_" + java.security.MessageDigest.getInstance("MD5")
          .digest(s.content.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        ex.extract(cid, p.url, s.content)._2.map(t => (cid, t.subj, t.pred, t.obj))
      }
    }.toSet
    assert(got == expected)
  }
}
