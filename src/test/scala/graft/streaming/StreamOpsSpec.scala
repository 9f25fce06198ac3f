package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming extract: exactly-once per distinct chunk across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[graft.pages.Page]
    val q = StreamOps.streamingExtract(input.toDS())
      .writeStream.format("memory").queryName("sx")
      .outputMode(OutputMode.Append).start()
    try {
      val batch1 = (0L until 5L).map(graft.pages.PagesGenerator.page)
      input.addData(batch1: _*)
      q.processAllAvailable()
      val n1 = spark.table("sx").count()
      // batch 2 re-sends pages 0-2 (re-crawl) plus two new pages: only
      // the NEW distinct chunk contents may emit extraction rows
      val batch2 = (0L until 3L).map(graft.pages.PagesGenerator.page) ++
        (5L until 7L).map(graft.pages.PagesGenerator.page)
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("sx")
      // expected: one row per distinct chunk content over pages 0-6
      val expected = (0L until 7L).flatMap { id =>
        val p = graft.pages.PagesGenerator.page(id)
        graft.chunk.MarkdownSplitter.split(p.text)
          .filter(_.content.nonEmpty)
          .map(s => graft.pipeline.KGPipeline.md5Hex(s.content))
      }.toSet
      assert(got.count() == expected.size,
        s"stream emitted ${got.count()} rows for ${expected.size} distinct chunks")
      assert(got.count() > n1, "second batch added no new chunks — vacuous")
      // extraction payload matches the batch extractor for a sample
      // chunk (output schema == the batch extraction STAGING table —
      // compact spec-index arrays — so the batch consolidation can
      // consume the appended stream directly and expand it)
      val ex = new graft.extract.TripleExtractor(
        graft.extract.KnowledgeBase.load().withAliases)
      val sample = got.filter(size(col("triples")) > 0)
        .select("chunk_id", "content_hash", "triples").head()
      val chunkContent = (0L until 7L).iterator.flatMap { id =>
        val p = graft.pages.PagesGenerator.page(id)
        graft.chunk.MarkdownSplitter.split(p.text).map(_.content)
      }.find(c => graft.pipeline.KGPipeline.md5Hex(c) == sample.getString(1)).get
      val batchTriples = ex.extractAll(sample.getString(0), "u", chunkContent)
        ._2.map(t => (t.subj, t.pred, t.obj, t.description))
      val streamTriples = sample.getSeq[org.apache.spark.sql.Row](2)
        .map(r => ex.expandTriple((r.getInt(0), r.getString(1), r.getString(2))))
      assert(streamTriples.toVector == batchTriples)
    } finally q.stop()
  }

  test("stream-append + batch consolidation equals the pure-batch pipeline") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // stream pages (with a re-crawled overlap) into a parquet staging
    // table, run the SHARED batch consolidation over the staged rows,
    // and require the result — through canonicalization and the edge
    // rewrite — to equal the pure-batch pipeline over the same pages
    val input = MemoryStream[graft.pages.Page]
    val staging = java.nio.file.Files.createTempDirectory("sx_staging").toString
    val q = StreamOps.streamingExtract(input.toDS())
      .writeStream.format("parquet")
      .option("path", s"$staging/tbl")
      .option("checkpointLocation", s"$staging/ckpt")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((0L until 40L).map(graft.pages.PagesGenerator.page): _*)
      q.processAllAvailable()
      input.addData((20L until 60L).map(graft.pages.PagesGenerator.page): _*)
      q.processAllAvailable()
    } finally q.stop()

    val cons = graft.pipeline.KGPipeline.consolidate(
      spark.read.parquet(s"$staging/tbl"))
    val batch = graft.pipeline.KGPipeline.runOnPages(spark,
      graft.pages.PagesGenerator.pages(spark, 60L, 4))

    def setOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(setOf(cons.mentions) == setOf(batch.mentions), "mentions diverge")
    assert(setOf(cons.triples) == setOf(batch.triples), "triples diverge")
    assert(setOf(cons.events) == setOf(batch.events), "events diverge")
    assert(setOf(graft.pipeline.KGPipeline.eventEdges(cons.events, cons.eventRels))
      == setOf(batch.eventEdges), "event edges diverge")

    // canonicalization + endpoint rewrite over the consolidated stream
    val (ents, nm0) = graft.canon.Canonicalizer.canonicalize(
      cons.mentions.withColumnRenamed("chunk_id", "chunkId"))
    val cols = Seq("canonical_id", "entity_name", "entity_type",
      "n_mentions", "n_merged_names")
    assert(setOf(ents.select(cols.head, cols.tail: _*))
      == setOf(batch.entities.select(cols.head, cols.tail: _*)),
      "canonical entities diverge")
    val nm = nm0.localCheckpoint(true)
    val edges = graft.canon.Canonicalizer.rewriteTriples(
      cons.triples.withColumnRenamed("chunk_id", "chunkId"), nm)
    val eCols = Seq("subj_id", "pred", "obj_id", "n_sources")
    assert(setOf(edges.select(eCols.head, eCols.tail: _*))
      == setOf(batch.edges.select(eCols.head, eCols.tail: _*)),
      "canonical edges diverge")
  }

  test("windowed counts over a memory stream match the batch aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedCounts(events)
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = Seq(
        (ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 3.0),
        (ts(65), "click", 4.0))
      input.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close the first hour
      input.addData((ts(300), "late", 0.0))
      q.processAllAvailable()
      val got = spark.table("wc")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = rows.toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("s"))
        .select(col("window.start"), col("event_type"), col("n"), col("s"))
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // two-sided: (a) every closed window the batch aggregate expects
      // was appended ("late" is the watermark-advancer, its window never
      // closes); (b) every appended row matches the batch aggregate
      // exactly — one-sided subset would let spurious or wrong-window
      // stream rows pass unnoticed
      assert(batch.filter(_._2 != "late").subsetOf(got),
        s"closed windows must match batch semantics: got=$got batch=$batch")
      assert(got.subsetOf(batch),
        s"stream emitted rows absent from the batch aggregate: got=$got batch=$batch")
      assert(got.exists(_._2 == "click"))
    } finally q.stop()
  }

  test("watermarked dedup drops duplicate event ids within the horizon") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("event_id", "ts")
    val q = StreamOps.dedupStream(events)
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)), (2L, ts(2)), (3L, ts(3)))
      q.processAllAvailable()
      val ids = spark.table("dd").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize accumulates per-user counts via mapGroupsWithState") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamOps.Click]
    val q = StreamOps.sessionize(input.toDS(), gapMs = 0L)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(StreamOps.Click(7L, ts(0)), StreamOps.Click(7L, ts(1)),
        StreamOps.Click(8L, ts(0)))
      q.processAllAvailable()
      input.addData(StreamOps.Click(7L, ts(2)))
      q.processAllAvailable()
      val counts = spark.table("sess")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts(7L) == 3L)
      assert(counts(8L) == 1L)
    } finally q.stop()
  }
}
