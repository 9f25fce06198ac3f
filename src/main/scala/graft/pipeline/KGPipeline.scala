package graft.pipeline

import graft.canon.Canonicalizer
import graft.chunk.MarkdownSplitter
import graft.extract.{KnowledgeBase, TripleExtractor}
import graft.pages.{Page, PagesGenerator}
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end KG-construction DAG (north rule):
  *
  *   pages -> text (deterministic html->markdown) -> chunks ->
  *   mentions + triples (mapPartitions, broadcast KB) ->
  *   canonical entities (G12 + MinHash-LSH + CC + merge) ->
  *   edges -> nodes/edges tables
  *
  * Every stage is a narrow transform or an explicit, keyed shuffle:
  *  - chunking/extraction: narrow flatMap/mapPartitions, no shuffle;
  *  - chunk dedup: one hash shuffle on chunk_id (uniform — md5);
  *  - canonicalization: salted two-phase agg + LSH band join + CC;
  *  - html BINARY never survives past the text projection (column
  *    pruning keeps it out of every downstream scan).
  */
object KGPipeline {

  final case class ChunkRow(
      chunk_id: String,
      url: String,
      ord: Int,
      header_level: Int,
      header_name: String,
      content: String)

  /** Chunking: narrow flatMap. `text` recomputed from html when
    * `fromHtml` (exercises the byte-identity stage S1); chunk identity
    * is the reference's content hash (G1). */
  def chunk(pages: Dataset[Page], fromHtml: Boolean = true): Dataset[ChunkRow] = {
    import pages.sparkSession.implicits._
    pages.flatMap { p =>
      val text =
        if (fromHtml) graft.html.HtmlToMarkdown(
          new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
        else p.text
      MarkdownSplitter.split(text).zipWithIndex.collect {
        case (s, i) if s.content.nonEmpty =>
          ChunkRow("", p.url, i, s.header.level, s.header.name, s.content)
      }
    }.withColumn("chunk_id", TextOps.chunkId(col("content")))
      .as[ChunkRow]
  }

  /** Mention + triple extraction over *distinct* chunk contents
    * (identical content => identical extraction; G2's dedup applied
    * before the expensive stage instead of after), then provenance is
    * re-attached by the caller via the chunks table. The extractor is
    * broadcast; its Aho-Corasick automaton builds once per executor. */
  def extract(spark: SparkSession, distinctChunks: Dataset[ChunkRow])
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      new TripleExtractor(KnowledgeBase.load().withAliases))
    val both = distinctChunks.mapPartitions { it =>
      val ex = bc.value
      it.map { c =>
        val (ms, ts) = ex.extract(c.chunk_id, c.url, c.content)
        (c.chunk_id,
          ms.map(m => (m.surface, m.entityName, m.entityType, m.entityDescription)),
          ts.map(t => (t.subj, t.pred, t.obj, t.description)))
      }
    }.toDF("chunk_id", "mentions", "triples")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mentions = both
      .select(col("chunk_id"), explode(col("mentions")).as("m"))
      .select(col("chunk_id"),
        col("m._1").as("surface"), col("m._2").as("entityName"),
        col("m._3").as("entityType"), col("m._4").as("entityDescription"))
    val triples = both
      .select(col("chunk_id"), explode(col("triples")).as("t"))
      .select(col("chunk_id"),
        col("t._1").as("subj"), col("t._2").as("pred"),
        col("t._3").as("obj"), col("t._4").as("description"))
    (mentions, triples)
  }

  /** Full in-memory DAG (stage-checkpointed variant in [[Lineage]]). */
  final case class Result(
      pages: Dataset[Page],
      chunks: Dataset[ChunkRow],
      mentions: DataFrame,
      triples: DataFrame,
      entities: DataFrame,
      nameMap: DataFrame,
      edges: DataFrame)

  def run(spark: SparkSession, nPages: Long, partitions: Int = 32): Result = {
    import spark.implicits._
    val pages = PagesGenerator.pages(spark, nPages, partitions)
    val chunks = chunk(pages)
    val distinct = chunks.dropDuplicates("chunk_id").as[ChunkRow]
    val (mentions, triples) = extract(spark, distinct)
    // chunkId in mentions/triples refers to the distinct chunk; re-join
    // provenance (all urls containing the chunk) happens on demand
    val (entities, nameMap) = Canonicalizer.canonicalize(
      mentions.withColumnRenamed("chunk_id", "chunkId"))
    val edges = Canonicalizer.rewriteTriples(
      triples.withColumnRenamed("chunk_id", "chunkId"), nameMap)
    Result(pages, chunks, mentions, triples, entities, nameMap, edges)
  }
}
