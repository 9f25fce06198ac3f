package graft.sink

import graft.pipeline.KGPipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Graph materialization (SURVEY.md §2.4 G3-G7, G14, G15): the
  * reference upserts nodes/edges one Cypher MERGE per row into Neo4j
  * (reference event_graphrag_neo4j.py:302-558); here the same final
  * graph lands as two partitioned tables written in bulk:
  *
  *   nodes(label, node_id, name, content, props...)   partitioned by label
  *   edges(edge_type, src, dst, rank, n_sources)      partitioned by edge_type
  *
  * Labels/edge types mirror the reference node classes
  * (GraphNode.py:24-173) and relationship names: Chunk/Event/Entity
  * nodes; ENTITY_RELATION (typed), CONTAINS (chunk->event), MENTIONS
  * (chunk->entity), PARTICIPATES_IN (entity->event), SIMILAR_TO
  * (event->event). Partition-by-label makes G15's delete-by-class an
  * O(1) metadata drop instead of a scan.
  */
object GraphSink {

  /** Unified labeled node table from the pipeline result. */
  def nodes(r: KGPipeline.Result): DataFrame = {
    // min_by(content_hash) survivor: the SAME rule extract() uses for
    // 8-hex chunk_id collisions, so the Chunk node's text is always the
    // content whose extraction results are stored under that id (a
    // min-over-(name, content) rule could pick the OTHER colliding
    // content and leave the node text inconsistent with its edges)
    val chunkNodes = r.chunks.toDF()
      .groupBy(col("chunk_id").as("node_id"))
      .agg(min_by(struct(col("header_name").as("name"), col("content")),
        col("content_hash")).as("w"))
      .select(lit("Chunk").as("label"), col("node_id"),
        col("w.name").as("name"), col("w.content").as("content"))
    val eventNodes = r.events
      .select(lit("Event").as("label"), col("event_id").as("node_id"),
        col("event_type").as("name"), col("content"))
    val entityNodes = r.entities
      .select(lit("Entity").as("label"), col("canonical_id").as("node_id"),
        col("entity_name").as("name"),
        concat_ws(" | ", col("descriptions")).as("content"))
    chunkNodes.unionByName(eventNodes).unionByName(entityNodes)
  }

  /** Unified typed edge table: the five reference relationship classes. */
  def edges(r: KGPipeline.Result): DataFrame = {
    val entityRel = r.edges.select(
      lit("ENTITY_RELATION").as("edge_type"), col("pred"),
      col("subj_id").as("src"), col("obj_id").as("dst"),
      lit(0).as("rank"), col("n_sources"))
    val contains = r.events.select(
      lit("CONTAINS").as("edge_type"), lit(null: String).as("pred"),
      col("chunk_id").as("src"), col("event_id").as("dst"),
      lit(0).as("rank"), lit(1L).as("n_sources"))
    val mentions = r.mentions
      .join(r.nameMap, r.mentions("entityName") === r.nameMap("entity_name"))
      .select(lit("MENTIONS").as("edge_type"), lit(null: String).as("pred"),
        col("chunk_id").as("src"), col("canonical_id").as("dst"),
        lit(0).as("rank"), lit(1L).as("n_sources"))
      .dropDuplicates("src", "dst")
    val participates = r.participates.select(
      lit("PARTICIPATES_IN").as("edge_type"), lit(null: String).as("pred"),
      col("canonical_id").as("src"), col("event_id").as("dst"),
      lit(0).as("rank"), lit(1L).as("n_sources"))
    val similar = r.eventSimilar.select(
      lit("SIMILAR_TO").as("edge_type"), lit(null: String).as("pred"),
      col("src_event").as("src"), col("dst_event").as("dst"),
      col("rank"), lit(1L).as("n_sources"))
    // G6: typed event->event logic edges (EVENT_RELATION {type},
    // reference event_graphrag_neo4j.py:428-477)
    val eventRel = r.eventEdges.select(
      lit("EVENT_RELATION").as("edge_type"),
      col("relation_type").as("pred"),
      col("head_id").as("src"), col("tail_id").as("dst"),
      lit(0).as("rank"), col("n_sources"))
    entityRel.unionByName(contains).unionByName(mentions)
      .unionByName(participates).unionByName(similar)
      .unionByName(eventRel)
  }

  /** Write both tables partitioned by class (bulk write — the
    * set-semantics dedup already happened upstream, so no MERGE). */
  def write(r: KGPipeline.Result, outDir: String): Unit = {
    nodes(r).write.mode(SaveMode.Overwrite)
      .partitionBy("label").parquet(s"$outDir/nodes")
    edges(r).write.mode(SaveMode.Overwrite)
      .partitionBy("edge_type").parquet(s"$outDir/edges")
  }

  /** G14 statistics: counts by node label and edge type
    * (reference event_graphrag_neo4j.py:560-576 runs 13 count queries;
    * one grouped aggregate replaces them). */
  def stats(r: KGPipeline.Result): DataFrame = {
    // Counts computed WITHOUT materializing the node/edge payload
    // columns: the former nodes()/edges() group-counts shuffled the full
    // chunk contents and six-way edge union just to count rows per
    // class (guide §2.3 — shuffle keys, not payloads). Each aggregate
    // below is by construction the row count of the corresponding
    // nodes()/edges() class: Chunk nodes = one row per distinct
    // chunk_id, MENTIONS = distinct (chunk, canonical) through the name
    // map, every other class maps 1:1 onto its source frame. The
    // count > 0 filter reproduces the old groupBy semantics exactly (an
    // empty class emitted no row, not a zero row).
    def cnt(kind: String, cls: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("count"))
        .select(lit(kind).as("kind"), lit(cls).as("class"), col("count"))
    val chunkIds = r.chunks.toDF().select("chunk_id").distinct()
    val mentionsDst = r.mentions
      .join(r.nameMap, r.mentions("entityName") === r.nameMap("entity_name"))
      .select(col("chunk_id"), col("canonical_id")).distinct()
    Seq(
      cnt("node", "Chunk", chunkIds),
      cnt("node", "Event", r.events),
      cnt("node", "Entity", r.entities),
      cnt("edge", "ENTITY_RELATION", r.edges),
      cnt("edge", "CONTAINS", r.events),
      cnt("edge", "MENTIONS", mentionsDst),
      cnt("edge", "PARTICIPATES_IN", r.participates),
      cnt("edge", "SIMILAR_TO", r.eventSimilar),
      cnt("edge", "EVENT_RELATION", r.eventEdges)
    ).reduce(_.unionByName(_)).filter(col("count") > 0)
  }

  /** Referential-integrity gate over the whole graph: every edge
    * endpoint must resolve to an existing node (the Cypher-MATCH
    * no-dangling guarantee the bulk-relational encoding must preserve).
    * Emitted as data rows so the driver's oracle can recompute each
    * count independently from the dumped tables — a violations>0 row
    * or a Spark-vs-DuckDB join-semantics divergence both break the
    * correctness gate. */
  def integrity(r: KGPipeline.Result): DataFrame = {
    // Each small side is ONE un-renamed subtree per id space (ents 3x,
    // evs 5x, chs 2x), joined with explicit conditions: the former
    // per-check withColumnRenamed made every build side a distinct
    // canonical plan, so each anti-join rebuilt (and re-shuffled or
    // re-broadcast) it — ReuseExchange now builds each id set once for
    // the whole 11-check union (guide §2.4; the same defect the
    // round-5 triple-rewrite fix closed). Counts are unchanged: a
    // left_anti on `a === b` is identical to the renamed
    // Seq-column form.
    // Row-count-gated broadcast (the broadcastNameMapMax discipline —
    // same single-string-column width class): under the cap each id set
    // broadcasts once and NONE of the edge/event/triple streams shuffles
    // for its anti-join; past it (web-scale node tables) the joins fall
    // back to sort-merge with the reused exchange. The counts are cheap
    // actions over persisted frames.
    val bcap = graft.GraftConfig.default.broadcastNameMapMax
    def gated(df: DataFrame): DataFrame =
      if (df.count() <= bcap) broadcast(df) else df
    val ents = gated(r.entities.select(col("canonical_id")))
    val evs = gated(r.events.select(col("event_id")))
    val chs = gated(r.chunks.toDF().select(col("chunk_id")).distinct())
    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    Seq(
      cnt("edges_dangling_subj", r.edges.join(
        ents, col("subj_id") === col("canonical_id"), "left_anti")),
      cnt("edges_dangling_obj", r.edges.join(
        ents, col("obj_id") === col("canonical_id"), "left_anti")),
      cnt("participates_dangling_entity", r.participates.join(
        ents, Seq("canonical_id"), "left_anti")),
      cnt("participates_dangling_event", r.participates.join(
        evs, Seq("event_id"), "left_anti")),
      cnt("event_edges_dangling_head", r.eventEdges.join(
        evs, col("head_id") === col("event_id"), "left_anti")),
      cnt("event_edges_dangling_tail", r.eventEdges.join(
        evs, col("tail_id") === col("event_id"), "left_anti")),
      cnt("events_dangling_chunk", r.events.join(chs, Seq("chunk_id"), "left_anti")),
      cnt("triples_dangling_chunk", r.triples.join(chs, Seq("chunk_id"), "left_anti")),
      // pre-aggregation event relations must reference fired events
      // (E4 drops unknown endpoints — a dangling id here means the
      // extractor emitted a relation for an event it never emitted)
      cnt("event_rels_dangling_head", r.eventRels.join(
        evs, col("head_event_id") === col("event_id"), "left_anti")),
      cnt("event_rels_dangling_tail", r.eventRels.join(
        evs, col("tail_event_id") === col("event_id"), "left_anti")),
      // G4 identity contract: event_id = chunk_id + "_event_" + ord
      cnt("event_id_malformed", r.events.filter(
        !col("event_id").startsWith(concat(col("chunk_id"), lit("_event_")))))
    ).reduce(_.unionByName(_))
  }

  /** Canonicalization-closure gate (companion to [[integrity]]): the
    * invariants the G12 merge + G9/G10 canonicalization must establish,
    * emitted as data rows so the DuckDB oracle can recompute each count
    * independently from the dumped name map / entities / mentions:
    *  - every raw surface maps to exactly one canonical id (the alias
    *    closure is a function);
    *  - each canonical id is the MIN member name_key of its component
    *    (the CC representative invariant);
    *  - name map and entity table reference each other with no dangling
    *    ids in either direction;
    *  - every mention surface is in the map (nothing fell off an
    *    accumulator cap — a dropped surface would silently lose triples
    *    at the endpoint rewrite). */
  def aliasClosure(r: KGPipeline.Result): DataFrame = {
    val nm = r.nameMap
    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    Seq(
      cnt("aliases_multi_mapped", nm.groupBy("entity_name")
        .agg(countDistinct("canonical_id").as("n")).filter(col("n") > 1)),
      cnt("canonical_not_min_member", nm.groupBy("canonical_id")
        .agg(min("name_key").as("mn")).filter(col("mn") =!= col("canonical_id"))),
      cnt("namemap_dangling_canonical", nm.select("canonical_id").distinct()
        .join(r.entities.select("canonical_id"), Seq("canonical_id"), "left_anti")),
      cnt("entities_without_alias", r.entities.select("canonical_id")
        .join(nm.select("canonical_id").distinct(), Seq("canonical_id"), "left_anti")),
      cnt("mention_surface_unmapped",
        r.mentions.select(col("entityName").as("entity_name")).distinct()
          .join(nm.select("entity_name"), Seq("entity_name"), "left_anti"))
    ).reduce(_.unionByName(_))
  }

  /** Write the graph through [[write]] (the partitioned production
    * layout, G15's delete target) and read the WRITTEN tables back as
    * per-class counts — so Verify exercises the partitionBy write path,
    * not just the in-memory frames, and the oracle recomputes every
    * count from the dumped tables. */
  def writtenStats(spark: SparkSession, r: KGPipeline.Result,
      outDir: String): DataFrame = {
    import spark.implicits._
    write(r, outDir)
    val n = spark.read.parquet(s"$outDir/nodes")
      .groupBy(col("label").as("class")).count()
      .withColumn("kind", lit("node"))
    val e = spark.read.parquet(s"$outDir/edges")
      .groupBy(col("edge_type").as("class")).count()
      .withColumn("kind", lit("edge"))
    // collect the per-class counts (one row per node label / edge type
    // — driver-sized by construction) BEFORE deleting the temp graph:
    // a lazy plan handed back would re-read the deleted tables, and
    // NOT deleting leaks a full nodes+edges copy per run (round-3
    // verdict #3 / ADVICE)
    val rows = n.unionByName(e).select("kind", "class", "count")
      .collect().map(r0 => (r0.getString(0), r0.getString(1), r0.getLong(2)))
    val p = new org.apache.hadoop.fs.Path(outDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    rows.toSeq.toDF("kind", "class", "count")
  }

  /** G15 delete-by-class (reference event_graphrag_neo4j.py:578-598):
    * with label-partitioned tables this is a partition drop. */
  def deleteClass(spark: SparkSession, outDir: String, label: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$outDir/nodes/label=$label")
    // resolve the PATH's filesystem, not the default one — outDir may
    // live on a non-default scheme (s3a:// with an HDFS default FS);
    // same rule as Lineage.committed
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
  }
}
