package graft.canon

import graft.embed.{CosineSimilarity, HashingEmbedder}
import graft.lsh.MinHasher
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity canonicalization (SURVEY.md §2.4 G9-G12):
  *
  *  1. deterministic name normalization — the stand-in for the LLM
  *     clean pass (E6): strip decoration suffixes listed in the
  *     reference clean prompt (promt.py:187-189) and trailing
  *     punctuation decoration;
  *  2. G12 lowercase-name pre-merge as a salted two-phase aggregate
  *     (hot entities produce millions of mentions; the salt bounds
  *     per-task state, the second phase merges S partials per name);
  *  3. G9 candidate pairs via MinHash-LSH over char-3-gram shingles of
  *     the embedding-normalized name (north rule: "connected components
  *     over a MinHash-LSH candidate-pair graph"), replacing the
  *     reference's O(n^2) all-pairs cosine (Base_Neo4j.py:508-626);
  *  4. exact verify: hashing-embedder cosine >= 0.95 on candidates only
  *     (threshold from Base_Neo4j.py:538), via the codegen'd
  *     CosineSimilarity expression;
  *  5. G10 connected components (large-star/small-star);
  *  6. G11 representative merge: the richest member (most mentions,
  *     deterministic tie-break on name) names the canonical entity;
  *     list-properties union with a documented cap (SURVEY.md §7.4#4).
  */
object Canonicalizer {

  // Tuning knobs live in graft.GraftConfig (the typed flags surface —
  // reference framework/config.py); these forwards keep the historical
  // names usable as the documented defaults.
  val MergeThreshold: Double = graft.GraftConfig.default.mergeThreshold
  val Salts: Int = graft.GraftConfig.default.salts
  val ListCap: Int = graft.GraftConfig.default.listCap
  /** Max distinct members per LSH band key before the band is dropped
    * as pathological (quadratic join cost, ~no similarity signal). */
  val MaxBandSize: Int = graft.GraftConfig.default.maxBandSize

  /** Decoration suffixes from the reference clean prompt. */
  private val decorations = Seq("装置", "产品", "类型", "某某", "一种")

  def normalizeName(name: String): String = {
    var t = name.strip()
    var changed = true
    while (changed) {
      changed = false
      decorations.foreach { d =>
        if (t.length > d.length + 1 && t.endsWith(d)) {
          t = t.dropRight(d.length); changed = true
        }
      }
      // trailing decoration punctuation (e.g. "·" alias markers)
      while (t.length > 2 && "·•:：-—".indexOf(t.last) >= 0) {
        t = t.dropRight(1); changed = true
      }
    }
    t
  }

  /** Text embedded for similarity: lowercased name with whitespace and
    * decoration punctuation removed (so spacing/punct alias variants
    * embed identically), mirroring the reference's
    * "{name}: {descriptions}" embed text (Base_Neo4j.py:298). */
  def embedKey(name: String): String =
    name.toLowerCase.filterNot(c =>
      Character.isWhitespace(c) || "·•:：-—_/\\(),.，。（）".indexOf(c) >= 0)

  private val normalizeNameUdf = udf(normalizeName _)
  private val embedUdf = udf((s: String) => HashingEmbedder.embed(embedKey(s)))
  /** Name banding: 16 bands x 8 rows over the 128-hash signature.
    * EMBEDDING-IDENTICAL alias pairs (embedKey folds case/punct/space
    * variants, normalizeName strips decorations BEFORE shingling) have
    * J = 1 and collide on EVERY band at any row count — recall 1.0 by
    * construction FOR THOSE pairs. Non-identical keys can also pass the
    * cosine-0.95 merge gate (hashed-bucket collisions inflate cosine
    * above raw n-gram overlap); for those the detection probability is
    * the banding curve below (~0.95 at J = 0.8) — an empirically
    * validated approximation, not a guarantee: merges were measured
    * bit-identical across both bandings at 1M and 4M pages, not proved.
    * Rows = 8 (not the doc-dedup default 4)
    * suppresses false candidates by ~J^4 per band: at a web-scale
    * vocabulary the Zipf head is dense with structurally-similar code
    * strings whose J ∈ [0.2, 0.5] band-collides constantly at r = 4
    * (measured 16.5M candidate pairs over 870k names at 4M pages) but
    * whose cosine is far below the 0.95 verify — pure wasted verify
    * volume. A hypothetical J = 0.8 near-miss still detects with
    * P = 1-(1-0.8^8)^16 ≈ 0.95; anything with lower shingle overlap
    * cannot reach cosine 0.95 over the same n-gram space. */
  private def bandsUdf(nameBands: Int, nameRows: Int) = udf { (s: String) =>
    // shingle the embedding-normalized form so spacing/punct alias
    // variants land in identical bands (their embeddings are identical)
    val k = embedKey(s)
    val shingles = if (k.length < 3) Set(k) else k.sliding(3).toSet
    MinHasher.bandKeys(MinHasher.signature(shingles), nameBands, nameRows)
  }

  /** Mentions (entityName, entityType, entityDescription, chunkId) ->
    * canonical entity table + name->canonical mapping.
    *
    * Returns (canonicalEntities, nameMap):
    *  - canonicalEntities: canonical_id, entity_name, entity_type,
    *    n_mentions, aliases, descriptions, source_chunks, component_id
    *  - nameMap: entity_name (raw) -> (name_key, canonical_id)
    */
  private def timed[A](n: String)(f: => A): A = {
    if (sys.env.contains("GRAFT_KG_STAGE_TIMES")) {
      val s = System.nanoTime()
      val x = f
      System.err.println(f"[canon $n] ${(System.nanoTime() - s) / 1e9}%.2f s")
      x
    } else f
  }

  /** Debug-only action (no-op unless GRAFT_KG_STAGE_TIMES is set). */
  private def probe(n: String)(f: => Any): Unit =
    if (sys.env.contains("GRAFT_KG_STAGE_TIMES")) timed(n)(f)

  def canonicalize(mentions: DataFrame,
      cfg: graft.GraftConfig = graft.GraftConfig.default)
      : (DataFrame, DataFrame) = {
    val spark = mentions.sparkSession
    // local shadows: the method body reads its knobs from cfg (the
    // object-level constants remain as the documented defaults)
    val (mergeThreshold, salts) = (cfg.mergeThreshold, cfg.salts)
    val (listCap, maxBandSize) = (cfg.listCap, cfg.maxBandSize)

    // First-writer-wins semantics: the reference fixes id_/entity_type
    // at the FIRST mention's values (MERGE ... ON CREATE SET,
    // event_graphrag_neo4j.py:336-360) and its lowercase fallback merge
    // keeps the OLDER node — name included (Base_Neo4j.py:922-950,
    // elementId(e1) > elementId(e2) deletes the newer). A parallel
    // engine has no wall-clock insertion order, so the deterministic
    // total order (chunkId, ord) — chunk id, then mention position
    // within the chunk — stands in for creation order. Callers without
    // a mention ordinal get ord = 0.
    val withOrd =
      if (mentions.columns.contains("ord")) mentions
      else mentions.withColumn("ord", lit(0))

    // ---- G12 salted two-phase lowercase merge --------------------------
    val keyed = withOrd
      .withColumn("norm_name", normalizeNameUdf(col("entityName")))
      .withColumn("name_key", lower(col("norm_name")))
      .withColumn("salt", pmod(xxhash64(col("chunkId")), lit(salts)))

    // `aliases` (the distinct raw surfaces per normalized key) is the
    // ONLY uncapped accumulator: it is vocabulary-bounded (case and
    // decoration variants of one name), not mention-bounded like
    // descriptions/chunks, and nameMap correctness needs every raw
    // surface — triples whose surface fell off a cap would silently
    // drop at the endpoint rewrite.
    // descriptions/source_chunks accumulate through BoundedAgg: O(cap)
    // aggregation state per (name, salt) even when a hot entity
    // contributes millions of mentions (collect_set-then-slice would
    // buffer every distinct value first — SURVEY.md §7.4#4)
    // first_w: the lexicographically-first (chunkId, ord) mention's
    // (display name, type) — min over the struct is the distributable
    // form of min_by(…, (chunkId, ord)) that survives the salted
    // two-phase split ((chunkId, ord) is unique, so the order is total)
    val partial = keyed
      .groupBy("name_key", "salt")
      .agg(
        count(lit(1)).as("n_mentions"),
        min(struct(col("chunkId"), col("ord"), col("norm_name"),
          col("entityType"))).as("first_w"),
        sort_array(collect_set("entityName")).as("aliases"),
        BoundedAgg.distinctMin(col("entityDescription"), listCap).as("descriptions"),
        BoundedAgg.distinctMin(col("chunkId"), listCap).as("source_chunks"))

    // persisted: `names` feeds three consumers (LSH banding, CC vertex
    // set, representative merge) and sits on top of the whole
    // chunk->extract subtree — without the persist that subtree executes
    // once per consumer. One row per distinct normalized name; spills to
    // disk at web scale.
    val names = graft.pipeline.Jobs.named(spark, "canon: distinct-name agg (G12)") {
      partial
        .groupBy("name_key")
        .agg(
          sum("n_mentions").as("n_mentions"),
          min("first_w").as("first_w"),
          array_distinct(sort_array(flatten(collect_set("aliases")))).as("aliases"),
          BoundedAgg.distinctMinFlat(col("descriptions"), listCap).as("descriptions"),
          BoundedAgg.distinctMinFlat(col("source_chunks"), listCap).as("source_chunks"))
        .withColumn("display_name", col("first_w.norm_name"))
        .withColumn("entity_type", col("first_w.entityType"))
        .drop("first_w")
        // bands materialize INSIDE the checkpoint: the banding self-join
        // references this frame four times (two join sides + the
        // band-size guard), and an uncheckpointed UDF would re-run the
        // 128-minhash signature per reference. The embedding column
        // deliberately does NOT: it is a cheap deterministic function of
        // display_name, recomputed at the verify site (below), so the
        // checkpoint stays ~256 B/row slimmer.
        .withColumn("bands",
          bandsUdf(cfg.nameBands, cfg.nameRows)(col("display_name")))
        .localCheckpoint(true)
    }

    // raw surface -> normalized key, recovered from the aggregated
    // alias sets (tiny) instead of re-exploding the mention stream
    val rawKeys = names
      .select(col("name_key"), explode(col("aliases")).as("entityName"))

    probe("mentionsIn")(mentions.count())
    probe("partialAgg")(partial.count())
    probe("namesAgg")(names.count())

    // ---- G9 MinHash-LSH candidates + cosine verify ---------------------
    // hot-band guard (SURVEY.md §4.3): a band key shared by k names
    // contributes k^2/2 candidate pairs; beyond the cap the band carries
    // ~no signal (it is a degenerate hash, e.g. of near-empty shingle
    // sets) but quadratic cost, so it is dropped. A *real* near-dup
    // cluster collides on many of the NameBands (= 16) bands — alias
    // variants on ALL of them — so dropping pathological bands costs
    // ~no recall.
    // THIN band join: only (name_key, band) rides the self-join shuffle
    // — shipping the 64-float embeddings through the banding explode
    // multiplied the shuffle volume by ~10x at a 10^5-name vocabulary;
    // embeddings join back onto the (much smaller) candidate pair set
    // for the exact verify.
    // ONE shuffle of the banded rows: group each band to its full
    // member list through the all-or-nothing collector (NULL = band
    // over the hot-band cap -> dropped, same verdict as the former
    // count-filter), then stream the k^2 within-band pairs with two
    // Generate operators. The former shape (count agg + join-back +
    // a×b self-join) shuffled the 16x-exploded band rows three times
    // and paid four latency-bound exchanges per run.
    val banded0 = names.select(col("name_key"),
        explode(col("bands")).as("band"))
    val bandMembers = banded0.groupBy("band")
      .agg(BoundedAgg.allOrNothing(col("name_key"), maxBandSize).as("ms"))
      .filter(col("ms").isNotNull)
      .select("ms")
    val candPairs = bandMembers
      .select(explode(col("ms")).as("src"), col("ms"))
      .select(col("src"), explode(col("ms")).as("dst"))
      .filter(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
    probe("candPairs")(System.err.println(
      s"[canon candPairs n] ${candPairs.count()} of ${names.count()} names"))
    // embedding attach for the exact verify. The embedding is a CHEAP
    // deterministic function of display_name (one hash-fold per
    // character), so the verify needs only a (name_key, display_name)
    // lookup — a NARROW two-column map:
    //  - small vocabulary (row count within the name-map broadcast
    //    budget — same width class): broadcast the display map twice
    //    and recompute the embedding INLINE on the candidate pairs.
    //    Zero extra exchanges — the alternative sort-merge joins cost
    //    four latency-bound stages on a vocabulary-sized stream
    //    (measured ~4 s fixed per run at 404k names regardless of
    //    parallelism);
    //  - web-scale vocabulary (above the budget): shuffle-join the
    //    (name_key, embedding) form as before — the embed UDF runs
    //    once per name per join side, still cheaper than shipping
    //    every banded copy of the vector.
    // Wider rows (the 64-float eager-embedding variant) kept their own
    // byte-derived budget in cfg.broadcastEmbeddingMax; the narrow
    // display map uses the name-map cap.
    // Both endpoint attaches reference ONE un-renamed lookup subtree and
    // join with explicit conditions, so ReuseExchange builds/ships the
    // broadcast (or the shuffle of the lookup side) ONCE per run — the
    // former per-side withColumnRenamed made the two build plans
    // distinct and paid the build twice (round-5 ADVICE finding; the
    // same defect the triple-rewrite hunk fixed).
    val nNames = names.count()
    val candidates =
      if (nNames <= cfg.broadcastNameMapMax) {
        val disp = broadcast(names.select(col("name_key"), col("display_name")))
        candPairs
          .join(disp, col("src") === col("name_key"))
          .withColumnRenamed("display_name", "da").drop("name_key")
          .join(disp, col("dst") === col("name_key"))
          .withColumnRenamed("display_name", "db").drop("name_key")
          .withColumn("ea", embedUdf(col("da")))
          .withColumn("eb", embedUdf(col("db")))
      } else {
        val embs0 = names.select(col("name_key"),
          embedUdf(col("display_name")).as("embedding"))
        val embs =
          if (nNames <= cfg.broadcastEmbeddingMax) broadcast(embs0)
          else embs0
        candPairs
          .join(embs, col("src") === col("name_key"))
          .withColumnRenamed("embedding", "ea").drop("name_key")
          .join(embs, col("dst") === col("name_key"))
          .withColumnRenamed("embedding", "eb").drop("name_key")
      }
    // checkpointed: the verify join sits on the banding self-join; its
    // output (vocabulary-bounded edge list) feeds CC, the CC vertex
    // cover, and — through comps — both the entity agg and the name
    // map. Uncached, every consumer re-executes the whole LSH join
    // (measured 3x ~10 s at a 60k-name vocabulary).
    val verified = graft.pipeline.Jobs.named(spark, "canon: LSH band join + cosine verify (G9)") {
      candidates
        .withColumn("cos", CosineSimilarity(col("ea"), col("eb")))
        .filter(col("cos") >= mergeThreshold)
        .select("src", "dst")
        .localCheckpoint(true)
    }

    // ---- G10 connected components --------------------------------------
    // comps checkpointed for the same reason: entity agg + name map
    // both join through it
    val comps = timed("cc")(graft.pipeline.Jobs.named(spark, "canon: connected components (G10)") {
      ConnectedComponents.runWithVertices(
        verified, names.select(col("name_key").as("id")),
        localSolveMax = cfg.ccLocalSolveMax)
        .localCheckpoint(true)
    })

    // ---- G11 representative merge ---------------------------------------
    val withComp = names.join(
      comps.withColumnRenamed("id", "name_key"), "name_key")
    val canonical = withComp
      .groupBy(col("component").as("canonical_id"))
      .agg(
        max_by(col("display_name"), struct(col("n_mentions"), col("name_key"))).as("entity_name"),
        max_by(col("entity_type"), struct(col("n_mentions"), col("name_key"))).as("entity_type"),
        sum("n_mentions").as("n_mentions"),
        count(lit(1)).as("n_merged_names"),
        BoundedAgg.distinctMinFlat(col("aliases"), listCap).as("aliases"),
        BoundedAgg.distinctMinFlat(col("descriptions"), listCap).as("descriptions"),
        BoundedAgg.distinctMinFlat(col("source_chunks"), listCap).as("source_chunks"))

    // raw name -> canonical id (for triple endpoint rewrite); name_key
    // rides along so the driver oracle can recompute the G12 merge and
    // the CC min-representative invariant from the dumped map
    val nameMap = rawKeys
      .join(comps.withColumnRenamed("id", "name_key"), "name_key")
      .select(col("entityName").as("entity_name"), col("name_key"),
        col("component").as("canonical_id"))

    (canonical, nameMap)
  }

  /** Distinct-content representative embeddings for [[eventKnn]]:
    * exact-duplicate contents collapse to min event_id, each
    * representative embeds its lowercased content. Public so the
    * driver can dump the SAME vectors the KNN consumed and the DuckDB
    * oracle can recompute the similarity ranking from them. */
  def eventVecs(events: DataFrame): DataFrame = {
    val embedContentUdf = udf((s: String) => HashingEmbedder.embed(s.toLowerCase))
    events
      .groupBy(col("content"))
      .agg(min(col("event_id")).as("event_id"))
      .select(col("event_id"), embedContentUdf(col("content")).as("emb"))
  }

  /** G13 event disambiguation (reference event_graphrag_neo4j.py:600-673:
    * GDS KNN topK=10, similarityCutoff=0.85 over event embeddings,
    * emitting SIMILAR_TO edges): hyperplane-LSH table keys over the
    * content embedding replace the server-side KNN index — candidates
    * come from an equi-join on (table, key), verified by exact cosine,
    * then per-source top-k by window rank. Input: events with
    * (event_id, content); output (src_event, dst_event, rank). */
  def eventKnn(events: DataFrame,
      topK: Int = graft.GraftConfig.default.eventKnnTopK,
      cutoff: Double = graft.GraftConfig.default.eventKnnCutoff): DataFrame = {
    val bucketsUdf = udf((v: Seq[Float]) =>
      graft.lsh.HyperplaneLSH.tableKeys(v.toArray))
    // exact-duplicate contents collapse to one representative (min
    // event_id) BEFORE the similarity join: identical contents are
    // cosine-1.0 twins, and a hot event repeated across millions of
    // pages would otherwise form one quadratic LSH bucket — the
    // hot-entity star problem (SURVEY.md §4.3) in event form. The
    // reference's all-pairs KNN has the same blowup; this is the
    // documented scale deviation.
    // checkpointed: the distinct-content embedding table feeds the band
    // join (twice), and the candidate verify joins back onto it — the
    // same thin-band-join shape as the entity LSH (G9): only
    // (event_id, bucket) rides the self-join shuffle, embeddings attach
    // to the (much smaller) candidate pair set
    // LAZY checkpoint: Result construction must not pay an eager job
    // for a frame the caller may never consume (SparkEntry.entry uses
    // only edges/entities); the first action materializes it once for
    // all four plan references
    val emb = eventVecs(events).localCheckpoint(false)
    val banded = emb.select(col("event_id"),
      explode(bucketsUdf(col("emb"))).as("bucket"))
    val candPairs = banded.as("a")
      .join(banded.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.event_id") =!= col("b.event_id"))
      .select(col("a.event_id").as("src_event"), col("b.event_id").as("dst_event"))
      .distinct()
    val cands = candPairs
      .join(emb.withColumnRenamed("event_id", "src_event")
        .withColumnRenamed("emb", "ea"), "src_event")
      .join(emb.withColumnRenamed("event_id", "dst_event")
        .withColumnRenamed("emb", "eb"), "dst_event")
      .withColumn("cos", CosineSimilarity(col("ea"), col("eb")))
      .filter(col("cos") >= cutoff)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src_event").orderBy(desc("cos"), asc("dst_event"))
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("src_event", "dst_event", "rank")
  }

  /** G5 semantics: rewrite triple endpoints through the canonical map
    * (inner joins drop dangling edges like Cypher MATCH), then dedup on
    * (subj, pred, obj).
    *
    * The final aggregate is salted two-phase: the distinct-edge count is
    * tiny relative to the triple count (hot facts repeat across a large
    * fraction of the corpus), so a single-phase `collect_set(chunkId)`
    * would funnel millions of rows into a handful of groups with
    * unbounded map-side set state — the same hot-key pattern as G12. */
  /** Above this name-map row count the endpoint joins fall back to
    * shuffle joins (a broadcast table must fit executor memory); below
    * it the map broadcasts and the (much larger) triple stream never
    * shuffles before the edge aggregate — the same dictionary-broadcast
    * rule the extraction stage uses. ~5M rows ≈ low hundreds of MB. */
  val BroadcastNameMapMax: Long = graft.GraftConfig.default.broadcastNameMapMax

  /** Broadcast cap for the (name_key, embedding ARRAY<FLOAT>[64]) lookup:
    * ~600 B/row with JVM overhead -> 100k rows ≈ 60 MB broadcast. Wide
    * rows get their own byte-derived budget instead of a share of the
    * name-map row cap. */
  val BroadcastEmbeddingMax: Long = graft.GraftConfig.default.broadcastEmbeddingMax

  def rewriteTriples(triples: DataFrame, nameMap: DataFrame,
      cfg: graft.GraftConfig = graft.GraftConfig.default): DataFrame = {
    val (listCap, salts) = (cfg.listCap, cfg.salts)
    // nameMap is checkpointed by the callers, so the count is a cheap
    // metadata-ish job, not a recompute of the canonicalization DAG
    val small = nameMap.count() <= cfg.broadcastNameMapMax
    def side(m: DataFrame): DataFrame = if (small) broadcast(m) else m
    // ONE map subtree referenced by both endpoint joins: the two build
    // sides are canonically identical plans, so ReuseExchange ships and
    // builds the broadcast (or shuffle) ONCE — the previous per-endpoint
    // projections (aliased to subj/obj) defeated exchange reuse and paid
    // the driver-side broadcast build twice per run.
    val bmap = side(nameMap.select(col("entity_name"), col("canonical_id")))
    triples
      .join(bmap, col("subj") === col("entity_name"))
      .withColumnRenamed("canonical_id", "subj_id")
      .drop("entity_name")
      .join(bmap, col("obj") === col("entity_name"))
      .withColumnRenamed("canonical_id", "obj_id")
      .drop("entity_name")
      .filter(col("subj_id") =!= col("obj_id"))
      .withColumn("salt", pmod(xxhash64(col("chunkId")), lit(salts)))
      .groupBy("subj_id", "pred", "obj_id", "salt")
      .agg(
        count(lit(1)).as("n_sources"),
        min("description").as("description"),
        BoundedAgg.distinctMin(col("chunkId"), listCap).as("source_chunks"))
      .groupBy("subj_id", "pred", "obj_id")
      .agg(
        sum("n_sources").as("n_sources"),
        min("description").as("description"),
        BoundedAgg.distinctMinFlat(col("source_chunks"), listCap)
          .as("source_chunks"))
  }
}
