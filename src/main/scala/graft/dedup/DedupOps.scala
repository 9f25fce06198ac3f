package graft.dedup

import graft.lsh.{MinHasher, SimHasher}
import graft.text.TextOps
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline. Exact and
  * normalized dedup are pure hash-aggregates (one shuffle on the hash
  * key — uniform by construction, no skew). MinHash/SimHash live in
  * graft.lsh and are wired here as candidate-pair generators.
  */
object DedupOps {

  /** Exact duplicate groups: md5(text) -> group size + representative
    * (min doc_id = deterministic keeper). Scale: shuffle key is a hash,
    * perfectly uniform; map-side partial agg shrinks each group to one
    * row per partition. */
  def exactGroups(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("group_size"),
        min("doc_id").as("keep_doc_id"))

  /** Documents to drop under exact dedup (all but the min doc_id per
    * normalized fingerprint). Implemented as a self-contained window-free
    * aggregate + semi-join back, so it scales without a per-group sort. */
  def exactDropList(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("fp", TextOps.fingerprint(col("text")))
    val keepers = docs.groupBy("fp").agg(min("doc_id").as("keep_doc_id"))
    docs.join(keepers, Seq("fp"))
      .filter(col("doc_id") =!= col("keep_doc_id"))
      .select("doc_id", "keep_doc_id")
  }

  /** Word n-gram shingle sets per document (distinct), the substrate for
    * Jaccard similarity / MinHash. Explode is a narrow op; distinct is
    * the only shuffle. */
  def wordShingles(docs: DataFrame, n: Int): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("shingle"))
      .filter(size(split(col("shingle"), " ")) === n)
      .distinct()
  }

  /** Exact pairwise Jaccard over word 3-gram shingles: candidate pairs
    * share at least one "rare" shingle (2 <= df <= maxDocFreq), then the
    * TRUE Jaccard is computed over the FULL shingle sets of each
    * candidate pair and filtered at minJaccard.
    *
    * Scale notes: the shingle join is the classic "similarity join";
    * hot shingles (stopword n-grams) are the skew risk, so CANDIDATE
    * GENERATION drops shingles occurring in more than `maxDocFreq` docs
    * (a shingle shared by thousands of docs carries ~no discriminating
    * signal but O(df^2) join cost). The VERIFY intersection must then
    * run over the full sets — counting only rare shingles would both
    * underestimate jaccard and misrank pairs. Residual candidate-recall
    * caveat (inherent to any df-capped generation): a qualifying pair
    * whose EVERY shared shingle is hotter than maxDocFreq is never
    * generated; at minJaccard 0.25 such a pair needs >= 25% of its
    * shingles each shared by >1000 docs — pathological boilerplate,
    * which the exact-dedup pass catches when literal. The df >= 2 side
    * of the filter is lossless (a df-1 shingle cannot be shared).
    */
  def jaccardPairs(spark: SparkSession, sfDir: String,
      n: Int = 3, minJaccard: Double = 0.25,
      maxDocFreq: Long = 1000L): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val sh = wordShingles(docs, n).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    // ONE shuffle of the shingle stream: each shingle groups to its full
    // doc list through the all-or-nothing collector (NULL = df over the
    // cap, the same verdict as the former df-count filter; O(cap) state
    // per shingle — math.min clamps a Long cap that would wrap negative
    // and silently drop every shingle group). size >= 2 keeps the
    // lossless df >= 2 side of the old filter.
    val grouped = sh.groupBy("shingle")
      .agg(graft.canon.BoundedAgg.allOrNothingLong(col("doc_id"),
        math.min(maxDocFreq, Int.MaxValue.toLong).toInt).as("ds"))
    val shingleDocs = grouped
      .filter(col("ds").isNotNull && size(col("ds")) >= 2)
      .select("ds")
    // The pair stream out of the two Generates enumerates EVERY
    // sub-cap-shingle co-occurrence of a pair exactly once (shingle sets
    // are distinct per doc), so grouping it counts the sub-cap part of
    // the intersection directly — the former shape re-derived the same
    // counts by joining the distinct candidate set back onto the FULL
    // shingle table twice (measured ~59M join rows at sf0.1 for a 1.1M
    // pair candidate set; guide §2.3 "aggregate before you shuffle").
    val interRare = shingleDocs
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter_rare"))
    // Shingles the cap DROPPED (ds IS NULL) are missing from that
    // stream, yet the exact verify must count them too. Branch on their
    // existence DRIVER-SIDE (one cheap agg over the cached shingles):
    // in the common no-overflow case inter IS the grouped pair count —
    // no verify join at all; with overflows, fall back to the full
    // join-back verify (referencing interRare from a second lazy
    // subtree would re-execute its whole explode+agg per reference).
    val hasHot = !grouped.filter(col("ds").isNull).isEmpty
    val inter =
      if (!hasHot) interRare.withColumnRenamed("inter_rare", "inter")
      else {
        val cands = interRare.select("doc_a", "doc_b")
        cands
          .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
            Seq("doc_b", "shingle"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("inter"))
      }
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("set_size", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("set_size", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** MinHash+LSH near-duplicate pairs: shingle -> 128-hash minhash
    * signature -> 32 banded keys -> equi-self-join on band -> EXACT
    * Jaccard verify >= minJaccard. The band join replaces the all-pairs
    * product (the 10^12-doc scale path); the exact verify makes the
    * output identical to exact all-pairs Jaccard whenever band
    * parameters give ~1 recall at the threshold (here: P(miss | J=0.8)
    * ~= 5e-8 with b=32, r=4 — the testdata near-dups all have J >= 0.8,
    * measured). Signature computation is a narrow mapPartitions; the
    * only shuffles are the band join and the per-doc shingle-set agg.
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val banded = docs.as[(Long, String)].mapPartitions { it =>
      it.flatMap { case (id, text) =>
        val sh = MinHasher.wordShingles(text, n)
        if (sh.isEmpty) Iterator.empty
        else MinHasher.bandKeys(MinHasher.signature(sh)).iterator.map(b => (id, b))
      }
    }.toDF("doc_id", "band")
    // hot-band guard (same rationale as Canonicalizer.MaxBandSize): a
    // band shared by k docs costs k^2/2 join rows with ~no signal.
    // Same one-shuffle member-collect shape as the canonicalizer's name
    // banding: group each band to its doc list (NULL = over the cap ->
    // dropped), stream pairs from two Generates.
    val bandDocs = banded.groupBy("band")
      .agg(graft.canon.BoundedAgg.allOrNothingLong(col("doc_id"),
        graft.canon.Canonicalizer.MaxBandSize).as("ds"))
      .filter(col("ds").isNotNull)
      .select("ds")
    val cands = bandDocs
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    // exact verify on candidates only: per-doc distinct shingle sets
    val sets = wordShingles(docs, n)
      .groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("sset"),
        count(lit(1)).as("set_size"))
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sa"),
        col("set_size").as("size_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sb"),
        col("set_size").as("size_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The per-document 64-bit simhash values — dumped so the driver's
    * oracle can verify [[simhashPairs]]' banding independently: DuckDB
    * recomputes ALL pairs at Hamming <= 3 from these values
    * (bit_count(xor(...))), which must equal the banded+verified pair
    * set exactly (the 4x16 pigeonhole guarantees completeness). The
    * hash VALUES are trust-the-dump; the pair-generation logic is not. */
  def simhashValues(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (id, text) => (id, SimHasher.simhash(text)) }
      }.toDF("doc_id", "simhash")
  }

  /** SimHash near-duplicate pairs: 64-bit simhash over whitespace
    * tokens, banded into 4 x 16-bit blocks (pigeonhole: any pair at
    * Hamming distance <= 3 shares a block), block equi-join for
    * candidates, exact Hamming verify. The hash family is ours
    * (splitmix64) so the oracle runs against the dumped
    * [[simhashValues]] (see there). */
  def simhashPairs(spark: SparkSession, sfDir: String,
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val hashed = docs.as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) => (id, SimHasher.simhash(text)) }
    }.toDF("doc_id", "simhash").persist()
    val blocks = hashed.as[(Long, Long)].mapPartitions { it =>
      it.flatMap { case (id, h) =>
        SimHasher.blockKeys(h).iterator.map(b => (id, h, b))
      }
    }.toDF("doc_id", "simhash", "block")
    val hammingUdf = udf((a: Long, b: Long) => SimHasher.hamming(a, b))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", hammingUdf(col("ha"), col("hb")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
