package graft.pipeline

import graft.pages.PagesGenerator
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpointing + lineage metrics — the Spark-native form of
  * the reference's temp-batch JSON checkpoints and chunk-exists resume
  * filter (reference test_event_GraphExtractor.py:73-91,
  * Base_Neo4j.py:109-158; SURVEY.md §7.3).
  *
  * Each stage writes its output table under `outDir/<stage>` and appends
  * per-partition lineage rows (run_id, stage, partition_id, rows,
  * wall_ms, committed_at) to `outDir/_metrics`. A resumed run skips any
  * stage whose output already committed (parquet _SUCCESS marker — the
  * atomic-commit analogue of the reference's chunk-exists check) and
  * recomputes only downstream stages, so a job killed after stage k
  * replays nothing before k+1.
  */
final class Lineage(
    spark: SparkSession,
    outDir: String,
    runId: String,
    resume: Boolean,
    jobFingerprint: String = "") {

  // Hadoop FileSystem API, not java.nio: outDir may be any scheme the
  // cluster mounts (hdfs://, s3a://, ...) — a driver-local Files.exists
  // would silently never see a remote _SUCCESS and resume would rerun
  // every stage
  private def committed(path: String): Boolean = {
    val p = new Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // Semantic-format stamp: schema guards (`requires`) can't see a
  // change that keeps columns identical but alters their MEANING (e.g.
  // the event-ordinal recipe feeding event_id) — resuming across such
  // a change would join new-recipe ids against old-recipe rows and
  // silently produce empty/missing edges. A stage is only reusable if
  // its stamp matches Lineage.FormatVersion PLUS the job fingerprint
  // (input identity) PLUS the stage's extra fingerprint (its tuning
  // config, for cfg-dependent stages): without these, `KGJob ... resume
  // --merge-threshold=0.99` would read every canonicalization stage
  // back from the 0.95-threshold run and silently ignore the new
  // flags. The extra fingerprint is PER STAGE so a retuned flag
  // recomputes only the cfg-dependent tail — the expensive extraction
  // front (which depends on the input, not the knobs) is still reused;
  // at 10^12-document scale that reuse is the point of the lineage.
  // The stamp is written AFTER the parquet commit, so a crash between
  // the two recomputes (safe direction).
  private def stampPath(path: String) = new Path(path, "_graft_format")

  private def stampValue(extra: String): String =
    Seq(Lineage.FormatVersion, jobFingerprint, extra)
      .filter(_.nonEmpty).mkString("|")

  private def stampMatches(path: String, extra: String): Boolean = {
    val p = stampPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else
      try {
        val in = fs.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          out.toString("UTF-8").trim == stampValue(extra)
        } finally in.close()
      } catch {
        // any unreadable/corrupt stamp means "unknown version":
        // recompute — NonFatal, not just IOException, so an exotic FS
        // implementation error degrades to a safe recompute exactly
        // like the adjacent requires-guard does
        case scala.util.control.NonFatal(_) => false
      }
  }

  private def writeStamp(path: String, extra: String): Unit = {
    val p = stampPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(stampValue(extra).getBytes("UTF-8")) finally out.close()
  }

  /** Run (or resume) one stage. The returned frame always reads from
    * the committed parquet, so downstream stages see identical data
    * whether the stage ran or was skipped.
    *
    * @param requires columns the committed output must carry to be
    *   reusable: a resume against an outDir written by an older library
    *   version whose stage schema predates them recomputes the stage
    *   instead of crashing downstream with a missing-column error.
    * @param fingerprint extra stage identity folded into the format
    *   stamp — pass the tuning config (its case-class toString) for
    *   stages whose OUTPUT depends on it, so a resume under different
    *   flags recomputes them instead of serving the old run's data. */
  def stage(name: String, requires: Seq[String] = Nil,
      fingerprint: String = "")
      (compute: => DataFrame): DataFrame = {
    val path = s"$outDir/$name"
    val reusable = resume && committed(path) &&
      stampMatches(path, fingerprint) &&
      (requires.isEmpty || {
        try {
          val cols = spark.read.parquet(path).columns.toSet
          requires.forall(cols)
        } catch { case _: Exception => false }
      })
    if (!reusable) {
      val t0 = System.nanoTime()
      compute.write.mode(SaveMode.Overwrite).parquet(path)
      writeStamp(path, fingerprint)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val written = spark.read.parquet(path)
      // one lineage row per committed file: these files ARE the next
      // stage's input files, so (file, rows) is the input-file + row-
      // range record the resume check consults (north rule: lineage =
      // input file, row ranges, counts per partition)
      val partRows = written
        .groupBy(spark_partition_id().as("partition_id"),
          input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("run_id", lit(runId))
        .withColumn("stage", lit(name))
        .withColumn("wall_ms", lit(wallMs))
        .withColumn("committed_at", current_timestamp())
        .select("run_id", "stage", "partition_id", "file", "rows",
          "wall_ms", "committed_at")
      partRows.write.mode(SaveMode.Append).parquet(s"$outDir/_metrics")
    }
    spark.read.parquet(path)
  }

  // mergeSchema: _metrics is append-only across runs, so directories
  // written by different library versions may mix schemas
  def metrics(): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$outDir/_metrics")
}

object Lineage {
  /** Bump whenever any stage's output SEMANTICS change in a way the
    * column guards can't detect (columns unchanged, meaning changed) —
    * e.g. the round-2 switch of event ordinals from KB-spec ord to
    * dense within-chunk position, which changed event_id values under
    * an identical schema. Version "3": the current (dense-ordinal)
    * recipe; pre-stamp outDirs (round <= 2) have no marker and always
    * recompute. */
  val FormatVersion = "3"

  /** The exact stamp a KGJob.run stage commits (version | nPages
    * [| cfg]) — for tests that must restore a wiped stamp. */
  def stampFor(nPages: Long, extra: String = ""): String =
    Seq(FormatVersion, nPages.toString, extra).filter(_.nonEmpty)
      .mkString("|")
}

/** spark-submit entry for the full KG job:
  *   runMain graft.pipeline.KGJob <nPages> <outDir> [resume] [--flags]
  * Tuning knobs ([[graft.GraftConfig]] — the reference's
  * framework/config.py surface) arrive as `--key=value` flags, e.g.
  * `--merge-threshold=0.97 --name-bands=32 --name-rows=4`.
  * Stage graph with per-stage commit + resume (north rule: resumable
  * from checkpoint with per-partition lineage + metrics).
  */
object KGJob {
  def main(args: Array[String]): Unit = {
    val (cfg, positional) = graft.GraftConfig.fromArgs(args.toSeq)
    val nPages = positional.headOption.map(_.toLong).getOrElse(1000L)
    val outDir = if (positional.length > 1) positional(1) else "/tmp/graft_kg"
    val resume = positional.contains("resume")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see Bench.session: the canonicalization aggs carry capped
      // accumulator state, so hash aggregation is safe far beyond the
      // 128-key sort-fallback default
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val result = run(spark, nPages, outDir, resume, cfg = cfg)
    val sec = (System.nanoTime() - t0) / 1e9
    result.foreach { case (k, v) => println(f"[kg] $k%-10s $v%,d rows") }
    println(f"[kg] wall ${sec}%.1f s")
    spark.stop()
  }

  /** Stage-checkpointed pipeline; returns stage -> row count. */
  def run(spark: SparkSession, nPages: Long, outDir: String,
      resume: Boolean = false, partitions: Int = 32,
      cfg: graft.GraftConfig = graft.GraftConfig.default)
      : Seq[(String, Long)] = {
    import spark.implicits._
    // job fingerprint = input identity (every stage's data depends on
    // nPages); the cfg-dependent canonicalization tail additionally
    // stamps the full tuning config (case-class toString is canonical),
    // so `resume --merge-threshold=0.99` recomputes entities/name_map/
    // edges/participates/event_similar but still reuses the expensive
    // extraction front
    val lin = new Lineage(spark, outDir, s"run_$nPages", resume,
      jobFingerprint = nPages.toString)
    val cfgFp = cfg.toString

    val pages = lin.stage("pages") {
      PagesGenerator.pages(spark, nPages, partitions).toDF()
    }
    val chunks = lin.stage("chunks", requires = Seq("content_hash")) {
      KGPipeline.chunk(pages.as[graft.pages.Page]).toDF()
    }
    val distinct = lin.stage("chunks_distinct", requires = Seq("content_hash")) {
      // keyed by FULL content hash (deterministic: identical contents
      // are identical rows); the lossy 8-hex chunk_id dedup happens
      // deterministically inside extract (min_by content_hash)
      chunks.dropDuplicates("content_hash")
    }
    // lazy: when a resumed run finds both outputs committed, the
    // upstream computation (incl. the eager CC fixpoint) never runs
    lazy val extracted = KGPipeline.extract(spark,
      distinct.as[KGPipeline.ChunkRow])
    val mentions = lin.stage("mentions", requires = Seq("ord"))(extracted.mentions)
    val triples = lin.stage("triples")(extracted.triples)
    val events = lin.stage("events")(extracted.events)
    val eventEdges = lin.stage("event_edges") {
      KGPipeline.eventEdges(events, extracted.eventRels)
    }
    lazy val cano = graft.canon.Canonicalizer.canonicalize(
      mentions.withColumnRenamed("chunk_id", "chunkId"), cfg)
    val entities = lin.stage("entities", fingerprint = cfgFp)(cano._1)
    // requires name_key: a resume over an outDir committed before the
    // name map carried it would otherwise reuse the 2-column table and
    // break the alias-closure/entity-counts consumers downstream
    val nameMap = lin.stage("name_map", requires = Seq("name_key"),
      fingerprint = cfgFp)(cano._2)
    val edges = lin.stage("edges", fingerprint = cfgFp) {
      graft.canon.Canonicalizer.rewriteTriples(
        triples.withColumnRenamed("chunk_id", "chunkId"), nameMap, cfg)
    }
    val participates = lin.stage("participates", fingerprint = cfgFp) {
      events.select(col("event_id"), explode(col("participants")).as("entity_name"))
        .join(nameMap, "entity_name")
        .select(col("canonical_id"), col("event_id"))
        .distinct()
    }
    val eventSimilar = lin.stage("event_similar", fingerprint = cfgFp) {
      graft.canon.Canonicalizer.eventKnn(events,
        cfg.eventKnnTopK, cfg.eventKnnCutoff)
    }
    Seq(
      "pages" -> pages.count(), "chunks" -> chunks.count(),
      "mentions" -> mentions.count(), "triples" -> triples.count(),
      "events" -> events.count(), "event_edges" -> eventEdges.count(),
      "entities" -> entities.count(),
      "edges" -> edges.count(), "participates" -> participates.count(),
      "event_similar" -> eventSimilar.count())
  }

}
