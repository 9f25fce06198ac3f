package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.sortBy(_.name).map { f =>
      if (f.dataType == org.apache.spark.sql.types.BinaryType) md5(col(f.name))
      else col(f.name)
    }
    df.select(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  test("pipeline is deterministic under different parallelism") {
    val a = KGPipeline.run(spark, 150, partitions = 3)
    val b = KGPipeline.run(spark, 150, partitions = 7)
    assert(sortedRows(a.triples) == sortedRows(b.triples))
    assert(sortedRows(a.entities) == sortedRows(b.entities))
    assert(sortedRows(a.edges) == sortedRows(b.edges))
  }

  test("alias variants merge back into base entities") {
    val r = KGPipeline.run(spark, 200, partitions = 4)
    val merged = r.entities.filter(col("n_merged_names") > 1)
    // the planted alias surfaces (suffix/hyphen/case variants) must not
    // survive as canonical entity names — the base always out-mentions
    // its variants, so a surviving variant means a missed merge
    val variantSet = graft.pages.PagesGenerator.aliasSurfaces.toSet
    val names = r.entities.select("entity_name").collect().map(_.getString(0))
    val leaked = names.filter(variantSet.contains)
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
    // upstream stages committed exactly once per run (no replays)
    val m = spark.read.parquet(s"$part/_metrics")
    val commits = m.filter(col("stage") === "pages")
      .select(countDistinct(col("committed_at"))).collect()(0).getLong(0)
    assert(commits == 1L, "resumed run recommitted an upstream stage")
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
