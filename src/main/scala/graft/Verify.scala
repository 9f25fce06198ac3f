package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Accepts
  * GraftConfig `--key=value` flags anywhere in argv (e.g.
  * `--merge-threshold=0.9 /root/testdata/sf0.01 /tmp/out`) — forwarded
  * into the SparkEntry pipeline config. */
object Verify {
  /** Parse CLI args: GraftConfig flags are applied to
    * [[SparkEntry.config]], positionals return as (sfDir, outDir).
    * Factored out of main so the CLI→pipeline wiring is testable
    * without running the full dump. */
  def configure(args: Array[String]): (String, String) = {
    val (cfg, rest) = GraftConfig.fromArgs(args.toSeq)
    SparkEntry.config = cfg
    require(rest.length == 2,
      s"usage: Verify [--graft-flags] <sfDir> <outDir>; got $rest")
    (rest(0), rest(1))
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = configure(args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same as Bench.session/KGJob: the canonicalization aggregates
      // carry capped accumulator state (BoundedAgg), so object-hash
      // aggregation is safe far past the 128-key sort-fallback default
      // — without this every kg_* dump pays per-partition sorts
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // __OUT__ -> the absolute dump dir: lets an oracle read a *dumped*
    // result (e.g. ann_recall recomputes recall over the dumped
    // approximate ANN results against an independently computed exact
    // top-k)
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__OUT__", absOut))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
