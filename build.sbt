ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ragarcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// SPARK_DRIVER_MEM sizes BOTH this forked JVM and (via the inherited
// env) every scaling child Bench pre-touches — under a harness-exported
// large value the two coexisted at 73 + 57 GB and the kernel OOM-killed
// the round-5 bench (BENCH_r05 post-mortem). Clamp both legs here.
// Caps chosen by measurement, not guesswork: the per-query block ran
// 170.8 s with a 16 GiB parent heap vs 149.9 s with 8 GiB in the same
// window (G1 ballooning on this 4 KiB-page-faulting Firecracker VM costs
// more than the space buys — the long-documented reason the default is
// 8g), so the parent is capped AT the default; the pre-touched children
// (no balloon — faults paid up front) get 12 GiB headroom over the 10 g
// every green 1M-1.25M-page rehearsal used.
def clampMem(v: String, capMb: Long): String = {
  val t = v.trim.toLowerCase
  val digits = t.takeWhile(_.isDigit)
  val mb = (if (digits.isEmpty) 0L else digits.toLong) * (t.drop(digits.length) match {
    case "g" | "gb" => 1024L
    case "t" | "tb" => 1024L * 1024L
    case _ => 1L // m / mb / bare => MiB
  })
  s"${math.min(math.max(mb, 1024L), capMb)}m"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // modest fixed heap: this VM (Firecracker) faults memory in 4 KiB
  // pages, so letting G1 balloon to tens of GB costs far more in page
  // faults than the extra space saves in GC
  s"-Xmx${sys.env.get("SPARK_DRIVER_MEM").map(clampMem(_, 8 * 1024L)).getOrElse("8g")}",
)
// forked children (Bench's scaling JVMs) read SPARK_DRIVER_MEM from the
// inherited env for their pre-touched -Xms/-Xmx; pass the CLAMPED value
// through so a harness-exported 64g/100g can never pre-touch the box to
// death alongside the parent. Unset stays unset (Bench's own 10g default).
run / envVars ++= sys.env.get("SPARK_DRIVER_MEM")
  .map(v => "SPARK_DRIVER_MEM" -> clampMem(v, 12 * 1024L)).toMap
