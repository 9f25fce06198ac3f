package graft.ext

import graft.embed.CosineSimilarity
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions via
  * SparkSessionExtensions (SURVEY.md §2.8): `cosine_sim(a, b)` becomes
  * callable from `spark.sql(...)` — the same codegen'd Catalyst
  * expression the canonicalization verify stage uses, not a UDF.
  *
  * Two registration paths:
  *  - `--conf spark.sql.extensions=graft.ext.GraftExtensions` at
  *    spark-submit (the production shape);
  *  - `GraftExtensions.register(spark)` on an already-built session
  *    (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
}

object GraftExtensions {

  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 2, "cosine_sim takes exactly two array<float> arguments")
    CosineSimilarity(args.head, args(1))
  }

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (args: Seq[Expression]) => build(args))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", build, "scala_udf")
}
