package graft.embed

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * ARRAY<FLOAT> columns, with whole-stage codegen (SURVEY.md §7.5:
  * keeps the LSH verify stage inside codegen instead of falling out to
  * a Scala UDF). Null if either side is null; 0.0 if either norm is 0.
  *
  * Replaces the reference's numpy all-pairs cosine
  * (reference encapsulation/database/graph_db/Base_Neo4j.py:561-584)
  * as the *verify* step on LSH candidates only.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.embed.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    // account for tail elements in the longer vector's norm
    var j = n
    while (j < x.numElements()) { val a = x.getFloat(j).toDouble; nx += a * a; j += 1 }
    j = n
    while (j < y.numElements()) { val b = y.getFloat(j).toDouble; ny += b * b; j += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  /** Column API. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(new CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
