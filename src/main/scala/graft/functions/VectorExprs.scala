package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math over array<double>
  * columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate the
  * lambda interpreted, per element, with boxing — they are the reason the
  * brute-force cosine queries crawl. `DotProduct` is a primitive-loop
  * `doGenCode` expression: it stays inside whole-stage codegen and reads
  * doubles straight out of `ArrayData`.
  *
  * Numeric contract: strict in-order left fold (sum += a[i]*b[i] for
  * i = 0..n-1) — bit-identical to the `aggregate(zip_with(...))`
  * formulation in graft.queries.Embeddings and to the DuckDB oracle's
  * `list_reduce(list_transform(...))`, so swapping implementations never
  * changes a result hash.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // Inputs must already be array<double>; the Column wrapper below casts.

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-API wrapper: dot(a, b) with whole-stage codegen. Accepts any
    * numeric array column (cast to array<double> here). */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
