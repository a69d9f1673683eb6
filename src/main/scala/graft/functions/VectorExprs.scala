package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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
  *
  * array<float> children are read NATIVELY (r16): each element is
  * widened float→double at read time — the exact value a Cast to
  * array<double> would produce (IEEE widening is exact), with no
  * per-call array materialization. This matters because CollapseProject
  * inlines a projected `cast(vec as array<double>)` into EVERY consumer
  * of the projected column: the 96-dot sign-LSH signature chain was
  * paying 96 interpreted `transform` casts per row (measured 60.6 s of
  * q_lsh_topk's 62.3 s at the 100× decade — the "candidate join" was
  * actually the duplicated cast). Reading floats in place removes the
  * cast from the plan entirely.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dot_product needs array<float>/array<double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloatArr(left), isFloatArr(right))
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      def rd(v: String, float: Boolean) =
        if (float) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${rd(a, isFloatArr(left))} * ${rd(b, isFloatArr(right))};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-API wrapper: dot(a, b) with whole-stage codegen over
    * array<float> or array<double> columns, floats read natively (no
    * cast materialization — see the DotProduct scaladoc). Non-float
    * numeric arrays fail analysis loudly; cast at the call site. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
