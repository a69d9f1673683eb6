package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for the reference's one surviving UDF: the
  * multiset common-word count (F3/Q5, reference Predictor.scala:68-75 —
  * `Seq.intersect` multiplicity semantics). The Scala UDF in TextOps is
  * kept as the executable fidelity reference; this expression computes the
  * IDENTICAL value (property-tested against the UDF) while staying inside
  * whole-stage codegen: no serialization across a UDF boundary, no
  * Seq[String] conversion per call — a UTF8String count-map built from the
  * smaller array and drained by the larger, O(|a|+|b|) with
  * min(|a|,|b|)-bounded memory.
  *
  * Null semantics: expression-level null-in → null-out (standard
  * BinaryExpression); the Column wrapper coalesces to 0 to match the UDF's
  * null → 0 contract. Null ELEMENTS count as a matchable value (Scala
  * `null == null` inside Seq.intersect), kept for exact parity although
  * tokenizers never produce them.
  */
case class MultisetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "multiset_intersect_count"
  // analysis-time contract: without this, a SQL call on e.g. int arrays
  // resolves and then getUTF8String reads garbage at runtime
  // (Seq[DataType] — AbstractDataType is private[sql]; covariant return)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MultisetIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      // static forwarder on the companion class; primitive-args call stays
      // inside the generated method, only the count-map allocates
      s"${ev.value} = graft.functions.MultisetIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultisetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object MultisetIntersectCount {

  /** Multiset intersection size: Σ_token min(count_a, count_b). Called
    * from generated code via the static forwarder — keep the signature
    * JVM-simple. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var nulls = 0
    var i = 0
    while (i < n) {
      if (small.isNullAt(i)) nulls += 1
      else {
        val k = small.getUTF8String(i)
        m.put(k, m.getOrDefault(k, 0) + 1)
      }
      i += 1
    }
    var cnt = 0
    val nl = large.numElements()
    var j = 0
    while (j < nl) {
      if (large.isNullAt(j)) {
        if (nulls > 0) { cnt += 1; nulls -= 1 }
      } else {
        val k = large.getUTF8String(j)
        val c: Int = m.getOrDefault(k, 0)
        if (c > 0) { cnt += 1; m.put(k, c - 1) }
      }
      j += 1
    }
    cnt
  }
}

object TextExprs {
  /** Column wrapper: multiset common-token count with whole-stage codegen.
    * Drop-in for TextOps.commonWordsMultiset — identical values including
    * the null-array → 0 contract (coalesce below). */
  def commonWordsMultiset(a: Column, b: Column): Column =
    coalesce(
      GraftBridge.column(MultisetIntersectCount(
        GraftBridge.expression(a), GraftBridge.expression(b))),
      lit(0))
}
