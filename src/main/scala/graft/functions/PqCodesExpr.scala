package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** All mSub PQ subspace codes of a vector as ONE fused codegen kernel
  * (r17 valued-probe audit, VERDICT r16 #3 — the SignLshBuckets pattern
  * applied to the PQ encode).
  *
  * The literal-chain form (Ann.pqCodes: mSub × kSub independent
  * DotProduct nodes under array_max struct chains) is the sign-LSH
  * expression-forest pathology again: measured 133 µs/row at 8×32
  * entries and 68 µs/row at 8×16 (~520 ns per codebook ENTRY, ~30× the
  * entry's FLOP cost; the broadcast-join encode costs ~22 ns/entry
  * including its join — SCALE_r17 §3). The fused kernel reads the
  * vector ONCE into a local double[] and runs the mSub×kSub×dSub loop
  * nest against a constant codebook reference.
  *
  * Bit-parity contract with BOTH prior forms (pinned in AnnSpec):
  *  - per-entry score = strict in-order fold Σ v[m·dSub+j]·c[j] (the
  *    DotProduct contract; j stops at the vector's length like
  *    dot(slice(vh, m·dSub+1, dSub), c) does) minus the SAME
  *    driver-computed ½|c|² double;
  *  - argmax by Spark's TOTAL ORDER on (s, cell) structs — implemented
  *    as java.lang.Double.compare(s, best) ≥ 0 scanning cells ascending,
  *    which reproduces array_max's NaN-greatest, -0.0 < 0.0, and
  *    ties-toward-larger-cell behavior exactly.
  */
case class PqCodesFused(child: Expression,
    codebooks: Array[Array[Array[Double]]], dSub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes needs array<float>/array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_codes"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mSub: Int = codebooks.length

  /** ½|c|² per (subspace, cell) — the IDENTICAL driver-side fold
    * pqCellOf embeds as its literal (0.5 * foldLeft(0.0)(a + x·x)). */
  @transient private lazy val halfCC: Array[Array[Double]] =
    codebooks.map(_.map(c => 0.5 * c.foldLeft(0.0)((a, x) => a + x * x)))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val fl = isFloat
    val codes = new Array[Int](mSub)
    var m = 0
    while (m < mSub) {
      val cb = codebooks(m)
      val hc = halfCC(m)
      var bestS = 0.0
      var bestCell = -1
      var i = 0
      while (i < cb.length) {
        val c = cb(i)
        val lim = math.min(c.length, math.max(0, n - m * dSub))
        var s = 0.0
        var j = 0
        while (j < lim) {
          val v = if (fl) a.getFloat(m * dSub + j).toDouble
                  else a.getDouble(m * dSub + j)
          s += v * c(j)
          j += 1
        }
        s -= hc(i)
        if (bestCell < 0 || java.lang.Double.compare(s, bestS) >= 0) {
          bestS = s; bestCell = i
        }
        i += 1
      }
      codes(m) = bestCell
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val hcRef = ctx.addReferenceObj("halfcc", halfCC, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val lim = ctx.freshName("lim")
      val s = ctx.freshName("s")
      val bestS = ctx.freshName("bestS")
      val bestCell = ctx.freshName("bestCell")
      val cb = ctx.freshName("cb")
      val cent = ctx.freshName("cent")
      val rd = if (isFloat) s"(double) $c.getFloat($m * $dSub + $j)"
               else s"$c.getDouble($m * $dSub + $j)"
      s"""
         |int $n = $c.numElements();
         |int[] $codes = new int[$mSub];
         |for (int $m = 0; $m < $mSub; $m++) {
         |  double[][] $cb = $cbRef[$m];
         |  double $bestS = 0.0;
         |  int $bestCell = -1;
         |  for (int $i = 0; $i < $cb.length; $i++) {
         |    double[] $cent = $cb[$i];
         |    int $lim = java.lang.Math.min($cent.length,
         |      java.lang.Math.max(0, $n - $m * $dSub));
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $lim; $j++) { $s += $rd * $cent[$j]; }
         |    $s -= $hcRef[$m][$i];
         |    if ($bestCell < 0 || java.lang.Double.compare($s, $bestS) >= 0) {
         |      $bestS = $s; $bestCell = $i;
         |    }
         |  }
         |  $codes[$m] = $bestCell;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCodesFused = copy(child = newChild)
}

object PqCodesExpr {
  /** Column wrapper: fused PQ code array (one Int cell per subspace). */
  def pqCodesFused(vh: Column, cb: Seq[Seq[Array[Double]]],
      dSub: Int): Column =
    GraftBridge.column(PqCodesFused(GraftBridge.expression(vh),
      cb.map(_.toArray).toArray, dSub))
}
