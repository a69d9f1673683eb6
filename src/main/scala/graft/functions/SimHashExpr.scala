package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash's 64-bit majority-vote fingerprint as ONE fused codegen
  * expression (r17 valued-probe audit, VERDICT r16 #3).
  *
  * The previous formulation (Dedup.simhashHof, kept as the parity
  * witness) was 64 independent `size(filter(hashes, bit-i test))` HOF
  * passes under a reduce — every pass an interpreted per-element lambda
  * with boxing, re-walking the token-hash array, measured 11.6 µs/row at
  * the 100× decade vs the 0.36 µs one-pass xxhash64 baseline (SCALE_r17
  * §3). The fused kernel hashes each token ONCE (the same
  * XXH64.hashUTF8String Spark's xxhash64 compiles to, seed 42) and
  * accumulates all 64 bit counters in a single walk.
  *
  * Bit-parity contract with the HOF form, pinned in DedupSpec:
  *  - a null token element contributes the SEED (xxhash64(null) returns
  *    its seed unchanged — hash expressions skip null children);
  *  - n is numElements INCLUDING nulls (size(hashes) counts them);
  *  - bit i set iff 2·setCnt ≥ n in Int arithmetic — so the EMPTY token
  *    array fingerprints to -1L (0 ≥ 0 on all 64 bits), exactly like
  *    the HOF form.
  */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var k = 0
    while (k < n) {
      val h =
        if (a.isNullAt(k)) seed
        else XXH64.hashUTF8String(a.getUTF8String(k), seed)
      var i = 0
      while (i < 64) { cnt(i) += ((h >>> i) & 1L).toInt; i += 1 }
      k += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (2 * cnt(i) >= n) fp |= 1L << i; i += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $c.numElements();
         |int[] $cnt = new int[64];
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $c.isNullAt($k) ? ${seed}L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUTF8String($c.getUTF8String($k), ${seed}L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $cnt[$i] += (int) (($h >>> $i) & 1L);
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if (2 * $cnt[$i] >= $n) { $fp |= 1L << $i; }
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHashExpr {
  /** Column wrapper: fused 64-bit SimHash fingerprint of a token array. */
  def simhash64(tokens: Column, seed: Long = 42L): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens), seed))
}
