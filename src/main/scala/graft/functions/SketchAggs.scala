package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Graft-native sketch aggregates (custom Catalyst
  * TypedImperativeAggregate — the same machinery behind Spark's HLL++ and
  * percentile_approx).
  */
object SketchAggs {

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic uniform k-sample of a long column's DISTINCT values —
    * surfaced as `bottomKSample(col, k, seed)`, output array<bigint>
    * (values sorted ascending) per group. */
  def bottomKSample(c: Column, k: Int, seed: Long): Column =
    GraftBridge.column(BottomKSample(GraftBridge.expression(c), k, seed)
      .toAggregateExpression())
}

/** Bottom-k (min-hash) sampling aggregate: keep the k values whose
  * seeded splitmix64 hash is smallest.
  *
  * Why this and not Vitter's reservoir (Algorithm R): a reservoir's
  * content depends on arrival order, so on a cluster the "sample" changes
  * with partitioning, task scheduling, and AQE decisions — untestable and
  * non-reproducible. The bottom-k sketch is a pure function of the value
  * SET: hashing gives every distinct value an i.i.d.-uniform rank, the k
  * smallest ranks are a uniform k-subset, and bottom-k(A ∪ B) =
  * bottom-k(bottom-k(A) ∪ bottom-k(B)) makes the merge exact — same
  * result on 1 partition or 10,000. Duplicates hash identically, so the
  * sample is uniform over distinct values (the usual contract for "sample
  * k example ids per group" in a training-data pipeline).
  *
  * State is ≤ k (hash, value) pairs — constant-size like any sketch;
  * map-side partial aggregation applies. Nulls are skipped.
  */
case class BottomKSample(child: Expression, k: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  type Buf = java.util.TreeMap[java.lang.Long, java.lang.Long]

  override def prettyName: String = "bottom_k_sample"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  // analysis-time contract + implicit widening: int/short children cast
  // to long instead of a runtime ClassCastException in update().
  // (Seq[DataType] — AbstractDataType is private[sql]; covariant return)
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Buf = new Buf()

  private def insert(buf: Buf, v: Long): Unit = {
    val h = SketchAggs.mix(v ^ SketchAggs.mix(seed))
    // 64-bit hash collision between distinct values: keep the first —
    // bias O(k * 2^-64), the standard sketch determinism argument
    if (!buf.containsKey(h)) {
      buf.put(h, v)
      if (buf.size > k) buf.pollLastEntry()
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!a.containsKey(e.getKey)) {
        a.put(e.getKey, e.getValue)
        if (a.size > k) a.pollLastEntry()
      }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val vs = new Array[Long](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { vs(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vs)
    new GenericArrayData(vs)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BottomKSample =
    copy(child = newChild)
}
