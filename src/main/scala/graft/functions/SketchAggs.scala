package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Graft-native sketch aggregates (custom Catalyst
  * TypedImperativeAggregate — the same machinery behind Spark's HLL++ and
  * percentile_approx).
  */
object SketchAggs {

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer. private[graft]
    * so the replay oracles (oracle/XxhReplaySql.SplitmixReplaySql) can
    * evaluate probe/seed constants from THIS implementation rather than
    * a drift-prone copy. */
  private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The chained per-byte splitmix hash CountMinEstimate keys on —
    * shared with the replay oracle for the same no-drift reason. */
  private[graft] def chainHash(s: String, seed: Long): Long = {
    val b = s.getBytes("UTF-8")
    var h = seed
    var i = 0
    while (i < b.length) { h = mix(h ^ (b(i) & 0xffL)); i += 1 }
    h
  }

  /** Deterministic uniform k-sample of a long column's DISTINCT values —
    * surfaced as `bottomKSample(col, k, seed)`, output array<bigint>
    * (values sorted ascending) per group. */
  def bottomKSample(c: Column, k: Int, seed: Long): Column =
    GraftBridge.column(BottomKSample(GraftBridge.expression(c), k, seed)
      .toAggregateExpression())

  /** HLL raw-estimator bias constant α_m — shared with the replay oracle
    * (the same double lands as a literal in the SQL). */
  private[graft] def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HyperLogLog distinct-count sketch of a long column — output
    * struct<est:double, n_zero:bigint> per group (raw estimator +
    * zero-register count; see HllDistinct). */
  def hllDistinct(c: Column, p: Int, seed: Long): Column =
    GraftBridge.column(HllDistinct(GraftBridge.expression(c), p, seed)
      .toAggregateExpression())

  /** Bottom-k row sample of a measure keyed by a unique row key —
    * output array<double> (the k min-hash rows' measure values, sorted
    * ascending) per group. */
  def bottomKPairs(key: Column, value: Column, k: Int, seed: Long): Column =
    GraftBridge.column(BottomKPairs(GraftBridge.expression(key),
      GraftBridge.expression(value), k, seed).toAggregateExpression())

  /** HLL register state (binary) per group — sketch-state-as-data for
    * merge-on-read materialized views (see HllRegisters). */
  def hllRegisters(c: Column, p: Int, seed: Long): Column =
    GraftBridge.column(HllRegisters(GraftBridge.expression(c), p, seed)
      .toAggregateExpression())

  /** Merge stored HLL register states (binary column) per group. */
  def hllMerge(c: Column, p: Int): Column =
    GraftBridge.column(HllMerge(GraftBridge.expression(c), p)
      .toAggregateExpression())

  /** Score a stored HLL register state: struct<est, n_zero>. */
  def hllEstimate(c: Column): Column =
    GraftBridge.column(HllEstimate(GraftBridge.expression(c)))

  /** Misra–Gries frequent-items summary of a string column — output
    * array<struct<item,est,err>> per group, sorted (est desc, item asc).
    * For every item: est ≤ true ≤ est + err, and any item with
    * true > err is guaranteed present. */
  def frequentItems(c: Column, capacity: Int): Column =
    GraftBridge.column(FrequentItems(GraftBridge.expression(c), capacity)
      .toAggregateExpression())

  /** Count-Min point-frequency estimates for a fixed probe set — output
    * array<struct<item,est>> per group, in `items` order. est ≥ true
    * always; the merged sketch is partition-invariant (exact sum). */
  def cmEstimate(c: Column, items: Seq[String], widthLog2: Int = 10,
      depth: Int = 4, seed: Long = 42L): Column =
    GraftBridge.column(CountMinEstimate(GraftBridge.expression(c), items,
      widthLog2, depth, seed).toAggregateExpression())
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

/** Mutable Misra–Gries buffer: capped counter map + accumulated
  * decrement mass (the summary's one-sided error bound). */
final class FreqBuf(
    val counts: java.util.HashMap[String, Long] = new java.util.HashMap,
    var err: Long = 0L)

/** Misra–Gries (frequent-items) aggregate over a string column.
  *
  * Heavy-hitters at corpus scale without the exact top-k's full
  * (group, item) shuffle: each map task keeps at most `capacity`
  * counters, decrementing all of them by the minimum count whenever a
  * new item overflows the cap (the batched form of MG's decrement; the
  * subtracted mass accumulates in `err`). The published deviation from
  * textbook MG is the merge: instead of re-truncating after every
  * pairwise merge — whose result would depend on Spark's task-completion
  * order — merge is a truncation-free pointwise SUM of counters and
  * errors, and ONE truncation runs at eval. The merged result is then a
  * pure function of the set of per-partition summaries, not of merge
  * order, at the cost of a transiently larger final buffer
  * (≤ partials × capacity entries — for capacity O(100) that is KBs per
  * group even at thousand-executor width).
  *
  * Contract (the mergeable-summaries guarantee, preserved by sum +
  * single truncation): for every emitted item, est ≤ true ≤ est + err,
  * and every item with true count > err is present in the summary.
  * Estimates still depend on how rows were partitioned (each partition
  * truncates its own view), so unlike BottomKSample the OUTPUT is not
  * partition-invariant — only the error contract is. Nulls are skipped.
  */
case class FrequentItems(child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuf]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def prettyName: String = "mg_freq_items"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): FreqBuf = new FreqBuf()

  /** Subtract `delta` from every counter, dropping non-positive ones,
    * and charge the subtracted mass to the error bound. */
  private def decrement(buf: FreqBuf, delta: Long): Unit = {
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= delta) it.remove()
      else e.setValue(e.getValue - delta)
    }
    buf.err += delta
  }

  override def update(buf: FreqBuf, input: InternalRow): FreqBuf = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias a reused scan buffer — copy to a String key
      val s = v.toString
      buf.counts.merge(s, 1L, (a, b) => a + b)
      if (buf.counts.size > capacity) {
        var min = Long.MaxValue
        val it = buf.counts.values().iterator()
        while (it.hasNext) { val c = it.next(); if (c < min) min = c }
        decrement(buf, min)
      }
    }
    buf
  }

  override def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.counts.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    a.err += b.err
    a
  }

  override def eval(buf: FreqBuf): Any = {
    import scala.jdk.CollectionConverters._
    var entries = buf.counts.entrySet().asScala.toArray
      .map(e => (e.getKey, e.getValue))
    var err = buf.err
    if (entries.length > capacity) {
      // single deterministic truncation of the merged summary: subtract
      // the (capacity+1)-th largest count, drop what hits zero
      val delta = entries.map(_._2).sorted(Ordering[Long].reverse)(capacity)
      entries = entries
        .collect { case (k, c) if c > delta => (k, c - delta) }
      err += delta
    }
    val sorted = entries.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c, err)
    })
  }

  override def serialize(buf: FreqBuf): Array[Byte] = {
    val items = buf.counts.entrySet().iterator()
    var bytes = 0
    val enc = new Array[(Array[Byte], Long)](buf.counts.size)
    var i = 0
    while (items.hasNext) {
      val e = items.next()
      val b = e.getKey.getBytes("UTF-8")
      enc(i) = (b, e.getValue)
      bytes += 4 + b.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(4 + 8 + bytes)
    bb.putInt(enc.length)
    bb.putLong(buf.err)
    enc.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqBuf()
    buf.err = bb.getLong
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}

/** Mutable Count-Min buffer: depth × width long counters, flat. */
final class CmBuf(val counters: Array[Long])

/** Count-Min sketch point-frequency estimates (Cormode & Muthukrishnan
  * 2005) over a string column, for a fixed probe set: the third sketch
  * family next to Misra–Gries (which items are heavy) and HLL (how many
  * distinct) — CM answers "how OFTEN does each of THESE occur" in
  * O(width·depth) state regardless of cardinality.
  *
  * The property that earns it a place here: merge is an elementwise
  * counter SUM — exact, commutative, associative — so unlike Misra–Gries
  * the merged sketch (and therefore every estimate) is a pure function
  * of the row multiset, bit-identical under any partitioning, task
  * order, or AQE re-plan (pinned in SketchAggsSpec under 1/3/8
  * partitions). Guarantees: est ≥ true always (hashing only ever ADDS
  * collisions), and est ≤ true + εN with ε = e/width at probability
  * 1 − e^−depth over the seeded hash family.
  *
  * Rows hash with the splitmix64 chain below (full-avalanche per byte),
  * one derived bucket per depth row. Probe items ride in the expression
  * as literals, so eval emits a slim array<struct<item,est>> per group
  * and the sketch itself never leaves the executor. Nulls are skipped.
  */
case class CountMinEstimate(child: Expression, items: Seq[String],
    widthLog2: Int, depth: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmBuf]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(widthLog2 >= 1 && widthLog2 <= 24,
    s"widthLog2 out of range: $widthLog2")
  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(items.nonEmpty, "need at least one probe item")

  private val width = 1 << widthLog2
  private val mask = width - 1

  override def prettyName: String = "cm_estimate"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(StringType)

  /** Full-avalanche chained hash of UTF-8 bytes, then one derived value
    * per depth row. */
  private def baseHash(s: String): Long = SketchAggs.chainHash(s, seed)
  private def bucket(base: Long, d: Int): Int =
    (SketchAggs.mix(base + d) & mask).toInt

  override def createAggregationBuffer(): CmBuf =
    new CmBuf(new Array[Long](width * depth))

  override def update(buf: CmBuf, input: InternalRow): CmBuf = {
    val v = child.eval(input)
    if (v != null) {
      val base = baseHash(v.toString)
      var d = 0
      while (d < depth) {
        buf.counters(d * width + bucket(base, d)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: CmBuf, b: CmBuf): CmBuf = {
    var i = 0
    while (i < a.counters.length) { a.counters(i) += b.counters(i); i += 1 }
    a
  }

  override def eval(buf: CmBuf): Any =
    new GenericArrayData(items.map { item =>
      val base = baseHash(item)
      var est = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = buf.counters(d * width + bucket(base, d))
        if (c < est) est = c
        d += 1
      }
      InternalRow(UTF8String.fromString(item), est)
    }.toArray)

  override def serialize(buf: CmBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.counters.length)
    buf.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val c = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < c.length) { c(i) = bb.getLong; i += 1 }
    new CmBuf(c)
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinEstimate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinEstimate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CountMinEstimate =
    copy(child = newChild)
}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over a long
  * column — the graft-native, REPLAYABLE twin of Spark's HLL++
  * `approx_count_distinct`: same register structure (2^p byte
  * registers, max leading-zero rank), but the row hash is the same
  * seeded splitmix64 the other graft sketches use, so a SQL oracle can
  * rebuild every register — and the estimate — from the raw table
  * (SplitmixReplaySql.hllDistinctSql).
  *
  * Merge is an elementwise register MAX — idempotent, commutative,
  * associative — so the merged sketch is a pure function of the value
  * SET: bit-identical under any partitioning, duplication, task order,
  * or AQE re-plan, with constant 2^p-byte state (the property that makes
  * HLL the distinct-count of choice over a 100 TB corpus: one map pass,
  * one 256-byte-per-group reduce).
  *
  * The emitted estimate is the RAW HLL estimator α_m·m²/Σ 2^−M[j] with
  * the IEEE sum order pinned (register-index-ascending left fold) plus
  * the zero-register count — deliberately NOT the bias-corrected /
  * linear-counting composite: corrections involve libm (ln) whose
  * last-ulp behavior differs across engines, so they belong to the
  * presentation layer. n_zero lets a caller apply linear counting when
  * est ≤ 2.5m; the spec pins the raw estimator's accuracy in its sound
  * regime (n ≫ 2.5m, rel-err ≲ 3·1.04/√m). Nulls are skipped.
  */
case class HllDistinct(child: Expression, p: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 14, s"precision out of range [4,14]: $p")

  private val m = 1 << p

  override def prettyName: String = "hll_distinct"
  override def dataType: DataType = StructType(Seq(
    StructField("est", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("n_zero", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    // rank over the remaining 64-p bits; w == 0 caps at 64-p+1 (HllOps)
    if (v != null) HllOps.observe(buf, p, seed, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllOps.maxInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = {
    val (est, zeros) = HllOps.score(buf)
    InternalRow(est, zeros)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

/** Bottom-k ROW sample carrying a measure: keep the measure values of
  * the k rows whose seeded key hash is smallest — the row-level twin of
  * BottomKSample (which samples distinct VALUES). The sampled row set is
  * a uniform k-subset of the group's rows, a pure function of the key
  * set (same rank function mix(key ^ mix(seed)); collisions between
  * distinct keys are kept and broken by key order, so the result is
  * exactly replayable with no first-arrival caveat). The emitted array
  * is the sample's measure values sorted ascending — position
  * ⌊q·(n−1)⌋+1 is then a deterministic sample-quantile estimator with
  * the standard √k concentration, which is how an approximate quantile
  * can be hash-checked across engines (the sketch quantile algorithms —
  * GK, KLL, t-digest — are all arrival-order-dependent).
  *
  * CONTRACT: the key must uniquely identify the row (a primary key).
  * A violating caller (same key, differing values) fails LOUDLY when
  * the resident twin is still in the buffer — best-effort, but the
  * surviving duplicate is precisely the one that could reach the
  * output; a twin already evicted past rank k is harmless by
  * construction. Same-value re-arrival (task retry, idempotent merge)
  * stays legal. (This is why q_hash_quantiles keys on
  * orders.o_orderkey: the synthetic lineitem repeats (orderkey,
  * linenumber) with different payloads.)
  *
  * State is ≤ k (hash, key, value) triples — map-combinable constant
  * state, no per-group sort of the full data at any scale. Null keys or
  * values are skipped.
  */
case class BottomKPairs(key: Expression, value: Expression, k: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.TreeMap[(Long, Long), Double]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  type Buf = scala.collection.mutable.TreeMap[(Long, Long), Double]

  override def prettyName: String = "bottom_k_pairs"
  override def left: Expression = key
  override def right: Expression = value
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] =
    Seq(LongType, org.apache.spark.sql.types.DoubleType)

  override def createAggregationBuffer(): Buf = new Buf()

  /** Insert, detecting unique-key-contract violations (ADVICE r14):
    * a key re-arriving with a DIFFERENT value while its twin is still
    * resident would otherwise resolve by last-arrival overwrite —
    * partition-order-nondeterministic with no signal. Detection is
    * best-effort by construction (a twin already evicted past rank k is
    * invisible), but any surviving duplicate is exactly the one that
    * could reach the output, so the loud path covers the cases that
    * matter. Same-value re-arrival (task retry, idempotent merge) stays
    * legal — compared via doubleToLongBits so a same-NaN re-arrival is
    * same-value (IEEE != would call every NaN a violation). ±0.0 is
    * canonicalized before the bit compare (ADVICE r16): a task retry
    * whose recomputed float sum legitimately flips zero sign is a
    * same-value re-arrival, not a unique-key violation — `x + 0.0`
    * maps -0.0 to +0.0 and leaves every other value (NaN included)
    * bit-identical. */
  private def sameBits(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a + 0.0) ==
      java.lang.Double.doubleToLongBits(b + 0.0)

  private def insert(buf: Buf, kv: Long, value: Double): Unit = {
    val h = SketchAggs.mix(kv ^ SketchAggs.mix(seed))
    val prior = buf.put((h, kv), value)
    if (prior.exists(!sameBits(_, value)))
      throw new IllegalStateException(
        s"bottom_k_pairs: key $kv re-arrived with value $value != " +
          s"${prior.get} — the key column must uniquely identify the row")
    if (buf.size > k) buf.remove(buf.lastKey)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kv = key.eval(input)
    val v = value.eval(input)
    if (kv != null && v != null)
      insert(buf, kv.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case ((h, kv), v) =>
      val prior = a.put((h, kv), v)
      if (prior.exists(!sameBits(_, v)))
        throw new IllegalStateException(
          s"bottom_k_pairs: key $kv present on both merge sides with " +
            s"differing values ($v vs ${prior.get}) — the key column " +
            "must uniquely identify the row")
      if (a.size > k) a.remove(a.lastKey)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val vs = buf.values.toArray
    java.util.Arrays.sort(vs)
    new GenericArrayData(vs)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    buf.foreach { case ((h, kv), v) =>
      bb.putLong(h); bb.putLong(kv); bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) { buf.put((bb.getLong, bb.getLong), bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BottomKPairs =
    copy(key = newLeft, value = newRight)
}

/** HLL register STATE as a value: the same sketch as HllDistinct, but
  * eval emits the raw 2^p-byte register array (BinaryType) instead of
  * the estimate — sketch-state-as-data, the warehouse pattern where a
  * materialized view stores one sketch per group and refresh merges new
  * state in without touching history (merge-on-read distinct counts).
  * `HllMerge` folds stored states; `HllEstimate` scores them. Because
  * register max-merge is associative/commutative/idempotent,
  * merge(state(A), state(B)) is BIT-IDENTICAL to state(A ∪ B) — so a
  * query that stores, merges, and then estimates hash-matches the
  * full-recompute oracle (q_hll_merge).
  */
case class HllRegisters(child: Expression, p: Int, seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 14, s"precision out of range [4,14]: $p")

  override def prettyName: String = "hll_registers"
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllOps.observe(buf, p, seed, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllOps.maxInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

/** Merge aggregate over STORED HLL register states (BinaryType column of
  * equal-precision sketches): elementwise max — the refresh half of the
  * merge-on-read pattern. Empty groups merge to the all-zero state. */
case class HllMerge(child: Expression, p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 14, s"precision out of range [4,14]: $p")

  override def prettyName: String = "hll_merge"
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val other = v.asInstanceOf[Array[Byte]]
      require(other.length == buf.length,
        s"sketch precision mismatch: ${other.length} vs ${buf.length} registers")
      HllOps.maxInto(buf, other)
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllOps.maxInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllMerge =
    copy(child = newChild)
}

/** Scalar scorer for a stored register state: struct<est, n_zero> with
  * the identical pinned-order fold the HllDistinct aggregate runs —
  * one implementation (HllOps.score) serves both, so store-merge-score
  * cannot drift from aggregate-and-score. Post-aggregation rows only
  * (one per group), so CodegenFallback costs nothing. */
case class HllEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
  with ImplicitCastInputTypes {

  override def prettyName: String = "hll_estimate"
  override def dataType: DataType = StructType(Seq(
    StructField("est", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("n_zero", LongType, nullable = false)))
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType)

  override protected def nullSafeEval(input: Any): Any = {
    val (est, zeros) = HllOps.score(input.asInstanceOf[Array[Byte]])
    InternalRow(est, zeros)
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** The one shared implementation of HLL observe/merge/score — keeps the
  * three-operator state pattern and the single-aggregate HllDistinct
  * bit-aligned by construction. */
private[graft] object HllOps {
  def observe(buf: Array[Byte], p: Int, seed: Long, v: Long): Unit = {
    val h = SketchAggs.mix(v ^ SketchAggs.mix(seed))
    val bucket = (h >>> (64 - p)).toInt
    val w = h << p
    val rho =
      if (w == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > buf(bucket)) buf(bucket) = rho.toByte
  }

  def maxInto(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** (raw estimate, zero-register count) with the pinned
    * register-index-ascending left fold. */
  def score(regs: Array[Byte]): (Double, Long) = {
    val m = regs.length
    var s = 0.0
    var zeros = 0L
    var i = 0
    while (i < m) {
      s += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0) zeros += 1L
      i += 1
    }
    (SketchAggs.hllAlpha(m) * m * m / s, zeros)
  }
}
