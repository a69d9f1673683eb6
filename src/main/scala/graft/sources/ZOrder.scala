package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * parquet min/max skipping.
  *
  * Directory partitioning (PartitionedLayout) prunes on ONE always-
  * filtered column; sorting the files prunes on the leading sort key only.
  * When queries filter on SEVERAL dimensions (user AND time, lang AND
  * length), interleaving the bits of the quantized dimensions into one
  * Morton key and range-partitioning + sorting by it gives every dimension
  * locality: a box predicate touches the few files whose key range
  * intersects the box, and parquet row-group min/max statistics skip the
  * rest. This is Delta/Iceberg's OPTIMIZE ZORDER BY, built from plain
  * column expressions — no table format required.
  *
  * Quantization maps each dimension to `bits` levels between its observed
  * min/max (one tiny agg pass, collected to the driver as plan literals).
  * Skewed dimensions quantize unevenly — at production scale substitute
  * rank-based bucketing (ntile) for the linear scale; the interleave is
  * unchanged.
  */
object ZOrder {

  /** Morton key of the given (already-quantized, non-negative int) bucket
    * columns: bit i of dimension d lands at position i*dims + d. With
    * `bits` per dimension the key spans bits×dims bits (≤ 63 supported:
    * e.g. 3 dims × 20 bits). */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val dims = buckets.size
    require(dims > 0 && bits * dims <= 63,
      s"$dims dims × $bits bits exceeds a long")
    val pieces = for {
      i <- 0 until bits
      (b, d) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), i * dims + d)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Linear quantization of `c` to [0, 2^bits) between known lo/hi. */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val levels = (1L << bits) - 1
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(greatest(
      floor((c.cast("double") - lo) / span * levels).cast("long"),
      lit(0L)), lit(levels))
  }

  /** `df` re-clustered on the Morton key of `cols`: range-partitioned into
    * `numFiles` tasks (→ files on write) and sorted within each, so both
    * file-level value ranges and parquet row-group min/max statistics are
    * tight on every listed dimension. */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 12,
      numFiles: Int = 16): DataFrame = {
    // withColumn silently replaces a same-named caller column — fail fast
    require(!df.columns.contains("__z"),
      "input already has a __z column (reserved by ZOrder)")
    val stats = df.select(cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*)
      .head
    // A dimension with null min/max (all-null column, or empty input)
    // carries no clustering signal: drop IT, keep clustering on the
    // others — one dead dimension must not silently disable the whole
    // layout. With no live dimension left, return df unchanged.
    val live = cols.zipWithIndex
      .filterNot { case (_, i) => stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1) }
    if (live.isEmpty) return df
    val buckets = live.map { case (c, i) =>
      quantize(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__z", interleave(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
