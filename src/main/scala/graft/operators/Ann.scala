package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Embeddings.{dot, norm}

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>/array<double>).
  *
  *  - `bruteTopK` — exact cosine top-k; the correctness baseline. The
  *    query set is broadcast, so the corpus is scanned once with no
  *    shuffle until the final tiny per-query top-k.
  *  - `signLshBuckets` / `lshTopK` — random-hyperplane (sign) LSH: each
  *    vector gets a `nBits`-bit signature from seeded pseudo-random
  *    hyperplanes; candidates = same-bucket vectors across `nTables`
  *    independent tables; exact cosine re-rank on candidates. The scale
  *    path: at 100 TB the bucket id is the shuffle/partition key.
  *
  * Hyperplanes are derived from xxhash64(seed, table, bit, dim) mapped to
  * ±1 components — deterministic, no RNG state, identical on every
  * executor (no driver-side weight broadcast needed).
  */
object Ann {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact cosine top-k of `queries` against `corpus`.
    * Both frames: (id, vec). Output: (q_id, id, cosine, rank<=k). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select($"id", asDouble($"vec").as("v"))
      .withColumn("nrm", norm($"v"))
    val q = queries.select($"id".as("q_id"), asDouble($"vec").as("q_v"))
      .withColumn("q_nrm", norm($"q_v"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"id".asc)
    c.join(broadcast(q), $"id" =!= $"q_id")
      .select($"q_id", $"id",
        (dot($"q_v", $"v") / ($"q_nrm" * $"nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  /** ±1 pseudo-random hyperplane dot-product sign for one (table, bit):
    * sign(Σ_d vec[d] * h(seed,table,bit,d)) where h ∈ {+1,-1}. */
  private def signBit(vec: Column, table: Int, bit: Int, seed: Int): Column = {
    val s = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x.cast("double") *
          when(xxhash64(lit(seed), lit(table), lit(bit), d)
            .bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)),
      lit(0.0), (acc, v) => acc + v)
    when(s >= 0, 1L).otherwise(0L)
  }

  /** nBits-bit signature per table: long bucket id. */
  def signature(vec: Column, table: Int, nBits: Int, seed: Int): Column =
    (0 until nBits).map(b =>
      shiftleft(signBit(vec, table, b, seed), b)).reduce(_.bitwiseOR(_))

  /** (table, bucket) keys for a vector — one row per table after explode. */
  def signLshBuckets(vec: Column, nTables: Int, nBits: Int,
      seed: Int = 42): Column =
    array((0 until nTables).map(t =>
      struct(lit(t).as("table"), signature(vec, t, nBits, seed).as("bucket"))): _*)

  /** LSH-bucketed approximate top-k: candidates share a (table, bucket)
    * with the query in any of `nTables` tables; exact cosine re-rank.
    * Recall < 1 by construction; raise nTables / lower nBits to trade
    * cost for recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nTables: Int = 8, nBits: Int = 12, seed: Int = 42): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def withBuckets(df: DataFrame, idAs: String, vAs: String) = df
      .select(col("id").as(idAs), asDouble($"vec").as(vAs))
      .withColumn("bk", explode(signLshBuckets(col(vAs), nTables, nBits, seed)))
      .select(col(idAs), col(vAs), $"bk.table".as("table"), $"bk.bucket".as("bucket"))
    val c = withBuckets(corpus, "id", "v")
    val q = withBuckets(queries, "q_id", "q_v")
    val cand = c.join(q, Seq("table", "bucket"))
      .filter($"id" =!= $"q_id")
      .select($"q_id", $"q_v", $"id", $"v")
      .groupBy($"q_id", $"id").agg(first($"q_v").as("q_v"), first($"v").as("v"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"id".asc)
    cand
      .select($"q_id", $"id",
        (dot($"q_v", $"v") / (norm($"q_v") * norm($"v"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }
}
