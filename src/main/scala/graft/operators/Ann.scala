package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.dotProduct
import graft.queries.Embeddings.{dot, norm}

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>/array<double>).
  *
  *  - `bruteTopK` — exact cosine top-k; the correctness baseline. The
  *    query set is broadcast, so the corpus is scanned once with no
  *    shuffle until the final tiny per-query top-k.
  *  - `signature`/`lshTopK` — random-hyperplane (sign) LSH: each vector
  *    gets an `nBits`-bit signature per table; candidates = same-bucket
  *    vectors across `nTables` independent tables; exact cosine re-rank
  *    on the deduped candidates. The scale path: at 100 TB the
  *    (table, bucket) id is the shuffle/partition key.
  *
  * Hyperplanes are generated driver-side from a seeded PRNG — fully
  * deterministic, embedded in the plan as literal arrays, and evaluated
  * with the codegen DotProduct expression (a per-(table,bit) interpreted
  * higher-order fold measured ~10× slower at sf0.1).
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

  /** Deterministic ±1 hyperplane for (seed, table, bit): `dim` components
    * from a seeded PRNG. Same on every JVM — no state to broadcast. */
  def hyperplane(table: Int, bit: Int, dim: Int, seed: Int): Array[Double] = {
    val rng = new java.util.Random(
      seed.toLong * 1000003L + table.toLong * 10007L + bit.toLong)
    Array.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  /** nBits-bit signature for one table: bit b = sign(vec · h(table, b)).
    * Codegen dot products over literal hyperplane arrays. */
  def signature(vec: Column, table: Int, nBits: Int, dim: Int,
      seed: Int = 42): Column =
    (0 until nBits).map { b =>
      when(dotProduct(vec, typedlit(hyperplane(table, b, dim, seed))) >= 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Array of (table, bucket) keys for a vector — explode for the join. */
  def signLshBuckets(vec: Column, nTables: Int, nBits: Int, dim: Int,
      seed: Int = 42): Column =
    array((0 until nTables).map(t =>
      struct(lit(t).as("table"),
        signature(vec, t, nBits, dim, seed).as("bucket"))): _*)

  /** LSH-bucketed approximate top-k: candidates share a (table, bucket)
    * with the query in any table; deduped, then exact cosine re-rank.
    * Recall < 1 by construction; raise nTables / lower nBits to trade
    * cost for recall. `dim` is read from the first corpus row. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nTables: Int = 8, nBits: Int = 12, seed: Int = 42): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size($"vec")).head.getInt(0)
    val cv = corpus.select($"id", asDouble($"vec").as("v"))
    val qv = queries.select($"id".as("q_id"), asDouble($"vec").as("q_v"))
    // Bucket frames carry ONLY (table, bucket, id): the nTables×nBits
    // signature dot products run once per input row, and the re-rank
    // vectors come from the slim pre-bucket frames — the previous
    // `c.select(id, v).distinct()` shape re-ran the whole signature
    // lineage (96 dot products/row at the q_lsh_topk parameters) plus an
    // extra shuffle just to recover what `cv` already was.
    def bucketsOf(df: DataFrame, idAs: String, vc: Column) = df
      .select(col(idAs), explode(
        signLshBuckets(vc, nTables, nBits, dim, seed)).as("bk"))
      .select(col(idAs), $"bk.table".as("table"), $"bk.bucket".as("bucket"))
    val c = bucketsOf(cv, "id", $"v")
    val q = bucketsOf(qv, "q_id", $"q_v")
    // slim candidate ids first (dedup across tables), then one exact
    // cosine per unique (q_id, id) — vectors re-joined after the dedup
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter($"id" =!= $"q_id")
      .select($"q_id", $"id").distinct()
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"id".asc)
    cand.join(cv, "id").join(broadcast(qv), "q_id")
      .select($"q_id", $"id",
        (dot($"q_v", $"v") / (norm($"q_v") * norm($"v"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }
}
