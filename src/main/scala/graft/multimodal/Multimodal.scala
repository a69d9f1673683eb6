package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * partitioned so a 1000-executor decode pass is embarrassingly parallel.
  *
  * The decode/feature kernels themselves are STUBS behind a deterministic
  * fake (this container has no image/audio libs — builder prompt): the
  * Spark-side contract — schema, batch shape, partitioning, null paths —
  * is real and tested. Swap `fakeDecode*` for a real kernel (JNI or
  * `mapInPandas` on a PySpark deployment) without touching callers.
  */
object Multimodal {

  /** Canonical media-row schema: id + modality + payload + typed meta. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),                    // opaque bytes
    StructField("mime", StringType),
    StructField("width", IntegerType),                     // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))                 // audio/video

  /** Deterministic fake "decode": a feature vector derived from payload
    * bytes only (length + seeded xxhash64 of the bytes), so tests pin
    * exact values. Shape matches a real embedding kernel: array<float>. */
  def fakeDecodeFeatures(dim: Int = 8): org.apache.spark.sql.Column = {
    val h = xxhash64(col("payload"))
    // dim pseudo-features in [0,1): hash re-seeded per dimension
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("payload"), i), lit(1000000L)).cast("double")
        / 1000000.0).cast("float"))
  }

  /** Image resize stub: passes bytes through, rewrites the metadata the
    * way a real resize kernel would. Real kernel: ??? (JNI/opencv). */
  def resizeStub(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / col("width"), lit(maxSide) / col("height"),
      lit(1.0))
    df.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample stub for video rows: emits one row per sampled frame
    * index at `fps`-spaced intervals — the explode shape a real frame
    * extractor produces; frame payload decode itself is the stub. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("modality") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_features", fakeDecodeFeatures())

  /** Batch feature extraction over any modality: repartitions by a hash of
    * the id so payload bytes spread evenly across executors (no skew from
    * ingestion order), then applies the (stub) kernel per row. */
  def extractFeatures(df: DataFrame, parallelism: Int): DataFrame =
    df.repartition(parallelism, col("media_id"))
      .withColumn("features", fakeDecodeFeatures())
}
