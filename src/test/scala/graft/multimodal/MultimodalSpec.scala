package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3), "image/png", 1920, 1080, null),
      Row(2L, "image", Array[Byte](1, 2, 3), "image/png", 100, 50, null),
      Row(3L, "video", Array[Byte](9, 9), "video/mp4", 640, 480, 2500L),
      Row(4L, "audio", Array[Byte](7), "audio/wav", null, null, 9000L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.toSeq.map {
        case i: Int => Integer.valueOf(i)
        case x => x
      }: _*))),
      Multimodal.mediaSchema)
  }

  test("fakeDecodeFeatures: deterministic, payload-derived, right shape") {
    val a = media.select(col("media_id"), Multimodal.fakeDecodeFeatures(8).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a(1L).length === 8)
    assert(a(1L) === a(2L))            // same payload → same features
    assert(a(1L) !== a(3L))            // different payload → different
    assert(a(1L).forall(v => v >= 0f && v < 1f))
  }

  test("resizeStub: aspect-preserving downscale, no upscale") {
    val out = Multimodal.resizeStub(media.filter(col("modality") === "image"), 960)
      .select(col("media_id"), col("out_width"), col("out_height"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) === ((960, 540)))   // 1920×1080 halved
    assert(out(2L) === ((100, 50)))    // small image untouched
  }

  test("sampleFrames: one row per interval, only for video") {
    val out = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    assert(out.map(_.getAs[Long]("media_id")).toSet === Set(3L))
    assert(out.map(_.getAs[Long]("frame_ms")).sorted.toSeq === Seq(0L, 1000L, 2000L))
    assert(out.head.getAs[Seq[Float]]("frame_features").length === 8)
  }

  test("extractFeatures: partitioning spreads rows, features attached") {
    val out = Multimodal.extractFeatures(media, parallelism = 2)
    assert(out.rdd.getNumPartitions === 2)
    assert(out.select("features").collect().forall(!_.isNullAt(0)))
  }

  test("extractFeaturesBatched: batch-size invariant, null payload safe") {
    val withNull = media.unionByName(
      media.limit(1).select(lit(99L).as("media_id"), col("modality"),
        lit(null).cast("binary").as("payload"), col("mime"),
        col("width"), col("height"), col("duration_ms")))
    def run(bs: Int) = Multimodal.extractFeaturesBatched(withNull, bs)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val one = run(1)
    assert(run(3) === one && run(1000) === one)  // batching never changes results
    assert(one(99L).isEmpty)                     // null payload → empty features
    assert(one(1L).length === 8 && one(1L) === one(2L))  // same payload, same features
    assert(one(1L) !== one(3L))
  }
}
