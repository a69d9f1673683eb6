package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Perceptual image near-dup (r17, VERDICT r16 #5): the dHash
  * fingerprint, the seeded perturbed-twin corpus, and the generalized
  * Hamming-banded pair machinery it feeds.
  *
  * The dHash pin re-derives the expected fingerprint from
  * `neardupCellLuma` INDEPENDENTLY of the codec path (the same
  * double-entry discipline as PngSpec's pixel-sum pin): if the PNG
  * round trip, the luma math, or the 9×8 box average drifts, the pinned
  * bits move. */
class ImageNearDupSpec extends SparkSpec {

  /** Expected dHash straight from the cell-luma formula — the test's own
    * reimplementation (no Ppm/Png/box-average involved). */
  private def expectedFp(id: Long): Long = {
    var fp = 0L
    for (cy <- 0 until 8; cx <- 0 until 8)
      if (Multimodal.neardupCellLuma(id, cy, cx) <
          Multimodal.neardupCellLuma(id, cy, cx + 1))
        fp |= 1L << (cy * 8 + cx)
    fp
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("dHash through the real PNG round trip equals the cell-formula " +
      "fingerprint for every corpus image (lossless + exact box average)") {
    (0L until 96L).foreach { id =>
      val img = Ppm.Image(36, 32, Multimodal.neardupPixels(id))
      val decoded = Multimodal.decodeImage(Png.encode(img))
      assert(decoded.exists(_._2 == "png"), s"id=$id failed PNG round trip")
      assert(Multimodal.dHash64(decoded.get._1) === expectedFp(id),
        s"id=$id dHash != cell-formula expectation")
    }
  }

  test("perturbed-twin geometry: a pure brightness shift (no wrap) is " +
      "Hamming 0, a localized cell edit moves few bits, unrelated " +
      "content is far") {
    // hand fixture: base grid vs +6 with NO mod-256 wrap anywhere
    val base = Ppm.Image(36, 32, Array.tabulate[Byte](36 * 32 * 3) { i =>
      val p = i / 3; val x = p % 36; val y = p / 36
      (((x / 4) * 11 + (y / 4) * 23) % 200).toByte // ≤ 199: +6 can't wrap
    })
    val brighter = Ppm.Image(36, 32, base.pixels.map(b => (b + 6).toByte))
    assert(Multimodal.dHash64(base) === Multimodal.dHash64(brighter),
      "gradient signs are brightness-invariant without wrap")
    // the seeded corpus: v1 twins sit close, v3 (unrelated) sits far
    val groups = (0L until 96L by 4L).map { b =>
      val f0 = expectedFp(b); val f1 = expectedFp(b + 1)
      val f3 = expectedFp(b + 3)
      (hamming(f0, f1), hamming(f0, f3))
    }
    assert(groups.map(_._1).max <= 7,
      s"v0-v1 twins should sit within radius 7: ${groups.map(_._1)}")
    assert(groups.count(_._2 > 7) >= 20,
      s"v0-v3 should usually be far: ${groups.map(_._2)}")
  }

  test("hammingNearDupPairs == brute-force all-pairs at Hamming <= " +
      "nBands-1 (pigeonhole recall holds on the corpus fingerprints)") {
    val s = spark
    import s.implicits._
    val fps = (0L until 96L).map(id => (id, expectedFp(id)))
    val df = fps.toDF("media_id", "fp")
    val got = Dedup
      .hammingNearDupPairs(df, "media_id", col("fp"), maxHamming = 7,
        nBands = 8)
      .select($"a_id", $"b_id", $"hamming".cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if b > a
      h = hamming(fa, fb) if h <= 7
    } yield (a, b, h)).toSet
    assert(want.nonEmpty, "fixture must produce pairs")
    assert(got === want)
  }

  test("q_image_neardup end-to-end (PNG) emits the exact pair set; the " +
      "JPEG twin finds the same v0-v1 twins despite the lossy transform") {
    val s = spark
    import s.implicits._
    val png = Multimodal.imageNearDup(s)
      .as[(Long, Long, Int)].collect().toSet
    assert(png.nonEmpty)
    // exact equality with the formula-side brute force
    val fps = (0L until 96L).map(id => (id, expectedFp(id)))
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if b > a
      h = hamming(fa, fb) if h <= 7
    } yield (a, b, h)).toSet
    assert(png === want)
    // lossy path: rows-only in the harness, but the STRUCTURE must hold —
    // most v0-v1 twin pairs survive JPEG's small luma error
    val jpg = Multimodal.imageNearDup(s, codec = "jpg")
      .as[(Long, Long, Int)].collect().toSet
    val twinPairs = jpg.count(p => p._1 / 4 == p._2 / 4 &&
      p._1 % 4 == 0 && p._2 % 4 == 1)
    assert(twinPairs >= 12, s"JPEG path found only $twinPairs v0-v1 twins")
  }

  test("hammingNearDupPairs refuses a radius past the pigeonhole bound " +
      "unless banded best-effort is acknowledged, and refuses band " +
      "widths that don't divide 64") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L), (2L, 7L)).toDF("media_id", "fp")
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(df, "media_id", col("fp"),
        maxHamming = 8, nBands = 8)
    }
    // the simhash posture: past-bound radius is legal once acknowledged
    Dedup.hammingNearDupPairs(df, "media_id", col("fp"),
      maxHamming = 8, nBands = 8, exactRecall = false)
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(df, "media_id", col("fp"),
        maxHamming = 3, nBands = 5)
    }
  }

  test("simhashNearDup delegates bit-identically through the " +
      "generalized machinery (past-bound maxHamming=6 at 4 bands stays " +
      "legal — the shipped q_simhash_neardup contract)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("a", "b", "c", "d", "e", "g")),
      (3L, Seq("x", "y", "z", "w", "v", "u"))).toDF("doc_id", "tokens")
    val out = Dedup.simhashNearDup(docs, "doc_id", "tokens",
      maxHamming = 6).collect()
    // near-identical docs 1,2 pair up; unrelated 3 does not
    assert(out.forall(r => Set(1L, 2L)(r.getLong(0)) &&
      Set(1L, 2L)(r.getLong(1))))
  }
}
