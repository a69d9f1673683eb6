package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextOps
import graft.sources.Tables

/** Cross-gates the approximate near-dup tiers against exact references on
  * the REAL driver corpus at sf0.01 (the operator-level AnnSpec/DedupSpec
  * gates run on synthetic data; a corpus whose similarity structure the
  * generators didn't design for is the honest recall test).
  *
  * Both approximate paths are fully seeded (xxhash64 banding, seeded
  * hyperplanes), so these assertions are deterministic — they either
  * always pass or always fail for a given operator version.
  */
class NearDupCrossGateSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("q_lsh_neardup covers >= 90% of the exact label-blocked pairs") {
    val spark2 = spark
    import spark2.implicits._
    val exact = Embeddings.cosineNearDup(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Embeddings.cosineNearDupLsh(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact reference found no pairs — corpus changed?")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"sign-LSH recall $recall over ${exact.size} exact pairs")
  }

  test("sampled lshRecall gate (production scale path) catches a lobotomized tier") {
    val spark2 = spark
    import spark2.implicits._
    // At 100 TB the gate runs on an f² sample of the exact pairs
    // (Embeddings.lshRecall's sampleFraction) — prove the valve works,
    // not just the documented binomial math: at f = 0.5 the seeded
    // id-hash keeps 10 of the 26 exact pairs, the HEALTHY 48-table tier
    // still covers every sampled pair, and a tier degraded to 8 tables
    // (an ~83 % table loss) is CAUGHT — 5 sampled pairs come back
    // found=0. All hashing is seeded, so these counts are exact, not
    // probabilistic expectations.
    val healthy = Embeddings.lshRecall(spark, dir, sampleFraction = 0.5)
      .select($"found").collect().map(_.getLong(0))
    assert(healthy.length === 10, s"sampled pair count ${healthy.length}")
    assert(healthy.forall(_ == 1L), "healthy tier failed the sampled gate")
    val lobotomized = Embeddings
      .lshRecall(spark, dir, sampleFraction = 0.5, nTables = 8)
      .select($"found").collect().map(_.getLong(0))
    assert(lobotomized.count(_ == 0L) === 5,
      s"degraded tier missed ${lobotomized.count(_ == 0L)} of " +
        s"${lobotomized.length} sampled pairs — expected the gate to " +
        "catch exactly 5")
  }

  test("q_lsh_neardup emits only true pairs (cosine >= threshold, exact)") {
    val spark2 = spark
    import spark2.implicits._
    // the operator's last stage is an exact cosine filter; gate that no
    // below-threshold pair leaks through the bucketing machinery
    val bad = Embeddings.cosineNearDupLsh(spark, dir)
      .filter($"cosine" < 0.35).count()
    assert(bad === 0L)
  }

  test("q_minhash_neardup pairs are exactly the Jaccard-verified candidates") {
    val spark2 = spark
    import spark2.implicits._
    val got = Extended.minhashNearDup(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.nonEmpty, "no near-dup pairs found at sf0.01 — corpus changed?")
    // independent recompute of each pair's exact Jaccard over the same
    // distinct bigram shingles (collected driver-side; 500 docs)
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", TextAnalysis.toks($"text").as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", array_distinct(TextOps.shingles($"t", 2)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    got.foreach { case ((a, b), j) =>
      val (sa, sb) = (sh(a), sh(b))
      val exact = (sa & sb).size.toDouble / (sa | sb).size
      assert(j === exact, s"pair ($a,$b): reported $j, exact $exact")
      assert(exact >= 0.5, s"pair ($a,$b) below the verify threshold")
    }
  }

  test("q_simhash_recall: guaranteed (Hamming<=3) strong pairs exist " +
      "and the tier finds every one") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Extended.simhashRecall(spark, dir).collect()
    assert(rows.nonEmpty, "no exact strong pairs at sf0.01 — corpus changed?")
    // the driver-pinned invariant: no guaranteed pair missed
    assert(rows.forall(_.getLong(4) === 1L),
      "covered=0: SimHash missed a pigeonhole-guaranteed pair")
    // non-vacuity: the covered pin would hold trivially if every strong
    // pair sat outside the Hamming-3 guarantee — recompute fingerprints
    // driver-side (500 docs) and require at least one guaranteed pair
    val fp = Tables.documents(spark, dir)
      .select($"doc_id",
        graft.operators.Dedup.simhash(TextAnalysis.toks($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val guaranteed = rows.map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => java.lang.Long.bitCount(fp(a) ^ fp(b)) <= 3 }
    assert(guaranteed.nonEmpty,
      "gate vacuous: no strong pair within the Hamming-3 guarantee")
    val found = Extended.simhashNearDup(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = guaranteed.filterNot(found)
    assert(missed.isEmpty,
      s"SimHash tier missed guaranteed pairs: ${missed.take(5).mkString(", ")}")
  }

  test("q_minhash_neardup finds every strongly-similar pair in the corpus") {
    val spark2 = spark
    import spark2.implicits._
    val found = Extended.minhashNearDup(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exhaustive exact-Jaccard sweep (125k pairs at sf0.01): every pair
    // with Jaccard >= 0.7 must be recalled — at b=8/r=4 banding the
    // S-curve gives each such pair >= 96% per-band-seed collision odds,
    // and the seeds are fixed, so this is a deterministic floor
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", TextAnalysis.toks($"text").as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", array_distinct(TextOps.shingles($"t", 2)).as("sh"))
    val a = sh.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = sh.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    val strong = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        (size(array_intersect($"a_sh", $"b_sh")).cast("double") /
          size(array_union($"a_sh", $"b_sh")).cast("double")).as("j"))
      .filter($"j" >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty, "no strong pairs at sf0.01 — corpus changed?")
    val missed = strong -- found
    assert(missed.isEmpty,
      s"banding missed ${missed.size} of ${strong.size} strong pairs: " +
        missed.take(5).mkString(", "))
  }
}
