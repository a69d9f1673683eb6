package graft

import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.{Vector, Vectors}

/** The p2-replay oracle device: pin the two Scala-side mirrors against
  * MLlib itself so a typo can never ship a structurally plausible but
  * wrong oracle — (1) the Murmur3 formulation the SQL renders, checked
  * against ml.HashingTF.indexOf over a fuzz set including multi-byte
  * UTF-8 and every word/tail length residue; (2) the reflected MinHash
  * coefficients + the `min(((1+idx)·a+b) mod P)` formula, checked
  * against the fitted model's own transform output. */
class Murmur3ReplaySqlSpec extends SparkSpec {

  test("murmur3String matches ml.HashingTF.indexOf (SPARK_3 hash) " +
      "across lengths, residues and multi-byte UTF-8") {
    val tf = new HashingTF().setNumFeatures(4096)
    def idx(s: String): Int = {
      val h = Murmur3ReplaySql.murmur3String(s)
      ((h % 4096) + 4096) % 4096
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "abc XYZ09_é漢🙂ÿ"
    val fuzz = (0 until 200).map(_ =>
      (0 to rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val cases = Seq("", "a", "ab", "abc", "abcd", "abcde", "hello world",
      "é", "漢字漢字", "🙂🙂🙂", "tok1 tok2") ++ fuzz
    cases.foreach { s =>
      assert(tf.indexOf(s) === idx(s), s"term=[$s]")
    }
  }

  test("reflected coefficients + the (1+idx)*a+b mod P formula " +
      "reproduce the fitted model's transform output") {
    import spark.implicits._
    val vecs = Seq(
      Vectors.sparse(4096, Array(0, 5, 17), Array(1.0, 2.0, 1.0)),
      Vectors.sparse(4096, Array(4095), Array(3.0)),
      Vectors.sparse(4096, Array(7, 8, 9, 4000), Array(1.0, 1.0, 1.0, 1.0)))
    val df = vecs.map(Tuple1(_)).toDF("tf")
    val model = graft.operators.SimilarityJoin.fitMinHash(df, "tf",
      numHashTables = 3, seed = 42L)
    val coefs = graft.operators.SimilarityJoin.randCoefficientsOf(model)
    assert(coefs.length === 3)
    // the replicated RNG draw order, for the record: scala.util.Random(42)
    val r = new scala.util.Random(42L)
    val replicated = Array.fill(3)(
      (1 + r.nextInt(2038074743 - 1), r.nextInt(2038074743 - 1)))
    assert(coefs.toSeq === replicated.toSeq)
    val out = model.transform(df).select("minhash_lsh").collect()
    vecs.zip(out).foreach { case (v, row) =>
      val idxs = v.toSparse.indices
      val hashes = row.getSeq[Vector](0).map(_(0))
      coefs.zip(hashes).foreach { case ((a, b), h) =>
        val expect = idxs.map(i => ((1L + i) * a + b) % 2038074743L).min
        assert(h === expect.toDouble, s"a=$a b=$b")
      }
    }
  }

  test("p2 replay SQL embeds the pinned pipeline parameters") {
    val sql = Murmur3ReplaySql.similarityJoinP2Sql(
      Seq(3L, 1L, 2L), Seq((11, 22), (33, 44), (55, 66)))
    assert(sql.contains("doc_id IN (1, 2, 3)")) // sorted embed
    assert(sql.contains("((1 + v.idx) * 11 + 22) % 2038074743"))
    assert(sql.contains("AS m2") && !sql.contains("AS m3"))
    assert(sql.contains("% 4096") && sql.contains(">= 0.5"))
    assert(sql.contains("a.m0 = b.m0 OR a.m1 = b.m1 OR a.m2 = b.m2"))
  }
}
