package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deletion-neighborhood join's one risk is a completeness bug in
  * the blocking (a missed variant ⇒ a silently dropped true pair), so
  * the spec's core is brute-force parity on fuzzed corpora engineered
  * to sit AT the distance boundary: random strings plus mutation chains
  * (substitute / insert / delete) of length exactly d and d+1. */
class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    EditDistanceJoin.selfJoin(rows.toDF("id", "s"), "id", "s", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("matches brute force on a mutation-chain fuzz corpus at d=1 and d=2") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcde"
    def randStr(l: Int) = (0 until l).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length)
        s.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
      case _ if s.nonEmpty => // delete
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
      case _ => s + alpha(rnd.nextInt(alpha.length))
    }
    val seeds = (0 until 30).map(_ => randStr(3 + rnd.nextInt(8)))
    // chains of 1..3 mutations off each seed: pairs at, below and past
    // the boundary, plus the short-string edge (lengths down to ~1)
    val corpus = (seeds ++ seeds.flatMap { s =>
      Iterator.iterate(s)(mutate).slice(1, 4).toSeq
    }).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (d <- Seq(1, 2)) {
      val expect = brute(corpus, d)
      val got = run(corpus, d)
      assert(got === expect, s"d=$d: missing=${(expect -- got).take(5)} " +
        s"extra=${(got -- expect).take(5)}")
      assert(expect.nonEmpty, "fuzz corpus produced no boundary pairs")
    }
  }

  test("empty strings, exact duplicates and unicode round the boundary") {
    val rows = Seq[(Long, String)](
      (1L, ""), (2L, "a"), (3L, "a"), (4L, "ab"), (5L, "ba"),
      (6L, "héllo"), (7L, "hello"), (8L, "héllò"), (9L, "xyz"))
    for (d <- Seq(1, 2))
      assert(run(rows, d) === brute(rows, d), s"d=$d")
  }

  test("twin-collapse valve engages on a duplicated corpus and is " +
      "bit-identical to brute force (cross, intra and boundary pairs)") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcd"
    val seeds = (0 until 12).map(_ =>
      (0 until 4 + rnd.nextInt(5)).map(_ => alpha(rnd.nextInt(4))).mkString)
    // every string 4x: dup factor 4 >= the 1.4 crossover, valve forced
    val corpus = (0 until 4).flatMap(k => seeds).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    assert(graft.operators.DupProbe
      .dupFactor(corpus.toDF("id", "s"), col("s")) >=
      graft.operators.DupProbe.CollapseDupFactor)
    for (d <- Seq(1, 2)) {
      val expect = brute(corpus, d)
      assert(run(corpus, d) === expect, s"d=$d")
      assert(expect.exists(_._3 == 0), "fixture has no intra-twin pairs")
    }
  }

  test("deletionVariants counts: 1 + l singles at d=1, distinct-deduped") {
    val df = Seq("abcd", "aaaa").toDF("s")
      .select(size(EditDistanceJoin.deletionVariants(col("s"), 1)).as("n"))
    // "abcd": itself + 4 distinct deletions; "aaaa": itself + 1 ("aaa")
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(5, 2))
  }

  test("length gate (r17 heavy-tail arm): one over-long string fails " +
      "LOUDLY naming the shingle tier — deletion-variant mass is " +
      "quadratic in length, an OOM no partitioning fixes") {
    val giant = (1L, "x" * (EditDistanceJoin.MaxStringLen + 1))
    val rows = Seq(giant, (2L, "alpha"), (3L, "alphb"))
    val ex = intercept[Exception] {
      run(rows, 1)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    val all = msgs(ex).mkString(" ")
    assert(all.contains("MaxStringLen") && all.contains("minhashNearDup"),
      s"gate message must name the bound and the shingle remedy: $all")
    // at the bound exactly: no gate, normal pairs
    val atBound = Seq((1L, "y" * EditDistanceJoin.MaxStringLen),
      (2L, "alpha"), (3L, "alphb"))
    assert(run(atBound, 1) === Set((2L, 3L, 1)))
  }
}
