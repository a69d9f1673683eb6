package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-Scala semantics graft relies on (the UDF
  * body itself — no Spark session needed): the multiset-intersect
  * invariants from SURVEY.md §5.2. Driven manually with seeded ScalaCheck
  * Gens (the scalatest-scalacheck bridge isn't on the offline classpath).
  */
class TextOpsPropertySpec extends AnyFunSuite {

  private val toks = Gen.listOf(Gen.oneOf("a", "b", "c", "the", "x"))
  private def multiset(a: Seq[String], b: Seq[String]): Int =
    a.intersect(b).size   // the exact semantics of commonWordsMultiset

  private def cases(n: Int): Seq[(List[String], List[String], List[String])] =
    (0 until n).map { i =>
      val s = Seed(i.toLong)
      val p = Gen.Parameters.default
      (toks.pureApply(p, s), toks.pureApply(p, s.next),
        toks.pureApply(p, s.next.next))
    }

  test("multiset intersect: symmetric in size") {
    cases(200).foreach { case (a, b, _) =>
      assert(multiset(a, b) === multiset(b, a), s"a=$a b=$b")
    }
  }

  test("multiset intersect: bounded by min length") {
    cases(200).foreach { case (a, b, _) =>
      assert(multiset(a, b) <= math.min(a.length, b.length), s"a=$a b=$b")
    }
  }

  test("multiset intersect: concat-monotone") {
    cases(200).foreach { case (a, b, c) =>
      assert(multiset(a ++ c, b) >= multiset(a, b), s"a=$a b=$b c=$c")
    }
  }

  test("multiset ≥ set-semantics size") {
    cases(200).foreach { case (a, b, _) =>
      assert(multiset(a, b) >= a.toSet.intersect(b.toSet).size,
        s"a=$a b=$b")
    }
  }
}
