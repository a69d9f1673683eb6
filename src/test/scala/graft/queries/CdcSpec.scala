package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking: boundary/assembly correctness against a
  * driver-side reference, and the property fixed windows cannot give —
  * a single-token edit changes only O(1) chunk fingerprints. */
class CdcSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def isBoundary(tok: String): Boolean =
    md5hex("cdc:" + tok).substring(0, 2) < "10"

  /** Reference chunker: boundary token ends its chunk. */
  private def refChunks(tokens: Seq[String]): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ListBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ListBuffer[String]()
    tokens.foreach { t =>
      cur += t
      if (isBoundary(t)) { out += cur.toSeq; cur = scala.collection.mutable.ListBuffer() }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  test("cdcChunks matches the reference chunker on the real corpus") {
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.cdcChunks(spark, sf("sf0.001"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(r =>
          (r.getLong(2), r.getInt(3), r.getString(4))).toSeq
      }
    docs.foreach { case (id, text) =>
      val ref = refChunks(text.split(" ").toSeq)
      val starts = ref.scanLeft(0)(_ + _.size).init
      val expect = ref.zip(starts).map { case (c, s) =>
        (c.size.toLong, s, md5hex(c.mkString(" ")))
      }
      assert(got(id) === expect, s"doc $id")
    }
    assert(got.values.map(_.size).sum > docs.size, "chunking is non-trivial")
  }

  test("a one-token insertion changes only the edited chunk's fingerprint") {
    val spark2 = spark
    import spark2.implicits._
    val text = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .orderBy($"doc_id".desc_nulls_last).select($"text")
      .head().getString(0)
    val toks = text.split(" ").toSeq
    assert(refChunks(toks).size >= 3, "need a multi-chunk doc for the property")
    // insert a non-boundary token mid-document
    val filler = Seq("query", "data", "join", "merge").find(!isBoundary(_)).get
    val mid = toks.size / 2
    val edited = toks.take(mid) ++ Seq(filler) ++ toks.drop(mid)
    val before = refChunks(toks).map(c => md5hex(c.mkString(" ")))
    val after = refChunks(edited).map(c => md5hex(c.mkString(" ")))
    // CDC guarantee: every chunk except the edited one survives by value
    assert((before.toSet -- after.toSet).size <= 1,
      "at most the edited chunk lost its fingerprint")
    assert(after.size >= before.size)
    // fixed windows shift everything: same edit under docChunks semantics
    val winBefore = toks.grouped(16).map(c => md5hex(c.mkString(" "))).toSeq
    val winAfter = edited.grouped(16).map(c => md5hex(c.mkString(" "))).toSeq
    val survivingWin = winBefore.toSet.intersect(winAfter.toSet).size
    assert(survivingWin < winBefore.size - 1,
      "fixed windows should lose multiple chunks on the same edit")
  }
}
