package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class CorpusStreamsSpec extends SparkSpec {

  test("streaming ingest dedup flags batch near-dups vs corpus and in-batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "a b c d e f g h", "en"),
      (2L, "z y x w v u t s", "en")).toDF("doc_id", "text", "lang")
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "lang")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = CorpusStreams.ingestDedup(corpus, docs, threshold = 0.3) {
      (pairs, _) =>
        got.synchronized {
          got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
    }
    try {
      // 10 near-dups corpus doc 1 (6/8 shared bigrams = 0.75);
      // 11 shares nothing; 13 is an in-batch near-dup of 10
      mem.addData((10L, "a b c d e f g x", "en"),
        (11L, "p q r m n o k j", "en"),
        (13L, "a b c d e f g x", "en"))
      q.processAllAvailable()
      assert(got.toSet === Set((1L, 10L), (1L, 13L), (10L, 13L)))
      // a later batch still probes the standing corpus
      mem.addData((12L, "z y x w v u t q", "en"))
      q.processAllAvailable()
      assert(got.toSet === Set((1L, 10L), (1L, 13L), (10L, 13L), (2L, 12L)))
    } finally q.stop()
  }

  test("ingestBatchPairs equals the batch incremental operator") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq((1L, "a b c d e f g h", "en")).toDF("doc_id", "text", "lang")
    val batch = Seq((10L, "a b c d e f g x", "en")).toDF("doc_id", "text", "lang")
    val got = CorpusStreams.ingestBatchPairs(corpus, batch, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 10L, 0.75)))
  }
}
