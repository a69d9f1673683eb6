package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views of the engine's data model (SURVEY.md §1.3): case classes
  * with product Encoders at module boundaries for compile-time field
  * safety; operators convert to untyped DataFrames internally (Catalyst
  * optimizes both identically).
  *
  * The reference models everything as untyped rows (SURVEY.md §1.1);
  * these are the shapes its tables actually carry.
  */
object schema {

  /** Node table row (reference node_information.csv, Predictor.scala:83-97).
    * All-string as read; year stays a string by reference fidelity. */
  final case class PaperInfo(srcId: String, year: String, title: String,
      authors: String, journal: String, `abstract`: String)

  /** Unlabeled directed edge (testing_set.txt, Predictor.scala:176-185). */
  final case class Edge(srcId: String, dstId: String)

  /** Supervised edge (training_set.txt, Predictor.scala:158-167). */
  final case class LabeledEdge(srcId: String, dstId: String, label: Option[Int])

  /** Driver-corpus documents row (TESTDATA.md). */
  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  /** Driver-corpus events row (ts normalized to µs by Tables.events). */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)

  /** Driver-corpus embeddings row. */
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    graft.sources.Tables.documents(s, dir).as[Document]
  }

  def events(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    graft.sources.Tables.events(s, dir).as[Event]
  }

  def embeddings(s: SparkSession, dir: String): Dataset[Embedding] = {
    import s.implicits._
    graft.sources.Tables.embeddings(s, dir).as[Embedding]
  }

  def edges(s: SparkSession, path: String): Dataset[Edge] = {
    import s.implicits._
    graft.sources.Tables.edges(s, path).as[Edge]
  }

  def labeledEdges(s: SparkSession, path: String): Dataset[LabeledEdge] = {
    import s.implicits._
    graft.sources.Tables.labeledEdges(s, path).as[LabeledEdge]
  }

  def nodeInfo(s: SparkSession, path: String): Dataset[PaperInfo] = {
    import s.implicits._
    graft.sources.Tables.nodeInfoCsv(s, path).as[PaperInfo]
  }
}
