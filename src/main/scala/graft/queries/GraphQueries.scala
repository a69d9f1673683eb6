package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over the near-duplicate pair graph (the n-gram Jaccard
  * pairs at threshold 0.08 — dense enough at sf0.01 for non-vacuous
  * oracles: 298 edges, 16 triangles, 44 components incl. a 139-node one).
  *
  * q_dedup_clusters is the pipeline payoff: near-dup PAIRS collapsed into
  * duplicate CLUSTERS via connected components — the step that turns a
  * similarity join into an actual deduplication decision ("keep min doc_id
  * per cluster").
  */
object GraphQueries {

  /** Shared pair graph: n-gram Jaccard near-dup pairs at a denser
    * threshold than q_ngram_jaccard's 0.12. */
  private def pairGraph(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramJaccardPairs(s, dir, threshold = 0.08)
      .select(col("a_id"), col("b_id"))

  /** Degree of each document in the near-dup pair graph. */
  def pairDegrees(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Graph.degrees(pairGraph(s, dir))
      .select($"id".as("doc_id"), $"degree")
      .orderBy($"doc_id")
  }

  /** Global triangle count of the pair graph (1 row). */
  def pairTriangles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.triangleCount(pairGraph(s, dir))

  /** Near-dup clusters: (doc_id, component) with component = min doc_id
    * reachable through near-dup pairs. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Graph.connectedComponents(pairGraph(s, dir))
      .select($"id".as("doc_id"), $"component")
      .orderBy($"doc_id")
  }

  /** The deduplicated corpus: documents minus every non-representative
    * cluster member (Dedup.keepRepresentatives over the pair graph). */
  def dedupCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup.keepRepresentatives(
        Tables.documents(s, dir).select($"doc_id", $"lang", $"source"),
        pairGraph(s, dir), "doc_id")
      .orderBy($"doc_id")
  }
}
