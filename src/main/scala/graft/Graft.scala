package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade mirroring the reference's top-level API
  * (reference: cognee/__init__.py — add / cognify / search(SearchType))
  * so a reference user can switch with the same three calls.
  *
  * `search` dispatches to the retriever plans; overloads with explicit
  * parameters cover the query-bearing types (lexical tokens, cypher
  * pattern, temporal interval). The no-arg forms run the same
  * deterministic defaults the verification suite pins.
  */
object Graft {

  /** The reference's full SearchType enum (modules/search/types/
    * SearchType.py — all 16 members). */
  sealed abstract class SearchType(val name: String)
  case object Chunks extends SearchType("CHUNKS")
  case object ChunksLexical extends SearchType("CHUNKS_LEXICAL")
  case object Summaries extends SearchType("SUMMARIES")
  case object Insights extends SearchType("INSIGHTS")
  case object RagCompletion extends SearchType("RAG_COMPLETION")
  case object GraphCompletion extends SearchType("GRAPH_COMPLETION")
  case object GraphCompletionCot extends SearchType("GRAPH_COMPLETION_COT")
  case object GraphCompletionContextExtension extends SearchType("GRAPH_COMPLETION_CONTEXT_EXTENSION")
  case object GraphSummaryCompletion extends SearchType("GRAPH_SUMMARY_COMPLETION")
  case object Code extends SearchType("CODE")
  case object CodingRules extends SearchType("CODING_RULES")
  case object Feedback extends SearchType("FEEDBACK")
  case object Temporal extends SearchType("TEMPORAL")
  case object Cypher extends SearchType("CYPHER")
  case object NaturalLanguage extends SearchType("NATURAL_LANGUAGE")
  case object FeelingLucky extends SearchType("FEELING_LUCKY")

  /** Incremental ingest with dedup-on-add (cognee.add). */
  def add(existing: DataFrame, incoming: DataFrame): DataFrame =
    Pipeline.addIncrement(existing, incoming)

  /** Open a parquet-backed vector-collection store (the
    * vector_db_interface surface: collections, point CRUD, search). */
  def vectorStore(spark: SparkSession, root: String): sources.VectorStore =
    sources.VectorStore(spark, root)

  /** Build the knowledge artifacts (cognee.cognify). */
  def cognify(spark: SparkSession, dir: String): Pipeline.CognifyResult =
    Pipeline.cognify(spark, dir)

  /** Enrich the existing graph (cognee.memify): nodeset extraction +
    * rule-association enrichment merged back, per-stage ledger. */
  def memify(spark: SparkSession, dir: String): DataFrame =
    Pipeline.memify(spark, dir)

  /** Delete a document slice with hard-mode cascade (cognee.delete). */
  def delete(spark: SparkSession, dir: String, source: String = "src5"): DataFrame =
    Pipeline.deleteDocs(spark, dir, source)

  /** Re-ingest changed revisions (cognee api/v1/update). */
  def update(spark: SparkSession, dir: String, source: String = "src7"): DataFrame =
    Pipeline.updateDocs(spark, dir, source)

  /** Drop the whole graph (cognee.prune) — empty graph, same schema. */
  def prune(g: graph.PropertyGraph): graph.PropertyGraph = g.deleteGraph

  /** Prune obsolete + disconnected chunk nodes
    * (tasks/chunks/remove_disconnected_chunks.py); per-stage ledger. */
  def pruneChunks(spark: SparkSession, dir: String): DataFrame =
    Pipeline.pruneChunks(spark, dir)

  /** Offline HTML view of the graph (cognee.visualize_graph). */
  def visualize(spark: SparkSession, dir: String, maxNodes: Int = 500): String =
    graph.GraphExport.toHtml(graph.TpchGraph(spark, dir), maxNodes)

  /** Score every graph triplet against the query
    * (retrieval/utils/brute_force_triplet_search.py get_memory_fragment). */
  def getMemoryFragment(spark: SparkSession, dir: String): DataFrame =
    operators.Retrievers.triplets(spark, dir)

  /** Per-entity triplet-search context, direct + summarized provider
    * rows (modules/retrieval/context_providers/). */
  def getContext(spark: SparkSession, dir: String): DataFrame =
    operators.Retrievers.contextTriplets(spark, dir)

  /** Time-anchored event rows extracted from document text
    * (tasks/temporal_graph extraction skeleton). */
  def extractTemporal(spark: SparkSession, dir: String): DataFrame =
    operators.TextOps.temporalExtract(spark, dir)

  /** Dispatch a search type to its retrieval plan (cognee.search). */
  def search(spark: SparkSession, dir: String, tpe: SearchType): DataFrame = tpe match {
    case Chunks => operators.Retrievers.chunks(spark, dir)
    case ChunksLexical => operators.Retrievers.lexical(spark, dir)
    case Summaries => operators.Retrievers.summaries(spark, dir)
    case Insights => operators.Retrievers.insights(spark, dir)
    case RagCompletion | GraphCompletion => operators.Retrievers.completionContext(spark, dir)
    case GraphCompletionCot => operators.Retrievers.completionCot(spark, dir)
    case GraphCompletionContextExtension =>
      operators.Retrievers.completionContextExtension(spark, dir)
    case GraphSummaryCompletion => operators.Retrievers.summaryCompletion(spark, dir)
    case Code => operators.Retrievers.code(spark, dir)
    case CodingRules => operators.Retrievers.codingRules(spark, dir)
    case Feedback => operators.Retrievers.feedback(spark, dir)
    case Temporal => operators.EventOps.temporalSearch(spark, dir)
    case Cypher => operators.Retrievers.cypher(spark, dir)
    case NaturalLanguage => operators.Retrievers.naturalLanguage(spark, dir)
    case FeelingLucky => operators.Retrievers.feelingLucky(spark, dir)
  }

  /** CYPHER with a caller-supplied pattern. */
  def searchCypher(spark: SparkSession, dir: String, cypher: String): DataFrame =
    graph.CypherLite.run(graph.TpchGraph(spark, dir), cypher)
}
