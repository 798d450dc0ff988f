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

  /** Delete a document slice (cognee.delete — api/v1/delete/delete.py:31).
    * `mode = "soft"` (the reference's default) cascades the document,
    * its mention edges, and the entities the deletion orphans;
    * `mode = "hard"` additionally deletes the post-cascade degree-one
    * entities (delete.py:249). */
  def delete(spark: SparkSession, dir: String, source: String = "src5",
      mode: String = "soft"): DataFrame =
    Pipeline.deleteDocs(spark, dir, source, mode)

  /** Row-level relational→graph migration (cognee
    * tasks/ingestion/migrate_relational_database.py:18 with its default
    * `migrate_column_data=True`): TableType/TableRow/ColumnValue nodes +
    * is_part_of/column/FK edges over the TPC-H-ish tables, bulk-merged;
    * the result is CypherLite-queryable. The `schema_only=True` half is
    * the `graph_schema` query. */
  def migrateRelational(spark: SparkSession, dir: String): graph.PropertyGraph =
    graph.RelationalMigration.migratedGraph(spark, dir)

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

  /** Dispatch a search type to its retrieval plan with the
    * deterministic default seeds (cognee.search with no params). */
  def search(spark: SparkSession, dir: String, tpe: SearchType): DataFrame =
    search(spark, dir, tpe, SearchParams())

  /** The parameterized search surface (api/v1/search/search.py:17 —
    * `search(query_type, query_text, datasets, top_k)`): the caller's
    * query text / tokens / vector, top-k, dataset scope, temporal
    * interval, or cypher pattern thread into the retriever plans.
    * Every [[SearchParams]] field defaults to the pinned verification
    * seed, so `search(spark, dir, tpe)` ≡ the registered operators. */
  def search(spark: SparkSession, dir: String, tpe: SearchType, p: SearchParams): DataFrame = {
    import operators.{EventOps, Retrievers => R}
    // Free text tokenizes to the lexical token set when no explicit
    // token list rides along (base_retriever.py tokenizes query_text).
    def toks(default: Seq[String]): Seq[String] =
      p.queryTokens.orElse(p.queryText.map(_.toLowerCase.split("\\s+").toSeq)).getOrElse(default)
    def vec(defaultId: Long): QueryVec = p.queryVec.getOrElse(QueryVec.Id(defaultId))
    // The searching user's ACL narrows the dataset scope for EVERY
    // scoped type (get_document_ids_for_user.py resolves the permitted
    // datasets before any retriever runs): permitted ∩ explicit
    // datasets. Deny by default — a grantless/unknown user resolves to
    // an empty scope, and `denied` turns the dispatched plan into a
    // STRUCTURALLY empty relation (limit 0 — Catalyst's OptimizeLimitZero
    // collapses it to an empty LocalRelation, no scan, no sentinel value
    // a dataset name could collide with). The CHUNKS type instead routes
    // to the semi-join plan, the multi-tenant scale shape — same rule,
    // same in-code dim.
    val (scope: Seq[String], denied: Boolean) = p.user match {
      case None => (p.datasets, false)
      case Some(u) =>
        // grants resolve through the durable principal store when the
        // caller names one (direct ∪ role ∪ tenant — AclStore.sourcesOf;
        // the dim is bounded principals×datasets, so the driver-side
        // read matches the in-code path's shape), else the in-code
        // verification dim
        val granted = p.aclRoot match {
          case Some(root) => sources.AclStore(spark, root)
            .sourcesOf(u).collect().map(_.getString(0)).toSeq
          case None => Acl.readableSourcesOf(u)
        }
        val eff = if (p.datasets.isEmpty) granted else p.datasets.intersect(granted)
        (eff, eff.isEmpty)
    }
    // A denied principal sees an empty relation — an authorization
    // outcome, applied before any per-type empty-corpus contract.
    def scoped(df: => DataFrame): DataFrame = if (denied) df.limit(0) else df
    // Types whose retrieval reads no dataset-partitioned data (the
    // TPC-H entity graph, the event ledger): a user scope CANNOT be
    // honored — fail fast instead of silently returning unscoped
    // corpus data to a caller who asked for tenant isolation.
    def unscopable(df: => DataFrame): DataFrame = {
      require(p.user.isEmpty,
        s"search type ${tpe.name} reads no dataset-scoped data and cannot honor user=${p.user.get}")
      df
    }
    tpe match {
      case Chunks => p.user match {
        // in-code verification dim: the registered semi-join plan
        case Some(u) if p.aclRoot.isEmpty =>
          R.chunksAcl(spark, dir, u, vec(0), p.topK.getOrElse(5), p.datasets)
        // durable principal store: the scope already resolved above
        // (direct ∪ role ∪ tenant, ∩ explicit datasets) — previously
        // this case fell through to the in-code dim and silently
        // IGNORED the caller's aclRoot, so a store-granted user
        // searched an empty (or wrong) scope
        case Some(_) =>
          scoped(R.chunks(spark, dir, vec(0), p.topK.getOrElse(5), scope))
        case None => R.chunks(spark, dir, vec(0), p.topK.getOrElse(5), p.datasets)
      }
      case ChunksLexical =>
        scoped(R.lexical(spark, dir, toks(R.queryTokens), p.topK.getOrElse(20), scope))
      case Summaries => scoped(R.summaries(spark, dir, vec(1), p.topK.getOrElse(5), scope))
      case Insights => scoped(R.insights(spark, dir, vec(0), p.topK.getOrElse(3), scope))
      case RagCompletion => // chunks-only context (completion_retriever.py
        // defaults top_k=1 — the facade default matches; the registered
        // search_rag_completion operator pins k=2 explicitly)
        scoped(R.ragCompletion(spark, dir, vec(0), p.topK.getOrElse(1), scope))
      case GraphCompletion =>
        scoped(R.completionContext(spark, dir, vec(0), p.topK.getOrElse(3), scope,
          nodeType = p.nodeType, nodeNames = p.nodeNames))
      case GraphCompletionCot => // eager retriever: denied short-circuits inside
        // The reference's COT retriever inherits node_type/node_name
        // (graph_completion_cot_retriever.py extends
        // GraphCompletionRetriever) and narrows its get_triplets leg;
        // graft's COT stand-in retrieves DOCUMENTS (the two-hop
        // re-query loop), so there is no triplet candidate set the
        // narrowing could apply to — fail fast rather than silently
        // return un-narrowed rows to a caller who asked for a nodeset.
        require(p.nodeType.isEmpty && p.nodeNames.isEmpty,
          "GRAPH_COMPLETION_COT's document-loop stand-in has no triplet candidate " +
            "set; node_type/node_name narrowing applies to GRAPH_COMPLETION and " +
            "GRAPH_COMPLETION_CONTEXT_EXTENSION")
        R.completionCot(spark, dir, vec(0), p.topK.getOrElse(3), scope, denied)
      case GraphCompletionContextExtension =>
        unscopable(R.completionContextExtension(spark, dir,
          seedTokens = toks(Seq("nation", "3", "located", "in")),
          nodeType = p.nodeType, nodeNames = p.nodeNames))
      case GraphSummaryCompletion => // inherits narrowing like the reference
        // (graph_summary_completion_retriever.py extends GraphCompletionRetriever)
        scoped(R.summaryCompletion(spark, dir, vec(2), scope,
          nodeType = p.nodeType, nodeNames = p.nodeNames))
      case Code => scoped(R.code(spark, dir, toks(R.queryTokens), scope))
      case CodingRules => scoped(R.codingRules(spark, dir, scope))
      case Feedback => scoped(R.feedback(spark, dir, vec(0), p.topK.getOrElse(5), scope))
      case Temporal => unscopable(p.interval match {
        case Some((from, until)) => EventOps.temporalInterval(spark, dir, from, until)
        case None => EventOps.temporalSearch(spark, dir)
      })
      case Cypher => unscopable(p.cypher match {
        case Some(q) => searchCypher(spark, dir, q)
        case None => R.cypher(spark, dir)
      })
      case NaturalLanguage =>
        unscopable(R.naturalLanguage(spark, dir,
          p.queryText.getOrElse("how many suppliers are located in each region")))
      case FeelingLucky => scoped(R.feelingLucky(spark, dir, scope))
    }
  }

  /** CYPHER with a caller-supplied pattern. */
  def searchCypher(spark: SparkSession, dir: String, cypher: String): DataFrame =
    graph.CypherLite.run(graph.TpchGraph(spark, dir), cypher)

  /** One user's query ledger, most recent first (modules/search/
    * operations/get_queries.py:8). */
  def getQueries(spark: SparkSession, dir: String, userId: Long,
      limit: Int = 10): DataFrame =
    operators.EventOps.userLedger(spark, dir, userId, "view", limit)

  /** One user's result ledger, most recent first (modules/search/
    * operations/get_results.py:7). */
  def getResults(spark: SparkSession, dir: String, userId: Long,
      limit: Int = 10): DataFrame =
    operators.EventOps.userLedger(spark, dir, userId, "purchase", limit)

  /** TEMPORAL resolved through the entity graph (temporal_retriever.py's
    * graph leg: interval → events → entity resolution → aggregate). The
    * caller's [[SearchParams.interval]] threads into the scan filter
    * exactly like the event-table leg; no params runs the pinned
    * verification window. */
  def searchTemporalGraph(spark: SparkSession, dir: String,
      p: SearchParams = SearchParams()): DataFrame = {
    // temporal_retriever.py inherits node_type/node_name — the entity
    // fragment the interval resolves through narrows like completion
    val (from, until) = p.interval
      .getOrElse(operators.Retrievers.DefaultTemporalWindow)
    operators.Retrievers.temporalGraph(spark, dir, from, until,
      nodeType = p.nodeType, nodeNames = p.nodeNames)
  }
}
