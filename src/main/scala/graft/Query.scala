package graft

/** A caller-supplied query vector for the vector-search surface
  * (reference: vector_db_interface.py `search(query_text │
  * query_vector)` — a search either names a stored embedding to use as
  * the query or ships a literal vector).
  */
sealed trait QueryVec
object QueryVec {
  /** Use the stored embedding with this `vec_id` as the query (the
    * stored row is excluded from the candidate set, like the
    * reference's self-match suppression). */
  final case class Id(id: Long) extends QueryVec
  /** A literal caller vector (nothing is excluded from candidates). */
  final case class Lit(v: Seq[Double]) extends QueryVec
}

/** Caller parameters for [[Graft.search]] — the reference's
  * `search(query_type, query_text, datasets, top_k)` surface
  * (cognee/api/v1/search/search.py:17 — `query_text` carries the
  * free-text / tokens / cypher payload per type, `datasets` scopes
  * retrieval, `top_k` bounds the result). Every field defaults to the
  * deterministic seed the verification suite pins, so
  * `search(tpe, SearchParams())` ≡ the registered operator.
  *
  * @param queryText  free text (NATURAL_LANGUAGE routing, entity
  *                   extraction seeds)
  * @param queryTokens lexical/code query token set
  * @param queryVec   vector-search query (stored id or literal vector)
  * @param topK       result bound where the type has one
  * @param datasets   dataset scope — only documents whose `source` is
  *                   in this set are searched (empty = all)
  * @param user       searching principal — the scope narrows to the
  *                   datasets the user may READ per [[Acl]] (the
  *                   reference's get_document_ids_for_user gate);
  *                   combined with `datasets`, the intersection
  *                   applies; an unknown user sees nothing
  * @param aclRoot    optional [[sources.AclStore]] root: resolve the
  *                   user's readable datasets through the DURABLE
  *                   principal store (direct ∪ role ∪ tenant grants)
  *                   instead of the in-code verification dim
  * @param interval   TEMPORAL half-open bounds (either side optional)
  * @param cypher     CYPHER pattern override
  * @param nodeType   graph-completion candidate narrowing, half 1
  *                   (graph_completion_retriever.py:41-42 `node_type`):
  *                   with [[nodeNames]] non-empty, the triplet
  *                   candidate set is the named-nodeset SUBGRAPH
  *                   (seeds of this ntype + 1-hop neighborhood —
  *                   CogneeGraph.project_graph_from_db:79 routes to
  *                   get_nodeset_subgraph) instead of the whole graph;
  *                   either half alone leaves the full graph, exactly
  *                   the reference's `node_type is not None and
  *                   node_name not in [None, [], ""]` guard
  * @param nodeNames  narrowing half 2: the node `name` values that
  *                   seed the subgraph
  */
final case class SearchParams(
    queryText: Option[String] = None,
    queryTokens: Option[Seq[String]] = None,
    queryVec: Option[QueryVec] = None,
    topK: Option[Int] = None,
    datasets: Seq[String] = Nil,
    user: Option[String] = None,
    aclRoot: Option[String] = None,
    interval: Option[(Option[String], Option[String])] = None,
    cypher: Option[String] = None,
    nodeType: Option[String] = None,
    nodeNames: Seq[String] = Nil)
