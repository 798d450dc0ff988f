package graft

import graft.operators.Retrievers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The parameterized search facade (api/v1/search/search.py:17):
  * `Graft.search(tpe, SearchParams(...))` must thread the caller's
  * query text / tokens / vector / top-k / dataset scope into the same
  * plans the verification suite pins — and with no params must be
  * EXACTLY the registered operators.
  */
class FacadeSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("default-params search ≡ the registered operator, per type") {
    val pairs: Seq[(Graft.SearchType, String)] = Seq(
      (Graft.Chunks, "search_chunks"),
      (Graft.ChunksLexical, "search_lexical"),
      (Graft.Summaries, "search_summaries"),
      (Graft.Insights, "search_insights"),
      (Graft.Feedback, "search_feedback"),
      (Graft.Temporal, "search_temporal"),
      (Graft.GraphCompletion, "search_completion_context"))
    for ((tpe, name) <- pairs)
      assert(rows(Graft.search(spark, sf, tpe)) === rows(SparkEntry.queries(name)(spark, sf)),
        s"facade default for ${tpe.name} diverges from $name")
  }

  test("ACL scope: two users see different result sets, unknown users see nothing") {
    def ids(user: String): Set[Long] =
      Graft.search(spark, sf, Graft.Chunks, SearchParams(user = Some(user)))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val (alice, bob, carol) = (ids("alice"), ids("bob"), ids("carol"))
    assert(alice.nonEmpty && bob.nonEmpty && (alice intersect bob).isEmpty,
      "alice (src0-9) and bob (src10-19) hold disjoint grants, results must differ")
    assert(carol.nonEmpty, "carol reads everything")
    assert(ids("mallory").isEmpty, "an unknown user is denied by default")
    // every hit really sits inside the user's granted sources
    val sources = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(alice.forall(d => Acl.readableSourcesOf("alice").contains(sources(d))))
    assert(bob.forall(d => Acl.readableSourcesOf("bob").contains(sources(d))))
    // the facade's user routing ≡ the registered semi-join operator
    assert(rows(Graft.search(spark, sf, Graft.Chunks, SearchParams(user = Some("alice")))) ===
      rows(SparkEntry.queries("search_chunks_acl")(spark, sf)))
    // explicit datasets intersect the grant: alice scoped to a source
    // she cannot read sees nothing; the lexical leg enforces it too
    assert(Graft.search(spark, sf, Graft.Chunks,
      SearchParams(user = Some("alice"), datasets = Seq("src15"))).count() === 0L)
    assert(Graft.search(spark, sf, Graft.ChunksLexical,
      SearchParams(user = Some("mallory"))).count() === 0L)
  }

  test("CHUNKS honors a caller aclRoot: store-granted users resolve through the durable store") {
    // dave exists ONLY in the durable principal store (direct src0 ∪
    // role src4-7 ∪ tenant src12), not in the in-code dim — before the
    // fix the Chunks dispatch ignored aclRoot and denied him.
    val root = java.nio.file.Files.createTempDirectory("graft_facade_acl").toString
    val as = sources.AclStore(spark, root)
    sources.AclStore.seed(as)
    val got = rows(Graft.search(spark, sf, Graft.Chunks,
      SearchParams(user = Some("dave"), aclRoot = Some(root))))
    assert(got.nonEmpty, "a store-granted user must see their scope, not be denied")
    assert(got === rows(Retrievers.chunksAclRole(spark, sf)),
      "the facade's store path must equal the registered principal-store operator")
    // without the store, dave stays unknown to the in-code dim: denied
    assert(Graft.search(spark, sf, Graft.Chunks,
      SearchParams(user = Some("dave"))).count() === 0L)
  }

  /** Every search type that reads dataset-partitioned data (documents /
    * embeddings) — the set the user scope must narrow. */
  private val scopedTypes: Seq[Graft.SearchType] = Seq(
    Graft.Chunks, Graft.ChunksLexical, Graft.Summaries, Graft.Insights,
    Graft.RagCompletion, Graft.GraphCompletion, Graft.GraphCompletionCot,
    Graft.GraphSummaryCompletion, Graft.Code, Graft.CodingRules,
    Graft.Feedback, Graft.FeelingLucky)

  /** Types whose retrieval reads no dataset-partitioned data (entity
    * graph, event ledger): a user scope cannot be honored. */
  private val unscopableTypes: Seq[Graft.SearchType] = Seq(
    Graft.Temporal, Graft.Cypher, Graft.NaturalLanguage,
    Graft.GraphCompletionContextExtension)

  test("user scope threads into EVERY scoped search type (unknown user sees nothing; full grant ≡ unscoped)") {
    for (t <- scopedTypes) {
      // deny-by-default, structurally: a grantless principal gets an
      // empty relation on every scoped type — never unscoped corpus data
      assert(Graft.search(spark, sf, t, SearchParams(user = Some("mallory"))).count() === 0L,
        s"${t.name}: unknown user must see nothing")
      // carol holds read on every source: her scoped plan must return
      // exactly the unscoped default (scope-as-filter, not a rewrite)
      assert(rows(Graft.search(spark, sf, t, SearchParams(user = Some("carol")))) ===
        rows(Graft.search(spark, sf, t)),
        s"${t.name}: full-grant user diverges from the unscoped default")
    }
  }

  test("two tenants with disjoint grants see disjoint documents on the doc-bearing types") {
    val sources = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def docIds(t: Graft.SearchType, user: String): Set[Long] =
      Graft.search(spark, sf, t, SearchParams(user = Some(user)))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    for (t <- Seq(Graft.Summaries, Graft.Feedback)) {
      val (a, b) = (docIds(t, "alice"), docIds(t, "bob"))
      assert(a.nonEmpty && b.nonEmpty && (a intersect b).isEmpty,
        s"${t.name}: disjoint grants must yield disjoint results")
      assert(a.forall(d => Acl.readableSourcesOf("alice").contains(sources(d))),
        s"${t.name}: alice result leaked outside her grant")
    }
    // CODE: the path prefix is the source — every path stays in-grant
    val alicePaths = Graft.search(spark, sf, Graft.Code, SearchParams(user = Some("alice")))
      .select(col("path")).collect().map(_.getString(0).split("/").head).toSet
    assert(alicePaths.nonEmpty &&
      alicePaths.subsetOf(Acl.readableSourcesOf("alice").toSet))
  }

  test("types that cannot honor a user scope fail fast instead of silently unscoping") {
    for (t <- unscopableTypes) {
      val e = intercept[IllegalArgumentException] {
        Graft.search(spark, sf, t, SearchParams(user = Some("alice")))
      }
      assert(e.getMessage.contains(t.name), s"${t.name}: error must name the type")
      // and without a user the type still dispatches
      assert(Graft.search(spark, sf, t).count() >= 0L)
    }
  }

  test("RAG_COMPLETION facade defaults top_k=1 (the reference CompletionRetriever default)") {
    // The registered search_rag_completion operator pins k=2 for a
    // richer oracle; the facade's no-param default must match the
    // reference's completion_retriever.py top_k=1 — i.e. the 1-prefix
    // of the same ranking, and explicit topK=2 ≡ the registered query.
    val dflt = Graft.search(spark, sf, Graft.RagCompletion)
      .collect()(0).getAs[String]("context")
    val reg = SparkEntry.queries("search_rag_completion")(spark, sf)
      .collect()(0).getAs[String]("context")
    assert(dflt.nonEmpty && dflt === reg.split("\n", 2)(0),
      "default context must be the 1-prefix of the registered k=2 context")
    assert(rows(Graft.search(spark, sf, Graft.RagCompletion, SearchParams(topK = Some(2)))) ===
      rows(SparkEntry.queries("search_rag_completion")(spark, sf)))
  }

  test("a literal query vector behaves like its stored twin") {
    // Passing embedding 0's vector literally ≡ naming vec_id 0, except
    // the literal query does not self-suppress: doc 0 (cosine 1.0)
    // tops the list and the remaining k rows are the stored-id result.
    val v0 = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()(0).getSeq[Double](0)
    val litRows = Retrievers.chunks(spark, sf, QueryVec.Lit(v0), 6)
    assert(litRows.filter(col("doc_id") === 0).count() === 1L,
      "literal query must not self-suppress the stored twin row")
    assert(rows(litRows.filter(col("doc_id") =!= 0)) ===
      rows(Retrievers.chunks(spark, sf, QueryVec.Id(0), 5)))
  }

  test("top-k threads through: a larger k extends the same ranking") {
    val k7 = rows(Graft.search(spark, sf, Graft.ChunksLexical, SearchParams(topK = Some(7))))
    val k20 = Retrievers.lexical(spark, sf).collect().map(_.toString).take(7).sorted.toSeq
    assert(k7 === k20, "top-7 must be the 7-prefix of the default top-20 ranking")
  }

  test("caller tokens reach the lexical scorer") {
    val custom = Graft.search(spark, sf, Graft.ChunksLexical,
      SearchParams(queryTokens = Some(Seq("nation")), topK = Some(5)))
    assert(custom.count() <= 5)
    // every hit really contains the token (score > 0 ⇒ intersection
    // non-empty with a single-token query)
    val hits = custom.join(
      spark.read.parquet(s"$sf/documents.parquet"), Seq("doc_id"))
    assert(hits.filter(!col("text").contains("nation")).count() === 0L)
    // free text tokenizes when no explicit token list rides along
    val viaText = Graft.search(spark, sf, Graft.ChunksLexical,
      SearchParams(queryText = Some("NATION"), topK = Some(5)))
    assert(rows(custom) === rows(viaText))
  }

  test("dataset scope restricts retrieval to the named sources") {
    val scoped = Graft.search(spark, sf, Graft.Chunks,
      SearchParams(datasets = Retrievers.scopedDatasets))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val srcs = scoped.join(docs, Seq("doc_id")).select(col("source"))
      .collect().map(_.getString(0)).toSet
    assert(srcs.subsetOf(Retrievers.scopedDatasets.toSet), s"leaked sources: $srcs")
    // scoping ≡ searching a pre-filtered corpus: the scoped result is
    // the top-5 of exactly the in-scope candidates
    assert(scoped.count() === 5L)
    // and the facade entry matches the registered scoped operator
    assert(rows(scoped) === rows(SparkEntry.queries("search_chunks_scoped")(spark, sf)))
  }

  test("temporal interval threads through the facade") {
    val open = Graft.search(spark, sf, Graft.Temporal,
      SearchParams(interval = Some((Some("2024-01-20 00:00:00"), None))))
    assert(rows(open) === rows(operators.EventOps.temporalOpen(spark, sf)))
  }

  test("caller interval reaches the temporal-graph resolution") {
    // Default window ≡ the registered operator; a caller QueryInterval
    // changes the entity-graph result (temporal_retriever.py threads the
    // extracted interval into the graph leg, not just the event table).
    val dflt = Graft.searchTemporalGraph(spark, sf)
    assert(rows(dflt) === rows(SparkEntry.queries("search_temporal_graph")(spark, sf)))
    val narrow = Graft.searchTemporalGraph(spark, sf,
      SearchParams(interval = Some((Some("2024-01-08 00:00:00"), Some("2024-01-09 00:00:00")))))
    val (dTotal, nTotal) = (
      dflt.agg(sum(col("n_events"))).head().getLong(0),
      narrow.agg(sum(col("n_events"))).head().getLong(0))
    assert(nTotal > 0 && nTotal < dTotal,
      s"narrowed interval should shrink the event mass: $nTotal vs $dTotal")
  }

  test("node_type/node_name narrowing threads into the graph-completion retrievers") {
    // GRAPH_COMPLETION: the triplet leg must restrict to the nodeset
    // subgraph — narrowing to a nation NOT among the centroid top-3
    // changes (empties) the triplet part while leaving chunks alone
    val dflt = Graft.search(spark, sf, Graft.GraphCompletion)
    val nar = Graft.search(spark, sf, Graft.GraphCompletion,
      SearchParams(nodeType = Some("nation"), nodeNames = Seq("NATION_0")))
    assert(rows(dflt.filter(col("part") === "chunk")) ===
      rows(nar.filter(col("part") === "chunk")))
    assert(rows(dflt.filter(col("part") === "triplet")) !==
      rows(nar.filter(col("part") === "triplet")),
      "nodeset narrowing must change the triplet candidates")
    // half a pair = no narrowing (the reference's exact guard:
    // node_type AND node_name both required)
    assert(rows(Graft.search(spark, sf, Graft.GraphCompletion,
      SearchParams(nodeType = Some("nation")))) === rows(dflt))
    assert(rows(Graft.search(spark, sf, Graft.GraphCompletion,
      SearchParams(nodeNames = Seq("NATION_0")))) === rows(dflt))
    // typed triplet search ≡ the registered query, and ⊂ the subgraph:
    // every winner's endpoints live in the nodeset 1-hop neighborhood
    val typed = SparkEntry.queries("search_triplets_typed")(spark, sf)
    val sub = graft.graph.TpchGraph(spark, sf)
      .nodesetSubgraph("nation", Seq("NATION_3", "NATION_7"))
    val ids = sub.nodes.select("id").collect().map(_.getString(0)).toSet
    val win = typed.collect()
    assert(win.nonEmpty && win.forall(r =>
      ids.contains(r.getString(0)) && ids.contains(r.getString(2))))
    // and the narrowing CHANGED the top-10 vs the unrestricted search
    assert(rows(typed) !== rows(SparkEntry.queries("search_triplets")(spark, sf)))
    // EXTENSION threads the same params (rounds restricted to subgraph)
    val extN = Graft.search(spark, sf, Graft.GraphCompletionContextExtension,
      SearchParams(nodeType = Some("nation"), nodeNames = Seq("NATION_3", "NATION_7")))
      .collect()
    assert(extN.nonEmpty && extN.forall(r =>
      ids.contains(r.getString(1)) && ids.contains(r.getString(3))))
    // COT's document-loop stand-in has no triplet leg: fail fast
    assert(intercept[IllegalArgumentException] {
      Graft.search(spark, sf, Graft.GraphCompletionCot,
        SearchParams(nodeType = Some("nation"), nodeNames = Seq("NATION_0")))
    }.getMessage.contains("narrowing"))
    // SUMMARY completion inherits narrowing like the reference
    // (graph_summary_completion_retriever.py extends
    // GraphCompletionRetriever): the triplet part narrows, the summary
    // (document) part is untouched
    val sumD = Graft.search(spark, sf, Graft.GraphSummaryCompletion)
    val sumN = Graft.search(spark, sf, Graft.GraphSummaryCompletion,
      SearchParams(nodeType = Some("nation"), nodeNames = Seq("NATION_0")))
    assert(rows(sumD.filter(col("part") === "summary")) ===
      rows(sumN.filter(col("part") === "summary")))
    assert(rows(sumD.filter(col("part") === "triplet")) !==
      rows(sumN.filter(col("part") === "triplet")),
      "summary completion's triplet leg must narrow")
    // TEMPORAL-graph inherits narrowing too (temporal_retriever.py
    // extends GraphCompletionRetriever): the interval rollup restricts
    // to the nodeset's nations; one-half = full fragment
    val tgD = Graft.searchTemporalGraph(spark, sf)
    // narrow to two nations that actually have events in the window at
    // this SF (the rollup's own output is the ground truth)
    val present = tgD.select(col("nation")).collect().map(_.getString(0)).sorted.take(2)
    assert(present.length === 2)
    val tgN = Graft.searchTemporalGraph(spark, sf,
      SearchParams(nodeType = Some("nation"), nodeNames = present.toSeq))
    val tgNations = tgN.select(col("nation")).collect().map(_.getString(0)).toSet
    assert(tgNations === present.toSet)
    assert(rows(tgN) !== rows(tgD))
    assert(rows(Graft.searchTemporalGraph(spark, sf,
      SearchParams(nodeType = Some("nation")))) === rows(tgD))
  }

  test("cypher override threads through the facade") {
    val viaParams = Graft.search(spark, sf, Graft.Cypher,
      SearchParams(cypher = Some(Retrievers.supplierCypher)))
    assert(rows(viaParams) === rows(Retrievers.cypher(spark, sf)))
    // the override accepts the full grammar, WITH-chained queries included
    val viaWith = Graft.search(spark, sf, Graft.Cypher,
      SearchParams(cypher = Some(Retrievers.withCypher)))
    assert(rows(viaWith) === rows(SparkEntry.queries("search_cypher_with")(spark, sf)))
  }

  test("the NL->Cypher grammar routes question shapes through the schema paths") {
    import graft.operators.Retrievers
    // generated text pinned for the flagship shape (2-hop path)
    assert(Retrievers.nlToCypher("how many suppliers are located in each region") ===
      "MATCH (a:supplier)-[:located_in]->(m0:nation)-[:in_region]->(b:region) " +
        "RETURN b.name AS region, count(*) AS n_suppliers ORDER BY region")
    // per-group over a direct relation: counts re-derive from the tables
    val perNation = Retrievers.naturalLanguage(spark, sf,
      "how many customers are located in each nation")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perNation === expect)
    // reverse-arrow path: parts per order routes through <-[:contains]-
    assert(Retrievers.nlToCypher("how many parts are contained in each order")
      .contains("(a:part)<-[:contains]-(b:order)"))
    // superlative: one row, the argmax of the per-group counts
    val top = Retrievers.naturalLanguage(spark, sf,
      "which nation has the most customers").collect()
    assert(top.length === 1 && top.head.getLong(1) === expect.values.max)
    // totals
    assert(Retrievers.naturalLanguage(spark, sf, "how many regions are there?")
      .collect().head.getLong(0) ===
      Tables.load(spark, sf, "region").count())
    // 'how many X are there in each Y' routes to the PER-GROUP shape —
    // the unanchored total pattern also matches this prefix and used to
    // win, silently collapsing the grouping to a global count
    assert(Retrievers.nlToCypher("how many suppliers are there in each region")
      .contains("ORDER BY region"))
    // out-of-schema entities and shapes fail fast with the contract
    assert(intercept[IllegalArgumentException] {
      Retrievers.nlToCypher("how many dragons are located in each realm")
    }.getMessage.contains("unknown entity"))
    assert(intercept[IllegalArgumentException] {
      Retrievers.nlToCypher("tell me about suppliers")
    }.getMessage.contains("unsupported question shape"))
    // unconnected type pair names the schema gap
    assert(intercept[IllegalArgumentException] {
      Retrievers.nlToCypher("how many regions are grouped under each part")
    }.getMessage.contains("no relation path"))
  }
}
