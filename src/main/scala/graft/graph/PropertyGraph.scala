package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A property graph as a pair of DataFrames — the Spark-native
  * re-expression of cognee's graph storage interface
  * (reference: cognee/infrastructure/databases/graph/graph_db_interface.py:16
  * — NodeData/EdgeData as (source_id, target_id, relationship_name, props)).
  *
  * `nodes`: (id STRING, ntype STRING, name STRING [, props MAP<STRING,STRING>])
  * `edges`: (src STRING, dst STRING, rel STRING [, props MAP<STRING,STRING>])
  *
  * `props` is the reference's arbitrary per-element property bag
  * (NodeData/EdgeData `properties`; the kuzu/neo4j adapters persist and
  * filter on it). It is OPTIONAL on input — [[PropertyGraph.ensureProps]]
  * normalizes an absent column to an empty map, so fixed-schema callers
  * keep working — and mutation results always carry it.
  *
  * Ids are typed strings `"<type>:<key>"` so heterogeneous entity sets
  * union into one vertex domain without key collisions. At cluster
  * scale both DataFrames are hash-partitioned on id/src by the shuffles
  * the consuming operators declare; nothing here collects to the driver.
  */
final case class PropertyGraph(nodes: DataFrame, edges: DataFrame) {
  import PropertyGraph.ensureProps

  /** Nodes with the `props` bag guaranteed present (empty map if the
    * underlying relation was built fixed-schema). */
  def nodesP: DataFrame = ensureProps(nodes)

  /** Edges with the `props` bag guaranteed present. */
  def edgesP: DataFrame = ensureProps(edges)

  /** Both directions of every edge, deduplicated — the traversal view
    * used by undirected algorithms (BFS, components, triangles).
    * Lazily persisted: TpchGraph caches the PropertyGraph instance per
    * (session, dir), so BFS/SSSP/subgraph queries in one process share
    * one materialization instead of re-running the distinct. */
  lazy val undirectedEdges: DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    // Hash-partition on src before persisting: every BFS/SSSP level
    // joins this view on src, and a cached known partitioning lets each
    // of those joins shuffle only the (small) frontier side instead of
    // re-exchanging the full edge set per level.
    fwd.union(rev).distinct().repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Per-(relation set, direction, granularity) oriented hop views —
    * the adjacency structures CypherLite's variable-length chain
    * expansions traverse, stored hash-partitioned on src
    * ([[org.apache.spark.sql.graft.Materialize.storedHashed]]) so every
    * per-level frontier⋈hop join runs with NO exchange and no sort on
    * the edge side. Instance-keyed like [[undirectedEdges]]: repeat
    * chain queries over one graph instance (the session-cached
    * projection) share one materialization instead of re-shuffling the
    * oriented edge set per call; a mutated graph is a NEW instance and
    * builds fresh views. Blocks are executor-local checkpoints — when
    * the graph instance is released (session-cache eviction) they
    * become unreachable and the ContextCleaner reclaims them.
    * Double-build under a concurrent miss is benign: the loser's
    * checkpoint is simply unreferenced and reclaimed. */
  private val hopViews =
    scala.collection.concurrent.TrieMap.empty[(Seq[String], String, String, Int), DataFrame]
  private[graph] def hopView(key: (Seq[String], String, String, Int))(
      build: => DataFrame): DataFrame =
    hopViews.getOrElseUpdate(key, build)

  /** Dense vertex index (id → long) for GraphX algorithms, built once
    * per graph instance. Instance-lazy (like [[undirectedEdges]]):
    * the index is RDD-derived, so every rebuild would register a NEW
    * cache entry in the CacheManager — per-call construction leaked one
    * ~|V|-row cached DataFrame per algorithm invocation (bench: 2
    * passes × every GraphX query) until storage pressure evicted the
    * shared projections. */
  lazy val vertexIndexDf: DataFrame =
    GraphAlgos.vertexIndex(nodes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** GraphX views (undirected / directed), one per graph instance —
    * shared across PageRank/components/shortest-path calls so repeat
    * invocations iterate over the same cached vertex/edge RDDs instead
    * of re-indexing and re-caching the graph every call. */
  lazy val graphXUndirected: org.apache.spark.graphx.Graph[Unit, Unit] =
    GraphAlgos.buildGraphX(this, directed = false)
  lazy val graphXDirected: org.apache.spark.graphx.Graph[Unit, Unit] =
    GraphAlgos.buildGraphX(this, directed = true)

  /** Connected-component labels (id, component), one materialization
    * per graph instance — a derived graph artifact like
    * [[undirectedEdges]]: every consumer (component query, full-metrics
    * summary, size histograms) shares the one GraphX run. */
  lazy val connectedComponentsDf: DataFrame =
    GraphAlgos.connectedComponents(this)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** All-pairs hop-distance table — BOUNDED-subgraph artifact (see
    * GraphAlgos.allPairsDistances for the O(Σ comp²) contract). Cached
    * per instance so diameter/path-length consumers share one BFS. */
  lazy val allPairsDistancesDf: DataFrame =
    GraphAlgos.allPairsDistances(this)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-node (deg, tri) over this graph's canonical undirected simple
    * edges — the local-clustering building block, one materialization
    * per instance (same artifact policy as [[connectedComponentsDf]]). */
  lazy val localTrianglesDf: DataFrame =
    GraphAlgos.localTriangles(
        undirectedEdges.filter(col("src") < col("dst"))
          .select(col("src").as("x"), col("dst").as("y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-node in/out degree (cognee get_neighbors cardinality).
    * Two partial-aggregated counts + broadcast-free left joins; one
    * shuffle per side keyed on node id. */
  def degrees: DataFrame = {
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val in  = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    nodes.join(out, Seq("id"), "left").join(in, Seq("id"), "left")
      .select(col("id"), col("ntype"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** 1-hop connection triplets touching a node predicate (cognee
    * get_connections, the INSIGHTS building block). */
  def connections(nodePred: org.apache.spark.sql.Column): DataFrame = {
    val ids = nodes.filter(nodePred).select(col("id"))
    // Semi-join both endpoints; ids is small relative to edges → broadcast.
    val bySrc = edges.join(broadcast(ids.withColumnRenamed("id", "src")), Seq("src"))
    val byDst = edges.join(broadcast(ids.withColumnRenamed("id", "dst")), Seq("dst"))
    bySrc.select("src", "rel", "dst").union(byDst.select("src", "rel", "dst")).distinct()
  }

  /** num_nodes / num_edges / mean_degree / density — cognee
    * get_graph_metrics (graph_db_interface.py). Single-row result. */
  def metrics: DataFrame = {
    val n = nodes.agg(count(lit(1)).as("num_nodes"))
    val e = edges.agg(count(lit(1)).as("num_edges"))
    n.crossJoin(e).select(
      col("num_nodes"), col("num_edges"),
      round(col("num_edges") * 2.0 / col("num_nodes"), 4).as("mean_degree"),
      round(col("num_edges") * 1.0 /
        (col("num_nodes") * (col("num_nodes") - lit(1L))), 8).as("edge_density"))
  }

  /** Upsert nodes (keep-first against the base on id collision — cognee
    * add_nodes uses deterministic ids, so re-adding is a no-op; within
    * the increment, conflicting rows for one id resolve to the minimum
    * (ntype, name) so the result is partition-order-independent).
    * Mutations compose as
    * plans over the base relations; materializing an increment is a
    * parquet write of the result, not an in-place edit.
    *
    * INCREMENT-SIZED, NOT BASE-SIZED: the increment is assumed small
    * (interactive mutations), so collisions are found by probing the
    * base with the BROADCAST increment — the base relation is scanned
    * in place, never shuffled. The collision set (≤ increment) then
    * broadcast-anti-joins the increment itself. A bulk merge should go
    * through re-ingest instead. */
  def addNodes(newNodes: DataFrame): PropertyGraph = {
    // Upsert semantics: one row per id, chosen DETERMINISTICALLY (min by
    // (ntype, name, sorted props entries)) — dropDuplicates would keep a
    // partition-order-dependent row when an increment carries conflicting
    // attributes. Maps are not orderable, so the bag is compared as its
    // key-sorted entry array and rebuilt after the min.
    val inc = ensureProps(newNodes).groupBy(col("id"))
      .agg(min(struct(col("ntype"), col("name"),
        array_sort(map_entries(col("props"))).as("pe"))).as("s"))
      .select(col("id"), col("s.ntype").as("ntype"), col("s.name").as("name"),
        map_from_entries(col("s.pe")).as("props"))
    val base = nodesP
    val collisions = base.join(broadcast(inc.select(col("id"))), Seq("id"), "left_semi")
      .select(col("id"))
    PropertyGraph(
      base.union(inc.join(broadcast(collisions), Seq("id"), "left_anti")),
      edges)
  }

  /** Add edges (dedup exact triplets — add_edges). Same increment-sized
    * plan shape as [[addNodes]]: the former union+distinct reshuffled
    * the WHOLE edge relation to admit a handful of rows. */
  def addEdges(newEdges: DataFrame): PropertyGraph = {
    // One row per (src, dst, rel) triplet; conflicting increment bags
    // resolve to the minimum sorted-entry array (same determinism rule
    // as [[addNodes]]).
    val inc = ensureProps(newEdges).groupBy(col("src"), col("dst"), col("rel"))
      .agg(map_from_entries(min(array_sort(map_entries(col("props"))))).as("props"))
    val base = edgesP
    val dups = base.join(broadcast(inc.select(col("src"), col("dst"), col("rel"))),
      Seq("src", "dst", "rel"), "left_semi")
    PropertyGraph(nodes,
      base.union(inc.join(broadcast(dups.select(col("src"), col("dst"), col("rel"))),
        Seq("src", "dst", "rel"), "left_anti")))
  }

  /** Bulk-merge nodes: same keep-first upsert semantics as [[addNodes]],
    * but CORPUS-SIZED increments welcome — the collision probe is a
    * plain keyed anti-join (shuffle/SMJ as Catalyst decides; AQE still
    * broadcasts when the increment turns out small), never a forced
    * broadcast of the increment. This is the projection path for merges
    * derived from a full corpus pass (e.g. the extracted temporal event
    * graph), where [[addNodes]]'s interactive-increment contract would
    * pin the whole extraction in driver/executor memory. */
  def mergeNodes(newNodes: DataFrame): PropertyGraph = {
    val inc = ensureProps(newNodes).groupBy(col("id"))
      .agg(min(struct(col("ntype"), col("name"),
        array_sort(map_entries(col("props"))).as("pe"))).as("s"))
      .select(col("id"), col("s.ntype").as("ntype"), col("s.name").as("name"),
        map_from_entries(col("s.pe")).as("props"))
    val base = nodesP
    PropertyGraph(
      base.union(inc.join(base.select(col("id")), Seq("id"), "left_anti")),
      edges)
  }

  /** Bulk-merge edges: [[addEdges]] semantics at corpus scale — keyed
    * anti-join on the (src, dst, rel) triplet instead of a forced
    * broadcast of the increment. */
  def mergeEdges(newEdges: DataFrame): PropertyGraph = {
    val inc = ensureProps(newEdges).groupBy(col("src"), col("dst"), col("rel"))
      .agg(map_from_entries(min(array_sort(map_entries(col("props"))))).as("props"))
    val base = edgesP
    PropertyGraph(nodes,
      base.union(inc.join(base.select(col("src"), col("dst"), col("rel")),
        Seq("src", "dst", "rel"), "left_anti")))
  }

  /** Chain compaction for mutation pipelines: N stacked
    * addNodes/mergeEdges/runWrite layers are lazily composed plans, so
    * every downstream ACTION re-derives every earlier rewrite —
    * correct, but the re-derivation cost grows with chain depth × data
    * (the sf1 soak measured a 9-write chain at 15× data cost).
    * `compact` pins the current state as executor-stored blocks
    * (eager localCheckpoint, lineage released — the plan resets to a
    * scan), exactly what a deployment does between mutation batches.
    * Semantically the identity; the blocks are reclaimed by the
    * ContextCleaner when the compacted graph becomes unreachable. */
  def compact: PropertyGraph =
    PropertyGraph(org.apache.spark.sql.graft.Materialize.stored(nodesP),
      org.apache.spark.sql.graft.Materialize.stored(edgesP))

  /** [[compact]] in ONE kind-tagged eager pass: nodes and edges union
    * into a single stored relation and split lazily after (the CDC
    * gate's capture-sharing discipline). Every later action over the
    * compacted graph scans BOTH legs' blocks and filters — the right
    * trade for the per-micro-batch compacts of a driver-resident
    * accumulator graph, where the fixed cost is the eager-action count
    * and the graph is small. For large graphs whose downstream reads
    * are node-only or edge-only, [[compact]]'s separate stores scan
    * less; keep using it there. */
  def compactOnePass: PropertyGraph = {
    val tagged = nodesP.select(lit("n").as("leg"), col("id").as("a"),
        col("ntype").as("b"), col("name").as("c"), col("props"))
      .unionByName(edgesP.select(lit("e").as("leg"), col("src"), col("dst"),
        col("rel"), col("props")).toDF("leg", "a", "b", "c", "props"))
    val stored = org.apache.spark.sql.graft.Materialize.stored(tagged)
    PropertyGraph(
      stored.filter(col("leg") === "n")
        .select(col("a").as("id"), col("b").as("ntype"), col("c").as("name"), col("props")),
      stored.filter(col("leg") === "e")
        .select(col("a").as("src"), col("b").as("dst"), col("c").as("rel"), col("props")))
  }

  /** Increment the `feedback_weight` edge prop (reference:
    * graph_db_interface apply_feedback_weight, kuzu/adapter.py:1724 —
    * edges of `rel` whose SOURCE node is in the weight set get their
    * stored weight bumped by that node's weight; user_qa_feedback.py:79
    * calls it with the graded interactions' ids and the sentiment
    * score). Declarative update: a keyed left join tags each edge row
    * with its increment (NULL → untouched), and the bag is rebuilt with
    * the one key replaced — no driver-side fetch-update-writeback loop
    * like the reference adapters; the whole update is one distributed
    * pass over the edge relation. Repeat application keeps summing, the
    * reference's increment semantics. */
  def applyFeedbackWeight(weights: DataFrame,
      rel: String = "used_graph_element_to_answer"): PropertyGraph = {
    val w = weights.groupBy(col("id").as("src")).agg(sum(col("weight")).as("w_inc"))
    val e = edgesP.join(w, Seq("src"), "left")
    val bumped = map_from_entries(concat(
      filter(map_entries(col("props")), ent => ent.getField("key") =!= "feedback_weight"),
      array(struct(lit("feedback_weight").as("key"),
        (coalesce(element_at(col("props"), "feedback_weight").cast("double"), lit(0.0))
          + col("w_inc")).cast("string").as("value")))))
    PropertyGraph(nodes,
      e.select(col("src"), col("dst"), col("rel"),
        when(col("rel") === rel && col("w_inc").isNotNull, bumped)
          .otherwise(col("props")).as("props")))
  }

  /** SET one node property for an id set (the adapters' `SET n.prop =
    * $value` template, neo4j_driver/adapter.py add_node ON MATCH SET):
    * the fixed `name` column updates in place; any other key
    * replaces-or-inserts into the props bag. Declarative like
    * [[applyFeedbackWeight]]: a keyed left join tags each node row with
    * a hit marker (no forced broadcast — AQE broadcasts a small id set
    * on its own), and the bag rebuild is one in-row map rewrite — the
    * whole update is a single distributed pass over the node relation,
    * never a fetch-update-writeback loop. */
  def setNodeProp(ids: DataFrame, key: String, value: String): PropertyGraph = {
    val hits = ids.select(col("id")).distinct().withColumn("__hit", lit(1))
    val tagged = nodesP.join(hits, Seq("id"), "left")
    val updated = key match {
      case "name" => tagged.select(col("id"), col("ntype"),
        when(col("__hit").isNotNull, lit(value)).otherwise(col("name")).as("name"),
        col("props"))
      case "id" | "ntype" => throw new IllegalArgumentException(
        s"SET on the identity column '$key' is unsupported")
      case bagKey =>
        val rebuilt = map_from_entries(concat(
          filter(map_entries(col("props")), ent => ent.getField("key") =!= bagKey),
          array(struct(lit(bagKey).as("key"), lit(value).as("value")))))
        tagged.select(col("id"), col("ntype"), col("name"),
          when(col("__hit").isNotNull, rebuilt).otherwise(col("props")).as("props"))
    }
    PropertyGraph(updated, edges)
  }

  /** SET one edge property for a (src, dst, rel) triplet set — the
    * edge twin of [[setNodeProp]] (the adapters' edge-property update;
    * [[applyFeedbackWeight]] is the specialized increment form): keyed
    * left join tags matched edge rows, one in-row bag rewrite, a
    * single distributed pass over the edge relation. The fixed
    * `rel` column is identity — not settable. */
  def setEdgeProp(keys: DataFrame, key: String, value: String): PropertyGraph = {
    require(key != "rel" && key != "src" && key != "dst",
      s"SET on the identity column '$key' is unsupported")
    val hits = keys.select(col("src"), col("dst"), col("rel")).distinct()
      .withColumn("__hit", lit(1))
    val tagged = edgesP.join(hits, Seq("src", "dst", "rel"), "left")
    val rebuilt = map_from_entries(concat(
      filter(map_entries(col("props")), ent => ent.getField("key") =!= key),
      array(struct(lit(key).as("key"), lit(value).as("value")))))
    PropertyGraph(nodes,
      tagged.select(col("src"), col("dst"), col("rel"),
        when(col("__hit").isNotNull, rebuilt).otherwise(col("props")).as("props")))
  }

  /** REMOVE one bag property for a node id set (Cypher's REMOVE n.key;
    * the SET twin): one keyed left join + in-row bag filter. Fixed
    * columns are identity/required — not removable. */
  def removeNodeProp(ids: DataFrame, key: String): PropertyGraph = {
    require(!Seq("id", "ntype", "name").contains(key),
      s"REMOVE on the fixed column '$key' is unsupported")
    val hits = ids.select(col("id")).distinct().withColumn("__hit", lit(1))
    val tagged = nodesP.join(hits, Seq("id"), "left")
    val rebuilt = map_from_entries(
      filter(map_entries(col("props")), ent => ent.getField("key") =!= key))
    PropertyGraph(
      tagged.select(col("id"), col("ntype"), col("name"),
        when(col("__hit").isNotNull, rebuilt).otherwise(col("props")).as("props")),
      edges)
  }

  /** REMOVE one bag property for a (src, dst, rel) triplet set — the
    * edge twin of [[removeNodeProp]]. */
  def removeEdgeProp(keys: DataFrame, key: String): PropertyGraph = {
    require(!Seq("rel", "src", "dst").contains(key),
      s"REMOVE on the identity column '$key' is unsupported")
    val hits = keys.select(col("src"), col("dst"), col("rel")).distinct()
      .withColumn("__hit", lit(1))
    val tagged = edgesP.join(hits, Seq("src", "dst", "rel"), "left")
    val rebuilt = map_from_entries(
      filter(map_entries(col("props")), ent => ent.getField("key") =!= key))
    PropertyGraph(nodes,
      tagged.select(col("src"), col("dst"), col("rel"),
        when(col("__hit").isNotNull, rebuilt).otherwise(col("props")).as("props")))
  }

  /** Delete nodes by id along with every incident edge (delete_nodes).
    * Column-preserving: the anti-joins keep whatever schema (props or
    * not) the relations carry. */
  def deleteNodes(ids: DataFrame): PropertyGraph = {
    val idCol = ids.select(col("id"))
    PropertyGraph(
      nodes.join(idCol, Seq("id"), "left_anti"),
      edges
        .join(idCol.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(idCol.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select(edges.columns.map(col).toIndexedSeq: _*))
  }

  /** Point lookup of nodes by id set (graph_db_interface.py:229
    * get_node / :241 get_nodes): the asked ids broadcast against the
    * node relation — one semi-join for any number of probes, returning
    * the full NodeData shape (props included). */
  def getNodes(ids: DataFrame): DataFrame =
    nodesP.join(broadcast(ids.select(col("id"))), Seq("id"), "left_semi")

  /** Every edge incident to a node id set (graph_db_interface.py:345
    * get_edges): both-endpoint broadcast semi-joins, props included. */
  def getEdges(ids: DataFrame): DataFrame = {
    val idCol = ids.select(col("id"))
    edgesP.join(broadcast(idCol.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
      .union(edgesP.join(broadcast(idCol.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"), col("rel"), col("props")))
      .dropDuplicates(Seq("src", "dst", "rel"))
  }

  /** Does an edge (src)-[rel]->(dst) exist? (graph_db_interface.py:318
    * has_edge). One pushed-down filter on the edge relation. */
  def hasEdge(src: String, dst: String, rel: String): Boolean =
    !edges.filter(col("src") === src && col("dst") === dst && col("rel") === rel).isEmpty

  /** Which of the asked (src, dst, rel) triples exist?
    * (graph_db_interface.py:332 has_edges). The asked set is broadcast
    * against the edge relation — a single semi-join, not per-triple
    * lookups, so one call scales to millions of probes. */
  def hasEdges(asked: DataFrame): DataFrame =
    asked.select(col("src"), col("dst"), col("rel"))
      .join(edges.select(col("src"), col("dst"), col("rel")), Seq("src", "dst", "rel"), "left_semi")

  /** Induced subgraph of a named node set of one type
    * (graph_db_interface.py:369 get_nodeset_subgraph): the named nodes
    * plus their 1-hop neighbors, with every edge whose two endpoints
    * both fall in that closure. */
  def nodesetSubgraph(ntypeName: String, names: Seq[String]): PropertyGraph = {
    val seeds = nodes.filter(col("ntype") === ntypeName && col("name").isin(names: _*))
      .select(col("id"))
    val nbrs = edges.join(broadcast(seeds.withColumnRenamed("id", "src")), Seq("src"))
      .select(col("dst").as("id"))
      .union(edges.join(broadcast(seeds.withColumnRenamed("id", "dst")), Seq("dst"))
        .select(col("src").as("id")))
    val keep = seeds.union(nbrs).distinct()
    PropertyGraph(
      nodes.join(keep, Seq("id"), "left_semi"),
      edges
        .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(edges.columns.map(col).toIndexedSeq: _*))
  }

  /** Drop everything (graph_db_interface.py delete_graph) — an empty
    * graph with the same schema, as a plan (materialize = overwrite). */
  def deleteGraph: PropertyGraph =
    PropertyGraph(nodes.limit(0), edges.limit(0))

  /** Subgraph restricted to the given node types. */
  def subgraphByType(types: Seq[String]): PropertyGraph = {
    val prefixes = types.map(_ + ":")
    def keep(c: org.apache.spark.sql.Column) =
      prefixes.map(p => c.startsWith(p)).reduce(_ || _)
    PropertyGraph(
      nodes.filter(col("ntype").isin(types: _*)),
      edges.filter(keep(col("src")) && keep(col("dst"))))
  }
}

object PropertyGraph {
  /** Normalize an optional property bag: absent `props` column → empty
    * MAP<STRING,STRING> (the reference's NodeData/EdgeData default to an
    * empty properties dict, graph_db_interface.py:16-34). A metadata-only
    * projection — no shuffle, no data pass. */
  def ensureProps(df: DataFrame): DataFrame =
    if (df.columns.contains("props")) df
    else df.withColumn("props", map().cast("map<string,string>"))
}

/** Knowledge-graph projection of the TPC-H-ish testdata — the analog of
  * cognee's cognify step materializing entities + relations from source
  * data (reference: cognee/modules/cognify, tasks/graph). Entity types:
  * region, nation, supplier, customer, part, order; relations:
  * in_region, located_in, placed_by, contains, supplied_by.
  */
object TpchGraph {
  // The projection is referenced by many queries in one process (verify /
  // bench run the whole inventory); building it involves a distinct()
  // over lineitem, so cache the persisted result per (session, dir).
  private val cache = new SessionDirCache[PropertyGraph]((spark, dir) => {
    val g = build(spark, dir)
    PropertyGraph(
      g.nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      g.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }, stamp = SessionDirCache.parquetStamp(SessionDirCache.graphTables))

  def apply(spark: SparkSession, dir: String): PropertyGraph = cache(spark, dir)

  private def build(spark: SparkSession, dir: String): PropertyGraph = {
    import graft.Tables.load
    def id(prefix: String, c: String) = concat(lit(prefix + ":"), col(c).cast("string"))

    val region   = load(spark, dir, "region")
    val nation   = load(spark, dir, "nation")
    val supplier = load(spark, dir, "supplier")
    val customer = load(spark, dir, "customer")
    val part     = load(spark, dir, "part")
    val orders   = load(spark, dir, "orders")
    val lineitem = load(spark, dir, "lineitem")

    // Per-type property bags (reference NodeData.properties): filterable
    // attributes ride the graph as MAP<STRING,STRING> so CypherLite WHERE
    // predicates and exports can reach them without re-joining the source
    // tables.
    val nodes =
      region.select(id("region", "r_regionkey").as("id"), lit("region").as("ntype"), col("r_name").as("name"),
          map().cast("map<string,string>").as("props"))
        .union(nation.select(id("nation", "n_nationkey"), lit("nation"), col("n_name"),
          map(lit("regionkey"), col("n_regionkey").cast("string"))))
        .union(supplier.select(id("supplier", "s_suppkey"), lit("supplier"), col("s_name"),
          map(lit("nationkey"), col("s_nationkey").cast("string"))))
        .union(customer.select(id("customer", "c_custkey"), lit("customer"), col("c_name"),
          map(lit("mktsegment"), col("c_mktsegment"))))
        .union(part.select(id("part", "p_partkey"), lit("part"), col("p_name"),
          map(lit("brand"), col("p_brand"))))
        .union(orders.select(id("order", "o_orderkey"), lit("order"),
          concat(lit("order-"), col("o_orderkey").cast("string")),
          map(lit("status"), col("o_orderstatus"), lit("priority"), col("o_orderpriority"))))

    // Edge property bags (reference EdgeData.properties): placed_by
    // carries the order date — the relationship attribute CypherLite
    // edge-variable predicates filter on; structural edges have empty
    // bags.
    val noProps = map().cast("map<string,string>")
    val edges =
      nation.select(id("nation", "n_nationkey").as("src"), id("region", "n_regionkey").as("dst"), lit("in_region").as("rel"),
          noProps.as("props"))
        .union(supplier.select(id("supplier", "s_suppkey"), id("nation", "s_nationkey"), lit("located_in"), noProps))
        .union(customer.select(id("customer", "c_custkey"), id("nation", "c_nationkey"), lit("located_in"), noProps))
        .union(orders.select(id("order", "o_orderkey"), id("customer", "o_custkey"), lit("placed_by"),
          map(lit("orderdate"), date_format(col("o_orderdate"), "yyyy-MM-dd"))))
        // lineitem fans out order→part / order→supplier; dedup to simple edges
        // (map-side partial distinct then one shuffle on (src,dst)).
        .union(lineitem.select(id("order", "l_orderkey"), id("part", "l_partkey"), lit("contains")).distinct()
          .select(col("*"), noProps))
        .union(lineitem.select(id("order", "l_orderkey"), id("supplier", "l_suppkey"), lit("supplied_by")).distinct()
          .select(col("*"), noProps))

    PropertyGraph(nodes, edges)
  }

  /** DuckDB WITH-clause fragments re-deriving the SAME projection from the
    * raw parquet views — shared by every graph oracle so Spark and oracle
    * can never drift apart. */
  val nodesSql: String =
    """nodes AS (
      |  SELECT 'region:'||r_regionkey AS id, 'region' AS ntype, r_name AS name FROM region
      |  UNION ALL SELECT 'nation:'||n_nationkey, 'nation', n_name FROM nation
      |  UNION ALL SELECT 'supplier:'||s_suppkey, 'supplier', s_name FROM supplier
      |  UNION ALL SELECT 'customer:'||c_custkey, 'customer', c_name FROM customer
      |  UNION ALL SELECT 'part:'||p_partkey, 'part', p_name FROM part
      |  UNION ALL SELECT 'order:'||o_orderkey, 'order', 'order-'||o_orderkey FROM orders
      |)""".stripMargin

  val edgesSql: String =
    """edges AS (
      |  SELECT 'nation:'||n_nationkey AS src, 'region:'||n_regionkey AS dst, 'in_region' AS rel FROM nation
      |  UNION ALL SELECT 'supplier:'||s_suppkey, 'nation:'||s_nationkey, 'located_in' FROM supplier
      |  UNION ALL SELECT 'customer:'||c_custkey, 'nation:'||c_nationkey, 'located_in' FROM customer
      |  UNION ALL SELECT 'order:'||o_orderkey, 'customer:'||o_custkey, 'placed_by' FROM orders
      |  UNION ALL SELECT DISTINCT 'order:'||l_orderkey, 'part:'||l_partkey, 'contains' FROM lineitem
      |  UNION ALL SELECT DISTINCT 'order:'||l_orderkey, 'supplier:'||l_suppkey, 'supplied_by' FROM lineitem
      |)""".stripMargin

  val withGraph: String = s"WITH $nodesSql,\n$edgesSql"
}
