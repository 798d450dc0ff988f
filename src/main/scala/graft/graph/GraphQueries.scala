package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-planned graph queries over the TPC-H knowledge-graph
  * projection — the bounded-neighborhood portion of cognee's graph
  * surface (get_graph_data / get_neighbors / get_connections (graph_db_interface.py:384) /
  * get_graph_metrics (graph_db_interface.py:305)). Iterative analytics
  * (BFS, components, PageRank) live in GraphAlgos.
  */
object GraphQueries {
  import TpchGraph.withGraph

  /** Node+edge inventory per type/relation (get_graph_data summary). */
  def build(spark: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph(spark, dir)
    g.nodes.groupBy(col("ntype").as("label")).agg(count(lit(1)).as("n"))
      .select(lit("node").as("kind"), col("label"), col("n"))
      .union(
        g.edges.groupBy(col("rel").as("label")).agg(count(lit(1)).as("n"))
          .select(lit("edge").as("kind"), col("label"), col("n")))
  }

  val buildSql: String =
    s"""$withGraph
       |SELECT 'node' AS kind, ntype AS label, count(*) AS n FROM nodes GROUP BY 1, 2
       |UNION ALL
       |SELECT 'edge' AS kind, rel AS label, count(*) AS n FROM edges GROUP BY 1, 2""".stripMargin

  /** Per-node in/out degree. */
  def degree(spark: SparkSession, dir: String): DataFrame =
    TpchGraph(spark, dir).degrees

  val degreeSql: String =
    s"""$withGraph
       |SELECT n.id, n.ntype,
       |  coalesce(o.cnt, 0) AS out_deg, coalesce(i.cnt, 0) AS in_deg
       |FROM nodes n
       |LEFT JOIN (SELECT src, count(*) AS cnt FROM edges GROUP BY 1) o ON n.id = o.src
       |LEFT JOIN (SELECT dst, count(*) AS cnt FROM edges GROUP BY 1) i ON n.id = i.dst""".stripMargin

  /** 1-hop connection triplets around all nation nodes (INSIGHTS /
    * get_connections shape: vector-matched entity set → neighborhood). */
  def neighbors(spark: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph(spark, dir)
    g.connections(col("ntype") === "nation")
  }

  val neighborsSql: String =
    s"""$withGraph
       |SELECT DISTINCT src, rel, dst FROM edges
       |WHERE src LIKE 'nation:%' OR dst LIKE 'nation:%'""".stripMargin

  /** Disconnected nodes of a filtered subgraph (cognee
    * get_disconnected_nodes ∘ get_filtered_graph_data): part nodes with
    * no `contains` edge once edges are restricted to shipments from
    * 2001 on — anti-join against the time-filtered edge endpoints. The
    * shipdate predicate pushes into the lineitem scan. */
  def isolated(spark: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph(spark, dir)
    val active = graft.Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("2001-01-01"))
      .select(concat(lit("part:"), col("l_partkey").cast("string")).as("id")).distinct()
    g.nodes.filter(col("ntype") === "part")
      .join(active, Seq("id"), "left_anti")
      .select(col("id"), col("ntype"))
  }

  val isolatedSql: String =
    s"""$withGraph
       |SELECT id, ntype FROM nodes
       |WHERE ntype = 'part'
       |  AND id NOT IN (SELECT 'part:'||l_partkey FROM lineitem
       |                 WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin

  /** Whole-graph metrics (get_graph_metrics). */
  def metrics(spark: SparkSession, dir: String): DataFrame =
    TpchGraph(spark, dir).metrics

  val metricsSql: String =
    s"""$withGraph, n AS (SELECT count(*) AS num_nodes FROM nodes),
       |e AS (SELECT count(*) AS num_edges FROM edges)
       |SELECT num_nodes, num_edges,
       |  round(num_edges * 2.0 / num_nodes, 4) AS mean_degree,
       |  round(num_edges * 1.0 / (num_nodes * (num_nodes - 1)), 8) AS edge_density
       |FROM n, e""".stripMargin

  /** 3-hop BFS from the suppliers of nation:0 (get_subgraph frontier). */
  def kHop(spark: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph(spark, dir)
    val seeds = g.edges
      .filter(col("rel") === "located_in" && col("dst") === "nation:0" && col("src").startsWith("supplier:"))
      .select(col("src").as("id"))
    GraphAlgos.kHop(g, seeds, 3)
  }

  /** Hop-distance histogram from nation:0 capped at 8 — DataFrame BFS
    * (faster here than the GraphX conversion; hopDistanceHistogram is
    * the Pregel twin, proven equivalent by GraphAlgosSpec). */
  def paths(spark: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph(spark, dir)
    val seeds = g.nodes.filter(col("id") === "nation:0").select(col("id"))
    GraphAlgos.kHop(g, seeds, 8)
      .groupBy(col("depth")).agg(count(lit(1)).as("n_nodes"))
  }

  /** 2-hop ego subgraph around nation:0 (get_subgraph): per-relation
    * edge counts inside the induced subgraph. */
  def subgraph(spark: SparkSession, dir: String): DataFrame = {
    val g = TpchGraph(spark, dir)
    val seeds = g.nodes.filter(col("id") === "nation:0").select(col("id"))
    val ego = GraphAlgos.egoSubgraph(g, seeds, 2)
    ego.edges.groupBy(col("rel")).agg(count(lit(1)).as("n_edges"))
  }

  val subgraphSql: String =
    s"""WITH RECURSIVE ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |ue AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |bfs(id, d) AS (
       |  SELECT 'nation:0', 0
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN ue e ON b.id = e.src WHERE b.d < 2
       |),
       |visited AS (SELECT DISTINCT id FROM bfs)
       |SELECT rel, count(*) AS n_edges
       |FROM edges
       |WHERE src IN (SELECT id FROM visited) AND dst IN (SELECT id FROM visited)
       |GROUP BY rel""".stripMargin

  // The supplier–nation–region subgraph instance is cached per
  // (session, dir) so its instance-lazy GraphX view / vertex index are
  // built once and shared across calls (per-call instances would
  // re-index and re-cache the graph on every invocation).
  private val snrCache = new SessionDirCache[PropertyGraph]((spark, dir) =>
    TpchGraph(spark, dir).subgraphByType(Seq("region", "nation", "supplier")),
    stamp = SessionDirCache.parquetStamp(SessionDirCache.graphTables))

  private[graph] def snrSubgraph(spark: SparkSession, dir: String): PropertyGraph =
    snrCache(spark, dir)

  /** Connected components of the supplier–nation–region subgraph. */
  def components(spark: SparkSession, dir: String): DataFrame =
    snrSubgraph(spark, dir).connectedComponentsDf

  /** Top-100 PageRank (10 fixed iterations, damping 0.85) via GraphX
    * aggregateMessages in fixed-point longs (GraphAlgos.RankUnit);
    * GraphAlgos.pageRank is the DataFrame twin (spec-pinned EQUAL, not
    * merely close — integer recurrence, no float drift). NUMERIC
    * CONTRACT: the fixed-point recurrence deliberately deviates from
    * GraphX `staticPageRank`'s real-valued one — per-edge integral
    * division truncates ≲1e-8 per term, which perturbs the hottest hub
    * ranks by ≲1e-3 vs the double recurrence. That loss is the price of
    * byte-exact engine/oracle parity at any scale (see
    * GraphAlgos.RankUnit); callers expecting GraphX-compatible values
    * should not treat this as a drop-in staticPageRank. Final
    * normalization (ranks sum to N, the staticPageRank convention) is
    * emitted as `rank_e4` — the normalized rank scaled by 1e4 and
    * rounded to a LONG via floor(x*1e4 + 0.5): both engines run the
    * identical IEEE double chain ((r*n)/s)*1e4+0.5 then floor, so the
    * parity surface carries no engine-specific decimal rounding
    * (Spark's round(double,4) goes through BigDecimal shortest-repr
    * HALF_UP while DuckDB scales in floating point — a rank landing on
    * a 4-dp representation boundary could differ in the last digit). */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val ranks = GraphAlgos.pageRankGraphX(TpchGraph(spark, dir), 10)
    val row = ranks.agg(count(lit(1)), sum(col("r"))).head()
    val (n, s) = (row.getLong(0), row.getLong(1))
    ranks
      .select(col("id"),
        floor(col("r").cast("double") * lit(n.toDouble) / lit(s.toDouble)
          * lit(10000.0) + lit(0.5)).as("rank_e4"))
      .orderBy(col("rank_e4").desc, col("id").asc).limit(100)
  }

  /** Triangle census of the part co-purchase projection (parts sharing
    * an order). GraphX TriangleCount over the projected graph. */
  // The co-purchase pair projection is a reusable graph artifact (the
  // same pattern as the cached TpchGraph projection): derive + distinct
  // once per (session, dir), persist, share across queries in a process.
  private val coPurchaseCache = new SessionDirCache[DataFrame]((spark, dir) => {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    GraphAlgos.coOccurrenceEdges(li)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }, stamp = SessionDirCache.parquetStamp(Seq("lineitem")))

  private[graft] def coPurchase(spark: SparkSession, dir: String): DataFrame =
    coPurchaseCache(spark, dir)

  def triangles(spark: SparkSession, dir: String): DataFrame =
    // Measured at sf0.1 (1.196M edges, 1.88M triangles, warm, same
    // run): adjacency-intersection 3.9 s < wedge join 7.2 s < GraphX
    // TriangleCount — the sorted out-neighbor arrays avoid
    // materializing Σdeg_out² wedge rows, and orientation bounds every
    // array at O(√m). All three variants stay in the codebase;
    // GraphAlgosSpec pins them equal.
    GraphAlgos.triangleCountAdj(coPurchase(spark, dir))

  val pathsSql: String =
    s"""WITH RECURSIVE ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |ue AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |bfs(id, d) AS (
       |  SELECT 'nation:0', 0
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN ue e ON b.id = e.src WHERE b.d < 8
       |)
       |SELECT depth, count(*) AS n_nodes FROM (
       |  SELECT id, min(d) AS depth FROM bfs GROUP BY id
       |) GROUP BY depth""".stripMargin

  val kHopSql: String =
    s"""WITH RECURSIVE ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |ue AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |seeds AS (SELECT DISTINCT src AS id FROM edges
       |          WHERE rel = 'located_in' AND dst = 'nation:0' AND src LIKE 'supplier:%'),
       |bfs(id, d) AS (
       |  SELECT id, 0 FROM seeds
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN ue e ON b.id = e.src WHERE b.d < 3
       |)
       |SELECT id, min(d) AS depth FROM bfs GROUP BY id""".stripMargin

  val componentsSql: String =
    s"""WITH RECURSIVE ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |sn AS (SELECT id FROM nodes WHERE ntype IN ('region', 'nation', 'supplier')),
       |sd AS (SELECT src, dst FROM edges
       |       WHERE rel = 'in_region' OR (rel = 'located_in' AND src LIKE 'supplier:%')),
       |se AS (SELECT src, dst FROM sd UNION SELECT dst, src FROM sd),
       |reach(a, b) AS (
       |  SELECT id, id FROM sn
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN se e ON r.b = e.src
       |)
       |SELECT a AS id, min(b) AS component FROM reach GROUP BY a""".stripMargin

  // Fixed-point iteration in GraphAlgos.RankUnit longs (1.0 = 1e8):
  // integral division per edge term and in the damping step — exact,
  // associativity-free, so the engine matches byte-exactly at ANY scale
  // (the double recurrence lost the 9th significant digit of a 60k-term
  // hub sum at sf1, inside the 4-dp rounding contract). The constants
  // are interpolated from GraphAlgos.RankUnit — the ONE source of truth
  // for the unit on both sides of the parity check (a literal here
  // would desync silently if RankUnit ever changed).
  private def prIter(i: Int): String =
    s"""r$i AS (
       |  SELECT n.id, ${15L * GraphAlgos.RankUnit / 100L} + (85 * coalesce(c.contrib, 0)) // 100 AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS id, sum(p.r // d.od) AS contrib
       |    FROM edges e JOIN deg d ON d.src = e.src JOIN r${i - 1} p ON p.id = e.src
       |    GROUP BY e.dst) c ON c.id = n.id
       |)""".stripMargin

  val pageRankSql: String =
    s"""$withGraph,
       |deg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
       |r0 AS (SELECT id, CAST(${GraphAlgos.RankUnit} AS BIGINT) AS r FROM nodes),
       |${(1 to 10).map(prIter).mkString(",\n")}
       |-- GraphX staticPageRank's convention: final ranks sum to numVertices.
       |-- Emitted as the 1e4-scaled LONG floor(x*1e4 + 0.5) over the identical
       |-- IEEE double chain ((r*n)/s)*1e4+0.5 the engine runs — no
       |-- engine-specific decimal rounding in the parity surface.
       |SELECT id, CAST(floor(CAST(r AS DOUBLE)
       |    * CAST((SELECT count(*) FROM nodes) AS DOUBLE)
       |    / CAST((SELECT sum(r) FROM r10) AS DOUBLE)
       |    * 10000 + 0.5) AS BIGINT) AS rank_e4
       |FROM r10
       |ORDER BY rank_e4 DESC, id ASC LIMIT 100""".stripMargin

  /** Personalized PageRank from nation:0 — topic-sensitive relevance
    * over the full property graph
    * ([[GraphAlgos.personalizedPageRankGraphX]], 10 iterations, damping
    * 0.85, undirected walk — the in-memory Pregel path; the DataFrame
    * power iteration with identical recurrence is spec-pinned equal to
    * 1e-9). The graph-RAG ranking primitive: seed the walk at the
    * query's entities, rank by visit mass. Top-50 on the 4dp-rounded
    * score (ties by id) so the cutoff is engine-stable. */
  def personalizedPageRank(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val g = TpchGraph(spark, dir)
    val seeds = g.nodes.filter(col("id") === "nation:0").select(col("id"))
    GraphAlgos.personalizedPageRankGraphX(g, seeds, 10)
      .filter(col("r") > 0)
      .select(col("id"), round(col("r"), 4).as("rank"))
      .orderBy(col("rank").desc, col("id").asc).limit(k)
  }

  private def pprIter(i: Int): String =
    s"""p$i AS (
       |  SELECT coalesce(c.id, sv.id) AS id,
       |    0.15 * coalesce(sv.s, 0.0) + 0.85 * coalesce(c.contrib, 0.0) AS r
       |  FROM (SELECT e.dst AS id, sum(p.r / d.od) AS contrib
       |        FROM ue e JOIN deg d ON d.src = e.src JOIN p${i - 1} p ON p.id = e.src
       |        GROUP BY e.dst) c
       |  FULL OUTER JOIN sv ON sv.id = c.id
       |)""".stripMargin

  val personalizedPageRankSql: String =
    s"""$withGraph,
       |ue AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |deg AS (SELECT src, count(*) AS od FROM ue GROUP BY 1),
       |sv AS (SELECT 'nation:0' AS id, 1.0 AS s),
       |p0 AS (SELECT id, s AS r FROM sv),
       |${(1 to 10).map(pprIter).mkString(",\n")}
       |SELECT id, round(r, 4) AS rank FROM p10 WHERE r > 0
       |ORDER BY rank DESC, id ASC LIMIT 50""".stripMargin

  /** k-core of the co-purchase projection ([[GraphAlgos.kCore]] peeling
    * loop). k = 80 sits just below this corpus's core-collapse
    * threshold (the random-ish co-occurrence graph peels to empty at
    * k ≈ 85), so the demo exercises genuine multi-round cascade
    * peeling (6 rounds at sf0.01) instead of a one-round no-op; the
    * oracle unrolls the same 12 fixed rounds the loop is bounded to
    * (the graph_pagerank fixed-iteration precedent — converged rounds
    * are no-ops, so early exit at stability is plan-equivalent). */
  def kCore(spark: SparkSession, dir: String): DataFrame =
    GraphAlgos.kCore(coPurchase(spark, dir), k = 80, maxRounds = 12)

  val kCoreSql: String = {
    val rounds = 12
    // AS MATERIALIZED on every CTE: DuckDB inlines plain CTEs per
    // reference, which makes the alive chain expand 2^rounds-fold
    // (each step references its predecessor twice).
    val steps = (1 to rounds).map { r =>
      s"""alive$r AS MATERIALIZED (
         |  SELECT u.a AS id FROM und u
         |  JOIN alive${r - 1} s ON u.a = s.id JOIN alive${r - 1} t ON u.b = t.id
         |  GROUP BY u.a HAVING count(*) >= 80
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |),
       |und AS MATERIALIZED (SELECT x AS a, y AS b FROM pairs UNION ALL SELECT y, x FROM pairs),
       |alive0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM und),
       |$steps
       |SELECT u.a AS id, CAST(count(*) AS BIGINT) AS core_degree
       |FROM und u JOIN alive$rounds s ON u.a = s.id JOIN alive$rounds t ON u.b = t.id
       |GROUP BY u.a""".stripMargin
  }

  val trianglesSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |)
      |SELECT (SELECT count(*)
      |        FROM pairs ab
      |        JOIN pairs ac ON ac.x = ab.x AND ac.y > ab.y
      |        JOIN pairs bc ON bc.x = ab.y AND bc.y = ac.y) AS n_triangles,
      |       (SELECT count(*) FROM pairs) AS n_edges""".stripMargin

  /** Named-nodeset subgraph (graph_db_interface.py:369
    * get_nodeset_subgraph): the NATION_3/NATION_7 node set plus 1-hop
    * neighbors, summarized as per-(ntype, rel) edge-endpoint counts so
    * the result stays small and oracle-stable. */
  def nodesetSubgraph(spark: SparkSession, dir: String): DataFrame = {
    val sub = TpchGraph(spark, dir).nodesetSubgraph("nation", Seq("NATION_3", "NATION_7"))
    sub.edges.groupBy(col("rel")).agg(count(lit(1)).as("n_edges"))
  }

  val nodesetSubgraphSql: String =
    s"""$withGraph,
       |seeds AS (SELECT id FROM nodes WHERE ntype = 'nation' AND name IN ('NATION_3', 'NATION_7')),
       |keep AS (
       |  SELECT id FROM seeds
       |  UNION SELECT dst FROM edges WHERE src IN (SELECT id FROM seeds)
       |  UNION SELECT src FROM edges WHERE dst IN (SELECT id FROM seeds)
       |)
       |SELECT rel, count(*) AS n_edges FROM edges
       |WHERE src IN (SELECT id FROM keep) AND dst IN (SELECT id FROM keep)
       |GROUP BY rel""".stripMargin

  /** Export dump summarized (kind → element count): drives the JSONL
    * serialization end-to-end (the count only admits rows whose line
    * actually serialized as the right kind) without re-parsing the JSON
    * it just produced — kind rides beside the line. */
  def export(spark: SparkSession, dir: String): DataFrame =
    GraphExport.toJsonLinesKinded(TpchGraph(spark, dir))
      .filter(col("line").startsWith("{\"kind\":"))
      .groupBy(col("kind")).agg(count(lit(1)).as("n"))

  val exportSql: String =
    s"""$withGraph
       |SELECT 'node' AS kind, count(*) AS n FROM nodes
       |UNION ALL SELECT 'edge', count(*) FROM edges""".stripMargin

  /** get_formatted_graph_data over the TPC-H knowledge graph — see
    * [[GraphExport.toFormatted]]. Every node row checks the label rule
    * and the canonicalized filtered-props fingerprint against the
    * oracle's per-type closed form; edge labels check as counts. */
  def formatted(spark: SparkSession, dir: String): DataFrame =
    GraphExport.toFormatted(TpchGraph(spark, dir))

  val formattedSql: String =
    s"""WITH ${TpchGraph.edgesSql}
       |SELECT 'node' AS kind, id, label, ntype, n, props_fp FROM (
       |  SELECT 'region:'||r_regionkey AS id, r_name AS label, 'region' AS ntype,
       |    CAST(0 AS BIGINT) AS n, md5('') AS props_fp FROM region
       |  UNION ALL SELECT 'nation:'||n_nationkey, n_name, 'nation',
       |    1, md5('regionkey='||n_regionkey) FROM nation
       |  UNION ALL SELECT 'supplier:'||s_suppkey, s_name, 'supplier',
       |    1, md5('nationkey='||s_nationkey) FROM supplier
       |  UNION ALL SELECT 'customer:'||c_custkey, c_name, 'customer',
       |    1, md5('mktsegment='||c_mktsegment) FROM customer
       |  UNION ALL SELECT 'part:'||p_partkey, p_name, 'part',
       |    1, md5('brand='||p_brand) FROM part
       |  UNION ALL SELECT 'order:'||o_orderkey, 'order-'||o_orderkey, 'order',
       |    2, md5('priority='||o_orderpriority||'&status='||o_orderstatus) FROM orders
       |)
       |UNION ALL
       |SELECT 'edge_label', NULL, rel, NULL, count(*), NULL FROM edges GROUP BY rel""".stripMargin

  /** Mutation round-trip (add_nodes/add_edges/delete_nodes as plans):
    * add two custom nodes (plus a duplicate of an existing id, which
    * keep-first ignores) and an edge between them, then delete one —
    * its incident edge cascades out. Summarized as per-type node counts
    * plus the surviving edge total. */
  def mutations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = TpchGraph(spark, dir)
    val g2 = g
      .addNodes(Seq(
        ("custom:1", "custom", "one"),
        ("custom:2", "custom", "two"),
        ("nation:0", "nation", "duplicate-ignored")).toDF("id", "ntype", "name"))
      .addEdges(Seq(("custom:1", "custom:2", "linked")).toDF("src", "dst", "rel"))
      .deleteNodes(Seq("custom:2").toDF("id"))
    g2.nodes.groupBy(col("ntype")).agg(count(lit(1)).as("n"))
      .union(g2.edges.agg(count(lit(1)).as("n")).select(lit("__edges__").as("ntype"), col("n")))
  }

  val mutationsSql: String =
    s"""$withGraph
       |SELECT ntype, count(*) AS n FROM nodes GROUP BY ntype
       |UNION ALL SELECT 'custom', 1
       |UNION ALL SELECT '__edges__', (SELECT count(*) FROM edges)""".stripMargin

  /** Mutation AUDIT LEDGER round-trip (the reference's
    * record_graph_changes decorator, graph_db_interface.py:22, writing
    * graph_relationship_ledger rows around every mutation — see
    * [[GraphLedger]]): the [[mutations]] script extended with a
    * corpus-derived bulk merge (one brand node per part row — the
    * ledger must carry table-sized increments, not just literals) and
    * a feedback-weight bump, all through the ledgered wrapper. Output:
    * per-(op, kind, source_function) row + distinct-entity counts,
    * plus two census rows over the RESULTING graph proving the wrapper
    * delegated every mutation (not just logged it). */
  def mutationLedger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brands = graft.Tables.load(spark, dir, "part")
      .select(concat(lit("brand:"), col("p_brand")).as("id"),
        lit("brand").as("ntype"), col("p_brand").as("name"))
    val fin = GraphLedger(TpchGraph(spark, dir))
      .addNodes(Seq(
        ("custom:1", "custom", "one"),
        ("custom:2", "custom", "two"),
        ("nation:0", "nation", "duplicate-ignored")).toDF("id", "ntype", "name"))
      .addEdges(Seq(("custom:1", "custom:2", "linked")).toDF("src", "dst", "rel"))
      .mergeNodes(brands)
      .applyFeedbackWeight(Seq(("customer:1", 1.0), ("customer:2", -0.5)).toDF("id", "weight"))
      .deleteNodes(Seq("custom:2").toDF("id"))
    val census = fin.entries.groupBy(col("op"), col("kind"), col("source_function"))
      .agg(count(lit(1)).as("n"), countDistinct(col("entity_id")).as("n_entities"))
    val graphRows = fin.graph.nodes.agg(count(lit(1)).as("c"))
      .select(lit("__nodes__").as("op"), lit("graph").as("kind"),
        lit("census").as("source_function"), col("c").as("n"), col("c").as("n_entities"))
      .union(fin.graph.edges.agg(count(lit(1)).as("c"))
        .select(lit("__edges__").as("op"), lit("graph").as("kind"),
          lit("census").as("source_function"), col("c").as("n"), col("c").as("n_entities")))
    census.union(graphRows)
  }

  val mutationLedgerSql: String =
    s"""$withGraph
       |SELECT 'add_node' AS op, 'node' AS kind, 'addNodes' AS source_function,
       |  CAST(3 AS BIGINT) AS n, CAST(3 AS BIGINT) AS n_entities
       |UNION ALL SELECT 'add_edge', 'edge', 'addEdges', 1, 1
       |UNION ALL SELECT 'merge_node', 'node', 'mergeNodes',
       |  (SELECT count(*) FROM part), (SELECT count(DISTINCT p_brand) FROM part)
       |UNION ALL SELECT 'feedback_weight', 'edge', 'applyFeedbackWeight', 2, 2
       |UNION ALL SELECT 'delete_node', 'node', 'deleteNodes', 1, 1
       |UNION ALL SELECT '__nodes__', 'graph', 'census',
       |  (SELECT count(*) FROM nodes) + 2 + (SELECT count(DISTINCT p_brand) FROM part) - 1,
       |  (SELECT count(*) FROM nodes) + 2 + (SELECT count(DISTINCT p_brand) FROM part) - 1
       |UNION ALL SELECT '__edges__', 'graph', 'census',
       |  (SELECT count(*) FROM edges), (SELECT count(*) FROM edges)""".stripMargin

  /** The optional half of cognee's get_graph_metrics
    * (kuzu/adapter.py:1353 include_optional=True; GraphMetrics model:
    * num_connected_components, sizes_of_connected_components,
    * num_selfloops, diameter, avg_shortest_path_length, avg_clustering —
    * neo4j_metrics_utils.py:129,:161). Exact diameter / path length /
    * clustering are all-pairs computations, so they run on the bounded
    * supplier–nation–region subgraph (the reference runs them on its
    * whole graph, which is similarly bounded); component structure and
    * self-loops are single-shuffle aggregates. One summary row. */
  def metricsFull(spark: SparkSession, dir: String): DataFrame = {
    val g = snrSubgraph(spark, dir)
    val counts = g.nodes.agg(count(lit(1)).as("num_nodes"))
      .crossJoin(g.edges.agg(count(lit(1)).as("num_edges")))
      .crossJoin(g.edges.filter(col("src") === col("dst")).agg(count(lit(1)).as("num_selfloops")))
    val ccSizes = g.connectedComponentsDf
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
    val ccStats = ccSizes.agg(count(lit(1)).as("num_components"),
      max(col("sz")).as("largest_component"), min(col("sz")).as("smallest_component"))
    val pathStats = g.allPairsDistancesDf.filter(col("depth") > 0)
      .agg(max(col("depth")).cast("long").as("diameter"),
        round(avg(col("depth")), 4).as("avg_path_len"))
    val coeff = g.nodes.select(col("id").as("v"))
      .join(g.localTrianglesDf, Seq("v"), "left")
      .select(when(coalesce(col("deg"), lit(0L)) >= 2,
          col("tri") * lit(2.0) / (col("deg") * (col("deg") - lit(1L))))
        .otherwise(lit(0.0)).as("c"))
      .agg(round(avg(col("c")), 4).as("avg_clustering"))
    counts.crossJoin(ccStats).crossJoin(pathStats).crossJoin(coeff)
  }

  val metricsFullSql: String =
    s"""WITH RECURSIVE ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |sn AS (SELECT id FROM nodes WHERE ntype IN ('region', 'nation', 'supplier')),
       |sd AS (SELECT src, dst FROM edges
       |       WHERE rel = 'in_region' OR (rel = 'located_in' AND src LIKE 'supplier:%')),
       |ue AS (SELECT src, dst FROM sd UNION SELECT dst, src FROM sd),
       |reach(a, b) AS (
       |  SELECT id, id FROM sn
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src
       |),
       |csz AS (SELECT component, count(*) AS sz
       |        FROM (SELECT a AS id, min(b) AS component FROM reach GROUP BY a) GROUP BY 1),
       |bfs(s, id, d) AS (
       |  SELECT id, id, 0 FROM sn
       |  UNION
       |  SELECT b.s, e.dst, b.d + 1 FROM bfs b JOIN ue e ON b.id = e.src WHERE b.d < 32
       |),
       |dist AS (SELECT s, id, min(d) AS d FROM bfs GROUP BY 1, 2),
       |ce AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y FROM sd WHERE src <> dst),
       |nbr AS (SELECT x AS v, y AS w FROM ce UNION ALL SELECT y, x FROM ce),
       |deg AS (SELECT v, count(*) AS deg FROM nbr GROUP BY 1),
       |triv AS (SELECT a.v, count(*) AS tri FROM nbr a
       |         JOIN nbr b ON a.v = b.v AND a.w < b.w
       |         JOIN ce c ON c.x = a.w AND c.y = b.w GROUP BY a.v),
       |coeff AS (SELECT n.id,
       |            CASE WHEN coalesce(d.deg, 0) >= 2
       |                 THEN 2.0 * coalesce(t.tri, 0) / (d.deg * (d.deg - 1))
       |                 ELSE 0.0 END AS c
       |          FROM sn n LEFT JOIN deg d ON d.v = n.id LEFT JOIN triv t ON t.v = n.id)
       |SELECT
       |  (SELECT count(*) FROM sn) AS num_nodes,
       |  (SELECT count(*) FROM sd) AS num_edges,
       |  (SELECT count(*) FROM sd WHERE src = dst) AS num_selfloops,
       |  (SELECT count(*) FROM csz) AS num_components,
       |  (SELECT max(sz) FROM csz) AS largest_component,
       |  (SELECT min(sz) FROM csz) AS smallest_component,
       |  (SELECT CAST(max(d) AS BIGINT) FROM dist WHERE d > 0) AS diameter,
       |  (SELECT round(avg(d), 4) FROM dist WHERE d > 0) AS avg_path_len,
       |  (SELECT round(avg(c), 4) FROM coeff) AS avg_clustering""".stripMargin

  /** Relational-schema-as-graph (reference: cognee/tasks/schema/
    * ingest_database_schema.py — SchemaTable nodes + SchemaRelationship
    * edges from a database's catalog). Tables become nodes carrying
    * their live parquet column count (schema introspection is
    * inherently driver-side metadata); the TPC-H foreign-key topology
    * becomes the edge fan-out. The oracle re-reads the same counts from
    * DuckDB's information_schema over the same files — a genuine
    * cross-engine catalog check. */
  def schemaGraph(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // events carries TIMESTAMP(NANOS) — nanosAsLong is a GraftSession.tune
    // default (and a loadEvents guard), never set inside a query body.
    val fkOut = Map("nation" -> 1L, "customer" -> 1L, "supplier" -> 1L,
      "orders" -> 1L, "lineitem" -> 3L)
    graft.Tables.names.map { t =>
      (t, graft.Tables.load(spark, dir, t).schema.fields.length.toLong, fkOut.getOrElse(t, 0L))
    }.toDF("table_name", "n_columns", "n_fks_out")
  }

  val schemaGraphSql: String =
    """WITH cols AS (
      |  SELECT table_name, count(*) AS n_columns
      |  FROM information_schema.columns
      |  WHERE table_name IN ('region','nation','customer','supplier','part','orders',
      |                       'lineitem','events','documents','embeddings')
      |  GROUP BY 1
      |),
      |fks(table_name, n) AS (VALUES
      |  ('nation', 1), ('customer', 1), ('supplier', 1), ('orders', 1), ('lineitem', 3))
      |SELECT c.table_name, CAST(c.n_columns AS BIGINT) AS n_columns,
      |  CAST(coalesce(f.n, 0) AS BIGINT) AS n_fks_out
      |FROM cols c LEFT JOIN fks f USING (table_name)""".stripMargin

  // -------------------------------------------------------------------
  // Events → knowledge graph (reference: cognee/tasks/temporal_graph/
  // extract_knowledge_graph_from_events.py:8 + enrich_events.py — the
  // Event datapoints extracted from document chunks are wired into the
  // entity graph as event nodes with time/involvement edges, which the
  // temporal retrievers then traverse). Spark-first: the extraction
  // relation (TextOps.temporalExtract) projects into event/doc/day node
  // and edge increments, merged into the base projection through the
  // BULK mutation API (mergeNodes/mergeEdges) — the extraction is
  // corpus-sized, so the interactive addNodes broadcast contract
  // doesn't apply.
  // -------------------------------------------------------------------

  private def eventId = concat(lit("event:"), col("doc_id"), lit(":"), col("pos"))

  private val temporalGraphCache = new SessionDirCache[PropertyGraph]((spark, dir) => {
    // the extraction feeds five increment projections below — compute
    // its token scan once (eager checkpoint, lineage released)
    val ev = graft.operators.TextOps.temporalExtract(spark, dir).localCheckpoint(true)
    val emptyBag = map().cast("map<string,string>")
    val eventNodes = ev.select(eventId.as("id"), lit("event").as("ntype"),
      col("event").as("name"),
      map_from_arrays(array(lit("ts_sec"), lit("day")),
        array(col("ts_sec").cast("string"), col("day"))).as("props"))
    val docNodes = ev.select(col("doc_id")).distinct()
      .select(concat(lit("doc:"), col("doc_id")).as("id"),
        lit("document").as("ntype"), col("doc_id").cast("string").as("name"),
        emptyBag.as("props"))
    val dayNodes = ev.select(col("day")).distinct()
      .select(concat(lit("day:"), col("day")).as("id"),
        lit("day").as("ntype"), col("day").as("name"), emptyBag.as("props"))
    val occurred = ev.select(eventId.as("src"),
      concat(lit("doc:"), col("doc_id")).as("dst"), lit("occurred_in").as("rel"),
      emptyBag.as("props"))
    val happened = ev.select(eventId.as("src"),
      concat(lit("day:"), col("day")).as("dst"), lit("happened_at").as("rel"),
      map_from_arrays(array(lit("ts_sec")), array(col("ts_sec").cast("string"))).as("props"))
    TpchGraph(spark, dir)
      .mergeNodes(eventNodes.unionByName(docNodes).unionByName(dayNodes))
      .mergeEdges(occurred.unionByName(happened))
  }, stamp = SessionDirCache.parquetStamp(SessionDirCache.graphTables ++ Seq("documents")))

  /** The TPC-H projection with the extracted temporal event graph merged
    * in — the relation the temporal-awareness retrievers traverse. */
  def temporalGraph(spark: SparkSession, dir: String): PropertyGraph =
    temporalGraphCache(spark, dir)

  /** Per-day activity read back THROUGH the merged graph (not the
    * extraction relation): happened_at edges resolve the day node's
    * name, occurred_in edges count distinct linked documents — so the
    * oracle check covers the node/edge merge end-to-end. */
  def temporalGraphBuild(spark: SparkSession, dir: String): DataFrame = {
    val g = temporalGraph(spark, dir)
    val happened = g.edges.filter(col("rel") === "happened_at")
      .select(col("src").as("event_id"), col("dst").as("day_id"))
    val occurred = g.edges.filter(col("rel") === "occurred_in")
      .select(col("src").as("event_id"), col("dst").as("doc_node"))
    val days = g.nodes.filter(col("ntype") === "day")
      .select(col("id").as("day_id"), col("name").as("day"))
    happened.join(occurred, Seq("event_id"))
      .join(days, Seq("day_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("doc_node")).as("n_docs"))
  }

  val temporalGraphBuildSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos, toks[CAST(i AS INT) + 1] AS tok
      |  FROM t, unnest(range(len(toks))) AS u(i)
      |),
      |f AS (
      |  SELECT doc_id, pos,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) AS h4,
      |    CAST(list_sum(list_transform(range(8),
      |      i -> (strpos('0123456789abcdef', substr(md5(doc_id || ':' || pos), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 7 - i))) AS BIGINT) AS h8
      |  FROM tok
      |),
      |ev AS (
      |  SELECT doc_id,
      |    strftime(TIMESTAMP '2024-01-01 00:00:00' + ((h8 % 2678400) * INTERVAL 1 SECOND), '%Y-%m-%d') AS day
      |  FROM f WHERE h4 % 11 = 0
      |)
      |SELECT day, count(*) AS n_events, count(DISTINCT doc_id) AS n_docs
      |FROM ev GROUP BY day""".stripMargin

  /** Chunk-graph hygiene (reference: tasks/chunks/
    * remove_disconnected_chunks.py): over the document→chunk graph
    * (has_chunk edges doc→chunk, next_chunk edges chunk→successor),
    * chunks with NO next_chunk predecessor are obsolete and deleted
    * (with their incident edges, the delete_nodes cascade), then fully
    * disconnected nodes (get_disconnected_nodes) are deleted. Both
    * passes are keyed anti-joins — no driver loop over documents like
    * the reference's per-document successor walk. Returns the surviving
    * census by kind. */
  def pruneChunks(spark: SparkSession, dir: String): DataFrame = {
    // the extraction feeds four projections and two anti-join cascades —
    // compute the token scan once (eager checkpoint, lineage released)
    val ch = graft.operators.TextOps.chunk(spark, dir).localCheckpoint(true)
    def chunkId(idx: Column) = concat(lit("chunk:"), col("doc_id"), lit(":"), idx)
    val docNodes = ch.select(col("doc_id")).distinct()
      .select(concat(lit("doc:"), col("doc_id")).as("id"),
        lit("document").as("ntype"), col("doc_id").cast("string").as("name"))
    val chunkNodes = ch.select(chunkId(col("chunk_idx")).as("id"),
      lit("chunk").as("ntype"), col("chunk_hash").as("name"))
    val hasChunk = ch.select(concat(lit("doc:"), col("doc_id")).as("src"),
      chunkId(col("chunk_idx")).as("dst"), lit("has_chunk").as("rel"))
    val nextChunk = ch.filter(col("chunk_idx") > 0)
      .select(chunkId(col("chunk_idx") - 1).as("src"),
        chunkId(col("chunk_idx")).as("dst"), lit("next_chunk").as("rel"))
    val g0 = PropertyGraph(docNodes.union(chunkNodes), hasChunk.union(nextChunk))
    // obsolete: has_chunk successors lacking a next_chunk predecessor.
    // No distinct()s: has_chunk/next_chunk targets are one-edge-per-
    // chunk already, and an anti-join's right side needs no dedup.
    val chunkIds = g0.edges.filter(col("rel") === "has_chunk").select(col("dst").as("id"))
    val withPred = g0.edges.filter(col("rel") === "next_chunk").select(col("dst").as("id"))
    val g1d = g0.deleteNodes(chunkIds.join(withPred, Seq("id"), "left_anti"))
    // Checkpoint between the two mutation passes: the second pass reads
    // g1's relations four times (touched union, node anti-join, census),
    // and composed lazy deletes re-inline the whole anti-join cascade at
    // every reference — a ~1.5k-node physical plan whose planning/codegen
    // dwarfs the (tiny) data. Same contract as the reference: delete_nodes
    // commits before get_disconnected_nodes runs.
    val g1 = PropertyGraph(g1d.nodes.localCheckpoint(true), g1d.edges.localCheckpoint(true))
    // fully disconnected survivors of the cascade
    val touched = g1.edges.select(col("src").as("id"))
      .union(g1.edges.select(col("dst").as("id")))
    val g2 = g1.deleteNodes(g1.nodes.select(col("id")).join(touched, Seq("id"), "left_anti"))
    g2.nodes.groupBy(concat(lit("node:"), col("ntype")).as("kind"))
      .agg(count(lit(1)).as("n"))
      .unionByName(g2.edges.groupBy(concat(lit("edge:"), col("rel")).as("kind"))
        .agg(count(lit(1)).as("n")))
  }

  /** Closed form: a document with nc chunks loses chunk 0 (the only
    * chunk with no next_chunk predecessor) and, when nc = 1, becomes
    * disconnected and is deleted too. Zero-count kinds are absent on
    * both sides. */
  val pruneChunksSql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(ceil(len(string_split(text, ' ')) / 64.0) AS BIGINT) AS nc
      |  FROM documents
      |),
      |k AS (SELECT doc_id, nc FROM t WHERE nc >= 2)
      |SELECT kind, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'node:document' AS kind, count(*) AS n FROM k
      |  UNION ALL SELECT 'node:chunk', COALESCE(sum(nc - 1), 0) FROM k
      |  UNION ALL SELECT 'edge:has_chunk', COALESCE(sum(nc - 1), 0) FROM k
      |  UNION ALL SELECT 'edge:next_chunk', COALESCE(sum(nc - 2), 0) FROM k
      |) WHERE n > 0""".stripMargin

  /** Edge-type census (reference: tasks/storage/index_graph_edges.py —
    * counts distinct relationship types from the graph engine into
    * EdgeType data points and indexes them in the vector store; the
    * VectorStore spec covers the indexing leg). One hash aggregate over
    * the edge relation. */
  def edgeTypes(spark: SparkSession, dir: String): DataFrame =
    TpchGraph(spark, dir).edges
      .groupBy(col("rel").as("relationship_name"))
      .agg(count(lit(1)).as("number_of_edges"))

  val edgeTypesSql: String =
    s"""${TpchGraph.withGraph}
       |SELECT rel AS relationship_name, count(*) AS number_of_edges
       |FROM edges GROUP BY 1""".stripMargin

  /** Adamic-Adar link prediction over the bounded supplier–nation–
    * region subgraph (the metricsFull contract): for every NON-adjacent
    * pair sharing ≥ 1 neighbor, Σ 1/ln(deg(common neighbor)) — the
    * standard common-neighbor score a graph-DB user asks of a
    * recommendation surface. Wedge join on the shared neighbor + an
    * anti-join against existing edges; no all-pairs anywhere. Every
    * common neighbor has deg ≥ 2 by construction, so ln(deg) > 0. The
    * score floor-truncates BEFORE the top-k ordering (deterministic
    * under last-ulp summation-order differences); ties break on the
    * pair. */
  /** Shared link-prediction scaffolding over the bounded SNR subgraph:
    * canonical self-loop-free edge set (x<y), both-orientation neighbor
    * view, and degrees. Backs [[adamicAdar]] and [[neighborJaccard]]. */
  private def snrNeighborView(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val g = snrSubgraph(spark, dir)
    val e = g.edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("x"),
        greatest(col("src"), col("dst")).as("y")).distinct()
    val nbr = e.select(col("x").as("v"), col("y").as("w"))
      .union(e.select(col("y").as("v"), col("x").as("w")))
    val deg = nbr.groupBy(col("v")).agg(count(lit(1)).as("deg"))
    (e, nbr, deg)
  }

  def adamicAdar(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val (e, nbr, deg) = snrNeighborView(spark, dir)
    nbr.select(col("v"), col("w").as("u"))
      .join(nbr.select(col("v"), col("w")), Seq("v"))
      .filter(col("u") < col("w"))
      .join(e, col("u") === col("x") && col("w") === col("y"), "left_anti")
      .join(deg, Seq("v"))
      .groupBy(col("u"), col("w"))
      .agg((floor(sum(lit(1.0) / log(col("deg"))) * 10000) / 10000).as("aa_score"),
        count(lit(1)).as("n_common"))
      .orderBy(col("aa_score").desc, col("u").asc, col("w").asc).limit(k)
  }

  val adamicAdarSql: String =
    s"""WITH ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |sd AS (SELECT src, dst FROM edges
       |       WHERE rel = 'in_region' OR (rel = 'located_in' AND src LIKE 'supplier:%')),
       |ce AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y FROM sd WHERE src <> dst),
       |nbr AS (SELECT x AS v, y AS w FROM ce UNION ALL SELECT y, x FROM ce),
       |deg AS (SELECT v, count(*) AS deg FROM nbr GROUP BY 1),
       |wedge AS (
       |  SELECT a.w AS u, b.w AS w, a.v
       |  FROM nbr a JOIN nbr b ON a.v = b.v AND a.w < b.w
       |  WHERE NOT EXISTS (SELECT 1 FROM ce WHERE ce.x = a.w AND ce.y = b.w)
       |)
       |SELECT wedge.u, wedge.w,
       |  floor(sum(1.0 / ln(deg.deg)) * 10000) / 10000 AS aa_score,
       |  count(*) AS n_common
       |FROM wedge JOIN deg ON wedge.v = deg.v
       |GROUP BY 1, 2
       |ORDER BY aa_score DESC, u ASC, w ASC LIMIT 20""".stripMargin

  /** Neighbor-set Jaccard link prediction — the degree-normalized
    * companion to [[adamicAdar]] (a graph-DB node-similarity
    * primitive): for non-adjacent pairs sharing ≥1 neighbor,
    * J(u,w) = |N(u)∩N(w)| / |N(u)∪N(w)|, with the union by
    * inclusion–exclusion (deg_u + deg_w − common) so no per-pair set
    * materializes. Same wedge join + anti-join scaffolding; the two
    * degree joins key on each endpoint. Single-division doubles —
    * bitwise identical across engines — floor-truncated at 4dp before
    * the top-k. */
  def neighborJaccard(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val (e, nbr, deg) = snrNeighborView(spark, dir)
    val common = nbr.select(col("v"), col("w").as("u"))
      .join(nbr.select(col("v"), col("w")), Seq("v"))
      .filter(col("u") < col("w"))
      .join(e, col("u") === col("x") && col("w") === col("y"), "left_anti")
      .groupBy(col("u"), col("w")).agg(count(lit(1)).as("n_common"))
    common
      .join(deg.select(col("v").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("v").as("w"), col("deg").as("dw")), Seq("w"))
      .select(col("u"), col("w"),
        (floor(col("n_common").cast("double") * 10000
          / (col("du") + col("dw") - col("n_common"))) / 10000).as("jaccard"),
        col("n_common"))
      .orderBy(col("jaccard").desc, col("u").asc, col("w").asc).limit(k)
  }

  val neighborJaccardSql: String =
    s"""WITH ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |sd AS (SELECT src, dst FROM edges
       |       WHERE rel = 'in_region' OR (rel = 'located_in' AND src LIKE 'supplier:%')),
       |ce AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y FROM sd WHERE src <> dst),
       |nbr AS (SELECT x AS v, y AS w FROM ce UNION ALL SELECT y, x FROM ce),
       |deg AS (SELECT v, count(*) AS deg FROM nbr GROUP BY 1),
       |common AS (
       |  SELECT a.w AS u, b.w AS w, count(*) AS n_common
       |  FROM nbr a JOIN nbr b ON a.v = b.v AND a.w < b.w
       |  WHERE NOT EXISTS (SELECT 1 FROM ce WHERE ce.x = a.w AND ce.y = b.w)
       |  GROUP BY 1, 2
       |)
       |SELECT c.u, c.w,
       |  floor(c.n_common::DOUBLE * 10000 / (du.deg + dw.deg - c.n_common)) / 10000 AS jaccard,
       |  c.n_common
       |FROM common c JOIN deg du ON du.v = c.u JOIN deg dw ON dw.v = c.w
       |ORDER BY jaccard DESC, u ASC, w ASC LIMIT 20""".stripMargin

  /** Harmonic centrality (Boldi–Vigna; the closeness variant that is
    * well-defined on disconnected graphs) of the hub nodes (nations +
    * regions) in the supplier–nation–region subgraph:
    * H(v) = Σ_{u≠v reachable} 1/d(v,u). One multi-source BFS advances
    * ALL seeds in a single frontier keyed by seed
    * ([[GraphAlgos.multiSourceDistances]]) — the seed set is bounded
    * (≤30 hubs) while suppliers scale with SF, so the frontier stays
    * seeds × nodes-reachable, never all-pairs. The per-seed sum runs
    * over the ≤8-row distance histogram (count_d / d), floor-truncated
    * at 4dp before the top-k ordering. */
  def harmonicCentrality(spark: SparkSession, dir: String, k: Int = 20,
      maxDepth: Int = 8): DataFrame = {
    val g = snrSubgraph(spark, dir)
    val seeds = g.nodes.filter(col("ntype").isin("nation", "region")).select(col("id"))
    val dist = GraphAlgos.multiSourceDistances(g, seeds, maxDepth)
    val hist = dist.filter(col("depth") > 0)
      .groupBy(col("seed"), col("depth")).agg(count(lit(1)).as("n"))
    hist.groupBy(col("seed").as("id"))
      .agg((floor(sum(col("n").cast("double") / col("depth")) * 10000) / 10000).as("harmonic"),
        sum(col("n")).as("n_reachable"))
      .orderBy(col("harmonic").desc, col("id").asc).limit(k)
  }

  /** Top-k sampled Brandes betweenness over the supplier–nation–region
    * subgraph, seeded at the nation+region hubs (the [[harmonicCentrality]]
    * seed set): the bridging-node ranking (nations dominate — every
    * supplier↔region shortest path passes its nation). Hash-checked
    * against [[betweennessSql]] — the σ/δ recurrences at fixed maxDepth
    * unroll into staged MATERIALIZED CTEs exactly like the kcore/
    * pagerank precedent; GraphAlgosSpec additionally replays textbook
    * Brandes driver-side and pins every δ to 1e-9. */
  def betweennessCentrality(spark: SparkSession, dir: String, k: Int = 20,
      maxDepth: Int = 8): DataFrame = {
    val g = snrSubgraph(spark, dir)
    val seeds = g.nodes.filter(col("ntype").isin("nation", "region")).select(col("id"))
    GraphAlgos.betweenness(g, seeds, maxDepth)
      .select(col("id"), (floor(col("betweenness") * 10000) / 10000).as("betweenness"))
      .orderBy(col("betweenness").desc, col("id").asc).limit(k)
  }

  /** Unrolled-Brandes oracle: forward σ levels lvl0..lvl{maxDepth}
    * (BFS levels keyed by seed; level d+1 anti-checks only levels d and
    * d−1 — in an undirected graph a frontier edge can't reach depth
    * ≤ d−2, the same two-level anti-join the Spark loop uses), then
    * backward δ levels delta{maxDepth}..delta1 via the successor
    * recurrence δ(v) = Σ σ(v)/σ(w)·(1+δ(w)). Every CTE is MATERIALIZED
    * (the kcore lesson: DuckDB inlines plain CTEs per reference, and
    * each δ level references its predecessor once per successor join —
    * unmaterialized this expands exponentially). Levels past the true
    * depth are empty and contribute nothing; the accumulator unions
    * δ levels 1..maxDepth−1, which can add betweenness-0 rows the
    * Spark loop's deepest-level cutoff drops — invisible under the
    * top-20-by-positive-betweenness limit (30 hub nodes rank first). */
  val betweennessSql: String = {
    val maxDepth = 8
    val fwd = (1 to maxDepth).map { d =>
      val excl =
        if (d == 1)
          s"  WHERE NOT EXISTS (SELECT 1 FROM lvl0 p WHERE p.seed = f.seed AND p.id = e.dst)"
        else
          s"""  WHERE NOT EXISTS (SELECT 1 FROM lvl${d - 1} p WHERE p.seed = f.seed AND p.id = e.dst)
             |    AND NOT EXISTS (SELECT 1 FROM lvl${d - 2} q WHERE q.seed = f.seed AND q.id = e.dst)""".stripMargin
      s"""lvl$d AS MATERIALIZED (
         |  SELECT f.seed, e.dst AS id, sum(f.sigma) AS sigma
         |  FROM lvl${d - 1} f JOIN ue e ON f.id = e.src
         |$excl
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(",\n")
    val bwd = (maxDepth - 1 to 1 by -1).map { lvl =>
      s"""delta$lvl AS MATERIALIZED (
         |  SELECT l.seed, l.id, l.sigma, coalesce(c.delta, CAST(0 AS DOUBLE)) AS delta
         |  FROM lvl$lvl l LEFT JOIN (
         |    SELECT v.seed, v.id, sum(v.sigma / w.sigma * (CAST(1 AS DOUBLE) + w.delta)) AS delta
         |    FROM lvl$lvl v JOIN ue e ON v.id = e.src
         |    JOIN delta${lvl + 1} w ON w.seed = v.seed AND w.id = e.dst
         |    GROUP BY 1, 2
         |  ) c ON c.seed = l.seed AND c.id = l.id
         |)""".stripMargin
    }.mkString(",\n")
    val acc = (1 to maxDepth - 1).map(l => s"SELECT id, delta FROM delta$l")
      .mkString("\n  UNION ALL ")
    s"""WITH ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |sn AS (SELECT id FROM nodes WHERE ntype IN ('nation', 'region')),
       |sd AS (SELECT src, dst FROM edges
       |       WHERE rel = 'in_region' OR (rel = 'located_in' AND src LIKE 'supplier:%')),
       |ue AS MATERIALIZED (SELECT src, dst FROM sd UNION SELECT dst, src FROM sd),
       |lvl0 AS MATERIALIZED (SELECT id AS seed, id, CAST(1 AS DOUBLE) AS sigma FROM sn),
       |$fwd,
       |delta$maxDepth AS MATERIALIZED (
       |  SELECT seed, id, sigma, CAST(0 AS DOUBLE) AS delta FROM lvl$maxDepth),
       |$bwd
       |SELECT id, floor(sum(delta) * 10000) / 10000 AS betweenness
       |FROM ($acc)
       |GROUP BY id
       |ORDER BY betweenness DESC, id ASC LIMIT 20""".stripMargin
  }

  val harmonicCentralitySql: String =
    s"""WITH RECURSIVE ${TpchGraph.nodesSql},
       |${TpchGraph.edgesSql},
       |sn AS (SELECT id FROM nodes WHERE ntype IN ('nation', 'region')),
       |sd AS (SELECT src, dst FROM edges
       |       WHERE rel = 'in_region' OR (rel = 'located_in' AND src LIKE 'supplier:%')),
       |se AS (SELECT src, dst FROM sd UNION SELECT dst, src FROM sd),
       |bfs(seed, id, d) AS (
       |  SELECT id, id, 0 FROM sn
       |  UNION
       |  SELECT b.seed, e.dst, b.d + 1 FROM bfs b JOIN se e ON b.id = e.src WHERE b.d < 8
       |),
       |md AS (SELECT seed, id, min(d) AS d FROM bfs GROUP BY 1, 2),
       |hist AS (SELECT seed, d, count(*) AS n FROM md WHERE d > 0 GROUP BY 1, 2)
       |SELECT seed AS id, floor(sum(n::DOUBLE / d) * 10000) / 10000 AS harmonic,
       |  CAST(sum(n) AS BIGINT) AS n_reachable
       |FROM hist GROUP BY 1
       |ORDER BY harmonic DESC, id ASC LIMIT 20""".stripMargin

  /** Community detection via synchronous label propagation
    * ([[GraphAlgos.labelPropagation]], 4 fixed rounds — the DataFrame
    * loop with the shuffle-hash label join stays the registered path:
    * measured at sf0.1 it beats the [[GraphAlgos.labelPropagationGraphX]]
    * twin (~4 s vs ~14 s warm — Map-merge messages allocate per edge),
    * and the twin is spec-pinned exactly equal) on the part
    * co-purchase projection — the community layer a graph engine
    * exposes next to components/PageRank/triangles (cognee's
    * per-backend graph metrics surface). Output is the community
    * census (label, size, smallest member), bounded by the node
    * count. Reuses the shared persisted co-purchase artifact. */
  def lpaCommunities(spark: SparkSession, dir: String, iters: Int = 4): DataFrame =
    GraphAlgos.labelPropagation(coPurchase(spark, dir), iters)
      .groupBy(col("l").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_member"))

  val lpaCommunitiesSql: String = {
    // Unrolled synchronous rounds, exactly the DF loop's semantics:
    // count neighbor labels, rank per node by (count desc, label asc).
    val rounds = (1 to 4).map { k =>
      s"""agg$k AS (SELECT n.v, lb.l, count(*) AS c
         |  FROM nbr n JOIN lab${k - 1} lb ON n.w = lb.v GROUP BY 1, 2),
         |lab$k AS (SELECT v, l FROM (
         |  SELECT v, l, row_number() OVER (PARTITION BY v ORDER BY c DESC, l ASC) AS rn
         |  FROM agg$k) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ce AS (
       |  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |),
       |nbr AS (SELECT x AS v, y AS w FROM ce UNION ALL SELECT y, x FROM ce),
       |lab0 AS (SELECT v, v AS l FROM (SELECT DISTINCT v FROM nbr)),
       |$rounds
       |SELECT l AS community, count(*) AS n_members, min(v) AS min_member
       |FROM lab4 GROUP BY 1""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_lpa" -> ((s: SparkSession, d: String) => lpaCommunities(s, d)),
    "graph_adamic_adar" -> ((s: SparkSession, d: String) => adamicAdar(s, d)),
    "graph_harmonic" -> ((s: SparkSession, d: String) => harmonicCentrality(s, d)),
    "graph_betweenness" -> ((s: SparkSession, d: String) => betweennessCentrality(s, d)),
    "graph_jaccard" -> ((s: SparkSession, d: String) => neighborJaccard(s, d)),
    "graph_ppr" -> ((s: SparkSession, d: String) => personalizedPageRank(s, d)),
    "graph_prune_chunks" -> ((s: SparkSession, d: String) => pruneChunks(s, d)),
    "graph_edge_types" -> ((s: SparkSession, d: String) => edgeTypes(s, d)),
    "temporal_graph_build" -> ((s: SparkSession, d: String) => temporalGraphBuild(s, d)),
    "graph_schema" -> ((s: SparkSession, d: String) => schemaGraph(s, d)),
    "graph_metrics_full" -> ((s: SparkSession, d: String) => metricsFull(s, d)),
    "graph_nodeset_subgraph" -> ((s: SparkSession, d: String) => nodesetSubgraph(s, d)),
    "graph_export" -> ((s: SparkSession, d: String) => export(s, d)),
    "graph_formatted" -> ((s: SparkSession, d: String) => formatted(s, d)),
    "graph_mutations" -> ((s: SparkSession, d: String) => mutations(s, d)),
    "graph_mutation_ledger" -> ((s: SparkSession, d: String) => mutationLedger(s, d)),
    "graph_build" -> ((s: SparkSession, d: String) => build(s, d)),
    "graph_degree" -> ((s: SparkSession, d: String) => degree(s, d)),
    "graph_neighbors" -> ((s: SparkSession, d: String) => neighbors(s, d)),
    "graph_metrics" -> ((s: SparkSession, d: String) => metrics(s, d)),
    "graph_isolated" -> ((s: SparkSession, d: String) => isolated(s, d)),
    "graph_khop" -> ((s: SparkSession, d: String) => kHop(s, d)),
    "graph_paths" -> ((s: SparkSession, d: String) => paths(s, d)),
    "graph_subgraph" -> ((s: SparkSession, d: String) => subgraph(s, d)),
    "graph_connected_components" -> ((s: SparkSession, d: String) => components(s, d)),
    "graph_pagerank" -> ((s: SparkSession, d: String) => pageRank(s, d)),
    "graph_triangles" -> ((s: SparkSession, d: String) => triangles(s, d)),
    "graph_kcore" -> ((s: SparkSession, d: String) => kCore(s, d)))

  def oracles: Map[String, String] = Map(
    "graph_lpa" -> lpaCommunitiesSql,
    "graph_adamic_adar" -> adamicAdarSql,
    "graph_harmonic" -> harmonicCentralitySql,
    "graph_jaccard" -> neighborJaccardSql,
    "graph_ppr" -> personalizedPageRankSql,
    "graph_prune_chunks" -> pruneChunksSql,
    "graph_edge_types" -> edgeTypesSql,
    "temporal_graph_build" -> temporalGraphBuildSql,
    "graph_schema" -> schemaGraphSql,
    "graph_metrics_full" -> metricsFullSql,
    "graph_nodeset_subgraph" -> nodesetSubgraphSql,
    "graph_export" -> exportSql,
    "graph_formatted" -> formattedSql,
    "graph_mutations" -> mutationsSql,
    "graph_mutation_ledger" -> mutationLedgerSql,
    "graph_build" -> buildSql,
    "graph_degree" -> degreeSql,
    "graph_neighbors" -> neighborsSql,
    "graph_metrics" -> metricsSql,
    "graph_isolated" -> isolatedSql,
    "graph_khop" -> kHopSql,
    "graph_paths" -> pathsSql,
    "graph_subgraph" -> subgraphSql,
    "graph_connected_components" -> componentsSql,
    "graph_pagerank" -> pageRankSql,
    "graph_triangles" -> trianglesSql,
    "graph_kcore" -> kCoreSql,
    "graph_betweenness" -> betweennessSql)
}
