package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-planned graph queries over the TPC-H knowledge-graph
  * projection — the bounded-neighborhood portion of cognee's graph
  * surface (get_graph_data / get_neighbors / get_connections /
  * get_graph_metrics in graph_db_interface.py). Iterative analytics
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_build" -> ((s: SparkSession, d: String) => build(s, d)),
    "graph_degree" -> ((s: SparkSession, d: String) => degree(s, d)),
    "graph_neighbors" -> ((s: SparkSession, d: String) => neighbors(s, d)),
    "graph_metrics" -> ((s: SparkSession, d: String) => metrics(s, d)))

  def oracles: Map[String, String] = Map(
    "graph_build" -> buildSql,
    "graph_degree" -> degreeSql,
    "graph_neighbors" -> neighborsSql,
    "graph_metrics" -> metricsSql)
}
