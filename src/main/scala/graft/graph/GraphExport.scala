package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph serialization for visualization/interchange — cognee renders
  * its graph to an HTML view and exposes raw node/edge dumps
  * (reference: cognee/modules/visualization, api get_graph_data); here
  * the same content is produced as JSON-lines or DOT, distributed
  * (one row per element, writable as text without collecting).
  */
object GraphExport {

  /** One JSON object per node/edge (JSON-lines interchange dump). */
  def toJsonLines(g: PropertyGraph): DataFrame = {
    val nodes = g.nodes.select(
      to_json(struct(lit("node").as("kind"), col("id"), col("ntype"), col("name"))).as("line"))
    val edges = g.edges.select(
      to_json(struct(lit("edge").as("kind"), col("src"), col("rel"), col("dst"))).as("line"))
    nodes.union(edges)
  }

  /** Graphviz DOT body lines (wrap with digraph { ... } when saving). */
  def toDotLines(g: PropertyGraph): DataFrame = {
    val q = "\""
    val nodes = g.nodes.select(
      concat(lit("  "), lit(q), col("id"), lit(q),
        lit(" [label="), lit(q), col("name"), lit(q), lit("];")).as("line"))
    val edges = g.edges.select(
      concat(lit("  "), lit(q), col("src"), lit(q), lit(" -> "), lit(q), col("dst"), lit(q),
        lit(" [label="), lit(q), col("rel"), lit(q), lit("];")).as("line"))
    nodes.union(edges)
  }
}
