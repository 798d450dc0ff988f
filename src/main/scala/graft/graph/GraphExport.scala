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

  /** One JSON object per node/edge (JSON-lines interchange dump),
    * property bags included. */
  def toJsonLines(g: PropertyGraph): DataFrame =
    toJsonLinesKinded(g).select(col("line"))

  /** [[toJsonLines]] with the element kind carried as its own column
    * beside the serialized line, so consumers that route/count by kind
    * (the export query, a partitioned sink) don't re-parse the JSON
    * they just produced. */
  def toJsonLinesKinded(g: PropertyGraph): DataFrame = {
    val nodes = g.nodesP.select(lit("node").as("kind"),
      to_json(struct(lit("node").as("kind"), col("id"), col("ntype"), col("name"), col("props"))).as("line"))
    val edges = g.edgesP.select(lit("edge").as("kind"),
      to_json(struct(lit("edge").as("kind"), col("src"), col("rel"), col("dst"), col("props"))).as("line"))
    nodes.union(edges)
  }

  /** The UI-facing formatted projection (reference:
    * cognee/modules/graph/methods/get_formatted_graph_data.py:19):
    * per node — `label` = `name` when non-empty, else the
    * `<type>_<id>` fallback; `properties` = the props bag minus the
    * reserved keys (id/type/name/created_at/updated_at) and minus NULL
    * values; per edge — (source, target, label=rel). Emitted flat and
    * distributed: one row per node carrying the filtered bag's size and
    * a deterministic fingerprint (md5 over the key-sorted `k=v` entries
    * — maps are unordered, so the bag is canonicalized before hashing),
    * one row per edge label with its count. */
  def toFormatted(g: PropertyGraph): DataFrame = {
    val reserved = Seq("id", "type", "name", "created_at", "updated_at")
    val kept = array_sort(filter(map_entries(col("props")),
      e => !e.getField("key").isInCollection(reserved) && e.getField("value").isNotNull))
    val nodes = g.nodesP.select(
      lit("node").as("kind"),
      col("id"),
      when(col("name").isNotNull && col("name") =!= "", col("name"))
        .otherwise(concat(col("ntype"), lit("_"), col("id"))).as("label"),
      col("ntype"),
      size(kept).cast("long").as("n"),
      md5(array_join(transform(kept,
        e => concat(e.getField("key"), lit("="), e.getField("value"))), "&")).as("props_fp"))
    val edges = g.edgesP.groupBy(col("rel")).agg(count(lit(1)).as("n"))
      .select(lit("edge_label").as("kind"), lit(null).cast("string").as("id"),
        col("rel").as("label"), lit(null).cast("string").as("ntype"),
        col("n"), lit(null).cast("string").as("props_fp"))
    nodes.union(edges)
  }

  /** Self-contained HTML visualization of a bounded subgraph — the
    * analog of cognee_network_visualization.py (embedded node/link JSON
    * + per-type colors), with an inline deterministic circular SVG
    * layout instead of a CDN-loaded force engine, so the file renders
    * offline.
    *
    * BOUNDED BY CONTRACT: visualization is a driver-side artifact, so
    * the graph is capped at `maxNodes` (id order) with induced edges —
    * the cap and induction run distributed; only ≤ maxNodes rows are
    * ever collected. */
  def toHtml(g: PropertyGraph, maxNodes: Int = 500): String = {
    val colors = Map(
      "region" -> "#e07b39", "nation" -> "#7048c8", "supplier" -> "#2f7fd0",
      "customer" -> "#2e7d52", "part" -> "#a33434", "order" -> "#9aa0a6")
    // JSON-escape AND keep the payload safe inside an HTML <script>
    // block: '<' becomes < so a hostile name cannot close the tag,
    // and control characters are escaped so JSON.parse never throws.
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '<'  => "\\u003c"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // Type-stratified cap: round-robin across node types (per-type rank,
    // then global TakeOrdered) so small types (regions, nations) are not
    // crowded out by the big ones and the view keeps cross-type edges.
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ntype")).orderBy(col("id").asc)
    val keep = g.nodes.withColumn("tr", row_number().over(rankW))
      .orderBy(col("tr").asc, col("ntype").asc, col("id").asc).limit(maxNodes)
      .select(col("id"), col("ntype"), col("name")).cache()
    val nodes = keep.collect().map { r =>
      val (id, ntype, name) = (r.getString(0), r.getString(1), r.getString(2))
      s"""{"id":"${esc(id)}","type":"${esc(ntype)}","name":"${esc(name)}","color":"${colors.getOrElse(ntype, "#D3D3D3")}"}"""
    }
    val keepIds = keep.select(col("id"))
    // The induced edge set of a dense closure can be O(maxNodes²) —
    // cap the collect too (deterministic order) so the driver-side
    // bound holds on any graph, not just sparse ones.
    val links = g.edges
      .join(keepIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(keepIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .orderBy(col("src"), col("dst"), col("rel")).limit(maxNodes * 8)
      .collect().map { r =>
        s"""{"source":"${esc(r.getString(0))}","target":"${esc(r.getString(1))}","relation":"${esc(r.getString(2))}"}"""
      }
    keep.unpersist(false)
    val payload =
      s"""{"nodes":[${nodes.mkString(",")}],"links":[${links.mkString(",")}]}"""
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft graph</title></head>
       |<body>
       |<script type="application/json" id="graph-data">$payload</script>
       |<svg id="view" width="900" height="900"></svg>
       |<script>
       |const data = JSON.parse(document.getElementById("graph-data").textContent);
       |const svg = document.getElementById("view"), cx = 450, cy = 450, R = 400;
       |const pos = {};
       |data.nodes.forEach((n, i) => {
       |  const a = 2 * Math.PI * i / data.nodes.length;
       |  pos[n.id] = [cx + R * Math.cos(a), cy + R * Math.sin(a)];
       |});
       |const NS = "http://www.w3.org/2000/svg";
       |data.links.forEach(l => {
       |  const e = document.createElementNS(NS, "line");
       |  const [x1, y1] = pos[l.source], [x2, y2] = pos[l.target];
       |  e.setAttribute("x1", x1); e.setAttribute("y1", y1);
       |  e.setAttribute("x2", x2); e.setAttribute("y2", y2);
       |  e.setAttribute("stroke", "#bbbbbb"); svg.appendChild(e);
       |});
       |data.nodes.forEach(n => {
       |  const c = document.createElementNS(NS, "circle");
       |  const [x, y] = pos[n.id];
       |  c.setAttribute("cx", x); c.setAttribute("cy", y); c.setAttribute("r", 5);
       |  c.setAttribute("fill", n.color);
       |  const t = document.createElementNS(NS, "title");
       |  t.textContent = n.name + " (" + n.type + ")";
       |  c.appendChild(t); svg.appendChild(c);
       |});
       |</script>
       |</body></html>""".stripMargin
  }

  /** GraphML body lines (wrap with the graphml/graph envelope when
    * saving): one `<node>` element per node with label/type data
    * fields, one `<edge>` per edge with its relationship label —
    * the interchange format Gephi/yEd/NetworkX consume. Same
    * distributed shape as the DOT export: a narrow projection per
    * relation, XML-escaped, no driver assembly. */
  def toGraphMlLines(g: PropertyGraph): DataFrame = {
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(c,
        "&", "&amp;"), "<", "&lt;"), "\"", "&quot;")
    val nodes = g.nodes.select(
      concat(lit("  <node id=\""), esc(col("id")),
        lit("\"><data key=\"label\">"), esc(col("name")),
        lit("</data><data key=\"ntype\">"), esc(col("ntype")),
        lit("</data></node>")).as("line"))
    val edges = g.edges.select(
      concat(lit("  <edge source=\""), esc(col("src")),
        lit("\" target=\""), esc(col("dst")),
        lit("\"><data key=\"rel\">"), esc(col("rel")),
        lit("</data></edge>")).as("line"))
    nodes.union(edges)
  }

  /** Graphviz DOT body lines (wrap with digraph { ... } when saving).
    * Quoted-string contents are DOT-escaped (`\\` then `"`) — the
    * GraphML/HTML exports already escape; an id or name carrying a
    * quote must not silently emit broken DOT. */
  def toDotLines(g: PropertyGraph): DataFrame = {
    val q = "\""
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val nodes = g.nodes.select(
      concat(lit("  "), lit(q), esc(col("id")), lit(q),
        lit(" [label="), lit(q), esc(col("name")), lit(q), lit("];")).as("line"))
    val edges = g.edges.select(
      concat(lit("  "), lit(q), esc(col("src")), lit(q), lit(" -> "), lit(q), esc(col("dst")), lit(q),
        lit(" [label="), lit(q), esc(col("rel")), lit(q), lit("];")).as("line"))
    nodes.union(edges)
  }
}
