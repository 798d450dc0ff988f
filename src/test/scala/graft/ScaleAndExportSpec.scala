package graft

import graft.graph.{GraphExport, PropertyGraph, TpchGraph}
import graft.operators.ScaleOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ScaleAndExportSpec extends SparkSpecBase {

  test("salted join returns exactly the plain-join rows") {
    import TestSpark.spark.implicits._
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "payload")
    val small = Seq((0, "zero"), (1, "one"), (2, "two"), (3, "unused")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = ScaleOps.saltedJoin(big, small, "k", 8).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("spread pins under-split scans to session parallelism and is a no-op on wide inputs") {
    val spark = TestSpark.spark
    val p = spark.sessionState.conf.numShufflePartitions
    val narrow = Tables.load(spark, sf, "documents") // single-split parquet at spec scale
    assert(narrow.rdd.getNumPartitions < p)
    val spreadNarrow = Tables.spread(spark, narrow)
    assert(spreadNarrow.rdd.getNumPartitions === p)
    // rows unchanged (round-robin repartition, no filter/dedup effect)
    assert(spreadNarrow.count() === narrow.count())
    // already-wide input: identity — at cluster scale the pin must not
    // add a full-data shuffle tax
    val wide = narrow.repartition(p + 4)
    assert(Tables.spread(spark, wide) eq wide)
  }

  test("dot_native registers as a SQL function") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT dot_native(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(r === 11.0)
  }

  test("TopKPerGroup physical operator matches the window idiom") {
    import org.apache.spark.sql.expressions.{Window => W}
    val o = Tables.load(spark, sf, "orders")
    val viaWindow = o.withColumn("rn",
        row_number().over(W.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3).drop("rn")
      .select(col("o_custkey"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaOperator = org.apache.spark.sql.graft.TopKPerGroup(
        o, Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select(col("o_custkey"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOperator === viaWindow)
    assert(viaOperator.nonEmpty)
  }

  test("TopKPerGroup fails fast past the per-partition group cap") {
    import TestSpark.spark.implicits._
    val df = (1 to 100).map(i => (i, i)).toDF("g", "v").repartition(1)
    spark.conf.set("spark.graft.topk.maxGroupsPerPartition", "10")
    try {
      val ex = intercept[org.apache.spark.SparkException] {
        org.apache.spark.sql.graft.TopKPerGroup(
          df, Seq(col("g")), Seq(col("v").asc), 1).collect()
      }
      assert(ex.getMessage.contains("maxGroupsPerPartition")
        || String.valueOf(ex.getCause).contains("maxGroupsPerPartition"))
    } finally spark.conf.unset("spark.graft.topk.maxGroupsPerPartition")
  }

  test("json-lines export carries every node and edge") {
    val g = TpchGraph(spark, sf)
    val lines = GraphExport.toJsonLines(g)
    assert(lines.count() === g.nodes.count() + g.edges.count())
    assert(lines.filter(col("line").contains("\"kind\":\"edge\"")).count() === g.edges.count())
  }

  test("dot export lines are well-formed") {
    import TestSpark.spark.implicits._
    val g = PropertyGraph(
      Seq(("a:1", "a", "alpha")).toDF("id", "ntype", "name"),
      Seq(("a:1", "a:1", "self")).toDF("src", "dst", "rel"))
    val lines = GraphExport.toDotLines(g).as[String].collect()
    assert(lines.contains("  \"a:1\" [label=\"alpha\"];"))
    assert(lines.contains("  \"a:1\" -> \"a:1\" [label=\"self\"];"))
    // a quote or backslash in the name must be DOT-escaped, not emit
    // broken syntax (the GraphML/HTML exports already escape theirs)
    val gq = PropertyGraph(
      Seq(("b:1", "b", "be\"ta\\")).toDF("id", "ntype", "name"),
      Seq.empty[(String, String, String)].toDF("src", "dst", "rel"))
    val ql = GraphExport.toDotLines(gq).as[String].collect()
    assert(ql.contains("  \"b:1\" [label=\"be\\\"ta\\\\\"];"))
  }

  test("graphml export lines are well-formed and XML-escaped") {
    import TestSpark.spark.implicits._
    val g = PropertyGraph(
      Seq(("a:1", "a", "al<pha & \"co\"")).toDF("id", "ntype", "name"),
      Seq(("a:1", "a:1", "self")).toDF("src", "dst", "rel"))
    val lines = GraphExport.toGraphMlLines(g).as[String].collect()
    assert(lines.contains(
      "  <node id=\"a:1\"><data key=\"label\">al&lt;pha &amp; &quot;co&quot;</data>" +
        "<data key=\"ntype\">a</data></node>"))
    assert(lines.contains(
      "  <edge source=\"a:1\" target=\"a:1\"><data key=\"rel\">self</data></edge>"))
    // full projection: one line per node and edge
    val tg = TpchGraph(spark, sf)
    assert(GraphExport.toGraphMlLines(tg).count() === tg.nodes.count() + tg.edges.count())
  }

  test("html export embeds a capped subgraph with induced edges and type colors") {
    val g = TpchGraph(spark, sf)
    val html = GraphExport.toHtml(g, maxNodes = 40)
    assert(html.startsWith("<!DOCTYPE html>") && html.contains("<svg"))
    val payload = html.split("application/json\" id=\"graph-data\">")(1).split("</script>")(0)
    val nodeIds = "\"id\":\"([^\"]+)\"".r.findAllMatchIn(payload).map(_.group(1)).toSet
    assert(nodeIds.size === 40)
    // every embedded link endpoint is one of the embedded nodes
    val ends = ("\"source\":\"([^\"]+)\",\"target\":\"([^\"]+)\"".r
      .findAllMatchIn(payload).flatMap(m => Seq(m.group(1), m.group(2))).toSet)
    assert(ends.subsetOf(nodeIds))
    assert(html.contains("#7048c8")) // nation color applied
  }
}
