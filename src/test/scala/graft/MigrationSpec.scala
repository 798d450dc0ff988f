package graft

import org.apache.spark.sql.functions._

/** Row-level relational→graph migration (RelationalMigration —
  * reference: tasks/ingestion/migrate_relational_database.py with
  * migrate_column_data=True, its default). */
class MigrationSpec extends SparkSpecBase {

  private lazy val g = graph.RelationalMigration.migratedGraph(spark, sf)

  test("ColumnValue nodes are shared across rows with equal values") {
    // customer.c_mktsegment has a handful of distinct segments across
    // many rows: the migration must mint ONE ColumnValue node per
    // distinct value (reference node_mapping keyed by "table:col:value",
    // migrate_relational_database.py:238) while keeping one edge per row.
    val customers = Tables.load(spark, sf, "customer")
    val nSegs = customers.select(col("c_mktsegment")).distinct().count()
    val nCust = customers.count()
    assert(nSegs < nCust, "testdata precondition: segments are shared")
    val segNodes = g.nodes.filter(col("ntype") === "ColumnValue" &&
      col("props")("column") === "c_mktsegment").count()
    assert(segNodes == nSegs)
    val segEdges = g.edges.filter(col("rel") === "c_mktsegment").count()
    assert(segEdges == nCust)
  }

  test("row nodes carry the full column bag and link to their TableType") {
    val row = g.nodes.filter(col("id") === "tablerow:nation:0").head()
    val props = row.getMap[String, String](row.fieldIndex("props"))
    assert(props.keySet == Set("n_nationkey", "n_name", "n_regionkey"))
    val partOf = g.edges.filter(col("src") === "tablerow:nation:0" &&
      col("rel") === "is_part_of").select(col("dst")).head().getString(0)
    assert(partOf == "tabletype:nation")
  }

  test("FK edges are traversable by CypherLite across two hops") {
    // orders -[o_custkey]-> customer -[c_nationkey]-> nation, counted
    // through the migrated graph, equals the raw relational join count.
    val viaGraph = graph.CypherLite.run(g,
      "MATCH (o:TableRow)-[:o_custkey]->(c:TableRow)-[:c_nationkey]->(n:TableRow) " +
        "RETURN count(*) AS n").head().getLong(0)
    val viaSql = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .count()
    assert(viaGraph == viaSql && viaGraph > 0)
  }

  test("bulk merge leaves no duplicate nodes or edges") {
    assert(g.nodes.count() == g.nodes.select(col("id")).distinct().count())
    assert(g.edges.count() ==
      g.edges.select(col("src"), col("dst"), col("rel")).distinct().count())
  }

  test("census reads back the merged counts") {
    val census = graph.RelationalMigration.migrateCensus(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val orders = Tables.load(spark, sf, "orders")
    assert(census(("node", "TableRow:orders")) == orders.count())
    assert(census(("node", "ColumnValue:orders:o_orderstatus")) ==
      orders.select(col("o_orderstatus")).distinct().count())
    assert(census(("edge", "is_part_of:orders")) == orders.count())
    assert(census(("node", "TableType:region")) == 1L)
  }

  test("composite-pk extension: pk1|pk2 row ids, id-collision collapse, all three FK families") {
    import TestSpark.spark.implicits._
    // tiny table keyed (a, b) with a DELIBERATE composite collision
    // (rows 3 and 4 share (2, 1)) and one dangling fk (9)
    val rows = Seq((1L, 1L, 10L, "x"), (1L, 2L, 10L, "y"),
      (2L, 1L, 20L, "x"), (2L, 1L, 9L, "z")).toDF("a", "b", "fk", "v")
    val parents = Seq("10", "20").toDF("fkv")
    val (n, e) = graph.RelationalMigration.tablePartK(
      rows, "tt", Seq("a", "b"), Seq(("fk", "p", parents)))
    val ids = n.filter(col("ntype") === "TableRow").select(col("id"))
      .collect().map(_.getString(0)).toSet
    assert(ids === Set("tablerow:tt:1|1", "tablerow:tt:1|2", "tablerow:tt:2|1"))
    // the collision emits two row-node candidates for 2|1; merge collapses
    assert(n.filter(col("id") === "tablerow:tt:2|1").count() === 2L)
    // fk edges: dangling 9 suppressed; both values of the collided key kept
    val fkE = e.filter(col("rel") === "fk")
      .select(col("src"), col("dst")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fkE === Set(("tablerow:tt:1|1", "tablerow:p:10"),
      ("tablerow:tt:1|2", "tablerow:p:10"), ("tablerow:tt:2|1", "tablerow:p:20")))

    // lineitem census on the real testdata: row nodes count DISTINCT
    // composite keys (the generator emits duplicate pairs), FK families
    // cover orders/part/supplier
    val census = graph.RelationalMigration.migrateCompositeCensus(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val l = Tables.load(spark, sf, "lineitem")
    val distinctPk = l.select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(distinctPk < l.count(), "testdata precondition: composite keys collide")
    assert(census(("node", "TableRow:lineitem")) == distinctPk)
    assert(census(("edge", "is_part_of:lineitem")) == distinctPk)
    assert(census(("edge", "l_suppkey:lineitem")) ==
      l.select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey")).distinct()
        .join(Tables.load(spark, sf, "supplier"),
          col("l_suppkey") === col("s_suppkey"), "left_semi").count())
  }

  test("composite-pk rendering is injective: NULL components and '|' in values never alias") {
    import TestSpark.spark.implicits._
    // (1,NULL) vs (NULL,1): concat_ws would drop the NULLs and render
    // both as "1"; ("1|2","3") vs ("1","2|3") would both render "1|2|3".
    // The escaped rendering keeps all four rows distinct.
    val rows = Seq(
      (Option("1"), Option.empty[String], "a"),
      (Option.empty[String], Option("1"), "b"),
      (Option("1|2"), Option("3"), "c"),
      (Option("1"), Option("2|3"), "d")).toDF("x", "y", "v")
    val (n, _) = graph.RelationalMigration.tablePartK(rows, "tt", Seq("x", "y"), Nil)
    val ids = n.filter(col("ntype") === "TableRow").select(col("id"))
      .collect().map(_.getString(0)).toSet
    assert(ids.size === 4, s"rendering collapsed distinct keys: $ids")
    // and a literal "\N" value cannot forge the NULL marker
    val forged = Seq((Option("\\N"), Option("1"), "e"),
      (Option.empty[String], Option("1"), "f")).toDF("x", "y", "v")
    val (fn, _) = graph.RelationalMigration.tablePartK(forged, "tt", Seq("x", "y"), Nil)
    assert(fn.filter(col("ntype") === "TableRow").select(col("id")).distinct().count() === 2L)
  }
}
