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
}
