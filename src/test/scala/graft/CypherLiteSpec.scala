package graft

import graft.graph.{CypherLite, PropertyGraph, TpchGraph}
import org.apache.spark.sql.functions._

class CypherLiteSpec extends SparkSpecBase {

  private lazy val g: PropertyGraph = {
    import TestSpark.spark.implicits._
    PropertyGraph(
      Seq(("a:1", "a", "alpha"), ("a:2", "a", "beta"), ("b:1", "b", "gamma"), ("c:1", "c", "delta"))
        .toDF("id", "ntype", "name"),
      Seq(("a:1", "b:1", "knows"), ("a:2", "b:1", "knows"), ("b:1", "c:1", "in"))
        .toDF("src", "dst", "rel"))
  }

  test("single hop with WHERE and projection") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'alpha' RETURN x.id AS xid, y.name AS yname")
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet === Set(("a:1", "gamma")))
  }

  test("two hops with count aggregation and order") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b)-[:in]->(z:c) RETURN z.name AS zn, count(*) AS n ORDER BY zn")
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toList === List(("delta", 2L)))
  }

  test("limit applies") {
    val out = CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b) RETURN x.id AS xid ORDER BY xid LIMIT 1").collect()
    assert(out.map(_.getString(0)).toList === List("a:1"))
  }

  test("rejects malformed WHERE") {
    assertThrows[IllegalArgumentException] {
      CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b) WHERE x.name > 'a' RETURN x.id")
    }
  }

  test("tpch projection: suppliers per region matches direct aggregation") {
    val viaCypher = CypherLite.run(TpchGraph(spark, sf),
      "MATCH (s:supplier)-[:located_in]->(n:nation)-[:in_region]->(r:region) " +
        "RETURN r.name AS region, count(*) AS n ORDER BY region")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val direct = Tables.load(spark, sf, "supplier")
      .join(Tables.load(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sf, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n")).orderBy(col("r_name"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(viaCypher === direct)
  }
}
