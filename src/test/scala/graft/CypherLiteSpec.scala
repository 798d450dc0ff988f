package graft

import graft.graph.{CypherLite, PropertyGraph, TpchGraph}
import org.apache.spark.sql.functions._

object TestSparkData {
  def chainGraph(spark: org.apache.spark.sql.SparkSession): graft.graph.PropertyGraph = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    graft.graph.PropertyGraph(
      Seq(("a:1", "a", "one"), ("a:2", "a", "two"), ("a:3", "a", "three")).toDF("id", "ntype", "name"),
      Seq(("a:1", "a:2", "n"), ("a:2", "a:3", "n")).toDF("src", "dst", "rel"))
  }
}

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

  test("ENDS WITH predicate and its WITH-clause disambiguation") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name ENDS WITH 'pha' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(out === List("a:1"))
    // ENDS WITH inside a WITH-chained query: the operator's WITH must
    // not be taken for a clause boundary
    val chained = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS n " +
        "MATCH (y)-[:in]->(z:c) WHERE z.name ENDS WITH 'lta' RETURN z.name AS zn, n ORDER BY zn")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(chained === List(("delta", 2L)))
  }

  test("scalar projection functions: toLower/toUpper/size/trim/coalesce") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'alpha' " +
        "RETURN toUpper(x.name) AS up, size(y.name) AS n, coalesce(x.missing, 'dflt') AS d")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    assert(out === List(("ALPHA", 5L, "dflt")))
    // scalar fn joins the implicit grouping key when mixed with aggregates
    val grouped = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN toLower(y.name) AS yn, count(*) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(grouped === List(("gamma", 2L)))
  }

  test("NOT prefix and exists() in WHERE") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE NOT x.name = 'alpha' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(out === List("a:2"))
    // exists on a fixed column is always true; on a missing bag key never
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE exists(x.name) RETURN x.id AS xid").count() === 2L)
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE exists(x.nope) RETURN x.id AS xid").count() === 0L)
    // NOT over a missing property is NULL → row filtered (Cypher's
    // three-valued WHERE), not negated to true
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE NOT x.nope = 'v' RETURN x.id AS xid").count() === 0L)
  }

  test("property-to-property comparison in WHERE") {
    // same-name endpoints only: no pair has x.name = y.name here → 0;
    // inequality keeps all
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = y.name RETURN x.id AS xid").count() === 0L)
    val ne = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name <> y.name RETURN x.id AS xid ORDER BY xid")
      .collect().map(_.getString(0)).toList
    assert(ne === List("a:1", "a:2"))
    // lexicographic range on the stored representation
    val lt = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name < y.name RETURN x.name AS xn ORDER BY xn")
      .collect().map(_.getString(0)).toList
    assert(lt === List("alpha", "beta")) // both < "gamma"
  }

  test("searched CASE in RETURN: WHEN chain, ELSE default, implicit grouping") {
    val out = CypherLite.run(g,
      "MATCH (x)-[:knows|in]->(y) RETURN CASE WHEN x.name STARTS WITH 'al' THEN 'A' " +
        "WHEN x.name = 'beta' THEN 'B' ELSE 'other' END AS bucket, count(*) AS n ORDER BY bucket")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("A", 1L), ("B", 1L), ("other", 1L)))
    // no ELSE → NULL bucket for unmatched rows
    val noElse = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN CASE WHEN x.name = 'alpha' THEN 1 END AS one, x.id AS xid ORDER BY xid")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).toList
    assert(noElse === List((1L, "a:1"), (-1L, "a:2")))
  }

  test("DISTINCT aggregates: count, collect, sum") {
    // two a-nodes know b:1 — y.name dedups to one value
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN count(DISTINCT y.name) AS n, count(y.name) AS total")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toList === List((1L, 2L)))
    val coll = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN collect(DISTINCT y.name) AS ys")
      .collect().head.getSeq[String](0).toList
    assert(coll === List("gamma"))
    // DISTINCT through a WITH segment aggregate
    val viaWith = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(DISTINCT x.ntype) AS kinds " +
        "RETURN y.id AS yid, kinds ORDER BY yid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(viaWith === List(("b:1", 1L)))
  }

  test("undirected pattern traverses both orientations") {
    // b:1 is reachable undirected from a:1 (outgoing) and c:1 (incoming)
    val out = CypherLite.run(g,
      "MATCH (x)-[:knows|in]-(y:b) RETURN DISTINCT x.id AS xid ORDER BY xid")
      .collect().map(_.getString(0)).toList
    assert(out === List("a:1", "a:2", "c:1"))
  }

  test("left-arrow pattern traverses reverse, not undirected") {
    val out = CypherLite.run(g,
      "MATCH (y:b)<-[:knows]-(x:a) RETURN x.id AS xid, y.id AS yid ORDER BY xid")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(out === List(("a:1", "b:1"), ("a:2", "b:1")))
    // reverse of 'in' from b:1 yields nothing (only b:1 -in-> c:1 exists)
    assert(CypherLite.run(g, "MATCH (x:b)<-[:in]-(y) RETURN y.id AS yid").count() === 0L)
    intercept[IllegalArgumentException] {
      CypherLite.run(g, "MATCH (x:a)<-[:knows]->(y:b) RETURN x.id AS xid")
    }
  }

  test("relation alternation unions edge types in one hop") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows|in]->(y) RETURN y.id AS yid, count(*) AS n ORDER BY yid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("b:1", 2L)))
  }

  test("untyped node matches any vertex type") {
    val out = CypherLite.run(g,
      "MATCH (x)-[:in]->(y) RETURN x.id AS xid, y.id AS yid")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(out === List(("b:1", "c:1")))
  }

  test("RETURN DISTINCT collapses duplicate projection rows") {
    val dup = CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b) RETURN y.id AS yid").count()
    val dis = CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b) RETURN DISTINCT y.id AS yid").count()
    assert(dup === 2L && dis === 1L)
  }

  test("limit applies") {
    val out = CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b) RETURN x.id AS xid ORDER BY xid LIMIT 1").collect()
    assert(out.map(_.getString(0)).toList === List("a:1"))
  }

  test("WHERE supports <>, STARTS WITH, CONTAINS") {
    val ne = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name <> 'alpha' RETURN x.id AS xid").collect()
    assert(ne.map(_.getString(0)).toSet === Set("a:2"))
    val sw = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.id STARTS WITH 'a:' AND x.name CONTAINS 'lph' RETURN x.id AS xid")
      .collect()
    assert(sw.map(_.getString(0)).toSet === Set("a:1"))
  }

  private lazy val gp: PropertyGraph = {
    import TestSpark.spark.implicits._
    PropertyGraph(
      Seq(
        ("a:1", "a", "alpha", Map("color" -> "red", "size" -> "9")),
        ("a:2", "a", "beta", Map("color" -> "blue")),
        ("b:1", "b", "gamma", Map.empty[String, String]))
        .toDF("id", "ntype", "name", "props"),
      Seq(("a:1", "b:1", "knows"), ("a:2", "b:1", "knows")).toDF("src", "dst", "rel"))
  }

  test("WHERE predicates reach the props bag; missing keys never match") {
    val red = CypherLite.run(gp,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.color = 'red' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(red === List("a:1"))
    // y has an empty bag: element_at → NULL → comparison false, row dropped
    assert(CypherLite.run(gp,
      "MATCH (x:a)-[:knows]->(y:b) WHERE y.color = 'red' RETURN x.id AS xid").count() === 0L)
    // <> against a missing key is also false (Cypher missing-property semantics)
    val ne = CypherLite.run(gp,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.size <> '7' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(ne === List("a:1"))
  }

  test("RETURN projects props-bag values (NULL when absent)") {
    val out = CypherLite.run(gp,
      "MATCH (x:a)-[:knows]->(y:b) RETURN x.id AS xid, x.size AS sz ORDER BY xid")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toList
    assert(out === List(("a:1", Some("9")), ("a:2", None)))
  }

  test("RETURN aggregates: sum/avg are numeric, min/max stored-repr, collect sorted, count skips NULLs") {
    import TestSpark.spark.implicits._
    val ga = PropertyGraph(
      Seq(
        ("a:1", "a", "alpha", Map("qty" -> "9")),
        ("a:2", "a", "beta", Map("qty" -> "10")),
        ("a:3", "a", "gold", Map.empty[String, String]),
        ("b:1", "b", "hub", Map.empty[String, String]))
        .toDF("id", "ntype", "name", "props"),
      Seq(("a:1", "b:1", "knows"), ("a:2", "b:1", "knows"), ("a:3", "b:1", "knows"))
        .toDF("src", "dst", "rel"))
    val out = CypherLite.run(ga,
      "MATCH (x:a)-[:knows]->(y:b) RETURN y.id AS yid, count(x.qty) AS n_qty, " +
        "sum(x.qty) AS total, avg(x.qty) AS mean, min(x.name) AS lo, max(x.name) AS hi, " +
        "collect(x.name) AS names ORDER BY yid").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "b:1")
    assert(r.getLong(1) === 2L) // count(x.qty) skips the missing-key NULL
    assert(r.getDouble(2) === 19.0) // numeric: lexicographic would make "10" < "9"
    assert(r.getDouble(3) === 9.5)
    assert(r.getString(4) === "alpha" && r.getString(5) === "gold")
    assert(r.getSeq[String](6).toList === List("alpha", "beta", "gold")) // canonical sorted
    // keyless aggregate returns one global row
    val tot = CypherLite.run(ga, "MATCH (x:a)-[:knows]->(y:b) RETURN sum(x.qty) AS total")
      .collect()
    assert(tot.map(_.getDouble(0)).toList === List(19.0))
  }

  test("mixed aggregate + plain RETURN keeps the RETURN-list column order") {
    // aggregate listed FIRST: groupBy would emit (zn, n); the output
    // must follow the RETURN list as written — (n, zn)
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b)-[:in]->(z:c) RETURN count(*) AS n, z.name AS zn")
    assert(out.columns.toSeq === Seq("n", "zn"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet === Set((2L, "delta")))
  }

  test("clause keywords inside quoted literals don't mis-split the query") {
    // ' RETURN ' inside the WHERE literal must not truncate the predicate
    val none = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'THE RETURN HOME' RETURN x.id AS xid")
    assert(none.count() === 0L)
    // ' AND ' inside a literal must not split the conjunction
    val one = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'alpha' AND y.name <> 'UP AND DOWN' RETURN x.id AS xid")
    assert(one.collect().map(_.getString(0)).toSeq === Seq("a:1"))
    // ' WHERE ' inside a literal likewise
    val two = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'SOMEWHERE WHERE IT HIDES' RETURN x.id AS xid")
    assert(two.count() === 0L)
  }

  test("WITH carries a node variable through an aggregate and chains a second MATCH") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS nx " +
        "MATCH (y)-[:in]->(z:c) RETURN z.name AS zn, nx ORDER BY zn")
    assert(out.columns.toSeq === Seq("zn", "nx"))
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toList === List(("delta", 2L)))
  }

  test("WITH-attached WHERE filters post-aggregation (the HAVING shape)") {
    val none = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS nx WHERE nx >= 3 " +
        "MATCH (y)-[:in]->(z:c) RETURN z.name AS zn, nx")
    assert(none.count() === 0L)
    val kept = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS nx WHERE nx >= 2 " +
        "MATCH (y)-[:in]->(z:c) RETURN z.name AS zn, nx")
    assert(kept.collect().map(r => (r.getString(0), r.getLong(1))).toList === List(("delta", 2L)))
  }

  test("WITH scalar aliases survive into RETURN, bare and aggregated") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, x.name AS xn " +
        "MATCH (y)-[:in]->(z:c) RETURN z.name AS zn, collect(xn) AS names")
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "delta")
    assert(rows(0).getSeq[String](1).toList === List("alpha", "beta"))
  }

  test("WITH rejects the unsupported shapes loudly") {
    // bare WITH item must be a bound node variable or a live alias
    intercept[IllegalArgumentException] { CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH q MATCH (q)-[:in]->(z:c) RETURN z.id AS zid") }
    // RETURN of a name that is neither var.prop nor a WITH alias
    intercept[IllegalArgumentException] { CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS nx " +
        "MATCH (y)-[:in]->(z:c) RETURN z.name AS zn, bogus") }
    // post-WITH pattern variable shadowing a WITH alias
    intercept[IllegalArgumentException] { CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS nx " +
        "MATCH (y)-[:in]->(nx) RETURN nx.id AS nid") }
    // ' WITH ' inside a quoted literal is data, not a clause boundary
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'GONE WITH THE WIND' RETURN x.id AS xid")
      .count() === 0L)
  }

  test("props-less graphs still run props queries (empty-bag normalization)") {
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.color = 'red' RETURN x.id AS xid").count() === 0L)
  }

  test("mutations preserve and normalize props bags") {
    import TestSpark.spark.implicits._
    val g2 = gp.addNodes(Seq(("c:1", "c", "new", Map("k" -> "v"))).toDF("id", "ntype", "name", "props"))
    val bag = g2.nodes.filter(col("id") === "c:1").select(col("props")).head()
      .getMap[String, String](0)
    assert(bag === Map("k" -> "v"))
    // re-adding an existing id keeps the base row's bag (keep-first upsert)
    val g3 = g2.addNodes(Seq(("a:1", "a", "alpha", Map("color" -> "green"))).toDF("id", "ntype", "name", "props"))
    assert(g3.nodes.filter(col("id") === "a:1").select(col("props")).head()
      .getMap[String, String](0).get("color").contains("red"))
    assert(g3.nodes.count() === gp.nodes.count() + 1)
    // props-less increments normalize to an empty bag
    val g4 = gp.addNodes(Seq(("d:1", "d", "bare")).toDF("id", "ntype", "name"))
    assert(g4.nodes.filter(col("id") === "d:1").select(col("props")).head()
      .getMap[String, String](0).isEmpty)
    // delete cascades still carry the schema through
    val g5 = g4.deleteNodes(Seq("a:1").toDF("id"))
    assert(g5.nodes.columns.contains("props") && g5.edges.count() === 1L)
  }

  test("tpch projection props: order status/priority and customer mktsegment ride the graph") {
    val out = CypherLite.run(TpchGraph(spark, sf),
      "MATCH (o:order)-[:placed_by]->(c:customer) WHERE o.status = 'F' " +
        "RETURN o.priority AS priority, count(*) AS n ORDER BY priority")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = Tables.load(spark, sf, "orders").filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === direct && out.nonEmpty)
  }

  private lazy val ge: PropertyGraph = {
    import TestSpark.spark.implicits._
    PropertyGraph(
      Seq(("a:1", "a", "alpha"), ("a:2", "a", "beta"), ("b:1", "b", "gamma"))
        .toDF("id", "ntype", "name"),
      Seq(
        ("a:1", "b:1", "knows", Map("since" -> "2020")),
        ("a:2", "b:1", "knows", Map("since" -> "2023")),
        ("a:1", "b:1", "likes", Map.empty[String, String]))
        .toDF("src", "dst", "rel", "props"))
  }

  test("edge variable binds rel and its props bag; WHERE filters on edge props") {
    val out = CypherLite.run(ge,
      "MATCH (x:a)-[r:knows]->(y:b) WHERE r.since = '2020' RETURN x.id AS xid, r.rel AS rel")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(out === List(("a:1", "knows")))
    // projection of an edge prop; missing key -> NULL
    val proj = CypherLite.run(ge,
      "MATCH (x:a)-[r:knows|likes]->(y:b) RETURN x.id AS xid, r.rel AS rel, r.since AS since ORDER BY xid, rel")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toList
    assert(proj === List(
      ("a:1", "knows", Some("2020")), ("a:1", "likes", None), ("a:2", "knows", Some("2023"))))
    // one row per edge: parallel knows+likes edges both match (no pair dedup)
    assert(CypherLite.run(ge,
      "MATCH (x:a)-[r:knows|likes]->(y:b) RETURN x.id AS xid").count() === 3L)
    // reverse arrow orients the hop; props still reachable
    val rev = CypherLite.run(ge,
      "MATCH (y:b)<-[r:knows]-(x:a) WHERE r.since = '2023' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(rev === List("a:2"))
    // props-less graphs normalize to empty bags under an edge variable
    assert(CypherLite.run(g,
      "MATCH (x:a)-[r:knows]->(y:b) WHERE r.since = '2020' RETURN x.id AS xid").count() === 0L)
  }

  test("edge variable rejects var-length and undirected hops") {
    intercept[IllegalArgumentException] {
      CypherLite.run(ge, "MATCH (x:a)-[r:knows*1..2]->(y:b) RETURN x.id AS xid")
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(ge, "MATCH (x:a)-[r:knows]-(y:b) RETURN x.id AS xid")
    }
  }

  test("range comparisons order lexicographically (ISO dates in bags)") {
    // since: 2020 vs 2023 — string order == numeric order here
    val ge = CypherLite.run(this.ge,
      "MATCH (x:a)-[r:knows]->(y:b) WHERE r.since >= '2021' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(ge === List("a:2"))
    val lt = CypherLite.run(this.ge,
      "MATCH (x:a)-[r:knows]->(y:b) WHERE r.since < '2021' AND r.since > '1999' RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList
    assert(lt === List("a:1"))
    // a missing key is NULL: no range op ever matches it
    assert(CypherLite.run(this.ge,
      "MATCH (x:a)-[r:likes]->(y:b) WHERE r.since <= '2999' RETURN x.id AS xid").count() === 0L)
  }

  test("numeric literals make range comparisons numeric, not lexicographic") {
    import TestSpark.spark.implicits._
    val gn = PropertyGraph(
      Seq(("a:1", "a", "alpha"), ("b:1", "b", "gamma")).toDF("id", "ntype", "name"),
      Seq(
        ("a:1", "b:1", "e1", Map("qty" -> "10")),
        ("a:1", "b:1", "e2", Map("qty" -> "9")),
        ("a:1", "b:1", "e3", Map("qty" -> "100")),
        ("a:1", "b:1", "e4", Map("qty" -> "n/a")))
        .toDF("src", "dst", "rel", "props"))
    def rels(q: String): Set[String] = CypherLite.run(gn,
      s"MATCH (x:a)-[r:e1|e2|e3|e4]->(y:b) WHERE $q RETURN r.rel AS rel")
      .collect().map(_.getString(0)).toSet
    // lexicographic would say '10' < '9' and '100' < '9'; numeric must not
    assert(rels("r.qty > '9'") === Set("e1", "e3"))
    assert(rels("r.qty > '10'") === Set("e3"))
    assert(rels("r.qty <= '10'") === Set("e1", "e2"))
    // non-numeric bag value vs numeric literal: NULL compare, no error, no match
    assert(!rels("r.qty >= '0'").contains("e4"))
  }

  test("var-length expansion is frontier-bounded on a hub-dense graph (*1..8)") {
    import TestSpark.spark.implicits._
    // Bidirectional 100-spoke star: without per-level dedup the length-8
    // path count through the hub is ~100^4 per source (transitive-closure
    // blow-up); with frontier semantics each level is <= |V|^2 = 10201.
    val n = 100
    val nodes = (("h", "a", "hub") +: (1 to n).map(i => (s"s:$i", "a", s"spoke$i"))).toDF("id", "ntype", "name")
    val edges = (1 to n).flatMap(i => Seq((s"s:$i", "h", "n"), ("h", s"s:$i", "n"))).toDF("src", "dst", "rel")
    val star = PropertyGraph(nodes, edges)
    val cnt = CypherLite.run(star,
      "MATCH (x:a)-[:n*1..8]->(y:a) RETURN x.id AS xid, y.id AS yid").count()
    // closed form: every node reaches every node (incl. itself) within 2
    // hops, so 1..8 reachability is the full (n+1)^2 pair set
    assert(cnt === (n + 1).toLong * (n + 1))
  }

  test("multi-pattern MATCH conjoins on shared variables") {
    // (x)-[:knows]->(y), (y)-[:in]->(z) == the two-hop chain
    val multi = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b), (y)-[:in]->(z:c) RETURN x.id AS xid, z.id AS zid ORDER BY xid")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    val chained = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b)-[:in]->(z:c) RETURN x.id AS xid, z.id AS zid ORDER BY xid")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(multi === chained && multi.nonEmpty)
    // shared-variable type filters still apply on the second pattern
    assert(CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b), (y:c)-[:in]->(z) RETURN x.id AS xid").count() === 0L)
    // a disjoint pattern would be a cartesian product: rejected
    intercept[IllegalArgumentException] {
      CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b), (p:c)-[:in]->(r:c) RETURN x.id AS xid")
    }
  }

  test("OPTIONAL MATCH keeps unmatched rows with NULL bindings") {
    import TestSpark.spark.implicits._
    // a:1 and a:2 know b:1; only b:1 is 'in' c:1 — b:2 (known by a:3) is not
    val go = PropertyGraph(
      Seq(("a:1", "a", "alpha"), ("a:2", "a", "beta"), ("a:3", "a", "gamma"),
        ("b:1", "b", "one"), ("b:2", "b", "two"), ("c:1", "c", "delta"))
        .toDF("id", "ntype", "name"),
      Seq(("a:1", "b:1", "knows"), ("a:2", "b:1", "knows"), ("a:3", "b:2", "knows"),
        ("b:1", "c:1", "in")).toDF("src", "dst", "rel"))
    val out = CypherLite.run(go,
      "MATCH (x:a)-[:knows]->(y:b) OPTIONAL MATCH (y)-[:in]->(z:c) " +
        "RETURN x.id AS xid, z.id AS zid ORDER BY xid")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toList
    assert(out === List(
      ("a:1", Some("c:1")), ("a:2", Some("c:1")), ("a:3", None)))
    // WHERE after the optional join predicates the NULL binding away
    val whereOut = CypherLite.run(go,
      "MATCH (x:a)-[:knows]->(y:b) OPTIONAL MATCH (y)-[:in]->(z:c) " +
        "WHERE z.name = 'delta' RETURN x.id AS xid ORDER BY xid")
      .collect().map(_.getString(0)).toList
    assert(whereOut === List("a:1", "a:2"))
    // optional edge variables project their props as NULL when unmatched
    val withEdge = CypherLite.run(go,
      "MATCH (x:a)-[:knows]->(y:b) OPTIONAL MATCH (y)-[r:in]->(z:c) " +
        "RETURN x.id AS xid, r.rel AS rel ORDER BY xid")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toList
    assert(withEdge === List(("a:1", Some("in")), ("a:2", Some("in")), ("a:3", None)))
    // chained optionals extend the frontier left-to-right
    val two = CypherLite.run(go,
      "MATCH (x:a) OPTIONAL MATCH (x)-[:knows]->(y:b) OPTIONAL MATCH (y)-[:in]->(z:c) " +
        "RETURN x.id AS xid, y.id AS yid, z.id AS zid ORDER BY xid")
      .collect().map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toList
    assert(two === List(
      ("a:1", Some("b:1"), Some("c:1")), ("a:2", Some("b:1"), Some("c:1")),
      ("a:3", Some("b:2"), None)))
  }

  test("rejects malformed WHERE") {
    assertThrows[IllegalArgumentException] {
      CypherLite.run(g, "MATCH (x:a)-[:knows]->(y:b) WHERE x.name ~ 'a' RETURN x.id")
    }
  }

  test("variable-length path *1..2 unions one- and two-hop reachability") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows*1..2]->(y:b) RETURN x.id AS xid, y.id AS yid ORDER BY xid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // knows edges: a:1->b:1, a:2->b:1; no knows chains of length 2 land on :b
    assert(out === Set(("a:1", "b:1"), ("a:2", "b:1")))
    val twoHop = CypherLite.run(TestSparkData.chainGraph(spark),
      "MATCH (x:a)-[:n*2..2]->(y:a) RETURN x.id AS xid, y.id AS yid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(twoHop === Set(("a:1", "a:3")))
  }

  test("graft attach registers views and functions") {
    GraftSession.attach(spark, sf)
    val viaSql = spark.sql(
      "SELECT count(*) AS n FROM graph_edges WHERE rel = 'in_region'").head().getLong(0)
    assert(viaSql === 25L)
    assert(spark.sql("SELECT dot_native(array(1.0D), array(2.0D))").head().getDouble(0) === 2.0)
  }

  test("chained WITH segments: aggregate, filter, re-expand, repeat") {
    // MATCH…WITH…MATCH…WITH…MATCH…RETURN — the multi-segment shape the
    // reference forwards verbatim (cypher_search_retriever.py:24).
    // Oracle: the same two-level reduction written directly on the
    // source tables.
    val viaCypher = operators.Retrievers.cypherWith2(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val nation = Tables.load(spark, sf, "nation")
    val supplier = Tables.load(spark, sf, "supplier")
    val big = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
    val bigNation = big.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_big"))
      .filter(col("n_big") >= 2)
    val direct = bigNation.join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(supplier, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("n_big")).agg(count(lit(1)).as("n_suppliers"))
      .orderBy(col("n_name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(viaCypher.nonEmpty)
    assert(viaCypher === direct)
  }

  test("a WITH alias carries through a later WITH as a bare item") {
    val out = CypherLite.run(TpchGraph(spark, sf),
      "MATCH (o:order)-[:placed_by]->(c:customer) " +
        "WITH c, count(o.id) AS n_orders WHERE n_orders >= 15 " +
        "MATCH (c)-[:located_in]->(n:nation) " +
        "WITH n, n_orders " +
        "MATCH (n)-[:in_region]->(r:region) " +
        "RETURN r.name AS region, max(n_orders) AS max_orders ORDER BY region")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
      .join(Tables.load(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sf, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(max(col("n_orders")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.nonEmpty)
    assert(out === direct)
    // a fully supported two-aggregation chain also runs on the tiny graph
    val tiny = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS n1 MATCH (y)-[:in]->(z:c) " +
        "WITH z, count(y.id) AS n2 MATCH (z)<-[:in]-(w:b) RETURN z.name AS zn, n2, count(w.id) AS nw")
    assert(tiny.collect().nonEmpty)
  }

  test("RETURN of a bare node variable expands to its relational projection") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN x ORDER BY x_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toList
    assert(out === List(("a:1", "a", "alpha"), ("a:2", "a", "beta")))
    // mixed with an aggregate: the node's three columns group implicitly
    val grouped = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN y, count(x.id) AS n ORDER BY y_id")
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3))).toList
    assert(grouped === List(("b:1", "gamma", 2L)))
    // DISTINCT applies over the expanded columns
    val distinct = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN DISTINCT y ORDER BY y_id")
    assert(distinct.count() === 1L)
  }

  test("WHERE supports OR disjunctions with AND binding tighter") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'alpha' OR x.name = 'beta' " +
        "RETURN x.id AS xid ORDER BY xid").collect().map(_.getString(0)).toList
    assert(out === List("a:1", "a:2"))
    // (x=alpha AND y=delta) OR x=beta — the left conjunct is false for
    // every row (y is gamma), so only beta survives: precedence pins
    // AND-tighter grouping, not left-to-right.
    val prec = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WHERE x.name = 'alpha' AND y.name = 'delta' OR x.name = 'beta' " +
        "RETURN x.id AS xid").collect().map(_.getString(0)).toList
    assert(prec === List("a:2"))
  }

  test("IS NULL / IS NOT NULL predicate optional bindings and absent bag keys") {
    // b:1 has an outgoing 'in' edge; a-nodes' optional match is unmatched
    val unmatched = CypherLite.run(g,
      "MATCH (x) OPTIONAL MATCH (x)-[:in]->(z:c) WHERE z.id IS NULL " +
        "RETURN x.id AS xid ORDER BY xid").collect().map(_.getString(0)).toList
    assert(unmatched === List("a:1", "a:2", "c:1"))
    val matched = CypherLite.run(g,
      "MATCH (x) OPTIONAL MATCH (x)-[:in]->(z:c) WHERE z.id IS NOT NULL " +
        "RETURN x.id AS xid").collect().map(_.getString(0)).toList
    assert(matched === List("b:1"))
    // absent props-bag key is NULL (Cypher missing-property semantics)
    val noBag = CypherLite.run(g,
      "MATCH (x:a) WHERE x.nosuchkey IS NULL RETURN count(*) AS n").head().getLong(0)
    assert(noBag === 2L)
  }

  test("terminal WITH filters post-aggregation and returns without a trailing MATCH") {
    // the HAVING-then-return shape: no second MATCH required
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS n WHERE n >= 2 " +
        "RETURN y.name AS yn, n ORDER BY yn")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("gamma", 2L)))
    // filtered-out group disappears
    val none = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, count(x.id) AS n WHERE n >= 3 RETURN y.name AS yn")
    assert(none.count() === 0L)
  }

  test("UNWIND explodes a collected list back to rows") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, collect(x.name) AS xs " +
        "UNWIND xs AS xn RETURN y.name AS yn, xn ORDER BY yn, xn")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(out === List(("gamma", "alpha"), ("gamma", "beta")))
    // aggregates over the unwound rows see the multiplicity
    val n = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) WITH y, collect(x.name) AS xs " +
        "UNWIND xs AS xn RETURN count(xn) AS n").head().getLong(0)
    assert(n === 2L)
  }

  test("UNWIND of a literal list; empty list drops the row") {
    val tags = CypherLite.run(g,
      "MATCH (z:c) UNWIND ['p', 'q', 'r'] AS tag RETURN z.name AS zn, tag ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(tags === List(("delta", "p"), ("delta", "q"), ("delta", "r")))
    val nums = CypherLite.run(g,
      "MATCH (z:c) UNWIND [3, 1, 2] AS k RETURN k ORDER BY k")
      .collect().map(_.getLong(0)).toList
    assert(nums === List(1L, 2L, 3L))
    assert(CypherLite.run(g, "MATCH (z:c) UNWIND [] AS t RETURN t").count() === 0L)
    intercept[IllegalArgumentException] {
      CypherLite.run(g, "MATCH (z:c) UNWIND nosuch AS t RETURN t")
    }
  }

  test("ORDER BY a non-returned property rides a hidden column") {
    val out = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN x.id AS xid ORDER BY x.name DESC")
    assert(out.columns.toSeq === Seq("xid")) // hidden sort column dropped
    assert(out.collect().map(_.getString(0)).toList === List("a:2", "a:1")) // beta, alpha
    // mixed alias + property keys
    val mixed = CypherLite.run(g,
      "MATCH (x:a)-[:knows]->(y:b) RETURN y.name AS yn ORDER BY yn, x.name")
      .collect().map(_.getString(0)).toList
    assert(mixed === List("gamma", "gamma"))
    // Cypher's own restriction: DISTINCT/aggregates order by returned items
    intercept[IllegalArgumentException] {
      CypherLite.run(g,
        "MATCH (x:a)-[:knows]->(y:b) RETURN DISTINCT y.name AS yn ORDER BY x.name")
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(g,
        "MATCH (x:a)-[:knows]->(y:b) RETURN count(*) AS n ORDER BY x.name")
    }
  }

  test("SKIP offsets past rows under an ORDER BY total order") {
    val all = CypherLite.run(g,
      "MATCH (n) RETURN n.id AS id ORDER BY id").collect().map(_.getString(0)).toList
    val page = CypherLite.run(g,
      "MATCH (n) RETURN n.id AS id ORDER BY id SKIP 1 LIMIT 2").collect().map(_.getString(0)).toList
    assert(page === all.slice(1, 3))
    val tailOnly = CypherLite.run(g,
      "MATCH (n) RETURN n.id AS id ORDER BY id SKIP 3").collect().map(_.getString(0)).toList
    assert(tailOnly === all.drop(3))
  }

  test("an alias not re-projected by a later WITH is out of scope") {
    assertThrows[IllegalArgumentException] {
      CypherLite.run(TpchGraph(spark, sf),
        "MATCH (o:order)-[:placed_by]->(c:customer) " +
          "WITH c, count(o.id) AS n_orders " +
          "MATCH (c)-[:located_in]->(n:nation) " +
          "WITH n " +
          "MATCH (n)-[:in_region]->(r:region) " +
          "RETURN r.name AS region, max(n_orders) AS m")
    }
  }

  private lazy val inlineG: PropertyGraph = {
    import TestSpark.spark.implicits._
    PropertyGraph(
      Seq(
        ("a:1", "a", "alpha", Map("qty" -> "3")),
        ("a:2", "a", "beta", Map("qty" -> "5")),
        ("b:1", "b", "gamma", Map.empty[String, String]),
        ("d:1", "d", "par()en", Map.empty[String, String]))
        .toDF("id", "ntype", "name", "props"),
      Seq(("a:1", "b:1", "knows"), ("a:2", "b:1", "knows"))
        .toDF("src", "dst", "rel"))
  }

  test("inline property maps: fixed column, bag key, numeric value") {
    // String equality on the fixed `name` column.
    assert(CypherLite.run(inlineG, "MATCH (x:a {name: 'beta'}) RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList === List("a:2"))
    // Numeric (unquoted) literal compares numerically against the bag.
    assert(CypherLite.run(inlineG, "MATCH (x:a {qty: 3}) RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList === List("a:1"))
    // Multi-entry map: its comma must not split the multi-pattern MATCH.
    val out = CypherLite.run(inlineG,
      "MATCH (x:a {name: 'alpha', qty: 3}), (x)-[:knows]->(y) RETURN y.id AS yid")
      .collect().map(_.getString(0)).toList
    assert(out === List("b:1"))
    // A missing bag key compares NULL → no match, Cypher semantics.
    assert(CypherLite.run(inlineG, "MATCH (x:b {qty: 3}) RETURN x.id AS xid").count() === 0L)
  }

  test("anonymous nodes get fresh variables; quoted parens stay data") {
    val xs = CypherLite.run(inlineG, "MATCH (x:a)-[:knows]->() RETURN x.id AS xid ORDER BY xid")
      .collect().map(_.getString(0)).toList
    assert(xs === List("a:1", "a:2"))
    // Typed anonymous endpoint.
    assert(CypherLite.run(inlineG, "MATCH (x)-[:knows]->(:b) RETURN count(*) AS n")
      .collect().head.getLong(0) === 2L)
    // Two anonymous nodes in one body are distinct variables (no
    // accidental shared-variable join between them).
    assert(CypherLite.run(inlineG,
      "MATCH (x:a)-[:knows]->(), (x)-[:knows]->() RETURN count(*) AS n")
      .collect().head.getLong(0) === 2L)
    // `()` inside a quoted literal is data, not an anonymous node.
    assert(CypherLite.run(inlineG, "MATCH (x:d {name: 'par()en'}) RETURN x.id AS xid")
      .collect().map(_.getString(0)).toList === List("d:1"))
  }

  test("path variable binds the var-length hop depth, read via length(p)") {
    // chain a:1 -> a:2 -> a:3: from a:1, depth 1 reaches a:2, depth 2
    // reaches a:3 — one row per (endpoints, depth)
    val cg = TestSparkData.chainGraph(spark)
    val out = CypherLite.run(cg,
      "MATCH p = (x:a)-[:n*1..3]->(y) WHERE x.name = 'one' " +
        "RETURN y.id AS yid, length(p) AS depth ORDER BY depth")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("a:2", 1L), ("a:3", 2L)))
    // length(p) in WHERE prunes levels; implicit grouping over the depth
    val counts = CypherLite.run(cg,
      "MATCH p = (x:a)-[:n*1..2]->(y) WHERE length(p) = 1 " +
        "RETURN length(p) AS depth, count(*) AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(counts === List((1L, 2L)))
    // a single-hop binding carries depth 1
    assert(CypherLite.run(cg, "MATCH p = (x:a)-[:n]->(y) RETURN length(p) AS d")
      .collect().map(_.getLong(0)).toList === List(1L, 1L))
    // a pair reachable at TWO depths keeps one row per depth: add the
    // shortcut edge a:1 -> a:3
    import TestSpark.spark.implicits._
    val shortcut = graph.PropertyGraph(cg.nodes,
      cg.edges.union(Seq(("a:1", "a:3", "n")).toDF("src", "dst", "rel")))
    val multi = CypherLite.run(shortcut,
      "MATCH p = (x:a)-[:n*1..2]->(y) WHERE x.name = 'one' " +
        "RETURN y.id AS yid, length(p) AS depth ORDER BY depth, yid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(multi === List(("a:2", 1L), ("a:3", 1L), ("a:3", 2L)))
    // guardrails: multi-relationship chains and edge variables reject
    intercept[IllegalArgumentException] {
      CypherLite.run(cg, "MATCH p = (x:a)-[:n]->(y)-[:n]->(z) RETURN length(p) AS d")
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(cg, "MATCH p = (x:a)-[r:n]->(y) RETURN length(p) AS d")
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(cg, "MATCH (x:a)-[:n]->(y) RETURN length(x) AS d")
    }
  }

  test("shortestPath keeps only the minimum depth per endpoint pair") {
    import TestSpark.spark.implicits._
    val cg = TestSparkData.chainGraph(spark)
    // shortcut a:1 -> a:3 next to the 2-hop chain: plain path binding
    // yields a:3 at depths 1 AND 2; shortestPath collapses to depth 1
    val shortcut = graph.PropertyGraph(cg.nodes,
      cg.edges.union(Seq(("a:1", "a:3", "n")).toDF("src", "dst", "rel")))
    val out = CypherLite.run(shortcut,
      "MATCH p = shortestPath((x:a {name: 'one'})-[:n*1..2]->(y)) " +
        "RETURN y.id AS yid, length(p) AS depth ORDER BY yid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("a:2", 1L), ("a:3", 1L)))
    // without the wrapper the same pattern keeps both depths of a:3
    assert(CypherLite.run(shortcut,
      "MATCH p = (x:a {name: 'one'})-[:n*1..2]->(y) RETURN count(*) AS n")
      .collect().head.getLong(0) === 3L)
    // shortestPath requires a bound path variable
    intercept[IllegalArgumentException] {
      CypherLite.run(cg, "MATCH shortestPath((x:a)-[:n*1..2]->(y)) RETURN count(*) AS n")
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

  test("relationships(p) projects the sorted union-over-walks hop-step set") {
    val out = CypherLite.run(g,
      "MATCH p = (x:a)-[:knows|in*1..2]->(z) " +
        "RETURN x.id AS xid, z.id AS zid, relationships(p) AS rs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[String](2).toList)).toSet
    assert(out === Set(
      ("a:1", "b:1", List("a:1>b:1")),
      ("a:2", "b:1", List("a:2>b:1")),
      ("a:1", "c:1", List("a:1>b:1", "b:1>c:1")),
      ("a:2", "c:1", List("a:2>b:1", "b:1>c:1"))))
    // …and length(p) on the same pattern still works
    assert(CypherLite.run(g,
      "MATCH p = (x:a)-[:knows*1..2]->(y:b) RETURN length(p) AS d, count(*) AS n ORDER BY d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList === List((1L, 2L)))
  }

  test("nodes(p) projects the sorted union-over-walks node set per (endpoints, depth) row") {
    val out = CypherLite.run(g,
      "MATCH p = (x:a)-[:knows|in*1..2]->(z) " +
        "RETURN x.id AS xid, z.id AS zid, length(p) AS d, nodes(p) AS ns")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getSeq[String](3).toList))
      .toSet
    assert(out === Set(
      ("a:1", "b:1", 1L, List("a:1", "b:1")),
      ("a:2", "b:1", 1L, List("a:2", "b:1")),
      ("a:1", "c:1", 2L, List("a:1", "b:1", "c:1")),
      ("a:2", "c:1", 2L, List("a:2", "b:1", "c:1"))))
    // undirected back-walk: a:1 -2-> a:1 passes only through b:1; the
    // a:1 -2-> a:2 row's set carries both endpoints plus the interior
    val undirected = CypherLite.run(g,
      "MATCH p = (x:a {id: 'a:1'})-[:knows*2..2]-(y:a) RETURN y.id AS yid, nodes(p) AS ns")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toSet
    assert(undirected === Set(
      ("a:1", List("a:1", "b:1")),
      ("a:2", List("a:1", "a:2", "b:1"))))
  }

  test("nodes(p) unions interiors across PARALLEL walks, incl. under shortestPath") {
    import TestSpark.spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // s → m1 → t and s → m2 → t: one (s, t, 2) row whose node set must
    // contain BOTH interiors (union over all walks of that length).
    val diamond = PropertyGraph(
      Seq(("s", "v", "s"), ("m1", "v", "m1"), ("m2", "v", "m2"), ("t", "w", "t"))
        .toDF("id", "ntype", "name"),
      Seq(("s", "m1", "e"), ("s", "m2", "e"), ("m1", "t", "e"), ("m2", "t", "e"))
        .toDF("src", "dst", "rel"))
    val rows = CypherLite.run(diamond,
      "MATCH p = (x:v {id: 's'})-[:e*2..2]->(y:w) RETURN y.id AS yid, nodes(p) AS ns")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toList
    assert(rows === List(("t", List("m1", "m2", "s", "t"))))
    val short = CypherLite.run(diamond,
      "MATCH p = shortestPath((x:v {id: 's'})-[:e*1..3]->(y:w)) " +
        "RETURN y.id AS yid, length(p) AS d, nodes(p) AS ns")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList)).toList
    assert(short === List(("t", 2L, List("m1", "m2", "s", "t"))))
    // both projections together: the edge-step union spans both walks
    val both = CypherLite.run(diamond,
      "MATCH p = (x:v {id: 's'})-[:e*2..2]->(y:w) " +
        "RETURN y.id AS yid, nodes(p) AS ns, relationships(p) AS rs")
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList, r.getSeq[String](2).toList))
      .toList
    assert(both === List(
      ("t", List("m1", "m2", "s", "t"), List("m1>t", "m2>t", "s>m1", "s>m2"))))
  }

  // ---- write subset (runWrite) ----

  test("enumeratePaths: real per-trail multiplicity, trail uniqueness, loud cap refusal") {
    import TestSpark.spark.implicits._
    // diamond: s reaches t along BOTH interiors — the depth projection
    // collapses these to one (s, t, 2) row; enumeration must keep both
    val dg = PropertyGraph(
      Seq(("s", "x", "s"), ("m1", "x", "m1"), ("m2", "x", "m2"), ("t", "x", "t"))
        .toDF("id", "ntype", "name"),
      Seq(("s", "m1", "e"), ("s", "m2", "e"), ("m1", "t", "e"), ("m2", "t", "e"))
        .toDF("src", "dst", "rel"))
    val paths = CypherLite.enumeratePaths(dg, "(a {name: 's'})-[:e*2..2]->(b)", cap = 100L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(paths.toSet === Set(
      ("s", "t", 2L, "s>m1>t"), ("s", "t", 2L, "s>m2>t")),
      "one row per distinct trail, not per (endpoints, depth)")
    // vs the depth projection: run() yields ONE (s,t) depth-2 row
    assert(CypherLite.run(dg,
      "MATCH p = (a)-[:e*2..2]->(b) WHERE a.name = 's' RETURN count(*) AS n")
      .head().getLong(0) === 1L)
    // trail uniqueness: undirected 2-hops from m1 may step m1>s>m2 and
    // m1>t>m2, but never back down the SAME edge (no m1>s>m1)
    val und = CypherLite.enumeratePaths(dg, "(a {name: 'm1'})-[:e*2..2]-(b)", cap = 100L)
      .collect().map(_.getString(3))
    assert(und.toSet === Set("m1>s>m2", "m1>t>m2"))
    // the cap refuses LOUDLY, naming the limit, before returning junk
    val e = intercept[IllegalArgumentException] {
      CypherLite.enumeratePaths(dg, "(a)-[:e*1..3]-(b)", cap = 3L).count()
    }
    assert(e.getMessage.contains("exceeded cap 3"))
    // closed-form parity on the corpus: every 2-hop co-purchase trail
    // from the 'small widget' parts ≡ the lineitem-derived pair count
    val enumN = SparkEntry.queries("search_cypher_path_enum")(spark, sf).count()
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val seeds = Tables.load(spark, sf, "part")
      .filter(col("p_name") === "small widget").select(col("p_partkey").as("sp"))
    val expect = seeds.join(li.withColumnRenamed("p", "sp"), Seq("sp"))
      .join(li, Seq("o")).filter(col("p") =!= col("sp")).count()
    assert(enumN === expect && enumN > 0)
  }

  test("runWrite MERGE node upserts keep-existing; CREATE shares the id semantics") {
    val g1 = CypherLite.runWrite(g, "MERGE (x:a {id: 'a:9', name: 'new', tag: 'v1'})")
    val row = g1.nodes.filter(col("id") === "a:9").collect()
    assert(row.length === 1)
    assert(row.head.getAs[String]("name") === "new")
    assert(row.head.getAs[Map[String, String]]("props") === Map("tag" -> "v1"))
    // merging an EXISTING id keeps the stored row (ON CREATE SET semantics)
    val g2 = CypherLite.runWrite(g1, "MERGE (x:a {id: 'a:9', name: 'overwrite'})")
    assert(g2.nodes.filter(col("id") === "a:9").collect().head.getAs[String]("name") === "new")
    val g3 = CypherLite.runWrite(g1, "CREATE (x:a {id: 'a:9', name: 'overwrite'})")
    assert(g3.nodes.filter(col("id") === "a:9").collect().head.getAs[String]("name") === "new")
    // the source graph value is untouched (immutable mutation plans)
    assert(g.nodes.filter(col("id") === "a:9").count() === 0L)
  }

  test("runWrite MERGE edge writes the edge only, deduped on the triplet") {
    val g1 = CypherLite.runWrite(g, "MERGE (a {id: 'a:1'})-[:likes {w: '2'}]->(b {id: 'c:1'})")
    val e = g1.edges.filter(col("rel") === "likes").collect()
    assert(e.length === 1 && e.head.getAs[String]("src") === "a:1")
    assert(e.head.getAs[Map[String, String]]("props") === Map("w" -> "2"))
    // re-merging the same triplet keeps one row with the stored bag
    val g2 = CypherLite.runWrite(g1, "MERGE (a {id: 'a:1'})-[:likes {w: '9'}]->(b {id: 'c:1'})")
    val e2 = g2.edges.filter(col("rel") === "likes").collect()
    assert(e2.length === 1 && e2.head.getAs[Map[String, String]]("props") === Map("w" -> "2"))
  }

  test("runWrite executes the kuzu adapter's node MERGE template verbatim (ON CREATE SET n += …)") {
    // kuzu/adapter.py:371-375, parameter-substituted — including the
    // template's own newlines/indentation and timestamp(...) values.
    val template =
      """MERGE (n:Node {id: 'd:1'})
        |            ON CREATE SET n += {name: 'Doc One', type: 'doc', created_at: timestamp('2024-01-01 00:00:00.000000'), updated_at: timestamp('2024-01-01 00:00:00.000000')}""".stripMargin
    val g1 = CypherLite.runWrite(g, template)
    val row = g1.nodes.filter(col("id") === "d:1").collect()
    assert(row.length === 1)
    // :Node is the adapters' universal label; `type` in the map IS the type
    assert(row.head.getAs[String]("ntype") === "doc")
    assert(row.head.getAs[String]("name") === "Doc One")
    assert(row.head.getAs[Map[String, String]]("props") ===
      Map("created_at" -> "2024-01-01 00:00:00.000000",
        "updated_at" -> "2024-01-01 00:00:00.000000"))
    // re-running the template is a no-op: the id exists, ON CREATE skips
    val g2 = CypherLite.runWrite(g1, template.replace("Doc One", "Doc Uno"))
    assert(g2.nodes.filter(col("id") === "d:1").collect().head
      .getAs[String]("name") === "Doc One")
    // ON MATCH SET fires only against the pre-existing row: updated_at
    // moves (and name via the fixed-column route), created_at stays
    val g3 = CypherLite.runWrite(g2,
      "MERGE (n:Node {id: 'd:1'}) ON CREATE SET n += {type: 'doc'} " +
        "ON MATCH SET n.updated_at = timestamp('2024-06-01 00:00:00'), n.name = 'Doc One Revised'")
    val r3 = g3.nodes.filter(col("id") === "d:1").collect().head
    assert(r3.getAs[String]("name") === "Doc One Revised")
    assert(r3.getAs[Map[String, String]]("props") ===
      Map("created_at" -> "2024-01-01 00:00:00.000000",
        "updated_at" -> "2024-06-01 00:00:00"))
    // …and NOT against a just-created one
    val g4 = CypherLite.runWrite(g,
      "MERGE (n:Node {id: 'd:2'}) ON CREATE SET n += {type: 'doc'} ON MATCH SET n.seen = 'y'")
    assert(g4.nodes.filter(col("id") === "d:2").collect().head
      .getAs[Map[String, String]]("props") === Map.empty)
  }

  test("runWrite executes the kuzu adapter's edge MERGE template verbatim (MATCH-MATCH-MERGE + ON …)") {
    // kuzu/adapter.py:280-292, parameter-substituted
    def template(from: String, to: String, rematch: String = "r.updated_at = timestamp('2024-06-01 00:00:00')") =
      s"""MATCH (from:Node), (to:Node)
         |            WHERE from.id = '$from' AND to.id = '$to'
         |            MERGE (from)-[r:EDGE {
         |                relationship_name: 'likes'
         |            }]->(to)
         |            ON CREATE SET
         |                r.created_at = timestamp('2024-01-01 00:00:00'),
         |                r.properties = '{}'
         |            ON MATCH SET
         |                $rematch""".stripMargin
    val g1 = CypherLite.runWrite(g, template("a:1", "c:1"))
    val e1 = g1.edges.filter(col("rel") === "likes").collect()
    assert(e1.length === 1 && e1.head.getAs[String]("src") === "a:1"
      && e1.head.getAs[String]("dst") === "c:1")
    assert(e1.head.getAs[Map[String, String]]("props") ===
      Map("created_at" -> "2024-01-01 00:00:00", "properties" -> "{}"))
    // re-run: MERGE matches → ON MATCH updates, ON CREATE props kept
    val g2 = CypherLite.runWrite(g1, template("a:1", "c:1"))
    val e2 = g2.edges.filter(col("rel") === "likes").collect()
    assert(e2.length === 1)
    assert(e2.head.getAs[Map[String, String]]("props") ===
      Map("created_at" -> "2024-01-01 00:00:00", "properties" -> "{}",
        "updated_at" -> "2024-06-01 00:00:00"))
    // a missing endpoint MATCHes nothing → the MERGE is a no-op
    val g5 = CypherLite.runWrite(g, template("a:1", "ghost:1"))
    assert(g5.edges.filter(col("rel") === "likes").count() === 0L)
  }

  test("runWrite ON-clause guards and the SET += map-merge form") {
    // ON CREATE/ON MATCH SET are MERGE-only clauses
    intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "CREATE (x:a {id: 'a:9'}) ON CREATE SET x.k = 'v'")
    }
    intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MATCH (x:a) ON CREATE SET x.k = 'v'")
    }
    // SET += merges into the bag, preserving untouched keys
    val g1 = CypherLite.runWrite(g, "MATCH (x:a) WHERE x.name = 'alpha' SET x.old = '1'")
    val g2 = CypherLite.runWrite(g1,
      "MATCH (x:a) WHERE x.name = 'alpha' SET x += {s1: 'v1', s2: 'v2'}")
    val bag = g2.nodes.filter(col("id") === "a:1").collect().head
      .getAs[Map[String, String]]("props")
    assert(bag === Map("old" -> "1", "s1" -> "v1", "s2" -> "v2"))
  }

  test("runWrite SET updates the bag and the fixed name column for matched nodes only") {
    val g1 = CypherLite.runWrite(g, "MATCH (x:a) WHERE x.name = 'alpha' SET x.seen = 'y'")
    val bags = g1.nodes.collect().map(r =>
      r.getAs[String]("id") -> r.getAs[Map[String, String]]("props")).toMap
    assert(bags("a:1") === Map("seen" -> "y"))
    assert(bags("a:2") === Map.empty)
    val g2 = CypherLite.runWrite(g, "MATCH (x:b) SET x.name = 'renamed'")
    assert(g2.nodes.filter(col("id") === "b:1").collect().head.getAs[String]("name") === "renamed")
    assert(g2.nodes.filter(col("id") === "a:1").collect().head.getAs[String]("name") === "alpha")
    // identity columns refuse SET
    intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MATCH (x:a) SET x.id = 'zz'")
    }
  }

  test("runWrite SET on a bound edge variable rewrites matched edge bags only") {
    val g1 = CypherLite.runWrite(g, "MATCH (x:a)-[r:knows]->(y:b) SET r.w = '5'")
    val bags = g1.edges.collect().map(r =>
      (r.getAs[String]("src"), r.getAs[String]("rel")) -> r.getAs[Map[String, String]]("props")).toMap
    assert(bags(("a:1", "knows")) === Map("w" -> "5"))
    assert(bags(("a:2", "knows")) === Map("w" -> "5"))
    assert(bags(("b:1", "in")) === Map.empty, "unmatched relation must keep its bag")
    // a WHERE narrows the matched edge set
    val g2 = CypherLite.runWrite(g,
      "MATCH (x:a)-[r:knows]->(y:b) WHERE x.name = 'alpha' SET r.w = '9'")
    val bags2 = g2.edges.collect().map(r =>
      (r.getAs[String]("src"), r.getAs[String]("rel")) -> r.getAs[Map[String, String]]("props")).toMap
    assert(bags2(("a:1", "knows")) === Map("w" -> "9"))
    assert(bags2(("a:2", "knows")) === Map.empty)
    // identity columns refuse SET
    intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MATCH (x:a)-[r:knows]->(y:b) SET r.rel = 'zz'")
    }
  }

  test("runWrite REMOVE drops the key from matched bags only; fixed columns refuse") {
    val g1 = CypherLite.runWrite(g, "MATCH (x:a) SET x.tag = 'v'")
    val g2 = CypherLite.runWrite(g1, "MATCH (x:a) WHERE x.name = 'alpha' REMOVE x.tag")
    val bags = g2.nodes.collect().map(r =>
      r.getAs[String]("id") -> r.getAs[Map[String, String]]("props")).toMap
    assert(bags("a:1") === Map.empty)
    assert(bags("a:2") === Map("tag" -> "v"), "unmatched node must keep its bag")
    // removing an absent key is a no-op, not an error (Cypher semantics)
    assert(CypherLite.runWrite(g, "MATCH (x:a) REMOVE x.ghost")
      .nodes.count() === g.nodes.count())
    // edge REMOVE undoes an edge SET
    val e1 = CypherLite.runWrite(g, "MATCH (x:a)-[r:knows]->(y:b) SET r.w = '5'")
    val e2 = CypherLite.runWrite(e1, "MATCH (x:a)-[r:knows]->(y:b) REMOVE r.w")
    assert(e2.edges.collect().forall(r => r.getAs[Map[String, String]]("props").isEmpty))
    intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MATCH (x:a) REMOVE x.name")
    }
    // the read path rejects REMOVE like every other write clause
    intercept[IllegalArgumentException] {
      CypherLite.run(g, "MATCH (x:a) REMOVE x.tag")
    }
  }

  test("runWrite DETACH DELETE cascades incident edges; plain DELETE is rejected by contract") {
    val g1 = CypherLite.runWrite(g, "MATCH (y:b {id: 'b:1'}) DETACH DELETE y")
    assert(g1.nodes.filter(col("id") === "b:1").count() === 0L)
    assert(g1.edges.count() === 0L, "every edge touched b:1")
    val e = intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MATCH (y:b {id: 'b:1'}) DELETE y")
    }
    assert(e.getMessage.contains("DETACH"))
  }

  test("the read path rejects write clauses (read-only contexts stay read-only)") {
    for (w <- Seq(
        "CREATE (x:a {id: 'a:9'})",
        "MERGE (x:a {id: 'a:9'})",
        "MATCH (x:a) SET x.k = 'v'",
        "MATCH (x:a) DETACH DELETE x")) {
      val e = intercept[IllegalArgumentException] { CypherLite.run(g, w) }
      assert(e.getMessage.contains("read-only"), w)
    }
    // …but write KEYWORDS inside string literals are data, not clauses
    assert(CypherLite.run(g,
      "MATCH (x:a) WHERE x.name = 'please CREATE and DELETE me' RETURN x.id AS id").count() === 0L)
  }

  test("ON items must bind the merged element's variable — wrong/unbindable vars are rejected") {
    // an ON MATCH item binding a matched ENDPOINT of an edge template
    // must fail loudly, not silently write onto the edge
    val e1 = intercept[IllegalArgumentException] {
      CypherLite.runWrite(g,
        "MATCH (from:Node), (to:Node) WHERE from.id = 'a:1' AND to.id = 'b:1' " +
          "MERGE (from)-[r:EDGE { relationship_name: 'knows' }]->(to) " +
          "ON MATCH SET from.seen = '1'")
    }
    assert(e1.getMessage.contains("may only bind"))
    // a var-less merged element cannot bind ON items at all
    val e2 = intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MERGE (:a {id: 'a:9'}) ON CREATE SET x.k = 'v'")
    }
    assert(e2.getMessage.contains("no variable"))
  }

  test("a key in both the MERGE pattern map and ON CREATE SET resolves last-write-wins") {
    val m = CypherLite.runWrite(g,
      "MERGE (n:a {id: 'a:80', k: 'from-pattern'}) ON CREATE SET n.k = 'from-on-create'")
    val row = m.nodesP.filter(org.apache.spark.sql.functions.col("id") === "a:80").head()
    val props = row.getMap[String, String](row.fieldIndex("props"))
    assert(props("k") == "from-on-create")
  }

  test("duplicate keys inside ONE node pattern map resolve last-write-wins (no mapKeyDedupPolicy crash)") {
    // Cypher map-literal semantics: {k: 'first', k: 'second'} keeps the
    // last write. Pinned so a Spark upgrade (or a refactor back to a
    // map() literal, which throws under the default
    // spark.sql.mapKeyDedupPolicy=EXCEPTION) can't silently change it.
    val m = CypherLite.runWrite(g,
      "MERGE (n:a {id: 'a:81', k: 'first', k: 'second'})")
    val row = m.nodesP.filter(org.apache.spark.sql.functions.col("id") === "a:81").head()
    val props = row.getMap[String, String](row.fieldIndex("props"))
    assert(props("k") == "second")
  }

  test("ON MATCH on the edge template is gated by the endpoint MATCH (dangling edge untouched)") {
    // plant a dangling edge whose endpoints are NOT nodes
    val dangling = CypherLite.runWrite(g,
      "MERGE (x {id: 'ghost:1'})-[:haunts]->(y {id: 'ghost:2'})")
    // the adapters' template MATCHes both endpoints as nodes — nothing
    // matches, so the whole statement (ON MATCH included) is a no-op
    val after = CypherLite.runWrite(dangling,
      "MATCH (from:Node), (to:Node) WHERE from.id = 'ghost:1' AND to.id = 'ghost:2' " +
        "MERGE (from)-[r:EDGE { relationship_name: 'haunts' }]->(to) " +
        "ON MATCH SET r.seen = '1'")
    val edge = after.edgesP.filter(org.apache.spark.sql.functions.col("src") === "ghost:1").head()
    val props = edge.getMap[String, String](edge.fieldIndex("props"))
    assert(!props.contains("seen"))
  }

  test("ON MATCH SET of 'type' under the :Node universal label is rejected, not shadow-written") {
    CypherLite.runWrite(g, "MERGE (n:Node {id: 'd:9', type: 'doc'})") // create
    val e = intercept[IllegalArgumentException] {
      CypherLite.runWrite(g, "MERGE (n:Node {id: 'a:1'}) ON MATCH SET n.type = 'chunk'")
    }
    assert(e.getMessage.contains("ntype identity"))
  }

  test("compact is the identity on a mutated graph (chain compaction)") {
    var m = CypherLite.runWrite(g, "MERGE (x:a {id: 'a:77', name: 'new'})")
    m = CypherLite.runWrite(m, "MATCH (x:a {id: 'a:77'}) SET x.k = 'v'")
    val c = m.compact
    def nodeSet(pg: graph.PropertyGraph) = pg.nodesP
      .selectExpr("id", "ntype", "name", "array_sort(map_entries(props)) AS pe")
      .collect().map(_.toString).toSet
    def edgeSet(pg: graph.PropertyGraph) = pg.edgesP
      .selectExpr("src", "dst", "rel", "array_sort(map_entries(props)) AS pe")
      .collect().map(_.toString).toSet
    assert(nodeSet(c) === nodeSet(m))
    assert(edgeSet(c) === edgeSet(m))
    // and the compacted plan is a bare scan — no residual mutation plan
    assert(c.nodes.queryExecution.optimizedPlan.collectLeaves().size === 1)
    assert(!c.nodes.queryExecution.optimizedPlan.toString.contains("Join"))
    // the one-pass kind-tagged variant is the same identity, and its
    // two legs read the SAME single stored relation (one eager pass)
    val c1 = m.compactOnePass
    assert(nodeSet(c1) === nodeSet(m))
    assert(edgeSet(c1) === edgeSet(m))
    assert(c1.nodes.queryExecution.optimizedPlan.collectLeaves().size === 1)
    assert(!c1.nodes.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  private def graphSets(pg: graph.PropertyGraph) = (
    pg.nodesP.selectExpr("id", "ntype", "name", "array_sort(map_entries(props)) AS pe")
      .collect().map(_.toString).toSet,
    pg.edgesP.selectExpr("src", "dst", "rel", "array_sort(map_entries(props)) AS pe")
      .collect().map(_.toString).toSet)

  test("runWriteChain ≡ foldLeft(runWrite) — batched probes answer identically") {
    // the hard cases the batched probe pass must get right:
    //   1. statement 2 re-merges the node statement 1 created → its ON
    //      MATCH must FIRE even though the segment-start snapshot says
    //      the node is absent (the driver-side increment adjustment);
    //   2. statement 4 gates on the node statement 3 never created
    //      (ghost endpoint) → whole statement no-op, ON MATCH included,
    //      even against the pre-existing dangling ghost edge;
    //   3. statement 5 re-merges the template edge statement 4 skipped
    //      but statement 6 created → ON MATCH keys on the PRE-state;
    //   4. a MATCH-driven SET splits the chain (data-dependent keys) —
    //      segments probe against the then-current graph.
    val withGhostEdge = graph.PropertyGraph(g.nodesP, g.edgesP.unionByName(
      CypherLite.runWrite(g, "MERGE (a {id: 'ghost:1'})-[:knows {old: '1'}]->(b {id: 'a:1'})")
        .edgesP.filter(col("src") === "ghost:1")))
    val stmts = Seq(
      "MERGE (x:a {id: 'a:50', name: 'fresh'}) ON CREATE SET x.born = '1' ON MATCH SET x.seen = '1'",
      "MERGE (x:a {id: 'a:50', name: 'fresh'}) ON CREATE SET x.born = '2' ON MATCH SET x.seen = '1'",
      "MATCH (x:a {id: 'a:50'}) SET x.mid = '1'",
      "MATCH (from:Node), (to:Node) WHERE from.id = 'ghost:1' AND to.id = 'a:1' " +
        "MERGE (from)-[r:knows {w: '9'}]->(to) ON MATCH SET r.seen = '1'",
      "MATCH (from:Node), (to:Node) WHERE from.id = 'a:50' AND to.id = 'a:1' " +
        "MERGE (from)-[r:knows {w: '3'}]->(to) ON CREATE SET r.made = '1' ON MATCH SET r.re = '1'",
      "MATCH (from:Node), (to:Node) WHERE from.id = 'a:50' AND to.id = 'a:1' " +
        "MERGE (from)-[r:knows {w: '5'}]->(to) ON CREATE SET r.made = '2' ON MATCH SET r.re = '1'")
    val sequential = stmts.foldLeft(withGhostEdge)(CypherLite.runWrite)
    val chained = CypherLite.runWriteChain(withGhostEdge, stmts)
    assert(graphSets(chained) === graphSets(sequential))
    // the behaviors themselves (not just parity): in-segment ON MATCH
    // fired on the re-merge, the ghost gate no-op'd, the edge re-merge
    // kept created props and added the matched stamp
    def bag(r: org.apache.spark.sql.Row): scala.collection.Map[String, String] =
      r.getMap[String, String](r.fieldIndex("props"))
    val n50 = bag(chained.nodesP.filter(col("id") === "a:50").head())
    assert(n50.get("born").contains("1") && n50.get("seen").contains("1")
      && n50.get("mid").contains("1"))
    val ghost = bag(chained.edgesP.filter(col("src") === "ghost:1").head())
    assert(!ghost.contains("seen") && ghost.get("old").contains("1"))
    val e50 = bag(chained.edgesP
      .filter(col("src") === "a:50" && col("dst") === "a:1").head())
    assert(e50.get("made").contains("1") && e50.get("re").contains("1")
      && e50.get("w").contains("3"))
  }

  test("runWriteChain: a probe-free template segment pays zero probe jobs") {
    // CREATE/MERGE without gates or ON clauses collect no probe keys —
    // the chain must not spend an action on an empty probe set. Job
    // groups are thread-local, so the count is isolated from any other
    // suite running on the shared session.
    spark.sparkContext.setJobGroup("chain-zero-probe", "probe-free segment")
    val out = CypherLite.runWriteChain(g, Seq(
      "MERGE (x:a {id: 'a:60', name: 'n60'})",
      "MERGE (a {id: 'a:60'})-[:likes {w: '1'}]->(b {id: 'c:1'})"))
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("chain-zero-probe").length
    spark.sparkContext.clearJobGroup()
    assert(jobs === 0, "empty probe set must not launch a probe action")
    assert(out.nodesP.filter(col("id") === "a:60").count() === 1L)
  }
}
