package graft

import graft.graph.{CypherLite, PropertyGraph}
import graft.operators.OntologyRdf
import org.apache.spark.sql.functions._

class OntologyRdfSpec extends SparkSpecBase {

  private val fixture =
    s"""<?xml version="1.0"?>
       |<rdf:RDF xmlns:rdf="${OntologyRdf.RdfNs}" xmlns:rdfs="${OntologyRdf.RdfsNs}"
       |         xmlns:owl="${OntologyRdf.OwlNs}" xmlns:ex="http://example.org/cars#">
       |  <owl:Class rdf:about="http://example.org/cars#Vehicle"/>
       |  <owl:Class rdf:about="http://example.org/cars#Car">
       |    <rdfs:subClassOf rdf:resource="http://example.org/cars#Vehicle"/>
       |  </owl:Class>
       |  <owl:ObjectProperty rdf:about="http://example.org/cars#made_by"/>
       |  <owl:Class rdf:about="http://example.org/cars#Maker"/>
       |  <rdf:Description rdf:about="http://example.org/cars#Audi">
       |    <rdf:type rdf:resource="http://example.org/cars#Car"/>
       |    <ex:made_by rdf:resource="http://example.org/cars#Audi AG"/>
       |    <rdfs:label>audi the car</rdfs:label>
       |  </rdf:Description>
       |  <rdf:Description rdf:about="http://example.org/cars#Audi AG">
       |    <rdf:type rdf:resource="http://example.org/cars#Maker"/>
       |  </rdf:Description>
       |</rdf:RDF>""".stripMargin

  test("parseRdfXml handles typed elements, Descriptions, resources and literals") {
    val triples = OntologyRdf.parseRdfXml(fixture)
    val ex = "http://example.org/cars#"
    assert(triples.contains((s"${ex}Vehicle", s"${OntologyRdf.RdfNs}type", s"${OntologyRdf.OwlNs}Class")))
    assert(triples.contains((s"${ex}Car", s"${OntologyRdf.RdfsNs}subClassOf", s"${ex}Vehicle")))
    assert(triples.contains((s"${ex}Audi", s"${OntologyRdf.RdfNs}type", s"${ex}Car")))
    assert(triples.contains((s"${ex}Audi", s"${ex}made_by", s"${ex}Audi AG")))
    assert(triples.contains((s"${ex}Audi", s"${OntologyRdf.RdfsNs}label", "audi the car")))
  }

  test("uriToKey normalizes fragments, paths, case and spaces") {
    assert(OntologyRdf.uriToKey("http://example.org/cars#Audi AG") === "audi_ag")
    assert(OntologyRdf.uriToKey("http://example.org/things/Big Truck") === "big_truck")
    assert(OntologyRdf.uriToKey("http://example.org/things/Truck/") === "truck")
  }

  test("buildLookup classifies classes, individuals and object properties") {
    val lookup = OntologyRdf.buildLookup(OntologyRdf.parseRdfXml(fixture))
    assert(lookup.classes.keySet === Set("vehicle", "car", "maker"))
    assert(lookup.individuals.keySet === Set("audi", "audi_ag"))
    assert(lookup.objectProps.map(OntologyRdf.uriToKey) === Seq("made_by"))
  }

  test("getSubgraph BFS walks is_a and object properties, faithful to the reference") {
    val triples = OntologyRdf.parseRdfXml(fixture)
    val lookup = OntologyRdf.buildLookup(triples)
    val (_, edges, _) = OntologyRdf.getSubgraph(triples, lookup, lookup.individuals("audi"))
    // individual typing, the maker hop, class-typing of every reached
    // class (rdf:type owl:Class rides the BFS in individuals mode), and
    // the subClassOf chain
    assert(edges.toSet === Set(
      ("audi", "is_a", "car"),
      ("audi", "made_by", "audi_ag"),
      ("audi_ag", "is_a", "maker"),
      ("car", "is_a", "class"),
      ("car", "is_a", "vehicle"),
      ("maker", "is_a", "class"),
      ("vehicle", "is_a", "class")))
  }

  test("undirected getSubgraph also walks object properties backward") {
    val triples = OntologyRdf.parseRdfXml(fixture)
    val lookup = OntologyRdf.buildLookup(triples)
    val (_, edges, _) =
      OntologyRdf.getSubgraph(triples, lookup, lookup.individuals("audi_ag"), directed = false)
    assert(edges.contains(("audi", "made_by", "audi_ag"))) // reverse-discovered
    assert(edges.contains(("audi", "is_a", "car")))        // then walked forward
  }

  test("loadRdfXml round-trips through the filesystem") {
    val tmp = java.nio.file.Files.createTempFile("graft_onto", ".owl")
    java.nio.file.Files.writeString(tmp, fixture)
    val loaded = OntologyRdf.loadRdfXml(spark, tmp.toString)
    assert(loaded === OntologyRdf.parseRdfXml(fixture))
    java.nio.file.Files.delete(tmp)
  }

  test("mergeIntoGraph attaches ontology nodes/edges via the bulk merge path, idempotently") {
    import TestSpark.spark.implicits._
    val g = PropertyGraph(
      Seq(("d:1", "doc", "one")).toDF("id", "ntype", "name"),
      Seq(("d:1", "d:1", "self")).toDF("src", "dst", "rel"))
    val triples = OntologyRdf.parseRdfXml(fixture)
    val merged = OntologyRdf.mergeIntoGraph(spark, g, triples)
    val out = CypherLite.run(merged,
      "MATCH (x:ontology_individual)-[:is_a]->(c:ontology_class) " +
        "RETURN x.name AS xn, c.name AS cn ORDER BY xn")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(out === List(("audi", "car"), ("audi_ag", "maker")))
    // original graph content survives the merge
    assert(merged.nodes.filter(col("ntype") === "doc").count() === 1L)
    // re-merging the same ontology adds nothing (anti-join idempotence)
    val again = OntologyRdf.mergeIntoGraph(spark, merged, triples)
    assert(again.nodes.count() === merged.nodes.count())
    assert(again.edges.count() === merged.edges.count())
  }

  test("ontology_graph resolves exact and fuzzy entities and attaches their subgraphs") {
    val out = SparkEntry.queries("ontology_graph")(spark, sf)
    val rows = out.collect()
    // every entity resolves (exact on even keys, fuzzy on odd)
    val methods = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(methods.count(_._2 == "exact") === 13)
    assert(methods.count(_._2 == "fuzzy") === 12)
    // the fuzzy misspelling resolves to its true nation
    val f = rows.filter(_.getString(0) == "nation_1x")
    assert(f.nonEmpty && f.forall(_.getString(2) == "nation_1"))
    // a chain-start entity sees its whole region chain plus the class spine
    val n0 = rows.filter(_.getString(0) == "nation_0")
      .map(r => (r.getString(3), r.getString(4), r.getString(5))).toSet
    assert(n0.contains(("nation_0", "neighbor_of", "nation_5")))
    assert(n0.contains(("nation_20", "is_a", "africa")))
    assert(n0.contains(("africa", "is_a", "place")))
    assert(n0.contains(("place", "is_a", "class")))
    // chain-end entity: no outgoing neighbor_of from nation_20 itself
    assert(!rows.filter(_.getString(0) == "nation_20")
      .exists(r => r.getString(4) == "neighbor_of" && r.getString(3) == "nation_20"))
  }
}
