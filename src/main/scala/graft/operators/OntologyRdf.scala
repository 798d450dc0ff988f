package graft.operators

import graft.Tables.load
import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RDF/XML (OWL) ontology ingestion — the Spark-native re-expression of
  * cognee's RDFLibOntologyResolver (reference: cognee/modules/ontology/
  * rdf_xml/RDFLibOntologyResolver.py: `build_lookup` at :58 — classes =
  * subjects of rdf:type owl:Class, individuals = subjects typed by any
  * class; `get_subgraph` at :116 — BFS over is_a edges (rdf:type in
  * individuals mode, rdfs:subClassOf always) plus owl:ObjectProperty
  * edges).
  *
  * Scale shape: an ontology file is a DIMENSION — the reference holds it
  * in an in-memory rdflib graph, and the same contract holds here: the
  * parsed triple set, lookup tables, and per-root BFS subgraphs are
  * driver-side Scala over a vocabulary-sized document, then BROADCAST.
  * The corpus side stays distributed: entity resolution is one pass of
  * the (arbitrarily large) entity relation against the broadcast
  * vocabulary — an exact equi-join picks off exact matches, the
  * remainder scores the broadcast terms with the levenshtein similarity
  * (matching_strategies.py FuzzyMatchingStrategy, cutoff 0.8) — and
  * subgraph attachment is an equi-join against the broadcast
  * (root → subgraph edges) relation. Nothing corpus-sized ever reaches
  * the driver.
  *
  * The XML subset parsed is the two standard RDF/XML striped shapes
  * rdflib emits for OWL vocabularies: typed node elements
  * (`<owl:Class rdf:about=…>`) and `<rdf:Description rdf:about=…>`
  * carriers, with `rdf:resource` object properties and text literals.
  */
object OntologyRdf {

  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RdfsNs = "http://www.w3.org/2000/01/rdf-schema#"
  val OwlNs = "http://www.w3.org/2002/07/owl#"
  private val RdfType = RdfNs + "type"
  private val SubClassOf = RdfsNs + "subClassOf"
  private val OwlClass = OwlNs + "Class"
  private val OwlObjectProperty = OwlNs + "ObjectProperty"

  /** (subject, predicate, object) — URIs (or a literal in object
    * position for text property elements). */
  type Triple = (String, String, String)

  case class OntologyLookup(classes: Map[String, String], individuals: Map[String, String],
      objectProps: Seq[String])

  /** RDFLibOntologyResolver._uri_to_key: fragment after '#', else the
    * last path segment; lowercased, spaces → underscores, trimmed. */
  def uriToKey(uri: String): String = {
    val name = if (uri.contains("#")) uri.split("#").last
      else uri.stripSuffix("/").split("/").last
    name.toLowerCase.replace(" ", "_").trim
  }

  /** Parse an RDF/XML document into triples. Typed node elements yield
    * an rdf:type triple for the element's own QName; every child
    * property element yields one triple — `rdf:resource` objects as
    * URIs, element text otherwise (literal). */
  def parseRdfXml(xml: String): Seq[Triple] = {
    val root = scala.xml.XML.loadString(xml)
    require(root.label == "RDF", s"not an RDF/XML document (root <${root.label}>)")
    root.child.collect { case e: scala.xml.Elem => e }.flatMap { e =>
      val subj = e.attribute(RdfNs, "about").map(_.text)
        .getOrElse(throw new IllegalArgumentException(s"node element <${e.label}> missing rdf:about"))
      val selfType: Seq[Triple] =
        if (e.namespace == RdfNs && e.label == "Description") Seq.empty
        else Seq((subj, RdfType, e.namespace + e.label))
      val props: Seq[Triple] = e.child.collect { case p: scala.xml.Elem => p }.map { p =>
        val pred = p.namespace + p.label
        p.attribute(RdfNs, "resource") match {
          case Some(r) => (subj, pred, r.text)
          case None => (subj, pred, p.text.trim)
        }
      }
      selfType ++ props
    }
  }

  /** Load + parse an ontology file through the Hadoop filesystem (works
    * against HDFS/S3 paths on a cluster, not just local disk). */
  def loadRdfXml(spark: SparkSession, path: String): Seq[Triple] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parseRdfXml(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** build_lookup (RDFLibOntologyResolver.py:58): classes keyed by
    * normalized name; individuals = subjects whose rdf:type object is a
    * class URI; object properties for the BFS. */
  def buildLookup(triples: Seq[Triple]): OntologyLookup = {
    val classes = triples.collect { case (s, RdfType, OwlClass) => uriToKey(s) -> s }.toMap
    val classUris = classes.values.toSet
    val individuals = triples.collect {
      case (s, RdfType, o) if classUris(o) => uriToKey(s) -> s
    }.toMap
    val objectProps = triples.collect { case (s, RdfType, OwlObjectProperty) => s }.distinct.sorted
    OntologyLookup(classes, individuals, objectProps)
  }

  /** get_subgraph (RDFLibOntologyResolver.py:116): BFS from the root
    * URI. In individuals mode every visited node's rdf:type objects
    * become `is_a` edges (faithfully including the class-typing edges a
    * reached owl:Class subject contributes); rdfs:subClassOf always
    * walks; each owl:ObjectProperty walks forward (and backward when
    * undirected). Returns (node URIs, key-level edges, root URI). */
  def getSubgraph(triples: Seq[Triple], lookup: OntologyLookup, rootUri: String,
      nodeType: String = "individuals", directed: Boolean = true)
      : (Seq[String], Seq[(String, String, String)], String) = {
    val bySubjPred = triples.groupBy(t => (t._1, t._2))
    val byObjPred = triples.groupBy(t => (t._3, t._2))
    def objectsOf(s: String, p: String): Seq[String] =
      bySubjPred.getOrElse((s, p), Seq.empty).map(_._3)
    def subjectsOf(p: String, o: String): Seq[String] =
      byObjPred.getOrElse((o, p), Seq.empty).map(_._1)
    val queue = scala.collection.mutable.Queue(rootUri)
    val visited = scala.collection.mutable.Set(rootUri)
    val nodes = scala.collection.mutable.LinkedHashSet(rootUri)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def walk(from: String, rel: String, to: String): Unit = {
      edges += ((uriToKey(from), rel, uriToKey(to)))
      if (!visited(to)) { visited += to; queue += to }
      nodes += to
    }
    while (queue.nonEmpty) {
      val current = queue.dequeue()
      if (nodeType == "individuals")
        objectsOf(current, RdfType).foreach(walk(current, "is_a", _))
      objectsOf(current, SubClassOf).foreach(walk(current, "is_a", _))
      lookup.objectProps.foreach { prop =>
        val pk = uriToKey(prop)
        objectsOf(current, prop).foreach(walk(current, pk, _))
        if (!directed) subjectsOf(prop, current).foreach { source =>
          edges += ((uriToKey(source), pk, uriToKey(current)))
          if (!visited(source)) { visited += source; queue += source }
          nodes += source
        }
      }
    }
    (nodes.toSeq, edges.toSeq, rootUri)
  }

  // ---------------------------------------------------------------------
  // Deterministic OWL fixture derived from the region/nation dims: a
  // `place` root class, one class per region (subClassOf place), and one
  // individual per nation typed by its region class, chained to the
  // next-larger nation key in the same region by the `neighbor_of`
  // object property. Generated + parsed through the real RDF/XML path,
  // so the oracle can derive the expected subgraphs from the same tables.
  // ---------------------------------------------------------------------

  private val GeoNs = "http://graft.example/geo#"

  def generateOwl(nations: Seq[(Long, String, Long)], regions: Seq[(Long, String)]): String = {
    def uri(name: String): String = GeoNs + name.replace(" ", "_")
    val regionByKey = regions.toMap
    val classDecls = regions.sortBy(_._1).map { case (_, rn) =>
      s"""  <owl:Class rdf:about="${uri(rn)}">
         |    <rdfs:subClassOf rdf:resource="${uri("PLACE")}"/>
         |  </owl:Class>""".stripMargin
    }
    val byRegion = nations.groupBy(_._3)
    val next: Map[Long, String] = byRegion.values.flatMap { ns =>
      val sorted = ns.sortBy(_._1)
      sorted.zip(sorted.drop(1)).map { case ((k, _, _), (_, nn, _)) => k -> nn }
    }.toMap
    val individuals = nations.sortBy(_._1).map { case (k, nn, rk) =>
      val nbr = next.get(k).fold("")(nn2 =>
        s"""\n    <geo:neighbor_of rdf:resource="${uri(nn2)}"/>""")
      s"""  <rdf:Description rdf:about="${uri(nn)}">
         |    <rdf:type rdf:resource="${uri(regionByKey(rk))}"/>$nbr
         |  </rdf:Description>""".stripMargin
    }
    s"""<?xml version="1.0"?>
       |<rdf:RDF xmlns:rdf="$RdfNs" xmlns:rdfs="$RdfsNs" xmlns:owl="$OwlNs" xmlns:geo="$GeoNs">
       |  <owl:Class rdf:about="${uri("PLACE")}"/>
       |${classDecls.mkString("\n")}
       |  <owl:ObjectProperty rdf:about="${uri("neighbor_of")}"/>
       |${individuals.mkString("\n")}
       |</rdf:RDF>""".stripMargin
  }

  /** Resolve corpus entities against a loaded ontology and attach each
    * entity's BFS subgraph: exact matches via equi-join, the remainder
    * fuzzy-scored against the broadcast vocabulary (cutoff 0.8, best
    * candidate by similarity then term — FuzzyMatchingStrategy), then
    * one equi-join against the broadcast per-root subgraph edges.
    * Entities take the normalized nation names with a deterministic
    * one-character misspelling on odd keys, exercising both paths. */
  def ontologyGraph(spark: SparkSession, dir: String, cutoff: Double = 0.8): DataFrame = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder, newStringEncoder}
    val nation = load(spark, dir, "nation")
    val region = load(spark, dir, "region")
    // dims are tiny by contract (SURVEY §5): collected once to build the
    // in-memory ontology document, like the reference's rdflib graph
    val nrows = nation.select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val rrows = region.select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val triples = parseRdfXml(generateOwl(nrows, rrows))
    val lookup = buildLookup(triples)
    val subRows = lookup.individuals.toSeq.sortBy(_._1).flatMap { case (k, u) =>
      val (_, edges, _) = getSubgraph(triples, lookup, u)
      edges.map(e => (k, e._1, e._2, e._3))
    }
    val subDf = subRows.toDF("root", "src", "rel", "dst")
    val vocabDf = lookup.individuals.keys.toSeq.sorted.toDF("term")

    val ents = nation.select(concat(lower(col("n_name")),
      when(col("n_nationkey") % 2 === 1, lit("x")).otherwise(lit(""))).as("entity"))
    val exact = ents.join(broadcast(vocabDf), col("entity") === col("term"))
      .select(col("entity"), col("term"), lit("exact").as("method"))
    val unresolved = ents.join(broadcast(vocabDf), col("entity") === col("term"), "left_anti")
    // floor-rounded similarity (SURVEY §4: composite scores floor to
    // dodge engine round-half disagreements on exact boundaries)
    val sim = floor((lit(1.0) - levenshtein(col("entity"), col("term")) /
      greatest(length(col("entity")), length(col("term"))).cast("double")) * 10000) / 10000
    val w = Window.partitionBy(col("entity")).orderBy(col("sim").desc, col("term").asc)
    val fuzzy = unresolved.crossJoin(broadcast(vocabDf))
      .select(col("entity"), col("term"), sim.as("sim"))
      .filter(col("sim") >= cutoff)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("entity"), col("term"), lit("fuzzy").as("method"))
    exact.union(fuzzy)
      .join(broadcast(subDf), col("term") === col("root"))
      .select(col("entity"), col("method"), col("root"),
        col("src"), col("rel"), col("dst"))
  }

  /** Closed-form derivation of the same subgraphs from the raw tables:
    * chain members are the same-region nations with key ≥ the resolved
    * root's; each member is_a its region class, chains neighbor_of to
    * key+5 in-region, and the BFS faithfully picks up the region class'
    * own typing (is_a place from subClassOf, is_a class from rdf:type
    * owl:Class) plus place's typing. */
  val ontologyGraphSql: String =
    """WITH vocab AS (SELECT n_nationkey AS k, lower(n_name) AS term, n_regionkey AS rk FROM nation),
      |ents AS (
      |  SELECT lower(n_name) || CASE WHEN n_nationkey % 2 = 1 THEN 'x' ELSE '' END AS entity
      |  FROM nation
      |),
      |ex AS (SELECT entity, term, 'exact' AS method, k, rk FROM ents JOIN vocab ON entity = term),
      |unres AS (SELECT entity FROM ents WHERE entity NOT IN (SELECT term FROM vocab)),
      |fz AS (
      |  SELECT entity, term, k, rk,
      |    floor((1.0 - levenshtein(entity, term) * 1.0 / greatest(len(entity), len(term))) * 10000) / 10000 AS sim
      |  FROM unres, vocab
      |),
      |best AS (
      |  SELECT entity, term, 'fuzzy' AS method, k, rk,
      |    row_number() OVER (PARTITION BY entity ORDER BY sim DESC, term ASC) AS rn
      |  FROM fz WHERE sim >= 0.8
      |),
      |res AS (
      |  SELECT entity, term, method, k, rk FROM ex
      |  UNION ALL SELECT entity, term, method, k, rk FROM best WHERE rn = 1
      |),
      |members AS (
      |  SELECT r.entity, r.method, r.term AS root, v.k AS mk, v.term AS mterm, r.rk
      |  FROM res r JOIN vocab v ON v.rk = r.rk AND v.k >= r.k
      |),
      |regions AS (SELECT r_regionkey AS rk, lower(replace(r_name, ' ', '_')) AS rterm FROM region)
      |SELECT m.entity, m.method, m.root, m.mterm AS src, 'is_a' AS rel, r.rterm AS dst
      |  FROM members m JOIN regions r ON r.rk = m.rk
      |UNION ALL
      |SELECT m.entity, m.method, m.root, m.mterm AS src, 'neighbor_of' AS rel, v2.term AS dst
      |  FROM members m JOIN vocab v2 ON v2.k = m.mk + 5 AND v2.rk = m.rk
      |UNION ALL
      |SELECT res.entity, res.method, res.term AS root, r.rterm AS src, 'is_a' AS rel, 'place' AS dst
      |  FROM res JOIN regions r ON r.rk = res.rk
      |UNION ALL
      |SELECT res.entity, res.method, res.term AS root, r.rterm AS src, 'is_a' AS rel, 'class' AS dst
      |  FROM res JOIN regions r ON r.rk = res.rk
      |UNION ALL
      |SELECT entity, method, term AS root, 'place' AS src, 'is_a' AS rel, 'class' AS dst
      |  FROM res""".stripMargin

  /** Merge the loaded ontology into a property graph through the bulk
    * merge path (the reference attaches AttachedOntologyNode subgraphs
    * during cognify and persists them via the graph adapter): classes
    * and individuals become `ontology_class` / `ontology_individual`
    * nodes, the union of per-individual BFS edges becomes the edge
    * increment — both distributed anti-join merges, idempotent on
    * re-ingest. */
  def mergeIntoGraph(spark: SparkSession, g: PropertyGraph, triples: Seq[Triple]): PropertyGraph = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val lookup = buildLookup(triples)
    val nodeRows =
      lookup.classes.keys.toSeq.sorted.map(k => (s"onto:$k", "ontology_class", k)) ++
        lookup.individuals.keys.toSeq.sorted.map(k => (s"onto:$k", "ontology_individual", k))
    val edgeRows = lookup.individuals.toSeq.sortBy(_._1).flatMap { case (_, u) =>
      getSubgraph(triples, lookup, u)._2
    }.distinct.map { case (s, r, d) => (s"onto:$s", s"onto:$d", r) }
    g.mergeNodes(nodeRows.toDF("id", "ntype", "name"))
      .mergeEdges(edgeRows.toDF("src", "dst", "rel"))
  }
}
