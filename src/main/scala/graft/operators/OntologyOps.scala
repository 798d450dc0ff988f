package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ontology entity resolution — the Spark-native re-expression of
  * cognee's ontology matching (reference: cognee/modules/ontology/
  * matching_strategies.py: FuzzyMatchingStrategy.find_match — exact
  * match first, else the closest candidate above a similarity cutoff).
  *
  * The ontology vocabulary is a dimension table (small by nature), so
  * it broadcasts; resolution is one pass over the entity side: an
  * equi-join picks off exact matches, the remainder scores the
  * broadcast vocabulary with a levenshtein similarity
  * (1 − dist/maxlen, the public difflib-cutoff analog) and keeps the
  * best candidate ≥ cutoff per entity via a per-entity rank. Scales
  * linearly in entities at any corpus size.
  */
object OntologyOps {

  /** Resolve normalized nation entity names against a vocabulary that
    * carries half exact spellings and half dash-variant spellings —
    * exercising both the exact and fuzzy paths deterministically. */
  def resolve(spark: SparkSession, dir: String, cutoff: Double = 0.8): DataFrame = {
    val nation = load(spark, dir, "nation")
    val entities = nation.select(lower(col("n_name")).as("entity"))
    val terms = nation.select(
      when(col("n_nationkey") % 2 === 0, lower(col("n_name")))
        .otherwise(regexp_replace(lower(col("n_name")), "_", "-")).as("term"))
    val exact = entities.join(broadcast(terms), col("entity") === col("term"))
      .select(col("entity"), col("term"), lit("exact").as("method"), lit(1.0).as("sim"))
    val unresolved = entities.join(broadcast(terms), col("entity") === col("term"), "left_anti")
    // floor-rounded similarity (SURVEY §4: composite scores floor to
    // dodge engine round-half disagreements on exact boundaries)
    val sim = floor((lit(1.0) - levenshtein(col("entity"), col("term")) /
      greatest(length(col("entity")), length(col("term"))).cast("double")) * 10000) / 10000
    val w = Window.partitionBy(col("entity")).orderBy(col("sim").desc, col("term").asc)
    val fuzzy = unresolved.crossJoin(broadcast(terms))
      .select(col("entity"), col("term"), sim.as("sim"))
      .filter(col("sim") >= cutoff)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("entity"), col("term"), lit("fuzzy").as("method"), col("sim"))
    exact.union(fuzzy)
  }

  val resolveSql: String =
    """WITH entities AS (SELECT lower(n_name) AS entity FROM nation),
      |terms AS (
      |  SELECT CASE WHEN n_nationkey % 2 = 0 THEN lower(n_name)
      |              ELSE replace(lower(n_name), '_', '-') END AS term
      |  FROM nation
      |),
      |ex AS (
      |  SELECT entity, term, 'exact' AS method, CAST(1.0 AS DOUBLE) AS sim
      |  FROM entities JOIN terms ON entity = term
      |),
      |unres AS (SELECT entity FROM entities WHERE entity NOT IN (SELECT term FROM terms)),
      |fz AS (
      |  SELECT entity, term,
      |    floor((1.0 - levenshtein(entity, term) * 1.0 / greatest(len(entity), len(term))) * 10000) / 10000 AS sim
      |  FROM unres, terms
      |),
      |best AS (
      |  SELECT entity, term, 'fuzzy' AS method, sim,
      |    row_number() OVER (PARTITION BY entity ORDER BY sim DESC, term ASC) AS rn
      |  FROM fz WHERE sim >= 0.8
      |)
      |SELECT entity, term, method, sim FROM ex
      |UNION ALL SELECT entity, term, method, sim FROM best WHERE rn = 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ontology_resolve" -> ((s: SparkSession, d: String) => resolve(s, d)),
    "ontology_graph" -> ((s: SparkSession, d: String) => OntologyRdf.ontologyGraph(s, d)))

  def oracles: Map[String, String] = Map(
    "ontology_resolve" -> resolveSql,
    "ontology_graph" -> OntologyRdf.ontologyGraphSql)
}
