package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan).
  *
  * Every implemented operator is exposed as a named query over a
  * testdata sf-dir, with a DuckDB-equivalent oracle SQL where the
  * semantics are ANSI-SQL-expressible (SURVEY.md §4 determinism rules).
  */
object SparkEntry {

  private val registry: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.RelationalOps.queries, operators.RelationalOps.oracles),
      (operators.EventOps.queries, operators.EventOps.oracles),
      (operators.TextOps.queries, operators.TextOps.oracles),
      (operators.VectorOps.queries, operators.VectorOps.oracles),
      (operators.DedupOps.queries, operators.DedupOps.oracles),
      (operators.CurateOps.queries, operators.CurateOps.oracles),
      (operators.DatasetOps.queries, operators.DatasetOps.oracles),
      (operators.EvalOps.queries, operators.EvalOps.oracles),
      (operators.OntologyOps.queries, operators.OntologyOps.oracles),
      (operators.CodeGraphOps.queries, operators.CodeGraphOps.oracles),
      (operators.Retrievers.queries, operators.Retrievers.oracles),
      (operators.MultimodalOps.queries, operators.MultimodalOps.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (graph.GraphQueries.queries, graph.GraphQueries.oracles),
      (graph.RelationalMigration.queries, graph.RelationalMigration.oracles),
      (streaming.StreamQueries.queries, streaming.StreamQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Completion-context assembly exercises the vector engine
    * (cosine top-k), the graph engine (insight triplets), and the
    * document store in one plan. */
  def entry(spark: SparkSession): DataFrame =
    operators.Retrievers.completionContext(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    registry.map(_._2).reduce(_ ++ _)
}
