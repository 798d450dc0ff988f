package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset management surface (reference: cognee/modules/data/methods —
  * get_datasets.py / get_dataset_data.py / get_deletion_counts.py). The
  * `source` column is the dataset key: cognee's Dataset↔Data link table
  * maps here to a plain group-by, and every method is a projection or
  * single keyed aggregation over the documents scan (column-pruned:
  * none of these read `text`).
  *
  * The deletion-PREVIEW half of get_deletion_counts is [[datasets]]
  * filtered to one dataset; the post-delete ledger is
  * `pipeline_delete` (Pipeline.deleteDocs).
  */
object DatasetOps {

  /** Per-dataset inventory (get_datasets + per-dataset Data counts):
    * document count, char volume, language spread, byte-estimate token
    * count. One hash aggregation on the dataset key. */
  def datasets(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(col("source").as("dataset"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(ceil(col("n_chars") / 4.0).cast("long")).as("est_tokens"))

  val datasetsSql: String =
    """SELECT source AS dataset,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(sum(ceil(n_chars / 4.0)) AS BIGINT) AS est_tokens
      |FROM documents GROUP BY 1""".stripMargin

  /** The Data rows of one dataset (get_dataset_data.py:7) — a pushed-down
    * partition-prunable filter, not a join: the dataset key is a column. */
  def datasetData(spark: SparkSession, dir: String, dataset: String): DataFrame =
    load(spark, dir, "documents").filter(col("source") === dataset)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_datasets" -> ((s: SparkSession, d: String) => datasets(s, d)))

  def oracles: Map[String, String] = Map(
    "data_datasets" -> datasetsSql)
}
