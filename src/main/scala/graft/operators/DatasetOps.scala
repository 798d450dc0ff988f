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

  /** The DocumentSource ingest loop as a DRIVER-CHECKED query
    * (previously spec-only): the corpus dumps to line-delimited text
    * files (one doc per line — the corpus carries no newlines),
    * re-ingests through readText, and the inventory aggregate (row
    * count, char volume, distinct texts) must match the source table —
    * a dropped, split, or merged line breaks the compare. The dump dir
    * is stamped by the corpus file listing (regenerated testdata →
    * fresh dump) and written once per stamp. */
  def storeDocIngest(spark: SparkSession, dir: String): DataFrame = {
    val stamp = graft.graph.SessionDirCache.parquetStamp(Seq("documents"))(spark, dir)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "|" + stamp).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val flat = s"${System.getProperty("java.io.tmpdir")}/graft_dstore_$key/docs_txt"
    val p = new org.apache.hadoop.fs.Path(flat)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      load(spark, dir, "documents").select(col("text")).write.mode("overwrite").text(flat)
    graft.sources.DocumentSource.readText(spark, flat, sourceTag = "reingest")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        count_distinct(col("text")).as("n_unique"))
  }

  val storeDocIngestSql: String =
    """SELECT count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  count(DISTINCT text) AS n_unique
      |FROM documents WHERE length(text) > 0""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_datasets" -> ((s: SparkSession, d: String) => datasets(s, d)),
    "store_doc_ingest" -> ((s: SparkSession, d: String) => storeDocIngest(s, d)))

  def oracles: Map[String, String] = Map(
    "data_datasets" -> datasetsSql,
    "store_doc_ingest" -> storeDocIngestSql)
}
