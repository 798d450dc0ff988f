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

  /** Deequ-style DATA VALIDATION report — the constraint-check pass a
    * training-data pipeline runs before trusting an ingest (uniqueness,
    * completeness, consistency, well-formedness, NaN hygiene), one row
    * per check with its exact violation count.
    *
    * Scale shape: ONE full-scan aggregate per table (every per-row
    * predicate folds into the same hash-aggregate pass — adding a check
    * adds a column, not a scan), the 1-row results cross-assembled and
    * exploded into the report rows. No joins, no windows; violation
    * counts are exact, not sampled. */
  def validate(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val d = docs.agg(
      (count(lit(1)) - countDistinct(col("doc_id"))).as("doc_id_dup"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L).otherwise(0L))
        .as("text_empty"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_chars_drift"),
      sum(when(col("lang").isNull || length(col("lang")) =!= 2, 1L).otherwise(0L))
        .as("lang_malformed"),
      sum(when(col("source").isNull, 1L).otherwise(0L)).as("source_null"))
    val e = load(spark, dir, "embeddings").agg(
      (count(lit(1)) - countDistinct(col("vec_id"))).as("vec_id_dup"),
      (countDistinct(size(col("embedding"))) - 1).as("dim_nonuniform"),
      sum(when(exists(col("embedding"), x => isnan(x)), 1L).otherwise(0L))
        .as("embedding_nan"))
    d.crossJoin(broadcast(e))
      .select(explode(array(
        struct(lit("doc_id_unique").as("check"), col("doc_id_dup").as("violations")),
        struct(lit("text_non_empty").as("check"), col("text_empty").as("violations")),
        struct(lit("n_chars_consistent").as("check"), col("n_chars_drift").as("violations")),
        struct(lit("lang_wellformed").as("check"), col("lang_malformed").as("violations")),
        struct(lit("source_complete").as("check"), col("source_null").as("violations")),
        struct(lit("vec_id_unique").as("check"), col("vec_id_dup").as("violations")),
        struct(lit("embedding_dim_uniform").as("check"), col("dim_nonuniform").as("violations")),
        struct(lit("embedding_no_nan").as("check"), col("embedding_nan").as("violations"))
      )).as("c"))
      .select(col("c.check").as("check"), col("c.violations").cast("long").as("violations"),
        (col("c.violations") === 0L).as("passed"))
  }

  val validateSql: String =
    """WITH d AS (
      |  SELECT count(*) - count(DISTINCT doc_id) AS doc_id_dup,
      |    sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS text_empty,
      |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS n_chars_drift,
      |    sum(CASE WHEN lang IS NULL OR length(lang) <> 2 THEN 1 ELSE 0 END) AS lang_malformed,
      |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS source_null
      |  FROM documents
      |), e AS (
      |  SELECT count(*) - count(DISTINCT vec_id) AS vec_id_dup,
      |    count(DISTINCT len(embedding)) - 1 AS dim_nonuniform,
      |    sum(CASE WHEN list_aggregate(list_transform(embedding, x -> isnan(x)), 'bool_or')
      |        THEN 1 ELSE 0 END) AS embedding_nan
      |  FROM embeddings
      |)
      |SELECT u.check, u.violations, u.violations = 0 AS passed
      |FROM d, e, LATERAL (VALUES
      |  ('doc_id_unique', CAST(doc_id_dup AS BIGINT)),
      |  ('text_non_empty', CAST(text_empty AS BIGINT)),
      |  ('n_chars_consistent', CAST(n_chars_drift AS BIGINT)),
      |  ('lang_wellformed', CAST(lang_malformed AS BIGINT)),
      |  ('source_complete', CAST(source_null AS BIGINT)),
      |  ('vec_id_unique', CAST(vec_id_dup AS BIGINT)),
      |  ('embedding_dim_uniform', CAST(dim_nonuniform AS BIGINT)),
      |  ('embedding_no_nan', CAST(embedding_nan AS BIGINT))
      |) AS u("check", violations)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_datasets" -> ((s: SparkSession, d: String) => datasets(s, d)),
    "data_validate" -> ((s: SparkSession, d: String) => validate(s, d)),
    "store_doc_ingest" -> ((s: SparkSession, d: String) => storeDocIngest(s, d)))

  def oracles: Map[String, String] = Map(
    "data_datasets" -> datasetsSql,
    "data_validate" -> validateSql,
    "store_doc_ingest" -> storeDocIngestSql)
}
