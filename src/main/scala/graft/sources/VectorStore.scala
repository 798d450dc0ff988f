package graft.sources

import graft.operators.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed vector-collection store — the Spark-native face of
  * cognee's vector_db_interface (reference: cognee/infrastructure/
  * databases/vector/vector_db_interface.py and the hybrid adapter's
  * method set: has_collection / create_collection / create_data_points /
  * retrieve / search / batch_search / delete_data_points / prune).
  *
  * A collection is a parquet directory under `root` with schema
  * (vec_id LONG, embedding ARRAY, payload columns...). All paths go
  * through the Hadoop FileSystem API, so the same code addresses
  * local disk, HDFS, or an object store. Point reads/deletes are
  * keyed [anti-]semi-joins — the id set is the small side and
  * broadcasts; deletion is rewrite-on-delete (parquet files are
  * immutable), the standard batch-store contract.
  */
final case class VectorStore(spark: SparkSession, root: String) {

  private def path(name: String) = new org.apache.hadoop.fs.Path(s"$root/$name")
  private def fs =
    new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def hasCollection(name: String): Boolean = fs.exists(path(name))

  /** Create (or replace) a collection from a DataFrame. */
  def createCollection(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path(name).toString)

  def collection(name: String): DataFrame = spark.read.parquet(path(name).toString)

  /** Append new points (create_data_points). Dedup-on-ingest is the
    * caller's contract via deterministic ids — mirroring the reference,
    * which upserts by id. */
  def createDataPoints(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(path(name).toString)

  /** Point lookup by id set (retrieve): broadcast semi-join. */
  def retrieve(name: String, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    collection(name).join(broadcast(ids.toDF("vec_id")), Seq("vec_id"), "left_semi")
  }

  /** Delete by id set: broadcast anti-join + rewrite. */
  def deleteDataPoints(name: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    val remaining = collection(name)
      .join(broadcast(ids.toDF("vec_id")), Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // materialize before overwriting the source files
    remaining.write.mode("overwrite").parquet(path(name).toString)
  }

  private def vcol: Column = transform(col("embedding"), x => x.cast("double"))

  /** Cosine top-k for one query vector (search): score + TakeOrdered.
    * Results carry the point's payload columns (the reference's
    * ScoredResult shape) minus the raw vector. */
  def search(name: String, query: Array[Double], k: Int): DataFrame =
    collection(name)
      .withColumn("cosine", round(VectorOps.cosine(vcol, lit(query)), 4))
      .drop("embedding")
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)

  /** Cosine top-k per query row (batch_search): the query side is
    * bounded (a request batch) and broadcasts; per-query ranking runs
    * on the TopKPerGroup operator — bounded heaps, no per-group sort
    * (the window idiom would range-sort a corpus-sized partition per
    * query). Queries arrive as (query_id, qv ARRAY<DOUBLE>); results
    * carry the payload columns like [[search]]. */
  def batchSearch(name: String, queries: DataFrame, k: Int): DataFrame = {
    val scored = collection(name).crossJoin(broadcast(queries))
      .withColumn("cosine", round(VectorOps.cosine(vcol, col("qv")), 4))
      .drop("embedding", "qv")
    org.apache.spark.sql.graft.TopKPerGroup(
      scored, Seq(col("query_id")), Seq(col("cosine").desc, col("vec_id").asc), k)
  }

  /** Drop every collection under root (prune). */
  def prune(): Unit = fs.delete(new org.apache.hadoop.fs.Path(root), true)
}
