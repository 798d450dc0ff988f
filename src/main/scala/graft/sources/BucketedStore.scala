package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed collection store — the co-located-join scale path SURVEY §5
  * promises (reference analog: the vector/graph backends keep their
  * collections key-organized; on Spark the equivalent artifact is a
  * bucketed table, so repeated joins/aggregations on the bucket key
  * skip their shuffle entirely).
  *
  * Write once bucketed by the join key; every subsequent equi-join or
  * aggregation on that key reads co-located buckets — Catalyst plans
  * SortMergeJoin with NO Exchange on either bucketed side (the
  * BucketedJoinSpec pins exactly that plan shape). At 100 TB this is
  * the difference between re-shuffling the fact table per query and
  * shuffling it once at ingest.
  */
object BucketedStore {

  /** Save df as a bucketed (and in-bucket sorted) external table at
    * `path`. Bucket count should match downstream
    * spark.sql.shuffle.partitions (or divide it) so plans can use the
    * bucketing directly. */
  def write(df: DataFrame, table: String, key: String, nBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (by catalog name). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
