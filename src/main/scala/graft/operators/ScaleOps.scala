package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB posture (SURVEY.md §5): explicit skew
  * salting for joins AQE can't fix (e.g. aggregation fan-in on hub
  * keys), and bucketed-table writes for repeated co-located joins.
  */
object ScaleOps {

  /** Salted large×small join for skewed keys: the big side gets a
    * deterministic salt in [0, buckets); the small side is exploded
    * buckets-fold so every (key, salt) partition finds its match. Use
    * when one join key dominates (hub nodes, stop-shingles) and the
    * runtime skew handling needs help — the shuffle then spreads the
    * hot key over `buckets` partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val exploded = small.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a table bucketed+sorted by a join key: repeated joins on
    * that key become shuffle-free (both sides read pre-partitioned).
    * Bucketing survives restarts — the on-disk layout IS the shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
