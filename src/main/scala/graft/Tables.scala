package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators read through here so partition/pushdown behavior is
  * uniform: parquet scans with column pruning + predicate pushdown
  * handled by the DataFrame plans downstream.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as raw long (legacy conf, set at
    * session construction by GraftSession.tune — loaders never mutate a
    * shared session's conf) and expose both a µs-truncated TimestampType
    * `ts` and an exact whole-seconds `ts_sec` — all downstream temporal
    * math uses whole seconds so the DuckDB oracle (which keeps ns) can't
    * drift (SURVEY.md §4). Integer `DIV`, never double division:
    * epoch-ns (~1.7e18) exceeds double's 2^53 exact-integer range.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via GraftSession (spark.sql.legacy.parquet.nanosAsLong=true " +
        "must be set at construction — events.parquet is TIMESTAMP(NANOS))")
    load(spark, dir, "events")
      .withColumn("ts_sec", org.apache.spark.sql.functions.expr("ts DIV 1000000000"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Register every table as a temp view (used by the SQL/cypher surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") loadEvents(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
