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

  /** Scale-aware expansion-parallelism pin: a per-row EXPANSION stage
    * (explode to shingles/bigrams/features, per-row hashing) does work
    * proportional to its OUTPUT, which neither the scan planner nor AQE
    * can see — both size stages by INPUT bytes, so a small corpus lands
    * in a handful of splits and the whole expansion runs near-serial
    * (measured: text_bigram_nll 7.0 → 1.8 s, curate_dsir 5.1 → 2.3 s at
    * sf0.1 from this pin alone). Round-robin repartition the narrow
    * input rows to the session parallelism — but ONLY when the scan is
    * under-split: at cluster scale the corpus already arrives in
    * thousands of splits and the repartition would be a pure full-data
    * shuffle tax, so it's skipped.
    *
    * SCAN INPUTS ONLY: the partition probe is plan-time, which is
    * accurate for file scans but sees the pre-AQE estimate for a plan
    * containing shuffles (AQE later coalesces the executed exchange, so
    * spread would silently no-op — the renderedTriplets artifact hit
    * exactly this). Post-shuffle pins must repartition unconditionally. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = spark.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** events.parquet's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a raw long via the legacy nanosAsLong conf, set at session
    * construction by GraftSession) and native TIMESTAMP(MICROS) (read as
    * TimestampType/TimestampNTZType). Branch on the *loaded* schema rather
    * than assuming a writer precision, and expose a uniform surface either
    * way: a TimestampType `ts` plus an exact whole-seconds BIGINT `ts_sec`
    * — all downstream temporal math uses whole seconds so the DuckDB
    * oracle (`CAST(floor(epoch(ts)) AS BIGINT)`) can't drift (SURVEY.md
    * §4). In the nanos branch use integer `DIV`, never double division:
    * epoch-ns (~1.7e18) exceeds double's 2^53 exact-integer range. In the
    * timestamp branch `unix_timestamp` is exact whole seconds under the
    * session's UTC zone, and NTZ is cast to TimestampType (identity at
    * UTC) so consumers see one type regardless of isAdjustedToUTC.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_timestamp}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw epoch-ns long
        raw
          .withColumn("ts_sec", expr("ts DIV 1000000000"))
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType =>
        raw.withColumn("ts_sec", unix_timestamp(col("ts")))
      case TimestampNTZType =>
        val asTz = raw.withColumn("ts", col("ts").cast(TimestampType))
        asTz.withColumn("ts_sec", unix_timestamp(col("ts")))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column has unsupported type $other " +
            "(expected TIMESTAMP(NANOS) as long, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }

  /** Register every table as a temp view (used by the SQL/cypher surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") loadEvents(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
