package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's cluster-posture defaults.
  *
  * The same settings scale from local[32] to a 1000-executor cluster:
  * AQE re-plans shuffles at runtime (partition coalescing + skew-join
  * splitting for hot keys — e.g. hub nodes in the graph projection or
  * stop-shingles in dedup), broadcast threshold covers the dimension
  * tables, and shuffle partitions default to the parallelism at hand
  * (override via spark.sql.shuffle.partitions on a real cluster).
  */
object GraftSession {

  def tune(b: SparkSession.Builder, cores: String): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    // events.parquet carries TIMESTAMP(NANOS); read as long everywhere
    // (Tables.loadEvents converts) — session-level so no query body ever
    // has to mutate conf mid-flight.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  /** One-call attach for users switching from the reference: registers
    * every testdata table as a view, the graph projection as
    * `graph_nodes`/`graph_edges` views, and graft's SQL functions —
    * after this, `spark.sql` and `CypherLite.run` cover the reference's
    * query surface. */
  def attach(spark: SparkSession, dir: String): graph.PropertyGraph = {
    Tables.registerAll(spark, dir)
    val g = graph.TpchGraph(spark, dir)
    g.nodes.createOrReplaceTempView("graph_nodes")
    g.edges.createOrReplaceTempView("graph_edges")
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    org.apache.spark.sql.graft.TopKPerGroup.withStrategy(spark)
    g
  }

  /** Local session sized by SPARK_GRAFT_CPUS (the driver contract). */
  def local(appName: String): SparkSession = {
    // Default to the machine: a fixed "4" silently ran every un-exported
    // channel (notably the driver's Bench/Verify) at local[4] on a
    // 32-core box — the entire 2.1x "contention" delta between channels
    // was this. availableProcessors respects cgroup quotas, so the
    // session gets exactly the cores the container actually grants.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val s = tune(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
