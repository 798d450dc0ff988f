package graft.streaming

import graft.graph.{PropertyGraph, RelationalMigration}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gated streaming queries — the registered (oracle-checked)
  * face of the streaming twins. Every other ingest twin is spec-gated
  * (batch-parity + replay specs in StreamingSpec/PropertySpecs); this
  * module closes the verification-channel asymmetry the r14 verdict
  * named by putting at least one full streaming contract through the
  * SAME hard CORRECTNESS channel as the batch operators: a
  * MemoryStream-driven, replay-deterministic run whose DuckDB oracle
  * is the batch semantics of the stream's FINAL state.
  *
  * MemoryStream is driver-resident by design (it is Spark's in-process
  * streaming source); the gate feeds the smallest SF-scaling fact
  * table (supplier) through it, so the feed stays bounded at every
  * gate scale. At 100 TB the feed arrives via Kafka/files and the
  * operator under test ([[EventStream.migrateCdcStream]]) is unchanged
  * — only the source differs.
  */
object StreamQueries {

  /** Full CDC contract (INSERT/UPDATE/DELETE + stale replays) over the
    * supplier table, driver-gated: a fixed four-micro-batch script —
    *   b1: INSERT every supplier row (seq 1);
    *   b2: UPDATE rows with s_suppkey % 5 = 2 to s_acctbal = -1.0
    *       (full-row image, seq 2) + a stale replay of 30 inserts
    *       (seq 1 — the latest-wins gate must drop them);
    *   b3: DELETE rows with s_suppkey % 7 = 3 (seq 3 — deletes win
    *       over b2's updates on the overlap);
    *   b4: stale UPDATE images for the deleted keys (seq 2, arriving
    *       AFTER the delete that superseded them) + another insert
    *       replay — the gate drops the whole batch (the empty-batch
    *       path of the foreachBatch contract).
    * The accumulated graph (seeded with the TableType node exactly as
    * the one-shot batch migration seeds it) is read back as the
    * [[RelationalMigration.census]] — so the prop-bag rewrite, the
    * orphan sweep (b2's acctbal rewrites orphan old ColumnValues, b3's
    * deletes orphan more), the FK suppression against the nation
    * parent plan, and the latest-wins gate are ALL under the hash.
    * Oracle: the census of the script's final state in SQL. */
  def cdcMigrate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // (op, seq, s_suppkey, s_name, s_acctbal, s_nationkey)
    type Rec = (String, Long, Long, String, Double, Long)
    // Deterministic BOUNDED feed (s_suppkey < 400): a MemoryStream gate
    // is driver-resident by design, and a gate query's cost should not
    // scale with SF — the CONTRACT under test (latest-wins, delete-vs-
    // update overlap, orphan sweep, empty-batch path) is id-arithmetic,
    // identical on any key subset. sf0.01 feeds all 100 suppliers
    // (keys 1..100), sf0.1+ the 399 keys 1..399.
    val base = graft.Tables.load(spark, dir, "supplier")
      .filter(col("s_suppkey") < 400)
      .select(col("s_suppkey").cast("long"), col("s_name"),
        col("s_acctbal").cast("double"), col("s_nationkey").cast("long"))
      .orderBy(col("s_suppkey"))
      .as[(Long, String, Double, Long)].collect().toSeq

    val inserts: Seq[Rec] = base.map { case (k, n, a, nk) => ("I", 1L, k, n, a, nk) }
    val updates: Seq[Rec] = base.collect {
      case (k, n, _, nk) if k % 5 == 2 => ("U", 2L, k, n, -1.0, nk)
    }
    val deletes: Seq[Rec] = base.collect {
      case (k, _, _, _) if k % 7 == 3 => ("D", 3L, k, null, 0.0, 0L)
    }
    val staleForDeleted: Seq[Rec] = base.collect {
      case (k, n, _, nk) if k % 7 == 3 => ("U", 2L, k, n, -1.0, nk)
    }
    val batches = Seq(
      inserts,
      updates ++ inserts.take(30),
      deletes,
      staleForDeleted ++ inserts.take(20))

    val nationKeys = graft.Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("string").as("fkv")).distinct()
    val typeNodes = Seq(("tabletype:supplier", "TableType", "supplier")).toDF("id", "ntype", "name")
    var g = PropertyGraph(
      PropertyGraph.ensureProps(typeNodes),
      PropertyGraph.ensureProps(
        Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))

    val stream = MemoryStream[(String, Long, Long, String, Double, Long)]
    // A driver-resident gate stream over a bounded feed does not need
    // the session's full state-store width: every micro-batch of a
    // stateful query pays per-partition state commits + task rounds, so
    // 32 shuffle partitions × 4 batches is pure fixed overhead here.
    // Scoped to the stream and restored — production migrateCdcStream
    // deployments keep their session's width.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    // NOTE: an AQE-off scope was MEASURED here and rejected (12 s →
    // 30 s): the gate is job-count-bound (213 jobs, 0.8 MB shuffle),
    // but the mutation layers are stats-less checkpointed scans whose
    // joins only become broadcasts through AQE's runtime sizes — the
    // static planner sort-merges everything at width 1 and loses far
    // more than the per-stage job rounds cost.
    try {
      val q = EventStream.migrateCdcStream(
        stream.toDF().toDF("op", "seq", "s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
        "supplier", "s_suppkey", Seq(("s_nationkey", "nation", nationKeys)),
        // per-batch compact, like every accumulating transact consumer:
        // the mutation layers stack self-referentially (each batch's
        // pre-image captures read the previous batches' rewrites), and
        // an uncompacted 3-deep stack already sends Catalyst into a
        // multi-minute optimization blowup — compaction is the
        // documented chain-depth contract (PropertyGraph.compact)
        f => { g = f(g).compactOnePass })
      try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    RelationalMigration.census(g)
  }

  /** Census of the script's FINAL state: rows surviving b3's delete,
    * with b2's acctbal rewrite applied. Value-rendering injectivity per
    * column type is the same contract migrateCensusSql documents. */
  val cdcMigrateSql: String =
    """WITH final AS (
      |  SELECT s_suppkey, s_name,
      |    CASE WHEN s_suppkey % 5 = 2 THEN -1.0 ELSE s_acctbal END AS s_acctbal,
      |    s_nationkey
      |  FROM supplier WHERE s_suppkey % 7 <> 3 AND s_suppkey < 400
      |),
      |census(kind, label, n) AS (
      |  SELECT 'node', 'TableType:supplier', 1
      |  UNION ALL SELECT 'node', 'TableRow:supplier', count(DISTINCT s_suppkey) FROM final
      |  UNION ALL SELECT 'node', 'ColumnValue:supplier:s_name', count(DISTINCT s_name) FROM final
      |  UNION ALL SELECT 'node', 'ColumnValue:supplier:s_acctbal', count(DISTINCT s_acctbal) FROM final
      |  UNION ALL SELECT 'edge', 'is_part_of:supplier', count(*) FROM final
      |  UNION ALL SELECT 'edge', 's_name:supplier', count(s_name) FROM final
      |  UNION ALL SELECT 'edge', 's_acctbal:supplier', count(s_acctbal) FROM final
      |  UNION ALL SELECT 'edge', 's_nationkey:supplier',
      |    (SELECT count(*) FROM final JOIN nation ON s_nationkey = n_nationkey)
      |)
      |SELECT kind, label, CAST(n AS BIGINT) AS n FROM census""".stripMargin

  /** 30-minute-gap sessionization driver-gated THROUGH THE STREAMING
    * ENGINE: the [[EventStream.sessionize]] mapGroupsWithState operator
    * fed a deterministic bounded cohort — the first 2500 events of
    * users < 40 in (sec, event_id) order (a fixed slice at every SF;
    * the contract under test is gap arithmetic, identical on any
    * subset) — in four fixed time-ordered micro-batches, then one
    * sentinel event per user at maxSec + 7200 s. The sentinel's >30 min
    * gap CLOSES every open session through the normal gap path (the
    * same rounding applied to every mid-stream close), so the
    * timeout-flush path — whose wall-clock trigger would not be
    * replay-deterministic — never fires (`flushOnTimeout = false`).
    * Sessions the sentinels themselves open are dropped by their
    * start_s. Output rows are collected per micro-batch into a driver
    * buffer (bounded by the cohort's session count) — no catalog-
    * registered memory sink to collide across repeat gate runs.
    * Oracle: the batch window-function sessionization
    * ([[graft.operators.EventOps.sessionizeSql]] shape) over the same
    * ordered cohort slice. Session ids match by construction: the
    * stream numbers per user in arrival order, the batch by cumulative
    * new-session count in the identical (sec, event_id) order. */
  /** The shared deterministic event cohort (first 2500 events of users
    * < 40 in (sec, event_id) order — bounded at every SF) split into
    * four fixed time-ordered micro-batches. Both event gates feed it. */
  private def eventCohort(spark: SparkSession, dir: String): Seq[Event] = {
    import spark.implicits._
    graft.Tables.loadEvents(spark, dir)
      .select(col("event_id").cast("long"), col("ts_sec").cast("long"),
        col("user_id").cast("long"), col("event_type"), col("value").cast("double"))
      .filter(col("user_id") < 40)
      .orderBy(col("ts_sec"), col("event_id"))
      .limit(2500)
      .as[(Long, Long, Long, String, Double)].collect().toSeq
      .map { case (id, sec, uid, et, v) => Event(id, sec, uid, et, v) }
  }

  private def cohortBatches(cohort: Seq[Event]): Seq[Seq[Event]] = {
    val n = cohort.size
    Seq(cohort.slice(0, n / 4), cohort.slice(n / 4, n / 2),
      cohort.slice(n / 2, 3 * n / 4), cohort.slice(3 * n / 4, n))
  }

  /** Drive `plan` over a MemoryStream[Event] fed `batches` in order
    * (processAllAvailable between batches), collecting every appended
    * micro-batch output into a driver buffer — bounded by the gate
    * cohort's output size; no catalog-registered memory sink to collide
    * across repeat gate runs. Width-1 scope, the cdcMigrate discipline:
    * a driver-resident gate stream over a bounded feed pays
    * per-partition state commits × batches as pure fixed overhead at
    * the session's full width. */
  private def driveEventGate(spark: SparkSession, batches: Seq[Seq[Event]])(
      plan: org.apache.spark.sql.Dataset[Event] => DataFrame): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val stream = MemoryStream[Event]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val q = plan(stream.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          out.synchronized { out ++= b.collect() }; ()
        }
        .start()
      try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    out.toSeq
  }

  def sessionizeGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cohort = eventCohort(spark, dir)
    if (cohort.isEmpty) // degenerate corpus: no cohort events, no sessions
      return Seq.empty[(Long, Long, Long, Double, Long, Long)]
        .toDF("user_id", "sess_id", "n_events", "total_value", "start_s", "end_s")
    val sentinelSec = cohort.map(_.tsSec).max + 7200L
    val sentinels = cohort.map(_.userId).distinct.sorted.zipWithIndex.map {
      case (u, i) => Event(-1L - i, sentinelSec, u, "sentinel", 0.0)
    }
    val rows = driveEventGate(spark, cohortBatches(cohort) :+ sentinels)(
      ds => EventStream.sessionize(ds, flushOnTimeout = false).toDF())
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
      .toDF("user_id", "sess_id", "n_events", "total_value", "start_s", "end_s")
      .filter(col("start_s") < sentinelSec) // sentinel-opened sessions
  }

  /** Batch sessionization of the same ordered cohort slice. */
  val sessionizeGateSql: String =
    """WITH cohort AS (
      |  SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      |  FROM events WHERE user_id < 40
      |  ORDER BY sec, event_id LIMIT 2500
      |), flagged AS (
      |  SELECT user_id, value, sec, event_id,
      |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM cohort
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec ASC, event_id ASC)
      |), sessed AS (
      |  SELECT user_id, value, sec,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM flagged
      |)
      |SELECT user_id, sess_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
      |  min(sec) AS start_s, max(sec) AS end_s
      |FROM sessed GROUP BY user_id, sess_id""".stripMargin

  /** Tumbling-window watermark aggregation driver-gated — the third
    * streaming machinery on the hash channel (readStream → watermark →
    * windowed agg, beside the two stateful-API gates): the shared event
    * cohort through [[EventStream.windowedAgg]] (1-hour tumbling
    * windows, 2-hour watermark, append mode). Window rows only emit
    * once the watermark passes their end, so the feed appends TWO
    * sentinel batches at maxSec + 4 h/+ 4 h 1 s: the first advances the
    * max event time past every real window end + the 2-hour delay, the
    * second forces one more micro-batch so the engine applies that
    * watermark and flushes (watermarks take effect one batch late —
    * without a next batch the final windows would sit unemitted in
    * state). The sentinels' own window never closes (nothing later) and
    * is filtered by its hour anyway. Oracle: the batch hour-bucket
    * aggregation of the same cohort slice — window(ts, '1 hour') on
    * whole-second timestamps IS date_trunc('hour', ts) bucketing
    * (sub-second parts cannot cross an hour boundary). */
  def windowAggGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cohort = eventCohort(spark, dir)
    if (cohort.isEmpty)
      return Seq.empty[(java.sql.Timestamp, String, Long, Double)]
        .toDF("hour", "event_type", "n_events", "total_value")
    val sentinelSec = cohort.map(_.tsSec).max + 4L * 3600L
    val sentinels = Seq(
      Seq(Event(-1L, sentinelSec, 0L, "sentinel", 0.0)),
      Seq(Event(-2L, sentinelSec + 1L, 0L, "sentinel", 0.0)))
    val rows = driveEventGate(spark, cohortBatches(cohort) ++ sentinels)(
      ds => EventStream.windowedAgg(ds.toDF()))
    val sentinelHourStart = new java.sql.Timestamp((sentinelSec - sentinelSec % 3600L) * 1000L)
    rows.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toDF("hour", "event_type", "n_events", "total_value")
      .filter(col("hour") < lit(sentinelHourStart))
  }

  /** Batch hour-bucket aggregation of the same ordered cohort slice. */
  val windowAggGateSql: String =
    """WITH cohort AS (
      |  SELECT user_id, event_type, value, ts,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      |  FROM events WHERE user_id < 40
      |  ORDER BY sec, event_id LIMIT 2500
      |)
      |SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM cohort GROUP BY 1, 2""".stripMargin

  /** Watermarked streaming dedup driver-gated — the fourth streaming
    * machinery on the hash channel (dropDuplicatesWithinWatermark state
    * eviction): the shared cohort in four time-ordered micro-batches,
    * then a fifth batch REPLAYING the cohort's final quarter. Every
    * replayed row lands deterministically in one of two drop paths —
    * its key state is still live (event time + 2 h horizon ≥ the
    * watermark set by batch 4) so it is dropped as a duplicate, or its
    * event time is already below the watermark so it is dropped as
    * late input — and in both cases emits nothing, so the survivors
    * are EXACTLY the distinct cohort events. Census by event type (the
    * gate's value is the state machinery, not the row identity the
    * other gates already cover). Oracle: the same census over the
    * cohort slice — event_id is the source's primary key, so the
    * planted replays are the only duplicates. */
  def dedupGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cohort = eventCohort(spark, dir)
    if (cohort.isEmpty)
      return Seq.empty[(String, Long, Double)]
        .toDF("event_type", "n_events", "total_value")
    val replay = cohort.drop(cohort.size - cohort.size / 4)
    val rows = driveEventGate(spark, cohortBatches(cohort) :+ replay)(
      ds => EventStream.dedupStream(ds.toDF()))
    rows.map(r => (r.getString(3), r.getDouble(4)))
      .toDF("event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Census of the distinct cohort events (event_id is unique there). */
  val dedupGateSql: String =
    """WITH cohort AS (
      |  SELECT event_type, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      |  FROM events WHERE user_id < 40
      |  ORDER BY sec, event_id LIMIT 2500
      |)
      |SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM cohort GROUP BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_cdc_migrate" -> ((s: SparkSession, d: String) => cdcMigrate(s, d)),
    "stream_sessionize" -> ((s: SparkSession, d: String) => sessionizeGate(s, d)),
    "stream_window_agg" -> ((s: SparkSession, d: String) => windowAggGate(s, d)),
    "stream_dedup" -> ((s: SparkSession, d: String) => dedupGate(s, d)))

  def oracles: Map[String, String] = Map(
    "stream_cdc_migrate" -> cdcMigrateSql,
    "stream_sessionize" -> sessionizeGateSql,
    "stream_window_agg" -> windowAggGateSql,
    "stream_dedup" -> dedupGateSql)
}
