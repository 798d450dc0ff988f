package graft.operators

import graft.Tables.loadEvents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analogs of the streaming/temporal surface (cognee TEMPORAL
  * search — reference: cognee/modules/retrieval/temporal_retriever.py —
  * and the event-stream ingestion the brief mandates). The streaming
  * twins live in graft.streaming.EventStream; these batch versions are
  * the oracle-checkable semantics.
  *
  * Determinism: gap/session math is done on whole SECONDS
  * (unix_timestamp ≡ floor(epoch)) because the parquet timestamps are
  * ns-precision, which Spark truncates to µs but DuckDB keeps — raw
  * sub-second values must never reach the output (SURVEY.md §4).
  */
object EventOps {

  /** Tumbling 1-hour windows per event type — the batch twin of the
    * streaming windowed aggregation. One shuffle on (hour, type). */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    loadEvents(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))

  val windowAggSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** 30-minute-gap sessionization per user (batch semantics; streaming
    * twin uses mapGroupsWithState). Single shuffle on user_id; both
    * window functions reuse the same sort. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    // ORDER BY whole seconds + event_id (never raw ts): Spark holds the
    // parquet timestamp at us, DuckDB at ns — a sub-us tie would break
    // by event_id on one engine and by the ns delta on the other.
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_sec").asc, col("event_id").asc)
    loadEvents(spark, dir)
      .withColumn("sec", col("ts_sec"))
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1L).otherwise(0L))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        min(col("sec")).as("start_s"),
        max(col("sec")).as("end_s"))
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_sess,
      |    ts, event_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) ASC, event_id ASC)
      |), sessed AS (
      |  SELECT user_id, value, sec,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM flagged
      |)
      |SELECT user_id, sess_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
      |  min(sec) AS start_s, max(sec) AS end_s
      |FROM sessed GROUP BY user_id, sess_id""".stripMargin

  /** TEMPORAL search analog: interval-filtered events joined back to
    * per-user profile aggregates (temporal_retriever extracts a time
    * range, filters, then assembles context). Filter is pushed to the
    * parquet scan. */
  def temporalSearch(spark: SparkSession, dir: String): DataFrame =
    temporalInterval(spark, dir, Some("2024-01-08 00:00:00"), Some("2024-01-15 00:00:00"))

  /** QueryInterval semantics (tasks/temporal_graph/models.py
    * QueryInterval: starts_at/ends_at are each OPTIONAL) — either bound
    * may be open; every present bound is one pushed-down scan
    * predicate, so a half-open query ("everything since X") still
    * prunes at the file level on a date-partitioned layout. */
  def temporalInterval(spark: SparkSession, dir: String,
      from: Option[String], until: Option[String]): DataFrame = {
    val bounds = from.map(f => col("ts") >= lit(f)).toSeq ++
      until.map(u => col("ts") < lit(u))
    bounds.foldLeft(loadEvents(spark, dir))((df, p) => df.filter(p))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .filter(col("n_events") >= 3)
  }

  /** TEMPORAL with an open end (starts_at only) — "everything since". */
  def temporalOpen(spark: SparkSession, dir: String): DataFrame =
    temporalInterval(spark, dir, Some("2024-01-20 00:00:00"), None)

  val temporalSearchSql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
      |GROUP BY user_id
      |HAVING count(*) >= 3""".stripMargin

  val temporalOpenSql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
      |GROUP BY user_id
      |HAVING count(*) >= 3""".stripMargin

  /** Date-partitioned event sink: the 100 TB layout — one directory per
    * event date so temporal queries prune partitions at the file index
    * level instead of scanning the full history. */
  def writePartitionedByDay(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(outDir)

  /** Semi-structured payload extraction: parse the JSON props column
    * and aggregate a field per event type (cognee DataPoints carry
    * JSON metadata payloads; this is the Spark-native get_json_object
    * path — codegen'd, no UDF). */
  def propsAgg(spark: SparkSession, dir: String): DataFrame =
    loadEvents(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("double").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(avg(col("k")), 4).as("avg_k"),
        round(min(col("k")), 2).as("min_k"), round(max(col("k")), 2).as("max_k"))

  val propsAggSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  round(avg(CAST(json_extract(props, '$.k') AS DOUBLE)), 4) AS avg_k,
      |  round(min(CAST(json_extract(props, '$.k') AS DOUBLE)), 2) AS min_k,
      |  round(max(CAST(json_extract(props, '$.k') AS DOUBLE)), 2) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Per-user interaction history, MOST RECENT first (reference:
    * cognee/modules/search/operations/get_history.py:8 — the
    * query+result ledger of a user, LIMIT 10; log_query/log_result
    * appends map to event-log appends). DELIBERATE DIVERGENCE: the
    * reference orders by created_at ASCENDING, so its LIMIT 10 returns
    * the user's OLDEST rows — an apparent upstream bug for a "history"
    * surface; recency (descending) is the intended semantics and what
    * this operator implements. The events table is the interaction
    * ledger; the per-user recency top-k is a rank window PARTITIONED BY
    * user (bounded per-user history, never a global sort), tie-broken
    * on event_id for a total order. */
  def history(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    loadEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_sec"))
      .withColumn("pos", row_number().over(byUser))
      .filter(col("pos") <= k)
  }

  val historySql: String =
    """SELECT user_id, event_id, event_type,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, pos
      |FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC) AS pos
      |  FROM events
      |)
      |WHERE pos <= 10""".stripMargin

  /** ONE user's query-ledger rows, most recent first, LIMIT k
    * (reference: modules/search/operations/get_queries.py:8 —
    * `SELECT … FROM Query WHERE user_id = ? ORDER BY created_at DESC
    * LIMIT ?`; get_results.py:7 is the same read over the Result
    * table). The events ledger stands in for the reference's two
    * relational log tables — log_query/log_result appends are event
    * appends — with event_type as the table discriminator: 'view'
    * rows are the user-issued queries, 'purchase' rows the
    * system-returned results; `props` carries the payload the
    * reference's `text`/`value` columns hold.
    *
    * Scale shape: both single-row predicates push to the parquet scan,
    * and the recency LIMIT is a TakeOrderedAndProject (per-partition
    * top-k, merged on the driver — k-bounded, never a global sort of
    * the ledger). Total order via the event_id tiebreak. */
  def userLedger(spark: SparkSession, dir: String, userId: Long,
      eventType: String, k: Int = 10): DataFrame =
    loadEvents(spark, dir)
      .filter(col("user_id") === userId && col("event_type") === eventType)
      .select(col("event_id").as("id"), col("props").as("payload"), col("ts_sec"))
      .orderBy(col("ts_sec").desc, col("id").desc)
      .limit(k)

  private def userLedgerSql(eventType: String): String =
    s"""SELECT event_id AS id, props AS payload,
       |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |FROM events WHERE user_id = 7 AND event_type = '$eventType'
       |ORDER BY ts_sec DESC, id DESC LIMIT 10""".stripMargin

  /** Sequential conversion funnel view → click → purchase: per user,
    * the earliest view, the earliest click strictly after it, the
    * earliest purchase strictly after that (whole-second ordering —
    * SURVEY.md §4); per stage, surviving users and the conversion
    * fraction from the previous stage (floor-truncated at 4 decimals).
    *
    * Scale shape: three keyed aggregation passes over the event scan
    * (filter-pushed per stage), each a user_id shuffle; the final
    * window runs over exactly three stage-count rows. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = loadEvents(spark, dir).select(col("user_id"), col("event_type"), col("ts_sec"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts_sec") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts_sec") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t3"))
    def stageCount(df: DataFrame, stage: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("n"))
        .select(lit(stage).as("stage"), lit(name).as("event_type"), col("n"))
    val counts = stageCount(v, 1L, "view")
      .union(stageCount(c, 2L, "click"))
      .union(stageCount(p, 3L, "purchase"))
    // Exactly 3 rows at any scale; the constant partition key keeps the
    // lag window out of the no-partition-window class the plan lint
    // rejects (pmod(length...) survives optimization — the repo-wide
    // bounded-rank idiom).
    val w = Window.partitionBy(pmod(coalesce(length(col("event_type")), lit(0)), lit(1)))
      .orderBy(col("stage"))
    counts
      .withColumn("prev", lag(col("n"), 1).over(w))
      .select(col("stage"), col("event_type"), col("n").as("n_users"),
        // stage 1 (no predecessor) converts at 1.0 by definition; an
        // EMPTY predecessor stage leaves conversion undefined (NULL) —
        // coalescing the 0-divisor NULL to 1.0 read as "100% conversion
        // out of an empty stage" and silently diverged from the oracle.
        when(col("prev").isNull, lit(1.0))
          .otherwise(floor(try_divide(col("n").cast("double"), col("prev")) * 10000) / 10000)
          .as("conversion"))
  }

  val funnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
      |),
      |v AS (SELECT user_id, min(sec) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.sec) AS t2 FROM ev e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.sec > v.t1 GROUP BY 1
      |),
      |p AS (
      |  SELECT e.user_id, min(e.sec) AS t3 FROM ev e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.sec > c.t2 GROUP BY 1
      |),
      |counts AS (
      |  SELECT 1 AS stage, 'view' AS event_type, count(*) AS n FROM v
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p
      |)
      |SELECT stage, event_type, CAST(n AS BIGINT) AS n_users,
      |  CASE WHEN lag(n) OVER (ORDER BY stage) IS NULL THEN 1.0
      |       WHEN lag(n) OVER (ORDER BY stage) = 0 THEN NULL
      |       ELSE floor(n * 1.0 / lag(n) OVER (ORDER BY stage) * 10000) / 10000 END AS conversion
      |FROM counts""".stripMargin

  /** Weekly cohort retention: users cohorted by their first active
    * epoch-week, counted in each later week they return — the classic
    * engagement triangle. Two keyed aggregations over the distinct
    * (user, week) activity set; integer week math (ts_sec DIV 604800)
    * is engine-exact. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val weeks = loadEvents(spark, dir)
      .select(col("user_id"), expr("ts_sec DIV 604800").as("wk")).distinct()
    val first = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    weeks.join(first, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val retentionSql: String =
    """WITH w AS (
      |  SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events
      |),
      |f AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY 1)
      |SELECT f.cohort_week, w.wk - f.cohort_week AS week_offset, count(*) AS n_users
      |FROM w JOIN f ON w.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin

  /** First-order Markov transition matrix over per-user event-type
    * sequences — the behavioral sequence model (what follows what, and
    * how often) an event-analytics surface exposes next to funnels and
    * sessions. One lag window per user (the sessionize shuffle shape),
    * then a keyed bigram aggregation; output is bounded by |types|²
    * regardless of corpus size. The row-conditional probability is a
    * single integer-over-integer division (engine-exact doubles),
    * floor-truncated at 4dp. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    // ORDER BY whole seconds + event_id (never raw ts): Spark holds the
    // parquet timestamp at us, DuckDB at ns — a sub-us tie would break
    // by event_id on one engine and by the ns delta on the other.
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_sec").asc, col("event_id").asc)
    val bigrams = loadEvents(spark, dir)
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    bigrams.withColumn("prob",
      floor(col("n").cast("double") * 10000
        / sum(col("n")).over(Window.partitionBy(col("from_type")))) / 10000)
  }

  val transitionsSql: String =
    """WITH bi AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) ASC, event_id ASC) AS from_type,
      |    event_type AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, count(*) AS n FROM bi
      |  WHERE from_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n,
      |  floor(n::DOUBLE * 10000 / sum(n) OVER (PARTITION BY from_type)) / 10000 AS prob
      |FROM c""".stripMargin

  /** RFM segmentation (recency / frequency / monetary quartiles) — the
    * classic user-triage rollup an event-analytics surface exposes next
    * to funnels and cohorts. One keyed shuffle builds the per-user
    * rollup; quartile BOUNDARIES are one 1-row global
    * `percentile_disc(0.25/0.5/0.75)` aggregate (nine cutoffs, a
    * distinct-value-counts buffer — never the raw rows), broadcast
    * across the rollup; scores are then a narrow map with NO window, so
    * the user-cardinality rollup never funnels through a single task
    * (the constant-key ntile this replaced was the one single-partition
    * sort left in the repo — PlanLint now rejects that shape outright).
    * Quartiles are VALUE quartiles: percentile_disc is ANSI (the
    * smallest value whose cume_dist ≥ p = the element at ascending
    * position ceil(p·n)), the oracle reproduces that rank arithmetic
    * explicitly, and tied metric values always share a score (ntile
    * instead splits ties across buckets by user_id — a per-row, not
    * per-value, rule that cannot be computed without a global sort).
    * Scores are 1..4 with 4 = most recent / frequent / valuable. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val perUser = loadEvents(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts_sec")).as("last_seen_s"),
        count(lit(1)).as("frequency"),
        round(sum(col("value")), 2).as("monetary"))
    val cutCols = for {
      (metric, pfx) <- Seq("last_seen_s" -> "r", "frequency" -> "f", "monetary" -> "m")
      pct <- Seq("25", "50", "75")
    } yield expr(s"percentile_disc(0.$pct) WITHIN GROUP (ORDER BY $metric)").as(s"$pfx$pct")
    val cuts = perUser.agg(cutCols.head, cutCols.tail: _*)
    def score(metric: String, pfx: String) =
      (lit(1) + (col(metric) > col(s"${pfx}25")).cast("int")
        + (col(metric) > col(s"${pfx}50")).cast("int")
        + (col(metric) > col(s"${pfx}75")).cast("int")).cast("long")
    perUser.crossJoin(broadcast(cuts))
      .withColumn("r_score", score("last_seen_s", "r"))
      .withColumn("f_score", score("frequency", "f"))
      .withColumn("m_score", score("monetary", "m"))
      .select(col("user_id"), col("last_seen_s"), col("frequency"), col("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
  }

  val rfmSql: String =
    """WITH u AS (
      |  SELECT user_id, max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_seen_s,
      |    count(*) AS frequency, round(sum(value), 2) AS monetary
      |  FROM events GROUP BY 1
      |), r AS (
      |  SELECT u.*,
      |    row_number() OVER (ORDER BY last_seen_s) AS rr,
      |    row_number() OVER (ORDER BY frequency) AS rf,
      |    row_number() OVER (ORDER BY monetary) AS rm,
      |    count(*) OVER () AS n
      |  FROM u
      |), c AS (
      |  SELECT
      |    max(CASE WHEN rr = ceil(0.25 * n) THEN last_seen_s END) AS r25,
      |    max(CASE WHEN rr = ceil(0.50 * n) THEN last_seen_s END) AS r50,
      |    max(CASE WHEN rr = ceil(0.75 * n) THEN last_seen_s END) AS r75,
      |    max(CASE WHEN rf = ceil(0.25 * n) THEN frequency END) AS f25,
      |    max(CASE WHEN rf = ceil(0.50 * n) THEN frequency END) AS f50,
      |    max(CASE WHEN rf = ceil(0.75 * n) THEN frequency END) AS f75,
      |    max(CASE WHEN rm = ceil(0.25 * n) THEN monetary END) AS m25,
      |    max(CASE WHEN rm = ceil(0.50 * n) THEN monetary END) AS m50,
      |    max(CASE WHEN rm = ceil(0.75 * n) THEN monetary END) AS m75
      |  FROM r
      |), s AS (
      |  SELECT user_id, last_seen_s, frequency, monetary,
      |    1 + CAST(last_seen_s > r25 AS BIGINT) + CAST(last_seen_s > r50 AS BIGINT)
      |      + CAST(last_seen_s > r75 AS BIGINT) AS r_score,
      |    1 + CAST(frequency > f25 AS BIGINT) + CAST(frequency > f50 AS BIGINT)
      |      + CAST(frequency > f75 AS BIGINT) AS f_score,
      |    1 + CAST(monetary > m25 AS BIGINT) + CAST(monetary > m50 AS BIGINT)
      |      + CAST(monetary > m75 AS BIGINT) AS m_score
      |  FROM u, c
      |)
      |SELECT *, r_score * 100 + f_score * 10 + m_score AS rfm FROM s""".stripMargin

  /** Daily active users with month-over-month stickiness (DAU/MAU) —
    * the engagement headline next to [[retention]]. Calendar buckets
    * via date_trunc (the [[windowAgg]] parity shape); two keyed
    * distinct-aggregations (per-day and per-month user sets), joined
    * on the month. The ratio is one integer division floor-truncated
    * at 4dp — engine-exact. */
  def dauMau(spark: SparkSession, dir: String): DataFrame = {
    val active = loadEvents(spark, dir)
      .select(col("user_id"),
        date_trunc("day", col("ts")).as("day"),
        date_trunc("month", col("ts")).as("month"))
      .distinct()
    val dau = active.groupBy(col("day"), col("month"))
      .agg(count(lit(1)).as("dau"))
    val mau = active.select(col("user_id"), col("month")).distinct()
      .groupBy(col("month")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("month"))
      .select(col("day"), col("dau"), col("mau"),
        (floor(col("dau") * 10000.0 / col("mau")) / 10000).as("stickiness"))
  }

  val dauMauSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
      |    date_trunc('month', ts) AS month
      |  FROM events
      |),
      |dau AS (SELECT day, month, count(*) AS dau FROM active GROUP BY 1, 2),
      |mau AS (SELECT month, count(*) AS mau FROM (
      |  SELECT DISTINCT user_id, month FROM active) GROUP BY 1)
      |SELECT day, dau.dau, mau.mau,
      |  floor(dau.dau * 10000.0 / mau.mau) / 10000 AS stickiness
      |FROM dau JOIN mau USING (month)""".stripMargin

  /** EXACT heavy hitters by the two-pass Misra–Gries scheme (Misra &
    * Gries 1982; the MapReduce variant of Charikar et al.'s frequent-
    * items line): users generating > φ of all events.
    *
    * Pass 1 runs an in-memory k-counter Misra–Gries summary PER
    * PARTITION (k = ⌈1/φ⌉; mapPartitions is the honest home for a
    * per-partition sketch — the brief's "genuine per-partition
    * imperative logic" case) and emits only each partition's ≤ k
    * surviving candidates. Pigeonhole guarantee: an item with global
    * count > N/k must exceed nₚ/k in at least one partition, so the
    * union of per-partition candidates is a SUPERSET of every true
    * heavy hitter — pass 2's exact count + threshold then makes the
    * OUTPUT deterministic regardless of partitioning or arrival order.
    * Pass 2 semi-joins the event scan against the ≤ k·P broadcast
    * candidate set and counts exactly.
    *
    * The 100 TB point: a plain groupBy-count shuffles one row per
    * DISTINCT key (billions, almost all below threshold); here the
    * shuffle carries only candidate rows — the sketch bounds the
    * reducer input by k·P, independent of key cardinality. */
  def heavyHitters(spark: SparkSession, dir: String, phi: Double = 0.005): DataFrame = {
    import spark.implicits._
    val ev = loadEvents(spark, dir).select(col("user_id"))
    val k = math.ceil(1.0 / phi).toInt
    // ONE sketch pass emits each partition's ≤ k candidates AND its row
    // count from the same iterator (a separate total-count pass was a
    // third full corpus read for a number this pass already sees); the
    // ≤ (k+1)·P-row result is materialized once and feeds both the
    // candidate set and the global total.
    val pass1 = org.apache.spark.sql.graft.Materialize.stored(
      ev.as[Long].mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[Long, Long]
        var n = 0L
        it.foreach { x =>
          n += 1L
          if (counters.contains(x)) counters(x) += 1L
          else if (counters.size < k) counters(x) = 1L
          else {
            val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
            counters.keysIterator.foreach { key =>
              val c = counters(key) - 1L
              if (c == 0L) dead += key else counters(key) = c
            }
            dead.foreach(counters.remove)
          }
        }
        counters.keysIterator.map(uid => (uid, 0L, false)) ++ Iterator((0L, n, true))
      }.toDF("user_id", "cnt", "is_total"))
    val cands = pass1.filter(!col("is_total")).select(col("user_id")).distinct()
    val total = pass1.filter(col("is_total"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
    ev.join(broadcast(cands), Seq("user_id"), "left_semi")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(total))
      .filter(col("n_events") > col("total") * phi)
      .select(col("user_id"), col("n_events"),
        (floor(col("n_events") * 10000.0 / col("total")) / 10000).as("share"))
  }

  val heavyHittersSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  floor(count(*) * 10000.0 / (SELECT count(*) FROM events)) / 10000 AS share
      |FROM events GROUP BY user_id
      |HAVING count(*) > (SELECT count(*) FROM events) * 0.005""".stripMargin

  /** Conversion ATTRIBUTION — first-touch and last-touch per purchase
    * (the standard marketing-analytics companion to the funnel): for
    * every purchase event, the user's EARLIEST view and LATEST click
    * strictly before it in the event stream. One per-user windowed pass
    * — running min/max over a (ts_sec, event_id)-ordered frame ending
    * one row before current (the "strictly before" contract, with
    * event_id as the same-second tiebreaker) — so the plan is a single
    * keyed sort per user partition, the events_sessionize scale class:
    * no self-joins, no per-purchase subqueries, scales with the
    * per-user event count. Purchases with no prior touch keep NULLs
    * (organic conversions — the reader's own bucket). */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"), col("value"))
      .withColumn("first_view_sec",
        min(when(col("event_type") === "view", col("ts_sec"))).over(w))
      .withColumn("last_click_sec",
        max(when(col("event_type") === "click", col("ts_sec"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_sec").as("purchase_sec"),
        col("first_view_sec"), col("last_click_sec"),
        round(col("value"), 2).as("value"))
  }

  val attributionSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |  FROM events
      |),
      |touched AS (
      |  SELECT event_id, user_id, event_type, sec, value,
      |    min(CASE WHEN event_type = 'view' THEN sec END) OVER (
      |      PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_view_sec,
      |    max(CASE WHEN event_type = 'click' THEN sec END) OVER (
      |      PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_sec
      |  FROM ev
      |)
      |SELECT event_id, user_id, sec AS purchase_sec,
      |  first_view_sec, last_click_sec, round(value, 2) AS value
      |FROM touched WHERE event_type = 'purchase'""".stripMargin

  /** LINEAR (multi-touch) attribution — the equal-credit companion to
    * first/last-touch [[attribution]]: every purchase splits its value
    * equally across ALL the user's touches (views and clicks) strictly
    * before it, and each touch reports the total credit it earned
    * across every later purchase.
    *
    * Shape: the pairwise touch×purchase credit matrix is never
    * materialized. Two frames over ONE (user_id, (ts_sec, event_id))
    * keyed sort: a backward frame counts each purchase's prior touches
    * n_p (so its per-touch slice is value/n_p), then a forward frame
    * (1 FOLLOWING..UNBOUNDED FOLLOWING) running-sums those slices back
    * onto each touch — the "sum over later purchases" without a
    * self-join, because every prior touch of p earns the identical
    * slice. Same scale class as events_sessionize: cost ∝ per-user
    * event count, one shuffle on user_id. Touches with no later
    * purchase report 0 credit (still rows — the marketer's unrewarded
    * spend); organic purchases (n_p = 0) distribute nothing.
    *
    * Credit is FIXED-POINT: each slice rounds once to integer
    * micro-units (value·10⁶/n_p — one multiply + one divide, so the
    * pre-round double is bit-identical on every engine) and the window
    * sums exact integers, and the reported credit is that integer divided
    * by 10⁶ — one division on identical operands, so the double is
    * bit-identical everywhere with no terminal rounding step (a float
    * running sum, or a final round-to-4, is summation-order / rounding-
    * rule dependent: both variants diverged on a handful of
    * boundary-straddling rows at this corpus). */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val back = order.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = order.rowsBetween(1, Window.unboundedFollowing)
    val isTouch = col("event_type") === "view" || col("event_type") === "click"
    loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"), col("value"))
      .withColumn("n_prior_touches", count(when(isTouch, 1)).over(back))
      .withColumn("slice_micro",
        when(col("event_type") === "purchase" && col("n_prior_touches") > 0,
          round(col("value") * 1000000 / col("n_prior_touches"), 0).cast("long")))
      .withColumn("credit_micro", sum(col("slice_micro")).over(fwd))
      .filter(isTouch)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_sec").as("touch_sec"),
        (coalesce(col("credit_micro"), lit(0L)) / 1000000.0).as("credit"))
  }

  val attributionLinearSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |  FROM events
      |),
      |sliced AS (
      |  SELECT event_id, user_id, event_type, sec, value,
      |    count(CASE WHEN event_type IN ('view', 'click') THEN 1 END) OVER (
      |      PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_prior_touches
      |  FROM ev
      |),
      |credited AS (
      |  SELECT event_id, user_id, event_type, sec,
      |    sum(CASE WHEN event_type = 'purchase' AND n_prior_touches > 0
      |             THEN CAST(round(value * 1000000 / n_prior_touches) AS BIGINT) END) OVER (
      |      PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS credit_micro
      |  FROM sliced
      |)
      |SELECT event_id, user_id, event_type, sec AS touch_sec,
      |  coalesce(credit_micro, 0) / 1000000.0 AS credit
      |FROM credited WHERE event_type IN ('view', 'click')""".stripMargin

  /** POSITION-BASED (U-shaped) attribution — the third standard model
    * next to first/last-touch [[attribution]] and equal-split
    * [[attributionLinear]]: a purchase with n prior touches credits 40%
    * to the FIRST touch, 40% to the LAST touch before it, and splits
    * 20% across the middles (n = 1 → 100% to the sole touch; n = 2 →
    * 50/50 — the standard degenerate forms).
    *
    * The touch×purchase matrix is again never materialized. The key
    * observation: with rows in (user, (ts_sec, event_id)) order and
    * `seg` = running count of touches (inclusive), a purchase's prior-
    * touch count n IS its seg, its LAST prior touch is the touch that
    * OPENED its seg, its FIRST prior touch is always the seg-1 touch,
    * and its middles are exactly the touches with 2 ≤ seg' ≤ n-1. So
    * per-purchase micro-slices aggregate once per (user, seg) and
    * credit assembles from three seg-level reductions: the seg's own
    * last-share sum, the user total of first-shares (seg-1 touch only),
    * and a suffix sum of middle-slices over later segs (seg ≥ 2
    * touches). One full-width keyed sort (the sessionize class), then
    * everything runs on the collapsed per-(user, seg) table — keyed
    * equi-joins and per-user windows over one row per touch segment,
    * never a second pass over raw events. Fixed-point micro-units as in
    * [[attributionLinear]]: one round per purchase-slice, integer sums,
    * terminal division only. */
  def attributionPosition(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val isTouch = col("event_type") === "view" || col("event_type") === "click"
    val isP = col("event_type") === "purchase"
    val base = loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"), col("value"))
      .withColumn("seg", sum(when(isTouch, 1L).otherwise(0L))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val v6 = col("value") * 1000000
    val endShare = when(isP && col("seg") >= 3, round(v6 * 0.4, 0))
      .when(isP && col("seg").isin(1L, 2L), round(v6 * 0.5, 0))
      .otherwise(lit(0.0)).cast("long")
    val midSlice = when(isP && col("seg") >= 3,
      round(v6 * 0.2 / (col("seg") - 2), 0)).otherwise(lit(0.0)).cast("long")
    val segAgg = base
      .withColumn("fc", endShare).withColumn("lc", endShare).withColumn("mc", midSlice)
      .groupBy(col("user_id"), col("seg"))
      .agg(sum(col("fc")).as("f"), sum(col("lc")).as("l"), sum(col("mc")).as("m"))
    val wUser = Window.partitionBy(col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wSuffix = Window.partitionBy(col("user_id")).orderBy(col("seg").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val segCredits = segAgg
      .withColumn("first_total", sum(col("f")).over(wUser))
      .withColumn("suffix_mid", coalesce(sum(col("m")).over(wSuffix), lit(0L)))
      .select(col("user_id"), col("seg"), col("l"), col("first_total"), col("suffix_mid"))
    base.filter(isTouch)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_sec").as("touch_sec"), col("seg"))
      .join(segCredits, Seq("user_id", "seg"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("touch_sec"),
        ((col("l")
          + when(col("seg") === 1, col("first_total")).otherwise(lit(0L))
          + when(col("seg") >= 2, col("suffix_mid")).otherwise(lit(0L)))
          / 1000000.0).as("credit"))
  }

  val attributionPositionSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |  FROM events
      |),
      |segged AS (
      |  SELECT event_id, user_id, event_type, sec, value,
      |    CAST(sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
      |  FROM ev
      |),
      |sliced AS (
      |  SELECT user_id, seg,
      |    CASE WHEN event_type = 'purchase' AND seg >= 3
      |           THEN CAST(round(value * 1000000 * 0.4) AS BIGINT)
      |         WHEN event_type = 'purchase' AND seg IN (1, 2)
      |           THEN CAST(round(value * 1000000 * 0.5) AS BIGINT)
      |         ELSE 0 END AS fc,
      |    CASE WHEN event_type = 'purchase' AND seg >= 3
      |           THEN CAST(round(value * 1000000 * 0.2 / (seg - 2)) AS BIGINT)
      |         ELSE 0 END AS mc
      |  FROM segged
      |),
      |seg_agg AS (
      |  SELECT user_id, seg, sum(fc) AS f, sum(fc) AS l, sum(mc) AS m
      |  FROM sliced GROUP BY 1, 2
      |),
      |seg_credits AS (
      |  SELECT user_id, seg, l,
      |    sum(f) OVER (PARTITION BY user_id) AS first_total,
      |    coalesce(sum(m) OVER (PARTITION BY user_id ORDER BY seg ASC
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS suffix_mid
      |  FROM seg_agg
      |)
      |SELECT t.event_id, t.user_id, t.event_type, t.sec AS touch_sec,
      |  (c.l + CASE WHEN t.seg = 1 THEN c.first_total ELSE 0 END
      |       + CASE WHEN t.seg >= 2 THEN c.suffix_mid ELSE 0 END) / 1000000.0 AS credit
      |FROM segged t JOIN seg_credits c ON t.user_id = c.user_id AND t.seg = c.seg
      |WHERE t.event_type IN ('view', 'click')""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_attribution" -> ((s: SparkSession, d: String) => attribution(s, d)),
    "events_attribution_linear" -> ((s: SparkSession, d: String) => attributionLinear(s, d)),
    "events_attribution_position" -> ((s: SparkSession, d: String) => attributionPosition(s, d)),
    "events_dau_mau" -> ((s: SparkSession, d: String) => dauMau(s, d)),
    "events_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "events_rfm" -> ((s: SparkSession, d: String) => rfm(s, d)),
    "events_transitions" -> ((s: SparkSession, d: String) => transitions(s, d)),
    "search_history" -> ((s: SparkSession, d: String) => history(s, d)),
    "search_get_queries" -> ((s: SparkSession, d: String) => userLedger(s, d, 7L, "view")),
    "search_get_results" -> ((s: SparkSession, d: String) => userLedger(s, d, 7L, "purchase")),
    "events_props_agg" -> ((s: SparkSession, d: String) => propsAgg(s, d)),
    "events_window_agg" -> ((s: SparkSession, d: String) => windowAgg(s, d)),
    "events_sessionize" -> ((s: SparkSession, d: String) => sessionize(s, d)),
    "events_funnel" -> ((s: SparkSession, d: String) => funnel(s, d)),
    "events_retention" -> ((s: SparkSession, d: String) => retention(s, d)),
    "search_temporal" -> ((s: SparkSession, d: String) => temporalSearch(s, d)),
    "search_temporal_open" -> ((s: SparkSession, d: String) => temporalOpen(s, d)))

  def oracles: Map[String, String] = Map(
    "events_attribution" -> attributionSql,
    "events_attribution_linear" -> attributionLinearSql,
    "events_attribution_position" -> attributionPositionSql,
    "events_dau_mau" -> dauMauSql,
    "events_heavy_hitters" -> heavyHittersSql,
    "events_rfm" -> rfmSql,
    "events_transitions" -> transitionsSql,
    "search_history" -> historySql,
    "search_get_queries" -> userLedgerSql("view"),
    "search_get_results" -> userLedgerSql("purchase"),
    "events_props_agg" -> propsAggSql,
    "events_window_agg" -> windowAggSql,
    "events_sessionize" -> sessionizeSql,
    "events_funnel" -> funnelSql,
    "events_retention" -> retentionSql,
    "search_temporal" -> temporalSearchSql,
    "search_temporal_open" -> temporalOpenSql)
}
