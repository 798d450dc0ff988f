package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/OLAP core — the analog of cognee's relational ledger
  * queries (pipeline run history, data inventory) plus the bench
  * headliners. All floats are rounded identically in the Spark plan and
  * the DuckDB oracle (SURVEY.md §4).
  */
object RelationalOps {

  // --- Exact-DECIMAL money terms, shared by every revenue aggregate
  // whose groups sum an SF-PROPORTIONAL lineitem slice (q1, q5, rollup,
  // the bucketed-store join). The generated money columns are exact
  // 2-decimal values, so the double→decimal cast is lossless in BOTH
  // engines, every product stays exact (scales add, precision never
  // hits 38), and the decimal SUM is associativity-free — double sums
  // lost the last cent at sf1's 6M-row totals, where Spark's and
  // DuckDB's partial-sum orders diverge. One definition per engine
  // side: a precision tweak that touched only one would silently
  // desync the oracle pairs. SURVEY §4 rounding contract.
  private val moneyOne  = lit(1).cast("decimal(3,2)")
  private def extPrice  = col("l_extendedprice").cast("decimal(18,2)")
  private def discountD = col("l_discount").cast("decimal(4,2)")
  /** l_extendedprice × (1 − l_discount) — decimal(24,4), exact. */
  private def revenueExact: org.apache.spark.sql.Column = extPrice * (moneyOne - discountD)
  /** The identical expression as DuckDB SQL. */
  private val revenueExactSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  /** TPC-H Q1-style pricing summary. Single hash-aggregate: map-side
    * partial agg → one shuffle on (returnflag, linestatus). Money in
    * exact DECIMAL (see [[revenueExact]]); averages divide the exact
    * decimal sum (cast to double, deterministic nearest) by the count —
    * one IEEE division, no order dependence. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = load(spark, dir, "lineitem")
    val one   = moneyOne
    val qty   = col("l_quantity").cast("decimal(18,2)")
    val price = extPrice
    val disc  = discountD
    val tax   = col("l_tax").cast("decimal(4,2)")
    val discPrice = revenueExact           // decimal(24,4), exact
    val charge    = discPrice * (one + tax) // decimal(30,6), exact
    val n = count(lit(1))
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(qty), 2).cast("double").as("sum_qty"),
        round(sum(price), 2).cast("double").as("sum_base_price"),
        round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
        round(sum(charge), 2).cast("double").as("sum_charge"),
        round(sum(qty).cast("double") / n, 4).as("avg_qty"),
        round(sum(disc).cast("double") / n, 4).as("avg_disc"),
        n.as("count_order"))
  }

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum($revenueExactSql), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum($revenueExactSql * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping-priority revenue top-N. The customer side
    * is SF-PROPORTIONAL (150k×SF rows — not a fixed-vocab dim like
    * nation/region), so it joins keyed: the planner broadcasts it when
    * the scan statistics say it fits, and at 100 TB the plan degrades
    * to a shuffle join instead of a forced multi-TB driver build.
    * lineitem join shuffles on orderkey once; top-10 via
    * rounded-revenue total order (ties → orderkey). */
  def q3JoinTopN(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = load(spark, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
    val l = load(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey").as("orderkey"), col("o_orderdate").as("orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("orderkey").asc)
      .limit(10)
  }

  val q3JoinTopNSql: String =
    """SELECT o_orderkey AS orderkey, o_orderdate AS orderdate,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, orderkey ASC
      |LIMIT 10""".stripMargin

  /** Per-customer order ranking + running spend (window functions — the
    * pipeline_run-history analog). One shuffle on custkey; the two
    * window functions share a single sort. */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    o.select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        row_number().over(w).cast("long").as("rn"), // DuckDB row_number is BIGINT
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_spend"))
  }

  val qWindowSql: String =
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      |FROM orders""".stripMargin

  /** Time-RANGE rolling window: per customer, the trailing-30-day
    * revenue at each order (RANGE frame on epoch days — value-based, so
    * same-day ties aggregate identically in any engine; the ROWS-frame
    * running sum above can't express "last 30 days"). One shuffle on
    * the partition key, the frame is state the window operator streams. */
  def qWindowRolling(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    val w = Window.partitionBy(col("custkey")).orderBy(col("day")).rangeBetween(-30, 0)
    load(spark, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
        day.as("day"), col("o_totalprice"))
      .select(col("custkey"), col("orderkey"), col("day"),
        round(sum(col("o_totalprice")).over(w), 2).as("rolling_30d_revenue"))
  }

  val qWindowRollingSql: String =
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d_revenue
      |FROM orders""".stripMargin

  /** TPC-H Q5-style: revenue by nation within one region and year —
    * the full dimension-chain join (region→nation→customer/supplier)
    * with the fact scans filter-pushed. Only the FIXED-VOCAB dims
    * (nation 25 rows, region 5) carry broadcast hints; customer and
    * supplier are SF-proportional, so they join keyed and the planner
    * broadcasts them only while they actually fit. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = load(spark, dir, "nation")
    val c = load(spark, dir, "customer")
    val s = load(spark, dir, "supplier")
    val o = load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val l = load(spark, dir, "lineitem")
    // Per-nation groups aggregate an SF-proportional slice of lineitem,
    // so revenue runs in exact DECIMAL (the sf1 sweep caught a one-cent
    // double-associativity miss on exactly one nation).
    val rev = revenueExact
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(round(sum(rev), 2).cast("double").as("revenue"))
  }

  val q5Sql: String =
    s"""SELECT n_name AS nation,
      |  CAST(round(sum($revenueExactSql), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** TPC-H Q18-style: large orders (total quantity > threshold) with
    * their customers — aggregate-then-join with a having filter. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val l = load(spark, dir, "lineitem")
    val o = load(spark, dir, "orders")
    val c = load(spark, dir, "customer")
    val big = l.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 220.0)
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey")) // SF-proportional: keyed, planner decides
      .select(col("c_name").as("customer"), col("o_orderkey").as("orderkey"),
        col("o_totalprice").as("totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("orderkey").asc)
      .limit(20)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING round(sum(l_quantity), 2) > 220.0
      |)
      |SELECT c_name AS customer, o_orderkey AS orderkey,
      |  o_totalprice AS totalprice, total_qty
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, orderkey ASC
      |LIMIT 20""".stripMargin

  /** Multidimensional rollup: revenue by (brand, type-prefix) with
    * subtotal grouping sets — one shuffle, Catalyst expands the sets.
    * Revenue in exact DECIMAL (same rationale as [[q1Agg]]): the ALL
    * margin sums every lineitem row, which is exactly the 6M-row sf1
    * shape where double partial-sum ordering lost the last cent. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val l = load(spark, dir, "lineitem")
    val p = load(spark, dir, "part")
    val rev = revenueExact
    l.join(p, col("l_partkey") === col("p_partkey")) // part is SF-proportional: keyed, planner decides
      .select(col("p_brand").as("brand"),
        substring(col("p_type"), 1, 6).as("type_prefix"),
        rev.as("rev"))
      .rollup(col("brand"), col("type_prefix"))
      .agg(round(sum(col("rev")), 2).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .select(coalesce(col("brand"), lit("ALL")).as("brand"),
        coalesce(col("type_prefix"), lit("ALL")).as("type_prefix"),
        col("revenue"), col("n_items"))
  }

  val qRollupSql: String =
    s"""SELECT coalesce(p_brand, 'ALL') AS brand,
      |  coalesce(substr(p_type, 1, 6), 'ALL') AS type_prefix,
      |  CAST(round(sum($revenueExactSql), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP (p_brand, substr(p_type, 1, 6))""".stripMargin

  /** CUBE grouping sets — all four (status, priority) margins in one
    * pass (ROLLUP's sibling; one shuffle, Catalyst expands to
    * grouping-set aggregation). Revenue in exact DECIMAL ([[q1Agg]]). */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))

  val qCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Hourly event-count anomalies per event type: a z-score against the
    * type's own hourly distribution flags bursts/droughts (|z| ≥ 2).
    * Two keyed aggregations (hour counts, per-type moments) + a
    * broadcast join back; the z fraction floor-truncates so a last-ulp
    * stddev difference between engines cannot flip a digit. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = graft.Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(avg(col("n")).as("mu"), stddev_samp(col("n")).as("sigma"))
    val z = (col("n") - col("mu")) / col("sigma")
    hourly.join(broadcast(stats), Seq("event_type"))
      .filter(abs(z) >= 2.0)
      .select(col("event_type"), col("hour"), col("n"),
        (floor(z * 100) / 100).as("z"))
  }

  val eventsAnomalySql: String =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |s AS (
      |  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma FROM h GROUP BY 1
      |)
      |SELECT h.event_type, h.hour, h.n, floor((h.n - s.mu) / s.sigma * 100) / 100 AS z
      |FROM h JOIN s ON h.event_type = s.event_type
      |WHERE abs((h.n - s.mu) / s.sigma) >= 2.0""".stripMargin

  /** Exact rank-based percentiles per market segment (median / p95 of
    * order totals): the element at rank ceil(p·n) in sorted order —
    * pure integer selection, no interpolation, so Spark and the oracle
    * cannot drift on float midpoint arithmetic (interpolating
    * percentile hit a round-boundary mismatch). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    val c = load(spark, dir, "customer")
    val w = Window.partitionBy(col("mktsegment"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val joined = o.join(c, col("o_custkey") === col("c_custkey")) // SF-proportional: keyed
      .select(col("c_mktsegment").as("mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("mktsegment"))))
    joined.groupBy(col("mktsegment"))
      .agg(
        round(max(when(col("rn") === ceil(col("n") * 0.5), col("o_totalprice"))), 2).as("median_price"),
        round(max(when(col("rn") === ceil(col("n") * 0.95), col("o_totalprice"))), 2).as("p95_price"),
        max(col("n")).as("n_orders"))
  }

  val qPercentilesSql: String =
    """WITH t AS (
      |  SELECT c_mktsegment AS mktsegment, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |)
      |SELECT mktsegment,
      |  round(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN o_totalprice END), 2) AS median_price,
      |  round(max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN o_totalprice END), 2) AS p95_price,
      |  CAST(max(n) AS BIGINT) AS n_orders
      |FROM t GROUP BY mktsegment""".stripMargin

  /** Approximate distinct users per event type (HLL++ sketch) — the
    * cardinality-sketch family; sketch values differ per engine, so
    * accuracy is pinned by spec against exact counts (within 5%). The
    * DRIVER-checked registration is [[approxDistinctAudit]], which
    * folds that accuracy check into the plan itself. */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** Sketch twin of [[qPercentiles]] — approx_percentile
    * (Greenwald-Khanna) per segment: at 100 TB the exact rank window
    * sorts every group, while the sketch merges map-side partial state
    * in one aggregate pass with bounded memory; accuracy is pinned
    * against the exact ranks by spec (like the HLL precedent).
    * Rows-only driver check — DuckDB's approx algorithm differs. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    val c = load(spark, dir, "customer")
    o.join(c, col("o_custkey") === col("c_custkey")) // SF-proportional: keyed
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(
        round(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)), 2).as("approx_median"),
        round(percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)), 2).as("approx_p95"),
        count(lit(1)).as("n_orders"))
  }

  /** Driver-gate projection of the HLL++ sketch: the exact per-type
    * census (DuckDB-checkable) PLUS an in-plan accuracy audit — the
    * sketch estimate must land within 15% relative error of the exact
    * distinct count computed in the SAME aggregate (measured max
    * relative error across sf0.001–0.1: 6.7%; HLL++ at rsd 0.05 is
    * deterministic for fixed data, so the flag is stable, and a sketch
    * regression flips it red in the hash gate instead of hiding behind
    * a rows-only check). */
  def approxDistinctAudit(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("a"))
      .select(col("event_type"), col("n_events"), col("n_users"),
        (abs(col("a") - col("n_users")) <= col("n_users") * lit(0.15)).as("approx_ok"))

  val approxDistinctAuditSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users, true AS approx_ok
      |FROM events GROUP BY 1""".stripMargin

  /** Driver-gate projection of the GK percentile sketch: the join +
    * grouping census exactly (DuckDB-checkable) plus an in-plan audit —
    * both approximate percentiles within 2% relative error of the
    * EXACT interpolated percentiles computed in the same aggregate
    * (measured max relative error across SFs: 0.6%; the exact values
    * themselves are cross-engine-checked by the separate
    * `q_percentiles` oracle, so this plan only needs to bind sketch to
    * exact, never re-litigate interpolation rounding across engines). */
  def approxPercentilesAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    val c = load(spark, dir, "customer")
    o.join(c, col("o_custkey") === col("c_custkey")) // SF-proportional: keyed
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
        expr("percentile(o_totalprice, 0.5)").as("x50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("a95"),
        expr("percentile(o_totalprice, 0.95)").as("x95"))
      .select(col("mktsegment"), col("n_orders"),
        (abs(col("a50") - col("x50")) <= abs(col("x50")) * lit(0.02) &&
          abs(col("a95") - col("x95")) <= abs(col("x95")) * lit(0.02)).as("approx_ok"))
  }

  val approxPercentilesAuditSql: String =
    """SELECT c_mktsegment AS mktsegment, count(*) AS n_orders, true AS approx_ok
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** TPC-H Q10-style: revenue lost to returned items per customer over
    * a quarter, top-20 — selective fact filter + two broadcast dims. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val l = load(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-04-01"))
    val c = load(spark, dir, "customer")
    val n = load(spark, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey")) // SF-proportional: keyed
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey").as("custkey"), col("c_name").as("customer"), col("n_name").as("nation"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("custkey").asc)
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey AS custkey, c_name AS customer, n_name AS nation,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS lost_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY lost_revenue DESC, custkey ASC
      |LIMIT 20""".stripMargin

  /** The BucketedStore round-trip as a DRIVER-CHECKED query (previously
    * spec-only; BucketedJoinSpec keeps pinning the zero-Exchange plan
    * shape): lineitem and orders write once bucketed+sorted on the
    * order key (skipped when this session already wrote the stamped
    * tables), the join reads the co-located buckets back, and revenue
    * per order priority must equal the direct-SQL oracle — data lost or
    * mis-bucketed in the round-trip breaks the hash. Table names carry
    * the corpus stamp, so regenerated testdata rebuilds. */
  def storeBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val stamp = graft.graph.SessionDirCache.parquetStamp(
      Seq("lineitem", "orders"))(spark, dir)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "|" + stamp).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_bstore_$key"
    val (liT, oT) = (s"b_lineitem_$key", s"b_orders_$key")
    if (!spark.catalog.tableExists(liT))
      graft.sources.BucketedStore.write(
        load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        liT, "l_orderkey", 8, s"$root/lineitem")
    if (!spark.catalog.tableExists(oT))
      graft.sources.BucketedStore.write(
        load(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        oT, "o_orderkey", 8, s"$root/orders")
    // Five priority groups each aggregate an SF-proportional slice of
    // lineitem — exact DECIMAL revenue like q1Agg/q5 (the sf1 sweep
    // caught cent-level double-associativity misses on 3 of 5 groups).
    val rev = revenueExact
    graft.sources.BucketedStore.read(spark, liT)
      .join(graft.sources.BucketedStore.read(spark, oT),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(round(sum(rev), 2).cast("double").as("revenue"))
  }

  val storeBucketedJoinSql: String =
    s"""SELECT o_orderpriority AS priority,
      |  CAST(round(sum($revenueExactSql), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Nation × order-priority revenue matrix via RELATIONAL PIVOT —
    * the wide-format rollup (Dataset.groupBy(...).pivot(values, ...))
    * the reference's dashboard-style aggregations produce. The pivot
    * value list is explicit, so the plan is a single hash aggregate
    * with five conditional sums (no extra distinct-values job and no
    * second shuffle); a nation with no orders at a priority yields
    * NULL, matching SQL's FILTERed sum over an empty set. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
    val piv = load(spark, dir, "orders")
      .join(load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(load(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .pivot("o_orderpriority", prios)
      .agg(round(sum(col("o_totalprice")), 2))
    prios.zip(names).foldLeft(piv) { case (df, (p, n)) => df.withColumnRenamed(p, n) }
  }

  val qPivotSql: String =
    """SELECT n_name AS nation,
      |  round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2) AS p1_urgent,
      |  round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '2-HIGH'), 2) AS p2_high,
      |  round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '3-MEDIUM'), 2) AS p3_medium,
      |  round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 2) AS p4_not_specified,
      |  round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 2) AS p5_low
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  /** Top-3 orders by total price per order priority through the
    * TopKPerGroup physical operator — per-group leaders WITHOUT the
    * window idiom, whose 5-priority partition spec would funnel the
    * whole table through 5 sorting tasks at scale. The bounded-heap
    * two-phase operator keeps full scan parallelism regardless of the
    * group-domain size (partial heaps per scan partition, one
    * groups×k-row shuffle, final merge). Ties break on orderkey. */
  def qTopPerPriority(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val orders = load(spark, dir, "orders").select(
      col("o_orderpriority").as("priority"),
      col("o_orderkey").as("orderkey"),
      col("o_totalprice").as("totalprice"))
    org.apache.spark.sql.graft.TopKPerGroup(orders,
      Seq(col("priority")), Seq(col("totalprice").desc, col("orderkey").asc), k)
  }

  val qTopPerPrioritySql: String =
    """SELECT priority, orderkey, totalprice FROM (
      |  SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
      |    o_totalprice AS totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders
      |) WHERE rn <= 3""".stripMargin

  /** Generic AS-OF JOIN — for every left row, the single right row with
    * the greatest timestamp at-or-before the left row's, per key (the
    * time-series enrichment join Spark lacks natively; kdb's `aj`,
    * DuckDB's ASOF JOIN, pandas merge_asof). NOT implemented as a range
    * join: the union-tag shape interleaves both inputs in ONE keyed
    * (ts, side)-ordered sort — right rows sort before left rows at
    * equal ts so "at-or-before" includes same-instant — and a
    * forward-carried `last(_, ignoreNulls)` propagates the latest
    * right-side payload onto every left row. One shuffle, cost
    * ∝ |L|+|R| (the sessionize class), no per-left-row probe, no
    * interval explosion; an unmatched left row keeps NULLs (left-outer
    * as-of). Right rows must be unique per (key, ts) — enforce
    * upstream (the registered query dedups by max event_id) — since
    * "the" row at a tied instant is otherwise undefined.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val rCols = right.columns.filter(c => c != key && c != ts)
    val lCols = left.columns.filter(c => c != key && c != ts)
    val rTagged = right.select(
      Seq(col(key), col(ts), lit(1).as("is_right")) ++
        rCols.map(col) ++ lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(key), col(ts), lit(0).as("is_right")) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++ lCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.union(lTagged)
      .withColumn("asof_ts",
        last(when(col("is_right") === 1, col(ts)), ignoreNulls = true).over(w))
      .withColumns(rCols.map(c =>
        c -> last(when(col("is_right") === 1, col(c)), ignoreNulls = true).over(w)).toMap)
    carried.filter(col("is_right") === 0)
      .select(Seq(col(key), col(ts)) ++ lCols.map(col) ++
        Seq(col("asof_ts")) ++ rCols.map(col): _*)
  }

  /** As-of enrichment demo on the event stream: every purchase joined
    * to the user's most recent click at-or-before it (click stream
    * deduped to one row per (user, second) by max event_id — arg_max
    * payload — so the as-of match is well-defined). The DuckDB oracle
    * is the engine's NATIVE `ASOF LEFT JOIN`, so the union-tag
    * implementation is checked against an independent implementation
    * of the semantics, not a re-derivation of itself. */
  def asofDemo(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_sec"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_sec"),
        col("event_id"), col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_sec"))
      .agg(max(col("event_id")).as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
    asofJoin(purchases, clicks, "user_id", "ts_sec")
      .select(col("event_id"), col("user_id"), col("ts_sec").as("purchase_sec"),
        col("purchase_value"), col("asof_ts").as("click_sec"),
        col("click_id"), col("click_value"))
  }

  val asofDemoSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |  FROM events
      |),
      |p AS (SELECT event_id, user_id, sec, value AS purchase_value
      |      FROM ev WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, sec, max(event_id) AS click_id,
      |        arg_max(value, event_id) AS click_value
      |      FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.sec AS purchase_sec, p.purchase_value,
      |  c.sec AS click_sec, c.click_id, c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.sec >= c.sec""".stripMargin

  /** Generic RANGE (interval-containment) JOIN — match each point row
    * to the interval rows containing it, per key, WITHOUT the O(|P|·|I|)
    * nested-loop a naive theta-join plans: intervals explode into the
    * coarse buckets they overlap (explode factor = span/width + 1 —
    * pick `width` near the typical span so it stays ~1-2), points map
    * to one bucket, and the match is a plain EQUI-join on
    * (key, bucket) + a residual containment filter. One keyed shuffle,
    * broadcast-eligible, AQE-skew-splittable — the interval-binning
    * pattern every time-range enrichment at scale uses. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      pt: String, lo: String, hi: String, width: Long): DataFrame = {
    val p = points.withColumn("_bucket", floor(col(pt) / width))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(lo) / width), floor(col(hi) / width))))
    p.join(iv, Seq(key, "_bucket"))
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("_bucket")
  }

  /** Range-join demo: every event matched back to the 30-minute-gap
    * session interval containing it ([[EventOps.sessionize]] output) —
    * each event lands in exactly one session (intervals are per-user
    * disjoint and cover their events), so the result doubles as a
    * sessionization consistency check. The DuckDB oracle states the
    * raw BETWEEN theta-join (its IEJoin plans it natively) — an
    * independent implementation of the same semantics, as with
    * q_asof_join. */
  def rangeDemo(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    val sessions = EventOps.sessionize(spark, dir)
      .select(col("user_id"), col("sess_id"), col("start_s"), col("end_s"))
    rangeJoin(ev, sessions, "user_id", "ts_sec", "start_s", "end_s", width = 3600L)
      .select(col("event_id"), col("user_id"), col("ts_sec").as("sec"),
        col("sess_id"), col("start_s"))
  }

  val rangeDemoSql: String = {
    val sessions = EventOps.sessionizeSql
      .replaceAll("(?s)SELECT user_id, sess_id, count\\(\\*\\).*$",
        "SELECT user_id, sess_id, min(sec) AS start_s, max(sec) AS end_s FROM sessed GROUP BY user_id, sess_id")
    s"""WITH sess AS (
       |$sessions
       |),
       |ev AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
       |SELECT ev.event_id, ev.user_id, ev.sec, sess.sess_id, sess.start_s
       |FROM ev JOIN sess
       |  ON ev.user_id = sess.user_id AND ev.sec BETWEEN sess.start_s AND sess.end_s""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s: SparkSession, d: String) => asofDemo(s, d)),
    "q_range_join" -> ((s: SparkSession, d: String) => rangeDemo(s, d)),
    "q_topn_per_group" -> ((s: SparkSession, d: String) => qTopPerPriority(s, d)),
    "q_pivot" -> ((s: SparkSession, d: String) => qPivot(s, d)),
    "store_bucketed_join" -> ((s: SparkSession, d: String) => storeBucketedJoin(s, d)),
    "q10_returns" -> ((s: SparkSession, d: String) => q10Returns(s, d)),
    "q_rollup" -> ((s: SparkSession, d: String) => qRollup(s, d)),
    "q_percentiles" -> ((s: SparkSession, d: String) => qPercentiles(s, d)),
    "q5_local_supplier" -> ((s: SparkSession, d: String) => q5LocalSupplier(s, d)),
    "q18_large_orders" -> ((s: SparkSession, d: String) => q18LargeOrders(s, d)),
    "q1_agg" -> ((s: SparkSession, d: String) => q1Agg(s, d)),
    "q3_join_topn" -> ((s: SparkSession, d: String) => q3JoinTopN(s, d)),
    "q_approx_distinct" -> ((s: SparkSession, d: String) => approxDistinctAudit(s, d)),
    "q_approx_percentiles" -> ((s: SparkSession, d: String) => approxPercentilesAudit(s, d)),
    "q_window" -> ((s: SparkSession, d: String) => qWindow(s, d)),
    "q_window_rolling" -> ((s: SparkSession, d: String) => qWindowRolling(s, d)),
    "q_cube" -> ((s: SparkSession, d: String) => qCube(s, d)),
    "events_anomaly" -> ((s: SparkSession, d: String) => eventsAnomaly(s, d)))

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> asofDemoSql,
    "q_approx_distinct" -> approxDistinctAuditSql,
    "q_approx_percentiles" -> approxPercentilesAuditSql,
    "q_range_join" -> rangeDemoSql,
    "q_topn_per_group" -> qTopPerPrioritySql,
    "q_pivot" -> qPivotSql,
    "store_bucketed_join" -> storeBucketedJoinSql,
    "q10_returns" -> q10Sql,
    "q_rollup" -> qRollupSql,
    "q_percentiles" -> qPercentilesSql,
    "q5_local_supplier" -> q5Sql,
    "q18_large_orders" -> q18Sql,
    "q1_agg" -> q1AggSql,
    "q3_join_topn" -> q3JoinTopNSql,
    "q_window" -> qWindowSql,
    "q_window_rolling" -> qWindowRollingSql,
    "q_cube" -> qCubeSql,
    "events_anomaly" -> eventsAnomalySql)
}
