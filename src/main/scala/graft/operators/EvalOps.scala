package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The eval-framework scoring metrics (reference: cognee/eval_framework/
  * evaluation/metrics/exact_match.py:10 and f1.py:12-44, aggregated as
  * run_evaluation_module.py:19 → analysis/metrics_calculator.py):
  * batch Exact-Match and token-multiset F1 over (question, answer,
  * golden_answer) test cases, plus the per-metric mean report.
  *
  * The reference scores answers its QA pipeline produced; here the test
  * cases are a deterministic projection of the documents corpus (every
  * 5th document is a QA record: the question is its first 6 words, the
  * golden answer words 7-14, and the system answer either the golden
  * text verbatim — every 10th doc, the exact-match stratum — or words
  * 5-10, a partial overlap), so both metrics exercise their full range
  * and the DuckDB oracle can re-derive the same cases.
  *
  * Scale shape: both metrics are IN-ROW arithmetic over short token
  * arrays — one narrow map over the pruned documents scan, zero
  * shuffles before the report's single-row aggregate. The multiset
  * true-positive count is the Σ min(count_a, count_e) fold the
  * reference's Counter arithmetic computes (f1.py:36), evaluated per
  * distinct actual token with two array filters — no explode, no join.
  * At 100 TB this is an embarrassingly parallel scan; the report is one
  * partial-aggregated global mean.
  */
object EvalOps {

  /** Normalize a free-text answer to the reference's F1 token list
    * (f1.py:16-26): lowercase, whitespace-split, strip every non-word
    * character from each token, drop empties. */
  private def f1Tokens(c: Column): Column =
    filter(
      transform(split(lower(c), "\\s+"), t => regexp_replace(t, "\\W+", "")),
      t => t =!= "")

  /** The deterministic QA projection: (qa_id, question, answer,
    * golden_answer). */
  private def qaCases(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    load(spark, dir, "documents").filter(col("doc_id") % 5 === 0)
      .select(
        col("doc_id").as("qa_id"),
        array_join(slice(words, 1, 6), " ").as("question"),
        when(col("doc_id") % 10 === 0, array_join(slice(words, 7, 8), " "))
          .otherwise(array_join(slice(words, 5, 6), " ")).as("answer"),
        array_join(slice(words, 7, 8), " ").as("golden_answer"))
  }

  private val qaCasesSql: String =
    """qa AS (
      |  SELECT doc_id AS qa_id,
      |    array_to_string((string_split(text, ' '))[1:6], ' ') AS question,
      |    CASE WHEN doc_id % 10 = 0
      |      THEN array_to_string((string_split(text, ' '))[7:14], ' ')
      |      ELSE array_to_string((string_split(text, ' '))[5:10], ' ') END AS answer,
      |    array_to_string((string_split(text, ' '))[7:14], ' ') AS golden_answer
      |  FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  /** Batch EM + F1, one row per test case.
    *
    * EM (exact_match.py:10-15): 1.0 iff trim+lowercase equality.
    * F1 (f1.py:28-44): tp = Σ_w min(count_actual(w), count_expected(w));
    * precision = tp/|actual|, recall = tp/|expected|, f1 = harmonic
    * mean (0 when p+r = 0); both token lists empty → 1.0. */
  def emF1(spark: SparkSession, dir: String): DataFrame = {
    val a = f1Tokens(col("answer"))
    val e = f1Tokens(col("golden_answer"))
    // Σ min over the token multisets: fold the DISTINCT actual tokens,
    // counting each in both lists — in-row, no explode (the
    // search_lexical_multiset counter arithmetic).
    val tp = aggregate(array_distinct(a), lit(0),
      (acc, t) => acc + least(size(filter(a, x => x === t)), size(filter(e, x => x === t))))
    val em = when(trim(lower(col("answer"))) === trim(lower(col("golden_answer"))), 1.0)
      .otherwise(0.0)
    val p = tp.cast("double") / size(a)
    val r = tp.cast("double") / size(e)
    val f1 = when(size(a) === 0 && size(e) === 0, 1.0)
      .otherwise(when(size(a) === 0 || size(e) === 0, 0.0)
        .otherwise(when(p + r === 0.0, 0.0).otherwise(lit(2.0) * p * r / (p + r))))
    qaCases(spark, dir)
      .select(col("qa_id"), em.as("em"), round(f1, 4).as("f1"))
  }

  private val tokSql = (c: String) =>
    s"list_filter(list_transform(string_split(lower($c), ' '), t -> regexp_replace(t, '\\W+', '', 'g')), t -> t <> '')"

  val emF1Sql: String =
    s"""WITH $qaCasesSql,
       |toks AS (
       |  SELECT qa_id, answer, golden_answer,
       |    ${tokSql("answer")} AS a, ${tokSql("golden_answer")} AS e
       |  FROM qa
       |),
       |scored AS (
       |  SELECT qa_id,
       |    CASE WHEN trim(lower(answer)) = trim(lower(golden_answer)) THEN 1.0 ELSE 0.0 END AS em,
       |    list_sum(list_transform(list_distinct(a),
       |      t -> least(len(list_filter(a, x -> x = t)), len(list_filter(e, x -> x = t))))) AS tp,
       |    len(a) AS na, len(e) AS ne
       |  FROM toks
       |)
       |SELECT qa_id, em,
       |  round(CASE
       |    WHEN na = 0 AND ne = 0 THEN 1.0
       |    WHEN na = 0 OR ne = 0 THEN 0.0
       |    WHEN tp * 1.0 / na + tp * 1.0 / ne = 0 THEN 0.0
       |    ELSE 2.0 * (tp * 1.0 / na) * (tp * 1.0 / ne) / (tp * 1.0 / na + tp * 1.0 / ne)
       |  END, 4) AS f1
       |FROM scored""".stripMargin

  /** Context coverage (context_coverage.py — the eval framework's third
    * metric): how much of the source context the retrieval context
    * covers. The reference scores it with deepeval's SummarizationMetric
    * COVERAGE leg — an LLM generates assessment questions from the
    * context and the score is the fraction answerable from the
    * retrieval context. The deterministic stand-in keeps the same
    * recall shape at token level: the fraction of the context's
    * distinct normalized tokens present in the retrieval context
    * (empty context → 1.0, nothing to cover). Cases project from the
    * same QA stratum: context = words 7-20 (the facts), retrieval
    * context = words 1-16 (what retrieval returned) — a proper partial
    * overlap, so the score exercises its range. */
  def contextCoverage(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val cases = load(spark, dir, "documents").filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("qa_id"),
        array_join(slice(words, 7, 14), " ").as("context"),
        array_join(slice(words, 1, 16), " ").as("retrieval_context"))
    val ctx = array_distinct(f1Tokens(col("context")))
    val rc = array_distinct(f1Tokens(col("retrieval_context")))
    val cov = when(size(ctx) === 0, 1.0)
      .otherwise(size(array_intersect(ctx, rc)).cast("double") / size(ctx))
    cases.select(col("qa_id"), round(cov, 4).as("coverage"))
  }

  val contextCoverageSql: String =
    s"""WITH cases AS (
       |  SELECT doc_id AS qa_id,
       |    array_to_string((string_split(text, ' '))[7:20], ' ') AS context,
       |    array_to_string((string_split(text, ' '))[1:16], ' ') AS retrieval_context
       |  FROM documents WHERE doc_id % 5 = 0
       |),
       |toks AS (
       |  SELECT qa_id,
       |    list_distinct(${tokSql("context")}) AS ctx,
       |    list_distinct(${tokSql("retrieval_context")}) AS rc
       |  FROM cases
       |)
       |SELECT qa_id,
       |  round(CASE WHEN len(ctx) = 0 THEN 1.0
       |    ELSE len(list_intersect(ctx, rc)) * 1.0 / len(ctx) END, 4) AS coverage
       |FROM toks""".stripMargin

  /** The aggregate report (metrics_calculator.py extract + mean;
    * run_evaluation_module.py:19 persists this shape): one row per
    * metric — score count and mean. The reference also bootstraps a
    * confidence interval (bootstrap_ci, 10k resamples) — inherently
    * randomized, so the deterministic report carries the exact
    * mean/min/max instead. */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val s = emF1(spark, dir).localCheckpoint(true)
    def one(src: DataFrame, metric: String, c: Column): DataFrame =
      src.agg(count(lit(1)).as("n"), round(avg(c), 4).as("mean"),
          round(min(c), 4).as("min"), round(max(c), 4).as("max"))
        .select(lit(metric).as("metric"), col("n"), col("mean"), col("min"), col("max"))
    one(s, "em", col("em")).union(one(s, "f1", col("f1")))
      .union(one(contextCoverage(spark, dir), "context_coverage", col("coverage")))
  }

  val reportSql: String =
    s"""WITH scored AS ($emF1Sql),
       |cov AS ($contextCoverageSql)
       |SELECT 'em' AS metric, count(*) AS n, round(avg(em), 4) AS mean,
       |  round(min(em), 4) AS min, round(max(em), 4) AS max FROM scored
       |UNION ALL
       |SELECT 'f1', count(*), round(avg(f1), 4), round(min(f1), 4), round(max(f1), 4)
       |FROM scored
       |UNION ALL
       |SELECT 'context_coverage', count(*), round(avg(coverage), 4),
       |  round(min(coverage), 4), round(max(coverage), 4)
       |FROM cov""".stripMargin

  /** Per-metric 10-bin score histogram — the DATA LAYER of the
    * reference's evaluation dashboard (analysis/dashboard_generator.py
    * create_distribution_plots: a 10-bin histogram per metric). Binning
    * is one distributed map + a tiny keyed aggregate (≤ 30 groups);
    * scores of 1.0 clamp into the top bin, plotly's inclusive upper
    * edge. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val em = emF1(spark, dir).localCheckpoint(true)
    val scores = em.select(lit("em").as("metric"), col("em").as("score"))
      .union(em.select(lit("f1").as("metric"), col("f1").as("score")))
      .union(contextCoverage(spark, dir)
        .select(lit("context_coverage").as("metric"), col("coverage").as("score")))
    scores
      .select(col("metric"), least(floor(col("score") * 10), lit(9.0)).cast("int").as("bin"))
      .groupBy(col("metric"), col("bin")).agg(count(lit(1)).as("n"))
  }

  val histogramSql: String =
    s"""WITH scored AS ($emF1Sql),
       |cov AS ($contextCoverageSql),
       |all_scores AS (
       |  SELECT 'em' AS metric, em AS score FROM scored
       |  UNION ALL SELECT 'f1', f1 FROM scored
       |  UNION ALL SELECT 'context_coverage', coverage FROM cov
       |)
       |SELECT metric, CAST(least(floor(score * 10), 9) AS INT) AS bin, count(*) AS n
       |FROM all_scores GROUP BY 1, 2""".stripMargin

  /** The dashboard itself (dashboard_generator.py create_dashboard):
    * a self-contained HTML page — per-metric summary table (with the
    * [[bootstrapCi]] deterministic 95% interval, the reference's
    * bootstrap-CI plot as numbers) + 10-bin distribution bars —
    * rendered from the DISTRIBUTED aggregates ([[report]],
    * [[bootstrapCi]], [[histogram]]; ≤ 36 rows collect driver-side,
    * never raw scores). */
  def dashboardHtml(spark: SparkSession, dir: String): String = {
    val rep = report(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val ci = bootstrapCi(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val hist = histogram(spark, dir).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>" +
      "<title>Evaluation Dashboard</title><style>" +
      "body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}" +
      "td,th{border:1px solid #999;padding:4px 8px}" +
      ".bar{background:#1f77b4;display:inline-block;height:12px}" +
      "</style></head><body><h1>Evaluation Dashboard</h1>"
    sb ++= "<h2>Aggregate Metrics</h2><table><tr><th>metric</th><th>n</th>" +
      "<th>mean</th><th>ci95_lower</th><th>ci95_upper</th><th>min</th><th>max</th></tr>"
    rep.foreach { case (m, n, mean, mn, mx) =>
      val (lo, hi) = ci(m)
      sb ++= s"<tr><td>$m</td><td>$n</td><td>$mean</td><td>$lo</td><td>$hi</td>" +
        s"<td>$mn</td><td>$mx</td></tr>"
    }
    sb ++= "</table>"
    rep.foreach { case (m, n, _, _, _) =>
      sb ++= s"<h2>$m Score Distribution</h2><table>"
      (0 to 9).foreach { b =>
        val c = hist.getOrElse((m, b), 0L)
        val w = if (n == 0) 0 else (300L * c / n).toInt
        sb ++= f"<tr><td>${b / 10.0}%.1f–${(b + 1) / 10.0}%.1f</td>" +
          s"<td><span class='bar' style='width:${w}px'></span> $c</td></tr>"
      }
      sb ++= "</table>"
    }
    sb ++= "</body></html>"
    sb.toString
  }

  /** Bootstrap confidence interval per metric — the DETERMINISTIC twin
    * of the reference's `bootstrap_ci` (analysis/metrics_calculator.py:7:
    * 10k `np.random.choice` resamples of the score list, mean of each,
    * 2.5th/97.5th percentile of the means). Two substitutions make it
    * reproducible and distributed:
    *
    *  - The multinomial resample becomes a POISSON bootstrap (the
    *    standard streaming/map-reduce bootstrap): replicate b draws each
    *    case with weight ~ Poisson(1), realized by inverting the
    *    Poisson(1) CDF at a deterministic uniform u = first-8-md5-hex of
    *    `metric:qa_id:b` / 2^32 — the corpus-wide md5 determinism rule
    *    ([[graft.operators.CurateOps]]'s split/sample primitive), so
    *    every engine draws the identical resamples.
    *  - The percentile over replicate means is the EXPLICIT order
    *    statistic (10th / 390th of B = 400 sorted means, ties broken by
    *    replicate id) rather than an engine-specific interpolation rule.
    *
    * Scale shape: the replicate fan-out is a constant B multiplier on a
    * narrow (metric, qa_id, score) projection, immediately collapsed by
    * a map-side-combined aggregate onto 3·B keys; the order-statistic
    * selection sorts a bounded B-length array per metric inside a 3-group
    * aggregate — no window over unbounded rows, no global sort. B = 400
    * (vs the reference's 10k) keeps the fan-out proportionate; the CI
    * machinery is B-independent. */
  def bootstrapCi(spark: SparkSession, dir: String, b: Int = 400): DataFrame = {
    val em = emF1(spark, dir).localCheckpoint(true)
    val scores = em.select(lit("em").as("metric"), col("qa_id"), col("em").as("score"))
      .union(em.select(lit("f1").as("metric"), col("qa_id"), col("f1").as("score")))
      .union(contextCoverage(spark, dir)
        .select(lit("context_coverage").as("metric"), col("qa_id"), col("coverage").as("score")))
      .localCheckpoint(true)
    val (kLo, kHi) = (math.ceil(0.025 * b).toInt, math.ceil(0.975 * b).toInt)
    val u = conv(substring(md5(concat_ws(":",
        col("metric"), col("qa_id"), col("b"))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    // Poisson(1) inverse CDF: cumulative e^-1 * Σ 1/k!; capped at 7
    // (P(X>6) ≈ 8e-5 — the same tail every finite inverter truncates).
    val w = when(u < 0.36787944117144233, 0).when(u < 0.7357588823428847, 1)
      .when(u < 0.9196986029286058, 2).when(u < 0.9810118431238462, 3)
      .when(u < 0.9963401531726563, 4).when(u < 0.9994058151824183, 5)
      .when(u < 0.9999167588507119, 6).otherwise(7)
    val repMeans = scores
      .select(col("metric"), col("qa_id"), col("score"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("w", w)
      .groupBy(col("metric"), col("b"))
      .agg((sum(col("w") * col("score")) / nullif(sum(col("w")), lit(0))).as("m"))
      .filter(col("m").isNotNull)
    val ci = repMeans.groupBy(col("metric"))
      .agg(sort_array(collect_list(struct(col("m"), col("b")))).as("ms"))
      .select(col("metric"),
        round(element_at(col("ms"), kLo).getField("m"), 4).as("ci_lower"),
        round(element_at(col("ms"), kHi).getField("m"), 4).as("ci_upper"))
    val means = scores.groupBy(col("metric")).agg(round(avg(col("score")), 4).as("mean"))
    means.join(broadcast(ci), Seq("metric"))
      .select(col("metric"), col("mean"), col("ci_lower"), col("ci_upper"))
  }

  val bootstrapCiSql: String = {
    val key = "metric || ':' || CAST(qa_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)"
    s"""WITH scored AS ($emF1Sql),
       |cov AS ($contextCoverageSql),
       |all_scores AS (
       |  SELECT 'em' AS metric, qa_id, em AS score FROM scored
       |  UNION ALL SELECT 'f1', qa_id, f1 FROM scored
       |  UNION ALL SELECT 'context_coverage', qa_id, coverage FROM cov
       |),
       |rep AS (
       |  SELECT metric, qa_id, score, CAST(i AS BIGINT) AS b
       |  FROM all_scores, unnest(range(400)) AS t(i)
       |),
       |drawn AS (
       |  SELECT metric, b, score,
       |    CAST(list_sum(list_transform(range(8),
       |      i -> (strpos('0123456789abcdef', substr(md5($key), CAST(i AS INT) + 1, 1)) - 1)
       |           * power(16, 7 - i))) AS DOUBLE) / 4294967296.0 AS u
       |  FROM rep
       |),
       |weighted AS (
       |  SELECT metric, b, score,
       |    CASE WHEN u < 0.36787944117144233 THEN 0 WHEN u < 0.7357588823428847 THEN 1
       |         WHEN u < 0.9196986029286058 THEN 2 WHEN u < 0.9810118431238462 THEN 3
       |         WHEN u < 0.9963401531726563 THEN 4 WHEN u < 0.9994058151824183 THEN 5
       |         WHEN u < 0.9999167588507119 THEN 6 ELSE 7 END AS w
       |  FROM drawn
       |),
       |means AS (
       |  SELECT metric, b, sum(w * score) / NULLIF(sum(w), 0) AS m
       |  FROM weighted GROUP BY 1, 2
       |),
       |ranked AS (
       |  SELECT metric, m,
       |    row_number() OVER (PARTITION BY metric ORDER BY m, b) AS rk
       |  FROM means WHERE m IS NOT NULL
       |),
       |ci AS (
       |  SELECT metric,
       |    round(max(CASE WHEN rk = 10 THEN m END), 4) AS ci_lower,
       |    round(max(CASE WHEN rk = 390 THEN m END), 4) AS ci_upper
       |  FROM ranked GROUP BY 1
       |)
       |SELECT s.metric, round(avg(s.score), 4) AS mean, ci.ci_lower, ci.ci_upper
       |FROM all_scores s JOIN ci USING (metric)
       |GROUP BY s.metric, ci.ci_lower, ci.ci_upper""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_em_f1" -> ((s: SparkSession, d: String) => emF1(s, d)),
    "eval_context_coverage" -> ((s: SparkSession, d: String) => contextCoverage(s, d)),
    "eval_histogram" -> ((s: SparkSession, d: String) => histogram(s, d)),
    "eval_report" -> ((s: SparkSession, d: String) => report(s, d)),
    "eval_bootstrap_ci" -> ((s: SparkSession, d: String) => bootstrapCi(s, d)))

  def oracles: Map[String, String] = Map(
    "eval_em_f1" -> emF1Sql,
    "eval_context_coverage" -> contextCoverageSql,
    "eval_histogram" -> histogramSql,
    "eval_report" -> reportSql,
    "eval_bootstrap_ci" -> bootstrapCiSql)
}
