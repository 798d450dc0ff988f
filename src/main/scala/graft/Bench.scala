package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract: one JSON line on stdout).
  *
  * Honesty rules: a query that throws is recorded in `errors` with its
  * exception — never silently timed as if it succeeded; each query runs
  * `SPARK_GRAFT_REPEAT` passes (default 2) and reports the LAST (warm)
  * pass, so the reported number measures the plan, not JVM/codegen
  * cold-start (single-shot runs diverged 1.35x across rounds on
  * byte-identical code). The JSON line is printed after `spark.stop()`
  * with log level ERROR so shutdown logging cannot interleave with it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // Dev knobs: SPARK_GRAFT_ONLY=q1,q2 restricts the set;
    // SPARK_GRAFT_REPEAT=n overrides the warm-repeat count.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.map { case (name, fn) =>
      var first = 0.0
      var last = 0.0
      var pass = 0
      while (pass < repeat && !errors.contains(name)) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch {
          case e: Throwable =>
            errors(name) = (e.getClass.getName + ": " + String.valueOf(e.getMessage))
              .replaceAll("""["\\\n\r\t]""", " ").take(200)
        }
        last = (System.nanoTime() - t0) / 1e9
        if (pass == 0) first = last
        pass += 1
      }
      (name, first, last)
    }
    // Previous-round per-query records: the newest BENCH_r*.json in the
    // cwd (the driver snapshots one per round, same measurement channel).
    // A query whose warm time exceeds 2x its record lands in a
    // `regressed` map on BOTH output lines — cross-round regressions
    // stay visible even when the compact line's degradation tiers drop
    // per-query detail. Queries under 0.5 s are exempt (sub-second
    // jitter, not regression); errored queries are already reported.
    val records: Map[String, Double] = {
      val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      if (files.isEmpty) Map.empty
      else try {
        val latest = files.maxBy(f => f.getName.replaceAll("\\D", "").toInt)
        val qs = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(latest).path("parsed").path("queries")
        val out = scala.collection.mutable.Map.empty[String, Double]
        val it = qs.fields()
        while (it.hasNext) { val e = it.next(); out(e.getKey) = e.getValue.asDouble() }
        out.toMap
      } catch { case _: Throwable => Map.empty }
    }
    // A flagged query is re-run ONCE more, isolated at the end of the
    // suite, and the third number distinguishes driver/suite contention
    // (re-check ≈ record) from a genuine code regression (re-check ≈
    // the flagged warm time) — round 8's one flag turned out to be
    // contention and cost a manual re-measurement to adjudicate.
    val regressed: Seq[(String, Double, Double, Double)] = results.collect {
      case (k, _, v) if !errors.contains(k) && v >= 0.5 &&
        records.get(k).exists(r => r > 0 && v > 2 * r) =>
        // Fresh-cache re-run: evict every session-cached artifact (graph
        // projections, vector artifacts, CacheManager entries) first, so
        // the third number approximates a fresh JVM — distinguishing
        // contention (re-check ≈ record) from a cache-interaction
        // regression (re-check ≈ the flagged time) instead of
        // re-measuring whatever the suite left warm.
        graph.SessionDirCache.evictSession(spark)
        val t0 = System.nanoTime()
        try SparkEntry.queries(k)(spark, sfDir).count()
        catch { case _: Throwable => () } // already-reported class of failure
        (k, v, records(k), (System.nanoTime() - t0) / 1e9)
    }
    spark.stop()
    def fmt(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    val regressedJson = regressed
      .map { case (k, v, r, re) => "\"" + k + "\":[" + fmt(v) + "," + fmt(r) + "," + fmt(re) + "]" }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, _, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // First-pass (cold) times alongside the reported warm times, so a
    // reader can see per-query JIT/caching spread instead of guessing.
    val colds = results.map { case (k, c, _) => "\"" + k + "\":" + c }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    // total covers successful queries only; errors are reported, not summed.
    val total = results.collect { case (k, _, v) if !errors.contains(k) => v }.sum
    // Full-detail line first (9-decimal warm + cold maps, for humans reading logs)…
    System.out.println(
      s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":$qs,"cold":$colds,"errors":$errs,"regressed":$regressedJson,"repeat":$repeat,"sf":"$sfDir"}""")
    // …then the driver-contract line LAST and COMPACT (2-decimal warm times, no
    // cold map): the driver keeps only a bounded tail of the process output, and
    // rounds 1-3 proved a ~4 KB line gets front-truncated there and never parses
    // ("parsed": null in every BENCH_r*.json). This line stays under ~1.8 KB so
    // it sits whole inside the tail window even with sbt's epilogue after it.
    // Compact errors: the failing query NAMES must survive any budget
    // squeeze (full messages live on the detail line above), so messages
    // are pre-truncated here and dropped entirely as the last resort.
    val errsCompact = errors.map { case (k, v) => "\"" + k + "\":\"" + v.take(40) + "\"" }
      .mkString("{", ",", "}")
    val sfShort = sfDir.split('/').last
    def line(dec: Int, withErrs: Boolean, minSec: Double = 0.0): String = {
      def f(d: Double) = s"%.${dec}f".formatLocal(java.util.Locale.ROOT, d)
      val kept = results.filter { case (_, _, v) => v >= minSec }
      val qs2 = kept.map { case (k, _, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      val omitted = if (results.size == kept.size) ""
        else s""","n_fast_omitted":${results.size - kept.size}"""
      val e = if (errors.isEmpty) "" else if (withErrs) s""","errors":$errsCompact"""
        else s""","n_errors":${errors.size}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs2$omitted$e,"regressed":$regressedJson,"sf":"$sfShort"}"""
    }
    // Adaptive degradation, mildest first: 2→0 decimals with every query
    // present; drop error messages to a count; finally keep only the
    // ≥0.5 s queries (the driver's gate reads `value` — the per-query
    // map is diagnostic, and the hot queries are the diagnostic part) —
    // all before ever exceeding the ~1.8 KB tail-window budget.
    val candidates = (2 to 0 by -1).map(line(_, withErrs = true)) ++
      (2 to 0 by -1).map(line(_, withErrs = false)) ++
      Seq(line(2, withErrs = false, minSec = 0.5), line(1, withErrs = false, minSec = 0.5))
    System.out.println(candidates.find(_.length <= 1800).getOrElse(candidates.last))
    System.out.flush()
  }
}
