package graft

import graft.operators.EvalOps
import org.apache.spark.sql.functions._

/** Eval-framework scoring metrics (reference: eval_framework/evaluation/
  * metrics/exact_match.py, f1.py; run_evaluation_module.py report). */
class EvalSpec extends SparkSpecBase {

  test("EM stratum scores 1.0 on both metrics; partial stratum is bounded and non-exact") {
    val s = EvalOps.queries("eval_em_f1")(spark, sf).cache()
    // every 10th doc answers with the golden text verbatim → EM = F1 = 1
    val exact = s.filter(col("qa_id") % 10 === 0)
    assert(exact.count() > 0)
    assert(exact.filter(col("em") =!= 1.0 || col("f1") =!= 1.0).count() === 0L)
    // the partial stratum never exact-matches but overlaps the golden
    val partial = s.filter(col("qa_id") % 10 =!= 0)
    assert(partial.count() > 0)
    assert(partial.filter(col("em") =!= 0.0).count() === 0L)
    assert(partial.filter(col("f1") <= 0.0 || col("f1") >= 1.0).count() === 0L,
      "words 5-10 share a proper token overlap with words 7-14")
    // scores live in [0, 1]
    assert(s.filter(col("f1") < 0.0 || col("f1") > 1.0).count() === 0L)
    s.unpersist()
  }

  test("F1 is the multiset harmonic mean the reference's Counter arithmetic computes") {
    // hand-check one partial row: recompute tp/p/r/f1 driver-side from
    // the same document text and compare to the operator's score
    val doc = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 10 =!= 0)
      .orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("text")).collect().head
    val words = doc.getString(1).split(" ")
    def norm(ts: Seq[String]): Seq[String] =
      ts.map(_.toLowerCase.replaceAll("\\W+", "")).filter(_.nonEmpty)
    val a = norm(words.slice(4, 10).toSeq) // words 5-10, 1-based
    val e = norm(words.slice(6, 14).toSeq) // words 7-14
    val tp = a.distinct.map(t => math.min(a.count(_ == t), e.count(_ == t))).sum
    val (p, r) = (tp.toDouble / a.size, tp.toDouble / e.size)
    val expected = math.rint((if (p + r == 0) 0.0 else 2 * p * r / (p + r)) * 1e4) / 1e4
    val got = EvalOps.queries("eval_em_f1")(spark, sf)
      .filter(col("qa_id") === doc.getLong(0)).collect().head.getDouble(2)
    assert(got === expected)
  }

  test("context coverage is the token recall of the context within the retrieval context") {
    val s = EvalOps.queries("eval_context_coverage")(spark, sf).cache()
    assert(s.count() > 0)
    assert(s.filter(col("coverage") < 0.0 || col("coverage") > 1.0).count() === 0L)
    // the strata overlap partially by construction (words 7-20 vs 1-16):
    // the average sits strictly inside (0, 1)
    val mean = s.agg(avg(col("coverage"))).collect().head.getDouble(0)
    assert(mean > 0.0 && mean < 1.0)
    s.unpersist()
  }

  test("report means re-derive from the per-case scores") {
    val s = EvalOps.queries("eval_em_f1")(spark, sf).cache()
    val n = s.count()
    val emMean = math.rint(s.agg(avg(col("em"))).collect().head.getDouble(0) * 1e4) / 1e4
    val rep = EvalOps.queries("eval_report")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rep("em") === ((n, emMean)))
    assert(rep("f1")._1 === n)
    s.unpersist()
  }

  test("dashboard renders from the distributed aggregates, bins conserve counts") {
    val hist = EvalOps.queries("eval_histogram")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val n = EvalOps.queries("eval_em_f1")(spark, sf).count()
    // every metric's bins sum back to the case count; bins stay in 0..9
    for (m <- Seq("em", "f1", "context_coverage")) {
      assert(hist.filter(_._1 == m).map(_._3).sum === n, m)
    }
    assert(hist.forall(h => h._2 >= 0 && h._2 <= 9))
    val html = EvalOps.dashboardHtml(spark, sf)
    assert(html.startsWith("<!DOCTYPE html>") && html.endsWith("</html>"))
    for (m <- Seq("em", "f1", "context_coverage"))
      assert(html.contains(s"<h2>$m Score Distribution</h2>"), m)
    assert(html.contains("ci95_lower") && html.contains("ci95_upper"),
      "the summary table carries the deterministic bootstrap CI")
    // deterministic render: byte-identical across calls
    assert(html === EvalOps.dashboardHtml(spark, sf))
  }

  test("bootstrap CI brackets the mean with deterministic resamples") {
    val ci = EvalOps.bootstrapCi(spark, sf).cache()
    val rows = ci.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(rows.map(_._1).sorted === Seq("context_coverage", "em", "f1"))
    // a 95% bootstrap CI of the mean contains the point estimate
    rows.foreach { case (m, mean, lo, hi) =>
      assert(lo <= mean && mean <= hi, s"$m: [$lo, $hi] should bracket $mean")
      assert(lo < hi, s"$m: non-degenerate interval")
      assert(lo >= 0.0 && hi <= 1.0, s"$m: scores live in [0,1]")
    }
    // deterministic resamples: identical output on a re-run
    val again = EvalOps.bootstrapCi(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(again.sortBy(_._1) === rows.sortBy(_._1))
    // em at sf0.01 has a known closed form: 1/5 of QA cases are the
    // verbatim stratum → mean = fraction of doc_id%10==0 among %5==0
    val emRow = rows.find(_._1 == "em").get
    val cases = EvalOps.queries("eval_em_f1")(spark, sf)
    val frac = cases.filter(col("em") === 1.0).count().toDouble / cases.count()
    assert(math.abs(emRow._2 - frac) < 1e-9)
    ci.unpersist()
  }
}
