package graft

import org.apache.spark.sql.functions._

/** The in-driver integrity/accuracy audits that graduated the
  * ANN/sketch registrations to hash-checked entries must actually
  * CATCH violations — a red path per audit, so a vacuous-true audit
  * can't pass review. */
class AuditSpec extends SparkSpecBase {

  test("annAudit flags a result whose reported score is not the true cosine") {
    val ok = operators.VectorOps.annAudit(spark, sf, operators.VectorOps.knnIvf(spark, sf))
    assert(ok.collect().forall(r => r.getBoolean(1) && r.getBoolean(2)))
    // corrupt one query's scores: an ADC/estimate leak into the output
    val leaked = operators.VectorOps.knnIvf(spark, sf)
      .withColumn("cosine",
        when(col("query_id") === 3, col("cosine") + 0.01).otherwise(col("cosine")))
    val bad = operators.VectorOps.annAudit(spark, sf, leaked)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!bad(3L) && bad.filterKeys(_ != 3L).values.forall(identity))
  }

  test("annAudit flags a result that overshoots k") {
    val over = operators.VectorOps.knnIvf(spark, sf)
      .unionByName(operators.VectorOps.knn(spark, sf)) // duplicates → >5 rows/query
    val audited = operators.VectorOps.annAudit(spark, sf, over).collect()
    assert(audited.exists(r => !r.getBoolean(2)))
  }

  test("annAudit flags a method that regressed to zero results (no vacuous green)") {
    val dead = operators.VectorOps.knnIvf(spark, sf).limit(0)
    val audited = operators.VectorOps.annAudit(spark, sf, dead).collect()
    // per-row checks are vacuously true, but method_alive is false on
    // EVERY row — a total-result-loss regression cannot hash green
    assert(audited.nonEmpty &&
      audited.forall(r => !r.getBoolean(r.fieldIndex("method_alive"))))
  }

  test("scoped insights resolve the stored query id against the UNSCOPED relation") {
    // the default query doc (vec 0) lives outside this scope: scoping
    // used to empty the query frame and silently return zero insights
    val scoped = operators.Retrievers.insights(spark, sf,
      datasets = operators.Retrievers.scopedDatasets)
    assert(scoped.count() > 0)
  }

  test("summaryCompletion's triplet leg scores the CALLER's query, like completionContext") {
    val qv = QueryVec.Id(7)
    def tripletRefs(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("part") === "triplet").select(col("ref"))
      .collect().map(_.getString(0)).toSet
    val viaSummary = tripletRefs(operators.Retrievers.summaryCompletion(spark, sf, qv))
    val viaContext = tripletRefs(operators.Retrievers.completionContext(spark, sf, qv))
    assert(viaSummary === viaContext && viaSummary.nonEmpty)
  }

  test("funnel: an empty predecessor stage leaves conversion NULL, not a fabricated 100%") {
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    Tables.load(spark, sf, "events").filter(col("event_type") === "view").limit(50)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = operators.EventOps.funnel(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows(1L) === Some(1.0))  // first stage converts by definition
    assert(rows(2L) === Some(0.0))  // no clicks out of >0 views
    assert(rows(3L) === None)       // 0 purchases / 0 clicks: undefined
  }

  test("sketch audits are green on the real data and red under drift") {
    val d = operators.RelationalOps.approxDistinctAudit(spark, sf).collect()
    assert(d.nonEmpty && d.forall(r => r.getBoolean(r.fieldIndex("approx_ok"))))
    val p = operators.RelationalOps.approxPercentilesAudit(spark, sf).collect()
    assert(p.nonEmpty && p.forall(r => r.getBoolean(r.fieldIndex("approx_ok"))))
    // the tolerance comparison itself: a 20% relative error must trip
    // the 15% HLL bound (computed the same way the audit computes it)
    val n = 100L
    val approx = (n * 1.2).toLong
    assert(math.abs(approx - n) > n * 0.15)
  }
}
