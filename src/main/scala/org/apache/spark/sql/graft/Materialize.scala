package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager executor-local materialization WITHOUT origin metadata.
  *
  * `Dataset.localCheckpoint` stores the rows and replaces the plan with
  * a [[LogicalRDD]], but also snapshots the ORIGIN plan's statistics and
  * constraints onto it. Those origin constraints can reference attribute
  * ids that are no longer part of the checkpoint's output (the optimized
  * plan's aliasing), and Catalyst's `UnionBase.rewriteConstraints` then
  * dies with `key not found: <attr>` the moment a union of such scans
  * has its constraints computed — e.g. when a join is planned against an
  * iterative loop's per-level union, or when the union itself is
  * re-checkpointed (`LogicalRDD.fromDataset` computes
  * `optimizedPlan.constraints` to snapshot them).
  *
  * [[stored]] checkpoints eagerly, then rebuilds the scan node bare:
  * same output attributes, same stored rows and partitioning, no origin
  * statistics/constraints. The cost is default size statistics (no
  * precise broadcast estimation); AQE re-plans joins from actual runtime
  * sizes, which is the mechanism iterative frontiers rely on anyway.
  */
object Materialize {
  def stored(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
    val cds = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cds.sparkSession
    val lr = cds.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l }
      .getOrElse(throw new IllegalStateException(
        "localCheckpoint did not produce a LogicalRDD scan"))
    val bare = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
      lr.isStreaming)(spark, None, None)
    org.apache.spark.sql.classic.Dataset.ofRows(spark, bare)
  }
}
