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
  def stored(df: DataFrame): DataFrame = storedImpl(df, None)

  /** [[stored]] plus an explicitly CLAIMED hash layout: the rebuilt scan
    * reports `HashPartitioning(keys, numParts)`, so EnsureRequirements
    * plans later equi-joins/aggregates keyed on `keys` with NO exchange
    * on this side. `localCheckpoint` alone cannot provide this — under
    * AQE the checkpointed physical plan is adaptive and the captured
    * [[LogicalRDD]] reports unknown partitioning, so a stored relation
    * read N times by key gets re-exchanged N times.
    *
    * THE CALLER GUARANTEES THE CLAIM: `df` must end in
    * `repartition(numParts, keys)` — with the partition count explicit,
    * so AQE never coalesces the exchange — optionally followed by
    * partitioning-PRESERVING ops only (filter/project keeping the keys,
    * or an aggregate whose grouping contains the keys: its required
    * ClusteredDistribution is satisfied by the child layout, so no
    * exchange is inserted and rows stay put). A wrong claim silently
    * elides required exchanges and produces WRONG JOIN RESULTS — this is
    * the one deliberately sharp edge in the file. The partition-count
    * assertion below catches the blunt misuse (AQE re-planning the
    * width); key-layout drift it cannot see.
    */
  def storedHashed(df: DataFrame, numParts: Int, keys: String*): DataFrame =
    storedImpl(df, Some((numParts, keys)))

  private def storedImpl(df: DataFrame, claim: Option[(Int, Seq[String])]): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
    val cds = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cds.sparkSession
    val lr = cds.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l }
      .getOrElse(throw new IllegalStateException(
        "localCheckpoint did not produce a LogicalRDD scan"))
    val part = claim match {
      case None => lr.outputPartitioning
      case Some((n, keys)) =>
        require(lr.rdd.getNumPartitions == n,
          s"storedHashed claim of $n partitions but the checkpointed RDD has " +
            s"${lr.rdd.getNumPartitions} — AQE re-planned the layout; the claim would be wrong")
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(s"storedHashed key '$k' not in ${lr.output}")))
        org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(attrs, n)
    }
    val bare = LogicalRDD(lr.output, lr.rdd, part, lr.outputOrdering,
      lr.isStreaming)(spark, None, None)
    org.apache.spark.sql.classic.Dataset.ofRows(spark, bare)
  }
}
