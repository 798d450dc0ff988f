package graft.graph

import org.apache.spark.sql.SparkSession

/** One shared implementation of the per-(session, dir) derived-artifact
  * cache (TpchGraph projection, co-purchase edges, typed subgraphs):
  * build once per live session+dataset, evict every entry of a session
  * the moment it is found stopped — a long-lived JVM that creates many
  * sessions (test runners, repeated bench mains) must not pin artifact
  * references for dead sessions forever.
  *
  * An optional `stamp` captures corpus freshness (e.g. the parquet file
  * listing): when the stamp of a cached entry no longer matches, the
  * artifact is rebuilt — so an ingest that appends to the corpus mid-
  * session can't keep serving a quantizer trained on the old data.
  * A replaced or session-evicted artifact that is itself a persisted
  * DataFrame is unpersisted on the way out: Spark's CacheManager never
  * drops plan-keyed entries on its own, so a stamp-driven rebuild of a
  * persisted artifact (the PQ-encoded corpus) would otherwise leak the
  * superseded cache entry for the life of the session. */
object SessionDirCache {
  /** The relational tables the knowledge-graph projection (and every
    * artifact derived from it) reads — the dependency set their
    * freshness stamps must cover. */
  val graphTables: Seq[String] =
    Seq("region", "nation", "supplier", "customer", "part", "orders", "lineitem")

  /** Corpus-freshness stamp over the named parquet tables of the sf
    * dir: the (name, length, mtime) file listing, cheap (a driver-side
    * FS listing, no data read) and change-sensitive — an ingest that
    * rewrites or appends any input table mid-session rebuilds the
    * artifact instead of silently serving the stale one. One shared
    * stamp shape across vector caches (quantizer/PQ/encoded) and graph
    * caches (projection/triplets/feedback/temporal) keeps the
    * freshness story consistent across artifacts. */
  def parquetStamp(tables: Seq[String]): (SparkSession, String) => String =
    (spark, dir) => tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) s"$t:absent"
      else fs.listStatus(p)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(",")
    }.mkString(";")

  // Every live instance, so a whole-session eviction can reach the
  // private caches scattered across the operator modules.
  private val instances =
    new java.util.concurrent.CopyOnWriteArrayList[SessionDirCache[_]]()
  private def register(c: SessionDirCache[_]): Unit = instances.add(c)

  /** Evict `spark`'s entries from EVERY SessionDirCache (graph
    * projections, co-purchase edges, feedback/temporal graphs, vector
    * artifacts): persisted frames are released and the next access
    * rebuilds. The bench's regression re-check runs behind this so its
    * third number approximates a fresh JVM (suite-cache interactions
    * removed) instead of re-measuring whatever the suite left warm.
    * localCheckpoint blocks of evicted artifacts are NOT force-dropped —
    * they are unreachable after eviction and the ContextCleaner reclaims
    * them; force-dropping would break any still-referenced frame, whose
    * lineage cannot recompute past a checkpoint. */
  def evictSession(spark: SparkSession): Unit = {
    instances.forEach(_.evict(spark))
    if (!spark.sparkContext.isStopped) spark.catalog.clearCache()
  }
}

/** Cache value whose persisted storage lives in narrow base relations
  * (`pins`) rather than in the exposed value itself — e.g. a
  * [[PropertyGraph]] of lazy rendering projections over persisted
  * string bases, where unpersisting the derived nodes/edges frames
  * would be a no-op. Eviction releases the pins. */
final case class Pinned[T](pins: Seq[org.apache.spark.sql.DataFrame], value: T)

final class SessionDirCache[T](build: (SparkSession, String) => T,
    stamp: (SparkSession, String) => String = (_, _) => "") {
  SessionDirCache.register(this)
  private val cache = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, T)]

  /** Drop every entry of `spark`, releasing persisted frames — the next
    * access rebuilds from scratch. Used by the bench's fresh-cache
    * regression re-check ([[SessionDirCache.evictSession]]). */
  private[graft] def evict(spark: SparkSession): Unit =
    cache.keysIterator.filter(_._1 eq spark).toList.foreach { k =>
      cache.remove(k).foreach { case (_, v) => release(spark, v) }
    }

  // Safe under the concurrent double-build race (two threads miss, both
  // build, the loser's value is released while its caller holds it):
  // unpersist only drops cached blocks — the DataFrame's lineage stays
  // valid and recomputes on access, so the race costs a recompute,
  // never a wrong result.
  private def release(spark: SparkSession, v: T): Unit = v match {
    case df: org.apache.spark.sql.DataFrame if !spark.sparkContext.isStopped =>
      df.unpersist(blocking = false)
    case g: PropertyGraph if !spark.sparkContext.isStopped =>
      g.nodes.unpersist(blocking = false)
      g.edges.unpersist(blocking = false)
    case p: Pinned[_] if !spark.sparkContext.isStopped =>
      p.pins.foreach(_.unpersist(blocking = false))
    case _ => ()
  }

  def apply(spark: SparkSession, dir: String): T = {
    cache.keysIterator.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    val s = stamp(spark, dir)
    cache.get((spark, dir)) match {
      case Some((`s`, v)) => v
      case _ =>
        val v = build(spark, dir)
        cache.put((spark, dir), (s, v)).foreach { case (_, old) => release(spark, old) }
        v
    }
  }
}
