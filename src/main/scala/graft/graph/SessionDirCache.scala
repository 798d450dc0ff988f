package graft.graph

import org.apache.spark.sql.SparkSession

/** One shared implementation of the per-(session, dir) derived-artifact
  * cache (TpchGraph projection, co-purchase edges, typed subgraphs):
  * build once per live session+dataset, evict every entry of a session
  * the moment it is found stopped — a long-lived JVM that creates many
  * sessions (test runners, repeated bench mains) must not pin artifact
  * references for dead sessions forever. */
final class SessionDirCache[T](build: (SparkSession, String) => T) {
  private val cache = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), T]

  def apply(spark: SparkSession, dir: String): T = {
    cache.keysIterator.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.getOrElseUpdate((spark, dir), build(spark, dir))
  }
}
