package graft.sources

import graft.graph.PropertyGraph
import org.apache.spark.sql.SparkSession

/** Parquet-backed persistent property-graph store — the Spark face of
  * cognee's persistent graph backends (the kuzu/neo4j adapters persist
  * NodeData/EdgeData with their property dicts,
  * graph_db_interface.py:16-34, and get_graph_data reads them back).
  *
  * A committed graph is one GENERATION directory `root/<name>/v<N>/`
  * holding the two parquet relations (nodes, edges — property bags
  * included), plus a tiny `_CURRENT` pointer file naming the committed
  * generation. `save` writes the next generation to a FRESH directory
  * (never touching the one the mutation plan may still be lazily
  * reading — load → mutate → commit is the normal cycle), then commits
  * by atomically replacing the pointer, then garbage-collects older
  * generations. This is crash-consistent at every step, unlike the
  * rename-swap it replaces (judged ADVICE r13: a crash between parking
  * and promoting left NO live directory; a crash between the nodes and
  * edges promotions left a mixed-generation graph):
  *   - crash during the parquet writes → pointer still names the old
  *     generation; the partial directory is GC'd by the next save;
  *   - crash inside the pointer replace → recovery adopts the newest
  *     COMPLETE generation (both _SUCCESS markers present) — exactly
  *     the one the interrupted commit intended;
  *   - crash before GC → stale generations linger harmlessly until the
  *     next save.
  * The layout is also the object-store-friendly one: bulk data moves
  * never happen (directories are written once and deleted), the only
  * rename is a one-line pointer file. Graphs persisted by the old
  * swap layout (`root/<name>/{nodes,edges}` + `.old` parking) still
  * load, including rollback of a parked `.old` with no live dir.
  * All paths go through the Hadoop FileSystem API (local disk / HDFS /
  * object store alike).
  *
  * For traversal-heavy reload patterns, [[saveAdjacency]] additionally
  * persists the edge relation bucketed+sorted by `src` — the
  * adjacency-organized layout a native graph store maintains,
  * re-expressed as a bucketed table so reloaded per-hop joins read
  * co-located buckets without an Exchange (the BucketedStore contract).
  */
final case class GraphStore(spark: SparkSession, root: String) {

  private def path(parts: String*) =
    new org.apache.hadoop.fs.Path((root +: parts).mkString("/"))
  private def fs =
    new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(name: String) = path(name, "_CURRENT")

  private def listGenNums(name: String): Seq[Int] = {
    val f = fs
    if (!f.exists(path(name))) Seq.empty
    else f.listStatus(path(name)).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
  }

  /** Both relations finished their job commit (Spark's _SUCCESS marker). */
  private def genComplete(name: String, gen: String): Boolean =
    fs.exists(path(name, gen, "nodes", "_SUCCESS")) &&
      fs.exists(path(name, gen, "edges", "_SUCCESS"))

  /** Atomically point `_CURRENT` at `gen` — the shared
    * [[AtomicPointer]] protocol; a crash between its delete and rename
    * is covered by [[currentGen]]'s adopt-newest-complete recovery. */
  private def commitPointer(name: String, gen: String): Unit = {
    FaultPoints.hit("graphstore.commit.begin")
    AtomicPointer.commit(fs, pointer(name), gen, "graphstore.commit")
  }

  /** The committed generation, healing crash states: a missing or
    * dangling pointer adopts the newest generation whose both relations
    * carry _SUCCESS. Adoption is READ-ONLY — the pointer is re-written
    * only by the next save's commit, so concurrent readers after
    * pointer loss don't race each other's recovery writes and a
    * read-only filesystem can still load (the gen scan is one
    * listStatus). None → not versioned (legacy layout or absent). */
  private def currentGen(name: String): Option[String] = {
    val f = fs
    val pointed = AtomicPointer.read(f, pointer(name))
      .filter(g => f.exists(path(name, g, "nodes")))
    pointed.orElse(
      listGenNums(name).sorted.reverse.map("v" + _).find(genComplete(name, _)))
  }

  /** True when ANY recoverable copy exists — committed generation,
    * legacy live dir, or a legacy crash-parked `.old` whose live dir is
    * gone (load() rolls that one back). A create-if-absent caller must
    * see the parked copy, or its save() would GC the only copy of a
    * graph that load() could still restore. */
  def hasGraph(name: String): Boolean =
    currentGen(name).isDefined || fs.exists(path(name, "nodes")) ||
      fs.exists(path(name, "nodes.old"))

  /** Persist (commit) a graph — props normalized so every stored graph
    * carries the full NodeData/EdgeData schema. Both relations
    * materialize into a fresh generation directory (plans may lazily
    * read the current generation — it is never touched), then one
    * pointer replace commits, then older generations and any legacy
    * swap-layout leftovers are GC'd. */
  def save(name: String, g: PropertyGraph): Unit = {
    val f = fs
    val next = "v" + (listGenNums(name).maxOption.getOrElse(0) + 1)
    Seq("nodes" -> PropertyGraph.ensureProps(g.nodes),
        "edges" -> PropertyGraph.ensureProps(g.edges))
      .foreach { case (sub, df) =>
        FaultPoints.hit(s"graphstore.save.before-$sub")
        df.write.mode("overwrite").parquet(path(name, next, sub).toString)
        FaultPoints.hit(s"graphstore.save.$sub-written")
      }
    commitPointer(name, next)
    FaultPoints.hit("graphstore.save.before-gc")
    listGenNums(name).map("v" + _).filterNot(_ == next)
      .foreach(gen => f.delete(path(name, gen), true))
    Seq("nodes", "edges", "nodes.old", "edges.old", "nodes.tmp", "edges.tmp")
      .foreach(d => f.delete(path(name, d), true))
  }

  def load(name: String): PropertyGraph = currentGen(name) match {
    case Some(gen) =>
      PropertyGraph(
        spark.read.parquet(path(name, gen, "nodes").toString),
        spark.read.parquet(path(name, gen, "edges").toString))
    case None =>
      // Legacy swap-era layout. Roll back a parked `.old` whose live
      // directory is missing (the old save's crash window) before
      // reading — the parked copy is the only one.
      val f = fs
      Seq("nodes", "edges").foreach { sub =>
        val dir = path(name, sub)
        val old = new org.apache.hadoop.fs.Path(dir.toString + ".old")
        if (f.exists(old) && !f.exists(dir))
          require(f.rename(old, dir), s"recovery failed: could not restore $old")
      }
      PropertyGraph(
        spark.read.parquet(path(name, "nodes").toString),
        spark.read.parquet(path(name, "edges").toString))
  }

  /** Drop one stored graph (delete_graph on the persistent surface). */
  def deleteGraph(name: String): Unit = { fs.delete(path(name), true); () }

  /** Names of the stored graphs under root. */
  def listGraphs(): Seq[String] =
    if (!fs.exists(path())) Seq.empty
    else fs.listStatus(path()).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted

  /** Persist the edge relation bucketed+sorted by src as catalog table
    * `<table>` — per-hop traversal joins on the reloaded relation read
    * co-located buckets (no Exchange on the edge side). Bucket count
    * should match (or divide) spark.sql.shuffle.partitions. */
  def saveAdjacency(name: String, g: PropertyGraph, table: String, nBuckets: Int): Unit =
    BucketedStore.write(PropertyGraph.ensureProps(g.edges), table, "src", nBuckets,
      path(name, "adjacency").toString)

  /** Reload a bucketed adjacency by catalog name. Per-hop expansion
    * joins on `src` read the co-located buckets directly — only the
    * (small) frontier side exchanges; feed it to
    * [[graft.graph.GraphAlgos.kHopAdjacency]] (the spec pins the
    * one-Exchange-per-hop plan vs two for an unbucketed reload). */
  def loadAdjacency(table: String): org.apache.spark.sql.DataFrame =
    BucketedStore.read(spark, table)
}
