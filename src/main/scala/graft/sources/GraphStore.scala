package graft.sources

import graft.graph.PropertyGraph
import org.apache.spark.sql.SparkSession

/** Parquet-backed persistent property-graph store — the Spark face of
  * cognee's persistent graph backends (the kuzu/neo4j adapters persist
  * NodeData/EdgeData with their property dicts,
  * graph_db_interface.py:16-34, and get_graph_data reads them back).
  *
  * A graph is two parquet directories (nodes, edges) under
  * `root/<name>/`, property bags included — so a PropertyGraph built
  * from mutation plans (addNodes/addEdges/deleteNodes compose lazily)
  * is COMMITTED by `save`: the write materializes the plan, and a later
  * session `load`s the result with no re-derivation. All paths go
  * through the Hadoop FileSystem API (local disk / HDFS / object
  * store alike).
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

  def hasGraph(name: String): Boolean = fs.exists(path(name, "nodes"))

  /** Persist (commit) a graph — props normalized so every stored graph
    * carries the full NodeData/EdgeData schema.
    *
    * Self-overwrite-safe: the committed graph usually DERIVES from the
    * same stored graph (load → mutate → commit), and a plain overwrite
    * deletes the input directory before the lazy mutation plan reads
    * it. Both relations land durably in `.tmp` FIRST (materializing
    * every plan against the old state — edge plans may cross-reference
    * the nodes directory, so neither swap may fire before both writes
    * finish), then each promotes by rename — the AclStore/VectorStore
    * swap discipline. */
  def save(name: String, g: PropertyGraph): Unit = {
    val subs = Seq(
      "nodes" -> PropertyGraph.ensureProps(g.nodes),
      "edges" -> PropertyGraph.ensureProps(g.edges))
    val staged = subs.map { case (sub, df) =>
      val tmp = new org.apache.hadoop.fs.Path(path(name, sub).toString + ".tmp")
      df.write.mode("overwrite").parquet(tmp.toString)
      sub -> tmp
    }
    staged.foreach { case (sub, tmp) =>
      val dir = path(name, sub)
      val old = new org.apache.hadoop.fs.Path(dir.toString + ".old")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(dir)) require(fs.rename(dir, old), s"swap failed: could not park $dir")
      require(fs.rename(tmp, dir), s"swap failed: could not promote $tmp")
      if (fs.exists(old)) fs.delete(old, true)
    }
  }

  def load(name: String): PropertyGraph =
    PropertyGraph(
      spark.read.parquet(path(name, "nodes").toString),
      spark.read.parquet(path(name, "edges").toString))

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
