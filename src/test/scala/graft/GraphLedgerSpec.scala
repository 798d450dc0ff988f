package graft

import org.apache.spark.sql.functions._
import graft.graph.{GraphLedger, PropertyGraph, TpchGraph}

/** [[graft.graph.GraphLedger]] — the record_graph_changes audit wrapper
  * (graph_db_interface.py:22 → graph_relationship_ledger.py): every
  * mutation must (a) delegate to the exact PropertyGraph semantics and
  * (b) append per-entity audit rows with call ordering and principal. */
class GraphLedgerSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  private def base: PropertyGraph = TpchGraph(spark, sf)

  test("ledgered mutations delegate exactly: result graph ≡ unledgered PropertyGraph ops") {
    val nodesInc = Seq(("custom:1", "custom", "one"), ("custom:2", "custom", "two"))
      .toDF("id", "ntype", "name")
    val edgeInc = Seq(("custom:1", "custom:2", "linked")).toDF("src", "dst", "rel")
    val del = Seq("custom:2").toDF("id")
    val plain = base.addNodes(nodesInc).addEdges(edgeInc).deleteNodes(del)
    val led = GraphLedger(base).addNodes(nodesInc).addEdges(edgeInc).deleteNodes(del)
    assert(led.graph.nodes.count() === plain.nodes.count())
    assert(led.graph.edges.count() === plain.edges.count())
    // the surviving custom node is identical through both paths
    val a = plain.nodes.filter(col("ntype") === "custom").select("id", "name").collect().toSet
    val b = led.graph.nodes.filter(col("ntype") === "custom").select("id", "name").collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("entries record the ATTEMPTED increment per entity, in call order, with principal") {
    val led = GraphLedger(base)
      .addNodes(Seq(
        ("custom:1", "custom", "one"),
        ("nation:0", "nation", "dup-ignored")).toDF("id", "ntype", "name"), principal = "alice")
      .addEdges(Seq(("custom:1", "nation:0", "linked")).toDF("src", "dst", "rel"))
      .deleteNodes(Seq("custom:1").toDF("id"), principal = "bob")
    val rows = led.entries
      .select("seq", "op", "kind", "entity_id", "source_function", "principal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5))).toSet
    assert(rows === Set(
      (0L, "add_node", "node", "custom:1", "addNodes", "alice"),
      // keep-first ignored the duplicate id in the GRAPH, but the audit
      // row survives — the attempted mutation is what an auditor wants
      (0L, "add_node", "node", "nation:0", "addNodes", "alice"),
      (1L, "add_edge", "edge", "custom:1|linked|nation:0", "addEdges", "system"),
      (2L, "delete_node", "node", "custom:1", "deleteNodes", "bob")))
    assert(led.nextSeq === 3L)
  }

  test("long mutation scripts stay bounded: periodic graph + entries collapse") {
    // 70 chained calls: without the every-6 graph collapse the ~3^n
    // plan tree OOMs Catalyst's attribute rewrite long before the end
    // (measured); entries cross two lazy-checkpoint points (32, 64).
    // Every audit row AND every mutated node must survive both kinds
    // of collapse.
    val led = (1 to 70).foldLeft(GraphLedger(base)) { (lg, i) =>
      lg.addNodes(Seq((s"bulk:$i", "bulk", s"b$i")).toDF("id", "ntype", "name"))
    }
    assert(led.nextSeq === 70L)
    assert(led.entries.count() === 70L)
    val seqs = led.entries.select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq === (0L until 70L))
    assert(led.graph.nodes.filter(col("ntype") === "bulk").count() === 70L)
    assert(led.graph.nodes.count() === base.nodes.count() + 70L)
  }

  test("save/resume round-trip: persisted entries reload and seq continues monotone") {
    val path = java.nio.file.Files.createTempDirectory("graft_ledger").toString + "/log"
    val led = GraphLedger(base)
      .addNodes(Seq(("custom:9", "custom", "nine")).toDF("id", "ntype", "name"))
      .deleteNodes(Seq("custom:9").toDF("id"))
    led.save(path)
    val resumed = GraphLedger.resume(base, path)
    assert(resumed.nextSeq === 2L) // past the saved max seq (1)
    assert(resumed.entries.count() === 2L)
    // the durable log carries the write stamp; the resumed plan does not
    assert(spark.read.parquet(path).columns.contains("written_at"))
    assert(!resumed.entries.columns.contains("written_at"))
    val more = resumed.addNodes(Seq(("custom:10", "custom", "ten")).toDF("id", "ntype", "name"))
    val seqs = more.entries.select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq === Seq(0L, 1L, 2L))
    // a second save appends ONLY the unsaved increment (seq 2): the
    // persisted watermark keeps resume→mutate→save cycles from
    // re-appending rows the log already holds, so seq stays unique
    val more2 = more.save(path)
    val log = spark.read.parquet(path)
    assert(log.count() === 3L) // 2 saved + 1 new, no duplicates
    assert(log.select("seq").distinct().count() === 3L)
    // saving again with nothing new is a no-op on the log
    more2.save(path)
    assert(spark.read.parquet(path).count() === 3L)
  }

  test("resume on a missing log is a fresh ledger, and its first save creates the log") {
    val path = java.nio.file.Files.createTempDirectory("graft_ledger_fresh").toString + "/log"
    val resumed = GraphLedger.resume(base, path) // nothing written yet — first boot
    assert(resumed.nextSeq === 0L && resumed.entries.count() === 0L)
    val led = resumed.addNodes(Seq(("custom:11", "custom", "eleven")).toDF("id", "ntype", "name"))
    led.save(path)
    assert(spark.read.parquet(path).count() === 1L)
    assert(GraphLedger.resume(base, path).nextSeq === 1L)
  }

  test("fresh ledger is empty and typed; feedback/set/remove ops ledger their id sets") {
    val l0 = GraphLedger(base)
    assert(l0.entries.count() === 0L)
    assert(l0.entries.columns.toSeq ===
      Seq("seq", "op", "kind", "entity_id", "source_function", "principal"))
    val led = l0
      .applyFeedbackWeight(Seq(("customer:1", 2.0)).toDF("id", "weight"))
      .setNodeProp(Seq("nation:0").toDF("id"), "note", "x")
      .removeNodeProp(Seq("nation:0").toDF("id"), "note")
    val ops = led.entries.select("op", "kind", "entity_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ops === Set(
      ("feedback_weight", "edge", "customer:1"),
      ("set_prop:note", "node", "nation:0"),
      ("remove_prop:note", "node", "nation:0")))
    // and the graph-side effect of the set/remove round-trip is a no-op
    assert(led.graph.nodes.count() === base.nodes.count())
  }
}
