package graft

import graft.graph.PropertyGraph
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpecBase {

  test("Graft facade dispatches every search type to a non-empty plan") {
    import Graft._
    // all 16 reference SearchType members (GraphCompletion shares
    // RagCompletion's plan; ContextExtension has its OWN fixpoint loop)
    val types = Seq(Chunks, ChunksLexical, Summaries, Insights, RagCompletion,
      GraphCompletion, GraphCompletionCot, GraphCompletionContextExtension,
      GraphSummaryCompletion, Code, CodingRules, Feedback,
      Temporal, Cypher, NaturalLanguage, FeelingLucky)
    types.foreach { t =>
      assert(Graft.search(spark, sf, t).count() > 0, s"search type ${t.name} empty")
    }
    // CONTEXT_EXTENSION no longer aliases COT: distinct operators,
    // distinct shapes (accumulated triplet rounds vs doc-retrieval hops)
    assert(Graft.search(spark, sf, GraphCompletionContextExtension).columns.contains("round"))
    assert(Graft.search(spark, sf, GraphCompletionCot).columns.contains("hop"))
    val viaCypher = Graft.searchCypher(spark, sf,
      "MATCH (n:nation)-[:in_region]->(r:region) RETURN r.name AS region, count(*) AS n ORDER BY region")
    assert(viaCypher.count() === 5L)
  }

  test("facade covers every reference API verb") {
    assert(Graft.delete(spark, sf).count() === 4L)  // 4 ledger stages
    assert(Graft.update(spark, sf).count() === 4L)
    assert(Graft.memify(spark, sf).count() === 6L)
    val pruned = Graft.prune(Pipeline.cognify(spark, sf).graph)
    assert(pruned.nodes.count() === 0L && pruned.edges.count() === 0L)
    assert(Graft.visualize(spark, sf, maxNodes = 10).startsWith("<!DOCTYPE html>"))
    assert(Graft.getMemoryFragment(spark, sf).count() === 10L)
  }

  test("run ledger resolves the latest status per dataset, replay-stable") {
    val l = Pipeline.RunLedger.empty(spark)
      .log("r1", "ds_a", "DATASET_PROCESSING_INITIATED", 0)
      .log("r1", "ds_a", "DATASET_PROCESSING_STARTED", 1)
      .log("r1", "ds_a", "DATASET_PROCESSING_COMPLETED", 2)
      .log("r2", "ds_b", "DATASET_PROCESSING_STARTED", 1)
      .log("r2", "ds_b", "DATASET_PROCESSING_ERRORED", 2)
      .log("r3", "ds_b", "DATASET_PROCESSING_STARTED", 3)
    val st = l.status.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(st("ds_a") === ("DATASET_PROCESSING_COMPLETED", "r1"))
    assert(st("ds_b") === ("DATASET_PROCESSING_STARTED", "r3")) // retry wins by seq
    assert(l.status.count() === 2L)
  }

  test("pipeline run metrics agree with the cognify graph and token sum") {
    val m = Pipeline.runMetrics(spark, sf).collect().head
    val g = Pipeline.cognify(spark, sf).graph
    assert(m.getAs[Long]("num_nodes") === g.nodes.count())
    assert(m.getAs[Long]("num_edges") === g.edges.count())
    val expectedTokens = Tables.load(spark, sf, "documents")
      .select(sum(ceil(length(col("text")) / 4.0).cast("long"))).collect().head.getLong(0)
    assert(m.getAs[Long]("num_tokens") === expectedTokens)
    assert(m.getAs[Double]("mean_degree") > 0.0)
  }

  test("driver flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("cognify graph view: mention edges land between doc and entity nodes") {
    val g = Pipeline.cognify(spark, sf).graph
    val nodeIds = g.nodes.select(col("id"))
    val dangling = g.edges
      .join(nodeIds.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .count() +
      g.edges.join(nodeIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti").count()
    assert(dangling === 0L)
    assert(g.nodes.filter(col("ntype") === "entity").count() === 31L) // corpus vocabulary
  }

  test("collections round-trip through the parquet sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val r = Pipeline.cognify(spark, sf)
    Pipeline.writeCollections(r, out)
    val back = spark.read.parquet(s"$out/mentions")
    assert(back.count() === r.mentions.count())
  }

  test("memify ledger is internally consistent with the cognify graph") {
    val ledger = Pipeline.memify(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val g = Pipeline.cognify(spark, sf).graph
    assert(ledger("rules_added") === ledger("nodeset_entities"))
    assert(ledger("nodes_after") === g.nodes.count() + ledger("rules_added"))
    assert(ledger("edges_after") === g.edges.count() + ledger("assoc_edges_added"))
    assert(ledger("docs_extracted") <= ledger("assoc_edges_added"))
    assert(ledger("nodeset_entities") > 0L)
  }

  test("code dependency graph: bounded fan-out, no self-edges, resolved providers") {
    val deps = operators.CodeGraphOps.dependencies(spark, sf).collect()
    assert(deps.nonEmpty && deps.length <= 20)
    // a file's import block has at most 8 distinct names
    assert(deps.forall(_.getLong(2) <= 8L))
    // top-20 is ordered by fan-in
    val fanIns = deps.map(_.getLong(3))
    assert(fanIns.sameElements(fanIns.sortBy(-_)))
  }

  test("runTasks: composable chain ≡ canned cognify on the default task list") {
    val spark = TestSpark.spark
    val docs = Tables.load(spark, sf, "documents")
    val (out, ledger) = Pipeline.runTasks(Pipeline.defaultCognifyTasks, docs,
      "run-x", "documents", Pipeline.RunLedger.empty(spark))
    val canned = Pipeline.cognify(spark, sf).mentions
    assert(out.columns.toSeq === canned.columns.toSeq)
    assert(out.exceptAll(canned).isEmpty && canned.exceptAll(out).isEmpty)
    // lifecycle events in seq order: initiated, started/completed pair, completed
    val evts = ledger.runs.orderBy("seq").collect().map(r => (r.getString(2), r.getLong(3)))
    assert(evts.toSeq === Seq(("initiated", 0L), ("task_started:extract_mentions", 1L),
      ("task_completed:extract_mentions", 2L), ("completed", 3L)))
    assert(ledger.status.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("documents", "completed")))
  }

  test("runTasks: a throwing task logs errored and rethrows with the ledger attached") {
    val spark = TestSpark.spark
    val docs = Tables.load(spark, sf, "documents")
    val boom = Pipeline.Task("boom", _ => throw new IllegalStateException("nope"))
    val e = intercept[Pipeline.TaskFailed] {
      Pipeline.runTasks(Pipeline.defaultCognifyTasks :+ boom, docs,
        "run-y", "documents", Pipeline.RunLedger.empty(spark))
    }
    assert(e.taskName === "boom")
    assert(e.getCause.isInstanceOf[IllegalStateException])
    val statuses = e.ledger.runs.orderBy("seq").collect().map(_.getString(2)).toSeq
    assert(statuses === Seq("initiated", "task_started:extract_mentions",
      "task_completed:extract_mentions", "task_started:boom", "errored:boom"))
  }

  test("delete modes diverge exactly by the post-cascade degree-one stage") {
    // soft (the reference's default) = doc + mentions + orphan cascade;
    // hard = soft + graph-wide degree-one entities. The synthetic SF
    // corpora have no degree-one entities (every vocabulary token
    // appears in hundreds of docs — the registered hard query's stage
    // is legitimately 0 there), so the divergence is pinned on a
    // crafted corpus: deleting src5's "alpha beta" orphans `beta` and
    // leaves `alpha`/`delta` with exactly one mention each (hard
    // deletes them) while `gamma` keeps two (both modes keep it).
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delmode").toString
    Seq((0L, "alpha beta", "en", "src5", 10L),
        (1L, "alpha gamma", "en", "src1", 11L),
        (2L, "gamma delta", "en", "src1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def stages(mode: String): Map[String, Long] =
      Pipeline.deleteDocs(spark, dir, mode = mode)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val soft = stages("soft")
    val hard = stages("hard")
    for (s <- Seq("docs_deleted", "mentions_deleted", "entities_orphaned"))
      assert(soft(s) === hard(s), s)
    assert(!soft.contains("entities_degree_one"))
    assert(soft === Map("docs_deleted" -> 1L, "mentions_deleted" -> 2L,
      "entities_orphaned" -> 1L, "entities_remaining" -> 3L))
    assert(hard === Map("docs_deleted" -> 1L, "mentions_deleted" -> 2L,
      "entities_orphaned" -> 1L, "entities_degree_one" -> 2L,
      "entities_remaining" -> 1L))
    assertThrows[IllegalArgumentException](Pipeline.deleteDocs(spark, dir, mode = "purge"))
  }

  test("graph mutations: add is idempotent, delete removes incident edges") {
    import TestSpark.spark.implicits._
    val g = PropertyGraph(
      Seq(("n:1", "t", "one"), ("n:2", "t", "two")).toDF("id", "ntype", "name"),
      Seq(("n:1", "n:2", "r")).toDF("src", "dst", "rel"))
    val g2 = g.addNodes(Seq(("n:2", "t", "two"), ("n:3", "t", "three")).toDF("id", "ntype", "name"))
    assert(g2.nodes.count() === 3L)
    val g3 = g2.addEdges(Seq(("n:1", "n:2", "r"), ("n:2", "n:3", "r")).toDF("src", "dst", "rel"))
    assert(g3.edges.count() === 2L) // re-added edge deduped
    val g4 = g3.deleteNodes(Seq("n:2").toDF("id"))
    assert(g4.nodes.collect().map(_.getString(0)).toSet === Set("n:1", "n:3"))
    assert(g4.edges.count() === 0L) // both edges were incident to n:2
  }
}
