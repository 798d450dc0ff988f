package graft

import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ingest→cognify pipeline re-expressed as one declarative plan
  * (reference: cognee/api/v1/cognify/cognify.py:41 — add → classify → chunk → extract
  * entities/relations → store graph + vectors; the LLM extraction step
  * is replaced by a deterministic token-entity extractor, which is the
  * same contract: DataPoint nodes + relation edges out of text).
  *
  * Every stage is a DataFrame the caller can persist, write, or extend;
  * at cluster scale each stage is one narrow projection or one keyed
  * shuffle (explode→distinct for mentions), nothing driver-side.
  */
object Pipeline {

  final case class CognifyResult(
      documents: DataFrame,
      chunks: DataFrame,
      entities: DataFrame,
      mentions: DataFrame,
      vectors: DataFrame) {

    /** The knowledge graph view of the extraction: document + entity
      * nodes, mention edges. */
    def graph: PropertyGraph = PropertyGraph(
      documents.select(concat(lit("doc:"), col("doc_id").cast("string")).as("id"),
          lit("document").as("ntype"), concat(lit("doc-"), col("doc_id").cast("string")).as("name"))
        .union(entities.select(concat(lit("entity:"), col("entity")).as("id"),
          lit("entity").as("ntype"), col("entity").as("name"))),
      mentions.select(concat(lit("doc:"), col("doc_id").cast("string")).as("src"),
        concat(lit("entity:"), col("entity")).as("dst"), lit("mentions").as("rel")))
  }

  def cognify(spark: SparkSession, dir: String): CognifyResult = {
    val docs = Tables.load(spark, dir, "documents")
    val chunks = operators.TextOps.chunk(spark, dir)
    // Deterministic entity extraction: each distinct token is an entity
    // mention (the LLM extractor's contract without the LLM).
    val mentions = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("entity"))
    val entities = mentions.select(col("entity")).distinct()
    val vectors = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"), col("label"))
    CognifyResult(docs, chunks, entities, mentions, vectors)
  }

  /** Materialize every collection as parquet under outDir (the
    * vector/graph "store" sink). */
  def writeCollections(res: CognifyResult, outDir: String): Unit = {
    res.chunks.write.mode("overwrite").parquet(s"$outDir/chunks")
    res.entities.write.mode("overwrite").parquet(s"$outDir/entities")
    res.mentions.write.mode("overwrite").parquet(s"$outDir/mentions")
    res.vectors.write.mode("overwrite").parquet(s"$outDir/vectors")
  }

  /** Incremental add with dedup-on-ingest (cognee's incremental
    * loading: re-added content is identified by deterministic content
    * hash and skipped). Returns only the genuinely new documents —
    * anti-join on md5(text) against the existing corpus, shuffle keyed
    * on the hash. */
  def addIncrement(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val seen = existing.select(md5(col("text")).as("content_hash")).distinct()
    incoming
      .withColumn("content_hash", md5(col("text")))
      .join(seen, Seq("content_hash"), "left_anti")
      .drop("content_hash")
  }

  /** Document deletion with cascade (reference: cognee/api/v1/delete/
    * delete.py:31 — `mode: str = "soft"`, the reference's DEFAULT).
    * BOTH modes delete the document, its mention edges, and the
    * entities those deletions orphan (delete.py:227's unconditional
    * `orphan_entities` deletion-order stage — entities whose every
    * mention came from the deleted docs). `mode = "hard"`
    * ADDITIONALLY deletes the graph-wide degree-one entities left
    * after the cascade (delete.py:249-255 →
    * kuzu/adapter.py:1670 get_degree_one_nodes: nodes with exactly one
    * remaining connection; this projection has no EntityType nodes, so
    * the reference's second degree-one leg has no counterpart here).
    * All anti-joins keyed on doc or entity; the degree census is one
    * entity-keyed partial-aggregated count over the surviving mention
    * edges — no driver-side state. Returns per-stage deletion counts
    * (hard mode adds the `entities_degree_one` stage). */
  def deleteDocs(spark: SparkSession, dir: String, source: String = "src5",
      mode: String = "soft"): DataFrame = {
    require(mode == "soft" || mode == "hard", s"delete mode must be soft|hard: $mode")
    val r = cognify(spark, dir)
    // `del` is every doc of the deleted SOURCE — corpus-proportional
    // (a dataset delete at 100 TB is millions of ids), so the joins are
    // plain keyed joins: AQE still broadcasts when the source turns out
    // small, but nothing forces a near-corpus driver hash relation (the
    // kCore cascade lesson).
    val del = r.documents.filter(col("source") === source).select(col("doc_id"))
    val delMentions = r.mentions.join(del, Seq("doc_id"))
    val remaining = r.mentions.join(del, Seq("doc_id"), "left_anti")
    val orphaned = r.entities
      .join(remaining.select(col("entity")).distinct(), Seq("entity"), "left_anti")
    def c(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    val base = c("docs_deleted", del)
      .union(c("mentions_deleted", delMentions))
      .union(c("entities_orphaned", orphaned))
    if (mode == "soft")
      base.union(c("entities_remaining",
        r.entities.join(orphaned.select(col("entity")), Seq("entity"), "left_anti")))
    else {
      // hard: the post-cascade degree-one census. An entity's degree in
      // the cognify projection is its surviving mention-edge count.
      val degreeOne = remaining.groupBy(col("entity")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") === 1).select(col("entity"))
      base
        .union(c("entities_degree_one", degreeOne))
        .union(c("entities_remaining",
          r.entities.join(orphaned.select(col("entity")), Seq("entity"), "left_anti")
            .join(degreeOne, Seq("entity"), "left_anti")))
    }
  }

  val deleteDocsSql: String =
    """WITH del AS (SELECT doc_id FROM documents WHERE source = 'src5'),
      |mentions AS (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS entity
      |  FROM documents
      |),
      |entities AS (SELECT DISTINCT entity FROM mentions),
      |remaining AS (
      |  SELECT DISTINCT entity FROM mentions WHERE doc_id NOT IN (SELECT doc_id FROM del)
      |),
      |orphaned AS (
      |  SELECT entity FROM entities WHERE entity NOT IN (SELECT entity FROM remaining)
      |)
      |SELECT 'docs_deleted' AS stage, count(*) AS n FROM del
      |UNION ALL
      |SELECT 'mentions_deleted', count(*) FROM mentions WHERE doc_id IN (SELECT doc_id FROM del)
      |UNION ALL
      |SELECT 'entities_orphaned', count(*) FROM orphaned
      |UNION ALL
      |SELECT 'entities_remaining', count(*) FROM remaining""".stripMargin

  val deleteDocsHardSql: String =
    """WITH del AS (SELECT doc_id FROM documents WHERE source = 'src5'),
      |mentions AS (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS entity
      |  FROM documents
      |),
      |entities AS (SELECT DISTINCT entity FROM mentions),
      |rem_edges AS (
      |  SELECT entity FROM mentions WHERE doc_id NOT IN (SELECT doc_id FROM del)
      |),
      |remaining AS (SELECT DISTINCT entity FROM rem_edges),
      |orphaned AS (
      |  SELECT entity FROM entities WHERE entity NOT IN (SELECT entity FROM remaining)
      |),
      |degree_one AS (
      |  SELECT entity FROM rem_edges GROUP BY entity HAVING count(*) = 1
      |)
      |SELECT 'docs_deleted' AS stage, count(*) AS n FROM del
      |UNION ALL
      |SELECT 'mentions_deleted', count(*) FROM mentions WHERE doc_id IN (SELECT doc_id FROM del)
      |UNION ALL
      |SELECT 'entities_orphaned', count(*) FROM orphaned
      |UNION ALL
      |SELECT 'entities_degree_one', count(*) FROM degree_one
      |UNION ALL
      |SELECT 'entities_remaining', count(*) FROM remaining
      |  WHERE entity NOT IN (SELECT entity FROM degree_one)""".stripMargin

  /** Document update (reference: cognee/api/v1/update/update.py:10 —
    * update = delete old version + add new + re-cognify, with
    * incremental loading detecting changed content by hash). The src7
    * slice gets a deterministic new revision (first 5 words dropped);
    * changed docs are detected by content hash, their old mention edges
    * cascade out and the new revision's mentions come in. Returns the
    * update ledger counts. */
  def updateDocs(spark: SparkSession, dir: String, source: String = "src7"): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val revised = docs.filter(col("source") === source)
      .select(col("doc_id"), col("text").as("old_text"),
        array_join(slice(toks, lit(6), size(toks)), " ").as("new_text"))
    // incremental loading: only genuinely changed content re-ingests
    val changed = revised.filter(md5(col("old_text")) =!= md5(col("new_text")))
      .select(col("doc_id"), col("new_text"))
    def mentionsOf(df: DataFrame, text: org.apache.spark.sql.Column) =
      df.select(col("doc_id"), explode(array_distinct(split(text, " "))).as("entity"))
    // `changed` is the source's whole changed slice — corpus-
    // proportional under a bulk revision, so keyed joins (AQE
    // broadcasts when the changeset is actually small).
    val oldM = mentionsOf(docs.join(changed.select(col("doc_id")), Seq("doc_id")), col("text"))
    val newM = mentionsOf(changed, col("new_text")).filter(col("entity") =!= "")
    val untouchedM = mentionsOf(
      docs.join(changed.select(col("doc_id")), Seq("doc_id"), "left_anti"), col("text"))
    def c(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    c("docs_updated", changed)
      .union(c("mentions_removed", oldM))
      .union(c("mentions_added", newM))
      .union(c("entities_after",
        untouchedM.select(col("entity")).union(newM.select(col("entity"))).distinct()))
  }

  val updateDocsSql: String =
    """WITH revised AS (
      |  SELECT doc_id, text AS old_text,
      |    array_to_string((string_split(text, ' '))[6:], ' ') AS new_text
      |  FROM documents WHERE source = 'src7'
      |),
      |changed AS (
      |  SELECT doc_id, new_text FROM revised WHERE md5(old_text) <> md5(new_text)
      |),
      |old_m AS (
      |  SELECT d.doc_id, unnest(list_distinct(string_split(d.text, ' '))) AS entity
      |  FROM documents d JOIN changed USING (doc_id)
      |),
      |new_m AS (
      |  SELECT doc_id, entity FROM (
      |    SELECT doc_id, unnest(list_distinct(string_split(new_text, ' '))) AS entity FROM changed
      |  ) WHERE entity <> ''
      |),
      |untouched_m AS (
      |  SELECT d.doc_id, unnest(list_distinct(string_split(d.text, ' '))) AS entity
      |  FROM documents d WHERE doc_id NOT IN (SELECT doc_id FROM changed)
      |)
      |SELECT 'docs_updated' AS stage, count(*) AS n FROM changed
      |UNION ALL SELECT 'mentions_removed', count(*) FROM old_m
      |UNION ALL SELECT 'mentions_added', count(*) FROM new_m
      |UNION ALL SELECT 'entities_after', count(DISTINCT entity)
      |FROM (SELECT entity FROM untouched_m UNION ALL SELECT entity FROM new_m)""".stripMargin

  /** Graph enrichment pipeline — the reference's fourth top-level API
    * verb (cognee/modules/memify/memify.py: with no input data, the
    * EXISTING graph — optionally filtered to a nodeset — feeds the
    * extraction tasks, and the enrichment tasks' output merges back;
    * shipped default tasks: tasks/memify/extract_subgraph_chunks.py +
    * tasks/codingagents/coding_rule_associations.py). Deterministic
    * analog: the nodeset is a fixed rule vocabulary of entity nodes;
    * extraction pulls the mention subgraph of those entities; the
    * enrichment derives one rule node per nodeset entity plus an
    * `applies_to` edge to every mentioning document, merged through the
    * PropertyGraph mutation API (keep-first node dedup, distinct
    * edges). Returns the per-stage enrichment ledger. */
  def memify(spark: SparkSession, dir: String,
      vocab: Seq[String] = Seq("spark", "join", "window", "filter")): DataFrame = {
    val r = cognify(spark, dir)
    val nodesetEnt = r.entities.filter(col("entity").isin(vocab: _*))
    val extracted = r.mentions.join(broadcast(nodesetEnt), Seq("entity"))
    val rules = nodesetEnt.select(concat(lit("rule:"), col("entity")).as("id"),
      lit("rule").as("ntype"), col("entity").as("name"))
    val assoc = extracted.select(
      concat(lit("rule:"), col("entity")).as("src"),
      concat(lit("doc:"), col("doc_id").cast("string")).as("dst"),
      lit("applies_to").as("rel")).distinct()
    // The enrichment is corpus-proportional (one edge per mentioning
    // document), so it does NOT go through the increment-sized mutation
    // API (addNodes/addEdges broadcast their increment); it merges as
    // plain unions, sound because the derived sets are disjoint from
    // the base by construction: "rule:" ids collide with no doc/entity
    // id, and applies_to triplets share no key with mention edges.
    val g = r.graph
    val enriched = PropertyGraph(g.nodes.union(rules), g.edges.union(assoc))
    def c(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    c("nodeset_entities", nodesetEnt)
      .union(c("docs_extracted", extracted.select(col("doc_id")).distinct()))
      .union(c("rules_added", rules))
      .union(c("assoc_edges_added", assoc))
      .union(c("nodes_after", enriched.nodes))
      .union(c("edges_after", enriched.edges))
  }

  val memifySql: String =
    """WITH vocab(v) AS (VALUES ('spark'), ('join'), ('window'), ('filter')),
      |mentions AS (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS entity
      |  FROM documents
      |),
      |entities AS (SELECT DISTINCT entity FROM mentions),
      |nodeset AS (SELECT entity FROM entities WHERE entity IN (SELECT v FROM vocab)),
      |extracted AS (
      |  SELECT doc_id, entity FROM mentions WHERE entity IN (SELECT entity FROM nodeset)
      |)
      |SELECT 'nodeset_entities' AS stage, count(*) AS n FROM nodeset
      |UNION ALL SELECT 'docs_extracted', count(DISTINCT doc_id) FROM extracted
      |UNION ALL SELECT 'rules_added', count(*) FROM nodeset
      |UNION ALL SELECT 'assoc_edges_added', count(*) FROM extracted
      |UNION ALL SELECT 'nodes_after',
      |  (SELECT count(*) FROM documents) + (SELECT count(*) FROM entities)
      |    + (SELECT count(*) FROM nodeset)
      |UNION ALL SELECT 'edges_after',
      |  (SELECT count(*) FROM mentions) + (SELECT count(*) FROM extracted)""".stripMargin

  /** Prune obsolete + disconnected chunk nodes (reference: cognee/
    * tasks/chunks/remove_disconnected_chunks.py:5 — per document, every
    * chunk with no `next_chunk` predecessor is obsolete and deleted;
    * then fully disconnected nodes are deleted). The chunk graph is the
    * TextChunker projection: document nodes, chunk nodes, `has_chunk`
    * doc→chunk edges, `next_chunk` chain edges. Deletion sets here are
    * corpus-proportional (one obsolete chunk per document), so — like
    * memify's enrichment — they do NOT go through the increment-sized
    * mutation API (which broadcasts its increment): cascades are plain
    * shuffle-keyed anti-joins. Returns the per-stage prune ledger; the
    * oracle derives the same counts in closed form from per-doc chunk
    * counts, making the two sides independent derivations. */
  def pruneChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunks = operators.TextOps.chunk(spark, dir)
      .select(col("doc_id"), col("chunk_idx"))
    val chunkId = concat(lit("chunk:"), col("doc_id"), lit(":"), col("chunk_idx"))
    val docId = concat(lit("doc:"), col("doc_id"))
    val docNodes = chunks.select(docId.as("id")).distinct()
    val chunkNodes = chunks.select(chunkId.as("id"))
    val hasChunk = chunks.select(docId.as("src"), chunkId.as("dst"), lit("has_chunk").as("rel"))
    val nextChunk = chunks.filter(col("chunk_idx") > 0).select(
      concat(lit("chunk:"), col("doc_id"), lit(":"), col("chunk_idx") - 1).as("src"),
      chunkId.as("dst"), lit("next_chunk").as("rel"))
    val edges = hasChunk.union(nextChunk)
    // obsolete = chunks with no incoming next_chunk (the reference rule)
    val obsolete = chunkNodes.join(
      nextChunk.select(col("dst").as("id")), Seq("id"), "left_anti")
    val nodes1 = docNodes.union(chunkNodes).join(obsolete, Seq("id"), "left_anti")
    val edges1 = edges
      .join(obsolete.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(obsolete.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
    // then: fully disconnected nodes go too
    val touched = edges1.select(col("src").as("id"))
      .union(edges1.select(col("dst").as("id"))).distinct()
    val disconnected = nodes1.join(touched, Seq("id"), "left_anti")
    val nodes2 = nodes1.join(disconnected, Seq("id"), "left_anti")
    def c(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    c("chunks_obsolete", obsolete)
      .union(c("disconnected_deleted", disconnected))
      .union(c("nodes_after", nodes2))
      .union(c("edges_after", edges1))
  }

  val pruneChunksSql: String =
    """WITH n AS (
      |  SELECT doc_id,
      |    CAST(ceil(len(string_split(text, ' ')) / 64.0) AS BIGINT) AS nc
      |  FROM documents
      |)
      |SELECT 'chunks_obsolete' AS stage, count(*) AS n FROM n
      |UNION ALL SELECT 'disconnected_deleted', count(*) FROM n WHERE nc = 1
      |UNION ALL SELECT 'nodes_after',
      |  (SELECT count(*) FROM n WHERE nc > 1)
      |    + (SELECT CAST(coalesce(sum(nc - 1), 0) AS BIGINT) FROM n)
      |UNION ALL SELECT 'edges_after',
      |  (SELECT CAST(coalesce(sum(nc - 1), 0) AS BIGINT) FROM n)
      |    + (SELECT CAST(coalesce(sum(greatest(nc - 2, 0)), 0) AS BIGINT) FROM n)""".stripMargin

  /** Pipeline-run metrics row (reference: cognee/modules/metrics/
    * operations/get_pipeline_run_metrics.py:26 — one GraphMetrics record
    * per pipeline run: corpus token count + the graph's node/edge/
    * degree/density summary; the optional deep half — components,
    * diameter, clustering — is `graph_metrics_full`). num_tokens is the
    * summed per-doc token estimate (fetch_token_count sums
    * Data.token_count); the graph is the cognify mention graph. Four
    * single-row aggregates crossJoined — each side is one map-side
    * partial agg, the join is trivially broadcast. */
  def runMetrics(spark: SparkSession, dir: String): DataFrame = {
    val r = cognify(spark, dir)
    val d = r.documents.agg(
      count(lit(1)).as("n_docs"),
      sum(ceil(length(col("text")) / 4.0).cast("long")).as("num_tokens"))
    val e = r.entities.agg(count(lit(1)).as("n_ent"))
    val m = r.mentions.agg(count(lit(1)).as("num_edges"))
    val n = col("n_docs") + col("n_ent")
    // degenerate graphs (0 or 1 nodes) have no defined degree/density:
    // NULL on both engines (DuckDB's IEEE float division would give NaN)
    d.crossJoin(e).crossJoin(m).select(
      col("num_tokens"),
      n.as("num_nodes"),
      col("num_edges"),
      when(n > 0, round(col("num_edges") * 2.0 / n, 4)).as("mean_degree"),
      when(n > 1, round(col("num_edges") * 1.0 / (n * (n - lit(1L))), 8)).as("edge_density"))
  }

  val runMetricsSql: String =
    """WITH mentions AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS entity
      |  FROM documents
      |),
      |d AS (
      |  SELECT count(*) AS n_docs,
      |    CAST(sum(ceil(length(text) / 4.0)) AS BIGINT) AS num_tokens
      |  FROM documents
      |),
      |e AS (SELECT count(DISTINCT entity) AS n_ent FROM mentions),
      |m AS (SELECT count(*) AS num_edges FROM mentions)
      |SELECT num_tokens,
      |  n_docs + n_ent AS num_nodes,
      |  num_edges,
      |  round(num_edges * 2.0 / nullif(n_docs + n_ent, 0), 4) AS mean_degree,
      |  round(num_edges * 1.0
      |        / nullif((n_docs + n_ent) * (n_docs + n_ent - 1), 0), 8) AS edge_density
      |FROM d, e, m""".stripMargin

  /** Pipeline run-status ledger (reference: cognee/modules/pipelines/
    * operations — log_pipeline_run_initiated/start/complete/error append
    * PipelineRun rows; get_pipeline_status.py:8 reads the latest row per
    * dataset via a recency rank window). Append = a union of the tiny
    * increment; status = the same rank-1 window the reference runs,
    * partitioned by dataset (bounded per-dataset history). `seq` is the
    * logical clock (created_at analog — wall clocks are not
    * deterministic), tie-broken descending so replayed ledgers resolve
    * identically. */
  final case class RunLedger(
      base: DataFrame,
      pending: Vector[(String, String, String, Long)] = Vector.empty) {

    /** Append one status event. Appends buffer driver-side and join the
      * plan as ONE union when read — a per-append union would grow the
      * plan tree linearly (the classic union-chain antipattern: analysis
      * cost per append, StackOverflow at ledger scale). Persisting a
      * long-lived ledger means writing `runs` to a parquet/table sink
      * and reloading, like any other collection. */
    def log(runId: String, dataset: String, status: String, seq: Long): RunLedger =
      copy(pending = pending :+ ((runId, dataset, status, seq)))

    def runs: DataFrame =
      if (pending.isEmpty) base
      else {
        import base.sparkSession.implicits._
        base.union(pending.toDF("run_id", "dataset", "status", "seq"))
      }

    /** Latest status per dataset (get_pipeline_status). */
    def status: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dataset")).orderBy(col("seq").desc, col("run_id").desc)
      runs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("dataset"), col("status"), col("run_id"))
    }
  }

  object RunLedger {
    def empty(spark: SparkSession): RunLedger = {
      import spark.implicits._
      RunLedger(Seq.empty[(String, String, String, Long)].toDF("run_id", "dataset", "status", "seq"))
    }
  }

  /** One step of a user-composable pipeline (the reference's Task,
    * modules/pipelines/tasks/task.py): a named DataFrame transform.
    * Spark-native re-expression: the reference threads Python
    * generators/batches through coroutine plumbing; here each task
    * CONTRIBUTES TO ONE LAZY PLAN, so the whole chain optimizes as a
    * single Catalyst tree (filters reordered across task boundaries,
    * columns pruned through the chain) and nothing materializes until
    * the caller acts. */
  final case class Task(name: String, fn: DataFrame => DataFrame)

  /** run_tasks (reference: modules/pipelines/operations/run_tasks.py —
    * execute an arbitrary caller-supplied Task list over the input,
    * logging pipeline-run lifecycle events around it): threads `input`
    * through the tasks, appending [[RunLedger]] events — `initiated`,
    * per-task `task_started:`/`task_completed:` pairs, final
    * `completed` — on the monotone `seq` logical clock. A throwing
    * task logs `errored:<name>` and rethrows with the ledger attached
    * ([[TaskFailed]]), the reference's log_pipeline_run_errored + raise
    * contract. Fixed-stage [[cognify]]/[[memify]] remain the canned
    * pipelines; this is the escape hatch for user-defined chains. */
  final case class TaskFailed(taskName: String, ledger: RunLedger, cause: Throwable)
    extends RuntimeException(s"task '$taskName' failed", cause)

  def runTasks(tasks: Seq[Task], input: DataFrame,
      runId: String, dataset: String,
      ledger0: RunLedger, seq0: Long = 0L): (DataFrame, RunLedger) = {
    var seq = seq0
    def tick(): Long = { val s = seq; seq += 1; s }
    var led = ledger0.log(runId, dataset, "initiated", tick())
    var df = input
    tasks.foreach { t =>
      led = led.log(runId, dataset, s"task_started:${t.name}", tick())
      df =
        try t.fn(df)
        catch { case e: Throwable =>
          throw TaskFailed(t.name, led.log(runId, dataset, s"errored:${t.name}", tick()), e)
        }
      led = led.log(runId, dataset, s"task_completed:${t.name}", tick())
    }
    (df, led.log(runId, dataset, "completed", tick()))
  }

  /** The cognify mention-extraction chain as a Task list — spec-pinned
    * row-identical to [[cognify]]'s mentions relation, proving the
    * composable runner reproduces the canned pipeline. */
  def defaultCognifyTasks: Seq[Task] = Seq(
    Task("extract_mentions", docs => docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("entity"))))

  /** Registered round-trip for the composable runner: a three-task
    * document chain (tokenize → drop short docs → window-chunk) plus
    * the lifecycle ledger it leaves behind. Each task's output
    * cardinality is a census row (forcing a real run, not just plan
    * assembly), and the ledger contributes its event count and the
    * final per-dataset status — all closed-form in SQL. */
  def runTasksQuery(spark: SparkSession, dir: String): DataFrame = {
    val tasks = Seq(
      Task("tokenize", d => d.withColumn("n_tokens", size(split(col("text"), " ")))),
      Task("filter_short", d => d.filter(col("n_tokens") >= 10)),
      Task("chunk", d => d.select(col("doc_id"),
        explode(sequence(lit(0), ceil(col("n_tokens") / lit(64.0)).cast("int") - 1))
          .as("chunk_idx"))))
    val docs = Tables.load(spark, dir, "documents")
    val (chunks, ledger) = runTasks(tasks, docs, "run-1", "documents",
      RunLedger.empty(spark))
    def c(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    c("input_docs", docs)
      .union(c("chunks_out", chunks))
      .union(c("ledger_events", ledger.runs))
      .union(ledger.status.select(concat(lit("status_"), col("status")).as("stage"),
        lit(1L).as("n")))
  }

  val runTasksQuerySql: String =
    """SELECT 'input_docs' AS stage, count(*) AS n FROM documents
      |UNION ALL
      |SELECT 'chunks_out', CAST(sum(ceil(len(string_split(text, ' ')) / 64.0)) AS BIGINT)
      |FROM documents WHERE len(string_split(text, ' ')) >= 10
      |UNION ALL
      |SELECT 'ledger_events', 8
      |UNION ALL
      |SELECT 'status_completed', 1""".stripMargin

  /** Stage row-count summary — the pipeline_run telemetry analog. */
  def stageCounts(spark: SparkSession, dir: String): DataFrame = {
    val r = cognify(spark, dir)
    def c(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    c("documents", r.documents)
      .union(c("chunks", r.chunks))
      .union(c("entities", r.entities))
      .union(c("mentions", r.mentions))
      .union(c("vectors", r.vectors))
  }

  val stageCountsSql: String =
    """SELECT 'documents' AS stage, count(*) AS n FROM documents
      |UNION ALL
      |SELECT 'chunks', CAST(sum(ceil(len(string_split(text, ' ')) / 64.0)) AS BIGINT) FROM documents
      |UNION ALL
      |SELECT 'entities', count(DISTINCT entity)
      |FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS entity FROM documents)
      |UNION ALL
      |SELECT 'mentions', count(*)
      |FROM (SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS entity FROM documents)
      |UNION ALL
      |SELECT 'vectors', count(*) FROM embeddings""".stripMargin

  /** Chunk-classification taxonomy graph (reference:
    * cognee/tasks/chunk_naive_llm_classifier/chunk_naive_llm_classifier.py:14 —
    * classify every DocumentChunk, then store the taxonomy in both
    * engines: a `classification` vector collection that receives only
    * NEW label points (`existing_points_map` gate), and graph edges
    * `is_media_type` chunk→type, `is_subtype_of` subtype→type emitted
    * only at the subtype's FIRST sighting, `is_classified_as`
    * chunk→subtype per chunk). The LLM classifier (extract_categories)
    * is replaced by a deterministic rule with the same contract — one
    * type plus a subclass list per chunk: type = text_<lang>,
    * subclasses = {src_<source>, size_full|size_partial}.
    *
    * Scale shape: chunk→label edges are corpus-sized, so the taxonomy
    * merges through the bulk mergeNodes/mergeEdges path (keyed
    * anti-join upsert, never a broadcast increment), and the
    * reference's driver-side first-sighting map becomes a min-by
    * hash aggregate over (doc_id, chunk_idx) — map-side partial, no
    * per-label sort. The census is read BACK from the merged graph, so
    * a lost node or edge breaks the oracle hash. */
  /** The classification arithmetic over ANY (doc_id, text, lang,
    * source) relation — chunking carried inline (no stream-unfriendly
    * self-join), one row per chunk with its type label and subclass
    * list. Stateless, so the streaming twin
    * (EventStream.classifyStream) reuses it verbatim on a streaming
    * frame. */
  private[graft] def classifiedChunksFrom(docs: DataFrame): DataFrame = {
    val nChunks = ceil(size(col("toks")) / lit(64.0)).cast("int")
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"),
        col("lang"), col("source"))
      .select(col("doc_id"), col("toks"), col("lang"), col("source"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        concat(lit("chunk:"), col("doc_id").cast("string"), lit("#"),
          col("chunk_idx").cast("string")).as("chunk_id"),
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat(lit("text_"), col("lang")).as("type_label"),
        array(concat(lit("src_"), col("source")),
          when(size(slice(col("toks"), col("chunk_idx") * 64 + 1, lit(64))) >= 64,
            "size_full").otherwise("size_partial")).as("subs"))
  }

  def classifyChunks(spark: SparkSession, dir: String): DataFrame = {
    // Classified chunks feed every downstream branch (nodes, three edge
    // kinds, the merge's anti-join sides) — materialize the narrow
    // ~per-chunk relation once instead of re-tokenizing the corpus per
    // branch (eager localCheckpoint, the repo-wide scratch idiom).
    val chunks = classifiedChunksFrom(Tables.load(spark, dir, "documents"))
      .localCheckpoint(true)
    val subRows = chunks.select(col("chunk_id"), col("doc_id"), col("chunk_idx"),
      col("type_label"), explode(col("subs")).as("sub_label"))
    // First sighting (chunk order) decides each subtype's parent — the
    // existing_points_map first-wins rule, as a distributed min-by.
    val subParent = subRows.groupBy(col("sub_label"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"), col("type_label"))).as("s"))
      .select(col("sub_label"), col("s.type_label").as("parent"))
    def clsNode(label: org.apache.spark.sql.Column) = struct(
      concat(lit("cls:"), label).as("id"), label.as("ntype"), label.as("name"))
    val taxonomyNodes = chunks.select(clsNode(col("type_label")).as("n")).distinct()
      .union(subRows.select(clsNode(col("sub_label")).as("n")).distinct())
      .select(col("n.id"), col("n.ntype"), col("n.name"))
    val taxonomyEdges =
      chunks.select(col("chunk_id").as("src"),
          concat(lit("cls:"), col("type_label")).as("dst"), lit("is_media_type").as("rel"))
        .union(subParent.select(concat(lit("cls:"), col("sub_label")).as("src"),
          concat(lit("cls:"), col("parent")).as("dst"), lit("is_subtype_of").as("rel")))
        .union(subRows.select(col("chunk_id").as("src"),
          concat(lit("cls:"), col("sub_label")).as("dst"), lit("is_classified_as").as("rel")))
    val chunkNodes = chunks.select(col("chunk_id").as("id"),
      lit("chunk").as("ntype"), col("chunk_id").as("name"))
    val merged = PropertyGraph(chunkNodes, taxonomyEdges.limit(0))
      .mergeNodes(taxonomyNodes).mergeEdges(taxonomyEdges)
    // The census reads the merged edge relation three times (types,
    // parents, subtype counts); materialize it once — eager
    // localCheckpoint, the repo-wide scratch idiom (no CacheManager
    // entry to leak) — instead of re-running the merge's
    // union+anti-join per branch.
    val e = merged.edgesP.localCheckpoint(true)
    val labelOf = expr("substring(dst, 5)")
    val types = e.filter(col("rel") === "is_media_type")
      .groupBy(labelOf.as("label")).agg(count(lit(1)).as("n_chunks"))
      .select(lit("type").as("kind"), col("label"),
        lit(null).cast("string").as("parent"), col("n_chunks"))
    val parents = e.filter(col("rel") === "is_subtype_of")
      .select(expr("substring(src, 5)").as("label"), labelOf.as("parent"))
    val subtypes = e.filter(col("rel") === "is_classified_as")
      .groupBy(labelOf.as("label")).agg(count(lit(1)).as("n_chunks"))
      .join(parents, Seq("label"))
      .select(lit("subtype").as("kind"), col("label"), col("parent"), col("n_chunks"))
    // The vector-collection leg: create_data_points receives one point
    // per NEW label — with a fresh collection that is every taxonomy node.
    val points = merged.nodesP.filter(col("ntype") =!= "chunk")
      .agg(count(lit(1)).as("n_chunks"))
      .select(lit("collection").as("kind"), lit("classification").as("label"),
        lit(null).cast("string").as("parent"), col("n_chunks"))
    types.union(subtypes).union(points).orderBy(col("kind"), col("label"))
  }

  val classifyChunksSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, lang, source FROM documents),
      |c AS (SELECT doc_id, lang, source, toks,
      |        unnest(range(CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS chunk_idx FROM t),
      |ch AS (SELECT doc_id, chunk_idx, 'text_' || lang AS type_label,
      |        ['src_' || source,
      |         CASE WHEN len(toks[(chunk_idx*64+1):(chunk_idx*64+64)]) >= 64
      |              THEN 'size_full' ELSE 'size_partial' END] AS subs
      |       FROM c),
      |subs AS (SELECT doc_id, chunk_idx, type_label, unnest(subs) AS sub_label FROM ch),
      |parent AS (SELECT sub_label, type_label AS parent FROM (
      |    SELECT sub_label, type_label,
      |      row_number() OVER (PARTITION BY sub_label ORDER BY doc_id, chunk_idx) AS rn
      |    FROM subs) WHERE rn = 1),
      |types AS (SELECT type_label AS label, count(*) AS n_chunks FROM ch GROUP BY 1),
      |subcnt AS (SELECT sub_label AS label, count(*) AS n_chunks FROM subs GROUP BY 1)
      |SELECT 'type' AS kind, label, CAST(NULL AS VARCHAR) AS parent, n_chunks FROM types
      |UNION ALL
      |SELECT 'subtype', s.label, p.parent, s.n_chunks
      |FROM subcnt s JOIN parent p ON s.label = p.sub_label
      |UNION ALL
      |SELECT 'collection', 'classification', NULL,
      |  (SELECT count(*) FROM types) + (SELECT count(*) FROM subcnt)
      |ORDER BY kind, label""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_classify" -> ((s: SparkSession, d: String) => classifyChunks(s, d)),
    "pipeline_delete" -> ((s: SparkSession, d: String) => deleteDocs(s, d)),
    "pipeline_delete_hard" -> ((s: SparkSession, d: String) => deleteDocs(s, d, mode = "hard")),
    "pipeline_update" -> ((s: SparkSession, d: String) => updateDocs(s, d)),
    "pipeline_memify" -> ((s: SparkSession, d: String) => memify(s, d)),
    "pipeline_metrics" -> ((s: SparkSession, d: String) => runMetrics(s, d)),
    "pipeline_prune" -> ((s: SparkSession, d: String) => pruneChunks(s, d)),
    "pipeline_cognify" -> ((s: SparkSession, d: String) => stageCounts(s, d)),
    "pipeline_run_tasks" -> ((s: SparkSession, d: String) => runTasksQuery(s, d)))

  def oracles: Map[String, String] = Map(
    "pipeline_classify" -> classifyChunksSql,
    "pipeline_delete" -> deleteDocsSql,
    "pipeline_delete_hard" -> deleteDocsHardSql,
    "pipeline_update" -> updateDocsSql,
    "pipeline_memify" -> memifySql,
    "pipeline_metrics" -> runMetricsSql,
    "pipeline_prune" -> pruneChunksSql,
    "pipeline_cognify" -> stageCountsSql,
    "pipeline_run_tasks" -> runTasksQuerySql)
}
