package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record as it arrives on the stream (ts in epoch seconds —
  * the whole-second canonicalization Tables.loadEvents applies). */
final case class Event(eventId: Long, tsSec: Long, userId: Long, eventType: String, value: Double)

/** A closed user session (same schema as the batch
  * operators.EventOps.sessionize output rows). */
final case class Session(userId: Long, sessId: Long, nEvents: Long, totalValue: Double,
                         startS: Long, endS: Long)

/** One row of a user's recency-ranked history (same schema as the
  * batch operators.EventOps.history output rows). */
final case class HistoryEntry(userId: Long, pos: Int, eventId: Long,
                              eventType: String, tsSec: Long)

/** A user's current funnel stage (0 = nothing, 1 = viewed, 2 = clicked
  * after viewing, 3 = purchased after clicking) — the streaming twin of
  * the batch events_funnel rollup. */
final case class FunnelProgress(userId: Long, stage: Int)

private final case class FunnelState(t1: Long, t2: Long, t3: Long)

/** A streaming near-duplicate candidate: d1 < d2 collided in `band`.
  * Candidates, not verdicts — the batch DedupOps.minHashLsh verify
  * stage owns exact-Jaccard confirmation. */
final case class NearDupCandidate(d1: Long, d2: Long, band: Int)

/** An at-ingest duplicated-span hit: the word-8-gram starting at
  * 0-based token position `pos` of `docId` was already carried by a
  * DIFFERENT accepted document (it covers tokens [pos, pos+7]). */
final case class DupSpanHit(docId: Long, pos: Int)

/** An at-ingest SemDeDup decision for one arriving embedding: its cell
  * under the persisted quantizer, and whether it was kept. A dropped
  * vector names `matchId` — the smallest-id kept resident of its cell
  * at cosine ≥ τ (kept rows carry -1). */
final case class SemDedupDecision(vecId: Long, cell: Int, kept: Boolean, matchId: Long)

/** An at-ingest contamination verdict: `nContaminatedShingles` of the
  * arriving document's distinct word-8-grams appear in the eval set.
  * Emitted only for contaminated docs — the batch
  * `curate_decontaminate` contract (clean docs produce no row; an
  * admit/reject sink anti-joins). */
final case class ContaminationVerdict(docId: Long, nContaminatedShingles: Long)

/** A user's continuously-maintained R/F/M rollup (same columns as the
  * batch events_rfm per-user stage; quartile SCORING stays a global
  * pass over the rollup — cutoffs are corpus statistics no per-key
  * state can know). */
final case class RfmRollup(userId: Long, lastSeenS: Long, frequency: Long, monetary: Double)

/** One attributed purchase (same shape as the batch
  * operators.EventOps.attribution rows; -1 = no prior touch). */
final case class AttributedPurchase(eventId: Long, userId: Long, purchaseSec: Long,
    firstViewSec: Long, lastClickSec: Long, value: Double)

private final case class TouchState(firstViewSec: Long, lastClickSec: Long,
                                    recentPurchases: List[Long])

/** One as-of-enriched purchase (the batch operators.RelationalOps
  * .asofDemo row shape; -1 = no click at-or-before the purchase). */
final case class AsofPurchase(eventId: Long, userId: Long, purchaseSec: Long,
    purchaseValue: Double, clickSec: Long, clickId: Long, clickValue: Double)

private final case class AsofState(clickSec: Long, clickId: Long, clickValue: Double,
                                   recentPurchases: List[Long])

private final case class RfmState(lastSeen: Long, freq: Long, monetary: Double,
                                  recent: List[(Long, Long)])

/** One SpaceSaving summary entry as emitted per micro-batch: the
  * shard's tracked key with its overestimate count (`est`) and error
  * bound (`err`; the true count lies in [est − err, est]), plus the
  * shard's processed-event total `n` so a consumer can pick each
  * shard's LATEST summary (max n) and apply the n/k guarantee. */
final case class HeavyHitterEntry(shard: Int, n: Long, userId: Long, est: Long, err: Long)

private final case class HhState(counters: Map[Long, (Long, Long)], n: Long,
                                 recent: List[Long])

private final case class SessionState(sessId: Long, nEvents: Long, totalValue: Double,
                                      startS: Long, endS: Long)

/** Structured Streaming surface — the streaming twins of the batch
  * event operators (cognee's temporal layer is batch; the brief
  * mandates a streaming path: readStream → watermark → windowed agg,
  * and custom session state via [flat]mapGroupsWithState).
  *
  * Both transforms are source-agnostic: they take the streaming (or
  * batch) Dataset and declare the plan; tests drive them with
  * MemoryStream, production would bind readStream sources. State is
  * partitioned by user_id — at 1000 executors the state store shards
  * with the shuffle, nothing is driver-side.
  */
object EventStream {

  /** Tumbling 1-hour windowed counts per event type with a 2-hour
    * watermark (streaming twin of EventOps.windowAgg). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("eventType"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("hour"), col("eventType").as("event_type"),
        col("n_events"), col("total_value"))

  /** Continuously-maintained per-source HLL vocabulary sketches — the
    * at-ingest twin of [[graft.operators.CurateOps.overlapSketch]]'s
    * build stage. Each arriving document folds its distinct tokens into
    * its source's DataSketches HLL (a streaming aggregation,
    * Update/Complete mode: register-max folds are commutative/
    * idempotent state, exactly what HLL is FOR at ingest — a replayed
    * token can never move a register down, so replays are absorbed by
    * construction, no dedup state needed). Downstream, any
    * micro-batch's emitted sketches answer every pairwise overlap by
    * `hll_union` + inclusion-exclusion without touching the corpus —
    * the batch operator's merge stage, unchanged. Emits (source, sk,
    * n_approx — the HLL++ running distinct estimate); the spec pins
    * that the streamed sketch estimate equals the batch estimate over
    * the same corpus (identical register state — the mergeability
    * contract). */
  def sketchStream(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("w"), 12).as("sk"),
        approx_count_distinct(col("w")).as("n_approx"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast per micro-batch — the standard pattern for
    * attaching entity context to a stream at any scale). */
  def enrich(events: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events(streamKey) === dim(dimKey), "left")

  /** Streaming exact dedup: drop events whose id was already seen
    * within the watermark horizon (the streaming twin of
    * DedupOps.exact's content-hash identity — cognee dedups on ingest). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("eventId")

  /** Streaming cognify — the continuous twin of Pipeline.cognify's
    * extraction stages, because at production scale the corpus ARRIVES
    * as a stream (cognee's add→cognify loop run per ingest batch):
    * documents
    * are content-hash deduped within the watermark horizon (the
    * idempotent add-with-dedup contract of Pipeline.addIncrement), then
    * exploded into the same (doc_id, entity) mention increments batch
    * cognify derives — each micro-batch appends exactly the rows a
    * batch run over its new documents would produce.
    *
    * Identity contract: a document IS its content hash (the reference
    * assigns ids from the hash — ingestion/identify.py), so two stream
    * records carrying identical text are one document and the second is
    * dropped even if it arrives under a different transport id. Batch
    * parity therefore holds for corpora whose distinct documents have
    * distinct content — which the identity contract guarantees. */
  def cognifyStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("docId").as("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("entity"))

  /** Streaming temporal extraction — the continuous twin of
    * TextOps.temporalExtract, because the corpus the temporal graph is
    * built from ARRIVES as an ingest stream: replayed records ((docId,
    * content_hash) duplicates within the watermark horizon) are dropped
    * — the idempotent re-add contract — then each micro-batch emits
    * exactly the time-anchored event rows the batch extractor derives;
    * the extraction itself is stateless row arithmetic, shared verbatim
    * (spec proves batch parity on replayed input). Dedup keys on the
    * PAIR, not content alone: batch extraction anchors events by
    * (doc_id, pos), so two distinct docs carrying identical text each
    * emit their own rows — content-only dedup would silently drop the
    * second doc and break parity on duplicate-text corpora. */
  def temporalExtractStream(docs: DataFrame): DataFrame =
    graft.operators.TextOps.temporalExtractFrom(
      docs
        .withColumn("ts", timestamp_seconds(col("tsSec")))
        .withColumn("content_hash", md5(col("text")))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("docId", "content_hash")
        .select(col("docId").as("doc_id"), col("text")))

  /** Streaming chunk classification — the continuous twin of
    * Pipeline.classifyChunks' per-chunk stage, because the reference
    * classifies AT INGEST (chunk_naive_llm_classifier runs inside the
    * cognify task list, once per added batch): arrivals are
    * (docId, content_hash) deduped within the watermark horizon (the
    * idempotent re-add contract), then flow through the SAME
    * classification arithmetic (Pipeline.classifiedChunksFrom, shared
    * verbatim) — each micro-batch emits exactly the
    * (chunk_id, type_label, sub_label) rows a batch run over its new
    * documents would produce. The taxonomy merge itself stays a
    * downstream foreachBatch mergeNodes/mergeEdges (the indexStream
    * precedent); the stream stage is the narrow stateless prefix plus
    * ONE stateful dedup. */
  def classifyStream(docs: DataFrame): DataFrame =
    graft.Pipeline.classifiedChunksFrom(
      docs
        .withColumn("ts", timestamp_seconds(col("tsSec")))
        .withColumn("content_hash", md5(col("text")))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("docId", "content_hash")
        .select(col("docId").as("doc_id"), col("text"), col("lang"), col("source")))
      .select(col("chunk_id"), col("doc_id"), col("chunk_idx"),
        col("type_label"), explode(col("subs")).as("sub_label"))

  /** Streaming near-duplicate detection — the continuous twin of
    * DedupOps.minHashLsh's candidate stage, because at production scale
    * near-dup screening runs AT INGEST (flag the arriving document
    * against everything already accepted), not as a nightly all-corpus
    * batch. The signature math is shared verbatim with batch
    * ([[graft.operators.DedupOps.bandSignaturesOf]] — in-row minhash,
    * same LCG constants), so a stream replay emits exactly the batch
    * band-collision candidate set.
    *
    * Shape: the stateless prefix maps each doc to its 16 (band,
    * band_sig) bucket keys (narrow — no mid-stream aggregation, which
    * would be a second stateful operator); the ONE stateful op keys the
    * state store by bucket and keeps the doc ids seen in that bucket. A
    * new arrival emits a candidate pair against each resident, then
    * joins the bucket; a replayed (already-resident) id emits nothing —
    * the idempotent re-add contract. State per bucket is capped at
    * [[maxBucketResidents]] ids: a bucket that hot means a degenerate
    * band (the batch equivalent is the skew the banded equi-join
    * bounds); over-cap arrivals still pair against the stored residents
    * but are not appended, so state stays bounded for the life of the
    * stream and pairs among over-cap docs are deferred to the batch
    * sweep. Candidates are emitted once per colliding band (d1 < d2);
    * downstream dedups pairs exactly like the batch candidate
    * distinct(). */
  val maxBucketResidents = 128

  def nearDupStream(docs: DataFrame): Dataset[NearDupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.DedupOps.bandSignaturesOf(
        docs.select(col("docId").as("doc_id"), col("text")))
      .select(col("doc_id"), col("band"), col("band_sig"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, sig) => (band, sig) }
      .flatMapGroupsWithState[List[Long], NearDupCandidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), it: Iterator[(Long, Int, Long)], state: GroupState[List[Long]]) =>
          var residents = state.getOption.getOrElse(Nil)
          // O(1) membership beside the stored list (the cap bounds the
          // list, but a hot replayed bucket would still pay O(cap) per
          // arrival on a linear scan).
          var residentSet = residents.toSet
          val out = List.newBuilder[NearDupCandidate]
          // Sort the micro-batch for a deterministic emission order
          // (iterator order within a group is not defined).
          it.map(_._1).toIndexedSeq.distinct.sorted.foreach { id =>
            if (!residentSet(id)) {
              residents.foreach { r =>
                out += NearDupCandidate(math.min(r, id), math.max(r, id), key._1)
              }
              if (residents.length < maxBucketResidents) {
                residents = id :: residents
                residentSet += id
              }
            }
          }
          state.update(residents)
          out.result().iterator
      }
  }

  /** Streaming duplicated-SPAN detection — the at-ingest twin of
    * [[graft.operators.CurateOps.dedupSpans]] (Lee et al. ExactSubstr
    * at 8-gram granularity): flag the arriving document's token
    * positions whose shingle was already carried by a DIFFERENT
    * accepted document. Shingling is the same tokenize+slice math as
    * batch; the ONE stateful op keys the state store by shingle.
    *
    * State per shingle = (first owner doc, seen-in-another-doc bit).
    * An arrival from a NEW doc emits its hit and sets the bit; the
    * owner's own positions emit once sharing is KNOWN — same
    * invocation when carriers co-arrive in one micro-batch, on replay
    * otherwise —
    * so a full second replay of a corpus emits EXACTLY the positions
    * batch dedupSpans covers (shingle carried by ≥ 2 distinct docs;
    * spec pins token-coverage parity), while the live first pass
    * honestly reports the at-ingest prefix view (the first carrier
    * cannot be flagged before a duplicate ever arrives). Within-doc
    * repeats alone never flag — cross-doc is the batch rule. State is
    * one entry per distinct shingle: at production scale this store is
    * corpus-sized, so deployments scope it (per-source streams, state
    * TTL, or periodic batch resets) — the same honest-bounds note as
    * the other twins' capped windows. */
  def dupSpanStream(docs: DataFrame): Dataset[DupSpanHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = split(col("text"), " ")
    docs.select(col("docId").as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(sequence(lit(0), size(col("toks")) - 8)).as("i"),
        col("toks"))
      .select(col("doc_id"), col("i").cast("int").as("i"),
        array_join(slice(col("toks"), col("i") + 1, lit(8)), " ").as("shingle"))
      .as[(Long, Int, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[(Long, Boolean), DupSpanHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[(Long, Int, String)], state: GroupState[(Long, Boolean)]) =>
          val arrivals = it.map(t => (t._1, t._2)).toIndexedSeq.distinct.sorted
          val (owner0, shared0) = state.getOption.getOrElse((-1L, false))
          val owner = if (owner0 >= 0) owner0 else arrivals.head._1
          // Sharing is decided for the WHOLE invocation up front: when
          // two carriers co-arrive in one micro-batch, the owner's own
          // positions must flag too (processing arrivals in order would
          // miss them — the owner sorts first).
          val shared = shared0 || arrivals.exists(_._1 != owner)
          val out = List.newBuilder[DupSpanHit]
          arrivals.foreach { case (doc, pos) =>
            if (doc != owner || shared) out += DupSpanHit(doc, pos)
          }
          state.update((owner, shared))
          out.result().iterator
      }
  }

  /** Streaming IVF index maintenance — the at-ingest twin of
    * VectorStore.indexDataPoints (reference: tasks/storage/
    * index_data_points.py runs per ingest batch). Each micro-batch of
    * arriving vectors upserts into the collection and lands in its IVF
    * cell with the PERSISTED quantizer (no retrain — the Faiss
    * practice), through the store's own append paths. Replay-idempotent:
    * only ids not yet in the collection are written, pinned by an eager
    * checkpoint BEFORE the collection mutates so the second write can't
    * see its own upsert. foreachBatch is the documented sink shape for
    * idempotent upsert stores; at scale the anti-join and the cell
    * assignment shard with the batch, nothing driver-side. */
  def indexStream(vectors: DataFrame, store: graft.sources.VectorStore,
      name: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fresh = batch
          .join(store.collection(name).select(col("vec_id")), Seq("vec_id"), "left_anti")
          .localCheckpoint(true)
        store.createDataPoints(name, fresh)
        store.indexDataPoints(name, fresh)
        ()
      }.start()

  /** CDC relational→graph ingest — the streaming twin of
    * [[graft.graph.RelationalMigration]] (row-level
    * migrate_relational_database), because at production scale the
    * source tables don't arrive as a one-shot bulk load: rows stream in
    * as change capture, and each micro-batch must land exactly the
    * node/edge increments the batch migration derives for those rows.
    * The increment projection is SHARED VERBATIM
    * ([[graft.graph.RelationalMigration.tablePart]] — TableRow node +
    * row props bag, is_part_of edge, ColumnValue nodes/edges from one
    * explode, per-FK equi-joins against the already-migrated parent key
    * projections, which are the static side here), applied per
    * micro-batch inside foreachBatch and landed through the same bulk
    * mergeNodes/mergeEdges contract as batch — whose id-keyed /
    * triplet-keyed dedup makes cross-batch ColumnValue collisions (two
    * rows in different micro-batches sharing a value) converge to the
    * one shared node, exactly the reference's node_mapping dedup.
    *
    * The ONE stateful op dedups replayed rows on (pk, content hash)
    * within the watermark horizon — the idempotent re-add contract
    * every ingest twin carries. Scope honesty: this covers INSERT CDC
    * and replay; an UPDATE (same pk, new content) re-emits increments
    * but merge's keep-first upsert will not overwrite the stored row
    * node — updates route through the mutation API or
    * [[migrateCdcStream]], the full-contract twin.
    *
    * ORDERING REQUIREMENT (insert-only contract): parents must be
    * migrated before their children stream. The FK joins run against
    * the `fks` parent-key plans as of each batch, and a child whose
    * parent key matches nothing drops its edge PERMANENTLY — a later
    * replay of the child inside the watermark is removed by the
    * (pk, content_hash) dedup, so the edge cannot heal. Feeds that
    * cannot guarantee parent-before-child ordering (or that carry
    * updates/deletes) should use [[migrateCdcStream]], whose pending
    * buffer heals out-of-order FK arrivals.
    *
    * `merge` receives each micro-batch's (node, edge) increments,
    * eagerly pinned so they never escape their micro-batch scope (the
    * [[indexStream]] precedent); a deployment folds them into its
    * graph store, the spec accumulates a [[graft.graph.PropertyGraph]].
    * An empty batch (all rows replayed) still calls `merge` with empty
    * increments — merge of nothing is the identity. */
  def migrateStream(rows: DataFrame, table: String, pk: String,
      fks: Seq[(String, String, DataFrame)],
      merge: (DataFrame, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val tableCols = rows.columns.filterNot(_ == "tsSec").toSeq
    rows
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withColumn("content_hash", md5(to_json(struct(tableCols.map(col): _*))))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(pk, "content_hash")
      .select(tableCols.map(col): _*)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (n, e) = graft.graph.RelationalMigration.tablePart(batch, table, pk, fks)
        merge(n.localCheckpoint(true), e.localCheckpoint(true))
        ()
      }.start()
  }

  /** Full-contract CDC relational→graph ingest: [[migrateStream]]'s
    * INSERT-only twin extended to UPDATE and DELETE, converging to the
    * batch migration of the FINAL table state. The reference's one-shot
    * migration (tasks/ingestion/migrate_relational_database.py:18)
    * defines no update semantics, so this is a documented extension
    * with the contract a real CDC feed (Debezium-shaped) needs.
    *
    * Input rows carry `op` (I/U/D — I and U are both full-row-image
    * upserts; D needs only the pk, other columns may be NULL) and
    * `seq` (the CDC log sequence number: strictly increasing per pk —
    * the versioned-row key). The ONE stateful op keeps max applied seq
    * per pk and emits only records that advance it: replays and
    * out-of-order stale records (an UPDATE arriving after the DELETE
    * that superseded it) are dropped exactly once, forever — not just
    * within a watermark horizon. State is one long per pk (the same
    * bounded-state honesty note as the other ingest twins).
    *
    * Each micro-batch then applies, inside ONE `transact` callback
    * (invoke the function exactly once per batch; a deployment wraps
    * load→f→save on its graph store, a spec accumulates):
    *   - prop-bag rewrite as delete+reinsert: every changed row node is
    *     deleted (cascading its is_part_of/column/FK edges) and, for
    *     upserts, re-derived through the SAME shared increment
    *     projection as batch ([[graft.graph.RelationalMigration.tablePart]]);
    *   - incoming FK edges (children → a changed row) survive an UPDATE
    *     (the pk still names the same row) and move to the pending
    *     buffer on a DELETE, healing if the pk is later re-inserted;
    *   - a bounded orphan sweep: ColumnValue nodes the changed rows
    *     referenced that no longer have ANY referencing edge are
    *     removed (batch-of-final-state parity — candidates are the
    *     changed rows' pre-image values, a batch-proportional set, not
    *     a graph-wide scan);
    *   - FK healing for out-of-order arrival (the r13 insert-ordering
    *     gap): a child row whose parent key matches nothing joins the
    *     pending buffer instead of silently dropping its edge, and
    *     every batch re-validates pending edges against the live row
    *     nodes AND the parent key plans (the plans re-EXECUTE per
    *     batch; whether they see new parents depends on the source —
    *     JDBC/catalog tables do, a plain parquet frame pins its file
    *     listing at creation) — a parent arriving later (same stream,
    *     a sibling CDC stream into the same store, or a re-insert
    *     after DELETE) materializes the edge then. Pending entries retire
    *     when their child row is deleted or re-imaged. The buffer is
    *     bounded by the number of unhealed dangling children (eagerly
    *     pinned per batch).
    *
    * For a self-referential table pass an empty parent-key frame for
    * that FK — row-node presence in the live graph is the truth there.
    * Scale shape: every per-batch join keys on the batch's changed-row
    * set or the pending buffer; nothing is graph-proportional except
    * the keyed merges the bulk mutation contract already owns.
    *
    * RESTART SCOPE: the latest-wins (pk, seq) gate is the stream's
    * durable state (checkpoint-recovered). The pending-FK buffer is
    * durable too WHEN `checkpointDir` is given: the stream checkpoints
    * under `<dir>/spark` and the buffer persists as a parquet sidecar
    * under `<dir>/pending` — one snapshot per micro-batch, committed by
    * an atomic `_CURRENT` pointer after the batch's `transact` returns
    * (the [[graft.sources.GraphStore]] generation discipline), with the
    * predecessor snapshot retained so a batch that re-runs after a
    * crash-between-foreachBatch-and-epoch-commit re-adopts the state
    * its FIRST run started from. A restart therefore cannot silently
    * lose parked edge heals. Without `checkpointDir` the buffer is
    * SESSION-LIFETIME — it lives beside the driver like the graph the
    * `transact` callbacks accumulate, and a redeploy must either replay
    * the feed against an empty checkpoint or run the one-shot batch
    * migration ([[graft.graph.RelationalMigration]]) to reconcile.
    * (The GRAPH's durability stays the deployment's job either way —
    * the transact contract wraps load→f→save on its store.) */
  def migrateCdcStream(rows: DataFrame, table: String, pk: String,
      fks: Seq[(String, String, DataFrame)],
      transact: (graft.graph.PropertyGraph => graft.graph.PropertyGraph) => Unit,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = rows.sparkSession
    import spark.implicits._
    val tableCols = rows.columns.filterNot(c => c == "op" || c == "seq" || c == "tsSec").toSeq
    val rowSchema = rows.select(tableCols.map(col): _*).schema
    val rowIdPrefix = "tablerow:" + table + ":"
    val emptyBag = map().cast("map<string,string>")
    // pending dangling-FK edges: (src, dst, rel, props) plus
    // (refTable, fkv) for re-validation against the parent key plans —
    // props ride along so an edge parked by a parent DELETE heals with
    // its original bag, like an edge surviving an UPDATE does
    val emptyPending = Seq.empty[(String, String, String, String, String)]
      .toDF("src", "dst", "rel", "refTable", "fkv")
      .withColumn("props", map().cast("map<string,string>"))
    val pendingStore = checkpointDir.map(d => new CdcPendingStore(spark, d + "/pending"))
    // restart recovery: adopt the committed sidecar snapshot (its batch
    // id rides along so a re-run of an already-snapshotted batch can be
    // detected and rolled back to the predecessor below)
    var pendingBatch = -1L
    var pending: DataFrame = pendingStore.flatMap(st => st.committed.map { id =>
      pendingBatch = id; st.read(id)
    }).getOrElse(emptyPending)

    val changes = rows
      .select(col(pk).cast("string").as("k"), upper(col("op")).as("op"),
        col("seq").cast("long").as("seq"),
        to_json(struct(tableCols.map(col): _*)).as("row"))
      .as[(String, String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, String, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[(String, String, Long, String)], state: GroupState[Long]) =>
          val applied = state.getOption.getOrElse(Long.MinValue)
          // only the newest record per pk per batch matters: intermediate
          // images are invisible in the final state both sides converge to
          val newest = it.maxBy(_._3)
          if (newest._3 > applied) { state.update(newest._3); Iterator.single(newest) }
          else Iterator.empty
      }

    val writer = changes.toDF("k", "op", "seq", "row")
      .writeStream.outputMode(OutputMode.Append())
    checkpointDir.foreach(d => writer.option("checkpointLocation", d + "/spark"))
    writer
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        // replayed batch (foreachBatch ran and committed its sidecar
        // snapshot, but the crash landed before the stream's epoch
        // commit): re-adopt the PREDECESSOR snapshot so the re-run
        // starts from the exact state its first run started from.
        pendingStore.foreach { st =>
          if (pendingBatch >= batchId) {
            val prev = st.snapshotIds.filter(_ < batchId).maxOption
            pending = prev.map(st.read).getOrElse(emptyPending)
            pendingBatch = prev.getOrElse(-1L)
          }
        }
        // LAZY checkpoint + count: materializes the blocks (the batch
        // must never escape micro-batch scope) AND answers the
        // emptiness probe in the SAME job — the BFS-loop lesson; the
        // eager-checkpoint + isEmpty idiom paid two scheduler rounds
        // per batch.
        val batch = rawBatch.localCheckpoint(false)
        val batchRows = batch.count()
        if (batchRows > 0L) transact { g =>
          val changedIds = batch
            .select(concat(lit(rowIdPrefix), col("k")).as("id")).distinct()
          val upsertIds = batch.filter(col("op") =!= "D")
            .select(concat(lit(rowIdPrefix), col("k")).as("id")).distinct()
          val deletedIds = batch.filter(col("op") === "D")
            .select(concat(lit(rowIdPrefix), col("k")).as("id")).distinct()
          val upsertRows = batch.filter(col("op") =!= "D")
            .select(from_json(col("row"), rowSchema).as("r")).select(col("r.*"))

          // pre-image captures (against g BEFORE the delete) AND the
          // upsert increment projection, in ONE kind-tagged eager pin:
          // the per-batch cost of this operator in local mode is its
          // eager-action count (each localCheckpoint is a full job
          // round), so every batch-scoped capture — orphan-sweep
          // candidates, FK edges arriving INTO the changed rows, and
          // the shared-projection node/edge increments, all mutually
          // independent reads of pre-mutation state — shares one
          // checkpoint and splits lazily after (r15: the preImage and
          // inc pins were separate actions; fusing them cut one job
          // round per micro-batch).
          val candLeg = g.edges
            .join(changedIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .filter(col("dst").startsWith("colval:" + table + ":"))
            .select(col("dst")).distinct()
            .select(lit("cand").as("leg"), lit(null).cast("string").as("a"),
              col("dst").as("b"), lit(null).cast("string").as("c"), emptyBag.as("props"))
          val inLeg = g.edges
            .join(changedIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .join(changedIds.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
            .select(lit("in").as("leg"), col("src").as("a"), col("dst").as("b"),
              col("rel").as("c"), col("props"))
          val (n, e) = graft.graph.RelationalMigration.tablePart(upsertRows, table, pk, fks)
          val pinned = candLeg.unionByName(inLeg)
            .unionByName(n.select(lit("n").as("leg"), col("id").as("a"),
              col("ntype").as("b"), col("name").as("c"), col("props")))
            .unionByName(e.select(lit("e").as("leg"), col("src"), col("dst"),
              col("rel"), col("props")).toDF("leg", "a", "b", "c", "props"))
            .localCheckpoint(true)
          val preCand = pinned.filter(col("leg") === "cand").select(col("b").as("dst"))
          val incoming = pinned.filter(col("leg") === "in")
            .select(col("a").as("src"), col("b").as("dst"), col("c").as("rel"), col("props"))
          val nInc = pinned.filter(col("leg") === "n")
            .select(col("a").as("id"), col("b").as("ntype"), col("c").as("name"), col("props"))
          val eInc = pinned.filter(col("leg") === "e")
            .select(col("a").as("src"), col("b").as("dst"), col("c").as("rel"), col("props"))

          // prop-bag rewrite: delete the changed rows (cascades their
          // edges both directions), re-derive the upserted images through
          // the shared batch projection, restore incoming edges whose
          // target row still exists (UPDATE keeps its children). The
          // re-derived images and the kept incoming edges merge in ONE
          // mergeEdges layer: their triplet sets are disjoint by
          // construction (eInc srcs are changed row ids; inLeg anti-
          // joined changed srcs away), so one layer is exactly the two
          // sequential layers it replaces — one fewer groupBy+anti-join
          // pair in every downstream action's plan this batch.
          val keptIncoming = incoming
            .join(upsertIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          val merged = g.deleteNodes(changedIds)
            .mergeNodes(nInc).mergeEdges(eInc.unionByName(keptIncoming))

          // bounded orphan sweep: candidates with no remaining reference
          val orphans = preCand
            .join(merged.edges.select(col("dst")), Seq("dst"), "left_anti")
            .withColumnRenamed("dst", "id")
          val swept = merged.deleteNodes(orphans)

          // pending-FK maintenance: retire entries whose child was
          // re-imaged or deleted, enqueue the batch's new dangling
          // children and the edges orphaned by parent deletes, then heal
          // everything whose target is now valid.
          val fkvOfDst = expr(s"substring(dst, ${rowIdPrefix.length + 1})")
          val newUnmatched = fks.map { case (fkCol, refTable, parentKeys) =>
            upsertRows
              .select(concat(lit(rowIdPrefix), col(pk).cast("string")).as("src"),
                col(fkCol).cast("string").as("fkv"))
              .where(col("fkv").isNotNull)
              .join(parentKeys, Seq("fkv"), "left_anti")
              .select(col("src"),
                concat(lit("tablerow:" + refTable + ":"), col("fkv")).as("dst"),
                lit(fkCol).as("rel"), lit(refTable).as("refTable"), col("fkv"),
                emptyBag.as("props"))
          }.reduceOption(_ unionByName _)
            .getOrElse(pending.limit(0))
          val orphanedIncoming = incoming
            .join(deletedIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .select(col("src"), col("dst"), col("rel"),
              lit(table).as("refTable"), fkvOfDst.as("fkv"), col("props"))
          // Deterministic collision rule for a triple arriving from more
          // than one source this batch: orphanedIncoming (an edge the
          // live graph held until this batch's parent DELETE — the
          // newest props truth) beats the parked old-pending entry.
          // plain dropDuplicates would keep an ARBITRARY row, so which
          // props bag healed later could differ across runs/replays.
          // Within one priority class triples are unique (mergeEdges
          // keys the graph on (src,dst,rel); newUnmatched and surviving
          // old pending have disjoint src sets — an upserted src retires
          // its old entries), so the window is a total order.
          val triple = org.apache.spark.sql.expressions.Window
            .partitionBy("src", "dst", "rel").orderBy(col("prio").desc)
          val pending1 = pending
            .join(changedIds.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
            .withColumn("prio", lit(0))
            .unionByName(newUnmatched.withColumn("prio", lit(1)))
            .unionByName(orphanedIncoming.withColumn("prio", lit(2)))
            .withColumn("rn", row_number().over(triple))
            .filter(col("rn") === 1).drop("prio", "rn")
          // validity: the target row node exists in the live graph (CDC-
          // managed tables, incl. self-FK), OR the per-batch re-evaluated
          // parent key plan carries the value (externally-owned parents)
          val viaGraph = pending1
            .join(swept.nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
          val viaParents = fks.map { case (fkCol, refTable, parentKeys) =>
            pending1.filter(col("refTable") === refTable && col("rel") === fkCol)
              .join(parentKeys, Seq("fkv"), "left_semi")
          }.reduceOption(_ unionByName _).getOrElse(pending1.limit(0))
          // ONE eager pass resolves the whole buffer: every pending1 row
          // tagged healable-or-not (pending1's triples are unique after
          // the priority dedup, so the left join cannot fan out), then
          // the heal set and the surviving buffer split lazily — the
          // preImage/inc checkpoint-sharing discipline.
          val healKeys = viaGraph.unionByName(viaParents)
            .select(col("src"), col("dst"), col("rel")).distinct()
            .withColumn("__heal", lit(1))
          val resolved = pending1
            .join(healKeys, Seq("src", "dst", "rel"), "left")
            .localCheckpoint(true)
          val healable = resolved.filter(col("__heal").isNotNull).drop("__heal")
          pending = resolved.filter(col("__heal").isNull).drop("__heal")
          // heal with the ORIGINAL props bag (empty for fresh FK edges,
          // the parked bag for edges orphaned by a parent delete)
          swept.mergeEdges(
            healable.select(col("src"), col("dst"), col("rel"), col("props")))
        }
        // durable mode: snapshot the post-batch buffer AFTER transact
        // returned (the graph mutation and its buffer state commit in
        // batch order; a crash before this line re-runs the batch from
        // the predecessor snapshot — the replay guard above). pending
        // then reads FROM the committed snapshot, releasing the
        // localCheckpoint lineage.
        pendingStore.foreach { st =>
          if (batchRows > 0L) {
            st.commit(batchId, pending)
            pending = st.read(batchId)
            pendingBatch = batchId
          }
        }
        ()
      }.start()
  }

  /** Parquet sidecar persisting [[migrateCdcStream]]'s pending-FK
    * buffer across restarts — the [[graft.sources.GraphStore]]
    * generation discipline at micro-batch granularity: one snapshot
    * directory `b<batchId>` per committed batch, promoted by an atomic
    * one-line `_CURRENT` pointer, predecessor retained (a replayed
    * batch rolls back to it), older snapshots GC'd. Recovery adopts the
    * pointed snapshot, else the newest one whose job commit finished
    * (`_SUCCESS`). The buffer is bounded by the number of unhealed
    * dangling children, so each snapshot is a single small parquet
    * file (coalesce(1)). */
  private[graft] final class CdcPendingStore(
      spark: org.apache.spark.sql.SparkSession, root: String) {
    private def path(parts: String*) =
      new org.apache.hadoop.fs.Path((root +: parts).mkString("/"))
    private def fs =
      path().getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def pointer = path("_CURRENT")

    def snapshotIds: Seq[Long] = {
      val f = fs
      if (!f.exists(path())) Seq.empty
      else f.listStatus(path()).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).collect { case s if s.matches("b\\d+") => s.drop(1).toLong }
        .filter(id => f.exists(path("b" + id, "_SUCCESS")))
    }

    /** The committed snapshot's batch id: the pointed one, else (crash
      * inside the pointer replace) the newest complete snapshot. */
    def committed: Option[Long] = {
      val pointed = graft.sources.AtomicPointer.read(fs, pointer)
        .flatMap(_.toLongOption).filter(id => fs.exists(path("b" + id, "_SUCCESS")))
      pointed.orElse(snapshotIds.maxOption)
    }

    def read(id: Long): DataFrame = spark.read.parquet(path("b" + id).toString)

    def commit(id: Long, df: DataFrame): Unit = {
      val f = fs
      graft.sources.FaultPoints.hit("cdcpending.commit.begin")
      df.coalesce(1).write.mode("overwrite").parquet(path("b" + id).toString)
      graft.sources.FaultPoints.hit("cdcpending.commit.snapshot-written")
      graft.sources.AtomicPointer.commit(f, pointer, id.toString, "cdcpending.commit")
      // keep the committed snapshot and its immediate predecessor
      val older = snapshotIds.filter(_ < id)
      older.filterNot(older.maxOption.contains)
        .foreach(old => f.delete(path("b" + old), true))
    }
  }

  /** At-ingest SemDeDup — the streaming twin of
    * [[graft.operators.CurateOps.semDedup]] (Abbas et al. 2023): each
    * arriving embedding is assigned a cell under the PERSISTED
    * quantizer (no retrain, like [[indexStream]]) in the stateless
    * prefix; the ONE stateful op keys the state store by cell and
    * keeps the unit-normalized vectors of that cell's KEPT residents.
    * An arrival at rounded cosine ≥ τ to any kept resident is dropped
    * (greedy leader clustering); otherwise it's kept and becomes a
    * resident.
    *
    * Batch-parity contract (spec-pinned, for id-ordered arrivals):
    * greedy keep is CONSERVATIVE against the batch component
    * resolution — every batch-kept representative (its component's
    * min id, which arrives before any τ-neighbor that could drop it)
    * is stream-kept, and every stream-dropped vector names a
    * smaller-id τ-neighbor, hence shares a component whose min it is
    * not, so stream-dropped ⊆ batch-dropped. The gap (a vector τ-far
    * from its component's kept min through a dropped chain link) is
    * deferred to the batch sweep — the paper's resolution is itself
    * arbitrary-per-group, so both sides are valid SemDeDup actions.
    *
    * Replay-idempotent: a replayed kept id re-emits its kept row
    * without re-adding; a replayed dropped id re-derives the SAME
    * verdict against the unchanged resident set. State per cell is
    * capped at [[maxBucketResidents]] vectors (over-cap keeps still
    * emit but are not stored, so later arrivals can't match them —
    * the same bounded-state honesty note as [[nearDupStream]]; cells
    * are ~√n at scale, so the per-key cap bounds total state). */
  def semDedupStream(vectors: DataFrame, centroids: Array[Array[Double]],
      tau: Double = 0.4): Dataset[SemDedupDecision] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors
      .select(col("vecId").cast("long").as("vecId"),
        col("v").cast("array<double>").as("v"),
        graft.operators.VectorOps.bestCell(col("v"), centroids)
          .getField("cell").as("cell"))
      .as[(Long, Seq[Double], Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Array[Double])], SemDedupDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cell: Int, it: Iterator[(Long, Seq[Double], Int)],
         state: GroupState[List[(Long, Array[Double])]]) =>
          var kept = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[SemDedupDecision]
          def cos4(a: Array[Double], b: Array[Double]): Double = {
            var s = 0.0; var i = 0
            while (i < a.length) { s += a(i) * b(i); i += 1 }
            // Spark's round(_, 4) is BigDecimal HALF_UP (away from zero
            // for NEGATIVE values too) — floor(s*1e4+0.5) diverged from
            // the batch path at negative half-ulp boundaries, silently
            // breaking the batch-parity contract for tau <= 0. NaN/Inf
            // pass through unrounded exactly like Spark's Round codegen
            // (BigDecimal(NaN) throws — one poisoned vector must not
            // kill the stream where the batch path yields NaN).
            if (s.isNaN || s.isInfinite) s
            else BigDecimal(s).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          // id-ordered processing (dedup replayed-in-batch ids first):
          // deterministic, and the order under which the containment
          // contract above holds.
          val arrivals = it.toIndexedSeq.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.head)
          arrivals.foreach { case (id, vRaw, _) =>
            if (kept.exists(_._1 == id)) out += SemDedupDecision(id, cell, kept = true, -1L)
            else {
              val n = math.sqrt(vRaw.foldLeft(0.0)((a, x) => a + x * x))
              val vn = (if (n > 0) vRaw.map(_ / n) else vRaw).toArray
              val hits = kept.collect { case (kid, kv) if cos4(kv, vn) >= tau => kid }
              if (hits.nonEmpty) out += SemDedupDecision(id, cell, kept = false, hits.min)
              else {
                out += SemDedupDecision(id, cell, kept = true, -1L)
                if (kept.length < maxBucketResidents) kept = (id, vn) :: kept
              }
            }
          }
          state.update(kept)
          out.result().iterator
      }
  }

  /** At-ingest decontamination — the streaming twin of
    * `curate_decontaminate` via `curate_decontaminate_bloom`'s plan
    * shape: the arriving document's distinct word-8-grams (the SHARED
    * [[graft.operators.CurateOps.shingles8]] math) pass a
    * `might_contain` probe against the PREBUILT eval-set Bloom (a
    * bounded Literal, built once from the static eval corpus — the
    * persisted-quantizer discipline), then a stream-static LEFT SEMI
    * join against the exact eval shingle set discards false positives.
    * A doc's shingles all ride its own row, so the per-doc count
    * completes inside its micro-batch — the one stateful op keys by
    * doc and stores NOTHING (replay re-derives the identical verdict
    * from the static eval side: idempotent by determinism, no state to
    * corrupt, no growth for the life of the stream). At scale the
    * Bloom rejects non-candidate shingles in the scan stage, so the
    * stream-static join only ever sees candidates — the map-side
    * prefilter contract pinned for the batch twin in PushdownSpec. */
  def decontaminateStream(docs: DataFrame, evalShingles: DataFrame,
      bloom: Array[Byte]): Dataset[ContaminationVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.CurateOps.shingles8(
        docs.select(col("docId").cast("long").as("doc_id"), col("text")))
      .filter(org.apache.spark.sql.graft.SketchExpressions.mightContain(
        bloom, xxhash64(col("shingle"))))
      .join(evalShingles.select(col("shingle")), Seq("shingle"), "left_semi")
      .select(col("doc_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Boolean, ContaminationVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, it: Iterator[Long], _: GroupState[Boolean]) =>
          Iterator.single(ContaminationVerdict(id, it.size.toLong))
      }
  }

  /** Continuously-maintained per-user history — the streaming twin of
    * EventOps.history (get_history's latest-k ledger read, kept hot as
    * state instead of recomputed per query). State per user is the
    * BOUNDED top-k list ordered by (tsSec, eventId) descending — k
    * entries per key no matter how long the stream runs, sharded with
    * the shuffle like all keyed state. Each micro-batch merges its
    * arrivals into the list and re-emits the user's current history
    * (Update mode — downstream sinks upsert on userId). */
  def historyStream(events: Dataset[Event], k: Int = 10): Dataset[HistoryEntry] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[List[(Long, Long, String)], HistoryEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[(Long, Long, String)]]) =>
          // dedup on eventId: an at-least-once source replays events, and
          // a replayed event must not occupy two top-k slots (the batch
          // ledger counts it once)
          val merged = (state.getOption.getOrElse(Nil) ++
              it.map(e => (e.tsSec, e.eventId, e.eventType)))
            .distinctBy(_._2)
            .sortBy(t => (-t._1, -t._2)).take(k)
          state.update(merged)
          merged.zipWithIndex.iterator.map { case ((ts, id, tpe), i) =>
            HistoryEntry(userId, i + 1, id, tpe, ts)
          }
      }
  }

  /** At-ingest funnel progression (streaming twin of
    * EventOps.funnel): per-user state carries the earliest view, the
    * earliest click strictly after it, the earliest purchase strictly
    * after that; each micro-batch folds its events in (tsSec, eventId)
    * order and emits the user's current stage (Update mode). The
    * transitions are monotone — a replayed event is a no-op, so
    * at-least-once delivery cannot advance a stage twice. Within-order
    * arrival matches batch exactly (first view in time order IS the
    * min); cross-batch late data shares the sessionize caveat. */
  def funnelStream(events: Dataset[Event]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          it.toIndexedSeq.sortBy(e => (e.tsSec, e.eventId)).foreach { e =>
            e.eventType match {
              case "view" if s.t1 < 0 => s = s.copy(t1 = e.tsSec)
              case "click" if s.t1 >= 0 && s.t2 < 0 && e.tsSec > s.t1 =>
                s = s.copy(t2 = e.tsSec)
              case "purchase" if s.t2 >= 0 && s.t3 < 0 && e.tsSec > s.t2 =>
                s = s.copy(t3 = e.tsSec)
              case _ =>
            }
          }
          state.update(s)
          val stage = if (s.t3 >= 0) 3 else if (s.t2 >= 0) 2 else if (s.t1 >= 0) 1 else 0
          Iterator.single(FunnelProgress(userId, stage))
      }
  }

  /** At-ingest R/F/M engagement rollup (streaming twin of the batch
    * events_rfm per-user stage): per-user state carries (last_seen,
    * frequency, monetary-sum) plus a BOUNDED 128-entry recent-event-id
    * window for replay idempotence (the dedupStream/nearDupStream
    * bucket-state precedent: an at-least-once source replays recent
    * events, and a replayed event must not double-count frequency or
    * monetary). Each micro-batch folds its arrivals in (tsSec, eventId)
    * order and re-emits the user's current rollup (Update mode —
    * downstream sinks upsert on userId). Quartile scoring stays the
    * batch-side broadcast-cutoff pass: cutoffs are corpus-wide
    * percentiles no per-key state can maintain. Monetary is rounded at
    * READ (2dp), matching the batch round(sum(value), 2).
    *
    * REPLAY CONTRACT (the bounded window's corruption mode, stated
    * plainly): the recent-id window holds a user's newest 128 event
    * ids, sized for an at-least-once source's redelivery span (a
    * micro-batch or two around a checkpoint) — NOT for archival
    * replays. A replay reaching deeper than the window double-counts
    * the out-of-window events' frequency/monetary silently. Feeding a
    * from-scratch re-read into a live rollup is a rebuild, not a
    * replay: start it against fresh state (new checkpoint dir), the
    * same way the batch rfm recomputes from the ledger. The parity
    * spec asserts its corpus fits the window, so the assumption is
    * checked, not assumed. */
  def rfmStream(events: Dataset[Event]): Dataset[RfmRollup] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[RfmState, RfmRollup](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[RfmState]) =>
          var s = state.getOption.getOrElse(RfmState(Long.MinValue, 0L, 0.0, Nil))
          it.toIndexedSeq.sortBy(e => (e.tsSec, e.eventId)).foreach { e =>
            if (!s.recent.exists(_._2 == e.eventId)) {
              s = RfmState(math.max(s.lastSeen, e.tsSec), s.freq + 1, s.monetary + e.value,
                ((e.tsSec, e.eventId) :: s.recent).sortBy(t => (-t._1, -t._2)).take(128))
            }
          }
          state.update(s)
          Iterator.single(RfmRollup(userId, s.lastSeen, s.freq,
            BigDecimal(s.monetary).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
  }

  /** Continuously-maintained HEAVY HITTERS (streaming twin of the batch
    * two-pass Misra–Gries `events_heavy_hitters`): a SpaceSaving
    * summary (Metwally et al. 2005) per SHARD — keys are hashed to
    * `shards` groups (a user's events all land in its own shard, so a
    * shard's count for a user IS the global count), each shard's state
    * holds at most k = ⌈1/φ⌉ (userId → (est, err)) counters. Hit:
    * est+1. Miss with a full table: evict the argmin-est key; the new
    * key enters at (minEst + 1, minEst). Invariants at every batch
    * boundary: true ∈ [est − err, est] for each tracked key, and any
    * key with true count > n_shard/k is guaranteed tracked — so a
    * consumer taking each shard's latest summary (max `n`) gets a
    * candidate superset of the φ-heavy hitters with certified bounds,
    * the streaming analog of the batch pass-1 superset. Emissions are
    * the full summary per batch (Update mode).
    *
    * Replay suppression follows the rfmStream precedent — a bounded
    * 256-entry recent-event-id window PER SHARD, sized for micro-batch
    * redelivery, NOT archival replays (a deeper replay inflates est
    * beyond the err bound; rebuild from fresh state instead — same
    * documented corruption mode as rfmStream). */
  def heavyHittersStream(events: Dataset[Event], phi: Double = 0.005,
      shards: Int = 8): Dataset[HeavyHitterEntry] = {
    import events.sparkSession.implicits._
    val k = math.ceil(1.0 / phi).toInt
    events
      .groupByKey(e => (math.abs(e.userId) % shards).toInt)
      .flatMapGroupsWithState[HhState, HeavyHitterEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[Event], state: GroupState[HhState]) =>
          var s = state.getOption.getOrElse(HhState(Map.empty, 0L, Nil))
          it.toIndexedSeq.sortBy(e => (e.tsSec, e.eventId)).foreach { e =>
            if (!s.recent.contains(e.eventId)) {
              val counters = s.counters.get(e.userId) match {
                case Some((est, err)) => s.counters.updated(e.userId, (est + 1L, err))
                case None if s.counters.size < k => s.counters.updated(e.userId, (1L, 0L))
                case None =>
                  val (evict, (minEst, _)) = s.counters.minBy { case (id, (est, _)) => (est, id) }
                  (s.counters - evict).updated(e.userId, (minEst + 1L, minEst))
              }
              s = HhState(counters, s.n + 1L, (e.eventId :: s.recent).take(256))
            }
          }
          state.update(s)
          s.counters.iterator.map { case (id, (est, err)) =>
            HeavyHitterEntry(shard, s.n, id, est, err)
          }
      }
  }

  /** At-ingest conversion ATTRIBUTION (streaming twin of the batch
    * events_attribution): per-user state carries the earliest view and
    * latest click seen so far — both idempotent min/max folds, so
    * replayed TOUCHES can never corrupt state — and each purchase
    * emits one attributed row against the touches seen strictly before
    * it in (tsSec, eventId) order (the batch window-frame contract;
    * within a time-ordered stream the two are identical). Replayed
    * PURCHASES are suppressed by a bounded 128-entry recent-purchase-id
    * window (the rfmStream precedent — without it a replayed purchase
    * would re-attribute against LATER-arrived touches and emit a
    * conflicting row); a replay reaching past the window re-attributes
    * against current state, the same documented corruption mode as
    * rfmStream's. Late cross-batch touches attribute FORWARD only —
    * the at-ingest contract (the batch pass is the retrospective
    * recompute). */
  def attributionStream(events: Dataset[Event]): Dataset[AttributedPurchase] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[TouchState, AttributedPurchase](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[TouchState]) =>
          var s = state.getOption.getOrElse(TouchState(-1L, -1L, Nil))
          val out = List.newBuilder[AttributedPurchase]
          it.toIndexedSeq.sortBy(e => (e.tsSec, e.eventId)).foreach { e =>
            e.eventType match {
              case "view" =>
                s = s.copy(firstViewSec =
                  if (s.firstViewSec < 0) e.tsSec else math.min(s.firstViewSec, e.tsSec))
              case "click" =>
                s = s.copy(lastClickSec = math.max(s.lastClickSec, e.tsSec))
              case "purchase" if !s.recentPurchases.contains(e.eventId) =>
                out += AttributedPurchase(e.eventId, userId, e.tsSec,
                  s.firstViewSec, s.lastClickSec,
                  BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
                s = s.copy(recentPurchases = (e.eventId :: s.recentPurchases).take(128))
              case _ =>
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** At-ingest AS-OF enrichment twin of the batch
    * [[graft.operators.RelationalOps.asofDemo]]: per-user state carries
    * the LATEST click seen so far as a (sec, eventId)-lexicographic max
    * fold — idempotent, so replayed clicks can never corrupt it, and at
    * a tied second the max eventId wins exactly like the batch arg_max
    * dedup — and every purchase emits one enriched row against that
    * state. Within a micro-batch, events fold in (tsSec, type, eventId)
    * order with clicks BEFORE purchases at the same instant, matching
    * the batch's inclusive at-or-before; a same-instant click arriving
    * in a LATER batch than its purchase cannot match (the documented
    * at-ingest forward-only contract — the batch pass is the
    * retrospective recompute). Replayed purchases are suppressed by the
    * bounded 128-entry recent-id window (rfmStream precedent, same
    * documented corruption mode past the window). */
  def asofStream(events: Dataset[Event]): Dataset[AsofPurchase] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AsofState, AsofPurchase](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[AsofState]) =>
          var s = state.getOption.getOrElse(AsofState(-1L, -1L, -1.0, Nil))
          val out = List.newBuilder[AsofPurchase]
          it.toIndexedSeq
            .sortBy(e => (e.tsSec, e.eventType == "purchase", e.eventId)).foreach { e =>
              e.eventType match {
                case "click" =>
                  if (e.tsSec > s.clickSec || (e.tsSec == s.clickSec && e.eventId > s.clickId))
                    s = s.copy(clickSec = e.tsSec, clickId = e.eventId, clickValue = e.value)
                case "purchase" if !s.recentPurchases.contains(e.eventId) =>
                  out += AsofPurchase(e.eventId, userId, e.tsSec, e.value,
                    s.clickSec, s.clickId, s.clickValue)
                  s = s.copy(recentPurchases = (e.eventId :: s.recentPurchases).take(128))
                case _ =>
              }
            }
          state.update(s)
          out.result().iterator
      }
  }

  /** 30-minute-gap sessionization with explicit state
    * (flatMapGroupsWithState, processing-time timeout). Emits a session
    * whenever a gap closes it; emits the open session on timeout.
    * Semantics match the batch EventOps.sessionize (gap math on whole
    * seconds). Events within a group are sorted by (tsSec, eventId)
    * before folding — Spark does not order rows within a group. */
  def sessionize(events: Dataset[Event], flushOnTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (flushOnTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout() // tests: timeout batches would keep processAllAvailable spinning
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map(s =>
              Session(userId, s.sessId, s.nEvents, s.totalValue, s.startS, s.endS))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toIndexedSeq.sortBy(e => (e.tsSec, e.eventId))
            var open = state.getOption.getOrElse(Nil).headOption
            var nextId = open.map(_.sessId + 1).getOrElse(1L)
            val closed = List.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.tsSec - s.endS <= 1800 =>
                  open = Some(s.copy(nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value, endS = e.tsSec))
                case Some(s) =>
                  closed += Session(userId, s.sessId, s.nEvents,
                    math.round(s.totalValue * 100) / 100.0, s.startS, s.endS)
                  open = Some(SessionState(nextId, 1L, e.value, e.tsSec, e.tsSec))
                  nextId += 1
                case None =>
                  open = Some(SessionState(nextId, 1L, e.value, e.tsSec, e.tsSec))
                  nextId += 1
              }
            }
            state.update(open.toList)
            if (flushOnTimeout) state.setTimeoutDuration("35 minutes")
            closed.result().iterator
          }
      }
  }
}
