package graft

import graft.operators.EventOps
import graft.streaming.{Event, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpecBase {

  private def loadEvents(): Seq[Event] = {
    import TestSpark.spark.implicits._
    Tables.loadEvents(spark, sf)
      .select(col("event_id"), col("ts_sec"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect().map(e => Event(e._1, e._2, e._3, e._4, e._5)).toSeq
  }

  test("streaming windowed agg equals batch windowAgg") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(loadEvents())
    val q = EventStream.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("wagg").outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wagg")
      .select(col("hour"), col("event_type"), col("n_events"), col("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val expect = EventOps.windowAgg(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expect)
  }

  test("stream-static enrichment attaches dimension columns per batch") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(loadEvents().take(200))
    val dim = Tables.load(spark, sf, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val q = EventStream.enrich(stream.toDF(), dim, "userId", "c_custkey")
      .writeStream.format("memory").queryName("enriched").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val t = spark.table("enriched")
    assert(t.count() === 200L)
    assert(t.filter(col("c_mktsegment").isNotNull).count() === 200L) // every user is a customer
  }

  test("partitioned event sink prunes by date predicate") {
    val out = java.nio.file.Files.createTempDirectory("graft_events").toString
    graft.operators.EventOps.writePartitionedByDay(Tables.loadEvents(spark, sf), out)
    val pruned = spark.read.parquet(out).filter(col("event_date") === "2024-01-02")
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_date=2024-01-02")))
  }

  test("streaming history state equals the batch recency ranking") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val events = loadEvents()
    stream.addData(events)
    val q = EventStream.historyStream(stream.toDS())
      .writeStream.format("memory").queryName("hist").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    // at-least-once replay: the full batch again — state must dedup on
    // eventId, so the re-emission is identical and the collected SET
    // still equals the batch ledger (duplicates at shifted positions
    // would break the equality)
    stream.addData(events)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hist")
      .select(col("userId"), col("pos"), col("eventId"), col("eventType"), col("tsSec"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3), r.getLong(4))).toSet
    val expect = EventOps.history(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("pos"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"), r.getAs[Long]("ts_sec"))).toSet
    assert(got === expect)
  }

  test("streaming funnel stages equal the batch funnel counts, replay-idempotent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val events = loadEvents()
    stream.addData(events)
    val q = EventStream.funnelStream(stream.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    stream.addData(events) // at-least-once replay: stages must not advance
    q.processAllAvailable()
    q.stop()
    // memory sink in Update mode appends each batch's emissions; the
    // LAST emission per user is its final stage
    val finalStage = spark.table("funnel")
      .groupBy(col("userId")).agg(org.apache.spark.sql.functions.max(col("stage")).as("stage"))
    val got = (1 to 3).map(st =>
      finalStage.filter(col("stage") >= st).count())
    val expect = graft.operators.EventOps.funnel(spark, sf)
      .orderBy(col("stage")).collect().map(_.getAs[Long]("n_users")).toSeq
    assert(got === expect, s"streaming stages $got vs batch $expect")
    // replay emitted identical stages — max == min per user
    val moved = spark.table("funnel").groupBy(col("userId"))
      .agg((org.apache.spark.sql.functions.max(col("stage")) -
        org.apache.spark.sql.functions.min(col("stage"))).as("d"))
      .filter(col("d") > 0).count()
    assert(moved === 0L, "a replay advanced some user's stage")
  }

  test("streaming rfm rollups equal the batch per-user stage, replay-idempotent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val events = loadEvents()
    // The full-replay leg below exercises the 128-entry recent-id dedup
    // window ONLY because every test user fits inside it — assert that
    // precondition, so a regenerated corpus with chattier users fails
    // HERE (assumption violated) instead of passing by luck or failing
    // with an opaque parity diff. A replay reaching past the window
    // double-counts by design (documented in rfmStream's contract);
    // production replays are micro-batch-sized, not archival.
    val maxPerUser = events.groupBy(_.userId).values.map(_.size).max
    assert(maxPerUser <= 128,
      s"testdata breaks the rfmStream replay-window assumption: $maxPerUser events/user > 128")
    // two batches plus a full replay: state must fold increments AND
    // dedup replayed event ids (no double-counted frequency/monetary)
    val (h1, h2) = events.splitAt(events.length / 2)
    stream.addData(h1)
    val q = EventStream.rfmStream(stream.toDS())
      .writeStream.format("memory").queryName("rfm").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    stream.addData(h2)
    q.processAllAvailable()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()
    // Update-mode memory sink appends per-batch emissions; the rollup
    // with the highest frequency per user is the final one
    val got = spark.table("rfm")
      .groupBy(col("userId"))
      .agg(org.apache.spark.sql.functions.max(
        struct(col("frequency"), col("lastSeenS"), col("monetary"))).as("m"))
      .select(col("userId"), col("m.lastSeenS"), col("m.frequency"), col("m.monetary"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val expect = graft.operators.EventOps.rfm(spark, sf)
      .select(col("user_id"), col("last_seen_s"), col("frequency"), col("monetary"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expect)
  }

  test("streaming SpaceSaving heavy hitters certify the batch answer, replay-suppressed") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val events = loadEvents()
    val (h1, h2) = events.splitAt(events.length / 2)
    stream.addData(h1)
    val q = EventStream.heavyHittersStream(stream.toDS())
      .writeStream.format("memory").queryName("hh").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    stream.addData(h2)
    q.processAllAvailable()
    // micro-batch-sized redelivery: the LAST batch's time-tail is what
    // each shard's 256-entry recent-id window still holds (batches are
    // processed time-sorted, so the window ends as the batch's
    // time-largest ids) — replaying it must not move any estimate
    stream.addData(h2.sortBy(e => (e.tsSec, e.eventId)).takeRight(64))
    q.processAllAvailable()
    q.stop()
    // each shard's LATEST summary = rows at its max processed-count n
    val all = spark.table("hh")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val latest = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val nMax = rows.map(_._2).max
      rows.filter(_._2 == nMax).toSeq
    }.map { case (_, _, id, est, err) => id -> ((est, err)) }.toMap
    val truth = Tables.loadEvents(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    // certified bounds: true ∈ [est − err, est] for every tracked key
    latest.foreach { case (id, (est, err)) =>
      assert(truth(id) <= est && truth(id) >= est - err, s"user $id: [$est-$err,$est] vs ${truth(id)}")
    }
    // superset guarantee: every batch heavy hitter is tracked
    val batchHh = EventOps.heavyHitters(spark, sf).collect().map(_.getAs[Long]("user_id")).toSet
    assert(batchHh.subsetOf(latest.keySet),
      s"missing true heavy hitters: ${batchHh -- latest.keySet}")
    // the replay leg did not advance any shard's processed count: each
    // shard shows at most one n per REAL batch (the replay batch
    // re-emits the batch-2 n, collapsing under distinct), never a third
    all.groupBy(_._1).foreach { case (shard, rows) =>
      val ns = rows.map(_._2).distinct
      assert(ns.length <= 2, s"shard $shard replay advanced n: ${ns.sorted.toList}")
    }
  }

  test("streaming attribution equals the batch per-purchase pass, replay-suppressed") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // time-ordered batches: the at-ingest contract attributes against
    // touches seen so far, which equals the batch strictly-before
    // window only when batches respect the (tsSec, eventId) order
    val events = loadEvents().sortBy(e => (e.tsSec, e.eventId))
    val purchasesPerUser = events.filter(_.eventType == "purchase")
      .groupBy(_.userId).values.map(_.size).foldLeft(0)(math.max)
    assert(purchasesPerUser <= 128,
      s"testdata breaks the replay-window assumption: $purchasesPerUser purchases/user")
    val (h1, h2) = events.splitAt(events.length / 2)
    stream.addData(h1)
    val q = EventStream.attributionStream(stream.toDS())
      .writeStream.format("memory").queryName("attr").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    stream.addData(h2)
    q.processAllAvailable()
    stream.addData(events) // full replay: all purchases suppressed, touches idempotent
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))).toMap
    val expect = graft.operators.EventOps.attribution(spark, sf)
      .select(col("event_id"), col("user_id"), col("purchase_sec"),
        coalesce(col("first_view_sec"), lit(-1L)),
        coalesce(col("last_click_sec"), lit(-1L)), col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))).toMap
    assert(spark.table("attr").count() === expect.size.toLong,
      "replay must not re-emit any purchase")
    assert(got === expect)
  }

  test("streaming as-of enrichment equals the batch union-tag join, replay-suppressed") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // at-ingest parity needs same-instant clicks to precede purchases
    // (the batch at-or-before is inclusive); the sort encodes that
    // order contract
    val events = loadEvents().sortBy(e => (e.tsSec, e.eventType == "purchase", e.eventId))
    val (h1, h2) = events.splitAt(events.length / 2)
    stream.addData(h1)
    val q = EventStream.asofStream(stream.toDS())
      .writeStream.format("memory").queryName("asof").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    stream.addData(h2)
    q.processAllAvailable()
    stream.addData(events) // full replay: purchases suppressed, click state idempotent
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val expect = graft.operators.RelationalOps.asofDemo(spark, sf)
      .select(col("event_id"), col("user_id"), col("purchase_sec"), col("purchase_value"),
        coalesce(col("click_sec"), lit(-1L)), coalesce(col("click_id"), lit(-1L)),
        coalesce(col("click_value"), lit(-1.0)))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(spark.table("asof").count() === expect.size.toLong,
      "replay must not re-emit any purchase")
    assert(got === expect)
  }

  test("streaming dedup drops replayed events within the watermark") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val evs = loadEvents().take(500)
    stream.addData(evs ++ evs) // replay every event once
    val q = EventStream.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() === evs.map(_.eventId).distinct.size.toLong)
  }

  test("streaming cognify appends exactly the batch mention increments, re-ingest deduped") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, Long, String)]
    // two micro-batches; the second replays batch 1's first doc verbatim
    // under a NEW id — content-hash dedup must drop it
    val t0 = 1700000000L
    stream.addData(docs.take(25).map { case (id, tx) => (id, t0, tx) }.toSeq)
    stream.addData(docs.drop(25).map { case (id, tx) => (id, t0 + 60, tx) }.toSeq
      :+ ((99999L, t0 + 60, docs.head._2)))
    val q = EventStream.cognifyStream(stream.toDF().toDF("docId", "tsSec", "text"))
      .writeStream.format("memory").queryName("cogstream").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cogstream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = docs.flatMap { case (id, tx) =>
      tx.split(" ").distinct.map(tok => (id, tok)) }.toSet
    assert(got === expect) // no 99999 rows, nothing missing
  }

  test("streaming classification emits exactly the batch chunk rows, replay deduped") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source")).limit(30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val stream = MemoryStream[(Long, Long, String, String, String)]
    val t0 = 1700000000L
    stream.addData(docs.take(15).map { case (id, tx, l, s) => (id, t0, tx, l, s) }.toSeq)
    // batch 2 replays batch 1's first doc verbatim — the (docId,
    // content_hash) dedup must drop it
    stream.addData(docs.drop(15).map { case (id, tx, l, s) => (id, t0 + 60, tx, l, s) }.toSeq
      :+ ((docs.head._1, t0 + 60, docs.head._2, docs.head._3, docs.head._4)))
    val q = EventStream.classifyStream(
        stream.toDF().toDF("docId", "tsSec", "text", "lang", "source"))
      .writeStream.format("memory").queryName("clsstream").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("clsstream")
      .select(col("chunk_id"), col("type_label"), col("sub_label"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val expect = Pipeline.classifiedChunksFrom(
        docs.toSeq.toDF("doc_id", "text", "lang", "source"))
      .select(col("chunk_id"), col("type_label"), explode(col("subs")).as("sub_label"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === expect) // replay contributed nothing, nothing missing
  }

  test("streaming temporal extraction emits exactly the batch event rows, replay deduped") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, Long, String)]
    val t0 = 1700000000L
    // a doc that actually extracts events (not every doc mentions a date)
    val emitting = operators.TextOps.temporalExtractFrom(docs.toSeq.toDF("doc_id", "text"))
      .select(col("doc_id")).distinct().head().getLong(0)
    val emittingText = docs.find(_._1 == emitting).get._2
    stream.addData(docs.take(20).map { case (id, tx) => (id, t0, tx) }.toSeq)
    // second batch: a true replay (same id, same text — at-least-once
    // redelivery, must be dropped) AND a DISTINCT doc id carrying
    // identical text — batch extraction anchors events by (doc_id, pos),
    // so the duplicate-text doc must still emit its own rows.
    stream.addData(docs.drop(20).map { case (id, tx) => (id, t0 + 60, tx) }.toSeq
      ++ Seq((emitting, t0 + 60, emittingText), (88888L, t0 + 60, emittingText)))
    val q = EventStream.temporalExtractStream(stream.toDF().toDF("docId", "tsSec", "text"))
      .writeStream.format("memory").queryName("tempstream").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tempstream")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getString(4))).toSet
    val expect = operators.TextOps.temporalExtractFrom(
        (docs.toSeq :+ ((88888L, emittingText))).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getString(4))).toSet
    assert(got === expect) // replay deduped; duplicate-text doc 88888 present
    assert(got.map(_._1).contains(88888L))
    assert(got.nonEmpty)
  }

  test("streaming duplicated spans: a full replay reaches exact batch token-coverage parity") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(150)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, Long, String)]
    val t0 = 1700000000L
    // Pass 1 split across two micro-batches (cross-batch shingle state),
    // then a FULL replay: the prefix view converges to the batch rule
    // (shingle carried by >= 2 distinct docs) once every doc has seen
    // every other doc's shingles.
    stream.addData(docs.take(75).map { case (id, tx) => (id, t0, tx) }.toSeq)
    stream.addData(docs.drop(75).map { case (id, tx) => (id, t0 + 1, tx) }.toSeq)
    stream.addData(docs.map { case (id, tx) => (id, t0 + 2, tx) }.toSeq)
    val q = EventStream.dupSpanStream(stream.toDF().toDF("docId", "tsSec", "text"))
      .writeStream.format("memory").queryName("dupspanstream").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    // Emissions accumulate across passes; pass-1 hits are a subset of
    // the replay's, so the DISTINCT hit set is the converged view.
    val got = spark.table("dupspanstream")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // Batch rule on the same corpus: positions whose 8-gram occurs in
    // >= 2 distinct docs.
    val toks = split(col("text"), " ")
    val p = docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), toks.as("toks")).filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(sequence(lit(0), size(col("toks")) - 8)).as("i"), col("toks"))
      .select(col("doc_id"), col("i").cast("int").as("i"),
        array_join(slice(col("toks"), col("i") + 1, lit(8)), " ").as("shingle"))
    val dup = p.groupBy(col("shingle")).agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("shingle"))
    val expect = p.join(dup, Seq("shingle"), "left_semi")
      .select(col("doc_id"), col("i")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
    // and the hit coverage rolls up to curate_dedup_spans' token counts
    // for these docs (span union = distinct covered token indices)
    val coverage = got.toSeq.flatMap { case (d, i) => (i to i + 7).map(t => (d, t)) }
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val batch = operators.CurateOps.dedupSpans(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1).toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // restrict to docs whose duplicate partners are inside the 150-doc
    // slice: full-corpus batch counts can only be >= the slice's
    docs.map(_._1).foreach { d =>
      val sliceCov = coverage.getOrElse(d, 0L)
      assert(batch.getOrElse(d, 0L) >= sliceCov,
        s"doc $d: batch coverage ${batch.getOrElse(d, 0L)} < slice coverage $sliceCov")
    }
  }

  test("streaming near-dup detection emits exactly the batch band-collision candidates, replay-idempotent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(120)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, Long, String)]
    val t0 = 1700000000L
    // Two micro-batches split the corpus, so cross-batch pairs exercise
    // the bucket state; the second batch also replays batch 1's first
    // doc verbatim — a resident id must emit nothing new.
    stream.addData(docs.take(60).map { case (id, tx) => (id, t0, tx) }.toSeq)
    stream.addData(docs.drop(60).map { case (id, tx) => (id, t0 + 60, tx) }.toSeq
      :+ ((docs.head._1, t0 + 60, docs.head._2)))
    val q = EventStream.nearDupStream(stream.toDF().toDF("docId", "tsSec", "text"))
      .writeStream.format("memory").queryName("neardupstream").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardupstream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Batch candidate stage over the same corpus: distinct band-bucket
    // collisions (the pre-verification pair set of minHashLsh).
    val bands = operators.DedupOps.bandSignaturesOf(docs.toSeq.toDF("doc_id", "text"))
    val expect = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
    // The verified batch near-dup pairs are a subset of the stream's
    // candidates (recall contract: the stream misses nothing batch LSH
    // would surface for this corpus).
    val verified = operators.DedupOps.minHashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => docs.exists(_._1 == a) && docs.exists(_._1 == b) }.toSet
    assert(verified.subsetOf(got))
    assert(got.nonEmpty)
  }

  test("streaming SemDeDup is greedy-exact vs batch pairs, conservative vs batch components, replay-idempotent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Batch ground truth over the SAME persisted quantizer: within-cell
    // τ-pairs and their min-label component resolution (the registered
    // curate_semdedup machinery).
    val a = operators.VectorOps.cellAssignments(spark, sf)
      .select(col("vec_id"), col("v"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
    val assigns = a.sortBy(_._1)
    val lhs = operators.VectorOps.cellAssignments(spark, sf)
      .select(col("cell"), col("vec_id").as("d1"), col("v").as("v1"))
    val rhs = operators.VectorOps.cellAssignments(spark, sf)
      .select(col("cell"), col("vec_id").as("d2"), col("v").as("v2"))
    val pairRows = lhs.join(rhs, Seq("cell")).filter(col("d1") < col("d2"))
      .filter(round(operators.VectorOps.cosine(col("v1"), col("v2")), 4) >= 0.4)
      .select(col("d1"), col("d2"))
    val pairs = pairRows.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchDropped = operators.DedupOps.minLabelComponents(pairRows.toDF("d1", "d2"))
      .filter(col("id") =!= col("rep")).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    // Driver-side greedy replay from the pair set alone (every cell is
    // under the resident cap at this sf, so greedy is fully determined
    // by id order): kept(id) unless a kept smaller id is a τ-pair.
    val expectKept = scala.collection.mutable.Set.empty[Long]
    assigns.map(_._1).foreach { id =>
      if (!expectKept.exists(k => pairs((math.min(k, id), math.max(k, id))))) expectKept += id
    }

    val stream = MemoryStream[(Long, Seq[Double])]
    val half = assigns.length / 2
    // id-ordered arrivals across two micro-batches (the containment
    // contract's ordering), then a replay batch of one kept + one
    // dropped id.
    stream.addData(assigns.take(half).map(t => (t._1, t._2)).toSeq)
    stream.addData(assigns.drop(half).map(t => (t._1, t._2)).toSeq)
    val q = streaming.EventStream.semDedupStream(
        stream.toDF().toDF("vecId", "v"),
        operators.VectorOps.trainedQuantizer(spark, sf))
      .writeStream.format("memory").queryName("semdedupstream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val first = spark.table("semdedupstream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getLong(3)))
    val streamKept = first.filter(_._3).map(_._1).toSet
    val streamDropped = first.filterNot(_._3).map(_._1).toSet

    // one decision per id, cells match the batch assignment
    assert(first.length === assigns.length)
    assert(first.map(t => t._1 -> t._2).toMap === assigns.map(t => t._1 -> t._3).toMap)
    // greedy-exact vs the batch pair set
    assert(streamKept === expectKept.toSet)
    // conservative vs the batch component resolution
    assert(streamDropped.subsetOf(batchDropped))
    assert((assigns.map(_._1).toSet -- batchDropped).subsetOf(streamKept))
    // every drop names a smaller kept τ-neighbor
    first.filterNot(_._3).foreach { case (id, _, _, m) =>
      assert(m < id && streamKept(m) && pairs((m, id)))
    }
    // the corpus actually exercises the drop path
    assert(streamDropped.nonEmpty === batchDropped.nonEmpty)

    val replayIds = (streamKept.take(1) ++ streamDropped.take(1)).toSeq
    stream.addData(assigns.filter(t => replayIds.contains(t._1)).map(t => (t._1, t._2)).toSeq)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("semdedupstream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getLong(3)))
    // replayed ids re-emit their ORIGINAL verdict, nothing else changes
    assert(all.length === first.length + replayIds.length)
    replayIds.foreach { id =>
      assert(all.filter(_._1 == id).map(t => (t._2, t._3, t._4)).distinct.length === 1)
    }
  }

  test("streaming decontamination emits exactly the batch verdicts, replay re-derives them") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.graft.SketchExpressions
    val docs = Tables.load(spark, sf, "documents")
    // static eval side, built once: exact shingle set + its Bloom
    val evalSh = operators.CurateOps.shingles8(docs.filter(col("source") === "src0"))
      .select(col("shingle")).distinct().localCheckpoint(true)
    val nEval = evalSh.count()
    val bloom = evalSh
      .agg(SketchExpressions.bloomAgg(xxhash64(col("shingle")), nEval, nEval * 16))
      .collect()(0).getAs[Array[Byte]](0)
    val train = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val stream = MemoryStream[(Long, String)]
    stream.addData(train.take(train.length / 2).toSeq)
    stream.addData(train.drop(train.length / 2).toSeq)
    val q = EventStream.decontaminateStream(
        stream.toDF().toDF("docId", "text"), evalSh, bloom)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val first = spark.table("decon_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = operators.CurateOps.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first.toSet === expect)
    assert(first.length === expect.size) // one verdict per contaminated doc
    assert(expect.nonEmpty)
    // replay one contaminated doc: the identical verdict re-derives
    val rid = first.head._1
    stream.addData(train.filter(_._1 == rid).toSeq)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("decon_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length === first.length + 1)
    assert(all.filter(_._1 == rid).toSet.size === 1) // same (doc, count) both times
  }

  test("streaming IVF index maintenance: arrivals land in their cells, replay-idempotent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_vstream").toString
    val store = sources.VectorStore(spark, root)
    val base = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"),
        col("label").cast("string").as("label"))
    store.createCollection("chunks", base.filter(col("vec_id") < 40))
    store.createVectorIndex("chunks")
    // a twin collection holding what the final state should be, un-indexed
    // (search on it is exact brute force — the parity oracle)
    store.createCollection("oracle", base.filter(col("vec_id") < 60))

    val arrivals = base.filter(col("vec_id") >= 40 && col("vec_id") < 60)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, Seq[Double], String)]
    val q = EventStream.indexStream(
      stream.toDS().toDF("vec_id", "embedding", "label"), store, "chunks")
    stream.addData(arrivals)
    q.processAllAvailable()
    stream.addData(arrivals.take(10)) // replayed micro-batch
    q.processAllAvailable()
    q.stop()

    // replays deduped in both the collection and the cell layout
    assert(store.collection("chunks").count() === 60L)
    assert(spark.read.parquet(s"$root/chunks__index/cells").count() === 60L)
    // full-probe indexed search over the streamed state ≡ exact brute
    // force over the final collection (the nprobe ≥ cells reduction)
    val qv = base.filter(col("vec_id") === 55).head().getSeq[Double](1).toArray
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cosine")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows(store.search("chunks", qv, 5, nprobe = 99)) ===
      rows(store.search("oracle", qv, 5)))
    store.prune()
  }

  test("stateful sessionization emits exactly the batch-closed sessions") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(loadEvents())
    val q = EventStream.sessionize(stream.toDS(), flushOnTimeout = false)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toSet
    // Batch result; the stream never times out in-test, so open (= last
    // per user) sessions stay in state — closed sessions must match 1:1.
    val batch = EventOps.sessionize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closed = batch.filterNot(s => lastPerUser(s._1) == s._2).toSet
    assert(got === closed)
    assert(closed.nonEmpty)
  }

  test("streaming event surface is identical across both parquet timestamp encodings") {
    // Round 7's MemoryStream twins stayed green while every parquet-
    // reading leg died on a timestamp-precision change — pin the
    // parquet→stream path itself against BOTH encodings the generator
    // has shipped (nanos-as-long and native micros).
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def drive(dir: String, name: String): (Set[Any], Set[String]) = {
      val evs = Tables.loadEvents(spark, dir)
        .select(col("event_id"), col("ts_sec"), col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)]
        .collect().map(e => Event(e._1, e._2, e._3, e._4, e._5)).toSeq
      val stream = MemoryStream[Event]
      stream.addData(evs)
      val q = EventStream.windowedAgg(stream.toDF())
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Complete()).start()
      q.processAllAvailable()
      q.stop()
      val agg = spark.table(name)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)): Any).toSet
      // the partitioned sink leg: same day layout from either encoding
      val out = java.nio.file.Files.createTempDirectory(s"graft_enc_$name").toString
      EventOps.writePartitionedByDay(Tables.loadEvents(spark, dir), out)
      val days = spark.read.parquet(out).select(col("event_date").cast("string"))
        .distinct().collect().map(_.getString(0)).toSet
      (agg, days)
    }
    val (aggN, daysN) = drive(EventFixtures.writeNanosFixture(), "enc_nanos")
    val (aggM, daysM) = drive(EventFixtures.writeMicrosFixture(), "enc_micros")
    assert(aggN.nonEmpty && daysN.nonEmpty)
    assert(aggN === aggM)
    assert(daysN === daysM)
  }

  test("semDedupStream survives a NaN-poisoned vector (cos4 NaN passthrough, like batch round)") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = operators.VectorOps.trainedQuantizer(spark, sf)
    val dim = cents.head.length
    val stream = MemoryStream[(Long, Seq[Double])]
    stream.addData(Seq(
      (1L, Seq.fill(dim)(0.5)),
      (2L, Seq.tabulate(dim)(i => if (i == 0) Double.NaN else 0.5)),
      (3L, Seq.fill(dim)(0.5))))
    val q = EventStream.semDedupStream(stream.toDF().toDF("vecId", "v"), cents)
      .writeStream.format("memory").queryName("semdedup_nan")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("semdedup_nan").collect()
    // every arrival is decided — one poisoned vector must not kill the
    // stream (BigDecimal(NaN) in the rounding path used to throw inside
    // flatMapGroupsWithState)
    assert(rows.length === 3)
    // NaN cosines compare false against tau → the poisoned vector keeps
    assert(rows.find(_.getLong(0) == 2L).exists(_.getBoolean(2)))
  }

  test("streaming HLL sketch state equals the batch sketch (replays absorbed by register max)") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = EventStream.sketchStream(stream.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("sksink")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(docs.take(docs.length / 2))
    q.processAllAvailable()
    stream.addData(docs.drop(docs.length / 2))
    q.processAllAvailable()
    stream.addData(docs.take(20)) // replay: a register can never move down
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sksink")
      .select(col("source"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.load(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("w"), 12)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect) // identical register state — the mergeability contract
    assert(got.keySet === Set("src0", "src1"))
  }

  test("streaming CDC migration equals the batch increment projection, replay-idempotent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.{PropertyGraph, RelationalMigration}

    // already-migrated parent key projection (the static side of the
    // CDC FK joins): customers 1 and 2 exist, 7 does not
    val parentKeys = Seq("1", "2").toDF("fkv")
    val fks = Seq(("o_custkey", "customer", parentKeys))
    def emptyGraph = PropertyGraph(
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))

    var g = emptyGraph
    val stream = MemoryStream[(Long, Long, Long, String)]
    val q = EventStream.migrateStream(
      stream.toDF().toDF("tsSec", "o_orderkey", "o_custkey", "o_orderstatus"),
      "orders", "o_orderkey", fks,
      (n, e) => { g = g.mergeNodes(n).mergeEdges(e) })
    stream.addData(Seq((1000L, 10L, 1L, "O"), (1000L, 11L, 2L, "F"), (1000L, 12L, 7L, "O")))
    q.processAllAvailable()
    // micro-batch 2: one row replayed verbatim (dropped by the stateful
    // (pk, content_hash) dedup) + one new row sharing a status value
    // with batch 1 (cross-batch ColumnValue convergence under merge)
    stream.addData(Seq((1000L, 10L, 1L, "O"), (1000L, 13L, 1L, "F")))
    q.processAllAvailable()
    q.stop()

    def nodeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getMap[String, String](3).toMap)).toSet
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    // batch parity: the accumulated graph IS the batch increment
    // projection over the distinct rows, merged once
    val staticRows = Seq((10L, 1L, "O"), (11L, 2L, "F"), (12L, 7L, "O"), (13L, 1L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val (en, ee) = RelationalMigration.tablePart(staticRows, "orders", "o_orderkey", fks)
    val expected = emptyGraph.mergeNodes(en).mergeEdges(ee)
    assert(nodeSet(g.nodes) === nodeSet(expected.nodes))
    assert(edgeSet(g.edges) === edgeSet(expected.edges))

    // replay deduped: exactly the 4 distinct rows became TableRow nodes
    assert(g.nodes.filter(col("ntype") === "TableRow").count() === 4L)
    // cross-batch value sharing: orders 11 (batch 1) and 13 (batch 2)
    // converge on ONE shared ColumnValue node
    assert(g.nodes.filter(col("id") === "colval:orders:o_orderstatus:F").count() === 1L)
    // FK edges exist exactly for rows whose parent is migrated (not 12)
    val fkSrcs = g.edges.filter(col("rel") === "o_custkey")
      .select(col("src")).collect().map(_.getString(0)).toSet
    assert(fkSrcs === Set("tablerow:orders:10", "tablerow:orders:11", "tablerow:orders:13"))
  }

  test("CDC update/delete contract: prop rewrite, child-edge preservation, delete+reinsert heal, stale replay") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.PropertyGraph

    // self-referential table: fk points at this table's own pk domain
    val fks = Seq(("fk", "t", Seq.empty[String].toDF("fkv")))
    def emptyGraph = PropertyGraph(
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))
    var g = emptyGraph
    val stream = MemoryStream[(String, Long, Long, Long, String)]
    val q = EventStream.migrateCdcStream(
      stream.toDF().toDF("op", "seq", "pk", "fk", "v"), "t", "pk", fks,
      f => { g = f(g).compact })
    def rowProps(k: Long) = {
      val r = g.nodes.filter(col("id") === s"tablerow:t:$k").head()
      r.getMap[String, String](r.fieldIndex("props")).toMap
    }
    def fkEdges() = g.edges.filter(col("rel") === "fk")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

    // batch 1: child 2 arrives BEFORE its parent 1 (fk dangling for now)
    stream.addData(Seq(("I", 1L, 2L, 1L, "a")))
    q.processAllAvailable()
    assert(fkEdges() === Set.empty)
    // batch 2: parent 1 lands → the pending buffer heals the child edge
    stream.addData(Seq(("I", 2L, 1L, 1L, "b"))) // parent 1 (self-fk 1→1)
    q.processAllAvailable()
    assert(fkEdges() === Set(("tablerow:t:2", "tablerow:t:1"), ("tablerow:t:1", "tablerow:t:1")))
    // batch 3: UPDATE parent 1 — prop bag rewritten, incoming child edge survives,
    // the old ColumnValue "b" (now unreferenced) is swept
    stream.addData(Seq(("U", 3L, 1L, 1L, "c")))
    q.processAllAvailable()
    assert(rowProps(1L)("v") === "c")
    assert(fkEdges().contains(("tablerow:t:2", "tablerow:t:1")))
    assert(g.nodes.filter(col("id") === "colval:t:v:b").count() === 0L)
    // an OUT-OF-BAND incoming edge (mutation-API shape) carrying props —
    // the delete must park it WITH its bag, and the heal restore it intact
    g = g.mergeEdges(Seq(("extra:9", "tablerow:t:1", "likes"))
      .toDF("src", "dst", "rel").withColumn("props", map(lit("w"), lit("0.7"))))
    // batch 4: DELETE parent 1 — row gone, incoming child edge dropped
    stream.addData(Seq(("D", 4L, 1L, 0L, null)))
    q.processAllAvailable()
    assert(g.nodes.filter(col("id") === "tablerow:t:1").count() === 0L)
    assert(fkEdges() === Set.empty)
    assert(g.edges.filter(col("rel") === "likes").count() === 0L)
    // batch 5: a STALE replay of the update (seq 3 < applied 4) must not resurrect
    stream.addData(Seq(("U", 3L, 1L, 1L, "c")))
    q.processAllAvailable()
    assert(g.nodes.filter(col("id") === "tablerow:t:1").count() === 0L)
    // batch 6: re-INSERT parent 1 — the orphaned child edge heals back
    stream.addData(Seq(("I", 5L, 1L, 1L, "d")))
    q.processAllAvailable()
    assert(rowProps(1L)("v") === "d")
    assert(fkEdges() === Set(("tablerow:t:2", "tablerow:t:1"), ("tablerow:t:1", "tablerow:t:1")))
    // the parked edge returned with its ORIGINAL props, not a stripped bag
    val healed = g.edges.filter(col("rel") === "likes").head()
    assert(healed.getString(0) === "extra:9")
    assert(healed.getMap[String, String](healed.fieldIndex("props")).toMap === Map("w" -> "0.7"))
    q.stop()
  }
}
