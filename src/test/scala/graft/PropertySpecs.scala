package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** Property-style checks (plain scalacheck Gen sampling — the
  * scalatest/scalacheck bridge artifact isn't on the classpath). */
class PropertySpecs extends SparkSpecBase {

  private val rng = new scala.util.Random(1234)

  test("randomized var-length chain expansion equals a driver-side BFS reference") {
    // The chain family was rewired onto per-graph stored hop views with
    // a claimed hash layout (r15): this pins the SEMANTICS of the whole
    // surface — fwd/rev/undirected orientation, rel-subset filters,
    // hop bounds 1..3, pair-per-level multiplicity, and shortestPath's
    // min-depth collapse (min over ALL reached pairs, terminal type
    // filter applied after) — against an independent driver-side
    // reference on random graphs.
    import graft.graph.{CypherLite, PropertyGraph}
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 8) {
      val nNodes = 12 + rnd.nextInt(9)
      val nodes = (1 to nNodes).map(i =>
        (s"n:$i", if (rnd.nextBoolean()) "t1" else "t2", s"name$i"))
      val nEdges = 15 + rnd.nextInt(20)
      val edges = (1 to nEdges).map { _ =>
        (s"n:${1 + rnd.nextInt(nNodes)}", s"n:${1 + rnd.nextInt(nNodes)}",
          if (rnd.nextBoolean()) "r1" else "r2")
      }.distinct
      val g = PropertyGraph(nodes.toDF("id", "ntype", "name"),
        edges.toDF("src", "dst", "rel"))
      val hi = 1 + rnd.nextInt(3)
      val dirSym = rnd.nextInt(3) // 0 fwd, 1 rev, 2 undir
      val relSubset = if (rnd.nextBoolean()) Seq("r1") else Seq("r1", "r2")
      val shortest = rnd.nextBoolean()
      val relPart = s"[:${relSubset.mkString("|")}*1..$hi]"
      val arrow = dirSym match {
        case 0 => s"-$relPart->"; case 1 => s"<-$relPart-"; case _ => s"-$relPart-"
      }
      val inner = s"(x:t1)$arrow(y:t2)"
      val q = (if (shortest) s"MATCH p = shortestPath($inner) " else s"MATCH p = $inner ") +
        "RETURN x.id AS src, y.id AS dst, length(p) AS len"
      val got = CypherLite.run(g, q).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

      val orient: Set[(String, String)] = edges
        .filter(e => relSubset.contains(e._3))
        .flatMap { case (s, d, _) => dirSym match {
          case 0 => Seq((s, d)); case 1 => Seq((d, s)); case _ => Seq((s, d), (d, s))
        } }.toSet
      val t1 = nodes.filter(_._2 == "t1").map(_._1).toSet
      val t2 = nodes.filter(_._2 == "t2").map(_._1).toSet
      // pairs reachable in EXACTLY k hops (pair-per-level semantics)
      var levels = Map.empty[Int, Set[(String, String)]]
      var cur: Set[(String, String)] =
        t1.flatMap(s => orient.collect { case (`s`, d) => (s, d) })
      levels += 1 -> cur
      for (k <- 2 to hi) {
        cur = cur.flatMap { case (s, m) => orient.collect { case (`m`, d) => (s, d) } }
        levels += k -> cur
      }
      val expect: Set[(String, String, Long)] =
        if (shortest)
          (1 to hi).flatMap(k => levels(k).map(p => (p, k))).groupBy(_._1)
            .map { case (p, xs) => (p._1, p._2, xs.map(_._2).min.toLong) }
            .filter(t => t2.contains(t._2)).toSet
        else
          (1 to hi).flatMap(k => levels(k).filter(p => t2.contains(p._2))
            .map(p => (p._1, p._2, k.toLong))).toSet
      assert(got === expect, s"trial $trial: $q over ${edges.size} edges")
    }
  }

  test("SessionDirCache rebuilds when the corpus stamp changes, not otherwise") {
    var stampVal = "s1"
    var builds = 0
    val cache = new graft.graph.SessionDirCache[Int](
      (_, _) => { builds += 1; builds }, stamp = (_, _) => stampVal)
    assert(cache(spark, "d") === 1 && cache(spark, "d") === 1 && builds === 1)
    stampVal = "s2" // corpus changed (e.g. an ingest appended a file)
    assert(cache(spark, "d") === 2 && builds === 2)
    assert(cache(spark, "d") === 2 && builds === 2) // stable again
  }

  test("SessionDirCache unpersists a replaced persisted-DataFrame artifact") {
    import TestSpark.spark.implicits._
    var stampVal = "s1"
    val built = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val cache = new graft.graph.SessionDirCache[org.apache.spark.sql.DataFrame](
      (_, _) => {
        val df = Seq(built.length).toDF("x").persist()
        df.count() // materialize so the CacheManager entry exists
        built += df
        df
      }, stamp = (_, _) => stampVal)
    cache(spark, "d")
    assert(built.head.storageLevel.useMemory)
    stampVal = "s2" // ingest rewrote the corpus — artifact must rebuild
    cache(spark, "d")
    assert(built.length === 2)
    // the superseded artifact must not linger in the CacheManager
    assert(built.head.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(built(1).storageLevel.useMemory)
    built(1).unpersist()
  }

  test("graph-side artifacts rebuild when an input table is rewritten") {
    import java.nio.file.{Files, Path, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val tmp = Files.createTempDirectory("graft_stamp").toString
    for (t <- graft.graph.SessionDirCache.graphTables ++ Seq("documents", "embeddings", "events"))
      Files.copy(Path.of(s"$sf/$t.parquet"), Path.of(s"$tmp/$t.parquet"))
    val g1 = graft.graph.TpchGraph(spark, tmp)
    val t1 = operators.Retrievers.renderedTriplets(spark, tmp)
    // stable while the corpus is untouched — same cached instances
    assert(graft.graph.TpchGraph(spark, tmp) eq g1)
    assert(operators.Retrievers.renderedTriplets(spark, tmp) eq t1)
    // an ingest rewrites one input table (new mtime → new stamp)
    Files.copy(Path.of(s"$sf/nation.parquet"), Path.of(s"$tmp/nation.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(Path.of(s"$tmp/nation.parquet"),
      FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val g2 = graft.graph.TpchGraph(spark, tmp)
    assert(!(g2 eq g1), "projection must rebuild after the corpus rewrite")
    assert(!(operators.Retrievers.renderedTriplets(spark, tmp) eq t1),
      "rendered-triplet artifact must rebuild with the projection")
    // the superseded projection's persisted blocks were released
    assert(g1.nodes.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("cosine is symmetric and bounded on random vectors") {
    import TestSpark.spark.implicits._
    val cases = Seq.fill(20)((
      Array.fill(16)(rng.nextDouble() * 20 - 10),
      Array.fill(16)(rng.nextDouble() * 20 - 10)))
    val df = cases.toDF("a", "b").select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("b"), col("a")).as("ba"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("chunk count is ceil(words/64) for arbitrary word counts") {
    import TestSpark.spark.implicits._
    val ns = Seq(1, 2, 63, 64, 65, 127, 128, 129, 200, 300) ++ Seq.fill(10)(rng.nextInt(300) + 1)
    val df = ns.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val counts = df
      .select(col("doc_id"),
        explode(sequence(lit(0), ceil(size(toks) / lit(64.0)).cast("int") - 1)).as("i"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.zipWithIndex.foreach { case (n, i) =>
      assert(counts(i.toLong) === ((n + 63) / 64).toLong, s"words=$n")
    }
  }

  test("streaming SemDeDup invariants hold on random clustered embeddings") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = 8
    val centers = Array.fill(4)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
    val vecs: Seq[(Long, Seq[Double])] = (0L until 160L).map { i =>
      val c = centers(rng.nextInt(4))
      (i, c.toSeq.map(x => x + rng.nextGaussian() * 0.05))
    }
    val tau = 0.99
    // Batch ground truth through the PRODUCTION expressions (bestCell +
    // Spark round(cosine, 4)) — any rounding divergence between the
    // stream's scala-side normalized dot and the batch Column math
    // shows up here, on vectors the testdata never planted.
    val df = vecs.toDF("vecId", "v")
      .withColumn("cell", VectorOps.bestCell(col("v"), centers).getField("cell"))
    val l = df.select(col("cell"), col("vecId").as("d1"), col("v").as("v1"))
    val r = df.select(col("cell"), col("vecId").as("d2"), col("v").as("v2"))
    val pairs = l.join(r, Seq("cell")).filter(col("d1") < col("d2"))
      .filter(round(VectorOps.cosine(col("v1"), col("v2")), 4) >= tau)
      .select(col("d1"), col("d2"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    val batchDropped: Set[Long] =
      if (pairs.isEmpty) Set.empty
      else operators.DedupOps.minLabelComponents(pairs.toSeq.toDF("d1", "d2"))
        .filter(col("id") =!= col("rep")).select(col("id"))
        .collect().map(_.getLong(0)).toSet
    // Driver-side greedy reference (under the resident cap, greedy is
    // fully determined by id order and the pair set alone).
    val expectKept = scala.collection.mutable.Set.empty[Long]
    vecs.map(_._1).foreach { id =>
      if (!expectKept.exists(kid => pairs((math.min(kid, id), math.max(kid, id)))))
        expectKept += id
    }

    val stream = MemoryStream[(Long, Seq[Double])]
    // random micro-batch boundaries, id order preserved across batches
    val cut1 = 40 + rng.nextInt(40); val cut2 = cut1 + 20 + rng.nextInt(40)
    stream.addData(vecs.take(cut1))
    stream.addData(vecs.slice(cut1, cut2))
    stream.addData(vecs.drop(cut2))
    val q = streaming.EventStream.semDedupStream(
        stream.toDF().toDF("vecId", "v"), centers, tau)
      .writeStream.format("memory").queryName("semdedup_prop")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semdedup_prop").collect()
      .map(rw => (rw.getLong(0), rw.getBoolean(2), rw.getLong(3)))
    val streamKept = got.filter(_._2).map(_._1).toSet
    val streamDropped = got.filterNot(_._2).map(_._1).toSet
    assert(got.length === vecs.length)
    assert(streamKept === expectKept.toSet)
    assert(streamDropped.subsetOf(batchDropped))
    assert((vecs.map(_._1).toSet -- batchDropped).subsetOf(streamKept))
    got.filterNot(_._2).foreach { case (id, _, m) =>
      assert(m < id && streamKept(m) && pairs((m, id)))
    }
    // clustered corpus must exercise both classes
    assert(streamDropped.nonEmpty && streamKept.nonEmpty)
  }

  test("bloom decontamination equals the exact path on random corpora with planted leaks") {
    import TestSpark.spark.implicits._
    val vocab = Array.tabulate(50)(i => s"w$i")
    def doc(len: Int): String = Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val evalDocs = (0L until 20L).map(i => (i, doc(12 + rng.nextInt(20)), "src0"))
    val trainDocs = (100L until 160L).map { i =>
      val base = doc(rng.nextInt(40)) // includes docs under 8 tokens
      // plant an eval 8-gram span into roughly a third of the train docs
      val planted = if (rng.nextInt(3) == 0) {
        val src = evalDocs(rng.nextInt(evalDocs.length))._2.split(" ")
        val off = rng.nextInt(math.max(1, src.length - 8))
        base + " " + src.slice(off, off + 8).mkString(" ")
      } else base
      (i, planted, s"src${1 + rng.nextInt(2)}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomprop").toString
    (evalDocs ++ trainDocs).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = operators.CurateOps.decontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = operators.CurateOps.decontaminateBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom === exact)
    assert(exact.nonEmpty) // the planted spans must surface
  }

  test("incremental add admits exactly the unseen documents") {
    import TestSpark.spark.implicits._
    val existing = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val incoming = Seq((3L, "alpha beta"), (4L, "delta"), (5L, "gamma")).toDF("doc_id", "text")
    val admitted = Pipeline.addIncrement(existing, incoming)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(admitted === Set(4L))
  }

  test("streaming CDC migration equals batch tablePart on a random table with random replays") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.{PropertyGraph, RelationalMigration}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // random table: unique pks, fk domain larger than the migrated
    // parent set (dangling FKs must be suppressed), values drawn from a
    // tiny vocab so ColumnValue nodes SHARE across rows and batches
    val rows = (0 until 30).map(i =>
      (i.toLong, rng.nextInt(10).toLong, s"v${rng.nextInt(5)}"))
    val parentKeys = (0 until 7).map(_.toString).toDF("fkv")
    val fks = Seq(("fk", "parent", parentKeys))
    def emptyGraph = PropertyGraph(
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))

    // three random micro-batches partitioning the rows + one pure-replay batch
    val shuffled = rng.shuffle(rows)
    val batches = Seq(shuffled.take(10), shuffled.slice(10, 20), shuffled.drop(20),
      rng.shuffle(rows).take(12))
    var g = emptyGraph
    val stream = MemoryStream[(Long, Long, Long, String)]
    val q = graft.streaming.EventStream.migrateStream(
      stream.toDF().toDF("tsSec", "pk", "fk", "v"), "t", "pk", fks,
      (n, e) => { g = g.mergeNodes(n).mergeEdges(e) })
    batches.foreach { b =>
      stream.addData(b.map(r => (100L, r._1, r._2, r._3)))
      q.processAllAvailable()
    }
    q.stop()

    val (en, ee) = RelationalMigration.tablePart(
      rows.toDF("pk", "fk", "v"), "t", "pk", fks)
    val expected = emptyGraph.mergeNodes(en).mergeEdges(ee)
    def nodeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getMap[String, String](3).toMap)).toSet
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nodeSet(g.nodes) === nodeSet(expected.nodes))
    assert(edgeSet(g.edges) === edgeSet(expected.edges))
    // replay batch landed nothing new; dangling FKs suppressed
    assert(g.nodes.filter(col("ntype") === "TableRow").count() === 30L)
    val fkEdges = g.edges.filter(col("rel") === "fk").count()
    assert(fkEdges === rows.count(_._2 < 7).toLong)
  }

  test("CDC migration with updates/deletes/replays converges to the batch migration of the final state") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.{PropertyGraph, RelationalMigration}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // SELF-REFERENTIAL table (fk → its own pk domain): parent truth is
    // the live row-node set, so the script naturally produces every
    // hard case — child-before-parent arrival, FK edges orphaned by a
    // parent DELETE and healed by its re-insert, dangling fks that
    // never resolve, updates that re-point a child's fk.
    val nPk = 14
    var seqNo = 0L
    // model: pk → latest row image (None = deleted); ops applied in seq order
    val model = scala.collection.mutable.Map.empty[Long, Option[(Long, String)]]
    def op(o: String, k: Long, fk: Long, v: String): (String, Long, Long, Long, String) = {
      seqNo += 1
      model(k) = if (o == "D") None else Some((fk, v))
      (o, seqNo, k, fk, v)
    }
    val script = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, String)]
    // phase 1: inserts in RANDOM pk order (children often precede parents)
    rng.shuffle((0L until nPk).toList).foreach { k =>
      script += op("I", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
    }
    // phase 2: random updates / deletes / re-inserts
    (0 until 3 * nPk).foreach { _ =>
      val k = rng.nextInt(nPk).toLong
      rng.nextInt(3) match {
        case 0 => script += op("U", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
        case 1 => script += op("D", k, 0L, null)
        case 2 => script += op("I", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
      }
    }
    // stale replays sprinkled in AFTER their successors (latest-wins must drop them)
    val replays = rng.shuffle(script.toList).take(script.length / 3)
    val feed = rng.shuffle(script.toList ::: replays)

    // self-FK: empty external parent frame — row-node presence is the truth
    val fks = Seq(("fk", "t", Seq.empty[String].toDF("fkv")))
    def emptyGraph = PropertyGraph(
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))
    var g = emptyGraph
    val stream = MemoryStream[(String, Long, Long, Long, String)]
    val q = graft.streaming.EventStream.migrateCdcStream(
      stream.toDF().toDF("op", "seq", "pk", "fk", "v"), "t", "pk", fks,
      f => { g = f(g).compact })
    feed.grouped(1 + feed.length / 6).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    }
    q.stop()

    // batch migration of the FINAL state, with the final pk set as the
    // parent-key truth (what a batch run over the final table sees)
    val finalRows = model.toSeq.collect { case (k, Some((fk, v))) => (k, fk, v) }.sortBy(_._1)
    assert(finalRows.nonEmpty && finalRows.length < nPk) // script really deleted some
    val finalKeys = finalRows.map(_._1.toString).toDF("fkv")
    val (en, ee) = RelationalMigration.tablePart(
      finalRows.toDF("pk", "fk", "v"), "t", "pk", Seq(("fk", "t", finalKeys)))
    val expected = emptyGraph.mergeNodes(en).mergeEdges(ee)
    def nodeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getMap[String, String](3).toMap)).toSet
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nodeSet(g.nodes) === nodeSet(expected.nodes))
    assert(edgeSet(g.edges) === edgeSet(expected.edges))
    // the orphan sweep left no unreferenced ColumnValue nodes
    val colvalIds = g.nodes.filter(col("ntype") === "ColumnValue").select(col("id"))
    assert(colvalIds.join(g.edges.select(col("dst").as("id")), Seq("id"), "left_anti")
      .count() === 0L)
  }

  test("CDC stream restart: durable pending buffer survives a kill between micro-batches") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.{PropertyGraph, RelationalMigration}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // Same randomized self-FK script as the convergence test above —
    // child-before-parent arrival, deletes orphaning incoming edges,
    // re-inserts healing them — but the stream is KILLED between
    // micro-batches and reopened from its checkpoint: the seq gate
    // recovers from Spark's state store and the pending-FK buffer from
    // the parquet sidecar. Before the fix the buffer was session-local,
    // so a parked heal whose parent only arrives post-restart was lost
    // silently; convergence to the batch migration of the final state
    // now proves the sidecar carries it across.
    val nPk = 14
    var seqNo = 0L
    val model = scala.collection.mutable.Map.empty[Long, Option[(Long, String)]]
    def op(o: String, k: Long, fk: Long, v: String): (String, Long, Long, Long, String) = {
      seqNo += 1
      model(k) = if (o == "D") None else Some((fk, v))
      (o, seqNo, k, fk, v)
    }
    val script = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, String)]
    rng.shuffle((0L until nPk).toList).foreach { k =>
      script += op("I", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
    }
    (0 until 3 * nPk).foreach { _ =>
      val k = rng.nextInt(nPk).toLong
      rng.nextInt(3) match {
        case 0 => script += op("U", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
        case 1 => script += op("D", k, 0L, null)
        case 2 => script += op("I", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
      }
    }
    val replays = rng.shuffle(script.toList).take(script.length / 3)
    val feed = rng.shuffle(script.toList ::: replays)

    val fks = Seq(("fk", "t", Seq.empty[String].toDF("fkv")))
    def emptyGraph = PropertyGraph(
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))
    var g = emptyGraph
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_restart").toString
    val stream = MemoryStream[(String, Long, Long, Long, String)]
    def open() = graft.streaming.EventStream.migrateCdcStream(
      stream.toDF().toDF("op", "seq", "pk", "fk", "v"), "t", "pk", fks,
      f => { g = f(g).compact }, checkpointDir = Some(ckpt))

    val groups = feed.grouped(1 + feed.length / 6).toSeq
    val (before, after) = groups.splitAt(groups.length / 2)
    var q = open()
    before.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop() // the kill, between micro-batches
    // the sidecar must exist and actually be carrying parked heals at
    // the kill point (a trivially-empty buffer would test nothing) —
    // the fixed-seed script parks dangling self-FK children here
    val sidecar = new org.apache.hadoop.fs.Path(ckpt + "/pending/_CURRENT")
    val fsys = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsys.exists(sidecar), "pending sidecar pointer missing at kill point")
    val store = new graft.streaming.EventStream.CdcPendingStore(spark, ckpt + "/pending")
    val parkedAtKill = store.committed.map(store.read(_).count()).getOrElse(0L)
    assert(parkedAtKill > 0L, "script parked nothing before the kill — weaken seed")

    q = open() // reopen from the same checkpoint + sidecar
    after.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()

    val finalRows = model.toSeq.collect { case (k, Some((fk, v))) => (k, fk, v) }.sortBy(_._1)
    assert(finalRows.nonEmpty && finalRows.length < nPk)
    val finalKeys = finalRows.map(_._1.toString).toDF("fkv")
    val (en, ee) = RelationalMigration.tablePart(
      finalRows.toDF("pk", "fk", "v"), "t", "pk", Seq(("fk", "t", finalKeys)))
    val expected = emptyGraph.mergeNodes(en).mergeEdges(ee)
    def nodeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getMap[String, String](3).toMap)).toSet
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nodeSet(g.nodes) === nodeSet(expected.nodes))
    assert(edgeSet(g.edges) === edgeSet(expected.edges))
  }

  test("randomized crash-point sweep: GraphStore save always leaves a loadable complete generation") {
    import TestSpark.spark.implicits._
    import graft.graph.PropertyGraph
    import graft.sources.{FaultPoints, GraphStore}
    // The generation-commit design (fresh gen dir → atomic pointer →
    // GC) was argued window-by-window; this sweep actually DIES at ≥60
    // random steps of save and asserts the recovery contract: load()
    // adopts a COMPLETE generation — the committed one, or the
    // attempted one iff the kill landed after the pointer commit —
    // and never mixes relations across generations.
    val root = java.nio.file.Files.createTempDirectory("graft_gstore_crash").toString
    val store = GraphStore(spark, root)
    def mkGraph(tag: Int) = PropertyGraph(
      PropertyGraph.ensureProps(
        Seq((s"n:$tag", "t", s"g$tag"), ("n:shared", "t", s"g$tag")).toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq((s"n:$tag", "n:shared", "r")).toDF("src", "dst", "rel")))
    def tagOf(g: PropertyGraph): Int =
      g.nodes.filter(col("id") === "n:shared").head().getString(2).drop(1).toInt
    store.save("g", mkGraph(0))
    var committed = 0
    var kills = 0
    var trial = 1
    while (kills < 60 && trial <= 250) {
      val attempted = trial
      val killAt = rng.nextInt(12) + 1 // beyond the step count → op completes
      var n = 0
      try FaultPoints.withHandler { p =>
        n += 1; if (n == killAt) throw new FaultPoints.SimulatedCrash(p)
      } { store.save("g", mkGraph(attempted)) }
      catch { case _: FaultPoints.SimulatedCrash => kills += 1 }
      val loaded = store.load("g")
      val t = tagOf(loaded)
      assert(t == committed || t == attempted,
        s"trial $trial (kill $killAt): loaded g$t, expected g$committed or g$attempted")
      val e = loaded.edges.head()
      assert(e.getString(0) === s"n:$t",
        s"trial $trial: MIXED generation — edge of ${e.getString(0)} under nodes of g$t")
      committed = t
      trial += 1
    }
    assert(kills >= 60, s"sweep exercised only $kills kills in $trial trials")
  }

  test("CDC crash between sidecar commit and epoch commit: the replayed batch rolls back to the predecessor snapshot") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.graph.{PropertyGraph, RelationalMigration}
    import graft.sources.FaultPoints
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // The subtlest window of the durable buffer: foreachBatch committed
    // its sidecar snapshot but the process died before the stream's
    // epoch commit — Spark re-runs the batch, and the replay guard must
    // re-adopt the PREDECESSOR snapshot (pendingBatch >= batchId), not
    // the already-post-batch one, or the batch's pending maintenance
    // runs on double-applied state. Forced for real here: a one-shot
    // FaultPoints handler throws at `cdcpending.commit.done`, killing
    // the query in exactly that window; the reopened stream re-runs the
    // batch and the feed continues to convergence.
    val nPk = 12
    var seqNo = 0L
    val model = scala.collection.mutable.Map.empty[Long, Option[(Long, String)]]
    def op(o: String, k: Long, fk: Long, v: String): (String, Long, Long, Long, String) = {
      seqNo += 1
      model(k) = if (o == "D") None else Some((fk, v))
      (o, seqNo, k, fk, v)
    }
    val script = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, String)]
    rng.shuffle((0L until nPk).toList).foreach { k =>
      script += op("I", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
    }
    (0 until 3 * nPk).foreach { _ =>
      val k = rng.nextInt(nPk).toLong
      rng.nextInt(3) match {
        case 0 => script += op("U", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
        case 1 => script += op("D", k, 0L, null)
        case 2 => script += op("I", k, rng.nextInt(nPk + 4).toLong, s"v${rng.nextInt(4)}")
      }
    }
    val feed = script.toList

    val fks = Seq(("fk", "t", Seq.empty[String].toDF("fkv")))
    def emptyGraph = PropertyGraph(
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("id", "ntype", "name")),
      PropertyGraph.ensureProps(Seq.empty[(String, String, String)].toDF("src", "dst", "rel")))
    var g = emptyGraph
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_epochcrash").toString
    val stream = MemoryStream[(String, Long, Long, Long, String)]
    def open() = graft.streaming.EventStream.migrateCdcStream(
      stream.toDF().toDF("op", "seq", "pk", "fk", "v"), "t", "pk", fks,
      f => { g = f(g).compact }, checkpointDir = Some(ckpt))

    val groups = feed.grouped(1 + feed.length / 5).toSeq
    var q = open()
    groups.take(2).foreach { b => stream.addData(b); q.processAllAvailable() }
    // one-shot kill at the exact window (sidecar committed, epoch not)
    val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
    stream.addData(groups(2))
    try FaultPoints.withHandler { p =>
      if (p == "cdcpending.commit.done" && killed.compareAndSet(false, true))
        throw new FaultPoints.SimulatedCrash(p)
    } { q.processAllAvailable() }
    catch { case _: Exception => () } // the dying query surfaces as a wrapped exception
    assert(killed.get, "the sidecar-committed/epoch-uncommitted window was never reached")
    assert(q.exception.isDefined, "the query should have died in the crash window")

    q = open() // Spark re-runs groups(2); the replay guard must fire
    q.processAllAvailable()
    groups.drop(3).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()

    val finalRows = model.toSeq.collect { case (k, Some((fk, v))) => (k, fk, v) }.sortBy(_._1)
    assert(finalRows.nonEmpty)
    val finalKeys = finalRows.map(_._1.toString).toDF("fkv")
    val (en, ee) = RelationalMigration.tablePart(
      finalRows.toDF("pk", "fk", "v"), "t", "pk", Seq(("fk", "t", finalKeys)))
    val expected = emptyGraph.mergeNodes(en).mergeEdges(ee)
    def nodeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getMap[String, String](3).toMap)).toSet
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nodeSet(g.nodes) === nodeSet(expected.nodes))
    assert(edgeSet(g.edges) === edgeSet(expected.edges))
  }

  test("randomized crash-point sweep: CdcPendingStore commit always recovers a complete snapshot") {
    import TestSpark.spark.implicits._
    import graft.sources.FaultPoints
    // The pending-buffer sidecar shares GraphStore's discipline
    // (snapshot dir → atomic pointer → prune); this sweep kills commit()
    // at random steps and asserts `committed` always names a COMPLETE
    // snapshot whose content is either the prior state or the attempted
    // one — the exact invariant migrateCdcStream's replay guard needs.
    val root = java.nio.file.Files.createTempDirectory("graft_cdcpend_crash").toString
    val store = new graft.streaming.EventStream.CdcPendingStore(spark, root)
    def df(tag: Long) = Seq(("s" + tag, "d" + tag, "r", "t", tag.toString))
      .toDF("src", "dst", "rel", "refTable", "fkv")
      .withColumn("props", map().cast("map<string,string>"))
    def observed(): Option[Long] =
      store.committed.map(id => store.read(id).head().getString(4).toLong)
    store.commit(0L, df(0))
    var committed = 0L
    var kills = 0
    var batch = 1L
    while (kills < 25 && batch <= 120) {
      val killAt = rng.nextInt(6) + 1
      var n = 0
      try FaultPoints.withHandler { p =>
        n += 1; if (n == killAt) throw new FaultPoints.SimulatedCrash(p)
      } { store.commit(batch, df(batch)) }
      catch { case _: FaultPoints.SimulatedCrash => kills += 1 }
      val got = observed()
      assert(got.contains(committed) || got.contains(batch),
        s"batch $batch (kill $killAt): committed snapshot holds $got, " +
          s"expected $committed or $batch")
      committed = got.get
      batch += 1
    }
    assert(kills >= 25, s"sweep exercised only $kills kills in $batch batches")
  }

  test("randomized crash-point sweep: VectorStore replace/delete always leaves a recoverable collection") {
    import TestSpark.spark.implicits._
    import graft.sources.{FaultPoints, VectorStore}
    val root = java.nio.file.Files.createTempDirectory("graft_vstore_crash").toString
    val vs = VectorStore(spark, root)
    def df(tag: Int, ids: Set[Long]) =
      ids.toSeq.sorted.map(i => (i, Array(0.5f), tag)).toDF("vec_id", "embedding", "tag")
    def observe(): (Int, Set[Long]) = {
      val rows = vs.collection("c").collect()
      val tags = rows.map(_.getInt(2)).toSet
      assert(tags.size === 1, s"TORN collection: mixed tags $tags")
      (tags.head, rows.map(_.getLong(0)).toSet)
    }
    vs.createCollection("c", df(0, (0L until 6L).toSet))
    var (cTag, cIds) = (0, (0L until 6L).toSet)
    var kills = 0
    var trial = 1
    while (kills < 40 && trial <= 200) {
      val killAt = rng.nextInt(6) + 1
      var n = 0
      def crashy(body: => Unit): Unit =
        try FaultPoints.withHandler { p =>
          n += 1; if (n == killAt) throw new FaultPoints.SimulatedCrash(p)
        }(body)
        catch { case _: FaultPoints.SimulatedCrash => kills += 1 }
      if (cIds.size < 3 || trial % 2 == 0) {
        // REPLACE with a fresh 6-id set under a new tag
        val aTag = trial
        val aIds = (trial * 100L until trial * 100L + 6L).toSet
        crashy(vs.createCollection("c", df(aTag, aIds)))
        val (t, ids) = observe()
        assert((t, ids) == ((cTag, cIds)) || (t, ids) == ((aTag, aIds)),
          s"trial $trial (kill $killAt): got tag $t ids $ids")
        cTag = t; cIds = ids
      } else {
        // DELETE one random id
        val del = cIds.toSeq(rng.nextInt(cIds.size))
        crashy(vs.deleteDataPoints("c", Seq(del)))
        val (t, ids) = observe()
        assert(t === cTag)
        assert(ids == cIds || ids == cIds - del,
          s"trial $trial (kill $killAt): ids $ids from $cIds minus $del")
        cIds = ids
      }
      trial += 1
    }
    assert(kills >= 40, s"sweep exercised only $kills kills in $trial trials")
  }
}
