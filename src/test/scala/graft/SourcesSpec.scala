package graft

import graft.sources.{BucketedStore, DocumentSource}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpecBase {

  test("bucketed join runs shuffle-free on both sides") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    BucketedStore.write(li, "b_lineitem", "l_orderkey", 4, s"$dir/lineitem")
    BucketedStore.write(o, "b_orders", "o_orderkey", 4, s"$dir/orders")
    // disable broadcast so the plan must choose between shuffle and
    // bucket co-location — the point of the store is the latter
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.read(spark, "b_lineitem")
        .join(BucketedStore.read(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.linesIterator.take(20).mkString("\n"))
      // and the join is still correct
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("dataset inventory partitions the corpus exactly, datasetData slices one source") {
    val inv = operators.DatasetOps.datasets(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
    assert(inv.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val one = inv.head.getAs[String]("dataset")
    val slice = operators.DatasetOps.datasetData(spark, sf, one)
    assert(slice.count() === inv.find(_.getAs[String]("dataset") == one).get.getAs[Long]("n_docs"))
    // the slice filter reaches the parquet scan as a pushed filter
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(source,"))
  }

  test("vector store round-trips the vector_db_interface method set") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vstore").toString
    val store = sources.VectorStore(spark, root)
    assert(!store.hasCollection("chunks"))
    val base = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 40)
    store.createCollection("chunks", base)
    assert(store.hasCollection("chunks") && store.collection("chunks").count() === 40L)
    // append + retrieve
    store.createDataPoints("chunks", Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") >= 40 && col("vec_id") < 50))
    assert(store.collection("chunks").count() === 50L)
    assert(store.retrieve("chunks", Seq(3L, 7L, 999999L)).count() === 2L)
    // search: a stored vector's own embedding is its top hit with cosine 1
    val q = base.filter(col("vec_id") === 5)
      .select(transform(col("embedding"), x => x.cast("double"))).head.getSeq[Double](0).toArray
    val top = store.search("chunks", q, 5).collect()
    assert(top.length === 5 && top.head.getAs[Long]("vec_id") === 5L
      && top.head.getAs[Double]("cosine") === 1.0)
    // results carry the payload columns (ScoredResult shape), not the raw vector
    val cols = store.search("chunks", q, 5).columns.toSet
    assert(cols.contains("label") && !cols.contains("embedding"))
    // batch search partitions per query
    val queries = Seq((0L, q.toSeq)).toDF("query_id", "qv")
    assert(store.batchSearch("chunks", queries, 3).count() === 3L)
    // delete rewrites without the ids
    store.deleteDataPoints("chunks", Seq(5L, 6L))
    assert(store.collection("chunks").count() === 48L)
    assert(store.retrieve("chunks", Seq(5L)).count() === 0L)
    store.prune()
    assert(!store.hasCollection("chunks"))
  }

  test("create_data_points upserts by id: re-ingest is a no-op, stored rows win") {
    val root = java.nio.file.Files.createTempDirectory("graft_vupsert").toString
    val store = sources.VectorStore(spark, root)
    val base = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 20)
    store.createDataPoints("c", base) // creates on first ingest
    assert(store.collection("c").count() === 20L)
    // exact re-ingest: idempotent
    store.createDataPoints("c", base)
    assert(store.collection("c").count() === 20L)
    // overlapping increment: stored rows keep their payload, new ids append
    val sentinel = -777
    val inc = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") >= 10 && col("vec_id") < 30)
      .withColumn("label", lit(sentinel).cast(base.schema("label").dataType))
    store.createDataPoints("c", inc)
    assert(store.collection("c").count() === 30L)
    assert(store.collection("c")
      .filter(col("vec_id") < 20 && col("label") === sentinel).count() === 0L)
    assert(store.collection("c")
      .filter(col("vec_id") >= 20 && col("label") === sentinel).count() === 10L)
    store.prune()
  }

  test("createCollection replace-from-self swaps instead of truncating its own input") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vself").toString
    val store = sources.VectorStore(spark, root)
    store.createCollection("c",
      Seq((1L, Seq(1.0, 0.0), "a"), (2L, Seq(0.0, 1.0), "b")).toDF("vec_id", "embedding", "label"))
    // the replacement plan DERIVES from the collection being replaced —
    // a plain overwrite would delete its own input (or throw) before
    // the lazy plan ran
    store.createCollection("c", store.collection("c").filter(col("vec_id") =!= 1L))
    assert(store.collection("c").collect().map(_.getLong(0)).toSet === Set(2L))
    store.prune()
  }

  test("delete_data_points swaps atomically and leaves no scratch dirs") {
    val root = java.nio.file.Files.createTempDirectory("graft_vdelete").toString
    val store = sources.VectorStore(spark, root)
    store.createCollection("c", Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 25))
    store.deleteDataPoints("c", Seq(1L, 2L, 3L))
    assert(store.collection("c").count() === 22L)
    assert(store.retrieve("c", Seq(1L)).count() === 0L)
    // neither the temp nor the parked directory survives the swap
    val left = new java.io.File(root).list().toSet
    assert(left === Set("c"), s"unexpected scratch dirs: $left")
    store.prune()
  }

  test("vector index: IVF search with nprobe=all equals brute force; pruned scan otherwise") {
    val root = java.nio.file.Files.createTempDirectory("graft_vindex").toString
    val store = sources.VectorStore(spark, root)
    val base = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 60)
    store.createCollection("c", base)
    val q = base.filter(col("vec_id") === 7)
      .select(transform(col("embedding"), x => x.cast("double"))).head.getSeq[Double](0).toArray
    val brute = store.search("c", q, 5).select("vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(!store.hasIndex("c"))
    store.createVectorIndex("c")
    assert(store.hasIndex("c"))
    // nprobe >= cell count probes everything -> identical to brute force
    val all = store.search("c", q, 5, nprobe = 64).select("vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(all === brute)
    // small nprobe: the query vector's own cell is always probed first,
    // so the self-hit at cosine 1.0 must surface
    val ivf = store.search("c", q, 5, nprobe = 1)
    assert(ivf.collect().head.getAs[Long]("vec_id") === 7L)
    // the probed scan prunes partitions at the source (cell=... filter)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
    // index_data_points extends the index without retraining
    val inc = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") >= 60 && col("vec_id") < 70)
    store.createDataPoints("c", inc)
    store.indexDataPoints("c", inc)
    val q2 = inc.filter(col("vec_id") === 65)
      .select(transform(col("embedding"), x => x.cast("double"))).head.getSeq[Double](0).toArray
    assert(store.search("c", q2, 3, nprobe = 1).collect().head.getAs[Long]("vec_id") === 65L)
    store.prune()
  }

  test("delete keeps the IVF index consistent: deleted ids never resurface via indexed search") {
    val root = java.nio.file.Files.createTempDirectory("graft_vdelidx").toString
    val store = sources.VectorStore(spark, root)
    val base = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 60)
    store.createCollection("c", base)
    store.createVectorIndex("c")
    val q = base.filter(col("vec_id") === 7)
      .select(transform(col("embedding"), x => x.cast("double"))).head.getSeq[Double](0).toArray
    // pre-delete: the self-hit surfaces through the index
    assert(store.search("c", q, 5, nprobe = 64).collect().head.getAs[Long]("vec_id") === 7L)
    store.deleteDataPoints("c", Seq(7L, 8L))
    // indexed search (still taking the IVF path) must not see deleted ids
    assert(store.hasIndex("c"))
    val hits = store.search("c", q, 60, nprobe = 64).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(!hits.contains(7L) && !hits.contains(8L))
    // index copy and collection agree on the surviving row count
    assert(spark.read.parquet(s"$root/c__index/cells").count() === store.collection("c").count())
    // no scratch dirs left behind by either swap
    val left = new java.io.File(root).list().toSet
    assert(left === Set("c", "c__index"), s"unexpected scratch dirs: $left")
    store.prune()
  }

  test("degenerate index (no trained centroids) falls back to exact search") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vdegen").toString
    val store = sources.VectorStore(spark, root)
    val base = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 30)
    store.createCollection("c", base)
    store.createVectorIndex("c")
    // wreck the centroid table (schema kept, zero rows) — search and
    // batchSearch must fall back to the exact brute-force path instead
    // of returning an empty shortlist
    val cSchema = spark.read.parquet(s"$root/c__index/centroids").schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cSchema)
      .write.mode("overwrite").parquet(s"$root/c__index/centroids")
    val q = base.filter(col("vec_id") === 3)
      .select(transform(col("embedding"), x => x.cast("double"))).head.getSeq[Double](0).toArray
    assert(store.search("c", q, 5).count() === 5L)
    val queries = Seq((0L, q.toSeq)).toDF("query_id", "qv")
    assert(store.batchSearch("c", queries, 5).count() === 5L)
    store.prune()
  }

  test("indexed batch_search equals brute force at nprobe=all and prunes cell partitions") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vbatchidx").toString
    val store = sources.VectorStore(spark, root)
    val base = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 60)
    store.createCollection("c", base)
    val qs = base.filter(col("vec_id").isin(3L, 11L))
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .toDF("query_id", "qv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = canon(store.batchSearch("c", qs, 5)) // no index yet → brute path
    store.createVectorIndex("c")
    val indexed = store.batchSearch("c", qs, 5, nprobe = 64)
    assert(canon(indexed) === brute)
    // each query's own cell is probed first: self-hits survive small nprobe
    val narrow = canon(store.batchSearch("c", qs, 5, nprobe = 1))
    assert(narrow.contains((3L, 3L, 1.0)) && narrow.contains((11L, 11L, 1.0)))
    // the cell equi-join prunes the partitioned scan (static or dynamic)
    val plan = store.batchSearch("c", qs, 5, nprobe = 1).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(cell"),
      plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
    store.prune()
  }

  test("k-hop over a reloaded bucketed adjacency: exchange-free edge side, same rows") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_adj").toString
    val store = sources.GraphStore(spark, root)
    val g = graph.TpchGraph(spark, sf)
    store.save("g", g) // plain parquet reload = the unbucketed baseline
    store.saveAdjacency("g", g, "b_adj", 4) // matches test shuffle.partitions
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val adj = store.loadAdjacency("b_adj")
      // suppliers reach depth 2 directed: supplier→nation→region
      val seeds = Seq("supplier:1", "supplier:2").toDF("id")
      // the bucketed layout halves the per-hop shuffle: only the frontier
      // exchanges; the unbucketed reload exchanges both sides
      def hopPlan(edges: org.apache.spark.sql.DataFrame) =
        seeds.join(edges, seeds("id") === edges("src"))
          .queryExecution.executedPlan.toString
      val bucketedExchanges = hopPlan(adj).linesIterator.count(_.contains("Exchange"))
      val plainExchanges = hopPlan(store.load("g").edges).linesIterator.count(_.contains("Exchange"))
      assert(bucketedExchanges === 1, s"bucketed side must not exchange:\n${hopPlan(adj).take(1500)}")
      assert(plainExchanges === 2)
      // and the traversal over the reloaded adjacency is row-identical
      // to the same directed traversal over the in-memory edge relation
      val viaStore = graph.GraphAlgos.kHopAdjacency(adj, seeds, 2)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val direct = graph.GraphAlgos.kHopAdjacency(g.edges, seeds, 2)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(viaStore === direct && viaStore.exists(_._2 === 2))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_adj")
      store.deleteGraph("g")
    }
  }

  test("graph store commits mutation plans and round-trips props across sessions") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gstore").toString
    val store = sources.GraphStore(spark, root)
    assert(!store.hasGraph("g") && store.listGraphs().isEmpty)
    // a mutated graph (lazy plans) commits via save
    val g = graph.TpchGraph(spark, sf)
      .addNodes(Seq(("custom:1", "custom", "one", Map("k" -> "v"))).toDF("id", "ntype", "name", "props"))
      .addEdges(Seq(("custom:1", "nation:0", "linked")).toDF("src", "dst", "rel"))
    store.save("g", g)
    assert(store.hasGraph("g") && store.listGraphs() === Seq("g"))
    val back = store.load("g")
    assert(back.nodes.count() === g.nodes.count() && back.edges.count() === g.edges.count())
    // props bags survive the round-trip, both real and added
    assert(back.nodes.filter(col("id") === "custom:1").head()
      .getMap[String, String](3) === Map("k" -> "v"))
    assert(back.edges.filter(col("rel") === "placed_by")
      .filter(element_at(col("props"), "orderdate").isNull).count() === 0L)
    // the reloaded graph is a full PropertyGraph: mutations keep composing
    assert(back.deleteNodes(Seq("custom:1").toDF("id"))
      .edges.filter(col("rel") === "linked").count() === 0L)
    // SELF-OVERWRITE: load → mutate → commit to the SAME name. The
    // mutation plan reads the stored directories lazily; a plain
    // overwrite would delete them before the job ran (the swap
    // discipline this pins). deleteNodes cascades into edges, so the
    // edge plan cross-references the nodes dir too.
    val mutated = back.deleteNodes(Seq("custom:1").toDF("id"))
      .addNodes(Seq(("custom:2", "custom", "two", Map("k2" -> "v2")))
        .toDF("id", "ntype", "name", "props"))
    val (expN, expE) = (mutated.nodes.count(), mutated.edges.count())
    store.save("g", mutated)
    val back2 = store.load("g")
    assert(back2.nodes.count() === expN && back2.edges.count() === expE)
    assert(back2.nodes.filter(col("id") === "custom:2").count() === 1L)
    assert(back2.nodes.filter(col("id") === "custom:1").count() === 0L)
    assert(back2.edges.filter(col("rel") === "linked").count() === 0L)
    store.deleteGraph("g")
    assert(!store.hasGraph("g"))
  }

  test("edge-type census indexes into the vector store and is searchable (index_graph_edges)") {
    // tasks/storage/index_graph_edges.py: count relationship types from
    // the graph, wrap as EdgeType points, index relationship_name in the
    // vector store. The LLM embedder is out of scope — the md5-fold stub
    // embedding is deterministic on both sides, so the search leg is
    // honest: the stored point for a relation is the top-1 hit (cosine 1)
    // for that relation's query embedding.
    val root = java.nio.file.Files.createTempDirectory("graft_etype").toString
    val store = sources.VectorStore(spark, root)
    val census = graph.GraphQueries.edgeTypes(spark, sf)
    val stub = transform(sequence(lit(0), lit(7)), i =>
      conv(substring(md5(col("relationship_name")), i * 2 + 1, lit(2)), 16, 10).cast("double") / 255.0)
    store.createCollection("EdgeType_relationship_name", census
      .withColumn("vec_id", conv(substring(md5(col("relationship_name")), 1, 8), 16, 10).cast("long"))
      .withColumn("embedding", stub)
      .select(col("vec_id"), col("embedding"), col("relationship_name"), col("number_of_edges")))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("located_in".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qEmb = Array.tabulate(8)(i => java.lang.Long.parseLong(md.substring(i * 2, i * 2 + 2), 16) / 255.0)
    val expectedId = java.lang.Long.parseLong(md.substring(0, 8), 16)
    val top = store.search("EdgeType_relationship_name", qEmb, 1).collect()
    assert(top.length === 1)
    assert(top(0).getAs[Long]("vec_id") === expectedId)
    assert(top(0).getAs[Double]("cosine") > 0.9999)
    // the census itself matches the graph's edge relation
    val rels = census.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rels.keySet === Set("in_region", "located_in", "placed_by", "contains", "supplied_by"))
    store.prune()
  }

  test("derived graphs (temporal merge, feedback-weighted) survive the store round-trip") {
    // The reference adapters persist every mutation; here the
    // corpus-derived merges (events→KG via mergeNodes/mergeEdges, the
    // feedback-weighted graph via applyFeedbackWeight) commit through
    // GraphStore.save and answer the same CypherLite queries after a
    // reload — no re-derivation, weights riding the stored props bags.
    val root = java.nio.file.Files.createTempDirectory("graft_gstore_derived").toString
    val store = sources.GraphStore(spark, root)

    val tg = graph.GraphQueries.temporalGraph(spark, sf)
    store.save("temporal", tg)
    val tq = "MATCH (e:event)-[:happened_at]->(d:day) RETURN d.name AS day, count(*) AS n ORDER BY day"
    val liveT = graph.CypherLite.run(tg, tq).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    val backT = graph.CypherLite.run(store.load("temporal"), tq).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(liveT.nonEmpty && backT === liveT)

    val fg = operators.Retrievers.feedbackGraph(spark, sf)
    store.save("feedback", fg)
    val fq = "MATCH (i:interaction)-[r:used_graph_element_to_answer]->(n:nation) " +
      "RETURN n.name AS nation, sum(r.feedback_weight) AS w ORDER BY nation"
    val liveF = graph.CypherLite.run(fg, fq).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toList
    val backF = graph.CypherLite.run(store.load("feedback"), fq).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toList
    assert(liveF.nonEmpty && liveF.exists(_._2 != 0.0) && backF === liveF)

    store.deleteGraph("temporal"); store.deleteGraph("feedback")
    assert(store.listGraphs().isEmpty)
  }

  test("document classification routes extensions to the reference classes") {
    import TestSpark.spark.implicits._
    val got = DocumentSource.classify(
      Seq("a/report.pdf", "b/notes.TXT", "c/photo.jpg", "d/talk.mp3", "e/data.bin",
        "f/noext", "g/raw.cr2", "h/track.aiff")
        .toDF("path"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("a/report.pdf") === "PdfDocument")
    assert(got("b/notes.TXT") === "TextDocument") // case-insensitive
    assert(got("c/photo.jpg") === "ImageDocument")
    assert(got("d/talk.mp3") === "AudioDocument")
    assert(got("e/data.bin") === "UnstructuredDocument")
    assert(got("f/noext") === "UnstructuredDocument")
    assert(got("g/raw.cr2") === "ImageDocument")   // full reference table coverage
    assert(got("h/track.aiff") === "AudioDocument")
  }

  test("text and jsonl ingest land on the documents schema with stable content ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/docs.txt"),
      "alpha beta gamma\n\ndelta epsilon\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      """{"text":"alpha beta gamma","extra":1}
        |{"text":"zeta eta"}
        |""".stripMargin.getBytes)
    val txt = DocumentSource.readText(spark, s"$dir/docs.txt")
    val jl = DocumentSource.readJsonl(spark, s"$dir/docs.jsonl")
    assert(txt.columns.toSeq === Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(txt.count() === 2L) // empty line dropped
    assert(jl.count() === 2L)
    // same content → same deterministic id across sources
    val idTxt = txt.filter(col("text") === "alpha beta gamma").select(col("doc_id")).head().getLong(0)
    val idJl = jl.filter(col("text") === "alpha beta gamma").select(col("doc_id")).head().getLong(0)
    assert(idTxt === idJl)
    // ingested docs run through an existing operator unchanged
    val chunked = txt.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"))
    assert(chunked.agg(sum(col("n"))).head().getLong(0) === 5L)
  }

  test("binary ingest routes payloads through typed metadata into the decode plumbing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binary").toString
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes)
    put("report.txt", "alpha beta gamma".getBytes("UTF-8"))
    put("photo.png", Array[Byte](0x50, 0x4e, 0x47, 0x00, 0x10, 0x7f))
    put("track.wav", Array[Byte](0x52, 0x49, 0x46, 0x46))

    val bin = DocumentSource.readBinary(spark, dir, sourceTag = "media_drop")
    val byName = bin.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(byName.keySet === Set("report", "photo", "track"))
    // FileMetadata fields land typed (get_file_metadata.py shape)
    val photo = byName("photo")
    assert(photo.getAs[String]("document_class") === "ImageDocument")
    assert(photo.getAs[String]("mime") === "image/png")
    assert(photo.getAs[Long]("n_bytes") === 6L)
    assert(photo.getAs[String]("content_hash").matches("[0-9a-f]{32}"))
    assert(byName("track").getAs[String]("document_class") === "AudioDocument")
    assert(byName("report").getAs[String]("mime") === "text/plain")
    // content-hash id ≡ the text readers': same bytes → same doc_id
    val viaText = DocumentSource.readText(spark, s"$dir/report.txt")
      .select(col("doc_id")).head().getLong(0)
    assert(byName("report").getAs[Long]("doc_id") === viaText)

    // payload + meta feed the multimodal decode stage directly
    val feats = operators.MultimodalOps.decodeFeatures(spark, bin)
    assert(feats.columns.toSeq ===
      Seq("doc_id", "mime", "n_bytes", "byte_sum", "f0", "f1", "f2", "f3"))
    val photoFeat = feats.filter(col("doc_id") === photo.getAs[Long]("doc_id")).head()
    assert(photoFeat.getAs[Long]("byte_sum") ===
      (0x50 + 0x4e + 0x47 + 0x00 + 0x10 + 0x7f).toLong)

    // routed onto the documents schema, the dataset inventory counts them
    val docs = DocumentSource.toDocuments(bin)
    assert(docs.filter(col("text") === "alpha beta gamma").count() === 1L)
    assert(docs.filter(col("text").startsWith("[ImageDocument transcript of photo")).count() === 1L)
    val store = java.nio.file.Files.createTempDirectory("graft_binary_ds").toString
    docs.write.parquet(s"$store/documents.parquet")
    val inv = operators.DatasetOps.datasets(spark, store)
      .filter(col("dataset") === "media_drop").head()
    assert(inv.getAs[Long]("n_docs") === 3L)
  }

  test("graph store survives every commit crash window (pointer loss, stale generations, legacy .old park)") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gcrash").toString
    val store = sources.GraphStore(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g1 = graph.PropertyGraph(
      Seq(("n:1", "t", "one", Map("k" -> "v1"))).toDF("id", "ntype", "name", "props"),
      spark.emptyDataset[(String, String, String)].toDF("src", "dst", "rel"))
    store.save("g", g1)
    val g2 = store.load("g").addNodes(
      Seq(("n:2", "t", "two", Map.empty[String, String])).toDF("id", "ntype", "name", "props"))
    store.save("g", g2) // second generation; v1 GC'd
    // crash window: pointer file lost AFTER both relations committed —
    // recovery adopts the newest complete generation READ-ONLY (no
    // pointer write on a load path: concurrent readers must not race
    // each other's recovery, and read-only storage must still load);
    // the pointer is re-written by the next save's commit
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/g/_CURRENT"), false)
    assert(store.hasGraph("g"))
    assert(store.load("g").nodes.count() === 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/g/_CURRENT")))
    store.save("g", store.load("g"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/g/_CURRENT")))
    assert(store.load("g").nodes.count() === 2L)
    // crash window: a save that died mid-parquet-write leaves a partial
    // HIGHER generation with no _SUCCESS — it is never adopted over the
    // committed one, and the next save GCs it
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/g/v99/nodes"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/g/_CURRENT"), false)
    assert(store.load("g").nodes.count() === 2L)
    store.save("g", g1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/g/v99")))
    assert(store.load("g").nodes.count() === 1L)
    // legacy swap-era layout: live dir parked at .old with no live dir
    // (the old save's crash window) rolls back on load
    val legacyRoot = java.nio.file.Files.createTempDirectory("graft_glegacy").toString
    val legacy = sources.GraphStore(spark, legacyRoot)
    graph.PropertyGraph.ensureProps(g1.nodes).write.parquet(s"$legacyRoot/h/nodes")
    graph.PropertyGraph.ensureProps(g1.edges).write.parquet(s"$legacyRoot/h/edges")
    assert(legacy.load("h").nodes.count() === 1L)
    fs.rename(new org.apache.hadoop.fs.Path(s"$legacyRoot/h/nodes"),
      new org.apache.hadoop.fs.Path(s"$legacyRoot/h/nodes.old"))
    // the parked copy COUNTS as present — a create-if-absent caller
    // keyed on hasGraph must not take the create branch here, or its
    // save() would GC the only copy load() could still restore
    assert(legacy.hasGraph("h"))
    assert(legacy.load("h").nodes.count() === 1L) // restored, not lost
    // and a later save migrates the legacy graph to the versioned layout
    legacy.save("h", legacy.load("h"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$legacyRoot/h/nodes")))
    assert(legacy.load("h").nodes.count() === 1L)
  }

  test("vector store restores a crash-parked .deleting collection instead of orphaning it") {
    import TestSpark.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vcrash").toString
    val store = sources.VectorStore(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    store.createCollection("c",
      Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("vec_id", "embedding"))
    // crash window: parked at .deleting, live dir gone (died between the
    // two renames). Every entry point must see the collection — in
    // particular createCollection must take the REPLACE branch, not
    // silently orphan the only copy under a fresh create.
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/c"),
      new org.apache.hadoop.fs.Path(s"$root/c.deleting"))
    assert(store.hasCollection("c"))
    assert(store.collection("c").count() === 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/c.deleting")))
    // parked copy WITH a live dir = completed swap's leftover: dropped
    store.collection("c").write.parquet(s"$root/c.deleting")
    assert(store.hasCollection("c"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/c.deleting")))
    assert(store.collection("c").count() === 2L)
    // deleteDataPoints reads the live dir directly — it must run the
    // same recovery probe, not throw path-not-found on a parked copy
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/c"),
      new org.apache.hadoop.fs.Path(s"$root/c.deleting"))
    store.deleteDataPoints("c", Seq(1L))
    assert(store.collection("c").count() === 1L)
    assert(store.collection("c").select(col("vec_id")).head().getLong(0) === 2L)
  }
}
