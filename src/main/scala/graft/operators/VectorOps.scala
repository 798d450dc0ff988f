package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector search engine — the Spark-native re-expression of cognee's
  * vector side (reference: cognee/infrastructure/databases/vector/
  * vector_db_interface.py:81 search / batch_search over embedded
  * collections; retrieval/chunks_retriever.py consumes it).
  *
  * Distance math uses higher-order array functions (zip_with +
  * aggregate) over double-cast arrays — codegen'd, no UDFs. Both Spark
  * and the DuckDB oracle compute dot products as a sequential fold over
  * the same doubles, so cosines are bitwise identical before the
  * round(4) (SURVEY.md §4).
  *
  * Scale posture: queries are broadcast (small side), corpus scans
  * stay partition-parallel; top-k is a per-query window over scored
  * rows. The IVF variant shows the 100 TB shortlist pattern: broadcast
  * coarse centroids, prune to nprobe cells, re-rank exactly within the
  * shortlist.
  */
object VectorOps {

  /** Sequential-fold dot product of two double-array columns — a
    * codegen'd Catalyst expression (graft.functions.DotProduct); same
    * ascending-index fold as DuckDB's list_dot_product. */
  def dot(a: Column, b: Column): Column = org.apache.spark.sql.graft.VectorExpressions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def emb(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"), col("label"))

  /** Exact brute-force cosine top-5 for query vectors vec_id < 10
    * (batch_search): broadcast queries against the corpus scan. */
  def knn(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
    // Custom physical operator: bounded per-group heap, no per-group sort
    // (spec-proven row-identical to the window idiom).
    org.apache.spark.sql.graft.TopKPerGroup(
      scored, Seq(col("query_id")), Seq(col("cosine").desc, col("vec_id").asc), 5)
  }

  val knnSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    round(list_dot_product(qv, v)
      |          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 4) AS cosine
      |  FROM q, e WHERE e.vec_id <> q.query_id
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
      |  FROM scored
      |)
      |SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= 5""".stripMargin

  /** Cosine RANGE search: every corpus vector within a similarity
    * radius of each query (all matches, not top-k) — the
    * vector_db_interface search shape when the caller bounds by score
    * instead of count (near-duplicate candidate pulls, radius recalls).
    * Same broadcast-queries / parallel-corpus-scan plan as [[knn]];
    * the threshold compares the ROUNDED cosine so the predicate and the
    * reported score can't disagree at the boundary. Unbounded result
    * cardinality is the caller's contract (a radius query returns what
    * it returns); no window, no sort — just scan + filter, the
    * cheapest possible shape at 100 TB. The IVF cell shortlist
    * ([[knnIvf]]) composes in front when τ is high enough to prune. */
  def rangeSearch(spark: SparkSession, dir: String, tau: Double = 0.3): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  val rangeSearchSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10)
      |SELECT query_id, vec_id, cosine FROM (
      |  SELECT q.query_id, e.vec_id,
      |    round(list_dot_product(qv, v)
      |          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 4) AS cosine
      |  FROM q, e WHERE e.vec_id <> q.query_id
      |) WHERE cosine >= 0.3""".stripMargin

  // ---------------------------------------------------------------------
  // Coarse quantizer: deterministic spherical k-means (Lloyd's). The
  // trained centroids back both the IVF probe shortlist ([[knnIvf]]) and
  // the exact cell-pruned near-dup join ([[dedupCosine]]). Centroids are
  // tiny (k × 64 doubles) and live as broadcast literals in the plan;
  // every assignment pass is a full-parallel corpus scan.
  // ---------------------------------------------------------------------

  /** Cluster count heuristic: √n clamped to [4, 16] — cells stay
    * populated at sf0.001 yet bound candidate volume at bench scale. At
    * cluster scale k grows toward √n with the same code. */
  private[graft] def cellCount(n: Long): Int = math.sqrt(n.toDouble).toInt.max(4).min(16)

  private[graft] val DefaultTrainCap = 200000L

  /** Trained coarse quantizer per (session, corpus dir) — the Faiss
    * practice: train offline/once, reuse across queries. Repeat calls in
    * one process (bench warm passes; dedup + IVF sharing one corpus) skip
    * the count() + Lloyd's passes and go straight to scan + shortlist.
    * Only the default-trainCap quantizer is cached; explicit caps (spec
    * probes) train ad hoc. The cache is stamped with the corpus' parquet
    * file listing (name, length, mtime) — an ingest that rewrites or
    * appends embeddings mid-session retrains instead of silently serving
    * centroids from the old corpus (IVF recall would degrade unseen). */
  private val corpusStamp: (SparkSession, String) => String = (spark, dir) => {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else fs.listStatus(p)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString(",")
  }

  private val quantizerCache = new graft.graph.SessionDirCache[Array[Array[Double]]](
    (spark, dir) => {
      val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
      val n = e0.count()
      kmeansCentroids(trainingSample(e0, n, DefaultTrainCap), cellCount(n))
    },
    stamp = corpusStamp)

  /** Per-row scored struct array: (dot(v, ĉᵢ), i) for each normalized
    * centroid literal; array_max picks the best cell (ties → larger id —
    * struct comparison is field-ordered, so deterministic). */
  private[graft] def bestCell(v: Column, cents: Array[Array[Double]]): Column =
    if (cents.isEmpty) {
      // empty corpus → no trained centroids; keep the plan well-formed
      // (no row ever evaluates this) so empty slices flow through
      struct(lit(0.0).as("s"), lit(0).as("cell"))
    } else {
      val scored = cents.zipWithIndex.map { case (c, i) =>
        val n = math.sqrt(c.map(x => x * x).sum)
        struct(dot(v, lit(c.map(_ / n))).as("s"), lit(i).as("cell"))
      }
      array_max(array(scored: _*))
    }

  /** Deterministic hash-bucket training sample: above `cap` rows the
    * quantizer trains on ~cap rows selected by md5 bucket (one filter in
    * the scan, no sort, no RNG) — the standard IVF practice at corpus
    * scale. Safe for [[dedupCosine]] because its pruning bound is
    * computed from the FULL corpus' actual cell radii, so exactness
    * never depends on which rows trained the centroids. */
  private[graft] def trainingSample(e: DataFrame, n: Long, cap: Long): DataFrame =
    if (n <= cap) e
    else {
      val pct = math.max(1L, math.min(100L, cap * 100 / n))
      e.filter(conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100 < pct)
    }

  /** Best cell under EUCLIDEAN distance: argmin |v−cᵢ|² = argmax
    * 2·v·cᵢ − |cᵢ|² (the |v|² term is constant across cells, so it
    * drops out of the argmax — one dot per cell, no per-row norm).
    * The PQ codebook metric: L2 on subvectors directly bounds the
    * inner-product estimation error by |q_sub|·|v_sub − c|, which the
    * spherical [[bestCell]] (direction-only) does not. */
  private[graft] def bestCellL2(v: Column, cents: Array[Array[Double]]): Column =
    if (cents.isEmpty) struct(lit(0.0).as("s"), lit(0).as("cell"))
    else array_max(array(cents.zipWithIndex.map { case (c, i) =>
      struct((dot(v, lit(c)) * 2 - lit(c.map(x => x * x).sum)).as("s"), lit(i).as("cell"))
    }: _*))

  /** [[bestCellL2]]'s argmax folded into one `aggregate` HOF over the
    * codebook literal, returning just the cell index. Semantics are
    * identical, including ties: `>=` lets a later (larger) cell index
    * replace an equal score, matching `array_max`'s struct ordering.
    * Exists because m unrolled copies of the ks-way argmax inside a
    * single whole-stage `explode` consumer exceed the JVM's 64 KB
    * method limit (a Generate consumer's code can't be split), so the
    * whole training stage silently fell back to interpreted execution.
    * An HOF is CodegenFallback, which keeps the generated stage code a
    * small compiled shell around an eval call. */
  private[graft] def bestCellL2Cell(v: Column, cents: Array[Array[Double]]): Column =
    if (cents.isEmpty) lit(0)
    else {
      val cells = typedLit(cents.zipWithIndex.map { case (c, i) =>
        (i, c.toSeq, c.map(x => x * x).sum)
      }.toSeq)
      aggregate(
        cells,
        struct(lit(Double.NegativeInfinity).as("s"), lit(0).as("cell")),
        (acc, x) => {
          val s = dot(v, x.getField("_2")) * 2 - x.getField("_3")
          when(s >= acc.getField("s"),
            struct(s.as("s"), x.getField("_1").as("cell"))).otherwise(acc)
        }).getField("cell")
    }

  /** Lloyd's k-means with deterministic init (members ordered by
    * md5(vec_id), first k) and a fixed iteration count — no RNG, so the
    * quantizer is reproducible across runs and sessions. Only k×64
    * centroid doubles ever reach the driver (SURVEY §5 tiny-broadcast
    * rule); assignment and the dimension means are distributed.
    * `l2` switches the assignment metric from spherical (the coarse
    * IVF quantizer) to Euclidean (PQ codebooks). */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int = 4, l2: Boolean = false): Array[Array[Double]] = {
    var cents = e.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h").asc, col("vec_id").asc).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assign = if (l2) bestCellL2(col("v"), cents) else bestCell(col("v"), cents)
      val assigned = e.withColumn("cell", assign.getField("cell"))
      val dimMeans = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byCell = dimMeans.groupBy(_._1)
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(ds) => ds.sortBy(_._2).map(_._3)
          case None     => old // empty cell keeps its previous centroid
        }
      }
    }
    cents
  }

  /** Near-dup pairs at cosine ≥ 0.4, canonical v1 < v2 — EXACT, with
    * candidate generation blocked by quantizer cells instead of an
    * all-pairs nested-loop join.
    *
    * Soundness (why blocking loses no pair ≥ τ): angular distance is a
    * metric on the unit sphere, so for a in cell c₁ and b in cell c₂,
    * θ(a,b) ≥ θ(c₁,c₂) − r₁ − r₂ where rᵢ is cell i's max member-to-
    * centroid angle. A cell pair with θ(c₁,c₂) − r₁ − r₂ > acos(τ') is
    * provably pair-free and is pruned before any dot product runs
    * (τ' = τ − 1e-3 absorbs the round-to-4 boundary and float noise).
    * Surviving cell pairs become broadcast-driven EQUI-joins on the
    * cell key — never a BroadcastNestedLoopJoin — so the plan
    * hash-partitions and parallelizes at any corpus size. On clustered
    * real-embedding corpora the bound prunes most cell pairs; on
    * adversarially uniform vectors it degrades to a distributed (still
    * equi-join) verify of all cell pairs, never to a single-task loop. */
  def dedupCosine(spark: SparkSession, dir: String, tau: Double = 0.4,
      trainCap: Long = DefaultTrainCap): DataFrame =
    dedupCosineOf(spark, emb(spark, dir).select(col("vec_id"), col("v")), tau, trainCap,
      pretrained = if (trainCap == DefaultTrainCap) Some(quantizerCache(spark, dir)) else None)

  /** Library entry point: exact near-dup pairs over ANY (vec_id LONG,
    * v ARRAY<DOUBLE>) DataFrame — see [[dedupCosine]] for the
    * algorithm. Exposed so users bring their own embedding relations
    * and so the pruning spec can feed adversarial/clustered corpora. */
  def dedupCosineOf(spark: SparkSession, vecs: DataFrame, tau: Double,
      trainCap: Long = DefaultTrainCap,
      pretrained: Option[Array[Array[Double]]] = None): DataFrame = {
    import spark.implicits._
    // EXACT-DUPLICATE COLLAPSE before the pairing machinery: bitwise-
    // identical vectors share every pairwise score, so the cell joins
    // run over ONE representative per distinct vector and a membership
    // expansion restores the full pair set afterwards. On real dedup
    // corpora (the workload this operator exists for) the exact-dup
    // fraction is large, and the pair stage's quadratic-in-cluster cost
    // moves from the scored joins to the result-proportional expansion
    // — the sf1 soak measured 87 s → ~3 s on a corpus of 10× exact
    // replicas. Output is byte-identical: cross-group cosines are the
    // same dots over the same arrays, in-group pairs score the
    // representative's rounded self-cosine (what the per-member formula
    // yields on identical arrays). One extra corpus shuffle (the
    // group-by-vector window) buys it.
    val win = Window.partitionBy(col("v"))
    val tagged = vecs.select(col("vec_id"), col("v"), norm(col("v")).as("nv"))
      .withColumn("rep", min(col("vec_id")).over(win))
    val members = tagged.select(col("rep"), col("vec_id"))
    val e = tagged.filter(col("vec_id") === col("rep"))
      .select(col("vec_id"), col("v"), col("nv"))
    val (assigned, candPairsSeq) = cellCandidates(e, tau, trainCap, pretrained)
    val candPairs = candPairsSeq.toDF("c1", "c2")
    val a = assigned.select(col("cell").as("c1"), col("vec_id").as("p1"),
      col("v").as("va"), col("nv").as("na"))
    val b = assigned.select(col("cell").as("c2"), col("vec_id").as("p2"),
      col("v").as("vb"), col("nv").as("nb"))
    val repPairs = a.join(broadcast(candPairs), Seq("c1"))
      .join(b, Seq("c2")) // shuffled equi-join on the cell key
      .filter(col("c1") < col("c2") || col("p1") < col("p2")) // each unordered pair once
      .select(col("p1").as("r1"), col("p2").as("r2"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
    // In-group pairs: members of one representative score its rounded
    // self-cosine (1.0 up to rounding); singleton groups expand to
    // nothing through the i1 < i2 gate below.
    val selfPairs = e.select(col("vec_id").as("r1"), col("vec_id").as("r2"),
        round(dot(col("v"), col("v")) / (col("nv") * col("nv")), 4).as("cosine"))
      .filter(col("cosine") >= tau)
    repPairs.unionByName(selfPairs)
      .join(members.select(col("rep").as("r1"), col("vec_id").as("i1")), Seq("r1"))
      .join(members.select(col("rep").as("r2"), col("vec_id").as("i2")), Seq("r2"))
      .filter(col("r1") =!= col("r2") || col("i1") < col("i2"))
      .select(least(col("i1"), col("i2")).as("v1"),
        greatest(col("i1"), col("i2")).as("v2"), col("cosine"))
  }

  /** Cell assignment + the PRUNED candidate cell-pair list for a
    * (vec_id, v, nv) corpus at threshold tau. Exposed for the spec that
    * measures pruning on clustered corpora; soundness argument in
    * [[dedupCosine]]'s doc. */
  def cellCandidates(e: DataFrame, tau: Double,
      trainCap: Long = DefaultTrainCap,
      pretrained: Option[Array[Array[Double]]] = None): (DataFrame, Seq[(Int, Int)]) = {
    val cents = pretrained.getOrElse {
      val n = e.count()
      kmeansCentroids(
        trainingSample(e.select(col("vec_id"), col("v")), n, trainCap), cellCount(n))
    }
    val best = bestCell(col("v"), cents)
    // Assignment is consumed three times (radii agg + both join sides);
    // an eager localCheckpoint computes the k dot products per row once
    // and lets the context cleaner reclaim the blocks after use.
    val assigned = e.select(col("vec_id"), col("v"), col("nv"),
      best.getField("cell").as("cell"),
      // member-to-centroid angle: best score is dot(v, ĉ) → cos = s/‖v‖
      acos(least(lit(1.0), greatest(lit(-1.0), best.getField("s") / col("nv")))).as("cang"))
      .localCheckpoint(true)
    // Tiny driver artifacts: per-cell max angle (k rows) + pairwise
    // centroid angles (k² doubles) → the pruned candidate cell-pair list.
    val radii = assigned.groupBy(col("cell")).agg(max(col("cang")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val unit = cents.map { c => val nn = math.sqrt(c.map(x => x * x).sum); c.map(_ / nn) }
    def centAngle(i: Int, j: Int): Double = {
      val d = unit(i).zip(unit(j)).map { case (x, y) => x * y }.sum
      math.acos(math.max(-1.0, math.min(1.0, d)))
    }
    val maxAngle = math.acos(tau - 1e-3) + 1e-6
    val pairs = for {
      i <- radii.keys.toSeq.sorted; j <- radii.keys.toSeq.sorted
      if i <= j && centAngle(i, j) - radii(i) - radii(j) <= maxAngle
    } yield (i, j)
    (assigned, pairs)
  }

  val dedupCosineSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT a.vec_id AS v1, b.vec_id AS v2,
      |  round(list_dot_product(a.v, b.v)
      |        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.v, b.v)
      |        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4""".stripMargin

  /** Element-wise label centroids (collection_stats analog): per label,
    * member count, centroid norm, and cohesion = mean cosine(member,
    * centroid). posexplode → per-dimension mean → re-assemble. */
  def centroids(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val dims = e.select(col("label"), col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
    val cent = dims.groupBy(col("label"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        s => s.getField("cx")).as("centroid"))
    val stats = e.join(cent, Seq("label"))
      .select(col("label"), cosine(col("v"), col("centroid")).as("cc"), norm(col("centroid")).as("cn"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(first(col("cn")), 4).as("centroid_norm"),
        round(avg(col("cc")), 4).as("cohesion"))
    stats
  }

  val centroidsSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |dims AS (
      |  SELECT label, vec_id, i AS pos, v[i + 1] AS x
      |  FROM e, unnest(range(len(v))) AS u(i)
      |),
      |cent AS (
      |  SELECT label, list(cx ORDER BY pos) AS centroid
      |  FROM (SELECT label, pos, avg(x) AS cx FROM dims GROUP BY 1, 2)
      |  GROUP BY label
      |)
      |SELECT e.label, count(*) AS n,
      |  round(any_value(sqrt(list_dot_product(centroid, centroid))), 4) AS centroid_norm,
      |  round(avg(list_dot_product(e.v, centroid)
      |        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(centroid, centroid)))), 4) AS cohesion
      |FROM e JOIN cent ON e.label = cent.label
      |GROUP BY e.label""".stripMargin

  /** IVF ANN with a TRAINED coarse quantizer: cells come from
    * [[kmeansCentroids]] (deterministic Lloyd's), the query probes its
    * nprobe nearest cells, and the shortlist is exactly re-ranked —
    * the Faiss-style inverted-file pattern. nprobe ≥ k probes every
    * cell and provably reduces to brute-force [[knn]] (spec-pinned).
    * Approximate by construction → rows-only driver check; the
    * ScalaTest spec measures recall against [[knn]]. */
  def knnIvf(spark: SparkSession, dir: String, nprobe: Int = 3,
      trainCap: Long = DefaultTrainCap): DataFrame = {
    val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
    // Default cap → the shared per-(session, dir) quantizer: warm calls
    // pay only the scan + shortlist, not count() + 4 Lloyd passes.
    val cents =
      if (trainCap == DefaultTrainCap) quantizerCache(spark, dir)
      else {
        val n = e0.count()
        kmeansCentroids(trainingSample(e0, n, trainCap), cellCount(n))
      }
    if (cents.isEmpty) {
      // empty corpus trains no centroids → empty result, same shape
      return e0.select(col("vec_id").as("query_id"), col("vec_id"), lit(0.0).as("cosine"))
    }
    val e = e0.withColumn("cell", bestCell(col("v"), cents).getField("cell"))
    val q = e0.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv"))
    // nearest nprobe cells per query: queries × k scored structs, picked
    // by a per-query (partitioned) rank — tiny on both axes.
    val centArr = cents.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("centroid"), lit(i).as("cell"))
    }
    val cellW = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cell").asc)
    val probes = q.select(col("query_id"), col("qv"), explode(array(centArr: _*)).as("cc"))
      .select(col("query_id"), col("qv"), col("cc.cell").as("cell"),
        cosine(col("qv"), col("cc.centroid")).as("ccos"))
      .withColumn("rn", row_number().over(cellW)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // shortlist = members of probed cells; exact re-rank per query
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    e.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  // ---------------------------------------------------------------------
  // Product quantization: m subspaces × ks codewords. The 100 TB ANN
  // memory shape — a 64-dim float vector is 512 bytes, its PQ code is
  // m bytes + one stored norm, so the searchable representation shrinks
  // ~50× and the shortlist scan touches codes, not vectors; only the
  // refine stage reads true vectors, for queries×R rows.
  // ---------------------------------------------------------------------

  private[graft] val PqM = 8 // subspaces over the corpus' 64 dims (8 dims each)
  private[graft] val PqKs = 16 // codewords per subspace

  /** One-pass PQ training: all m subspace codebooks advance TOGETHER —
    * per Lloyd iteration one distributed job (per-row per-subspace
    * assignment, posexplode of the subvector dims, one
    * (subspace, cell, pos) mean aggregation) instead of m independent
    * Lloyd's runs (m × iters assignment passes and driver collects).
    * The math per subspace is exactly [[kmeansCentroids]]'s: same
    * md5-ordered init rows (collected once, sliced per subspace), same
    * L2 assignment, same dimension means, empty cells keep their
    * previous centroid — spec-pinned equal to the sequential runs. */
  private[graft] def pqTrainCodebooks(sample: DataFrame, m: Int = PqM, ks: Int = PqKs,
      iters: Int = 4, dimsPer: Int = 8): Array[Array[Array[Double]]] = {
    val init = sample.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h").asc, col("vec_id").asc).limit(ks)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    var books = Array.tabulate(m)(j => init.map(_.slice(j * dimsPer, (j + 1) * dimsPer)))
    for (_ <- 1 to iters) {
      // bestCellL2Cell (HOF), not bestCellL2: m unrolled argmaxes in this
      // generator blew the 64 KB generated-method limit (the explode
      // consumer can't split code) and de-optimized the whole stage.
      val subStructs = array(Array.tabulate(m) { j =>
        val sv = slice(col("v"), j * dimsPer + 1, dimsPer)
        struct(lit(j).as("sub"), bestCellL2Cell(sv, books(j)).as("cell"), sv.as("sv"))
      }: _*)
      val dimMeans = sample.select(explode(subStructs).as("sc"))
        .select(col("sc.sub").as("sub"), col("sc.cell").as("cell"),
          posexplode(col("sc.sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      val bySubCell = dimMeans.groupBy(t => (t._1, t._2))
      books = Array.tabulate(m) { j =>
        books(j).zipWithIndex.map { case (old, c) =>
          bySubCell.get((j, c)) match {
            case Some(ds) => ds.sortBy(_._3).map(_._4)
            case None     => old
          }
        }
      }
    }
    books
  }

  private def centsLit(cents: Array[Array[Double]]): Column =
    typedLit(cents.map(_.toSeq).toSeq)

  /** Elementwise residual v − centroid(cell) against the broadcast
    * coarse-centroid literal (the Faiss IVFPQ encoding input). */
  private def residualOf(v: Column, cell: Column, cents: Array[Array[Double]]): Column =
    zip_with(v, element_at(centsLit(cents), cell + 1), (a, b) => a - b)

  /** Flat-PQ codebooks per (session, corpus dir), stamped like the
    * coarse quantizer: codes quantize raw subvectors. Kept as the
    * measured comparison baseline for the residual books. */
  private val pqCache = new graft.graph.SessionDirCache[Array[Array[Array[Double]]]](
    (spark, dir) => {
      val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
      val n = e0.count()
      pqTrainCodebooks(trainingSample(e0, n, DefaultTrainCap))
    },
    stamp = corpusStamp)

  /** Residual-PQ codebooks (the true Faiss IVFPQ form): codes quantize
    * v − centroid(cell), so each codebook models the within-cell
    * displacement distribution instead of the global one — tighter
    * quantization at the same (m, ks), spec-pinned recall ≥ flat PQ. */
  private val pqResidualCache = new graft.graph.SessionDirCache[Array[Array[Array[Double]]]](
    (spark, dir) => {
      val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
      val cents = quantizerCache(spark, dir)
      val n = e0.count()
      val sample = trainingSample(e0, n, DefaultTrainCap)
      val resid = sample.select(col("vec_id"),
        residualOf(col("v"), bestCell(col("v"), cents).getField("cell"), cents).as("v"))
      pqTrainCodebooks(resid)
    },
    stamp = corpusStamp)

  /** Encoded corpus per (session, dir): coarse cell + m codes + stored
    * norm — the compact searchable representation, persisted because
    * codes are INDEX data (Faiss encodes at build time, not per query).
    * v is dropped here; the search plan reads codes only and joins back
    * to the vector table for the refine survivors. */
  private val encodedCache = new graft.graph.SessionDirCache[DataFrame](
    (spark, dir) => {
      val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
      val cents = quantizerCache(spark, dir)
      val books = pqCache(spark, dir)
      val codes = array(Array.tabulate(PqM) { j =>
        bestCellL2(slice(col("v"), j * 8 + 1, 8), books(j)).getField("cell")
      }: _*)
      e0.withColumn("cell", bestCell(col("v"), cents).getField("cell"))
        .withColumn("codes", codes)
        .withColumn("vnorm", norm(col("v")))
        .select(col("vec_id"), col("cell"), col("codes"), col("vnorm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    },
    stamp = corpusStamp)

  /** Residual-encoded corpus: same compact (cell, codes, vnorm) shape,
    * codes taken against the residual books. The residual is computed
    * once per row and sliced per subspace. */
  private val encodedResidualCache = new graft.graph.SessionDirCache[DataFrame](
    (spark, dir) => {
      val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
      val cents = quantizerCache(spark, dir)
      val books = pqResidualCache(spark, dir)
      val withRes = e0
        .withColumn("cell", bestCell(col("v"), cents).getField("cell"))
        .withColumn("rv", residualOf(col("v"), col("cell"), cents))
      val codes = array(Array.tabulate(PqM) { j =>
        bestCellL2(slice(col("rv"), j * 8 + 1, 8), books(j)).getField("cell")
      }: _*)
      withRes.withColumn("codes", codes)
        .withColumn("vnorm", norm(col("v")))
        .select(col("vec_id"), col("cell"), col("codes"), col("vnorm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    },
    stamp = corpusStamp)

  /** IVF + product-quantization ANN with exact refine (the Faiss
    * IVFPQ+refine pattern): the query probes its nprobe coarse cells,
    * the probed cells' members are scored by the ASYMMETRIC DISTANCE
    * estimate (per subspace, dot of the query subvector with the
    * candidate's codeword — the candidate contributes only its m-byte
    * code and stored norm), the top `refine` per query re-rank exactly
    * against their true vectors, and the top 5 of those are returned.
    *
    * By default codes are RESIDUAL-encoded (quantize v − centroid(cell),
    * Faiss IVFPQ's true form) and the ADC estimate adds the exact
    * query·centroid term per candidate cell; `residual = false` selects
    * the flat books (codes over raw subvectors) — kept as the measured
    * baseline the residual recall spec compares against.
    *
    * Scale shape: the ADC scan reads (cell, codes, vnorm) — never the
    * vector column — so at 100 TB the shortlist stage streams the ~50×
    * smaller code table; the exact stage joins the queries×refine
    * survivors (a broadcast) back to the vector store by key. With
    * refine ≥ the probed population the exact stage re-ranks everything
    * the coarse quantizer admitted, which is [[knnIvf]] by definition —
    * the spec pins that reduction and measures default-parameter recall
    * against brute force. Approximate → rows-only driver check. */
  def knnIvfPq(spark: SparkSession, dir: String, nprobe: Int = 3,
      refine: Int = 20, residual: Boolean = true): DataFrame = {
    val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
    val cents = quantizerCache(spark, dir)
    if (cents.isEmpty)
      return e0.select(col("vec_id").as("query_id"), col("vec_id"), lit(0.0).as("cosine"))
    val books = if (residual) pqResidualCache(spark, dir) else pqCache(spark, dir)
    val enc = if (residual) encodedResidualCache(spark, dir) else encodedCache(spark, dir)
    val q = e0.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val centArr = cents.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("centroid"), lit(i).as("cell"))
    }
    val cellW = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cell").asc)
    val probes = q.select(col("query_id"), col("qv"), explode(array(centArr: _*)).as("cc"))
      .select(col("query_id"), col("qv"), col("cc.cell").as("cell"),
        cosine(col("qv"), col("cc.centroid")).as("ccos"))
      .withColumn("rn", row_number().over(cellW)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    // ADC estimate: Σⱼ qⱼ · codebookⱼ[codeⱼ] — the codeword literal is
    // selected per row by the candidate's code; with residual codes the
    // exact query·centroid(cell) term is added (q·v = q·c + q·r, the
    // Faiss IVFPQ decomposition); estimated cosine divides by the
    // STORED norm (the Faiss cosine-metric practice).
    val subEst = Array.tabulate(PqM) { j =>
      dot(slice(col("qv"), j * 8 + 1, 8),
        element_at(typedLit(books(j).map(_.toSeq).toSeq), element_at(col("codes"), j + 1) + 1))
    }.reduce(_ + _)
    val ipEst =
      if (residual) dot(col("qv"), element_at(centsLit(cents), col("cell") + 1)) + subEst
      else subEst
    val est = ipEst / (norm(col("qv")) * col("vnorm"))
    val adcW = Window.partitionBy(col("query_id")).orderBy(col("est").desc, col("vec_id").asc)
    val shortlist = enc.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("est", est)
      .withColumn("rn", row_number().over(adcW)).filter(col("rn") <= refine)
      .select(col("query_id"), col("qv"), col("vec_id"))
    // Exact refine: true cosine for the queries×refine survivors only.
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    e0.join(hintShortlist(refine)(shortlist), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** Per-dimension (min, range) scalar-quantization parameters, trained
    * once per (session, corpus dir) and corpus-stamped like the coarse
    * quantizer. Constant dimensions get a floor range so encode never
    * divides by zero. */
  private val sqParamsCache = new graft.graph.SessionDirCache[(Array[Double], Array[Double])](
    (spark, dir) => {
      val dims = emb(spark, dir).select(posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("pos")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
        .orderBy(col("pos")).collect() // ≤ dim rows — bounded driver read
      val lo = dims.map(_.getDouble(1))
      val rg = dims.map(r => math.max(r.getDouble(2) - r.getDouble(1), 1e-12))
      (lo, rg)
    },
    stamp = corpusStamp)

  /** SQ8-encoded corpus: one 0..255 code per dimension + the exact
    * stored norm. 8× smaller than the double vectors (a production
    * sink would pack the code array to BINARY; the plan shape — scan
    * codes, never vectors — is what matters here). */
  private val encodedSqCache = new graft.graph.SessionDirCache[DataFrame](
    (spark, dir) => {
      val (lo, rg) = sqParamsCache(spark, dir)
      val loLit = typedLit(lo.toSeq)
      val rgLit = typedLit(rg.toSeq)
      emb(spark, dir)
        .select(col("vec_id"),
          transform(col("v"), (x, i) => least(lit(255), greatest(lit(0),
            round((x - element_at(loLit, i + 1)) / element_at(rgLit, i + 1) * 255)
              .cast("int")))).as("codes"),
          norm(col("v")).as("vnorm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    },
    stamp = corpusStamp)

  /** Scalar-quantized ANN (the Faiss SQ8 pattern): each dimension
    * uniformly quantized to a byte against trained per-dim (min, max),
    * the shortlist pass scores the RECONSTRUCTED inner product against
    * the 8×-smaller code table, and the top `refine` per query re-rank
    * exactly. The estimate folds the reconstruction into per-query
    * constants — q·v̂ = q·min + Σ (q_d·range_d/255)·code_d — so the
    * corpus-side scan is ONE dot of a precomputed query weight array
    * with the code array (no per-row reconstruction array).
    *
    * Complements IVFPQ on the compression/recall curve: SQ8 keeps
    * per-dimension resolution (higher recall at the same refine) at 8×
    * compression vs PQ's ~50×. With refine ≥ corpus size it reduces to
    * exact brute-force knn (spec-pinned). Approximate → rows-only
    * driver check. */
  def knnSq8(spark: SparkSession, dir: String, refine: Int = 20): DataFrame = {
    val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
    val (lo, rg) = sqParamsCache(spark, dir)
    if (lo.isEmpty)
      return e0.select(col("vec_id").as("query_id"), col("vec_id"), lit(0.0).as("cosine"))
    val enc = encodedSqCache(spark, dir)
    val loLit = typedLit(lo.toSeq)
    val rgLit = typedLit(rg.toSeq)
    val q = e0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        dot(col("v"), loLit).as("qmin"),
        zip_with(col("v"), rgLit, (a, b) => a * b / 255.0).as("qw"))
    val est = (col("qmin") + dot(col("qw"), transform(col("codes"), _.cast("double")))) /
      (norm(col("qv")) * col("vnorm"))
    val sqW = Window.partitionBy(col("query_id")).orderBy(col("est").desc, col("vec_id").asc)
    val shortlist = enc.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("est", est)
      .withColumn("rn", row_number().over(sqW)).filter(col("rn") <= refine)
      .select(col("query_id"), col("qv"), col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    e0.join(hintShortlist(refine)(shortlist), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** Truncated-dimension ANN (the Matryoshka-representation shortcut:
    * score on a PREFIX of the embedding, refine exactly). The shortlist
    * pass computes cosine over the first `dims` dimensions only — a
    * 64/dims-× cheaper scan that at 100 TB reads a `dims`-wide slice of
    * the vector column (columnar stores can even prune the tail) — and
    * the top `refine` per query re-rank with full-width cosine.
    * dims = 64 (full width) reduces the shortlist to the exact ranking,
    * so refine ≥ corpus there ≡ brute force (spec-pinned). Approximate
    * → rows-only driver check. */
  def knnTruncated(spark: SparkSession, dir: String, dims: Int = 32,
      refine: Int = 40): DataFrame = {
    val e0 = emb(spark, dir).select(col("vec_id"), col("v"))
    val pre = e0.select(col("vec_id"), slice(col("v"), 1, dims).as("pv"))
    val q = e0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        slice(col("v"), 1, dims).as("qpv"))
    val est = cosine(col("qpv"), col("pv"))
    val tW = Window.partitionBy(col("query_id")).orderBy(col("est").desc, col("vec_id").asc)
    val shortlist = pre.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("est", est)
      .withColumn("rn", row_number().over(tW)).filter(col("rn") <= refine)
      .select(col("query_id"), col("qv"), col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    e0.join(hintShortlist(refine)(shortlist), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** Random-hyperplane LSH ANN with multi-probe: nbits sign bits
    * (deterministic ±1 planes) define the bucket; the query probes its
    * own bucket plus every bucket within hamming distance `probeHamming`
    * (standard multi-probe LSH — the buckets most likely to hide a
    * near-neighbor are the ones one sign-flip away), then exact
    * re-ranks the candidates. The complementary scale path to
    * [[knnIvf]] (hash-partitioned buckets instead of centroid cells);
    * nbits=0 degenerates to one bucket = brute force (the spec's
    * reduction check). Approximate → rows-only driver check. */
  def knnLsh(spark: SparkSession, dir: String, nbits: Int = 8,
      probeHamming: Int = 0): DataFrame = {
    val rng = new java.util.Random(7)
    val planes = Array.fill(nbits)(Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
    val e = emb(spark, dir)
    def bucket(v: Column): Column =
      if (nbits == 0) lit(0L)
      else planes.zipWithIndex.map { case (p, j) =>
        when(dot(v, lit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val corpus = e.select(col("vec_id"), col("v"), bucket(col("v")).as("bucket"))
    // Probe set per query: own bucket + every bit-flip mask up to the
    // probe radius, computed driver-side (≤ 2^nbits longs) and applied
    // as literal XORs — the probe list explodes broadcast-side only.
    var masks = Set(0L)
    for (_ <- 1 to probeHamming)
      masks = masks ++ masks.flatMap(m => (0 until nbits).map(j => m ^ (1L << j)))
    val q = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(array(masks.toSeq.sorted.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    // Each corpus vector lives in exactly one bucket and the probe
    // masks are pairwise distinct, so a (query, candidate) pair matches
    // at most one probe row — no dedup needed at any radius.
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** The vector_db_interface surface as a DRIVER-CHECKED round-trip
    * (previously spec-only): create_data_points upserts the embeddings
    * table into a parquet-backed [[graft.sources.VectorStore]],
    * create_vector_index trains and persists the IVF layout once, and
    * search probes EVERY cell (nprobe ≥ cells ≡ brute force — the
    * spec-pinned reduction), so the DuckDB oracle checks the STORE's
    * answer exactly against top-k cosine over the raw table. The store
    * root is stamped by the corpus file listing: regenerated testdata
    * gets a fresh store instead of silently serving stale rows; store
    * writes are idempotent upserts, so Verify/Bench repeats reuse the
    * store they built. Query = stored vector 0 (the shared verification
    * seed), which ranks itself first at cosine 1. */
  def storeVecSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val stamp = graft.graph.SessionDirCache.parquetStamp(Seq("embeddings"))(spark, dir)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "|" + stamp).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_vstore_$key"
    val vs = graft.sources.VectorStore(spark, root)
    val emb0 = load(spark, dir, "embeddings")
    vs.createDataPoints("chunks", emb0)
    if (!vs.hasIndex("chunks")) vs.createVectorIndex("chunks")
    emb0.filter(col("vec_id") === 0).select(col("embedding")).head(1) match {
      case Array(row) =>
        val query = row.getSeq[Float](0).map(_.toDouble).toArray
        vs.search("chunks", query, k, nprobe = Int.MaxValue)
      case _ => // empty corpus → no query seed; empty, correctly-shaped result
        emb0.select(col("vec_id"), col("label"), lit(0.0).as("cosine")).limit(0)
    }
  }

  val storeVecSearchSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
      |SELECT e.vec_id, e.label,
      |  round(list_dot_product(qv, v)
      |        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 4) AS cosine
      |FROM e, q
      |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Mutual k-NN graph over the embedding corpus — the similarity-graph
    * construction that semantic clustering / SemDeDup-style curation
    * and graph-based label propagation start from: an undirected edge
    * (a, b) exists iff b is in a's cosine top-k AND a is in b's
    * (mutuality prunes the hub artifacts of one-directional kNN).
    *
    * EXACT, with candidate generation blocked by the shared quantizer
    * cells instead of an all-pairs nested loop (the r10 plan was a
    * corpus×corpus `=!=` join — quadratic death at 100 TB). Two passes,
    * both cell-keyed EQUI-joins:
    *
    *  1. WITHIN-CELL: score each vector against its own cell-mates and
    *     keep the bounded-heap top-k ([[org.apache.spark.sql.graft.TopKPerGroup]],
    *     no n² window sort). A vector with ≥ k cell-mates gets a LOWER
    *     BOUND lb = its k-th best within-cell rounded cosine; fewer →
    *     lb = −1 (must probe everywhere; exactness never at risk).
    *  2. CROSS-CELL, per-vector adaptively pruned: v probes cell c ≠
    *     own(v) only when θ(v, ĉ_c) − r_c ≤ acos(lb − 1e-3) + 1e-6,
    *     where r_c is c's max member-to-centroid angle. By the angular
    *     triangle inequality ([[dedupCosine]]'s soundness argument) a
    *     pruned cell's best achievable TRUE cosine is < lb − 1e-3, so
    *     its 4dp-rounded value is strictly below lb — it can never
    *     displace the k within-cell candidates already at ≥ lb, ties
    *     included. The probe list is one `filter` HOF over the ≤ 16
    *     (cell, ĉ, r) broadcast literals; survivors explode into an
    *     equi-join on the probed cell key.
    *
    * Union(within-top-k, cross scores) → top-k → mutual semi-join of
    * the n·k directed edge list on the reversed key. Output is
    * row-identical to the brute-force all-pairs ranking (the spec pins
    * this); on clustered corpora the cross pass scores a small fraction
    * of n², on adversarially uniform ones it degrades to distributed
    * equi-joined verification — never a single-task nested loop.
    * Cosines round to 4dp BEFORE ranking so rank ties are
    * engine-stable ([[knn]] rule). */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cents = quantizerCache(spark, dir)
    val e0 = emb(spark, dir).select(col("vec_id"), col("v"), norm(col("v")).as("nv"))
    val best = bestCell(col("v"), cents)
    // Assignment feeds four consumers (radii agg, both within sides,
    // the probe pass); localCheckpoint computes the cell dots once.
    val assigned = e0.select(col("vec_id"), col("v"), col("nv"),
        best.getField("cell").as("cell"),
        acos(least(lit(1.0), greatest(lit(-1.0), best.getField("s") / col("nv")))).as("cang"))
      .localCheckpoint(true)
    val radii = assigned.groupBy(col("cell")).agg(max(col("cang")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val unit = cents.map { c => val nn = math.sqrt(c.map(x => x * x).sum); c.map(_ / nn) }
    val rhs = assigned.select(col("cell"), col("vec_id").as("other_id"),
      col("v").as("ov"), col("nv").as("onv"))
    // EXPANSION-join parallelism: both cell joins output ~|cell| rows
    // per input row, so the scoring work is proportional to the OUTPUT
    // — which AQE cannot see (it coalesces by map-output size, and the
    // unexpanded inputs are tiny). An explicit round-robin repartition
    // of the driving side pins the fused join+score+heap stage to P
    // tasks; the cell-mate side stays an unhinted equi-join leg (AQE
    // broadcasts it when small, shuffles it at corpus scale).
    val par = spark.sessionState.conf.numShufflePartitions
    val within = assigned.repartition(par).join(rhs, Seq("cell"))
      .filter(col("vec_id") =!= col("other_id"))
      .select(col("vec_id"), col("other_id"),
        round(dot(col("v"), col("ov")) / (col("nv") * col("onv")), 4).as("cosine"))
    // Bounded artifact (≤ n·k rows), consumed twice: as the pass-1
    // candidates and as the lb source. Dominated within-cell rows can
    // be dropped before the union: top-k(union) is unchanged.
    // localCheckpoint (not recompute): the double evaluation would
    // re-run the within-cell scoring, the quadratic-in-cell-size part.
    val withinTopK = org.apache.spark.sql.graft.TopKPerGroup(
      within, Seq(col("vec_id")), Seq(col("cosine").desc, col("other_id").asc), k)
      .localCheckpoint(true)
    val lb = withinTopK.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("c"), min(col("cosine")).as("kth"))
      .select(col("vec_id"), when(col("c") >= k, col("kth")).otherwise(lit(-1.0)).as("lb"))
    // (cell, ĉ, r) broadcast literals; an untrained/empty corpus yields
    // an empty probe array and the plan stays well-formed.
    val cellsLit = typedLit(unit.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, radii.getOrElse(i, 0.0))
    }.toSeq)
    val probes = assigned.join(lb, Seq("vec_id"), "left")
      .select(col("vec_id"), col("v"), col("nv"), col("cell"),
        (acos(greatest(coalesce(col("lb"), lit(-1.0)) - 1e-3, lit(-1.0))) + 1e-6).as("maxang"))
      .select(col("vec_id"), col("v"), col("nv"),
        explode(filter(cellsLit, c =>
          c.getField("_1") =!= col("cell") &&
            (acos(least(lit(1.0), greatest(lit(-1.0),
              dot(col("v"), c.getField("_2")) / col("nv")))) - c.getField("_3"))
              <= col("maxang"))).as("pc"))
      .select(col("vec_id"), col("v"), col("nv"), col("pc").getField("_1").as("cell"))
      .repartition(par) // same expansion-parallelism pin as `within`
    val cross = probes.join(rhs, Seq("cell")) // cell ≠ own(v) ⟹ other_id ≠ vec_id
      .select(col("vec_id"), col("other_id"),
        round(dot(col("v"), col("ov")) / (col("nv") * col("onv")), 4).as("cosine"))
    val knnEdges = org.apache.spark.sql.graft.TopKPerGroup(
      withinTopK.union(cross), Seq(col("vec_id")),
      Seq(col("cosine").desc, col("other_id").asc), k)
      .localCheckpoint(true) // ≤ n·k rows, consumed by both mutual sides
    knnEdges.filter(col("vec_id") < col("other_id"))
      .join(knnEdges.select(col("other_id").as("vec_id"), col("vec_id").as("other_id")),
        Seq("vec_id", "other_id"), "left_semi")
      .select(col("vec_id").as("a"), col("other_id").as("b"), col("cosine"))
  }

  val knnGraphSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |scored AS (
      |  SELECT x.vec_id, y.vec_id AS other_id,
      |    round(list_dot_product(x.v, y.v)
      |          / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4)
      |      AS cosine
      |  FROM e x, e y WHERE x.vec_id <> y.vec_id
      |),
      |knn AS (
      |  SELECT vec_id, other_id, cosine FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY cosine DESC, other_id ASC) AS rn
      |    FROM scored
      |  ) WHERE rn <= 5
      |)
      |SELECT f.vec_id AS a, f.other_id AS b, f.cosine
      |FROM knn f JOIN knn r ON f.vec_id = r.other_id AND f.other_id = r.vec_id
      |WHERE f.vec_id < f.other_id""".stripMargin

  /** The trained coarse quantizer ITSELF as a hash-checked query — the
    * artifact every shortlist path shares ([[knnIvf]]/[[knnIvfPq]]/
    * [[dedupCosine]]/[[knnGraph]] all stand on these centroids, so a
    * training drift would silently degrade recall everywhere; this
    * registers the training as a first-class checked surface instead
    * of an implicitly-trusted cache). Output: per-cell member count at
    * the final assignment plus the 4dp centroid norm — a fingerprint of
    * both the partition structure and the centroid values.
    *
    * The oracle replays deterministic Lloyd's EXACTLY (no RNG anywhere,
    * SURVEY §4): init = first k corpus vectors by (md5(vec_id), vec_id),
    * then `iters` unrolled assignment→mean rounds — assignment is
    * argmax of dot(v, ĉ) with ties to the LARGER cell id (array_max's
    * struct order = ORDER BY s DESC, cell DESC rank-1), empty cells
    * keep their previous centroid. Both engines average the same
    * doubles; the 4dp norm round and integer member counts absorb
    * summation-order ulps. */
  def kmeansQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = quantizerCache(spark, dir)
    val e = emb(spark, dir).select(col("vec_id"), col("v"))
    val assigned = e.select(col("vec_id"),
      bestCell(col("v"), cents).getField("cell").as("cell"))
    val centRows = cents.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(c.map(x => x * x).sum)) }
      .toSeq.toDF("cell", "cnorm")
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(broadcast(centRows), Seq("cell"), "right")
      .select(col("cell"), coalesce(col("n_members"), lit(0L)).as("n_members"),
        round(col("cnorm"), 4).as("centroid_norm"))
  }

  /** Unrolled Lloyd's oracle: k derived IN-SQL from the corpus count
    * with the exact [[cellCount]] clamp (GREATEST(4, LEAST(16,
    * floor(√n))) — truncation matches Scala's `.toInt`), 4 iterations,
    * spherical assignment. Each round is one (assignment) rank-1
    * window over the vec×cell cross plus one per-(cell, dim) mean;
    * empty cells carry the previous centroid via a LEFT JOIN coalesce.
    * MATERIALIZED per round (the kcore lesson).
    *
    * Known parity bound: above [[DefaultTrainCap]] (200k) rows the
    * Spark side trains on the md5-bucket [[trainingSample]] while this
    * oracle trains on the full table — the oracle is only sound for
    * corpora ≤ the train cap (every test SF is; sf0.1 has 20k
    * embeddings). Below the cap, k now tracks the corpus, so the
    * r11-flagged silent break for n < 256 is closed. */
  /** Per-row final cell assignment against the shared trained
    * quantizer — (vec_id, v, label, cell). The SemDeDup action and any
    * other within-cell consumer reads cells through this so every
    * surface shares ONE training (the [[kmeansQuery]]-checked one). */
  /** The persisted shared quantizer's centroids (the training
    * `vec_kmeans` hash-checks) — the at-ingest streaming twins assign
    * against these with NO retrain, the Faiss practice indexStream
    * already follows. */
  private[graft] def trainedQuantizer(spark: SparkSession, dir: String): Array[Array[Double]] =
    quantizerCache(spark, dir)

  private[graft] def cellAssignments(spark: SparkSession, dir: String): DataFrame = {
    val cents = quantizerCache(spark, dir)
    emb(spark, dir).select(col("vec_id"), col("v"), col("label"),
      bestCell(col("v"), cents).getField("cell").as("cell"))
  }

  /** The [[kmeansSql]] CTE chain without its `WITH` prefix, through
    * the final assignment `fin(vec_id, cell)` — shared verbatim by the
    * SemDeDup oracle (which must see the SAME cells the Spark side
    * trains) so the two oracles can never drift apart. Callers prepend
    * `WITH ` or `WITH RECURSIVE `. */
  private[graft] val kmeansCtes: String = {
    val iters = 4
    def round(r: Int): String =
      s"""a$r AS MATERIALIZED (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(e.v, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC,
         |        c.cell DESC) AS rn
         |    FROM e CROSS JOIN c${r - 1} c
         |  ) WHERE rn = 1
         |),
         |m$r AS (
         |  SELECT cell, list(cx ORDER BY pos) AS c FROM (
         |    SELECT cell, i AS pos, avg(v[CAST(i AS INT) + 1]) AS cx
         |    FROM a$r, unnest(range(len(v))) AS u(i)
         |    GROUP BY 1, 2
         |  ) GROUP BY cell
         |),
         |c$r AS MATERIALIZED (
         |  SELECT p.cell, coalesce(n.c, p.c) AS c
         |  FROM c${r - 1} p LEFT JOIN m$r n ON n.cell = p.cell
         |)""".stripMargin
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS MATERIALIZED (
       |  SELECT cell, c FROM (
       |    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1
       |      AS cell, v AS c, count(*) OVER () AS n
       |    FROM e
       |  ) WHERE cell < GREATEST(4, LEAST(16, CAST(FLOOR(sqrt(n)) AS BIGINT)))
       |),
       |${(1 to iters).map(round).mkString(",\n")},
       |fin AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_dot_product(e.v, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC,
       |        c.cell DESC) AS rn
       |    FROM e CROSS JOIN c$iters c
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  private[graft] val kmeansFinalCentroids = "c4" // c$iters of [[kmeansCtes]]

  val kmeansSql: String =
    s"""WITH $kmeansCtes
       |SELECT c.cell, coalesce(n.n_members, 0) AS n_members,
       |  round(sqrt(list_dot_product(c.c, c.c)), 4) AS centroid_norm
       |FROM $kmeansFinalCentroids c LEFT JOIN
       |  (SELECT cell, count(*) AS n_members FROM fin GROUP BY 1) n ON n.cell = c.cell""".stripMargin

  /** Refine-stage join hint: the shortlist is ≤ queries×refine rows —
    * broadcast while `refine` keeps it verification-seed-sized, plain
    * keyed join when a caller (the `*_full` exact-parity twins run at
    * refine=∞) makes it corpus-proportional; a forced broadcast there
    * would collect ~10×|corpus| rows of query-vector-carrying
    * candidates to the driver. */
  private def hintShortlist(refine: Int)(df: DataFrame): DataFrame =
    if (refine <= 10000) broadcast(df) else df

  /** In-driver integrity audit over an ANN shortlist — the hash-
    * checkable projection of an approximate result (the judge-gate
    * companion to the spec-level recall pins): per registered query
    * point, `scores_true` re-derives every reported cosine from the
    * RAW vectors inside the same plan (true iff the method returned
    * exact re-ranked scores, never an ADC/prefix/reconstruction
    * estimate), `k_bounded` pins the ≤k contract. Recall itself is
    * parameter- and corpus-dependent on near-uniform synthetic
    * embeddings (measured per-query floors hit 0.0 at default probes),
    * so recall floors stay in the specs where the corpus is pinned;
    * exact-parity lives in the driver gate as the `*_full`
    * registrations (full-recall parameters ≡ brute force, hashed
    * against the exact [[knnSql]] oracle). A query point with an empty
    * shortlist audits vacuously true per-row (documented: LSH buckets
    * can undershoot k) — `method_alive` closes the vacuous-all-true
    * hole: it pins that the method returned SOMETHING across the query
    * set, so a regression to zero results (a broken bucket/cell join)
    * flips every audit row red instead of hashing green. */
  private[graft] def annAudit(spark: SparkSession, dir: String, approx: DataFrame): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("v"))
    val qd = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val checked = approx.join(e, Seq("vec_id"))
      .join(broadcast(qd), Seq("query_id"))
      .groupBy(col("query_id"))
      .agg(min(col("cosine") === round(cosine(col("qv"), col("v")), 4)).as("st"),
        (count(lit(1)) <= lit(5)).as("kb"))
    val total = checked.agg(count(lit(1)).as("n_live")) // 1-row cross below
    qd.select(col("query_id")).join(checked, Seq("query_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("query_id"), coalesce(col("st"), lit(true)).as("scores_true"),
        coalesce(col("kb"), lit(true)).as("k_bounded"),
        (col("n_live") > 0).as("method_alive"))
  }

  val annAuditSql: String =
    """SELECT vec_id AS query_id, true AS scores_true, true AS k_bounded,
      |  true AS method_alive
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_kmeans" -> ((s: SparkSession, d: String) => kmeansQuery(s, d)),
    "vec_knn_graph" -> ((s: SparkSession, d: String) => knnGraph(s, d)),
    "store_vec_search" -> ((s: SparkSession, d: String) => storeVecSearch(s, d)),
    "vec_knn" -> ((s: SparkSession, d: String) => knn(s, d)),
    "vec_range_search" -> ((s: SparkSession, d: String) => rangeSearch(s, d)),
    "vec_dedup_cosine" -> ((s: SparkSession, d: String) => dedupCosine(s, d)),
    "vec_centroids" -> ((s: SparkSession, d: String) => centroids(s, d)),
    // Approximate methods at their production parameters, projected
    // through the in-driver integrity audit (hash-checked)…
    "vec_knn_lsh" -> ((s: SparkSession, d: String) => annAudit(s, d, knnLsh(s, d))),
    "vec_knn_ivf" -> ((s: SparkSession, d: String) => annAudit(s, d, knnIvf(s, d))),
    "vec_knn_ivfpq" -> ((s: SparkSession, d: String) => annAudit(s, d, knnIvfPq(s, d))),
    "vec_knn_sq8" -> ((s: SparkSession, d: String) => annAudit(s, d, knnSq8(s, d))),
    "vec_knn_trunc" -> ((s: SparkSession, d: String) => annAudit(s, d, knnTruncated(s, d))),
    // …and the same machinery at full-recall parameters, where each
    // method provably reduces to brute force and the DuckDB exact-knn
    // oracle hashes the SHORTLIST itself (the spec reductions, now in
    // the driver gate).
    "vec_knn_ivf_full" -> ((s: SparkSession, d: String) => knnIvf(s, d, nprobe = Int.MaxValue)),
    "vec_knn_ivfpq_full" -> ((s: SparkSession, d: String) =>
      knnIvfPq(s, d, nprobe = Int.MaxValue, refine = Int.MaxValue)),
    "vec_knn_sq8_full" -> ((s: SparkSession, d: String) => knnSq8(s, d, refine = Int.MaxValue)),
    "vec_knn_trunc_full" -> ((s: SparkSession, d: String) =>
      knnTruncated(s, d, dims = 64, refine = Int.MaxValue)),
    "vec_knn_lsh_full" -> ((s: SparkSession, d: String) => knnLsh(s, d, nbits = 0)))

  def oracles: Map[String, String] = Map(
    "vec_kmeans" -> kmeansSql,
    "vec_knn_graph" -> knnGraphSql,
    "store_vec_search" -> storeVecSearchSql,
    "vec_knn" -> knnSql,
    "vec_range_search" -> rangeSearchSql,
    "vec_dedup_cosine" -> dedupCosineSql,
    "vec_centroids" -> centroidsSql,
    "vec_knn_lsh" -> annAuditSql,
    "vec_knn_ivf" -> annAuditSql,
    "vec_knn_ivfpq" -> annAuditSql,
    "vec_knn_sq8" -> annAuditSql,
    "vec_knn_trunc" -> annAuditSql,
    "vec_knn_ivf_full" -> knnSql,
    "vec_knn_ivfpq_full" -> knnSql,
    "vec_knn_sq8_full" -> knnSql,
    "vec_knn_trunc_full" -> knnSql,
    "vec_knn_lsh_full" -> knnSql)
}
