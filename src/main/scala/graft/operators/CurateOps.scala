package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus curation operators (brief: the operations a
  * large-scale training-data pipeline needs beyond the reference's own
  * surface). All selection is content-hash based — deterministic,
  * engine-reproducible (md5), and stable under repartitioning, unlike
  * RNG sampling.
  */
object CurateOps {

  /** Deterministic hash bucket in [0, 100): first 4 md5 hex chars of
    * the text mod 100 — the split/sample primitive. */
  private def bucket: Column =
    conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 100

  /** Quality-gated 20% sample: hash-bucket < 20 AND enough words.
    * The curation shape: cheap filters first (pushed to the scan where
    * possible), then the hash gate — no RNG, so re-runs and retries
    * select identical rows at any scale. */
  def sample(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 20)
      .filter(bucket < 20)
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"))

  val sampleSql: String =
    """SELECT doc_id, lang, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      |FROM documents
      |WHERE len(string_split(text, ' ')) >= 20
      |  AND CAST(list_sum(list_transform(range(4),
      |        i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT) + 1, 1)) - 1)
      |             * power(16, 3 - i))) AS BIGINT) % 100 < 20""".stripMargin

  /** Stratified quota sampling — balance the language mix of a training
    * corpus: English keeps a 30% hash-bucket slice, every other
    * language keeps 10% (the up/down-weighting primitive of corpus
    * mixing). Same content-hash determinism as [[sample]]: quotas are
    * stable under retries and repartitioning. Returns per-language
    * kept counts. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .filter(when(col("lang") === "en", bucket < 30).otherwise(bucket < 10))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  val sampleStratifiedSql: String =
    """WITH b AS (
      |  SELECT lang,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_docs FROM b
      |WHERE (lang = 'en' AND bucket < 30) OR (lang <> 'en' AND bucket < 10)
      |GROUP BY lang""".stripMargin

  /** Deterministic train/val/test assignment (80/10/10 by hash bucket)
    * with per-split stats — the split is a pure function of content, so
    * it survives re-ingestion and dedup reshuffles. */
  def split3(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_words"))

  val split3Sql: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words
      |FROM b GROUP BY 1""".stripMargin

  /** Decontamination: train-split documents sharing at least one word
    * 8-gram with the eval set (source src0 stands in for the benchmark
    * corpus). The overlap join is an equi-join on the shingle inverted
    * index — the only scalable shape for cross-corpus n-gram
    * contamination checks. */
  private[graft] def shingles8(df: DataFrame): DataFrame = df
    .select(col("doc_id"), split(col("text"), " ").as("toks"))
    .filter(size(col("toks")) >= 8)
    .select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(0), size(col("toks")) - 8),
        i => array_join(slice(col("toks"), i + 1, lit(8)), " ")))).as("shingle"))

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    // spread AFTER the pushable source filter (pushdown preserved);
    // the 8-gram explode then parallelizes on small single-split corpora
    val evalSh = shingles8(graft.Tables.spread(spark, docs.filter(col("source") === "src0")))
      .select(col("shingle")).distinct()
    val trainSh = shingles8(graft.Tables.spread(spark, docs.filter(col("source") =!= "src0")))
    trainSh.join(evalSh, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
  }

  /** [[decontaminate]]'s 100 TB shape: the eval set is benchmark-sized
    * (bounded) while the train corpus is the 100 TB side, so shuffling
    * every train shingle into the overlap join pays the whole corpus
    * through the exchange to reject almost all of it. Build a Bloom
    * filter over the eval shingle hashes (one distributed aggregate →
    * one bounded binary, ≤ 8 MB by construction — the same driver-held
    * small-artifact contract as the collected k-means centroids) and
    * PREFILTER the train shingles with `might_contain` in the scan
    * stage: non-candidate shingles never reach the shuffle. False
    * positives (rate set at 16 bits/item, ~0.05%) are discarded by the
    * exact join that follows, so the result is byte-identical to the
    * exact path — same oracle. This is Catalyst's own runtime
    * row-level-filter pattern ([[org.apache.spark.sql.graft.SketchExpressions]]),
    * applied where the optimizer can't see it (the "small side" is a
    * derived shingle set, not a join of base tables). */
  /** The eval-side screen artifact — (checkpointed distinct eval
    * shingles, their count, the trained Bloom bytes) — built ONCE per
    * (session, dir, corpus stamp) like the repo's other stamped shared
    * artifacts. Previously every invocation re-checkpointed the shingle
    * set and left the blocks to the ContextCleaner; a bench run's 3+
    * passes accumulated checkpoint blocks for GC to chase. */
  private val bloomScreenCache =
    new graft.graph.SessionDirCache[(DataFrame, Long, Array[Byte])](
      (spark, dir) => {
        import org.apache.spark.sql.graft.SketchExpressions
        val docs = load(spark, dir, "documents")
        val evalSh = shingles8(
          graft.Tables.spread(spark, docs.filter(col("source") === "src0")))
          .select(col("shingle")).distinct()
          .localCheckpoint(true) // reused every call: bloom build + exact verify
        val nEval = evalSh.count()
        val bloom = if (nEval == 0) Array.empty[Byte]
        else {
          val bits = math.min(math.max(nEval * 16L, 1024L), 64L * 1024 * 1024)
          evalSh.agg(SketchExpressions.bloomAgg(xxhash64(col("shingle")), nEval, bits))
            .collect()(0).getAs[Array[Byte]](0)
        }
        (evalSh, nEval, bloom)
      },
      stamp = graft.graph.SessionDirCache.parquetStamp(Seq("documents")))

  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.SketchExpressions
    val docs = load(spark, dir, "documents")
    val (evalSh, nEval, bloom) = bloomScreenCache(spark, dir)
    val trainSh = shingles8(graft.Tables.spread(spark, docs.filter(col("source") =!= "src0")))
    if (nEval == 0) // empty eval set: nothing can be contaminated
      return trainSh.limit(0).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_contaminated_shingles"))
    trainSh
      .filter(SketchExpressions.mightContain(bloom, xxhash64(col("shingle"))))
      .join(evalSh, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
  }

  val decontaminateSql: String =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 8),
      |sh AS (
      |  SELECT DISTINCT doc_id, source, array_to_string(toks[(i + 1):(i + 8)], ' ') AS shingle
      |  FROM t, unnest(range(len(toks) - 7)) AS u(i)
      |),
      |eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
      |SELECT s.doc_id, count(*) AS n_contaminated_shingles
      |FROM sh s JOIN eval_sh e USING (shingle)
      |WHERE s.source <> 'src0'
      |GROUP BY s.doc_id""".stripMargin

  /** FUZZY decontamination — near-duplicate contamination between the
    * training split and the eval source (the screen exact 8-gram
    * overlap misses: paraphrased or lightly-edited eval leakage).
    * Built on the LOSSLESS prefix-filtered pair machinery
    * ([[graft.operators.DedupOps.ngramJaccardPairs]]: Bayardo prefix
    * filter + PPJoin positional bound + exact trigram-Jaccard verify),
    * so every pair with J ≥ τ is found on ANY corpus — unlike the
    * earlier minhash-band candidate pass, whose detection probability
    * at j = τ = 0.5 was only ~0.65 (it matched the exact-threshold
    * oracle solely because this corpus's planted cross-source dups sit
    * at j ≥ 0.97). The qualifying pairs are then oriented bipartite —
    * exactly one endpoint in the eval source — and rolled up per train
    * doc: the count of matching eval docs and the worst (max)
    * similarity. Scale shape inherited from the pair generator:
    * hashed-long prefix index, no hot-shingle reducer, candidate
    * verification O(true pairs); no driver-side candidate broadcast. */
  def decontaminateFuzzy(spark: SparkSession, dir: String,
      tau: Option[Double] = None): DataFrame = {
    val docs = load(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    // At the shared artifact's τ=0.5 this is the FOURTH consumer of
    // DedupOps.sharedPairs — rebuilding the prefix-filter machinery per
    // call re-paid the whole pair generation on every warm pass (~2.2 s
    // of the query's 2.5 s at sf0.1). `None` (the default) = the shared
    // τ=0.5 artifact; `Some(t)` derives fresh — an Option, not a
    // float-equality sentinel, so a derived 0.5000000000000001 cannot
    // silently bypass the cache (see [[semDedup]]).
    val pairs = tau match {
      case None    => DedupOps.sharedPairs(spark, dir)
      case Some(t) => DedupOps.ngramJaccardPairs(graft.Tables.spread(spark, docs), t)
    }
    // max of 4dp-rounded pair scores ≡ 4dp-rounded max (rounding is
    // monotone), so the rollup matches the oracle's round(max(j), 4).
    pairs
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), Seq("d1"))
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), Seq("d2"))
      .filter((col("s1") === "src0") =!= (col("s2") === "src0"))
      .select(when(col("s1") === "src0", col("d2")).otherwise(col("d1")).as("train_id"),
        col("jaccard"))
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_dups"), max(col("jaccard")).as("max_jaccard"))
  }

  val decontaminateFuzzySql: String =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, source, list_distinct(list_transform(range(len(toks) - 2),
      |    i -> array_to_string(toks[(i + 1):(i + 3)], ' '))) AS ss
      |  FROM t
      |),
      |e AS (SELECT * FROM sh WHERE source = 'src0'),
      |tr AS (SELECT * FROM sh WHERE source <> 'src0'),
      |p AS (
      |  SELECT tr.doc_id AS train_id, e.doc_id AS eval_id,
      |    len(list_intersect(tr.ss, e.ss)) * 1.0
      |      / (len(tr.ss) + len(e.ss) - len(list_intersect(tr.ss, e.ss))) AS j
      |  FROM tr, e
      |)
      |SELECT train_id, count(*) AS n_eval_dups, round(max(j), 4) AS max_jaccard
      |FROM p WHERE j >= 0.5 GROUP BY train_id""".stripMargin

  /** Contiguous sequence packing: documents (in deterministic doc_id
    * order) are packed into fixed 512-token training sequences by
    * cumulative token count — bin = floor((running - own)/512).
    * Returns per-bin stats.
    *
    * The running sum is the classic two-pass distributed prefix sum,
    * never a no-partition window (which would pull the whole corpus
    * through one task): [[packRunning]] buckets rows into ordered
    * ranges, cumsums within each bucket in parallel, and rebases each
    * bucket by the broadcast total of all earlier buckets — identical
    * output to a global-window cumsum at any partition count. */
  def pack(spark: SparkSession, dir: String, budget: Int = 512, numParts: Int = 32): DataFrame =
    packRunning(spark, dir, numParts)
      .withColumn("bin", floor((col("running") - col("n_tokens")) / budget))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))

  /** Distributed running token sum in doc_id order (exposed for the
    * packing spec, which asserts >1 bucket carries rows and the rebased
    * sum matches a single-window reference).
    *
    * Buckets are a pure function of doc_id against the broadcast
    * (min, max) id bounds — no sampling, no spark_partition_id — so a
    * recomputed branch can never disagree with the offsets branch. */
  def packRunning(spark: SparkSession, dir: String, numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bounds = base.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val withPid = base.crossJoin(broadcast(bounds))
      .withColumn("pid",
        floor((col("doc_id") - col("lo")) * numParts / (col("hi") - col("lo") + 1)).cast("int"))
      .drop("lo", "hi")
    // Pass 1: per-bucket totals → cumulative offset of earlier buckets
    // (a window over numParts rows). The all-zero partition key is
    // derived from pid — non-foldable, so it survives optimization and
    // the window stays a partitioned plan node (a bare literal key gets
    // constant-folded away).
    val offsets = withPid.groupBy(col("pid")).agg(sum(col("n_tokens")).as("part_total"))
      .withColumn("offset",
        coalesce(sum(col("part_total")).over(
          Window.partitionBy(length(col("pid").cast("string")) * lit(0))
            .orderBy(col("pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    // Pass 2: parallel within-bucket cumsum, rebased by the bucket offset.
    val localW = Window.partitionBy(col("pid")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid.withColumn("local_running", sum(col("n_tokens")).over(localW))
      .join(broadcast(offsets), Seq("pid"))
      .select(col("doc_id"), col("n_tokens"), col("pid"),
        (col("local_running") + col("offset")).as("running"))
  }

  /** Token-budget selection: fill a fixed training-token budget with
    * documents in deterministic doc_id order (the mixture-building
    * primitive next to [[pack]] — "give me the first N tokens of this
    * corpus, reproducibly"); reports the per-source composition of the
    * selected set. Reuses the two-pass distributed prefix sum — no
    * global window at any scale. */
  def budget(spark: SparkSession, dir: String, budgetTokens: Long = 20000L): DataFrame =
    packRunning(spark, dir)
      .filter(col("running") <= budgetTokens)
      .join(load(spark, dir, "documents").select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  val budgetSql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, source
      |  FROM documents
      |),
      |r AS (
      |  SELECT doc_id, n_tokens, source,
      |    sum(n_tokens) OVER (ORDER BY doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM t
      |)
      |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM r WHERE running <= 20000 GROUP BY 1""".stripMargin

  val packSql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    sum(n_tokens) OVER (ORDER BY doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM t
      |)
      |SELECT CAST(floor((running - n_tokens) / 512) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS first_doc
      |FROM r GROUP BY 1""".stripMargin

  /** Default mixture: src0 is the eval holdout (weight 0 — never in a
    * training mix), src1 is upsampled 2.5×, src2 1.3×, src3 kept at
    * 40%, everything else passes through at 1×. */
  val defaultMixWeights: Map[String, Int] =
    Map("src0" -> 0, "src1" -> 250, "src2" -> 130, "src3" -> 40)

  /** Domain-mixture materialization — the corpus-reweighting step of a
    * training-data pipeline (DoReMi-style domain weights, epoching the
    * underrepresented sources and thinning the overrepresented ones).
    *
    * Weights are INTEGER PERCENT multiplicities: a doc in a weight-w
    * source appears ⌊w/100⌋ guaranteed epochs plus one more iff its
    * content-hash bucket < w mod 100 — so the realized multiplicity is
    * deterministic per document (same rows on every retry and at any
    * partitioning), yet the expected per-source volume is exactly
    * w/100 × |source|. Fractional sampling reuses [[bucket]], the same
    * md5 primitive as sample/split, so mixture membership is consistent
    * with split assignment across the suite.
    *
    * Scale shape: the weight table is a broadcast dimension (a when()
    * chain would re-compile per vocabulary change; a shuffle join would
    * move the corpus for a dimension of a few hundred rows), and the
    * epoch fan-out is a per-row explode — the whole mixture is a single
    * narrow map stage over the corpus scan, zero shuffles at any scale. */
  def mix(spark: SparkSession, dir: String,
      weights: Map[String, Int] = defaultMixWeights): DataFrame = {
    import spark.implicits._
    val wdf = weights.toSeq.toDF("source", "wt")
    load(spark, dir, "documents")
      .join(broadcast(wdf), Seq("source"), "left")
      .withColumn("wt", coalesce(col("wt"), lit(100)))
      .withColumn("m",
        floor(col("wt") / 100) + when(bucket < col("wt") % 100, 1L).otherwise(0L))
      .filter(col("m") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("m"))).as("epoch"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
  }

  /** Temperature-based domain rebalancing — the multilingual-corpus
    * sampling rule (XLM-R, Conneau et al. 2020; mT5): sampling mass
    * qᵢ ∝ pᵢ^α with α = 0.3 flattens the LANGUAGE distribution, so
    * low-resource languages are upsampled and the dominant one
    * thinned, with the TOTAL volume preserved. Unlike [[mix]] the
    * weights are DERIVED from the corpus itself: per-language
    * multiplicity mᵢ = qᵢ·N/nᵢ, realized as the same integer-percent +
    * hash-bucket-fractional rule (⌊wᵢ/100⌋ epochs plus one iff
    * bucket < wᵢ mod 100, wᵢ = ⌊100·mᵢ⌋) — fully deterministic per
    * document, no RNG. (Keyed on `lang`, the skewed dimension of this
    * corpus — `source` is uniform here, which would degenerate to the
    * identity mixture and park every weight on the 100.0 floor
    * boundary.)
    *
    * Scale shape: one per-language count aggregate (map-side partial),
    * one 1-row (total, Σnᵢ^α) aggregate over the language dim, the
    * derived weight table broadcast back into the corpus scan, then the
    * [[mix]] narrow epoch fan-out — the corpus itself never shuffles. */
  def mixTemperature(spark: SparkSession, dir: String, alpha: Double = 0.3): DataFrame = {
    val docs = load(spark, dir, "documents")
    val langStats = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val totals = langStats.agg(sum(col("n")).as("total"),
      sum(pow(col("n"), lit(alpha))).as("sum_pow"))
    val wdim = langStats.crossJoin(broadcast(totals))
      .select(col("lang"),
        floor(pow(col("n"), lit(alpha)) / col("sum_pow") * col("total") / col("n") * 100)
          .cast("long").as("wt"))
    docs.join(broadcast(wdim), Seq("lang"))
      .withColumn("m",
        floor(col("wt") / 100) + when(bucket < col("wt") % 100, 1L).otherwise(0L))
      .filter(col("m") > 0)
      .select(col("doc_id"), col("lang"), col("wt"),
        explode(sequence(lit(1L), col("m"))).as("epoch"))
  }

  val mixTemperatureSql: String =
    """WITH s AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |t AS (SELECT sum(n) AS total, sum(power(n, 0.3)) AS sum_pow FROM s),
      |w AS (SELECT lang, CAST(floor(power(n, 0.3) / sum_pow * total / n * 100) AS BIGINT) AS wt
      |      FROM s, t),
      |m AS (
      |  SELECT doc_id, d.lang AS lang, wt,
      |    wt // 100 + CASE WHEN CAST(list_sum(list_transform(range(4),
      |        i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT) + 1, 1)) - 1)
      |             * power(16, 3 - i))) AS BIGINT) % 100 < wt % 100 THEN 1 ELSE 0 END AS m
      |  FROM documents d JOIN w ON w.lang = d.lang
      |)
      |SELECT doc_id, lang, wt, e AS epoch
      |FROM m, unnest(generate_series(CAST(1 AS BIGINT), CAST(m AS BIGINT))) AS u(e)""".stripMargin

  val mixSql: String =
    """WITH w AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 250
      |                WHEN 'src2' THEN 130 WHEN 'src3' THEN 40 ELSE 100 END AS wt,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) % 100 AS bucket
      |  FROM documents
      |),
      |m AS (
      |  SELECT doc_id, source, n_tokens,
      |    wt // 100 + CASE WHEN bucket < wt % 100 THEN 1 ELSE 0 END AS m
      |  FROM w
      |)
      |SELECT doc_id, source, e AS epoch, n_tokens
      |FROM m, unnest(generate_series(CAST(1 AS BIGINT), CAST(m AS BIGINT))) AS u(e)""".stripMargin

  /** Duplicated-SPAN measurement (Lee et al., ACL 2022 — "Deduplicating
    * Training Data Makes Language Models Better": exact substring
    * duplication at fixed token granularity, the ExactSubstr criterion
    * every serious pretraining corpus applies on top of document-level
    * dedup): per document, the tokens covered by some word-8-gram that
    * also occurs in ANOTHER document — the span mass ExactSubstr would
    * cut, reported as count + fraction. [[graft.operators.TextOps.dupFraction]]
    * is the SHINGLE-count signal; this is the TOKEN-coverage action
    * measure (a duplicated shingle at position i covers tokens
    * [i, i+7]; overlapping spans union, not sum).
    *
    * Scale shape: one tokenize+shingle explode (spread-pinned), one
    * shingle-keyed distinct-doc aggregate (map-side partials absorb
    * hot boilerplate), one semi-join back, an 8× position explode with
    * per-doc distinct for the coverage union — O(total shingles),
    * never pairwise, no suffix array (the paper's suffix automaton is
    * a single-node construction; the shingle-cover relaxation is the
    * standard distributed equivalent at fixed granularity). */
  def dedupSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val ts = split(col("text"), " ")
    val p = graft.Tables.spread(spark, docs)
      .select(col("doc_id"), ts.as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(sequence(lit(0), size(col("toks")) - 8)).as("i"),
        col("toks"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("toks"), col("i") + 1, lit(8)), " ").as("shingle"))
    val dup = p.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
      .select(col("shingle"))
    val covered = p.join(dup, Seq("shingle"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + 7)).as("t"))
      .distinct()
    val perDoc = covered.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    docs.select(col("doc_id"), size(ts).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_tokens"),
        (floor(coalesce(col("n_dup"), lit(0L)) * lit(10000.0) / col("n_tokens")) / 10000)
          .as("dup_token_frac"))
  }

  val dedupSpansSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, i, array_to_string(toks[(i + 1):(i + 8)], ' ') AS shingle
      |  FROM t, unnest(range(len(toks) - 7)) AS u(i)
      |  WHERE len(toks) >= 8
      |),
      |dup AS (SELECT shingle FROM p GROUP BY shingle HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (
      |  SELECT DISTINCT doc_id, tt
      |  FROM p JOIN dup USING (shingle), unnest(range(i, i + 8)) AS v(tt)
      |),
      |pd AS (SELECT doc_id, count(*) AS n_dup FROM cov GROUP BY 1)
      |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(pd.n_dup, 0) AS BIGINT) AS n_dup_tokens,
      |  floor(coalesce(pd.n_dup, 0) * 10000.0 / len(toks)) / 10000 AS dup_token_frac
      |FROM t LEFT JOIN pd USING (doc_id)""".stripMargin

  /** APPLY the dedup decisions — the filtered-corpus ledger that closes
    * the detect → cluster → drop pipeline: per source, how many docs
    * survive after removing (a) exact duplicates beyond each content
    * hash's keep-first doc ([[DedupOps.exact]]'s policy) and (b)
    * near-dup cluster members beyond the cluster representative
    * ([[DedupOps.cluster]]'s keep-one). The two drop sets OVERLAP
    * (an exact dup is also a J=1.0 near-dup), so the ledger counts
    * their distinct union — never a doc twice.
    *
    * Scale shape: exact drops are one hash-keyed aggregate joined back
    * (doc_id ≠ keep_doc_id); near drops come from the pair-graph loop
    * (O(true dups)); the union is dropped-id-sized, broadcast-semi-
    * joinable against the corpus; the ledger is one keyed aggregate. */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val exactKeep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_doc_id"))
    val exactDropped = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(exactKeep, Seq("h"))
      .filter(col("doc_id") =!= col("keep_doc_id")).select(col("doc_id"))
    val nearDropped = DedupOps.cluster(spark, dir)
      .filter(!col("keep")).select(col("doc_id"))
    val dropped = exactDropped.union(nearDropped).distinct()
      .withColumn("is_dropped", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dropped"), lit(0L))).as("n_dropped"),
        (count(lit(1)) - sum(coalesce(col("is_dropped"), lit(0L)))).as("n_kept"))
  }

  val dedupApplySql: String =
    """WITH RECURSIVE exact_keep AS (
      |  SELECT md5(text) AS h, min(doc_id) AS keep_doc_id FROM documents GROUP BY 1
      |),
      |exact_dropped AS (
      |  SELECT d.doc_id FROM documents d JOIN exact_keep k ON md5(d.text) = k.h
      |  WHERE d.doc_id <> k.keep_doc_id
      |),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS shingle
      |  FROM t, unnest(range(len(toks) - 2)) AS u(i)
      |),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |pairs AS (
      |  SELECT d1, d2 FROM common
      |  JOIN cnt ca ON ca.doc_id = d1
      |  JOIN cnt cb ON cb.doc_id = d2
      |  WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
      |),
      |ue AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM ue) s
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN ue e ON r.b = e.a
      |),
      |near_dropped AS (
      |  SELECT a AS doc_id FROM reach GROUP BY a HAVING a <> min(b)
      |),
      |dropped AS (
      |  -- explicit DISTINCT over UNION ALL: DuckDB's plain UNION failed to
      |  -- dedup here when one branch feeds from the recursive reach CTE
      |  -- (observed at sf0.1: 252 rows / 244 distinct), inflating the
      |  -- census; the Spark side was already a distinct union.
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_id FROM exact_dropped UNION ALL SELECT doc_id FROM near_dropped)
      |)
      |SELECT d.source, count(*) AS n_docs,
      |  count(x.doc_id) AS n_dropped,
      |  count(*) - count(x.doc_id) AS n_kept
      |FROM documents d LEFT JOIN dropped x ON d.doc_id = x.doc_id
      |GROUP BY d.source""".stripMargin

  /** SemDeDup — the embedding-space dedup ACTION (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus embeddings with k-means, and
    * WITHIN each cluster drop all but one member of every group of
    * pairs above cosine τ. This closes the embedding-dedup loop the
    * way [[dedupApply]] closed the text loop — [[VectorOps]] detects
    * (cells, cosines), [[DedupOps.minLabelComponents]] resolves the
    * pair graph to one kept representative (the component's min
    * vec_id — the paper keeps an arbitrary member; min-id is the
    * deterministic choice every engine re-derives), and the ledger
    * reports per-label survival.
    *
    * Cells come from the SHARED trained quantizer
    * ([[VectorOps.cellAssignments]] — the same training the
    * `vec_kmeans` query hash-checks), so the dedup decision is itself
    * gated against training drift. Within-cell-only comparison is the
    * paper's approximation (a cross-cell pair ≥ τ is NOT dropped);
    * that is the semantics, not a shortcut — the exact-across-cells
    * variant is [[VectorOps.dedupCosine]]'s pair set.
    *
    * Scale shape: the pair stage is an EQUI-join on the cell key
    * (hash-partitions at any corpus size, never a nested loop); cell
    * populations are ~n/k with k→√n at scale, which is exactly the
    * knob the paper turns to keep within-cell pairs tractable.
    * Components run on the qualifying-pair graph only (O(true dups));
    * the ledger is one keyed aggregate. */
  private def semDedupDropped(spark: SparkSession, dir: String, tau: Double): DataFrame = {
    val a = VectorOps.cellAssignments(spark, dir)
    val lhs = a.select(col("cell"), col("vec_id").as("d1"), col("v").as("v1"))
    val rhs = a.select(col("cell"), col("vec_id").as("d2"), col("v").as("v2"))
    val pairs = lhs.join(rhs, Seq("cell"))
      .filter(col("d1") < col("d2"))
      .filter(round(VectorOps.cosine(col("v1"), col("v2")), 4) >= tau)
      .select(col("d1"), col("d2"))
    DedupOps.minLabelComponents(pairs)
      .filter(col("id") =!= col("rep"))
      .select(col("id").as("vec_id"), lit(1L).as("is_dropped"))
  }

  // The default-τ dedup DECISION SET is a derived corpus artifact —
  // the SemDeDup ACTION's output that every downstream curation step
  // (census here, a filtered-corpus writer in a real pipeline) reuses —
  // so it follows the repo's stamped-session-artifact discipline like
  // DedupOps' τ=0.5 text pair set: built once per (session, dir,
  // corpus stamp), O(true dups) rows, executor-local blocks. A custom
  // τ derives fresh.
  private val semDedupDroppedCache = new graft.graph.SessionDirCache[DataFrame](
    (spark, dir) => semDedupDropped(spark, dir, 0.4).localCheckpoint(true),
    stamp = graft.graph.SessionDirCache.parquetStamp(Seq("embeddings")))

  /** `tau = None` (the default) routes through the stamped shared
    * decision-set artifact at the default τ=0.4; `Some(t)` derives
    * fresh. An Option, not a sentinel double compared with `==`: an
    * arithmetically-derived 0.4 (e.g. 0.1*4 ≠ 0.4 exactly) must not
    * silently miss the cache and re-pay the full pair generation. */
  def semDedup(spark: SparkSession, dir: String, tau: Option[Double] = None): DataFrame = {
    val a = VectorOps.cellAssignments(spark, dir)
    val dropped = tau match {
      case None    => semDedupDroppedCache(spark, dir)
      case Some(t) => semDedupDropped(spark, dir, t)
    }
    a.select(col("vec_id"), col("label"))
      .join(dropped, Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("is_dropped"), lit(0L))).as("n_dropped"),
        (count(lit(1)) - sum(coalesce(col("is_dropped"), lit(0L)))).as("n_kept"))
  }

  /** All-pairs oracle over the SAME trained cells: the assignment CTE
    * chain is [[VectorOps.kmeansCtes]] VERBATIM (one source of truth —
    * the two oracles cannot drift), then within-cell pairs ≥ τ,
    * recursive min-label reach, per-label survival census. */
  val semDedupSql: String =
    s"""WITH RECURSIVE ${VectorOps.kmeansCtes},
       |pr AS (
       |  SELECT fa.vec_id AS d1, fb.vec_id AS d2
       |  FROM fin fa JOIN fin fb ON fa.cell = fb.cell AND fa.vec_id < fb.vec_id
       |  JOIN e ea ON ea.vec_id = fa.vec_id
       |  JOIN e eb ON eb.vec_id = fb.vec_id
       |  WHERE round(list_dot_product(ea.v, eb.v)
       |        / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 4) >= 0.4
       |),
       |ue AS (SELECT d1 AS a, d2 AS b FROM pr UNION SELECT d2, d1 FROM pr),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM ue) s
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN ue e2 ON r.b = e2.a
       |),
       |dropped AS (
       |  SELECT a AS vec_id FROM reach GROUP BY a HAVING a <> min(b)
       |)
       |SELECT em.label, count(*) AS n_vecs,
       |  count(x.vec_id) AS n_dropped,
       |  count(*) - count(x.vec_id) AS n_kept
       |FROM embeddings em LEFT JOIN dropped x ON em.vec_id = x.vec_id
       |GROUP BY em.label""".stripMargin

  /** Deterministic EPOCH SHUFFLE — the global training-order
    * permutation every pretraining data loader needs ("shuffle the
    * corpus for epoch e, reproducibly, and tell me which shard each
    * example lands in"). The permutation is ORDER BY md5('shuffle:' ||
    * epoch || ':' || doc_id): seeded, uniform, and re-derivable by any
    * engine — no RNG state, so a resumed/retried job shuffles
    * identically.
    *
    * The global position is NOT a global sort: the terasort shape. The
    * md5 key's first two hex digits give 256 uniform range buckets
    * whose numeric order equals the key's lexicographic order (fixed-
    * width lowercase hex), so bucket-count offsets (pass 1: a 256-row
    * aggregate + tiny window) plus a within-bucket rank (pass 2:
    * row_number partitioned by bucket) compose the exact global rank —
    * identical to the packRunning two-pass prefix sum, cost one keyed
    * shuffle at any corpus size, skew-free by construction (md5 is
    * uniform over buckets). Shard = pos DIV 64: contiguous fixed-size
    * output files in shuffled order. */
  def shuffle(spark: SparkSession, dir: String, epoch: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws(":", lit("shuffle"), lit(epoch), col("doc_id")))
    val base = load(spark, dir, "documents")
      .select(col("doc_id"), key.as("k"))
      .withColumn("bucket", conv(substring(col("k"), 1, 2), 16, 10).cast("int"))
    val offsets = base.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(
          Window.partitionBy(length(col("bucket").cast("string")) * lit(0))
            .orderBy(col("bucket").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val local = Window.partitionBy(col("bucket")).orderBy(col("k").asc, col("doc_id").asc)
    base.withColumn("local_rank", row_number().over(local))
      .join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"),
        (col("offset") + col("local_rank") - 1).as("pos"))
      .withColumn("shard", (col("pos") / 64).cast("long"))
  }

  val shuffleSql: String =
    """SELECT doc_id,
      |  row_number() OVER (
      |    ORDER BY md5('shuffle:0:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) - 1 AS pos,
      |  CAST(floor((row_number() OVER (
      |    ORDER BY md5('shuffle:0:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) - 1) / 64)
      |    AS BIGINT) AS shard
      |FROM documents""".stripMargin

  /** EMBEDDING-SPACE diversity balancing — cap how many examples any
    * dense semantic neighborhood contributes to the training mix (the
    * SemDeDup/density-capping curation move: web corpora are dominated
    * by a few over-represented semantic clusters; capping them shifts
    * the mixture toward the tail without pairwise dedup). Neighborhoods
    * are random-hyperplane LSH sign buckets — bit i of the bucket is
    * sign(v[i]) over the first 8 dimensions, the axis-aligned instance
    * of the classic cosine-LSH family — so bucketing is one in-row
    * expression, deterministic, and ANSI-replayable (unlike a trained
    * k-means assignment, which is why the IVF family is rows-only but
    * this is oracle-checked). Each bucket keeps at most 16 examples in
    * seeded md5 order (the corpus determinism rule).
    *
    * Scale shape: the cap runs on the [[org.apache.spark.sql.graft
    * .TopKPerGroup]] bounded-heap operator — per-partition partial
    * heaps of ≤16 rows per bucket, merged once; no per-bucket sort, no
    * window over the full corpus, one keyed shuffle of ≤16·P rows per
    * bucket. A hot bucket (the whole corpus in one neighborhood)
    * still moves only 16 rows per upstream partition. */
  def clusterBalance(spark: SparkSession, dir: String, cap: Int = 16): DataFrame = {
    val e = load(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val bucket = (0 until 8)
      .map(i => when(element_at(col("v"), i + 1) > 0.0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val keyed = e.select(col("vec_id"), bucket.as("bucket"),
      md5(concat_ws(":", lit("balance"), col("vec_id"))).as("k"))
    org.apache.spark.sql.graft.TopKPerGroup(
        keyed, Seq(col("bucket")), Seq(col("k").asc, col("vec_id").asc), cap)
      .select(col("vec_id"), col("bucket"))
  }

  val clusterBalanceSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |),
      |bucketed AS (
      |  SELECT vec_id,
      |    CAST(list_sum(list_transform(range(8),
      |      i -> CASE WHEN v[CAST(i AS INT) + 1] > 0.0 THEN power(2, i) ELSE 0 END)) AS BIGINT)
      |      AS bucket,
      |    md5('balance:' || CAST(vec_id AS VARCHAR)) AS k
      |  FROM e
      |),
      |ranked AS (
      |  SELECT vec_id, bucket,
      |    row_number() OVER (PARTITION BY bucket ORDER BY k ASC, vec_id ASC) AS rk
      |  FROM bucketed
      |)
      |SELECT vec_id, bucket FROM ranked WHERE rk <= 16""".stripMargin

  /** DSIR importance resampling (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how target-domain-like its hashed-n-gram
    * profile is, log w(x) = Σ_f c_f(x)·(ln p̂_target(f) − ln q̂_raw(f)),
    * with p̂/q̂ the Laplace-smoothed hashed-BIGRAM bag distributions
    * (the paper's hashed n-gram feature space; fold16(md5) % buckets is
    * the engine-portable hash). Target slice = the `en` documents (the
    * "quality domain" stand-in); raw = the whole corpus. The k
    * highest-weight documents are the resampled selection — the
    * deterministic top-k instance of the paper's Gumbel resampling
    * (temperature → 0), matching the corpus determinism rule.
    *
    * Scale shape: one token explode into hashed features, two keyed
    * feature aggregations (map-side partials; the feature space is B
    * buckets BY CONSTRUCTION, so the log-ratio table is ≤ B rows and
    * broadcasts — unlike a vocabulary, which never would), per-doc
    * rollup = one keyed aggregation, selection = TakeOrdered over k.
    * Floor-truncated at 4dp before the rank (ln-ulp-proof, the
    * [[graft.operators.TextOps.unigramNll]] precedent). */
  def dsir(spark: SparkSession, dir: String, buckets: Int = 256, k: Int = 50): DataFrame = {
    val ts = split(col("text"), " ")
    val featsCol = transform(sequence(lit(1), size(ts) - 1), i =>
      conv(substring(md5(concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))), 1, 4),
        16, 10).cast("long") % buckets)
    // ONE tokenize+md5 pass (the r10 plan recomputed `feats` for each
    // of its three consumers — 3× the per-occurrence hashing, and the
    // hashing IS the cost): fold occurrences to per-(doc, f) counts
    // immediately (map-side partials; ≤ docs×B rows survive the
    // shuffle) and localCheckpoint the bounded relation so the target/
    // raw/rollup consumers reuse it. Downstream sums weight by `c`,
    // which equals the per-occurrence sums to well under the 4dp floor.
    // Expansion-parallelism pin before the per-occurrence md5 stage
    // (scale-aware: [[graft.Tables.spread]]).
    val occ = graft.Tables.spread(spark, load(spark, dir, "documents"))
      .filter(size(ts) >= 2)
      .select(col("doc_id"), col("lang"), col("source"), explode(featsCol).as("f"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("f"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tCounts = occ.filter(col("lang") === "en")
      .groupBy(col("f")).agg(sum(col("c")).as("ct"))
    val rCounts = occ.groupBy(col("f")).agg(sum(col("c")).as("cr"))
    val tTot = tCounts.agg(sum(col("ct")).as("tt"))
    val rTot = rCounts.agg(sum(col("cr")).as("rt"))
    val ratio = rCounts.join(tCounts, Seq("f"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("f"),
        (log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + buckets))
          - log((col("cr") + 1.0) / (col("rt") + buckets))).as("lr"))
    occ.join(broadcast(ratio), Seq("f"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg((floor(sum(col("lr") * col("c")) * 10000) / 10000).as("logw"))
      .orderBy(col("logw").desc, col("doc_id").asc)
      .limit(k)
  }

  val dsirSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS ts FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2
      |),
      |f AS (
      |  SELECT doc_id, lang, source,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef',
      |              substr(md5(ts[CAST(u AS INT)] || ' ' || ts[CAST(u AS INT) + 1]),
      |                     CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) % 256 AS f
      |  FROM d, unnest(range(1, len(ts))) AS t(u)
      |),
      |tc AS (SELECT f, count(*) AS ct FROM f WHERE lang = 'en' GROUP BY 1),
      |rc AS (SELECT f, count(*) AS cr FROM f GROUP BY 1),
      |tt AS (SELECT sum(ct) AS tt FROM tc),
      |rt AS (SELECT sum(cr) AS rt FROM rc),
      |ratio AS (
      |  SELECT rc.f,
      |    ln((coalesce(ct, 0) + 1.0) / (tt + 256)) - ln((cr + 1.0) / (rt + 256)) AS lr
      |  FROM rc LEFT JOIN tc USING (f), tt, rt
      |),
      |scored AS (
      |  SELECT doc_id, lang, source, floor(sum(lr) * 10000) / 10000 AS logw
      |  FROM f JOIN ratio USING (f) GROUP BY 1, 2, 3
      |)
      |SELECT doc_id, lang, source, logw FROM scored
      |ORDER BY logw DESC, doc_id ASC LIMIT 50""".stripMargin

  /** Cross-dataset vocabulary overlap via MERGEABLE DataSketches HLL —
    * the domain-mixing analytic (how much does src_a's vocabulary
    * overlap src_b's?) computed the 100 TB way: one sketch per source
    * (a map-side-combined aggregate over the token scan), then the
    * pairwise union estimated by MERGING the already-built sketches
    * (`hll_union` — register-max, lossless at equal lgK), never a
    * cross-dataset distinct join. Overlap follows by inclusion-
    * exclusion: |A∩B| = |A| + |B| − |A∪B|. At petabyte scale the
    * sketches are the only thing that moves between datasets — each is
    * ≤ 2^12 registers — and k dataset pairs cost ZERO additional corpus
    * passes beyond the one sketch build.
    *
    * Driver-gate projection (the r13 sketch-graduation pattern): the
    * EXACT per-source and per-pair-union censuses (DuckDB-checkable;
    * the union is two keyed equi-joins — no OR-join) plus an in-plan
    * tolerance audit binding the sketch estimate to the exact union
    * (≤ 5% relative; lgK = 12 ⇒ rsd ≈ 1.6%). A sketch regression flips
    * `sketch_ok` red in the hash gate. The source list is a FIXED
    * 5-element vocabulary, so the pair table is bounded at any scale —
    * the inequality self-pair join is a reviewed tiny-broadcast. */
  def overlapSketch(spark: SparkSession, dir: String): DataFrame = {
    val srcs = (0 until 5).map(i => s"src$i")
    val toks = load(spark, dir, "documents").filter(col("source").isInCollection(srcs))
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("w"))
    val sk = toks.groupBy(col("source"))
      .agg(hll_sketch_agg(col("w"), 12).as("sk"), count_distinct(col("w")).as("n"))
    val pairs = sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk"))).as("est_union"))
    val p = pairs.select(col("src_a"), col("src_b"))
    val ta = p.join(toks.withColumnRenamed("source", "src_a"), Seq("src_a"))
    val tb = p.join(toks.withColumnRenamed("source", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("w"))
    val exact = ta.select(col("src_a"), col("src_b"), col("w")).union(tb)
      .groupBy(col("src_a"), col("src_b")).agg(count_distinct(col("w")).as("n_union"))
    pairs.join(exact, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_union"),
        (col("n_a") + col("n_b") - col("n_union")).as("n_overlap"),
        (abs(col("est_union") - col("n_union")) <= col("n_union") * lit(0.05)).as("sketch_ok"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val overlapSketchSql: String =
    """WITH t AS (
      |  SELECT source, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents WHERE source IN ('src0','src1','src2','src3','src4')
      |),
      |n AS (SELECT source, count(DISTINCT w) AS n FROM t GROUP BY 1),
      |p AS (SELECT a.source AS src_a, b.source AS src_b FROM n a JOIN n b ON a.source < b.source),
      |u AS (
      |  SELECT p.src_a, p.src_b, count(DISTINCT t.w) AS n_union
      |  FROM p JOIN t ON t.source = p.src_a OR t.source = p.src_b
      |  GROUP BY 1, 2
      |)
      |SELECT u.src_a, u.src_b, na.n AS n_a, nb.n AS n_b, u.n_union,
      |  na.n + nb.n - u.n_union AS n_overlap, true AS sketch_ok
      |FROM u
      |JOIN n na ON na.source = u.src_a
      |JOIN n nb ON nb.source = u.src_b
      |ORDER BY u.src_a, u.src_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_overlap_sketch" -> ((s: SparkSession, d: String) => overlapSketch(s, d)),
    "curate_dsir" -> ((s: SparkSession, d: String) => dsir(s, d)),
    "curate_cluster_balance" -> ((s: SparkSession, d: String) => clusterBalance(s, d)),
    "curate_shuffle" -> ((s: SparkSession, d: String) => shuffle(s, d)),
    "curate_dedup_apply" -> ((s: SparkSession, d: String) => dedupApply(s, d)),
    "curate_semdedup" -> ((s: SparkSession, d: String) => semDedup(s, d)),
    "curate_dedup_spans" -> ((s: SparkSession, d: String) => dedupSpans(s, d)),
    "curate_pack" -> ((s: SparkSession, d: String) => pack(s, d)),
    "curate_sample" -> ((s: SparkSession, d: String) => sample(s, d)),
    "curate_sample_stratified" -> ((s: SparkSession, d: String) => sampleStratified(s, d)),
    "curate_split" -> ((s: SparkSession, d: String) => split3(s, d)),
    "curate_mix" -> ((s: SparkSession, d: String) => mix(s, d)),
    "curate_mix_temperature" -> ((s: SparkSession, d: String) => mixTemperature(s, d)),
    "curate_decontaminate" -> ((s: SparkSession, d: String) => decontaminate(s, d)),
    "curate_decontaminate_bloom" -> ((s: SparkSession, d: String) => decontaminateBloom(s, d)),
    "curate_decontaminate_fuzzy" -> ((s: SparkSession, d: String) => decontaminateFuzzy(s, d)),
    "curate_budget" -> ((s: SparkSession, d: String) => budget(s, d)))

  def oracles: Map[String, String] = Map(
    "curate_overlap_sketch" -> overlapSketchSql,
    "curate_dsir" -> dsirSql,
    "curate_cluster_balance" -> clusterBalanceSql,
    "curate_shuffle" -> shuffleSql,
    "curate_dedup_apply" -> dedupApplySql,
    "curate_semdedup" -> semDedupSql,
    "curate_dedup_spans" -> dedupSpansSql,
    "curate_mix" -> mixSql,
    "curate_mix_temperature" -> mixTemperatureSql,
    "curate_pack" -> packSql,
    "curate_sample" -> sampleSql,
    "curate_sample_stratified" -> sampleStratifiedSql,
    "curate_split" -> split3Sql,
    "curate_decontaminate" -> decontaminateSql,
    // the Bloom prefilter is lossless (exact verify downstream), so the
    // oracle is the exact path's SQL verbatim
    "curate_decontaminate_bloom" -> decontaminateSql,
    "curate_decontaminate_fuzzy" -> decontaminateFuzzySql,
    "curate_budget" -> budgetSql)
}
