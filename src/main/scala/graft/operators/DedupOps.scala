package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over the documents corpus. cognee dedups on
  * content hash at ingest (reference: cognee/modules/ingestion/
  * identify.py:7 + data dedup in modules/data/methods); the brief extends
  * this to the full training-data-pipeline family: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture: no unbounded cross joins anywhere. Pair generation is
  * always an equi-join on a blocking key — the shingle (inverted
  * index), the LSH band bucket, or the SimHash band — so the shuffle is
  * keyed and skew-bounded, and the candidate set stays near-linear in
  * the true-duplicate count (SURVEY.md §5).
  */
object DedupOps {

  private def toks: Column = split(col("text"), " ")

  /** Distinct word-3-shingles per doc: (doc_id, shingle). */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 3),
          i => array_join(slice(col("toks"), i + 1, lit(3)), " ")))).as("shingle"))

  // Batch call sites pin expansion parallelism via the scale-aware
  // Tables.spread (small corpora arrive in one split, so the shingle
  // explode otherwise runs serial); the *Of helpers stay pin-free —
  // streaming reuses them and spread's rdd probe is batch-only.
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    shinglesOf(graft.Tables.spread(spark, load(spark, dir, "documents")))

  /** Exact dedup: md5 content groups with keep-first policy. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  val exactSql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1""".stripMargin

  /** Order-insensitive token-set dedup: groups whose distinct-token
    * fingerprints collide (catches shuffled near-copies). */
  def tokenSet(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(md5(array_join(array_sort(array_distinct(toks)), " ")).as("fp_tokenset"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .filter(col("n_docs") > 1)

  val tokenSetSql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_tokenset,
      |  count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin

  /** Near-dup pairs by word-3-shingle Jaccard ≥ 0.5 via PREFIX-FILTERED
    * candidate generation + exact verification.
    *
    * The naive inverted index joins on the raw shingle, so one
    * corpus-common shingle appearing in df documents lands O(df²)
    * candidate pairs in a single reducer — the scale-killer straggler at
    * 100 TB. Prefix filtering (Bayardo/Ma/Srikant, "Scaling Up All Pairs
    * Similarity Search", WWW'07) bounds the index instead: order shingles
    * by a GLOBAL total order (document frequency ascending, then
    * lexicographic — rarest first) and index only each document's first
    * ⌊(1−τ)·n⌋+1 shingles. Any pair with J ≥ τ has overlap
    * ≥ ⌈τ·max(n₁,n₂)⌉, and two sets with that much overlap must collide
    * inside those prefixes — NO qualifying pair is ever lost, on any
    * corpus (DedupOpsSpec proves it against brute force with a planted
    * 100%-df hot shingle). Corpus-hot shingles sort LAST under the df
    * order, so they fall out of the index and the skewed reducer never
    * forms; candidates then get exact-Jaccard verification on the full
    * shingle sets (same arithmetic as the oracle), so the output is
    * byte-identical to the all-pairs answer. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    sharedPairs(spark, dir)

  // The τ=0.5 corpus pair set is a shared artifact (the TpchGraph
  // discipline): three registered queries derive from it
  // (dedup_ngram_jaccard, dedup_cluster, curate_dedup_apply) — build
  // once per (session, dir, corpus stamp), materialized executor-local.
  private val pairsCache = new graft.graph.SessionDirCache[DataFrame](
    (spark, dir) => ngramJaccardPairs(
      graft.Tables.spread(spark, load(spark, dir, "documents")), 0.5)
      .localCheckpoint(true),
    stamp = graft.graph.SessionDirCache.parquetStamp(Seq("documents")))

  private[operators] def sharedPairs(spark: SparkSession, dir: String): DataFrame =
    pairsCache(spark, dir)

  /** Prefix-filtered candidate index: each doc's ⌊(1−τ)·n⌋+1 globally
    * rarest shingles, keyed by the shingle's 64-bit hash.
    *
    * The prefix lemma needs only A consistent global TOTAL order over
    * shingles — frequency-ascending is the pruning heuristic, not a
    * correctness requirement — so every heavy stage (df count, order,
    * candidate join) runs on xxhash64 longs instead of ~30-byte shingle
    * strings, cutting shuffle volume ~3×. A hash collision merely merges
    * two shingles' df and index keys: the order stays total and global,
    * so recall is untouched, and the (astronomically rare) false
    * candidate is discarded by the exact string-set verification. */
  private[graft] def ngramPrefixIndex(docs: DataFrame, tau: Double): DataFrame =
    prefixIndexOf(hashedShingles(docs), tau)

  private def hashedShingles(docs: DataFrame): DataFrame =
    shinglesOf(docs).select(col("doc_id"), col("shingle"), xxhash64(col("shingle")).as("h"))

  private def prefixIndexOf(sh: DataFrame, tau: Double): DataFrame = {
    val hs = sh.select(col("doc_id"), col("h"))
    val dfreq = hs.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // One hash-agg per doc + an in-row array sort beats two WindowExec
    // sorts over the same partitioning: structs sort by (df, h) — the
    // global rarest-first total order — and the prefix is a slice of
    // the sorted array. +1e-9 guards fp rounding of (1−τ)·n landing a
    // hair under an integer: overshooting only ADDS candidates (safe).
    // `pos` is the element's 1-based rank in the doc's FULL sorted
    // shingle list (prefix = first ⌊(1−τ)n⌋+1 elements, so the in-slice
    // index IS the global-order rank) — the positional suffix bound
    // below needs it.
    hs.join(dfreq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("arr"))
      .select(col("doc_id"),
        posexplode(slice(col("arr"), lit(1),
          (floor(size(col("arr")) * (1 - tau) + 1e-9) + 1).cast("int"))))
      .select(col("doc_id"), col("col.h").as("h"), (col("pos") + 1).as("pos"))
  }

  private[graft] def ngramJaccardPairs(docs: DataFrame, tau: Double): DataFrame = {
    val sh = hashedShingles(docs).persist()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val capped = prefixIndexOf(sh, tau)
    // Candidate pairs WITH their prefix-overlap count cp AND the last
    // match's global-order rank in each doc (a hash agg on the join
    // output — no distinct materialization of the pair set). Positions
    // within a doc are monotone in the ONE global (df, h) order, so the
    // globally-largest common prefix element maximizes pos on BOTH
    // sides at once: max(a.pos)/max(b.pos) are the PPJoin last-match
    // positions without a max_by.
    val cand = capped.as("a").join(capped.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("cp"), max(col("a.pos")).as("i1"), max(col("b.pos")).as("i2"))
    // Suffix-bound pruning (PPJoin, Xiao et al. WWW'08): any overlap
    // element NOT counted by cp lies outside at least one prefix, hence
    // in some doc's suffix, hence sorts STRICTLY AFTER the last counted
    // match in the global order — i.e. after rank i1 in d1 AND after
    // rank i2 in d2. So uncounted overlap ≤ min(n1−i1, n2−i2) (the
    // positional bound, which also subsumes the classic length filter
    // since cp ≤ min(i1, i2)), and independently ≤ max(n1−p1, n2−p2)
    // (two uncounted elements can't sit in OPPOSITE suffixes: u in
    // d1-suffix ∩ d2-prefix and v in d2-suffix ∩ d1-prefix would need
    // u>v and v>u — so all uncounted overlap shares one suffix). J ≥ τ
    // forces total overlap ≥ τ/(1+τ)·(n1+n2); a pair whose best case
    // cp + least(both bounds) can't reach that is provably below τ.
    // A naive min(n1−p1, n2−p2) would over-prune containment pairs
    // (the superset's unique rare shingles fill its prefix and push
    // shared ones out); the positional bound charges those pushes to
    // i2, not to d1's suffix, so it prunes length-skewed noise the
    // max() bound must keep. Hash-collision TIES in (df, h) could in
    // principle blur "strictly after" — at 2⁻⁶⁴ per doc pair that is
    // the same accepted risk class as the merged-df index itself;
    // fp-epsilons only ever widen the candidate set (safe).
    // Measured at sf0.1: 409k raw prefix candidates → ~300 survivors,
    // so the exact verify below is O(true pairs), not O(candidates).
    def plen(n: Column) = floor(n * (1 - tau) + 1e-9) + 1
    // Eagerly materialized: the surviving pair set feeds three consumers
    // (candDocs twice + the verify join) — without the checkpoint the
    // whole candidate pipeline would re-run per consumer.
    val pruned = cand
      .join(cnt.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(cnt.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .filter(col("cp") + least(
          least(col("n1") - col("i1"), col("n2") - col("i2")),
          greatest(col("n1") - plen(col("n1")), col("n2") - plen(col("n2")))) >=
        lit(tau / (1 + tau)) * (col("n1") + col("n2")) - lit(1e-9))
      .select(col("d1"), col("d2"))
      .localCheckpoint(true)
    // Exact verification on the FULL shingle STRING sets of surviving
    // pairs only (the same two-stage shape as minHashLsh; collision-free
    // by construction): values match the all-pairs oracle exactly; the
    // prefix lemma guarantees recall.
    val candDocs = pruned.select(col("d1").as("doc_id")).union(pruned.select(col("d2"))).distinct()
    val sets = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("ss"))
    val inter = size(array_intersect(col("ss1"), col("ss2"))).cast("double")
    val j = inter / (size(col("ss1")) + size(col("ss2")) - inter)
    pruned
      .join(sets.select(col("doc_id").as("d1"), col("ss").as("ss1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("ss").as("ss2")), Seq("d2"))
      .filter(j >= tau)
      .select(col("d1"), col("d2"), round(j, 4).as("jaccard"))
  }

  /** Near-dup CLUSTER RESOLUTION — the dedup ACTION the pair detectors
    * feed: qualifying pairs (the exact prefix-filtered Jaccard
    * machinery, τ = 0.5) union into connected components, and every
    * clustered document resolves to its component's MINIMUM doc_id as
    * the canonical representative — the keep-first policy
    * [[exact]] applies per content hash, lifted to transitive near-dup
    * groups (a≈b, b≈c ⇒ one survivor for {a,b,c} even when a≉c).
    * Output: one row per clustered doc (doc_id, cluster_rep, keep);
    * singletons — docs in no qualifying pair — are implicitly kept and
    * excluded.
    *
    * Scale shape: components run on the PAIR graph only (nodes = docs
    * appearing in ≥ 1 pair — O(true dups), tiny against the corpus);
    * the iterative CC is GraphX over that slice
    * ([[graft.graph.GraphAlgos.connectedComponents]]). Doc ids ride
    * ZERO-PADDED through the string-id graph so the component label
    * (lexicographic min) IS the numeric min the oracle computes. */
  def cluster(spark: SparkSession, dir: String): DataFrame =
    minLabelComponents(sharedPairs(spark, dir).select(col("d1"), col("d2")))
      .select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
      .withColumn("keep", col("doc_id") === col("cluster_rep"))

  /** Min-label propagation over a canonical pair set `(d1, d2)` →
    * `(id, rep)` per clustered node, rep = the component's minimum id
    * (a DF loop, not GraphX: Pregel's per-superstep machinery cost
    * ~3 s on a few hundred edges — a qualifying-pair graph is O(true
    * dups), tiny against the corpus, so every round here is a
    * sub-second keyed join). Each round every node takes the minimum
    * label among itself and its neighbors; convergence in O(component
    * diameter) rounds, checked per round (near-dup components are
    * clique-ish — typically 1-2 rounds). Shared by the text-side
    * [[cluster]] and the embedding-side SemDeDup action
    * ([[CurateOps.semDedup]]), which resolve their pair graphs through
    * the identical discipline. */
  private[graft] def minLabelComponents(pairs: DataFrame): DataFrame = {
    val ue = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .localCheckpoint(true)
    var lab = ue.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("rep")).localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      require(rounds <= 60, "cluster label propagation failed to converge")
      val nbrMin = ue.join(lab.select(col("id").as("b"), col("rep").as("nrep")), Seq("b"))
        .groupBy(col("a")).agg(min(col("nrep")).as("nmin"))
      val next = lab.join(nbrMin.select(col("a").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("nmin"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      changed = next.select(col("id"), col("rep").as("nrep")).join(lab, Seq("id"))
        .filter(col("nrep") =!= col("rep")).count()
      lab = next
    }
    lab
  }

  val clusterSql: String =
    """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) >= 3),
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
      |ue AS (
      |  SELECT d1 AS a, d2 AS b FROM pairs
      |  UNION SELECT d2, d1 FROM pairs
      |),
      |reach(a, b) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM ue) s
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN ue e ON r.b = e.a
      |)
      |SELECT a AS doc_id, min(b) AS cluster_rep, a = min(b) AS keep
      |FROM reach GROUP BY a""".stripMargin

  val ngramJaccardSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS shingle
      |  FROM t, unnest(range(len(toks) - 2)) AS u(i)
      |),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT d1, d2, round(c * 1.0 / (ca.n + cb.n - c), 4) AS jaccard
      |FROM common
      |JOIN cnt ca ON ca.doc_id = d1
      |JOIN cnt cb ON cb.doc_id = d2
      |WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5""".stripMargin

  /** MinHash (64 min-wise hashes) → 16 bands × 4 rows → band-bucket
    * candidate join → exact-Jaccard verification at τ=0.5. The scale
    * path for near-dup at 100 TB: candidates come only from band
    * buckets, verification touches only candidate pairs. The oracle is
    * the exact-Jaccard query: on this corpus LSH recall is exact (gap
    * 0.1↔0.89+ between noise and planted dups; miss probability at
    * j≥0.8 is ≤ 2e-4 per pair).
    */
  // Minwise family h_i(x) = (a_i·x + b_i) mod p, p = 2³¹-1: the mod
  // wrap makes each slot's argmin independent (a plain affine c_i·x+i
  // is monotone in x — every slot picks the same shingle and the 64
  // hashes collapse to one). Products stay < 2^62 — no overflow even
  // under ANSI mode. Constants from a fixed LCG for determinism; shared
  // by the batch LSH and the streaming near-dup twin so their
  // signatures are bit-identical.
  private val minhashP = 2147483647L
  private val (minhashA, minhashB) = {
    val rng = new java.util.Random(42)
    (Array.fill(64)(1L + rng.nextInt(Int.MaxValue - 1)),
      Array.fill(64)(rng.nextInt(Int.MaxValue).toLong))
  }

  /** (doc_id, band, band_sig) per document — the LSH bucketing relation.
    *
    * Computed ENTIRELY in-row (shingle array → 31-bit hashes → 64
    * argmin slots → 16 band-slice hashes, all higher-order array
    * functions over the doc's own text): no explode, no groupBy — a
    * narrow map stage, so the batch path saves the signature shuffle
    * and the STREAMING path can reuse it verbatim ahead of its single
    * stateful operator (a mid-stream collect_list aggregation would be
    * a second stateful op). array_min is order-insensitive, so the
    * slots equal the former explode→collect_list formulation exactly. */
  private[graft] def bandSignaturesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 3),
          i => array_join(slice(col("toks"), i + 1, lit(3)), " "))).as("ss"))
      .select(col("doc_id"),
        transform(col("ss"), s => xxhash64(s).bitwiseAND(lit(0x7fffffffL))).as("hs"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(63)),
          i => array_min(transform(col("hs"),
            h => (h * element_at(lit(minhashA), i + 1) + element_at(lit(minhashB), i + 1)) % minhashP))).as("sig"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        xxhash64(slice(col("sig"), col("band") * 4 + 1, lit(4))).as("band_sig"))

  def minHashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir).persist()
    // 16 bands × 4 rows; band signature hashes the in-band slice. With
    // independent slots, miss probability at the planted j≥0.8 dup band
    // is (1-j⁴)¹⁶ ≤ 2e-4, while j≈0.1 noise pairs collide at 0.16% —
    // ~8× fewer false candidates than a 32×2 shape.
    val bands = bandSignaturesOf(graft.Tables.spread(spark, load(spark, dir, "documents")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      .persist()
    // Exact verification restricted to candidate docs (collision-free:
    // raw shingle sets, not their hashes). The candidate doc set is
    // DUP-PROPORTIONAL — on the operator's real workload (dup-heavy
    // corpora) it approaches the corpus — so the restriction is a keyed
    // semi-join, never a forced broadcast (AQE broadcasts when the
    // candidate set is actually small).
    val candDocs = cand.select(col("d1").as("doc_id")).union(cand.select(col("d2"))).distinct()
    val sets = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("ss"))
    val inter = size(array_intersect(col("ss1"), col("ss2"))).cast("double")
    val j = inter / (size(col("ss1")) + size(col("ss2")) - inter)
    cand
      .join(sets.select(col("doc_id").as("d1"), col("ss").as("ss1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("ss").as("ss2")), Seq("d2"))
      .filter(j >= 0.5)
      .select(col("d1"), col("d2"), round(j, 4).as("jaccard"))
  }

  /** 32-bit SimHash over word hashes; candidate pairs share one of four
    * 8-bit bands, verified at hamming ≤ 3 (pigeonhole: any pair at
    * hamming ≤ 3 shares at least one clean band). The shared hash
    * primitive is the first 8 hex chars of md5(word) — the oracle
    * re-derives the integer with a hex-digit fold, then replays the
    * same bit math. */
  def simHash(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.spread(spark, load(spark, dir, "documents"))
      .select(col("doc_id"), explode(toks).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("wh"))
    val bits = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("j"), col("wh"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(when(expr("shiftright(wh, j) & 1") === 1, 1).otherwise(-1)).as("bal"))
    val sim = bits
      .groupBy(col("doc_id"))
      .agg(sum(when(col("bal") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L)).as("simhash"))
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("shiftright(simhash, band * 8) & 255"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.simhash").as("s1"), col("b.simhash").as("s2")).distinct()
    pairs
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .filter(col("hamming") <= 3)
      .select(col("d1"), col("d2"), col("hamming").cast("long").as("hamming"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s: SparkSession, d: String) => exact(s, d)),
    "dedup_tokenset" -> ((s: SparkSession, d: String) => tokenSet(s, d)),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => ngramJaccard(s, d)),
    "dedup_cluster" -> ((s: SparkSession, d: String) => cluster(s, d)),
    "dedup_minhash_lsh" -> ((s: SparkSession, d: String) => minHashLsh(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => simHash(s, d)))

  val simHashSql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |),
      |wh AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(8),
      |      i -> (strpos('0123456789abcdef', substr(md5(w), CAST(i AS INT) + 1, 1)) - 1) * power(16, 7 - i))) AS BIGINT) AS h
      |  FROM words
      |),
      |bits AS (
      |  SELECT doc_id, j, CAST(sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS bal
      |  FROM wh, unnest(range(32)) AS u(j)
      |  GROUP BY doc_id, j
      |),
      |sim AS (
      |  SELECT doc_id, CAST(sum(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY doc_id
      |),
      |banded AS (
      |  SELECT doc_id, simhash, b, (simhash >> (CAST(b AS INT) * 8)) & 255 AS band_val
      |  FROM sim, unnest(range(4)) AS v(b)
      |),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS s1, b.simhash AS s2
      |  FROM banded a JOIN banded b ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      |)
      |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
      |FROM pairs WHERE bit_count(xor(s1, s2)) <= 3""".stripMargin

  def oracles: Map[String, String] = Map(
    "dedup_simhash" -> simHashSql,
    "dedup_exact" -> exactSql,
    "dedup_tokenset" -> tokenSetSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_cluster" -> clusterSql,
    "dedup_minhash_lsh" -> ngramJaccardSql) // LSH output ≡ exact threshold on this gap (see scaladoc)
}
