package graft

import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, Literal, Pmod}

/** Plan lint over the ENTIRE query inventory: institutionalizes the
  * scale audit as CI. Two classes of scale-killer are rejected at the
  * logical-plan level (precise node types, no string matching, no AQE
  * ambiguity):
  *
  *  1. A window with an empty partition spec — funnels the whole input
  *     through one task. No exceptions: every rank in the codebase runs
  *     either partitioned or over an already-bounded (≤k) row set with
  *     a constant partition key.
  *  2. A join with no equality predicate (cartesian shape). Allowed
  *     only for queries that intentionally cross-join a broadcast
  *     side of ≤ a handful of rows (query vectors, tiny node sets,
  *     dimension vocabularies) — reviewed and whitelisted by name.
  */
class PlanLintSpec extends SparkSpecBase {

  // Reviewed tiny-broadcast cross/OR joins: each crosses a ≤25-row
  // broadcast (single query vector, probed cells, nation vocabulary).
  private val tinyBroadcastOk: Set[String] = Set(
    "search_chunks", "search_chunks_scoped", "search_chunks_acl",
    "search_chunks_acl_role", // same 1-row query-vector cross as search_chunks_acl
    "search_summaries", "search_insights", "search_feedback",
    "search_feedback_weighted", // 1-row query-vector cross into the centroid ranking
    "search_completion_context", "search_completion_cot", "search_summary_completion",
    "search_entity", "search_feeling_lucky", "vec_knn", "vec_knn_ivf", "vec_knn_lsh",
    "vec_range_search", // ≤10-row query-vector broadcast crossed into the corpus scan
                        // (the vec_knn shape; the radius filter folds into the join)
    "vec_centroids", "ontology_resolve", "ontology_graph", "graph_metrics", "pipeline_cognify",
    "graph_metrics_full", // crossJoin of five 1-row aggregates into the summary row
    "pipeline_metrics",   // crossJoin of three 1-row aggregates into the metrics row
    "search_context_triplets", // 2-row entity set broadcast across the triplet pass
    "search_context_render",   // crossJoin of two 1-row section aggregates into the context row
    "search_rag_completion",   // 1-row query-vector cross into the chunk scoring
    "search_lexical_bm25",     // 1-row corpus-stats (N/avgdl/df) broadcast into the scan
    "vec_knn_sq8",             // 10-row query set broadcast across the code-table scan (the vec_knn shape)
    "vec_knn_trunc",           // same 10-row query-set broadcast over the prefix scan
    "vec_knn_ivf_full", "vec_knn_ivfpq_full", "vec_knn_sq8_full", "vec_knn_trunc_full",
    "vec_knn_lsh_full",        // exact-parity twins: ≤10-row query-set / bounded probe-set
                               // broadcasts only — the refine-stage shortlist join is
                               // refine-gated to a KEYED join at full recall (corpus-
                               // proportional shortlists are never force-broadcast)
    "vec_knn_ivfpq",           // audit cross of the 1-row liveness aggregate (all five
                               // ANN audits carry it; the other four are listed above)
    "curate_pack", "curate_budget", // 1-row (min,max) id-bounds broadcast (shared prefix-sum helper)
    "curate_mix_temperature", // 1-row (total, Σn^α) aggregate cross into the language weight dim
    "events_rfm",       // 1-row quartile-cutoff aggregate broadcast across the per-user rollup
    "events_heavy_hitters", // 1-row event-total broadcast into the candidate threshold filter
    "data_validate", // two 1-row per-table check aggregates cross-assembled into the report
    "text_unigram_nll", // 1-row corpus-total broadcast into the per-doc rollup
    "text_bigram_nll",  // same 1-row corpus-total broadcast (interpolation denominator)
    "text_tfidf_keywords", // 1-row corpus-size broadcast into the tf⋈df scoring
    "search_hybrid_rrf", // both legs' 1-row broadcasts (query vector; BM25 corpus stats)
    "search_cypher_write", // 1-row write increment ⋈ the id-matched base row: both sides
                           // filter to the same literal id, so constant propagation
                           // rewrites the equi-join condition away — ≤1 row × ≤1 row
    "search_cypher_write_onmatch", // same shape: the template's endpoint gates and the
                                   // ON MATCH prop-set key on literal-id 1-row scans
    "curate_dsir", // two 1-row total-aggregate crossJoins (tt = Σ target counts,
                   // rt = Σ raw counts) broadcast into the ≤256-row log-ratio table
    "curate_overlap_sketch") // inequality self-pair of the 5-row per-source sketch
                             // aggregate (the source list is a fixed vocabulary)

  // A join "has equality" ONLY when some TOP-LEVEL conjunct is an
  // EqualTo — a shuffle/broadcast HASH join key Catalyst can actually
  // use. The r10 loophole: `exists(_.isInstanceOf[EqualTo])` accepted
  // any DESCENDANT EqualTo, so `a =!= b` (= Not(EqualTo)) and
  // OR-of-equalities passed as "has equality" while planning nested
  // loops — vec_knn_graph's corpus×corpus self-join slipped through.
  private def hasEquality(cond: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).exists(c => c.isInstanceOf[EqualTo] ||
      c.isInstanceOf[org.apache.spark.sql.catalyst.expressions.EqualNullSafe])
  }

  // Documented rows-only sketches — EMPTY since r13: the ANN/sketch
  // entries graduated to hash-checked registrations (in-driver
  // integrity/accuracy audits + `*_full` exact-parity twins against the
  // exact knn oracle). The lint machinery stays so a future genuinely
  // oracle-less operator must be listed here deliberately.
  private val rowsOnlyByDesign: Set[String] = Set.empty
    // graph_betweenness graduated to hash-checked in r11: the σ/δ
    // recurrences unroll into staged MATERIALIZED CTEs (kcore precedent)

  test("every registered query has an oracle or is a documented rows-only sketch") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert((noOracle -- rowsOnlyByDesign).isEmpty,
      s"queries without oracle or rows-only justification: ${noOracle -- rowsOnlyByDesign}")
    val staleOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(staleOracles.isEmpty, s"oracles for unregistered queries: $staleOracles")
    assert(rowsOnlyByDesign.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query output has unique column names (driver hashes by sorted name)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sf).columns
      assert(cols.distinct.length === cols.length, s"$name has duplicate columns: ${cols.toList}")
      assert(cols.forall(c => c == c.toLowerCase), s"$name has non-lowercase columns: ${cols.toList}")
    }
  }

  test("no registered query plans a partition-less window") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val lp = fn(spark, sf).queryExecution.optimizedPlan
      val bad = lp.collect { case w: logical.Window if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty, s"$name plans a no-partition window (single-task sort)")
    }
  }

  // The companion rule that closes the constant-key loophole: a window
  // whose every partition expression is EFFECTIVELY constant — foldable,
  // or the repo's own pmod(x, 1) bounded-rank key (constant-valued but
  // deliberately opaque to constant folding) — is the same single-task
  // funnel as a partition-less window. It is legitimate ONLY when the
  // window's subtree has already bounded the rows: a Limit, a global
  // (group-less) aggregate, or a union/join of such. events_rfm's ntile
  // evasion (user-cardinality rows through one constant-keyed sort)
  // becomes impossible, not just fixed once. The optimizer projects
  // window keys into a child Project (`pmod(…) AS _w0`), so attributes
  // are first resolved through the subtree's aliases.
  private def constantPartitionWindows(lp: logical.LogicalPlan): Seq[logical.Window] = {
    def effectivelyConstant(aliases: Map[Long, Expression])(e0: Expression): Boolean = {
      val e = e0 match {
        case ar: AttributeReference => aliases.getOrElse(ar.exprId.id, ar)
        case other => other
      }
      e.foldable || (e match {
        case Pmod(_, Literal(d, _), _) => d == 1
        case _ => false
      })
    }
    lp.collect {
      case w: logical.Window if w.partitionSpec.nonEmpty => w
    }.filter { w =>
      val aliases: Map[Long, Expression] = w.child.collect {
        case p: logical.Project => p.projectList.collect { case a: Alias => a.exprId.id -> a.child }
      }.flatten.toMap
      w.partitionSpec.forall(effectivelyConstant(aliases))
    }
  }

  // Reviewed domain-bounded ranks: the window's input is an aggregate
  // GROUPED on a key whose domain is a fixed small vocabulary (the 25
  // TPC-H nation labels), which the structural check below cannot see.
  // Every addition here needs the same review as tinyBroadcastOk.
  private val domainBoundedRankOk: Set[String] = Set(
    "search_feedback_weighted") // rank over the per-nation-label centroid aggregate (≤25 rows)

  test("no registered query plans a constant-partition window over unbounded rows") {
    def bounded(p: logical.LogicalPlan): Boolean = p match {
      case _: logical.GlobalLimit | _: logical.LocalLimit => true
      case a: logical.Aggregate if a.groupingExpressions.isEmpty => true
      case u: logical.Union => u.children.forall(bounded)
      case j: logical.Join => bounded(j.left) && bounded(j.right)
      case other if other.children.length == 1 => bounded(other.children.head)
      case _ => false
    }
    val violations = SparkEntry.queries.toSeq.collect {
      case (name, fn) if !domainBoundedRankOk(name) =>
        val lp = fn(spark, sf).queryExecution.optimizedPlan
        constantPartitionWindows(lp).filterNot(w => bounded(w.child))
          .map(w => s"$name: ${w.simpleString(80)}")
    }.flatten
    assert(violations.isEmpty,
      "constant-partition windows over unbounded rows (single-task sort):\n" +
        violations.mkString("\n"))
  }

  // The lint itself must reject the evaded shape: a deliberately
  // constant-keyed window over raw (unbounded) parquet rows.
  test("the constant-partition lint catches a pmod(x,1)-keyed window over raw rows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val raw = graft.Tables.load(spark, sf, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(pmod(coalesce(length(col("doc_id").cast("string")), lit(0)), lit(1)))
          .orderBy(col("doc_id"))))
    assert(constantPartitionWindows(raw.queryExecution.optimizedPlan).nonEmpty,
      "the pmod(x,1) key must still be visible to the lint after optimization")
  }

  // A global Sort over raw (unbounded) rows is a full range-shuffle of
  // the dataset. A sort is acceptable when its subtree bounds the data
  // first — a Limit (top-k => TakeOrderedAndProject) or an Aggregate
  // (presentation sort over grouped output). Raw-row global sorts with
  // neither are rejected.
  test("no registered query globally sorts unbounded raw rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val lp = fn(spark, sf).queryExecution.optimizedPlan
      // A Sort directly under a Limit is the top-k idiom (physical
      // TakeOrderedAndProject) — fine. Otherwise the sort's own subtree
      // must bound the rows first (Limit or Aggregate below it).
      def walk(p: logical.LogicalPlan, underLimit: Boolean): Seq[String] = {
        val here = p match {
          case s: logical.Sort if s.global && !underLimit &&
            !s.child.exists(c => c.isInstanceOf[logical.GlobalLimit]
              || c.isInstanceOf[logical.Aggregate]) => Seq(s.simpleString(60))
          case _ => Seq.empty
        }
        // "Under a limit" survives the pruning Projects/Filters Catalyst
        // interposes; any other node breaks the top-k association.
        val nextUnder = p match {
          case _: logical.GlobalLimit | _: logical.LocalLimit => true
          case _: logical.Project | _: logical.Filter => underLimit
          case _ => false
        }
        here ++ p.children.flatMap(walk(_, nextUnder))
      }
      val bad = walk(lp, underLimit = false)
      assert(bad.isEmpty, s"$name globally sorts unbounded raw rows (full range shuffle): $bad")
    }
  }

  // The lint itself must reject the evaded shape: an inequality-only
  // self-join (`=!=` is Not(EqualTo) — a descendant EqualTo that is NOT
  // a usable hash key) must read as cartesian.
  test("the cartesian lint catches an inequality-only (=!=) join") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(spark, sf, "region").select(col("r_regionkey"))
    val j = e.join(e.select(col("r_regionkey").as("other")), col("r_regionkey") =!= col("other"))
    val bad = j.queryExecution.optimizedPlan.collect {
      case jn: logical.Join if !jn.condition.forall(hasEquality) => jn
    }
    assert(bad.nonEmpty, "a =!= b must NOT count as an equality join predicate")
  }

  test("no registered query plans a cartesian join outside the reviewed tiny-broadcast set") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!tinyBroadcastOk(name)) {
        val lp = fn(spark, sf).queryExecution.optimizedPlan
        val bad = lp.collect {
          case j: logical.Join if j.condition.isEmpty => j
          case j: logical.Join if !j.condition.forall(hasEquality) => j
        }
        assert(bad.isEmpty, s"$name plans a join with no equality predicate")
      }
    }
  }

  // The chain-family shuffle elimination rests on Materialize.storedHashed's
  // CLAIMED partitioning being honored by EnsureRequirements: a join keyed
  // on the claim must plan with NO exchange on the stored side (only the
  // probe side moves). A Spark upgrade or a Materialize edit that drops the
  // claim would regress silently — the only symptom would be bench shuffle
  // volume — so the mechanism is pinned here at the physical-plan level.
  test("storedHashed's claimed layout elides the stored side's exchange in a keyed join") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val n = spark.sessionState.conf.numShufflePartitions
    val big = spark.range(0, 10000)
      .select((col("id") % 997).cast("string").as("src"), col("id").cast("string").as("dst"))
    val stored = org.apache.spark.sql.graft.Materialize.storedHashed(
      big.repartition(n, col("src")), n, "src")
    val probe = spark.range(0, 50).select(col("id").cast("string").as("src"))
    val joined = probe.hint("shuffle_hash").join(stored, Seq("src"))
    joined.count() // materialize so AQE finalizes the adaptive plan
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = finalPlan.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.size === 1,
      s"expected exactly ONE exchange (the probe side); got ${exchanges.size}:\n$finalPlan")
    // and the result is correct — the claimed layout matches the rows:
    // keys 0..29 appear 11 times (the 10000 % 997 = 30 remainder), keys
    // 30..49 ten times → 30×11 + 20×10
    assert(joined.count() === 530L)
  }
}
