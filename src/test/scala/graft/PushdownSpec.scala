package graft

/** Physical-scan lint: the scale story depends on predicates and
  * projections reaching the parquet reader — a scan that reads every
  * column (or every row group) for a selective query silently costs
  * 100x at 100 TB. These specs pin the executed plans' scan nodes, not
  * the operator results.
  */
class PushdownSpec extends SparkSpecBase {

  private def scanInfo(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      .toString.split("\n").filter(_.contains("FileScan")).mkString("\n")

  test("selective date filters push into the parquet scan") {
    // q10: o_orderdate range + l_returnflag equality must be PushedFilters
    val q10 = scanInfo("q10_returns")
    assert(q10.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)")
      || q10.contains("EqualTo(l_returnflag,R)"), s"q10 scan:\n$q10")
    assert(q10.contains("GreaterThanOrEqual(o_orderdate") || q10.contains("o_orderdate"),
      s"q10 orders scan lacks date pushdown:\n$q10")
    // graph_isolated: the 2001+ shipdate predicate reaches lineitem
    val iso = scanInfo("graph_isolated")
    assert(iso.contains("GreaterThanOrEqual(l_shipdate"), s"isolated scan:\n$iso")
  }

  test("the bloom prefilter sits directly above the shingle explode (map side)") {
    // curate_decontaminate_bloom's scale claim IS plan shape: the
    // might_contain probe must filter shingles AT PRODUCTION TIME —
    // directly above the train side's Generate(explode) and below the
    // overlap join — so non-candidate shingles never reach a shuffle.
    // Pin the printed executed plan: a might_contain Filter whose
    // immediate child is the shingle Generate.
    val lines = operators.CurateOps.decontaminateBloom(spark, sf)
      .queryExecution.executedPlan.toString.split("\n")
    val ok = lines.zip(lines.drop(1)).exists { case (f, child) =>
      f.contains("Filter") && f.contains("might_contain") &&
        child.contains("Generate explode")
    }
    assert(ok, s"bloom probe not directly above the shingle explode:\n${
      lines.map(_.take(160)).mkString("\n")}")
  }

  test("the dataset scope pushes the source predicate into the documents scan") {
    // search_chunks_scoped: the datasets filter must reach the parquet
    // reader as an In(source, ...) pushed filter — at 100 TB this is
    // file-level pruning on a source-partitioned layout, not a
    // post-scan filter over the whole corpus.
    val scoped = scanInfo("search_chunks_scoped")
    assert(scoped.contains("In(source, [src1,src2,src3])")
      || scoped.contains("EqualTo(source"), s"scoped scan lacks source pushdown:\n$scoped")
  }

  test("narrow projections prune the parquet read schema") {
    // text_tokens needs doc_id+text only — lang/source/n_chars must not be read
    val tok = scanInfo("text_tokens")
    assert(!tok.contains("n_chars") && !tok.contains("source"),
      s"text_tokens reads pruned-away columns:\n$tok")
    // q1_agg reads a handful of lineitem columns, never the comment-ish wide ones
    val q1 = scanInfo("q1_agg")
    assert(!q1.contains("l_partkey") && !q1.contains("l_suppkey"),
      s"q1_agg reads unused join keys:\n$q1")
    // data_datasets aggregates metadata columns only — the text payload
    // (the overwhelmingly widest column) must never leave the scan
    val ds = scanInfo("data_datasets")
    assert(!ds.contains("text"), s"data_datasets reads the text payload:\n$ds")
    // search_history reads 4 narrow event columns; props/value stay unread
    val hist = scanInfo("search_history")
    assert(!hist.contains("props") && !hist.contains("value"),
      s"search_history reads pruned-away columns:\n$hist")
  }

  test("context render prunes documents before the token explode") {
    // The arrays_overlap prefilter must sit BELOW the Generate (explode)
    // in the optimized plan: the ~100x token inflation runs only on the
    // slice that mentions a query entity. If a rewrite ever hoists the
    // explode above the filter, corpus-scale cost returns silently.
    // The candidate scan is checkpointed inside the full query, so pin
    // the exposed subplan: the explode's subtree must carry the filter.
    val lp = operators.Retrievers
      .mentionCandidates(spark, sf, Seq("spark", "merge"))
      .queryExecution.optimizedPlan
    val generates = lp.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(generates.nonEmpty, "expected the mention explode in the plan")
    generates.foreach { g =>
      val hasOverlapBelow = g.child.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArraysOverlap])
        case _ => false
      }
      assert(hasOverlapBelow,
        s"mention explode is not prefiltered by arrays_overlap:\n$g")
    }
  }
}
