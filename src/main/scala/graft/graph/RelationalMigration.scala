package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level relational→graph migration — the Spark-native
  * re-expression of cognee's `migrate_relational_database` task with
  * `migrate_column_data=True` (its default; reference:
  * cognee/tasks/ingestion/migrate_relational_database.py:18 and
  * complete_database_ingestion :154-309). The `schema_only=True` half
  * is [[GraphQueries.schemaGraph]]; this is the full projection:
  *
  *   - one `TableType` node per migrated table (:164-171),
  *   - one `TableRow` node per row, id `"<table>:<pk>"` (:193-204),
  *     with the row's columns as its property bag (the reference
  *     stores `properties=str(row_properties)` — a Python dict repr;
  *     here the bag is a typed MAP<STRING,STRING>, the same contract
  *     every other node in [[PropertyGraph]] carries),
  *   - a `is_part_of` edge row→table (:211-222),
  *   - one `ColumnValue` node per DISTINCT (table, column, value) of
  *     every non-key column, shared across rows with equal values
  *     (:238-245 — the reference dedups via its node_mapping dict;
  *     here [[PropertyGraph.mergeNodes]]' id-keyed groupBy is that
  *     dedup, distributed), with a row→value edge labelled by the
  *     column name (:248-258),
  *   - one row→row edge per foreign-key match, labelled by the FK
  *     column (:260-308 — the reference runs a SQL join per FK; here
  *     each FK is a keyed equi-join against the parent table's
  *     distinct key projection).
  *
  * NULL column values produce no ColumnValue node (the reference would
  * mint a `"table:col:None"` node from Python's str(None); the
  * testdata has no NULLs and a typed engine should not invent "None"
  * strings — documented divergence).
  *
  * Scale shape (100 TB): every node/edge family is a narrow projection
  * over a table scan (the column-value family via one explode per
  * table, not one scan per column); the only shuffles are the bulk
  * merge dedups (id-keyed / triplet-keyed groupBy — exactly the
  * reference's batched add_nodes/add_edges + _remove_duplicate_edges
  * at :39-57, which it batches for the same reason) and the per-FK
  * equi-joins. Nothing is driver-sized: this is the corpus-
  * proportional path the bulk mergeNodes/mergeEdges contract exists
  * for.
  */
object RelationalMigration {

  /** (column, referenced table, referenced column) — the reference
    * reads these from the source database's information schema
    * (get_migration_relational_engine extracts `foreign_keys` per
    * table); the testdata parquet has no catalog, so the TPC-H-ish
    * key relationships are declared here. */
  private final case class TableSpec(
      table: String, pk: String, fks: Seq[(String, String, String)])

  // Every testdata table with a SINGLE-column primary key — the
  // reference's scheme (migrate_relational_database.py:184-194 keys the
  // node id on ONE pk column, falling back to the first column).
  // lineitem's key is composite (l_orderkey, l_linenumber), which that
  // scheme would collapse to colliding node ids — excluded, documented.
  private val specs = Seq(
    TableSpec("region", "r_regionkey", Nil),
    TableSpec("nation", "n_nationkey", Seq(("n_regionkey", "region", "r_regionkey"))),
    TableSpec("supplier", "s_suppkey", Seq(("s_nationkey", "nation", "n_nationkey"))),
    TableSpec("customer", "c_custkey", Seq(("c_nationkey", "nation", "n_nationkey"))),
    TableSpec("part", "p_partkey", Nil),
    TableSpec("orders", "o_orderkey", Seq(("o_custkey", "customer", "c_custkey"))))

  private val migratedTables = specs.map(_.table)

  // The migrated graph feeds the census query, CypherLite reads, and
  // repeat verify/bench passes in one process — cache per (session,
  // dir) like TpchGraph, invalidated on parquet change. The cached
  // storage is the narrow string bases of [[tableBasesK]] (the Pinned
  // wrapper releases them on eviction); nodes/edges are lazy rendering
  // projections over them, so a consumer that never reads the props
  // bag (the census) never pays for rendering it.
  private val cache = new SessionDirCache[Pinned[PropertyGraph]](
    (spark, dir) => build(spark, dir),
    stamp = SessionDirCache.parquetStamp(migratedTables))

  /** The migrated property graph (TableType/TableRow/ColumnValue
    * nodes; is_part_of/column/FK edges) — CypherLite-queryable like
    * any other [[PropertyGraph]]. */
  def migratedGraph(spark: SparkSession, dir: String): PropertyGraph = cache(spark, dir).value

  /** Per-table node/edge increment projection — shared verbatim between
    * the batch [[build]] and the streaming CDC twin
    * ([[graft.streaming.EventStream.migrateStream]]), so the stream
    * emits exactly the increments a batch run over its new rows would.
    * `fks` carries (fk column, referenced table, that table's DISTINCT
    * key projection as a single string column `fkv`) — static in the
    * CDC case, where arriving child rows join the already-migrated
    * parent key set. Pure stateless projection + per-FK equi-joins:
    * works identically on a batch table scan and on one micro-batch. */
  private[graft] def tablePart(df: DataFrame, table: String, pk: String,
      fks: Seq[(String, String, DataFrame)]): (DataFrame, DataFrame) =
    tablePartK(df, table, Seq(pk), fks)

  /** Composite-key generalization of [[tablePart]]: the row node id is
    * `tablerow:<table>:<pk1>|<pk2>|…` — a DOCUMENTED EXTENSION of the
    * reference's scheme, which keys node ids on ONE pk column
    * (migrate_relational_database.py:184-194; an unspecified pk falls
    * back to the first column) and would collapse a composite-keyed
    * table's rows onto colliding ids. Rows that still collide on the
    * full composite key collapse keep-first under the bulk merge, like
    * any id collision in this engine.
    *
    * The multi-column rendering is INJECTIVE: each component escapes
    * backslash then pipe (`\` → `\\`, `|` → `\|`) and renders NULL as
    * the unescaped marker `\N` (a literal "\N" value escapes to `\\N`,
    * so the marker cannot be forged) — otherwise concat_ws would drop
    * NULL components and a `|` inside a string key would alias the
    * separator, silently collapsing distinct rows ((1,NULL) vs (NULL,1),
    * ("1|2","3") vs ("1","2|3")). A SINGLE-column key keeps the
    * reference's raw `str(pk)` rendering — ids stay byte-compatible
    * with the faithful migration. */
  private[graft] def tablePartK(df: DataFrame, table: String, pkCols: Seq[String],
      fks: Seq[(String, String, DataFrame)]): (DataFrame, DataFrame) = {
    val emptyBag = map().cast("map<string,string>")
    // Non-key columns migrate as ColumnValue nodes; the pk columns map
    // to the row id and FK columns become row→row edges below
    // (:227-235 skips exactly these two classes — a column that is both
    // a pk component and an FK, like l_orderkey, is skipped too).
    val dataCols = df.columns.filterNot(c => pkCols.contains(c) || fks.exists(_._1 == c))
    def pkComponent(c: String): org.apache.spark.sql.Column = {
      val escaped = regexp_replace(
        regexp_replace(col(c).cast("string"), "\\\\", "\\\\\\\\"), "\\|", "\\\\|")
      coalesce(escaped, lit("\\N"))
    }
    val pkRender =
      if (pkCols.sizeIs == 1) col(pkCols.head).cast("string")
      else concat_ws("|", pkCols.map(pkComponent): _*)
    val rowId = concat(lit("tablerow:" + table + ":"), pkRender)
    val rowName = concat(lit(table + ":"), pkRender)
    val rowProps = map_from_arrays(
      array(df.columns.map(lit(_)): _*),
      array(df.columns.map(c => col(c).cast("string")): _*))

    val rowNodes = df.select(rowId.as("id"), lit("TableRow").as("ntype"),
      rowName.as("name"), rowProps.as("props"))
    val isPartOf = df.select(rowId.as("src"),
      lit("tabletype:" + table).as("dst"), lit("is_part_of").as("rel"),
      emptyBag.as("props"))

    // One explode per table covers every non-key column in a single
    // scan; NULL values carry no node/edge.
    val colEntries = df.select(rowId.as("src"),
        explode(map(dataCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
          .as(Seq("ckey", "cval")))
      .where(col("cval").isNotNull)
    val colId = concat(lit("colval:" + table + ":"), col("ckey"), lit(":"), col("cval"))
    val colNodes = colEntries.select(colId.as("id"), lit("ColumnValue").as("ntype"),
      concat(lit(table + ":"), col("ckey"), lit(":"), col("cval")).as("name"),
      map(lit("table"), lit(table), lit("column"), col("ckey"),
        lit("value"), col("cval")).as("props"))
    val colEdges = colEntries.select(col("src"), colId.as("dst"),
      col("ckey").as("rel"), emptyBag.as("props"))

    // FK edges (:275-308): the reference joins child.fk = parent.ref
    // and emits one edge per match; the parent side reduces to its
    // distinct key projection (same edge set — the target id is the
    // key — one narrow broadcast-able relation instead of the full
    // parent row).
    val fkEdges = fks.map { case (fkCol, refTable, parentKeys) =>
      df.select(rowId.as("src"), col(fkCol).cast("string").as("fkv"))
        .join(parentKeys, Seq("fkv"))
        .select(col("src"),
          concat(lit("tablerow:" + refTable + ":"), col("fkv")).as("dst"),
          lit(fkCol).as("rel"), emptyBag.as("props"))
    }
    (rowNodes.unionByName(colNodes),
      (isPartOf +: fkEdges).reduce(_ unionByName _).unionByName(colEdges))
  }

  /** Narrow-first batch build of one table's migration families — the
    * r15 optimization-round restructure of the BATCH build path only
    * (the streaming CDC twin keeps using [[tablePartK]] +
    * mergeNodes/mergeEdges verbatim; this produces the IDENTICAL graph,
    * proven by the oracle census at sf0.01/sf0.1 and MigrationSpec).
    *
    * Why: the bulk-merge dedup aggregates `min(struct(ntype, name,
    * array_sort(map_entries(props))))` — a complex-typed buffer, which
    * Catalyst can only plan as a SortAggregate, so the old build SORTED
    * millions of map-carrying rendered rows twice (partial + final) per
    * family, then paid the in-memory COLUMNAR cache builder on MAP
    * columns (generic per-value writes, the slowest path the cache
    * builder has) for the full fat relation. Measured at sf0.1:
    * lineitem build 54-107 s cold, and the persisted footprint evicted
    * neighboring artifacts mid-suite (graph_migrate_composite "warm"
    * 8.96 s in-suite vs 0.62 s isolated).
    *
    * Shape (guide §2.3 "shuffle fewer bytes" / §8 "decide with small
    * rows, attach payload once"): every dedup runs FIRST, over narrow
    * string columns (codegen HashAggregates), the persisted bases carry
    * only those narrow columns, and id/name/props rendering happens
    * lazily on read — so the census's column pruning never evaluates
    * the props bag at all, and the cached footprint shrinks by the
    * repeated id prefixes and per-row map overhead.
    *
    * EQUIVALENCE with tablePartK + mergeNodes/mergeEdges:
    *  - id rendering is injective per family (the composite-pk escape
    *    spec pins it), so distinct-on-raw-strings ≡ distinct-on-ids;
    *  - id families are disjoint across kinds and tables (tabletype:/
    *    tablerow:<t>:/colval:<t>:), so the global id-keyed merge dedup
    *    decomposes into these per-family dedups;
    *  - a TableRow id collision (duplicate pk) resolves keep-min by
    *    (ntype, name, key-sorted prop entries); ntype/name are equal
    *    within an id and entry KEYS are the same sorted column names at
    *    every position, so the order reduces to the column-value
    *    strings in sorted-column-name order — exactly the min(struct)
    *    below;
    *  - every edge in this projection carries an empty props bag, so
    *    the triplet merge is a plain distinct.
    * Returns (pins to persist, lazy nodes, lazy edges).
    *
    * `nParts` sizes every persisted base (size-derived from the source
    * table's parquet bytes — [[basePartitions]]): the session default
    * leaves each base at the full shuffle width (AQE's
    * parallelismFirst coalescing keeps 32 post-shuffle partitions for
    * KB-sized relations), and the census union across tables × families
    * then schedules ~900 near-empty tasks PER PASS (measured 3.9-4.8 s
    * warm at sf0.1, pure scheduling). Edge bases store the RENDERED
    * `src` (dedup keys are unchanged — rendering is injective), so warm
    * passes skip the per-row escape regexes too. */
  private def tableBasesK(df: DataFrame, table: String, pkCols: Seq[String],
      fks: Seq[(String, String, DataFrame)], nParts: Int): (Seq[DataFrame], DataFrame, DataFrame) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val emptyBag = map().cast("map<string,string>")
    val dataCols = df.columns.filterNot(c => pkCols.contains(c) || fks.exists(_._1 == c))
    // Everything below compares/renders the CAST-TO-STRING image of the
    // row — the same casts tablePartK applies — so dedups on these
    // columns are dedups on the rendered ids.
    val asStrings = df.select(df.columns.map(c => col(c).cast("string").as(c)).toIndexedSeq: _*)
    // Winner row per pk: min over the non-pk value strings in
    // sorted-column-name order (pk components are constant within a
    // group, so skipping them preserves the keep-min order).
    val nonPk = df.columns.sorted.filterNot(pkCols.contains)
    val rowBase = (if (nonPk.isEmpty) asStrings.distinct()
      else asStrings.groupBy(pkCols.map(col).toIndexedSeq: _*)
        .agg(min(struct(nonPk.map(col).toIndexedSeq: _*)).as("s"))
        .select(df.columns.map(c =>
          if (pkCols.contains(c)) col(c) else col("s." + c).as(c)).toIndexedSeq: _*))
      .coalesce(nParts).persist(lvl)
    // Identical pk rendering to tablePartK, over the already-cast strings.
    def pkComponentS(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val escaped = regexp_replace(
        regexp_replace(c, "\\\\", "\\\\\\\\"), "\\|", "\\\\|")
      coalesce(escaped, lit("\\N"))
    }
    def pkRenderOf(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cols.sizeIs == 1) cols.head
      else concat_ws("|", cols.map(pkComponentS): _*)
    val pkRender = pkRenderOf(pkCols.map(col))
    val rowId = concat(lit("tablerow:" + table + ":"), pkRender)

    val rowNodes = rowBase.select(rowId.as("id"), lit("TableRow").as("ntype"),
      concat(lit(table + ":"), pkRender).as("name"),
      map_from_arrays(
        array(df.columns.map(lit(_)).toIndexedSeq: _*),
        array(df.columns.map(col).toIndexedSeq: _*)).as("props"))
    val isPartOf = rowBase.select(rowId.as("src"),
      lit("tabletype:" + table).as("dst"), lit("is_part_of").as("rel"),
      emptyBag.as("props"))

    // Column-value family: distinct (pk, column, value) BEFORE any map
    // rendering — one narrow exploded scan + hash distinct. The src id
    // is rendered once here (injective ⇒ same dedup), not per read.
    val colEdgeBase = asStrings.select(rowId.as("src"),
        explode(map(dataCols.flatMap(c => Seq(lit(c), col(c))): _*))
          .as(Seq("ckey", "cval")))
      .where(col("cval").isNotNull)
      .distinct()
      .coalesce(nParts).persist(lvl)
    val colBase = colEdgeBase.select(col("ckey"), col("cval")).distinct()
      .coalesce(nParts).persist(lvl)
    val colId = concat(lit("colval:" + table + ":"), col("ckey"), lit(":"), col("cval"))
    val colNodes = colBase.select(colId.as("id"), lit("ColumnValue").as("ntype"),
      concat(lit(table + ":"), col("ckey"), lit(":"), col("cval")).as("name"),
      map(lit("table"), lit(table), lit("column"), col("ckey"),
        lit("value"), col("cval")).as("props"))
    val colEdges = colEdgeBase.select(col("src"), colId.as("dst"),
      col("ckey").as("rel"), emptyBag.as("props"))

    // FK families: distinct (src, fk value), dangling values dropped by
    // a semi-join against the parent's distinct key projection.
    val fkBases = fks.map { case (fkCol, refTable, parentKeys) =>
      val base = asStrings.select(rowId.as("src"), col(fkCol).as("fkv"))
        .distinct()
        .join(parentKeys, Seq("fkv"), "left_semi")
        .coalesce(nParts).persist(lvl)
      (fkCol, refTable, base)
    }
    val fkEdges = fkBases.map { case (fkCol, refTable, base) =>
      base.select(col("src"),
        concat(lit("tablerow:" + refTable + ":"), col("fkv")).as("dst"),
        lit(fkCol).as("rel"), emptyBag.as("props"))
    }

    (Seq(rowBase, colEdgeBase, colBase) ++ fkBases.map(_._3),
      rowNodes.unionByName(colNodes),
      (isPartOf +: fkEdges).reduce(_ unionByName _).unionByName(colEdges))
  }

  /** Size-derived base partition count: one partition per ~2 MB of the
    * source table's parquet (a driver FS listing, like
    * [[SessionDirCache.parquetStamp]]; the exploded column-value base is
    * ~dataCols× the table's rows, and parquet compresses these tables
    * ~10×, so 2 MB of parquet ≈ a few-hundred-thousand-row base
    * partition), floored at 1 and capped at the session parallelism —
    * base partitions grow with the data until the cluster width caps
    * them (the 100 TB posture) while small tables stop paying a 32-task
    * scan per census leg. */
  private def basePartitions(spark: SparkSession, dir: String, table: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = if (fs.exists(p)) fs.listStatus(p).map(_.getLen).sum else 0L
    math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      bytes / (2L << 20) + 1L)).toInt
  }

  private def build(spark: SparkSession, dir: String): Pinned[PropertyGraph] = {
    import spark.implicits._
    val emptyBag = map().cast("map<string,string>")

    // TableType nodes (:164-171): one per table, id keyed by name like
    // the reference's uuid5(NAMESPACE_OID, table_name).
    val typeNodes = migratedTables.toDF("t").select(
      concat(lit("tabletype:"), col("t")).as("id"),
      lit("TableType").as("ntype"), col("t").as("name"), emptyBag.as("props"))

    // Batched bulk merge, narrow-first (see [[tableBasesK]] — same graph
    // as tablePart + mergeNodes/mergeEdges: the reference adds all nodes,
    // then all deduped edges, in one call each; node_mapping dedup and
    // _remove_duplicate_edges are the per-family dedups inside the bases).
    val parts = specs.map { sp =>
      val fks = sp.fks.map { case (fkCol, refTable, refCol) =>
        (fkCol, refTable, graft.Tables.load(spark, dir, refTable)
          .select(col(refCol).cast("string").as("fkv")).distinct())
      }
      tableBasesK(graft.Tables.load(spark, dir, sp.table), sp.table, Seq(sp.pk), fks,
        basePartitions(spark, dir, sp.table))
    }
    Pinned(parts.flatMap(_._1),
      PropertyGraph(
        typeNodes.unionByName(parts.map(_._2).reduce(_ unionByName _)),
        parts.map(_._3).reduce(_ unionByName _)))
  }

  /** Node/edge census read back THROUGH the merged graph (so the
    * bulk-merge dedup itself is oracle-checked): per (kind, label)
    * counts where a node label is `ntype:table[:column]` and an edge
    * label is `rel:source_table`. */
  def migrateCensus(spark: SparkSession, dir: String): DataFrame =
    census(migratedGraph(spark, dir))

  private[graft] def census(g: PropertyGraph): DataFrame = {
    // ids are "prefix:table:…" — bounded split (values may themselves
    // contain ':', e.g. timestamp renderings).
    def part(c: String, i: Int) = split(col(c), ":", 5).getItem(i)
    val nodeLabel = when(col("ntype") === "TableType", concat(lit("TableType:"), col("name")))
      .when(col("ntype") === "TableRow", concat(lit("TableRow:"), part("id", 1)))
      .otherwise(concat(lit("ColumnValue:"), part("id", 1), lit(":"), part("id", 2)))
    val nodes = g.nodes.select(lit("node").as("kind"), nodeLabel.as("label"))
    val edges = g.edges.select(lit("edge").as("kind"),
      concat(col("rel"), lit(":"), part("src", 1)).as("label"))
    nodes.union(edges).groupBy(col("kind"), col("label")).agg(count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------------
  // Composite-pk extension: lineitem, the one testdata table the
  // reference's single-pk scheme excludes. Its node ids key on
  // (l_orderkey, l_linenumber) rendered `pk1|pk2`; its three FK
  // families (l_orderkey→orders, l_partkey→part, l_suppkey→supplier)
  // migrate as row→row edges. Registered as its OWN census so the
  // reference-faithful graph_migrate census (and its perf record) stays
  // byte-stable.
  // ---------------------------------------------------------------------

  private val compositePk = Seq("l_orderkey", "l_linenumber")
  private val compositeFks = Seq(
    ("l_orderkey", "orders", "o_orderkey"),
    ("l_partkey", "part", "p_partkey"),
    ("l_suppkey", "supplier", "s_suppkey"))
  private val compositeDataCols = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  private val compositeCache = new SessionDirCache[Pinned[PropertyGraph]]((spark, dir) => {
    import spark.implicits._
    val fks = compositeFks.map { case (fkCol, refTable, refCol) =>
      (fkCol, refTable, graft.Tables.load(spark, dir, refTable)
        .select(col(refCol).cast("string").as("fkv")).distinct())
    }
    // Narrow-first build (see [[tableBasesK]]) — identical graph to
    // tablePartK + mergeNodes/mergeEdges, without the SortAggregate
    // over fat map rows or the columnar MAP cache build.
    val (pins, n, e) = tableBasesK(graft.Tables.load(spark, dir, "lineitem"),
      "lineitem", compositePk, fks, basePartitions(spark, dir, "lineitem"))
    val typeNodes = Seq("lineitem").toDF("t").select(
      concat(lit("tabletype:"), col("t")).as("id"),
      lit("TableType").as("ntype"), col("t").as("name"),
      map().cast("map<string,string>").as("props"))
    Pinned(pins, PropertyGraph(typeNodes.unionByName(n), e))
  }, stamp = SessionDirCache.parquetStamp(Seq("lineitem", "orders", "part", "supplier")))

  /** Census of the composite-pk lineitem migration, through the merged
    * graph like [[migrateCensus]]. The testdata generator emits
    * DUPLICATE composite keys (≈23% of lineitem rows share a
    * (l_orderkey, l_linenumber) pair), so this census also
    * oracle-checks the id-collision collapse: row nodes and is_part_of
    * edges count DISTINCT key pairs, column/FK edges count distinct
    * (key pair, value) combinations. */
  def migrateCompositeCensus(spark: SparkSession, dir: String): DataFrame =
    census(compositeCache(spark, dir).value)

  /** DuckDB oracle: every count re-derived from lineitem with the
    * composite-key dedup made explicit (DISTINCT over the pk pair plus
    * the value for edge families — the merge dedups on the id/triplet,
    * and the string rendering is injective per column type). */
  val migrateCompositeCensusSql: String = {
    val pkList = compositePk.mkString(", ")
    val rowCount = s"(SELECT count(*) FROM (SELECT DISTINCT $pkList FROM lineitem))"
    val colNodeRows = compositeDataCols.map(c =>
      s"SELECT 'node', 'ColumnValue:lineitem:$c', count(DISTINCT $c) FROM lineitem")
    val colEdgeRows = compositeDataCols.map(c =>
      s"SELECT 'edge', '$c:lineitem', (SELECT count(*) FROM (SELECT DISTINCT $pkList, $c FROM lineitem WHERE $c IS NOT NULL))")
    val fkRows = compositeFks.map { case (fkCol, refTable, refCol) =>
      s"SELECT 'edge', '$fkCol:lineitem', (SELECT count(*) FROM (SELECT DISTINCT $pkList, $fkCol FROM lineitem JOIN $refTable ON $fkCol = $refCol))"
    }
    val branches = (Seq(
      "SELECT 'node', 'TableType:lineitem', 1",
      s"SELECT 'node', 'TableRow:lineitem', $rowCount") ++ colNodeRows ++
      Seq(s"SELECT 'edge', 'is_part_of:lineitem', $rowCount") ++ colEdgeRows ++ fkRows)
      .mkString("\n  UNION ALL ")
    s"""WITH census(kind, label, n) AS (
       |  $branches
       |)
       |SELECT kind, label, CAST(n AS BIGINT) AS n FROM census""".stripMargin
  }

  /** DuckDB census oracle: every count re-derived from the raw tables
    * (distinct values per column for ColumnValue nodes, FK join counts
    * for FK edges) — string value rendering is injective per column
    * type, so distinct-by-rendering ≡ distinct-by-value. */
  val migrateCensusSql: String = {
    val typeRows = migratedTables.map(t => s"SELECT 'node', 'TableType:$t', 1").mkString("\n  UNION ALL ")
    // column lists mirror the testdata schema (TESTDATA.md); the Spark
    // side derives them from the scanned schema, so drift breaks here
    // visibly rather than silently.
    val tableCols = Map(
      "region" -> Seq("r_name"), "nation" -> Seq("n_name"),
      "supplier" -> Seq("s_name", "s_acctbal"),
      "customer" -> Seq("c_name", "c_acctbal", "c_mktsegment"),
      "part" -> Seq("p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    val rowRows = specs.map(sp =>
      s"SELECT 'node', 'TableRow:${sp.table}', count(DISTINCT ${sp.pk}) FROM ${sp.table}")
    val colNodeRows = specs.flatMap(sp => tableCols(sp.table).map(c =>
      s"SELECT 'node', 'ColumnValue:${sp.table}:$c', count(DISTINCT $c) FROM ${sp.table}"))
    val partOfRows = specs.map(sp =>
      s"SELECT 'edge', 'is_part_of:${sp.table}', count(*) FROM ${sp.table}")
    val colEdgeRows = specs.flatMap(sp => tableCols(sp.table).map(c =>
      s"SELECT 'edge', '$c:${sp.table}', count($c) FROM ${sp.table}"))
    val fkRows = specs.flatMap(sp => sp.fks.map { case (fkCol, refTable, refCol) =>
      s"SELECT 'edge', '$fkCol:${sp.table}', (SELECT count(*) FROM ${sp.table} JOIN $refTable ON $fkCol = $refCol)"
    })
    val branches = (Seq(typeRows) ++ rowRows ++ colNodeRows ++ partOfRows ++ colEdgeRows ++ fkRows)
      .mkString("\n  UNION ALL ")
    s"""WITH census(kind, label, n) AS (
       |  $branches
       |)
       |SELECT kind, label, CAST(n AS BIGINT) AS n FROM census""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_migrate" -> ((s: SparkSession, d: String) => migrateCensus(s, d)),
    "graph_migrate_composite" -> ((s: SparkSession, d: String) => migrateCompositeCensus(s, d)))

  def oracles: Map[String, String] = Map(
    "graph_migrate" -> migrateCensusSql,
    "graph_migrate_composite" -> migrateCompositeCensusSql)
}
