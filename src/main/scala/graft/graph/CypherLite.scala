package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A restricted Cypher pattern compiler — the Spark-native analog of
  * cognee's CYPHER search type (reference: cognee/modules/retrieval/
  * cypher_search_retriever.py forwards a Cypher string to the graph
  * backend; NATURAL_LANGUAGE generates one first).
  *
  * Supported grammar (linear path patterns, the shape cognee's
  * retrievers emit):
  * {{{
  *   MATCH [p =] (a[:type])-[:rel[|rel2][*lo..hi]]->(b[:type])(...)* [, pattern ...]
  *     (`p =` binds a PATH VARIABLE: one row per (endpoints, hop-depth)
  *      combination of the — single, optionally var-length — pattern;
  *      `length(p)` reads the depth in WHERE and RETURN, and
  *      `p = shortestPath((a)-[...]->(b))` keeps only the MINIMUM depth
  *      per endpoint pair. Path-bound expansions are seeded from the
  *      filtered left node set (frontier BFS, not full-graph closure).
  *      Cypher's one-row-per-distinct-path multiplicity is deliberately
  *      NOT modeled here — it is exponential on dense graphs; the depth
  *      projection is the tabular-subset contract, like the
  *      endpoint-only var-length semantics. The EXPLICIT escape hatch
  *      for small subgraphs is [[enumeratePaths]]: one row per distinct
  *      trail behind a hard row cap that refuses loudly. `nodes(p)` /
  *      `relationships(p)` in RETURN project the sorted SET of nodes /
  *      of traversed "m1>m2" hop steps on some walk of the row's
  *      length between its endpoints — forward×backward frontier
  *      joins, never a path enumeration.)
  *   [OPTIONAL MATCH pattern]*
  *   [WHERE atom [AND ...] [OR atom [AND ...]]*]
  *     where atom = var.prop op 'literal' | var.prop IS [NOT] NULL
  *     (AND binds tighter than OR, Cypher's precedence; no parens)
  *   [WITH var | alias | var.prop AS alias | agg(var.prop) AS alias [, ...]
  *     [WHERE alias op literal [AND ...]]
  *    MATCH ...]*   (arbitrary MATCH…WITH…MATCH…WITH… chains; the LAST
  *                   WITH may instead terminate into UNWIND/RETURN —
  *                   the HAVING-then-return shape)
  *   [UNWIND alias | [lit, ...] AS name]*
  *   RETURN [DISTINCT] var | var.prop [AS alias] | alias
  *          | count(*) | agg(var.prop) | agg(alias) [AS alias] [, ...]
  *     (a bare NODE var expands to <v>_id/<v>_ntype/<v>_name columns —
  *      the relational projection of Cypher's whole-node return; mixed
  *      with aggregates all three join the implicit grouping key)
  *   [ORDER BY alias | var.prop [DESC] [, ...]] [SKIP n] [LIMIT n]
  *     (var.prop sort keys ride as hidden projected columns, dropped
  *      after the sort — plain RETURN only, per Cypher's own rule that
  *      DISTINCT/aggregated projections order by returned items)
  * }}}
  * UNWIND (final segment, after any WHERE) explodes one row per
  * element of a WITH-projected list column (collect round-trip) or a
  * literal list; empty/NULL lists drop the row, per Cypher. SKIP
  * offsets past the first n rows before LIMIT, deterministic under an
  * ORDER BY total order.
  * WITH projects between pattern segments: a bare node variable carries
  * its whole binding, aliased expressions become value columns, and an
  * aggregate item triggers Cypher's implicit grouping over the
  * non-aggregate items; the WITH-attached WHERE filters the projection
  * (post-aggregation — the HAVING shape). The following MATCH joins on
  * the carried node variables; later WHERE/RETURN reference projected
  * values by alias.
  * Aggregates: `count` (non-null, Cypher semantics), `sum`/`avg`
  * (numeric — both try_cast the bag string to double, non-numeric
  * values aggregate as NULL), each accepting Cypher's DISTINCT
  * modifier (`count(DISTINCT v.p)` dedups before aggregating;
  * `collect(DISTINCT …)` dedups the sorted list), `min`/`max` (on the stored
  * representation — correct for the ISO-date / zero-padded strings the
  * projection stores), and `collect` (canonicalized to a SORTED list:
  * Cypher's collect is unordered, a nondeterministic order would break
  * result reproducibility). Mixing aggregated and plain items groups by
  * the plain ones, like Cypher's implicit grouping.
  * Comma-separated patterns conjoin on shared node variables (each
  * extra pattern must share at least one — a cartesian product is
  * rejected). OPTIONAL MATCH left-joins one pattern: unmatched rows
  * keep NULL bindings, and the one global WHERE applies AFTER the
  * optional joins (predicating an optional binding therefore drops
  * unmatched rows, like a post-WHERE in Cypher, not the attached-WHERE
  * form).
  * Node properties: id, ntype, name are the fixed columns; ANY other
  * property name resolves into the node's `props` bag
  * (`element_at(props, 'name')` — the reference's NodeData.properties,
  * which its cypher_search queries predicate on; absent keys are NULL,
  * so `=`/`<>`/... comparisons are false, matching Cypher's missing-
  * property semantics). Untyped nodes `(x)` match any
  * vertex; `-[:rel]->` / `<-[:rel]-` traverse forward / reverse;
  * `-[:rel]-` (no arrowhead) traverses undirected — the
  * get_connections neighborhood shape; `[:a|b]` unions relation types
  * (one `isin` filter, still pushed to the scan).
  *
  * Relationship variables: `-[r:rel]->` binds `r`; `r.rel` is the fixed
  * column, any other name reads the edge's `props` bag (EdgeData
  * properties). Binding restricts the hop to a SINGLE DIRECTED edge
  * (no `*lo..hi`, no undirected) and each edge row is its own match —
  * the endpoint-pair dedup that path-existence semantics apply is
  * deliberately skipped, per Cypher's one-row-per-edge contract.
  *
  * Compilation is declarative: each hop is an equi-join of the edges
  * DataFrame (filtered to the relation, so the predicate pushes into
  * the scan) with the nodes DataFrame — Catalyst plans/reorders the
  * join chain like any other; count(*) returns become a hash aggregate.
  */
object CypherLite {

  private val nodeRe = """\(\s*(\w+)\s*(?::\s*(\w+))?\s*(\{[^{}]*\})?\s*\)""".r
  // A node pattern with NO variable — `()`, `(:type)`, `({k: 'v'})` —
  // rewritten to a fresh variable before compilation (one compile path).
  private val anonNodeRe = """\(\s*(?::\s*\w+)?\s*(?:\{[^{}]*\})?\s*\)""".r
  // One inline-map entry: `key: 'string'` or `key: 123` (Cypher's
  // `{name: 'x', qty: 3}` sugar for post-match equality predicates).
  private val mapPairRe = """(\w+)\s*:\s*(?:'([^']*)'|(-?\d+(?:\.\d+)?))""".r
  private val relRe = """(<)?-\s*\[\s*(\w+)?\s*:\s*(\w+(?:\s*\|\s*\w+)*)(?:\s*\*\s*(\d+)\s*\.\.\s*(\d+))?\s*\]\s*-(>)?""".r
  // Ordered alternation: multi-char ops before their single-char
  // prefixes (>= before >). Range ops are TYPE-AWARE: when the literal
  // parses as a number both sides try_cast to double (so `qty > '9'`
  // is numeric, and a non-numeric bag value compares NULL → false,
  // Cypher's cross-type semantics); otherwise lexicographic, which is
  // correct for the ISO-date strings the projection stores. Equality
  // stays on the stored representation.
  private val whereRe = """(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<|STARTS WITH|ENDS WITH|CONTAINS)\s*'([^']*)'""".r
  private val nullRe = """(\w+)\.(\w+)\s+IS\s+(NOT\s+)?NULL""".r
  private val propCmpRe = """(\w+)\.(\w+)\s*(=|<>|>=|<=|>|<)\s*(\w+)\.(\w+)""".r
  private val notRe = """(?i)NOT\s+(.+)""".r
  private val existsRe = """(?i)exists\s*\(\s*(\w+)\.(\w+)\s*\)""".r
  // RETURN items: agg(v.prop) | agg(alias) | v.prop | count(*) | alias,
  // each optionally AS-renamed. Bare names resolve WITH-projected value
  // columns only (a bare node variable would be Cypher's return-the-
  // node, which the tabular subset doesn't model).
  private val retItemRe =
    """(?:(count|sum|avg|min|max|collect)\s*\(\s*((?i:distinct)\s+)?(?:(\w+)\.(\w+)|(\w+))\s*\)|(\w+)\.(\w+)|count\(\*\)|(\w+))(?:\s+[aA][sS]\s+(\w+))?""".r
  // WITH items: aliased aggregate, aliased scalar, or bare node variable
  private val withAggRe = """(count|sum|avg|min|max|collect)\s*\(\s*((?i:distinct)\s+)?(\w+)\.(\w+)\s*\)\s+[aA][sS]\s+(\w+)""".r
  private val withScalarRe = """(\w+)\.(\w+)\s+[aA][sS]\s+(\w+)""".r
  private val withBareRe = """(\w+)""".r
  // WITH-attached WHERE: alias vs quoted-string or numeric literal
  private val withPredRe = """(\w+)\s*(=|<>|>=|<=|>|<)\s*(?:'([^']*)'|(\d+(?:\.\d+)?))""".r

  // `p = (a)-[:rel*1..3]->(b)` — a PATH VARIABLE bound to the chain;
  // `p = shortestPath((a)-[:rel*1..3]->(b))` wraps it in min-depth
  // semantics.
  private val pathBindRe = """^(\w+)\s*=\s*(.+)$""".r
  private val shortestRe = """(?i)^shortestpath\s*\((.*)\)\s*$""".r

  /** Compile ONE linear path pattern to (relation, node vars, edge
    * vars, path vars). The relation carries `${v}_id/_ntype/_name/
    * _props` per node variable, `${r}_rel/_props` per bound edge
    * variable, and `${p}_len` (the hop depth) per path variable. */
  private def compileChain(g: PropertyGraph, chain: String,
      pathNodeVars: Set[String] = Set.empty, pathRelVars: Set[String] = Set.empty)
      : (DataFrame, Seq[String], Set[String], Set[String]) = {
    // Path binding: the variable captures the matched path's DEPTH —
    // one row per (endpoints, depth) reachable combination, read back
    // through length(p) (Cypher's one-row-per-distinct-PATH multiplicity
    // would be exponential on dense graphs; the depth projection is the
    // tabular subset's contract, same spirit as endpoint-only var-length
    // matching). Restricted to a single (optionally var-length)
    // relationship pattern, no bound edge variable.
    val (pathVar, rawPart) = chain.trim match {
      case pathBindRe(v, rest) => (Some(v), rest.trim)
      case other => (None, other)
    }
    // shortestPath(...): the bound depth becomes the MINIMUM hop count
    // per endpoint pair (Cypher's shortestPath(); the expansion already
    // runs BFS-frontier levels, so this is one min-aggregate over the
    // per-level rows — never a path enumeration).
    val (matchPart, shortest) = rawPart match {
      case shortestRe(inner) =>
        require(pathVar.isDefined, s"shortestPath requires a bound path variable in: $chain")
        (inner.trim, true)
      case other => (other, false)
    }
    require(pathVar.isEmpty || matchPart.startsWith("("),
      s"path variable must bind a node pattern in: $chain")
    val nodePats = nodeRe.findAllMatchIn(matchPart)
      .map(m => (m.group(1), Option(m.group(2)), Option(m.group(3)))).toSeq
    // (edgeVar, relTypes, minHops, maxHops, direction); plain -[:rel]->
    // is 1..1 forward, <-[:rel]- reverse, -[:rel]- (no arrowhead)
    // undirected; -[r:rel]-> binds the edge variable r.
    sealed trait Dir; object Fwd extends Dir; object Rev extends Dir; object Undir extends Dir
    val relPats = relRe.findAllMatchIn(matchPart).map { m =>
      val evar = Option(m.group(2))
      val (lo, hi) =
        if (m.group(4) == null) (1, 1) else (m.group(4).toInt, m.group(5).toInt)
      require(lo >= 1 && hi >= lo && hi <= 10, s"unsupported path bounds *$lo..$hi")
      val dir = (m.group(1) != null, m.group(6) != null) match {
        case (true, true) => throw new IllegalArgumentException(
          s"unsupported double-headed relationship in: $matchPart")
        case (true, false) => Rev
        case (false, true) => Fwd
        case (false, false) => Undir
      }
      require(evar.isEmpty || (lo == 1 && hi == 1 && dir != Undir),
        s"edge variable requires a single directed hop in: $matchPart")
      (evar, m.group(3).split("\\|").map(_.trim).toSeq, lo, hi, dir)
    }.toSeq
    require(nodePats.nonEmpty && relPats.length == nodePats.length - 1,
      s"unsupported pattern: $matchPart")
    val edgeVars: Set[String] = relPats.flatMap(_._1).toSet
    require(!edgeVars.exists(nodePats.map(_._1).toSet),
      s"variable bound as both node and edge in: $matchPart")
    pathVar.foreach { pv =>
      require(relPats.length == 1,
        s"path variable requires a single relationship pattern in: $chain")
      require(relPats.head._1.isEmpty,
        s"path variable with a bound edge variable is unsupported in: $chain")
      require(!nodePats.map(_._1).contains(pv) && !edgeVars(pv),
        s"path variable shadows a pattern variable in: $chain")
    }

    // Inline property map → equality predicates applied at the node
    // scan itself (so Catalyst pushes them into the source read, ahead
    // of every join — strictly better than the equivalent WHERE).
    // Fixed columns compare directly; anything else reaches into the
    // props bag. Quoted values compare as strings, bare numbers
    // numerically (try_cast, the WHERE range-op convention).
    def mapPredicates(mapText: String): Seq[Column] =
      splitOutsideQuotes(mapText.stripPrefix("{").stripSuffix("}"), ",")
        .map(_.trim).filter(_.nonEmpty).map {
          case mapPairRe(k, s, n) =>
            val c = k match {
              case "id" | "ntype" | "name" => col(k)
              case bagKey => element_at(col("props"), bagKey)
            }
            if (s != null) c === lit(s) else c.try_cast("double") === lit(n.toDouble)
          case other => throw new IllegalArgumentException(
            s"unsupported inline property entry: $other")
        }

    def nodeDf(v: String, t: Option[String], m: Option[String]): DataFrame = {
      val typed = t.fold(g.nodesP)(tp => g.nodesP.filter(col("ntype") === tp))
      m.fold(typed)(mt => mapPredicates(mt).foldLeft(typed)(_ filter _)).select(
        col("id").as(s"${v}_id"), col("ntype").as(s"${v}_ntype"), col("name").as(s"${v}_name"),
        col("props").as(s"${v}_props"))
    }

    var df = nodeDf(nodePats.head._1, nodePats.head._2, nodePats.head._3)
    relPats.zipWithIndex.foreach { case ((evar, rels, lo, hi, dir), i) =>
      val (pv, _, _) = nodePats(i)
      val (nv, nt, nm) = nodePats(i + 1)
      val e = evar match {
        case Some(r) =>
          // Bound edge variable: one row PER EDGE (no endpoint dedup —
          // Cypher's one-match-per-relationship contract), carrying the
          // relation and its props bag under the variable's columns.
          val base = PropertyGraph.ensureProps(g.edges)
            .filter(col("rel").isin(rels: _*))
          val oriented = dir match {
            case Fwd => base
            case _ => base.select(col("dst").as("src"), col("src").as("dst"),
              col("rel"), col("props"))
          }
          oriented.select(col("src").as(s"${pv}_id"), col("dst").as(s"${nv}_id"),
            col("rel").as(s"${r}_rel"), col("props").as(s"${r}_props"))
        case None =>
          val fwd = g.edges.filter(col("rel").isin(rels: _*)).select(col("src"), col("dst"))
          val rev = fwd.select(col("dst").as("src"), col("src").as("dst"))
          // RAW hop view — for Undir both orientations unioned WITHOUT
          // dedup (a pair with edges both ways appears twice); consumers
          // dedup at their own granularity below. Each reference is a
          // narrow projection over the persisted edge cache, so a
          // per-level re-scan of it is cheap — unlike a per-level
          // re-distinct, which is a full shuffle.
          val hopRaw = dir match {
            case Fwd => fwd
            case Rev => rev
            case Undir => fwd.union(rev)
          }
          // Variable-length: distinct (src,dst) pairs reachable in lo..hi
          // hops of `rel` — chained equi-joins unioned per length (Cypher
          // path-existence semantics; endpoints only). Per-level
          // distinct() keeps `cur` one row per reachable (src,dst) PAIR,
          // not per path: without it a degree-d hub multiplies
          // intermediate rows like d^len before the terminal distinct
          // (the classic transitive-closure blow-up at scale). With it
          // every level is bounded by |V|² — same result, BFS frontier
          // semantics. A bound path variable keeps the per-LEVEL rows
          // instead of collapsing across levels, tagging each with its
          // depth as `${p}_len`.
          //
          // Multi-level walks store the oriented hop view ONCE,
          // hash-partitioned on src ([[Materialize.stored]] — executor-
          // local blocks, no CacheManager entry, reclaimed when
          // unreferenced). Every consumer — the seeded semi-join and each
          // frontier⋈hop expansion — requires hash(src) on the edge side,
          // so the raw union lineage (which carries no partitioning)
          // would re-scan AND re-exchange the whole edge set at every
          // level; that exchange was the dominant shuffle of the chain
          // family (~100 MB/pass for search_cypher_shortest at sf0.1,
          // against a KB-sized frontier side). The stored scan keeps
          // HashPartitioning(src), so EnsureRequirements plans every
          // later join with NO exchange on the big side — the adjacency-
          // list discipline a distributed BFS runs at any scale. The
          // unseeded variant dedups to (src,dst) PAIR granularity first;
          // repartition-then-distinct costs ONE exchange because
          // hash(src) already co-locates equal (src,dst) rows.
          val nPart = g.edges.sparkSession.sessionState.conf.numShufflePartitions
          // Granularity differs by walk kind: seeded walks keep per-EDGE
          // rows (the per-level distinct works at frontier size);
          // unseeded walks dedup to (src,dst) PAIRs once up front —
          // repartition-then-distinct costs ONE exchange, because
          // hash(src) already co-locates equal (src,dst) rows, so the
          // aggregate dedups in place and the layout claim holds.
          val hopD =
            if (hi > 1) {
              val gran = if (pathVar.isDefined) "edge" else "pair"
              // Dir objects are method-local (a fresh instance set per
              // parse), so the key needs a stable tag, not toString; the
              // key is a typed tuple, not a delimited string, so a rel
              // name containing a delimiter can never collide views.
              val dirTag = dir match { case Fwd => "fwd"; case Rev => "rev"; case _ => "undir" }
              g.hopView((rels.sorted, dirTag, gran, nPart)) {
                val d0 =
                  if (pathVar.isDefined) hopRaw.repartition(nPart, col("src"))
                  else hopRaw.repartition(nPart, col("src")).distinct()
                org.apache.spark.sql.graft.Materialize.storedHashed(d0, nPart, "src")
              }
            } else if (pathVar.isEmpty && dir == Undir) hopRaw.distinct()
            else hopRaw // single level: one join, storing buys nothing
          // Path-bound expansions are SEEDED from the (already
          // type/map-filtered) left node set: the walk starts at the
          // pattern's own sources instead of computing the full-graph
          // transitive closure and pruning at the terminal join — the
          // difference between a frontier BFS and |V|² work when the
          // left pattern anchors on one node. A seeded walk keeps the
          // hop view at per-EDGE granularity (never pair-deduped — the
          // per-level distinct below works at frontier size instead),
          // and each level is one frontier⋈(stored hop scan) join + a
          // frontier-sized distinct: per-level work scales with the
          // frontier, not the graph.
          val seedSrc = df.select(col(s"${pv}_id").as("src")).distinct()
          val seeded = pathVar.fold(hopD) { _ =>
            hopD.join(seedSrc, Seq("src"), "left_semi").distinct()
          }
          // nodes(p) support: per-level forward frontiers are retained so
          // the interior-node projection below can split each (src, dst,
          // len) row at every i + j = len boundary. fwLevels(i) holds the
          // EXACT-i-hop (src, frontier-node) pairs; level 0 is the seed
          // identity.
          val wantNodes = pathVar.exists(pathNodeVars)
          val wantRels = pathVar.exists(pathRelVars)
          val wantProj = wantNodes || wantRels
          val fwLevels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
          if (wantProj)
            fwLevels += seedSrc.select(col("src"), col("src").as("dst"))
          // shortestPath follows Neo4j's own restriction (its planner
          // rejects a minimal length other than 0/1): with lo = 1 the
          // first level a pair appears at IS its min depth, so the BFS
          // below may prune reached pairs from the frontier.
          require(!shortest || lo == 1,
            s"shortestPath supports a minimal length of 1 only in: $chain")
          var reach: DataFrame = null
          if (shortest && !wantProj) {
            // Projection-free shortestPath: ONE stored relation per
            // level serves every frontier read. `acc` holds all visited
            // (src,dst) pairs tagged with their min depth — its top
            // stratum IS the next expansion's frontier, the whole
            // relation IS the anti-join prune source (which must be a
            // stored relation, not a lazy union lineage: Catalyst's
            // Union constraint rewrite chokes on unions of checkpointed
            // scans), and at the end `acc ∪ last level` IS the reach
            // set. The unfused loop paid TWO eager materialization
            // passes per level (frontier store + visited-union store)
            // for the same reads — on the bench channel the write
            // path's local-mode latency is its job count. The last
            // level stays lazy: it is read exactly once, by the
            // min-aggregate's one consuming action.
            var acc: DataFrame = null
            var cur = seeded
            for (len <- 1 to hi) {
              val tagged = cur.withColumn("len", lit(len.toLong))
              if (len < hi) {
                acc = org.apache.spark.sql.graft.Materialize.stored(
                  if (acc == null) tagged else acc.union(tagged))
                val frontier = acc.filter(col("len") === len.toLong).drop("len")
                // shuffle_hash on the frontier side: hash the (small)
                // frontier and stream the stored src-partitioned hop
                // scan with no exchange and no sort on the big side
                // (the kHop discipline). A pair reached at a shallower
                // depth can never win the min — prune it, so frontiers
                // shrink to the genuinely-new pairs and the BFS
                // converges instead of re-walking the reached closure
                // at every deeper level.
                val next = frontier.as("a").hint("shuffle_hash")
                  .join(hopD.as("b"), col("a.dst") === col("b.src"))
                  .select(col("a.src").as("src"), col("b.dst").as("dst"))
                  .distinct()
                cur = next.join(acc.select(col("src"), col("dst")).hint("shuffle_hash"),
                  Seq("src", "dst"), "left_anti")
              } else {
                reach = if (acc == null) tagged else acc.union(tagged)
              }
            }
          } else {
          var visited: DataFrame = null // shortest only: all reached pairs
          var cur = seeded
          for (len <- 1 to hi) {
            // Each frontier is materialized per level (the iterative-
            // loop discipline): it is read up to three times — as a
            // reach level, as the next expansion's left side, and (for
            // shortestPath) as an anti-join prune source — and a lazy
            // join-chain lineage would re-execute the whole walk per use.
            // (level 1 of an unseeded walk IS hopD — already stored)
            if ((hi > 1 || wantProj) && (len > 1 || pathVar.isDefined))
              cur = org.apache.spark.sql.graft.Materialize.stored(cur)
            if (wantProj) fwLevels += cur
            if (len >= lo) {
              val level = pathVar.fold(cur)(_ => cur.withColumn("len", lit(len.toLong)))
              reach = if (reach == null) level else reach.union(level)
            }
            if (len < hi) {
              // shortestPath: a pair reached at a shallower depth can
              // never win the min — drop it from the frontier, so the
              // BFS converges (frontiers shrink to the genuinely-new
              // pairs) instead of re-walking the reached closure at
              // every deeper level. The accumulated visited set is
              // re-materialized per level: the anti-join's build side
              // must be a stored relation, not a lazy union lineage
              // (which Catalyst's Union constraint rewrite also chokes
              // on when its children are checkpointed scans).
              if (shortest)
                visited = (if (visited == null) cur
                           else org.apache.spark.sql.graft.Materialize.stored(visited.union(cur)))
              // shuffle_hash on the frontier side: hash the (small)
              // frontier and stream the edge-scan side without the
              // sort-merge sort of the big side (the kHop discipline).
              var next = cur.as("a").hint("shuffle_hash")
                .join(hopD.as("b"), col("a.dst") === col("b.src"))
                .select(col("a.src").as("src"), col("b.dst").as("dst"))
                .distinct()
              if (shortest) next = next.join(visited, Seq("src", "dst"), "left_anti")
              cur = next
            }
          }
          }
          pathVar match {
            case Some(p) =>
              val tagged =
                if (shortest) reach.groupBy(col("src"), col("dst")).agg(min(col("len")).as("len"))
                else reach
              // nodes(p): the sorted set of nodes on SOME walk of the
              // row's length between its endpoints — the bounded tabular
              // projection of Cypher's per-path node list (per-path
              // multiplicity is exponential; the union-over-walks SET per
              // (endpoints, depth) row is computable as frontier joins).
              // Node m is on a length-len walk src→dst iff src reaches m
              // in exactly i hops and m reaches dst in exactly len-i hops
              // for some split i + j = len: forward levels are the BFS
              // frontiers already materialized above, backward levels run
              // the same recurrence from the reached endpoint set over
              // the oriented hop view — every join is a keyed equi-join
              // on frontier-sized relations, never a path enumeration.
              // For shortestPath the forward frontiers are min-depth
              // pruned, which is exact here: a node on a minimal-length
              // walk sits at precisely its min depth on that walk (a
              // shallower arrival would splice into a shorter total).
              var out = tagged
              if (wantProj) {
                val bk = scala.collection.mutable.ArrayBuffer(
                  org.apache.spark.sql.graft.Materialize.stored(
                    reach.select(col("dst")).distinct()
                      .select(col("dst").as("mid"), col("dst"))))
                // hopD, not hopRaw: a wantProj chain is always seeded
                // (the projections require the bound path variable), so
                // hopD holds the identical per-edge rows — read from
                // stored blocks instead of re-deriving the union lineage
                // per backward level.
                for (j <- 1 to hi)
                  bk += org.apache.spark.sql.graft.Materialize.stored(
                    hopD.as("e").join(bk(j - 1).as("b"), col("e.dst") === col("b.mid"))
                      .select(col("e.src").as("mid"), col("b.dst").as("dst")).distinct())
                if (wantNodes) {
                  val splits = for { len <- math.max(lo, 1) to hi; i <- 0 to len } yield
                    fwLevels(i).as("f").join(bk(len - i).as("b"), col("f.dst") === col("b.mid"))
                      .select(col("f.src").as("src"), col("b.dst").as("dst"),
                        lit(len.toLong).as("len"), col("f.dst").as("mid"))
                  val nodesRel = splits.reduce(_ union _)
                    .groupBy(col("src"), col("dst"), col("len"))
                    .agg(sort_array(collect_set(col("mid"))).as(s"${p}_nodes"))
                  out = out.join(nodesRel, Seq("src", "dst", "len"))
                }
                // relationships(p): the sorted SET of traversed hop STEPS
                // ("m1>m2" in the walked orientation) on some walk of the
                // row's length — step (m1, m2) is on one iff src→m1 in
                // exactly i hops and m2→dst in exactly len-1-i hops.
                if (wantRels) {
                  val splits = for { len <- math.max(lo, 1) to hi; i <- 0 until len } yield
                    fwLevels(i).as("f")
                      .join(hopD.as("e"), col("f.dst") === col("e.src"))
                      .join(bk(len - 1 - i).as("b"), col("e.dst") === col("b.mid"))
                      .select(col("f.src").as("src"), col("b.dst").as("dst"),
                        lit(len.toLong).as("len"),
                        concat(col("e.src"), lit(">"), col("e.dst")).as("step"))
                  val relsRel = splits.reduce(_ union _)
                    .groupBy(col("src"), col("dst"), col("len"))
                    .agg(sort_array(collect_set(col("step"))).as(s"${p}_rels"))
                  out = out.join(relsRel, Seq("src", "dst", "len"))
                }
              }
              val base = Seq(col("src").as(s"${pv}_id"),
                col("dst").as(s"${nv}_id"), col("len").as(s"${p}_len"))
              val cols = base ++
                (if (wantNodes) Seq(col(s"${p}_nodes")) else Nil) ++
                (if (wantRels) Seq(col(s"${p}_rels")) else Nil)
              out.select(cols: _*)
            case None => reach.distinct()
              .select(col("src").as(s"${pv}_id"), col("dst").as(s"${nv}_id"))
          }
      }
      df = df.join(e, Seq(s"${pv}_id")).join(nodeDf(nv, nt, nm), Seq(s"${nv}_id"))
    }
    (df, nodePats.map(_._1), edgeVars, pathVar.toSet)
  }

  /** One aggregate column for WITH/RETURN items. `count`/`sum`/`avg`
    * accept Cypher's DISTINCT modifier (dedup before aggregation);
    * `collect(DISTINCT …)` dedups the canonical sorted list; DISTINCT
    * under min/max is the identity, accepted for compatibility. */
  private def aggExpr(fn: String, distinct: Boolean, c0: Column): Column = {
    val c = fn match { case "sum" | "avg" => c0.try_cast("double"); case _ => c0 }
    (fn, distinct) match {
      case ("collect", false) => sort_array(collect_list(c))
      case ("collect", true) => sort_array(array_distinct(collect_list(c)))
      case ("min", _) => min(c)
      case ("max", _) => max(c)
      case ("count", false) => count(c)
      case ("count", true) => count_distinct(c)
      case ("sum", false) => sum(c)
      case ("sum", true) => sum_distinct(c)
      case ("avg", false) => avg(c)
      // Average over the distinct values — the same final sum/count
      // double division Spark's Average performs.
      case ("avg", true) => sum_distinct(c) / count_distinct(c)
    }
  }

  /** True when the statement carries a write clause (CREATE / MERGE /
    * DELETE / SET at clause level — occurrences inside quoted string
    * literals are data, not clauses). */
  def isWrite(cypher: String): Boolean = {
    val up = " " + maskedUpper(cypher.trim.replaceAll("\\s+", " ")) + " "
    Seq("CREATE", "MERGE", "DELETE", "SET", "REMOVE").exists(kw =>
      up.contains(" " + kw + " ") || up.trim.startsWith(kw + " "))
  }

  // ---- Write subset (graph_db_interface.py:163 query() is read-write;
  // the adapters' MERGE templates are the semantics matched) ----
  //
  //   CREATE (n:type {id: '…', name: '…', k: 'v', …})   → addNodes
  //   MERGE  (n:type {id: '…', …})                      → mergeNodes
  //   MERGE  (a {id: '…'})-[:rel [{…}]]->(b {id: '…'})  → mergeEdges
  //   MERGE … ON CREATE SET v.k = '…' | v += {…}         → fold into the created row
  //          … ON MATCH SET v.k = '…' | v += {…}         → prop sets on the pre-merge keys
  //   MATCH (a:Node), (b:Node) WHERE a.id = '…' AND b.id = '…'
  //     MERGE (a)-[r:EDGE {relationship_name: '…'}]->(b) [ON …]
  //     → the adapters' own edge template, verbatim (kuzu/adapter.py:283)
  //   MATCH <pattern> [WHERE …] SET v.key = '…' | v += {…} [, …] → setNodeProp
  //   MATCH <pattern> [WHERE …] DETACH DELETE v          → deleteNodes
  //
  // CREATE and MERGE share the adapters' upsert-keep-existing id
  // semantics (neo4j_driver/adapter.py add_node: `MERGE (n {id}) ON
  // CREATE SET …` — an existing id keeps its stored row); they differ
  // in plan shape only: CREATE is the interactive increment (broadcast
  // collision probe, [[PropertyGraph.addNodes]]), MERGE the corpus-
  // scale keyed anti-join ([[PropertyGraph.mergeNodes]]). An edge MERGE
  // writes the edge only — endpoints must already exist (the adapters'
  // MATCH-MATCH-MERGE add_edge contract). Plain DELETE is REJECTED:
  // Cypher's DELETE fails on a connected node, which an engine that
  // never enumerates incident edges driver-side cannot honor — DETACH
  // DELETE (cascade incident edges) is the supported, and honest, form.
  private val writeNodeRe =
    """(?i)^(CREATE|MERGE)\s+\(\s*(\w*)\s*:\s*(\w+)\s*(\{[^{}]*\})\s*\)$""".r
  private val writeEdgeRe =
    ("""(?i)^(CREATE|MERGE)\s+\(\s*\w*\s*\{\s*id\s*:\s*'([^']*)'\s*\}\s*\)\s*""" +
      """-\s*\[\s*(\w*)\s*:\s*(\w+)\s*(\{[^{}]*\})?\s*\]\s*->\s*""" +
      """\(\s*\w*\s*\{\s*id\s*:\s*'([^']*)'\s*\}\s*\)$""").r
  private val removeItemRe = """(\w+)\.(\w+)""".r
  // ON CREATE SET / ON MATCH SET items (the adapters' MERGE templates,
  // parameter-substituted — kuzu/adapter.py:285,289,373,431): a plain
  // assignment, a `timestamp('…')`-wrapped assignment (stored as the
  // raw string — props are MAP<STRING,STRING>), or the `v += {…}`
  // map-merge form (neo4j's SET n += $props).
  // Write-side inline map entry: 'str' | number | timestamp('…') —
  // the timestamp alternative lets the adapters' parameter-substituted
  // templates run verbatim (the raw string is what the bag stores).
  private val writePairRe =
    """(?i)(\w+)\s*:\s*(?:'([^']*)'|(-?\d+(?:\.\d+)?)|timestamp\s*\(\s*'([^']*)'\s*\))""".r
  private val onAssignRe =
    """(?i)(\w+)\.(\w+)\s*=\s*(?:'([^']*)'|timestamp\s*\(\s*'([^']*)'\s*\)|(-?\d+(?:\.\d+)?))""".r
  private val onPlusRe = """(\w+)\s*\+=\s*(\{.*\})""".r
  // The adapters' edge-MERGE template shape (kuzu/adapter.py:283):
  //   MATCH (from:Node), (to:Node) WHERE from.id = '…' AND to.id = '…'
  //   MERGE (from)-[r:EDGE { relationship_name: '…' }]->(to) [ON …]
  // `:Node` is the adapters' single-table universal label (kuzu keeps
  // one Node table; type is a property), so the label is accepted on
  // any node here; `relationship_name` in the inline map IS the rel in
  // this engine's (src, dst, rel) model — exactly the mapping the
  // TpchGraph projection uses for the reference's EDGE table.
  private val matchMergeEdgeRe =
    ("""(?i)^MATCH \(\s*(\w+)\s*(?::\s*\w+)?\s*\)\s*,\s*\(\s*(\w+)\s*(?::\s*\w+)?\s*\)""" +
      """ WHERE (\w+)\.id = '([^']*)' AND (\w+)\.id = '([^']*)'""" +
      """ MERGE \(\s*(\w+)\s*\)\s*-\s*\[\s*(\w*)\s*:\s*(\w+)\s*(\{[^{}]*\})?\s*\]\s*->\s*\(\s*(\w+)\s*\)$""").r

  /** Execute ONE write statement against the graph, returning the
    * mutated graph (PropertyGraph is immutable — the caller re-binds,
    * exactly like the mutation-plan API underneath). */
  def runWrite(g: PropertyGraph, cypher: String): PropertyGraph =
    runWrite(g, cypher, DirectProbes)

  /** How a write statement learns pre-state truths (endpoint existence
    * gates, pre-merge ON MATCH key sets):
    *   - [[DirectProbes]] — per-statement eager probe against the
    *     current graph (one Materialize.stored pass each), today's
    *     single-statement semantics;
    *   - [[CollectProbes]] — dry pass that only RECORDS which node ids /
    *     edge triples a statement would probe (statement parsing and
    *     validation run; the graph is not touched);
    *   - [[AnswerProbes]] — probe questions answered driver-side from
    *     ONE batched probe of the chain-segment's initial snapshot plus
    *     the concrete increments of the segment's earlier statements
    *     (template-write ids are driver-known literals, so the
    *     adjustment is exact set arithmetic, not approximation).
    * The three modes exist for [[runWriteChain]]; semantics are pinned
    * identical by CypherLiteSpec's chain-parity tests. */
  private[graph] sealed trait WriteProbeMode
  private[graph] case object DirectProbes extends WriteProbeMode
  private[graph] final class CollectProbes extends WriteProbeMode {
    val nodeIds = scala.collection.mutable.LinkedHashSet.empty[String]
    val edgeKeys = scala.collection.mutable.LinkedHashSet.empty[(String, String, String)]
  }
  private[graph] final class AnswerProbes(
      probedNodes: Set[String], presentNodes: Set[String],
      probedEdges: Set[(String, String, String)],
      presentEdges: Set[(String, String, String)]) extends WriteProbeMode {
    private var writtenNodes = Set.empty[String]
    private var writtenEdges = Set.empty[(String, String, String)]
    def nodeExists(id: String): Boolean = {
      require(probedNodes.contains(id) || writtenNodes.contains(id),
        s"write-chain probe drift: node '$id' was never collected — " +
          "CollectProbes and AnswerProbes asked different questions")
      writtenNodes.contains(id) || presentNodes.contains(id)
    }
    def edgeExists(key: (String, String, String)): Boolean = {
      require(probedEdges.contains(key) || writtenEdges.contains(key),
        s"write-chain probe drift: edge '$key' was never collected")
      writtenEdges.contains(key) || presentEdges.contains(key)
    }
    def noteNode(id: String): Unit = writtenNodes += id
    def noteEdge(key: (String, String, String)): Unit = writtenEdges += key
  }

  private[graph] def runWrite(g: PropertyGraph, cypher: String,
      mode: WriteProbeMode): PropertyGraph = {
    val q0 = cypher.trim.replaceAll("\\s+", " ")
    val up0 = maskedUpper(q0)
    val spark = g.nodes.sparkSession

    def mapEntries(mapText: String): Seq[(String, String)] =
      splitOutsideQuotes(mapText.stripPrefix("{").stripSuffix("}"), ",")
        .map(_.trim).filter(_.nonEmpty).map {
          case writePairRe(k, s, n, ts) =>
            k -> (if (s != null) s else if (n != null) n else ts)
          case other => throw new IllegalArgumentException(
            s"unsupported property entry in write: $other")
        }

    // ON CREATE SET / ON MATCH SET tails (MERGE-only Cypher clauses,
    // either order, each at most once). Parsed into (var, key, value)
    // entry lists; the merge handler validates that every item binds
    // the MERGED element's variable — an item binding any other
    // variable (e.g. a matched endpoint in an edge template) is
    // rejected loudly rather than silently applied to the wrong
    // element. `v += {…}` expands to its map's entries.
    def clauseEntries(text: String): Seq[(String, String, String)] =
      splitItems(text).flatMap {
        case onPlusRe(v, mapText) => mapEntries(mapText).map { case (k, x) => (v, k, x) }
        case onAssignRe(v, key, s, ts, n) =>
          Seq((v, key, if (s != null) s else if (ts != null) ts else n))
        case other => throw new IllegalArgumentException(
          s"unsupported ON CREATE/ON MATCH SET item: $other")
      }
    val onCreateIdx = up0.indexOf(" ON CREATE SET ")
    val onMatchIdx = up0.indexOf(" ON MATCH SET ")
    val clauseStarts = Seq(onCreateIdx, onMatchIdx).filter(_ >= 0).sorted
    def clauseText(idx: Int, marker: String): Seq[(String, String, String)] =
      if (idx < 0) Seq.empty
      else {
        val from = idx + marker.length
        val until = clauseStarts.find(_ > idx).getOrElse(q0.length)
        clauseEntries(q0.substring(from, until).trim)
      }
    val onCreate = clauseText(onCreateIdx, " ON CREATE SET ")
    val onMatch = clauseText(onMatchIdx, " ON MATCH SET ")
    val hasOn = clauseStarts.nonEmpty
    val q = if (hasOn) q0.substring(0, clauseStarts.head).trim else q0
    val up = maskedUpper(q)
    if (hasOn) require(up.contains("MERGE "),
      s"ON CREATE SET / ON MATCH SET apply to MERGE statements only: $q0")

    // Upsert a node/edge increment with the ON semantics: the created
    // row carries base ∪ onCreate entries (MERGE keeps an existing row,
    // which IS the ON-CREATE-only effect); ON MATCH items then apply as
    // prop sets against the PRE-merge key set — materialized before the
    // merge, so a just-created element never sees them and a pre-
    // existing one always does. No driver-side existence probe: an
    // absent key set is an empty frame and the prop set a no-op.
    // Every ON item must bind the merged element's own variable — and
    // that variable must exist for the items to be bindable at all.
    def validateOnVar(mergedVar: String, what: String): Unit = {
      val bound = (onCreate ++ onMatch).map(_._1).distinct
      if (bound.nonEmpty) {
        require(mergedVar.nonEmpty,
          s"ON CREATE/ON MATCH SET items bind '${bound.mkString(",")}' but the merged $what has no variable: $q0")
        require(bound.forall(_ == mergedVar),
          s"ON CREATE/ON MATCH SET may only bind the merged $what variable '$mergedVar' " +
            s"(got '${bound.filterNot(_ == mergedVar).mkString(",")}'): $q0")
      }
    }
    // Cypher's last-write-wins for a key set both in the pattern map
    // and in ON CREATE SET (a duplicate-key CreateMap would otherwise
    // crash under the default EXCEPTION dedup policy).
    def lastWins(es: Seq[(String, String)]): Seq[(String, String)] = {
      val last = es.toMap
      es.map(_._1).distinct.map(k => k -> last(k))
    }

    def mergeNodeRow(nodeVar: String, ntypeRaw: String,
        baseEntries: Seq[(String, String)], create: Boolean): PropertyGraph = {
      validateOnVar(nodeVar, "node")
      val entries = lastWins(baseEntries ++ onCreate.map(e => e._2 -> e._3))
      val id = entries.collectFirst { case ("id", v) => v }.getOrElse(
        throw new IllegalArgumentException(s"node write requires an id property: $q0"))
      // `:Node` is the adapters' universal single-table label — the
      // node's type is its `type` PROPERTY there (kuzu/adapter.py:373's
      // `n += {…, type: $param_type, …}`), so it maps to ntype here.
      val ntype =
        if (ntypeRaw.equalsIgnoreCase("Node"))
          entries.collectFirst { case ("type", v) => v }.getOrElse("Node")
        else ntypeRaw
      val name = entries.collectFirst { case ("name", v) => v }.getOrElse(id)
      // Duplicate inline keys resolved LAST-WRITE-WINS by the lastWins
      // pass on `entries` above (Cypher map-literal semantics) — the
      // `.toMap` below therefore sees unique keys and never depends on
      // Spark's spark.sql.mapKeyDedupPolicy (default EXCEPTION). Same
      // deliberate policy as the edge bag; spec-pinned.
      val bag = entries.filterNot(e => e._1 == "id" || e._1 == "name" ||
        (ntypeRaw.equalsIgnoreCase("Node") && e._1 == "type"))
      // The increment is a LocalRelation of CONCRETE rows, not literal
      // projections: a constant-aliased join key sends
      // PushDownLeftSemiAntiJoin / CollapseProject / ColumnPruning into
      // a rewrite cycle that caps the optimizer's iteration budget on
      // every downstream action — a LocalRelation has plain attributes
      // and no such cycle, and unlike an eager Materialize.stored it
      // costs ZERO Spark jobs per write (a chain of writes used to pay
      // one materialization job per layer just to mint its 1-row
      // increment).
      mode match {
        case c: CollectProbes =>
          // dry pass: record what this statement would ask, mutate nothing
          if (onMatch.nonEmpty) c.nodeIds += id
          return g
        case _ => ()
      }
      val row = {
        import spark.implicits._
        Seq((id, ntype, name, bag.toMap)).toDF("id", "ntype", "name", "props")
      }
      val preExisting = (onMatch.isEmpty, mode) match {
        case (true, _) => null
        case (false, a: AnswerProbes) =>
          // driver-known truth → a LocalRelation key set, zero probe jobs
          import spark.implicits._
          (if (a.nodeExists(id)) Seq(id) else Seq.empty[String]).toDF("id")
        case (false, _) => org.apache.spark.sql.graft.Materialize.stored(
          g.nodes.filter(col("id") === lit(id)).select(col("id")))
      }
      mode match { case a: AnswerProbes => a.noteNode(id); case _ => () }
      val merged = if (create) g.addNodes(row) else g.mergeNodes(row)
      // setNodeProp routes 'name' to the fixed column and rejects the
      // identity columns itself — same contract as plain MATCH … SET.
      // On the adapters' universal :Node label the node's TYPE is the
      // ntype identity column here, not a bag key — an ON MATCH update
      // of it (only the UNWIND batch template does, which this surface
      // doesn't claim) must fail loudly, not write a shadow bag entry.
      onMatch.foldLeft(merged) { case (acc, (_, k, v)) =>
        if (ntypeRaw.equalsIgnoreCase("Node") && k == "type")
          throw new IllegalArgumentException(
            s"ON MATCH SET of 'type' (the ntype identity under the :Node label) is unsupported: $q0")
        acc.setNodeProp(preExisting, k, v)
      }
    }

    def mergeEdgeRow(edgeVar: String, srcId: String, dstId: String, relRaw: String,
        mapText: String, create: Boolean,
        requireEndpoints: Boolean): PropertyGraph = {
      validateOnVar(edgeVar, "edge")
      val inline = Option(mapText).map(mapEntries).getOrElse(Seq.empty)
      // `[r:EDGE {relationship_name: '…'}]` — the adapters' generic
      // edge table: relationship_name IS the rel in this model.
      val rel = if (relRaw.equalsIgnoreCase("EDGE"))
        inline.collectFirst { case ("relationship_name", v) => v }.getOrElse(relRaw)
      else relRaw
      val bag = lastWins(inline.filterNot(e =>
        relRaw.equalsIgnoreCase("EDGE") && e._1 == "relationship_name") ++
        onCreate.map(e => e._2 -> e._3))
      mode match {
        case c: CollectProbes =>
          // dry pass: record the endpoint gates and the ON MATCH key
          if (requireEndpoints) { c.nodeIds += srcId; c.nodeIds += dstId }
          if (onMatch.nonEmpty) c.edgeKeys += ((srcId, dstId, rel))
          return g
        case a: AnswerProbes =>
          // driver-side gate truth: a missing endpoint makes the WHOLE
          // statement (ON MATCH included) a no-op — return the graph
          // untouched instead of threading an empty gated frame through
          // the merge (same semantics, zero plan growth, zero jobs).
          if (requireEndpoints && !(a.nodeExists(srcId) && a.nodeExists(dstId)))
            return g
          val bare = {
            import spark.implicits._
            Seq((srcId, dstId, rel, bag.toMap)).toDF("src", "dst", "rel", "props")
          }
          val preExisting =
            if (onMatch.isEmpty) null
            else {
              import spark.implicits._
              (if (a.edgeExists((srcId, dstId, rel))) Seq((srcId, dstId, rel))
               else Seq.empty[(String, String, String)]).toDF("src", "dst", "rel")
            }
          a.noteEdge((srcId, dstId, rel))
          val merged = if (create) g.addEdges(bare) else g.mergeEdges(bare)
          return onMatch.foldLeft(merged) { case (acc, (_, k, v)) =>
            acc.setEdgeProp(preExisting, k, v)
          }
        case DirectProbes => ()
      }
      // LocalRelation of concrete rows — zero jobs, no optimizer-cycle
      // hazard (see the node case).
      val bare = {
        import spark.implicits._
        Seq((srcId, dstId, rel, bag.toMap)).toDF("src", "dst", "rel", "props")
      }
      // The template's MATCH clauses make the edge contract explicit:
      // a missing endpoint matches nothing and the MERGE is a no-op —
      // expressed as two ≤1-row existence gates (pushed id-equality
      // scans), not a driver-side probe. ON MATCH keys on the PRE-merge
      // edge under the SAME gates: when the template's MATCH binds
      // nothing, Cypher's whole statement — ON MATCH included — is a
      // no-op, even against a pre-existing (dangling) edge row.
      //
      // Job economy: every eager stored scan costs a handful of
      // local-mode jobs (localCheckpoint + its AQE stages), and the
      // write path's latency IS its job count (Profile: 58 jobs for a
      // 4-write chain when the template paid TWO materializations per
      // layer). The increment row and the pre-merge key set therefore
      // materialize as ONE kind-tagged frame under one shared pair of
      // gates — same semantics, one snapshot, half the jobs.
      val preBase = g.edges.filter(col("src") === lit(srcId) && col("dst") === lit(dstId) &&
        col("rel") === lit(rel)).select(col("src"), col("dst"), col("rel"))
      val outCols = Seq(col("kind"), col("src"), col("dst"), col("rel"), col("props"))
      val legs =
        bare.select((lit("inc").as("kind") +: outCols.tail): _*)
          .unionByName(preBase.select(lit("pre").as("kind"), col("src"), col("dst"),
            col("rel"), map().cast("map<string,string>").as("props")))
      val gated =
        if (!requireEndpoints) legs
        else legs
          .crossJoin(g.nodes.filter(col("id") === lit(srcId)).select(lit(1).as("src_ok")).limit(1))
          .crossJoin(g.nodes.filter(col("id") === lit(dstId)).select(lit(1).as("dst_ok")).limit(1))
          .select(outCols: _*)
      // Nothing to materialize when the whole probe is increment-local
      // (no gates, no ON MATCH): the LocalRelation is already inert —
      // and the row must BE the LocalRelation, not a filtered union
      // that would drag g.edges into the increment plan.
      val probe: Option[DataFrame] =
        if (!requireEndpoints && onMatch.isEmpty) None
        else Some(org.apache.spark.sql.graft.Materialize.stored(gated))
      val row = probe.fold(bare)(_.filter(col("kind") === "inc")
        .select(col("src"), col("dst"), col("rel"), col("props")))
      val preExisting =
        if (onMatch.isEmpty) null
        else probe.get.filter(col("kind") === "pre").select(col("src"), col("dst"), col("rel"))
      val merged = if (create) g.addEdges(row) else g.mergeEdges(row)
      onMatch.foldLeft(merged) { case (acc, (_, k, v)) =>
        acc.setEdgeProp(preExisting, k, v)
      }
    }

    // (A CREATE statement with ON clauses cannot reach these cases: the
    // hasOn path already required an unmasked "MERGE " in the statement,
    // which a single-element CREATE cannot contain.)
    q match {
      case writeNodeRe(verb, nodeVar, ntype, mapText) =>
        mergeNodeRow(nodeVar, ntype, mapEntries(mapText), verb.equalsIgnoreCase("CREATE"))
      case writeEdgeRe(verb, srcId, edgeVar, rel, mapText, dstId) =>
        mergeEdgeRow(edgeVar, srcId, dstId, rel, mapText,
          create = verb.equalsIgnoreCase("CREATE"), requireEndpoints = false)
      case matchMergeEdgeRe(v1, v2, w1, id1, w2, id2, mSrc, edgeVar, relRaw, mapText, mDst) =>
        val byVar = Map(w1 -> id1, w2 -> id2)
        require(Set(v1, v2) == Set(w1, w2) && byVar.contains(mSrc) && byVar.contains(mDst)
          && mSrc != mDst,
          s"MATCH-MERGE edge template: WHERE/MERGE variables must bind the two matched nodes: $q0")
        mergeEdgeRow(edgeVar, byVar(mSrc), byVar(mDst), relRaw, mapText,
          create = false, requireEndpoints = true)
      case _ if up.startsWith("MATCH ") =>
        // MATCH-driven writes compile the read part through the READ
        // pipeline (one compiler, one semantics): the matched variable's
        // ids come back as a one-column frame feeding the mutation plan.
        val detachIdx = up.indexOf(" DETACH DELETE ")
        val setIdx = up.indexOf(" SET ")
        val removeIdx = up.indexOf(" REMOVE ")
        if (up.contains(" DELETE ") && detachIdx < 0)
          throw new IllegalArgumentException(
            "plain DELETE fails on connected nodes in Cypher, which this engine " +
              s"does not check — use DETACH DELETE (cascades incident edges): $q")
        if (removeIdx >= 0) {
          // REMOVE v.key [, ...] — the SET twin with the same node/edge
          // routing; matched sets reconstruct through the read pipeline.
          require(setIdx < 0 && detachIdx < 0,
            s"mixed REMOVE and SET/DELETE in one statement is unsupported: $q")
          val items = splitItems(q.substring(removeIdx + " REMOVE ".length)).map {
            case removeItemRe(v, key) => (v, key)
            case other => throw new IllegalArgumentException(s"unsupported REMOVE item: $other")
          }
          val vars = items.map(_._1).distinct
          require(vars.size == 1, s"REMOVE items must target one matched variable: $q")
          val matchText = q.substring(0, removeIdx)
          val boundEdgeVars = relRe.findAllMatchIn(matchText)
            .flatMap(m => Option(m.group(2))).toSet
          if (boundEdgeVars(vars.head)) {
            val nvs = nodeRe.findAllMatchIn(matchText).map(_.group(1)).toSeq
            require(nvs.size == 2 && boundEdgeVars.size == 1,
              s"edge REMOVE supports a single named (a)-[r:rel]->(b) pattern: $q")
            val keys = org.apache.spark.sql.graft.Materialize.stored(
              run(g, matchText + s" RETURN ${nvs.head}.id AS src, " +
                s"${nvs.last}.id AS dst, ${vars.head}.rel AS rel"))
            items.foldLeft(g) { case (acc, (_, key)) => acc.removeEdgeProp(keys, key) }
          } else {
            val ids = org.apache.spark.sql.graft.Materialize.stored(
              run(g, matchText + s" RETURN ${vars.head}.id AS id"))
            items.foldLeft(g) { case (acc, (_, key)) => acc.removeNodeProp(ids, key) }
          }
        } else if (detachIdx >= 0) {
          require(setIdx < 0, s"mixed SET and DELETE in one statement is unsupported: $q")
          val v = q.substring(detachIdx + " DETACH DELETE ".length).trim
          require(v.matches("\\w+"), s"DETACH DELETE takes a single node variable: $q")
          // materialize the matched id set (stripped store): left lazy,
          // the anti-joins would re-embed the full prior-mutation plan
          // stack as their build side — the duplication that pushed the
          // optimizer to its iteration cap on chained writes
          val ids = org.apache.spark.sql.graft.Materialize.stored(
            run(g, q.substring(0, detachIdx) + s" RETURN $v.id AS id"))
          g.deleteNodes(ids)
        } else if (setIdx >= 0) {
          // A SET item is `v.key = <value>` or the `v += {…}` map-merge
          // (neo4j adapter.py:373's `SET n += $properties`): per-key
          // prop sets preserve the untouched bag keys, which IS the +=
          // contract, so the map form expands to its entries.
          val items = splitItems(q.substring(setIdx + " SET ".length)).flatMap {
            case onPlusRe(v, mapText) => mapEntries(mapText).map { case (k, value) => (v, k, value) }
            case onAssignRe(v, key, s, ts, n) =>
              Seq((v, key, if (s != null) s else if (ts != null) ts else n))
            case other => throw new IllegalArgumentException(s"unsupported SET item: $other")
          }
          val vars = items.map(_._1).distinct
          require(vars.size == 1, s"SET items must target one matched variable: $q")
          val matchText = q.substring(0, setIdx)
          val boundEdgeVars = relRe.findAllMatchIn(matchText)
            .flatMap(m => Option(m.group(2))).toSet
          if (boundEdgeVars(vars.head)) {
            // EDGE SET: the bound-edge contract is a single directed hop,
            // so the matched triplets are (left.id, right.id, r.rel) —
            // reconstructed through the read pipeline like the node path.
            val nvs = nodeRe.findAllMatchIn(matchText).map(_.group(1)).toSeq
            require(nvs.size == 2 && boundEdgeVars.size == 1,
              s"edge SET supports a single named (a)-[r:rel]->(b) pattern: $q")
            val keys = org.apache.spark.sql.graft.Materialize.stored(
              run(g, matchText + s" RETURN ${nvs.head}.id AS src, " +
                s"${nvs.last}.id AS dst, ${vars.head}.rel AS rel"))
            items.foldLeft(g) { case (acc, (_, key, value)) =>
              acc.setEdgeProp(keys, key, value) }
          } else {
            val ids = org.apache.spark.sql.graft.Materialize.stored(
              run(g, matchText + s" RETURN ${vars.head}.id AS id"))
            items.foldLeft(g) { case (acc, (_, key, value)) =>
              acc.setNodeProp(ids, key, value) }
          }
        } else throw new IllegalArgumentException(s"unsupported write statement: $q")
      case _ => throw new IllegalArgumentException(s"unsupported write statement: $q")
    }
  }

  /** True when the statement is one of the three TEMPLATE write shapes
    * (node CREATE/MERGE, edge CREATE/MERGE by endpoint ids, the
    * adapters' MATCH-MATCH-MERGE edge template) — the shapes whose
    * element ids are driver-known literals, making their pre-state
    * probes batchable. Mirrors runWrite's ON-clause stripping. */
  private def templateShape(cypher: String): Boolean = {
    val q0 = cypher.trim.replaceAll("\\s+", " ")
    val up0 = maskedUpper(q0)
    val cut = Seq(up0.indexOf(" ON CREATE SET "), up0.indexOf(" ON MATCH SET "))
      .filter(_ >= 0).minOption
    val q = cut.fold(q0)(i => q0.substring(0, i).trim)
    q match {
      case writeNodeRe(_*) => true
      case writeEdgeRe(_*) => true
      case matchMergeEdgeRe(_*) => true
      case _ => false
    }
  }

  /** Execute a CHAIN of write statements — semantically identical to
    * `statements.foldLeft(g)(runWrite)` (spec-pinned), but each maximal
    * run of TEMPLATE writes pays ONE probe action instead of one
    * Materialize.stored pass per statement. The write path's local-mode
    * latency IS its job count (the r13/r14 Profile analyses), and a
    * 4-statement ON-clause chain paid 4 eager probe passes for
    * pre-state truths that are all answerable from the SEGMENT-START
    * snapshot: template ids are driver-known string literals, so a
    * later statement's pre-state = initial truth ∪ the earlier
    * statements' concrete increments — exact set arithmetic, evaluated
    * driver-side ([[AnswerProbes]]; a drift between the collect and
    * answer passes fails loudly, never silently guesses).
    *
    * One batched probe = one kind-tagged filter-union over the node ids
    * and edge triples the segment's dry pass collected — pushed
    * id-equality scans, collected to the driver (bounded by the chain
    * length, not the graph). Non-template statements (MATCH-driven
    * SET/REMOVE/DETACH DELETE — data-dependent key sets) break the
    * segment and run through the per-statement path unchanged. */
  def runWriteChain(g: PropertyGraph, statements: Seq[String]): PropertyGraph = {
    var cur = g
    var i = 0
    while (i < statements.length) {
      if (!templateShape(statements(i))) {
        cur = runWrite(cur, statements(i))
        i += 1
      } else {
        val seg = statements.drop(i).takeWhile(templateShape)
        val collect = new CollectProbes
        seg.foreach(s => runWrite(cur, s, collect))
        val nIds = collect.nodeIds.toSeq
        val eKeys = collect.edgeKeys.toSeq
        val (presentN, presentE) =
          if (nIds.isEmpty && eKeys.isEmpty) (Set.empty[String], Set.empty[(String, String, String)])
          else {
            val nLeg = if (nIds.isEmpty) None else Some(
              cur.nodes.filter(col("id").isin(nIds: _*))
                .select(lit("n").as("kind"), col("id").as("a"),
                  lit("").as("b"), lit("").as("c")))
            val eLeg = if (eKeys.isEmpty) None else Some(
              cur.edges.filter(eKeys.map(t =>
                  col("src") === lit(t._1) && col("dst") === lit(t._2) &&
                    col("rel") === lit(t._3)).reduce(_ || _))
                .select(lit("e").as("kind"), col("src").as("a"),
                  col("dst").as("b"), col("rel").as("c")))
            val rows = (nLeg.toSeq ++ eLeg.toSeq).reduce(_ unionByName _).collect()
            (rows.filter(_.getString(0) == "n").map(_.getString(1)).toSet,
              rows.filter(_.getString(0) == "e")
                .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet)
          }
        val answers = new AnswerProbes(nIds.toSet, presentN, eKeys.toSet, presentE)
        seg.foreach(s => cur = runWrite(cur, s, answers))
        i += seg.length
      }
    }
    cur
  }

  /** BOUNDED PATH ENUMERATION — the explicit opt-OUT of the
    * depth-projection contract for small subgraphs. The tabular subset
    * deliberately models a bound path variable as one row per
    * (endpoints, depth) because Cypher's one-row-per-distinct-path
    * multiplicity is exponential on dense graphs; this entry point
    * restores the real multiplicity — one row PER DISTINCT TRAIL
    * (Cypher's relationship-uniqueness semantics: no underlying edge
    * traversed twice within a path; node revisits allowed) — behind an
    * EXPLICIT row cap, refusing loudly the moment any expansion level
    * exceeds it (so a hub pattern fails fast with a named limit
    * instead of melting the cluster).
    *
    * Pattern: exactly one `(a[:type][{k: 'v'}])-[:rel[|rel2][*lo..hi]]-(b[...])`
    * relationship pattern (directed either way or undirected), same
    * node/relationship syntax as [[run]]. Output: one row per trail —
    * (src, dst, len, path) with `path` the '>'-joined node sequence in
    * walk order.
    *
    * Scale shape: level-synchronous expansion — each level is one
    * frontier-keyed equi-join against the rel-filtered hop view
    * (shuffle_hash: hash the frontier, stream the edges), materialized
    * per level (the BFS discipline) with the cap enforced on the
    * materialized count; trail uniqueness is a codegen'd
    * array_contains on the accumulated edge-key array (≤ hi ≤ 10
    * entries). Never a cartesian; the cap bounds every intermediate. */
  def enumeratePaths(g: PropertyGraph, pattern: String, cap: Long): DataFrame = {
    require(cap > 0, "path enumeration cap must be positive")
    val nodePats = nodeRe.findAllMatchIn(pattern)
      .map(m => (m.group(1), Option(m.group(2)), Option(m.group(3)))).toSeq
    val relPats = relRe.findAllMatchIn(pattern).map { m =>
      require(m.group(2) == null,
        s"edge variables are not supported in enumeratePaths: $pattern")
      val (lo, hi) =
        if (m.group(4) == null) (1, 1) else (m.group(4).toInt, m.group(5).toInt)
      require(lo >= 1 && hi >= lo && hi <= 10, s"unsupported path bounds *$lo..$hi")
      (m.group(3).split("\\|").map(_.trim).toSeq,
        lo, hi, m.group(1) != null, m.group(6) != null)
    }.toSeq
    require(nodePats.length == 2 && relPats.length == 1,
      s"enumeratePaths supports exactly one (a)-[:rel*lo..hi]-(b) pattern: $pattern")
    val (rels, lo, hi, revHead, fwdHead) = relPats.head
    require(!(revHead && fwdHead), s"unsupported double-headed relationship in: $pattern")

    // Inline-map + type filters on an endpoint node set (the [[run]]
    // semantics: pushed equality predicates at the scan).
    def endpointIds(t: Option[String], m: Option[String]): DataFrame = {
      val typed = PropertyGraph.ensureProps(
        t.fold(g.nodes)(tp => g.nodes.filter(col("ntype") === tp)))
      val filtered = m.fold(typed) { mt =>
        splitOutsideQuotes(mt.stripPrefix("{").stripSuffix("}"), ",")
          .map(_.trim).filter(_.nonEmpty).map {
            case mapPairRe(k, s, n) =>
              val c = k match {
                case "id" | "ntype" | "name" => col(k)
                case bagKey => element_at(col("props"), bagKey)
              }
              if (s != null) c === lit(s) else c.try_cast("double") === lit(n.toDouble)
            case other => throw new IllegalArgumentException(
              s"unsupported inline property entry: $other")
          }.foldLeft(typed)(_ filter _)
      }
      filtered.select(col("id"))
    }

    // Hop view in the walked orientation; `ekey` is the UNDERLYING
    // edge identity (orientation-free), so an undirected walk cannot
    // re-traverse the same relationship backwards — Cypher's
    // relationship uniqueness.
    val base = g.edges.filter(col("rel").isin(rels: _*))
      .select(col("src"), col("dst"),
        concat_ws("|", col("src"), col("rel"), col("dst")).as("ekey"))
    val hopLazy =
      if (revHead) base.select(col("dst").as("src"), col("src").as("dst"), col("ekey"))
      else if (fwdHead) base
      else base.union(
        base.select(col("dst").as("src"), col("src").as("dst"), col("ekey"))).distinct()
    // Multi-level enumerations store the oriented (src, dst, ekey) view
    // once, hash-partitioned on src — the chain-expansion discipline:
    // every per-level partial-path⋈hop join then exchanges only the
    // partial-path side. Cached per graph instance under its own
    // granularity tag (ekey rows, not pairs); repartition-then-distinct
    // keeps the layout claim (agg keys ⊇ src, rows never move).
    val hop =
      if (hi > 1) {
        val nPart = g.edges.sparkSession.sessionState.conf.numShufflePartitions
        val dirTag = if (revHead) "rev" else if (fwdHead) "fwd" else "undir"
        g.hopView((rels.sorted, dirTag, "ekey", nPart)) {
          val oriented =
            if (revHead) base.select(col("dst").as("src"), col("src").as("dst"), col("ekey"))
            else if (fwdHead) base
            else base.union(
              base.select(col("dst").as("src"), col("src").as("dst"), col("ekey")))
          val r = oriented.repartition(nPart, col("src"))
          val d0 = if (revHead || fwdHead) r else r.distinct()
          org.apache.spark.sql.graft.Materialize.storedHashed(d0, nPart, "src")
        }
      } else hopLazy

    def capped(df: DataFrame, level: Int): DataFrame = {
      val stored = org.apache.spark.sql.graft.Materialize.stored(df)
      val n = stored.count()
      require(n <= cap,
        s"path enumeration exceeded cap $cap at level $level ($n partial paths) " +
          s"for pattern: $pattern — narrow the pattern or raise the cap")
      stored
    }

    val seeds = endpointIds(nodePats.head._2, nodePats.head._3)
      .select(col("id").as("src"))
    var cur = capped(hop.join(seeds, Seq("src"), "left_semi")
      .select(col("src"), col("dst"),
        array(col("src"), col("dst")).as("pnodes"), array(col("ekey")).as("ekeys")), 1)
    val rightIds = endpointIds(nodePats(1)._2, nodePats(1)._3)
      .select(col("id").as("dst"))
    def emit(df: DataFrame, len: Int): DataFrame =
      df.join(rightIds, Seq("dst"), "left_semi")
        .select(col("src"), col("dst"), lit(len.toLong).as("len"),
          array_join(col("pnodes"), ">").as("path"))
    var out = if (lo <= 1) emit(cur, 1) else null
    for (len <- 2 to hi) {
      cur = capped(cur.as("p").hint("shuffle_hash")
        .join(hop.as("e"), col("p.dst") === col("e.src"))
        .filter(!array_contains(col("p.ekeys"), col("e.ekey")))
        .select(col("p.src").as("src"), col("e.dst").as("dst"),
          concat(col("p.pnodes"), array(col("e.dst"))).as("pnodes"),
          concat(col("p.ekeys"), array(col("e.ekey"))).as("ekeys")), len)
      if (len >= lo) {
        val e = emit(cur, len)
        out = if (out == null) e else out.union(e)
      }
    }
    out
  }

  def run(g: PropertyGraph, cypher: String): DataFrame = {
    val q = cypher.trim.replaceAll("\\s+", " ")
    // Read-only contract: a write clause must go through [[runWrite]] —
    // rejecting here keeps every read-path caller (search facade,
    // stores, oracles) statically incapable of mutating a graph.
    require(!isWrite(q),
      s"read-only context: CREATE/MERGE/DELETE/SET/REMOVE require CypherLite.runWrite: $q")
    // Arbitrary WITH chains: MATCH… (WITH items [WHERE pred] MATCH…)*
    // RETURN… — the reference forwards whatever Cypher the caller
    // writes (cypher_search_retriever.py:24), and chained reductions
    // (aggregate, filter, re-expand) are the natural second-level
    // query. The split is literal-aware (WITH inside a quoted string is
    // data) and operator-aware (the WITH of `STARTS WITH` is not a
    // clause).
    val withParts = splitOnWithClause(q)

    // Which path variables the query reads through nodes(p) /
    // relationships(p): the interior projections are only computed when
    // actually referenced (each adds a backward BFS + split joins).
    val pathNodeVars: Set[String] =
      """(?i)\bnodes\s*\(\s*(\w+)\s*\)""".r.findAllMatchIn(q).map(_.group(1)).toSet
    val pathRelVars: Set[String] =
      """(?i)\brelationships\s*\(\s*(\w+)\s*\)""".r.findAllMatchIn(q).map(_.group(1)).toSet

    var df: DataFrame = null
    var allNode: Set[String] = Set.empty
    var allEdge: Set[String] = Set.empty
    var allPath: Set[String] = Set.empty // path variables (read via length(p))
    var aliases: Set[String] = Set.empty // WITH-projected value columns

    // `v.prop`: fixed columns resolve directly; anything else reaches
    // into the property bag (NULL when absent — Cypher missing-property
    // semantics make every comparison against it false). Edge variables
    // expose `rel` as their fixed column.
    def propCol(v: String, p: String): Column =
      if (allEdge(v)) p match {
        case "rel" => col(s"${v}_rel")
        case bagKey => element_at(col(s"${v}_props"), bagKey)
      } else p match {
        case "id" | "ntype" | "name" => col(s"${v}_$p")
        case bagKey => element_at(col(s"${v}_props"), bagKey)
      }

    def merge(chainText: String, joinType: String): Unit = {
      val (cdf, nv, evs, pvs) = compileChain(g, chainText, pathNodeVars, pathRelVars)
      require((evs intersect allEdge).isEmpty,
        s"edge variable reused across patterns in: $q")
      require((nv.toSet intersect allEdge).isEmpty && (evs intersect allNode).isEmpty,
        s"variable bound as both node and edge in: $q")
      require((nv.toSet intersect aliases).isEmpty && (evs intersect aliases).isEmpty,
        s"pattern variable shadows a WITH alias in: $q")
      require((pvs intersect (allNode ++ allEdge ++ allPath ++ aliases)).isEmpty,
        s"path variable reuses a live variable name in: $q")
      val shared = nv.toSet intersect allNode
      require(shared.nonEmpty,
        s"pattern shares no variable with the preceding patterns (cartesian product unsupported): $chainText")
      val right = cdf.drop(shared.toSeq.flatMap(v =>
        Seq(s"${v}_ntype", s"${v}_name", s"${v}_props")): _*)
      df = df.join(right, shared.map(v => s"${v}_id").toSeq, joinType)
      allNode ++= nv
      allEdge ++= evs
      allPath ++= pvs
    }

    // One WHERE atom → a Column predicate. `v.prop op 'literal'` plus
    // `v.prop IS [NOT] NULL` (the OPTIONAL MATCH companion: predicate
    // the presence/absence of an optional binding or a bag key).
    // length(p) over a bound path variable — numeric compare on the
    // hop-depth column the var-length expansion carries.
    val lengthCmpRe = """(?i)length\s*\(\s*(\w+)\s*\)\s*(=|<>|>=|<=|>|<)\s*(\d+)""".r
    def atomPredicate(atom: String): Column = atom.trim match {
      // NOT <atom> and exists(v.prop) — Cypher's negation prefix and
      // property-presence test (exists ≡ IS NOT NULL on the bag read).
      case notRe(inner) => !atomPredicate(inner)
      case lengthCmpRe(v, op, n) =>
        require(allPath(v), s"length() over unknown path variable '$v' in: $q")
        val (c, l) = (col(s"${v}_len"), lit(n.toLong))
        op match {
          case "=" => c === l
          case "<>" => c =!= l
          case ">=" => c >= l
          case "<=" => c <= l
          case ">" => c > l
          case "<" => c < l
        }
      case existsRe(v, p) => propCol(v, p).isNotNull
      case whereRe(v, p, op, lit0) =>
        val c = propCol(v, p)
        // Numeric literal → numeric range compare (try_cast: a
        // non-numeric bag value becomes NULL, so the predicate is
        // false rather than an ANSI cast error).
        val numericLit = scala.util.Try(lit0.toDouble).toOption
        def rng(f: (Column, Column) => Column): Column = numericLit match {
          case Some(d) => f(c.try_cast("double"), lit(d))
          case None => f(c, lit(lit0))
        }
        op match {
          case "=" => c === lit0
          case "<>" => c =!= lit0
          case ">=" => rng(_ >= _)
          case "<=" => rng(_ <= _)
          case ">" => rng(_ > _)
          case "<" => rng(_ < _)
          case "STARTS WITH" => c.startsWith(lit0)
          case "ENDS WITH" => c.endsWith(lit0)
          case "CONTAINS" => c.contains(lit0)
        }
      case nullRe(v, p, not) =>
        if (not != null) propCol(v, p).isNotNull else propCol(v, p).isNull
      // property-to-property comparison (`a.p = b.q`, `a.p < b.q`):
      // on the stored representation — correct for equality and for
      // the ISO-date / zero-padded strings the projection stores.
      case propCmpRe(v1, p1, op, v2, p2) =>
        val (a, b) = (propCol(v1, p1), propCol(v2, p2))
        op match {
          case "=" => a === b
          case "<>" => a =!= b
          case ">=" => a >= b
          case "<=" => a <= b
          case ">" => a > b
          case "<" => a < b
        }
      case other => throw new IllegalArgumentException(s"unsupported WHERE clause: $other")
    }

    // Disjunctions with standard precedence: OR at the top, AND binding
    // tighter — `a AND b OR c` reads `(a AND b) OR c`, Cypher's (and
    // SQL's) grammar. Parentheses are not supported; both splits are
    // literal-aware.
    def applyWhere(w: String): Unit = {
      val pred = splitOutsideQuotes(w, " OR ")
        .map(part => splitOutsideQuotes(part, " AND ").map(atomPredicate).reduce(_ && _))
        .reduce(_ || _)
      df = df.filter(pred)
    }

    // Compile one segment's MATCH body (chains + OPTIONAL MATCHes +
    // WHERE) into the accumulated frame. Comma-separated patterns
    // conjoin on their SHARED node variables (one equi-join per
    // pattern); OPTIONAL MATCH left-joins instead, so unmatched rows
    // keep the mandatory bindings with NULLs for the optional ones
    // (Cypher's semantics). A pattern sharing no variable with what
    // precedes it would be a cartesian product — rejected.
    // Anonymous node patterns get fresh query-unique variables — one
    // compile path, and distinct anonymous nodes can never alias each
    // other into an accidental shared-variable join.
    var anonN = -1
    def freshAnon(): String = { anonN += 1; s"_anon$anonN" }

    def compileBody(text: String): Unit = {
      val matchPart = nameAnonymousNodes(
        section(text, "MATCH", Seq("OPTIONAL MATCH", "WHERE", "UNWIND", "RETURN")),
        () => freshAnon())
      val optParts = optionalSections(text).map(nameAnonymousNodes(_, () => freshAnon()))
      val wherePart = sectionOpt(text, "WHERE", Seq("UNWIND", "RETURN"))
      val chains = splitPatterns(matchPart)
      require(chains.nonEmpty, s"empty MATCH in: $q")
      var rest: Seq[String] = chains.toIndexedSeq
      if (df == null) {
        val (d, nv, ev, pv) = compileChain(g, chains.head, pathNodeVars, pathRelVars)
        df = d; allNode = nv.toSet; allEdge = ev; allPath = pv
        rest = rest.tail
      }
      rest.foreach(merge(_, "inner"))
      // one pattern per OPTIONAL MATCH: comma-conjunction inside an
      // optional block is all-or-nothing in Cypher, which a per-chain
      // left join wouldn't honor — keep the supported subset honest
      optParts.foreach { opt =>
        require(!opt.contains(","), s"unsupported multi-pattern OPTIONAL MATCH: $opt")
        merge(opt, "left")
      }
      wherePart.foreach(applyWhere)
    }

    compileBody(withParts.head)

    // ---- WITH projection/aggregation between MATCH bodies (looped per
    // segment for arbitrary chains) ----
    // Items: a bare node variable carries the whole binding forward; a
    // bare name that is a live alias carries that value column;
    // `v.prop AS alias` projects a value column; `agg(v.prop) AS alias`
    // aggregates with Cypher's implicit grouping (group by every
    // non-aggregate item). A WHERE attached to the WITH filters on the
    // projected aliases (Cypher's post-aggregation predicate — the
    // HAVING shape). Each WITH is a hard projection: only its items
    // survive into the next segment (edge variables and un-reprojected
    // aliases drop, per Cypher's scoping).
    var finalText = withParts.head
    for (segIdx <- 1 until withParts.length) {
      val tail = withParts(segIdx)
      val mUp = " " + maskedUpper(tail)
      val mIdx = mUp.indexOf(" MATCH ")
      // A TERMINAL WITH (no following MATCH) projects/aggregates and
      // hands straight to UNWIND/RETURN — the HAVING-then-return shape
      // (`MATCH … WITH x, count(*) AS n WHERE n > 5 RETURN …`) and the
      // collect→UNWIND round-trip both need it.
      val (cut, isTerminal) =
        if (mIdx >= 0) (mIdx, false)
        else {
          require(segIdx == withParts.length - 1,
            s"WITH must be followed by MATCH: $q")
          val cands = Seq(" UNWIND ", " RETURN ").map(mUp.indexOf(_)).filter(_ >= 0)
          require(cands.nonEmpty,
            s"WITH must be followed by MATCH, UNWIND or RETURN: $q")
          (cands.min, true)
        }
      val head = tail.substring(0, cut).trim
      val restText = tail.substring(cut)
      val hw = splitOutsideQuotes(head, " WHERE ")
      require(hw.length <= 2, s"multiple WHERE in WITH: $q")
      var keyCols = Vector.empty[Column]
      var aggCols = Vector.empty[Column]
      var carried = Set.empty[String]
      var segAliases = Set.empty[String] // aliases live AFTER this WITH
      hw.head.split(",").map(_.trim).foreach {
        case withAggRe(fn, dist, v, p, alias) =>
          aggCols :+= aggExpr(fn, dist != null, propCol(v, p)).as(alias)
          segAliases += alias
        case withScalarRe(v, p, alias) =>
          keyCols :+= propCol(v, p).as(alias); segAliases += alias
        case withBareRe(v) if allNode(v) =>
          carried += v
          keyCols ++= Seq(s"${v}_id", s"${v}_ntype", s"${v}_name", s"${v}_props").map(col)
        case withBareRe(v) if aliases(v) =>
          // an alias projected by a PREVIOUS With, carried through
          keyCols :+= col(v); segAliases += v
        case other => throw new IllegalArgumentException(s"unsupported WITH item: $other")
      }
      df = if (aggCols.nonEmpty) {
        require(keyCols.nonEmpty, s"ungrouped WITH aggregation unsupported: $q")
        df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else df.select(keyCols: _*)
      allNode = carried
      allEdge = Set.empty
      aliases = segAliases
      hw.lift(1).foreach { w =>
        splitOutsideQuotes(w, " AND ").foreach {
          case withPredRe(name, op, strLit, numLit) =>
            require(aliases(name), s"WITH WHERE references unknown alias '$name' in: $q")
            val c = col(name)
            val l: Column = if (strLit != null) lit(strLit) else lit(numLit.toDouble)
            df = df.filter(op match {
              case "=" => c === l
              case "<>" => c =!= l
              case ">=" => c >= l
              case "<=" => c <= l
              case ">" => c > l
              case "<" => c < l
            })
          case other => throw new IllegalArgumentException(s"unsupported WITH predicate: $other")
        }
      }
      if (!isTerminal) compileBody(restText)
      finalText = restText
    }

    // ---- UNWIND (final segment, between WHERE and RETURN): each
    // `UNWIND expr AS name` explodes one row per list element — expr is
    // a live alias (typically a WITH collect(...) column) or a literal
    // list. Empty/NULL lists drop the row, Cypher's semantics (and
    // explode's). The unwound name becomes an alias referencable in
    // RETURN/ORDER BY; aggregates over it see the multiplicity. ----
    sectionOpt(finalText, "UNWIND", Seq("RETURN")).foreach { u =>
      splitOutsideQuotes(u, " UNWIND ").map(_.trim).foreach { item =>
        val m = """(?i)^(.+?)\s+AS\s+(\w+)$""".r
        item match {
          case m(exprText, name) =>
            val src = exprText.trim
            val c: Column =
              if (aliases(src)) col(src)
              else if (src.startsWith("[") && src.endsWith("]")) {
                val elems = src.substring(1, src.length - 1).split(",").map(_.trim)
                  .filter(_.nonEmpty).map { e =>
                    if (e.startsWith("'") && e.endsWith("'") && e.length >= 2)
                      lit(e.substring(1, e.length - 1))
                    else if (e.matches("-?\\d+")) lit(e.toLong)
                    else lit(e.toDouble)
                  }
                array(elems.toIndexedSeq: _*)
              } else throw new IllegalArgumentException(
                s"UNWIND source must be a WITH alias or a literal list: $src")
            df = df.withColumn(name, explode(c))
            aliases += name
          case other => throw new IllegalArgumentException(s"unsupported UNWIND: $other")
        }
      }
    }

    val retPart = section(finalText, "RETURN", Seq("ORDER BY", "SKIP", "LIMIT"))
    val orderPart = sectionOpt(finalText, "ORDER BY", Seq("SKIP", "LIMIT"))
    val skipPart = sectionOpt(finalText, "SKIP", Seq("LIMIT"))
    val limitPart = sectionOpt(finalText, "LIMIT", Seq.empty)

    val isDistinct = retPart.toUpperCase.startsWith("DISTINCT ")
    val retBody = if (isDistinct) retPart.substring("DISTINCT ".length) else retPart
    // Scalar functions over a property reference (Cypher's everyday
    // projection sugar): toLower/toUpper/trim map to their SQL twins,
    // size(string) is character length (the props bag stores strings),
    // coalesce(v.p, 'lit') defaults a missing property/bag key.
    val fnItemRe =
      """(?i)(toLower|toUpper|size|trim)\s*\(\s*(\w+)\.(\w+)\s*\)(?:\s+[aA][sS]\s+(\w+))?""".r
    val coalesceItemRe =
      """(?i)coalesce\s*\(\s*(\w+)\.(\w+)\s*,\s*'([^']*)'\s*\)(?:\s+[aA][sS]\s+(\w+))?""".r
    // Searched CASE: WHEN predicates reuse the WHERE atom grammar,
    // THEN/ELSE take quoted-string or numeric literals.
    val caseItemRe = """(?i)^CASE\s+(.*?)\s+END(?:\s+[aA][sS]\s+(\w+))?$""".r
    // length(p) as a RETURN item: the path's hop depth (a plain value
    // column — participates in Cypher's implicit grouping like any
    // non-aggregate item).
    val lengthItemRe = """(?i)^length\s*\(\s*(\w+)\s*\)(?:\s+[aA][sS]\s+(\w+))?$""".r
    // nodes(p)/relationships(p) project the SORTED SET of nodes / of
    // traversed "m1>m2" hop steps on some walk of the row's length
    // between its endpoints (the bounded union-over-walks contract —
    // per-path multiplicity would be exponential; the chain compiler
    // computes both sets as forward×backward frontier joins).
    val pathFnRe = """(?i)^(nodes|relationships)\s*\(\s*(\w+)\s*\)(?:\s+[aA][sS]\s+(\w+))?$""".r
    val items = splitItems(retBody).toArray.flatMap {
      case lengthItemRe(v, alias) if allPath(v) => Seq {
        val name = Option(alias).getOrElse(s"length_$v")
        (false, col(s"${v}_len").as(name), name)
      }
      case pathFnRe(fn, v, alias) if allPath(v) => Seq {
        val isNodes = fn.equalsIgnoreCase("nodes")
        val name = Option(alias).getOrElse(if (isNodes) s"nodes_$v" else s"relationships_$v")
        (false, col(if (isNodes) s"${v}_nodes" else s"${v}_rels").as(name), name)
      }
      case caseItemRe(body, alias) => Seq {
        val whenRe = """(?i)WHEN\s+(.+?)\s+THEN\s+(?:'([^']*)'|(-?\d+(?:\.\d+)?))""".r
        val elseRe = """(?i)ELSE\s+(?:'([^']*)'|(-?\d+(?:\.\d+)?))\s*$""".r
        def litOf(quoted: String, num: String): Column =
          if (quoted != null) lit(quoted)
          else if (num.contains('.')) lit(num.toDouble) else lit(num.toLong)
        val whens = whenRe.findAllMatchIn(body)
          .map(m => (atomPredicate(m.group(1)), litOf(m.group(2), m.group(3)))).toSeq
        require(whens.nonEmpty, s"CASE needs at least one WHEN … THEN …: $q")
        val base = whens.tail.foldLeft(when(whens.head._1, whens.head._2)) {
          case (acc, (p, v)) => acc.when(p, v)
        }
        val c = elseRe.findFirstMatchIn(body)
          .map(m => base.otherwise(litOf(m.group(1), m.group(2)))).getOrElse(base)
        val name = Option(alias).getOrElse("case")
        (false, c.as(name), name)
      }
      case fnItemRe(fn, v, p, alias) => Seq {
        val c = fn.toLowerCase match {
          case "tolower" => lower(propCol(v, p))
          case "toupper" => upper(propCol(v, p))
          case "trim" => trim(propCol(v, p))
          case "size" => length(propCol(v, p)).cast("long")
        }
        val name = Option(alias).getOrElse(s"${fn.toLowerCase}_${v}_$p")
        (false, c.as(name), name)
      }
      case coalesceItemRe(v, p, dflt, alias) => Seq {
        val name = Option(alias).getOrElse(s"coalesce_${v}_$p")
        (false, coalesce(propCol(v, p), lit(dflt)).as(name), name)
      }
      case retItemRe(null, _, _, _, null, null, null, bare, null) if bare != null && allNode(bare) =>
        // RETURN n — a bare NODE variable expands to its relational
        // projection (<v>_id, <v>_ntype, <v>_name; the props bag stays
        // behind — maps have no cross-engine canonical rendering).
        // Mixed with aggregates, all three land in the implicit
        // grouping key, Cypher's group-by-the-node semantics.
        Seq("id", "ntype", "name").map(f =>
          (false, col(s"${bare}_$f").as(s"${bare}_$f"), s"${bare}_$f"))
      case m @ retItemRe(aggFn, dist, av, ap, aggBare, v, p, bare, alias) => Seq {
        if (aggFn != null) {
          val (c, defName) =
            if (av != null) (propCol(av, ap), s"${aggFn}_${av}_$ap")
            else {
              require(aliases(aggBare), s"aggregate over unknown alias '$aggBare' in: $q")
              (col(aggBare), s"${aggFn}_$aggBare")
            }
          val name = Option(alias).getOrElse(defName)
          (true, aggExpr(aggFn, dist != null, c).as(name), name)
        } else if (v != null) {
          val name = Option(alias).getOrElse(s"${v}_$p")
          (false, propCol(v, p).as(name), name)
        } else if (bare != null) {
          // a WITH-projected value column referenced by its alias
          require(aliases(bare), s"unsupported RETURN item: $bare")
          val name = Option(alias).getOrElse(bare)
          (false, col(bare).as(name), name)
        } else {
          val name = Option(alias).getOrElse("count")
          (true, count(lit(1)).as(name), name)
        }
      }
      case other => throw new IllegalArgumentException(s"unsupported RETURN item: $other")
    }
    val aggItems = items.filter(_._1)
    val keyItems = items.filterNot(_._1)
    // ORDER BY keys: a returned alias/name, or `var.prop` — the latter
    // rides as a HIDDEN projected column (dropped after the sort), so a
    // query can order by a property it does not return. Cypher itself
    // only allows that for a plain projection — after DISTINCT or an
    // aggregation, ORDER BY must reference returned items — and the
    // same restriction applies here.
    val propSortRe = """(\w+)\.(\w+)""".r
    val sortSpecs: Seq[(String, Boolean)] = orderPart.toSeq.flatMap(
      _.split(",").map(_.trim).map { s =>
        (s.split("\\s+").head, s.toUpperCase.endsWith(" DESC"))
      })
    val hiddenSorts: Seq[(String, Column)] = sortSpecs.zipWithIndex.collect {
      case ((propSortRe(v, p), _), i) => (s"__sort_$i", propCol(v, p))
    }
    require(hiddenSorts.isEmpty || (aggItems.isEmpty && !isDistinct),
      s"ORDER BY on var.prop needs a plain RETURN (no DISTINCT/aggregates) — return it as an alias instead: $q")
    var out =
      if (aggItems.isEmpty) {
        val sel = df.select((items.map(_._2) ++
          hiddenSorts.map { case (n, c) => c.as(n) }).toIndexedSeq: _*)
        if (isDistinct) sel.distinct() else sel
      } else df.groupBy(keyItems.map(_._2).toIndexedSeq: _*)
        .agg(aggItems.head._2, aggItems.tail.map(_._2).toIndexedSeq: _*)
        // groupBy emits keys-then-aggregates; re-project to the RETURN
        // list's order (Cypher projection order — what a schema-
        // sensitive consumer expects).
        .select(items.map(i => col(i._3)).toIndexedSeq: _*)

    if (sortSpecs.nonEmpty) {
      val sorts = sortSpecs.zipWithIndex.map { case ((key, desc), i) =>
        val c = key match {
          case propSortRe(_, _) => col(s"__sort_$i")
          case name => col(name)
        }
        if (desc) c.desc else c.asc
      }
      out = out.orderBy(sorts.toIndexedSeq: _*)
      if (hiddenSorts.nonEmpty) out = out.drop(hiddenSorts.map(_._1): _*)
    }
    // SKIP before LIMIT, Cypher's clause order: rows [skip, skip+limit).
    // Deterministic only under an ORDER BY total order — same contract
    // as Cypher itself.
    skipPart.foreach(n => out = out.offset(n.trim.toInt))
    limitPart.foreach(n => out = out.limit(n.trim.toInt))
    out
  }

  private def section(q: String, kw: String, stops: Seq[String]): String =
    sectionOpt(q, kw, stops).getOrElse(throw new IllegalArgumentException(s"missing $kw in: $q"))

  /** Uppercased copy of `q` with every single-quoted literal span
    * masked (index-preserving), so clause-keyword scans and top-level
    * splits can't match inside string literals — `WHERE x.name =
    * 'THE RETURN HOME'` must not truncate the predicate at the quoted
    * RETURN. */
  private def maskedUpper(q: String): String = {
    val sb = new java.lang.StringBuilder(q.length)
    var in = false
    q.foreach { ch =>
      if (ch == '\'') { in = !in; sb.append('\'') }
      else sb.append(if (in) '\u0000' else Character.toUpperCase(ch))
    }
    sb.toString
  }

  /** Rewrite each variable-less node pattern to `(<fresh var> …)`,
    * scanning the quote-MASKED text (an `()` inside a string literal is
    * data) but splicing from the original, so literal content and the
    * node's own type/map text survive untouched. */
  private def nameAnonymousNodes(s: String, fresh: () => String): String = {
    val masked = maskedUpper(s)
    val sb = new java.lang.StringBuilder(s.length + 16)
    var last = 0
    anonNodeRe.findAllMatchIn(masked).foreach { m =>
      sb.append(s, last, m.start)
      val inner = s.substring(m.start + 1, m.end - 1).trim
      sb.append('(').append(fresh())
      if (inner.nonEmpty) sb.append(if (inner.startsWith(":")) "" else " ").append(inner)
      sb.append(')')
      last = m.end
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Split a MATCH body into its comma-separated patterns: commas
    * inside quoted literals, inline property maps `{…}` or relationship
    * brackets `[…]` are part of the pattern, not separators. */
  private def splitPatterns(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var inQ = false
    var depth = 0
    s.foreach { ch =>
      if (ch == '\'') { inQ = !inQ; sb.append(ch) }
      else if (inQ) sb.append(ch)
      else ch match {
        case '{' | '[' => depth += 1; sb.append(ch)
        case '}' | ']' => depth -= 1; sb.append(ch)
        case ',' if depth == 0 => parts += sb.toString; sb.setLength(0)
        case c => sb.append(c)
      }
    }
    parts += sb.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Split a projection list on top-level commas: commas inside quoted
    * literals or any bracket pair `(…)`/`[…]`/`{…}` belong to the item
    * (`coalesce(v.p, 'x')` is one item). */
  private def splitItems(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var inQ = false
    var depth = 0
    s.foreach { ch =>
      if (ch == '\'') { inQ = !inQ; sb.append(ch) }
      else if (inQ) sb.append(ch)
      else ch match {
        case '(' | '[' | '{' => depth += 1; sb.append(ch)
        case ')' | ']' | '}' => depth -= 1; sb.append(ch)
        case ',' if depth == 0 => parts += sb.toString; sb.setLength(0)
        case c => sb.append(c)
      }
    }
    parts += sb.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Split on `sep` (uppercase) at occurrences OUTSIDE quoted literals. */
  private def splitOutsideQuotes(s: String, sep: String): Seq[String] = {
    val m = maskedUpper(s)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = m.indexOf(sep)
    while (i >= 0) {
      parts += s.substring(start, i)
      start = i + sep.length
      i = m.indexOf(sep, start)
    }
    parts += s.substring(start)
    parts.toSeq
  }

  /** Split on clause-level ` WITH ` boundaries: occurrences inside
    * quoted literals are masked away, and a WITH immediately preceded
    * by the word STARTS is the `STARTS WITH` operator, not a clause. */
  private def splitOnWithClause(s: String): Seq[String] = {
    val m = maskedUpper(s)
    val sep = " WITH "
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = m.indexOf(sep)
    while (i >= 0) {
      val pre = m.substring(0, i)
      // `STARTS WITH` / `ENDS WITH` are operators, not the WITH clause.
      val isOperator = Seq("STARTS", "ENDS").exists(kw => pre.endsWith(kw) &&
        (pre.length == kw.length ||
          !Character.isLetterOrDigit(pre.charAt(pre.length - kw.length - 1))))
      if (isOperator) i = m.indexOf(sep, i + 1)
      else {
        parts += s.substring(start, i)
        start = i + sep.length
        i = m.indexOf(sep, start)
      }
    }
    parts += s.substring(start)
    parts.toSeq
  }

  /** Every `OPTIONAL MATCH <pattern>` block, in order. Each ends at the
    * next OPTIONAL MATCH / WHERE / RETURN. */
  private def optionalSections(q: String): Seq[String] = {
    val up = maskedUpper(q)
    val kw = "OPTIONAL MATCH "
    val starts = Iterator.iterate(up.indexOf(kw))(i => up.indexOf(kw, i + 1))
      .takeWhile(_ >= 0).toSeq
    starts.zipWithIndex.map { case (s, i) =>
      val from = s + kw.length
      val nextOpt = starts.drop(i + 1).headOption.getOrElse(Int.MaxValue)
      val end = (Seq("WHERE", "RETURN")
        .map(st => up.indexOf(" " + st + " ", from)).filter(_ >= 0) :+ nextOpt :+ q.length).min
      q.substring(from, math.min(end, q.length)).trim
    }
  }

  private def sectionOpt(q: String, kw: String, stops: Seq[String]): Option[String] = {
    val up = maskedUpper(q)
    val i = up.indexOf(kw + " ")
    if (i < 0) None
    else {
      val from = i + kw.length + 1
      val end = stops.map(s => up.indexOf(" " + s + " ", from)).filter(_ >= 0) match {
        case Nil => q.length
        case xs => xs.min
      }
      Some(q.substring(from, end).trim)
    }
  }
}
