package graft

import graft.graph.{GraphAlgos, GraphQueries, TpchGraph}
import graft.operators._
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 2.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine(col("a"), col("b")).as("same"),
      VectorOps.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("cosine of an all-zero vector FAILS LOUDLY (ANSI divide-by-zero) — the pinned boundary") {
    // SURVEY §degenerate-data boundary: an undefined cosine (zero norm)
    // fails loudly under Spark 4's default ANSI mode (DIVIDE_BY_ZERO
    // applies to double division too), while the DuckDB oracles would
    // yield NaN and sort it first. The generator cannot emit zero
    // vectors and loud failure is the chosen posture for an undefined
    // cosine; this spec pins it so a Spark upgrade (or someone flipping
    // spark.sql.ansi.enabled) can't silently change the shape — if this
    // starts returning NaN instead, re-audit every cosine call site and
    // the SURVEY boundary note before accepting the new behavior.
    val df = Seq((Array(0.0, 0.0), Array(1.0, 0.0))).toDF("z", "a")
    val e = intercept[Exception](
      df.select(VectorOps.cosine(col("z"), col("a")).as("c")).head())
    def isDivByZero(t: Throwable): Boolean = t != null &&
      (t.getClass.getSimpleName == "SparkArithmeticException" ||
        Option(t.getMessage).exists(_.contains("DIVIDE_BY_ZERO")) ||
        isDivByZero(t.getCause))
    assert(isDivByZero(e), s"zero-norm cosine changed failure class: ${e.getClass.getName}")
  }

  test("IVF shortlist is a subset of scored corpus with full per-query results") {
    val ivf = VectorOps.knnIvf(spark, sf).collect()
    assert(ivf.map(_.getLong(0)).distinct.length === 10)
    assert(ivf.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }

  test("hyperplane LSH with nbits=0 reduces to brute-force knn") {
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorOps.knnLsh(spark, sf, nbits = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
  }

  test("multi-probe LSH recall dominates single-bucket recall") {
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(probe: Int) = VectorOps.knnLsh(spark, sf, probeHamming = probe).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(exact).size
    val r0 = recall(0)
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r1 >= r0 && r2 >= r1, s"recall hits: $r0 / $r1 / $r2")
    assert(r2 > r0) // wider probes must actually find more true neighbors here
  }

  test("hyperplane LSH buckets partition the corpus deterministically") {
    val a = VectorOps.knnLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = VectorOps.knnLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("IVF with nprobe >= k (all cells) reduces to brute-force knn") {
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = VectorOps.knnIvf(spark, sf, nprobe = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === exact) // probing every cell must reduce to brute force
  }

  test("IVF recall vs exact knn at nprobe=3 on the trained quantizer") {
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorOps.knnIvf(spark, sf, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // shortlist covers a useful share at 3/ k cells
  }

  test("IVFPQ with refine >= probed population reduces to IVF-flat at the same nprobe") {
    // A refine budget covering everything the coarse quantizer admits
    // means the exact stage re-ranks the whole IVF shortlist — byte
    // parity with knnIvf by construction (shared cached quantizer).
    val flat = VectorOps.knnIvf(spark, sf, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pq = VectorOps.knnIvfPq(spark, sf, nprobe = 3, refine = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pq === flat)
  }

  test("IVFPQ ADC shortlist recall: default refine recovers most of IVF-flat's answer") {
    // Isolates the PQ estimate's quality from coarse-cell loss: compare
    // against IVF-flat at the SAME nprobe; the 4x-k refine budget must
    // let the exact stage recover the bulk of the flat answer.
    val flat = VectorOps.knnIvf(spark, sf, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = VectorOps.knnIvfPq(spark, sf, nprobe = 3, refine = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(flat).size.toDouble / flat.size
    assert(recall >= 0.7, s"ADC recall vs IVF-flat $recall")
  }

  test("SQ8 with refine >= corpus reduces to exact brute-force knn") {
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sq = VectorOps.knnSq8(spark, sf, refine = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sq === exact)
  }

  test("SQ8 recall at the default refine against exact brute force") {
    // Per-dimension resolution survives 8-bit quantization far better
    // than PQ's 50x compression — the default refine budget must
    // recover nearly all of the exact answer.
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = VectorOps.knnSq8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = sq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"SQ8 recall vs exact $recall")
  }

  test("truncated-dim ANN: full width + full refine reduces to exact knn; prefix recall holds") {
    val exact = VectorOps.knn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = VectorOps.knnTruncated(spark, sf, dims = 64, refine = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full === exact)
    // The synthetic embeddings are NOT Matryoshka-trained (energy is
    // uniform across dims — a d-prefix keeps ~d/64 of the signal), so
    // the default 32-dim prefix is the honest halfway point: recall
    // must clear a meaningful bar, and a trained-prefix corpus only
    // improves it.
    val pre = VectorOps.knnTruncated(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pre.intersect(exact.map(t => (t._1, t._2))).size.toDouble / exact.size
    assert(recall >= 0.6, s"32-dim prefix recall vs exact $recall")
  }

  test("one-pass PQ training equals m sequential per-subspace Lloyd's runs") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val onePass = VectorOps.pqTrainCodebooks(e)
    val seq = Array.tabulate(8) { j =>
      VectorOps.kmeansCentroids(
        e.select(col("vec_id"), slice(col("v"), j * 8 + 1, 8).as("v")), 16, l2 = true)
    }
    for (j <- 0 until 8; c <- 0 until 16)
      assert(onePass(j)(c).toSeq === seq(j)(c).toSeq, s"book $j cell $c diverges")
  }

  test("PQ training compiles under the 64 KB codegen method limit (no interpreted fallback)") {
    // With fallback disabled a janino CompileException ("Code of method
    // grows beyond 64 KB") aborts the job instead of silently running
    // the training interpreted — which is exactly the regression this
    // guards against (round 7 shipped 4 such fallbacks per training).
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val books = VectorOps.pqTrainCodebooks(e)
      assert(books.length === 8 && books.forall(_.length === 16))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("residual ADC recall >= flat ADC recall at the same (m, ks)") {
    // Same coarse cells, same refine budget — the only difference is
    // what the codes quantize (within-cell residuals vs raw vectors),
    // so the comparison isolates codebook quality.
    val flatIvf = VectorOps.knnIvf(spark, sf, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(residual: Boolean) =
      VectorOps.knnIvfPq(spark, sf, nprobe = 3, refine = 20, residual = residual).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(flatIvf).size.toDouble / flatIvf.size
    val (rRes, rFlat) = (recall(residual = true), recall(residual = false))
    assert(rRes >= rFlat, s"residual recall $rRes < flat recall $rFlat")
  }

  test("cell-blocked dedupCosine equals brute-force all-pairs (no pair >= tau lost)") {
    import TestSpark.spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.select(col("vec_id").as("v1"), col("v").as("va"))
    val b = e.select(col("vec_id").as("v2"), col("v").as("vb"))
    val brute = a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        round(VectorOps.cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = VectorOps.dedupCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
  }

  test("dedupCosine stays exact when the quantizer trains on a tiny sample") {
    // trainCap far below the corpus forces the sampled-training path;
    // the pruning bound uses full-corpus radii, so output must not move.
    val full = VectorOps.dedupCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sampled = VectorOps.dedupCosine(spark, sf, trainCap = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sampled === full)
  }

  test("on a clustered corpus the angular bound prunes most cell pairs, exactly") {
    import TestSpark.spark.implicits._
    // 4 tight clusters around near-orthogonal axes: within-cluster
    // cosine ~1, cross-cluster ~0 — the shape of a real embedding
    // corpus. At tau=0.9 the bound must discard cross-cluster cells.
    val rng = new scala.util.Random(42)
    val dim = 16
    val rows = for {
      c <- 0 until 4
      i <- 0 until 30
    } yield {
      val v = Array.tabulate(dim)(d => if (d == c * 4) 10.0 else rng.nextDouble() * 0.5)
      ((c * 30 + i).toLong, v.toSeq)
    }
    val vecs = rows.toDF("vec_id", "v")
    val e = vecs.select(col("vec_id"), col("v"),
      sqrt(org.apache.spark.sql.graft.VectorExpressions.dotNative(col("v"), col("v"))).as("nv"))
    val (assigned, cand) = VectorOps.cellCandidates(e, tau = 0.9)
    val k = assigned.select(col("cell")).distinct().count().toInt
    assert(cand.size < k * (k + 1) / 2, s"no pruning: ${cand.size} of ${k * (k + 1) / 2} pairs kept")
    // and exactness survives the pruning: blocked result == brute force
    val a = vecs.select(col("vec_id").as("v1"), col("v").as("va"))
    val b = vecs.select(col("vec_id").as("v2"), col("v").as("vb"))
    val brute = a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"), round(VectorOps.cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = VectorOps.dedupCosineOf(spark, vecs, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
  }

  test("soak: 20k-vector corpus with planted near-dups — full recall, real pruning") {
    import TestSpark.spark.implicits._
    // 12 clusters on distinct axes, 9.5k base vectors + 500 jittered
    // copies (cosine ~0.999 to their base). tau=0.95 must find every
    // planted pair; cross-cluster cell pairs must be pruned.
    val rng = new scala.util.Random(7)
    val dim = 32
    val base = (0 until 9500).map { i =>
      val c = i % 12
      val v = Array.tabulate(dim)(d =>
        (if (d == (c * 2) % dim || d == (c * 2 + 1) % dim) 5.0 else 0.0) + rng.nextDouble() * 0.15)
      (i.toLong, v)
    }
    val dups = (0 until 500).map { j =>
      val (id, v) = base(j * 19 % base.length)
      ((10000 + j).toLong, v.map(_ + rng.nextDouble() * 0.01), id)
    }
    val vecs = (base.map { case (i, v) => (i, v.toSeq) } ++
      dups.map { case (i, v, _) => (i, v.toSeq) }).toDF("vec_id", "v")
      .repartition(8)
    val e = vecs.select(col("vec_id"), col("v"),
      sqrt(org.apache.spark.sql.graft.VectorExpressions.dotNative(col("v"), col("v"))).as("nv"))
    val (assigned, cand) = VectorOps.cellCandidates(e, tau = 0.95)
    val k = assigned.select(col("cell")).distinct().count().toInt
    assert(cand.size < k * (k + 1) / 2, s"no pruning at 20k: ${cand.size} of ${k * (k + 1) / 2}")
    val found = VectorOps.dedupCosineOf(spark, vecs, tau = 0.95)
      .select(col("v1"), col("v2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = dups.map { case (dupId, _, baseId) =>
      (math.min(dupId, baseId), math.max(dupId, baseId))
    }.toSet
    assert(planted.subsetOf(found),
      s"missed ${planted.diff(found).size} of ${planted.size} planted pairs")
  }

  test("dedupCosine plans equi-joins on cells, never a nested-loop cartesian") {
    val plan = VectorOps.dedupCosine(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedupCosine exact-duplicate collapse: replicated corpus ≡ brute force, scored over reps only") {
    import TestSpark.spark.implicits._
    // 40 distinct vectors × 5 bitwise-identical copies each (the sf1
    // soak shape): the pair set must equal brute force over all 200
    // rows — in-group pairs at the rounded self-cosine included — while
    // the cell machinery sees only the 40 representatives.
    val rng = new scala.util.Random(11)
    val distinctVecs = (0 until 40).map(i => Array.fill(16)(rng.nextGaussian()))
    val rows = for (c <- 0 until 5; i <- 0 until 40)
      yield ((c * 40 + i).toLong, distinctVecs(i).toSeq)
    val vecs = rows.toDF("vec_id", "v")
    val a = vecs.select(col("vec_id").as("p1"), col("v").as("va"))
    val b = vecs.select(col("vec_id").as("p2"), col("v").as("vb"))
    val brute = a.join(b, col("p1") < col("p2"))
      .select(col("p1"), col("p2"), round(VectorOps.cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val collapsed = VectorOps.dedupCosineOf(spark, vecs, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(collapsed === brute)
    // every in-group pair (10 per distinct vector × 40) is present
    assert(brute.count(_._3 >= 0.9999) >= 400)
    // the rep relation the cell joins consume is the distinct-vector set
    val e = vecs.select(col("vec_id"), col("v"),
      sqrt(org.apache.spark.sql.graft.VectorExpressions.dotNative(col("v"), col("v"))).as("nv"))
    val reps = e.withColumn("rep",
        min(col("vec_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("v"))))
      .filter(col("vec_id") === col("rep"))
    assert(reps.count() == 40)
  }
}

class DedupOpsSpec extends SparkSpecBase {

  test("minhash LSH finds exactly the exact-jaccard pairs on this corpus") {
    val exact = DedupOps.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minHashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty)
  }

  test("cluster resolution is transitive and keeps exactly one doc per component") {
    val out = DedupOps.queries("dedup_cluster")(spark, sf).cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // the representative is a member of its own cluster and is numeric-min
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (rep, members) =>
      assert(members.map(_._1).min === rep, s"rep $rep is not the min member")
      assert(members.count(_._3) === 1, s"cluster $rep must keep exactly one doc")
      assert(members.find(_._1 == rep).exists(_._3), s"the kept doc must be the rep")
    }
    // TRANSITIVITY beyond pairwise similarity: every qualifying pair's
    // endpoints land in the same cluster, so a≈b, b≈c chain into one
    // component even when a and c never paired
    val clusterOf = rows.map(r => r._1 -> r._2).toMap
    DedupOps.ngramJaccard(spark, sf).collect().foreach { r =>
      assert(clusterOf(r.getLong(0)) === clusterOf(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
    out.unpersist()
  }

  test("simhash near-dup pairs have small hamming and cover jaccard dups") {
    val sim = DedupOps.simHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sim.forall(_._3 <= 3))
    assert(sim.nonEmpty)
  }

  test("prefix-filtered ngram jaccard: planted 100%-df hot shingle, zero lost pairs, pruned index") {
    import TestSpark.spark.implicits._
    // Every doc shares the hot phrase "aaa bbb ccc" (one 100%-df shingle
    // + two 100%-df boundary shingles per doc); docs 0/1 and 2/3 are
    // planted near-dup pairs, the rest are unique filler.
    val hot = "aaa bbb ccc"
    val docs = (0 until 40).map { i =>
      val body = i match {
        case 0 | 1 => s"dup${i / 2} w1 w2 w3 w4 w5 w6 w7 w8 w9 extra$i"
        case 2 | 3 => s"dup${i / 2} v1 v2 v3 v4 v5 v6 v7 v8 v9 extra$i"
        case _ => (0 until 12).map(k => s"u${i}_$k").mkString(" ")
      }
      (i.toLong, s"$hot $body")
    }.toDF("doc_id", "text")

    // Brute force: full shingle sets, all 780 pairs, exact jaccard.
    val sets = DedupOps.shinglesOf(docs)
      .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("ss"))
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val jac = inter / (size(col("s1")) + size(col("s2")) - inter)
    val brute = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.ss").as("s1"), col("b.ss").as("s2"))
      .filter(jac >= 0.5)
      .select(col("d1"), col("d2"), round(jac, 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val pruned = DedupOps.ngramJaccardPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === brute, "prefix filtering must lose no pair at J >= tau")
    assert(brute.map(p => (p._1, p._2)) === Set((0L, 1L), (2L, 3L)))

    // The hot shingle sorts last under the df order, so it never enters
    // any doc's prefix: the candidate join stays near-linear instead of
    // the naive index's >= C(40,2) = 780 hot-key pairs in one reducer.
    val idx = DedupOps.ngramPrefixIndex(docs, 0.5)
    assert(idx.filter(col("h") === xxhash64(lit(hot))).count() === 0L)
    val nCand = idx.as("a").join(idx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(nCand <= 10L, s"candidate pairs should collapse to the planted dups, got $nCand")
  }

  test("suffix bound keeps length-skewed containment pairs (max, not min, over suffixes)") {
    import TestSpark.spark.implicits._
    // doc 0 ⊂ doc 1: x has 4 shingles, y = x plus 4 unique (df=1)
    // shingles → J = 4/8 = 0.5 exactly at τ. Under the df-ascending
    // order y's unique shingles fill its prefix and push the shared
    // ones out, so a min(suffix) bound would prune the pair (cp=1,
    // 1+min(1,3)=2 < 4 required) even though it qualifies; the sound
    // max(suffix) bound keeps it (1+max(1,3)=4 ≥ 4).
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e f p q r s")) ++
      (2 until 20).map(i => (i.toLong, (0 until 8).map(k => s"n${i}_$k").mkString(" ")))
    val df_ = docs.toDF("doc_id", "text")

    val sets = DedupOps.shinglesOf(df_)
      .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("ss"))
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val jac = inter / (size(col("s1")) + size(col("s2")) - inter)
    val brute = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.ss").as("s1"), col("b.ss").as("s2"))
      .filter(jac >= 0.5)
      .select(col("d1"), col("d2"), round(jac, 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.map(p => (p._1, p._2)) === Set((0L, 1L)), "fixture must plant the containment pair")

    val pruned = DedupOps.ngramJaccardPairs(df_, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === brute, "containment pair at J = tau must survive the suffix bound")
  }

  test("positional suffix bound keeps qualifying length-skewed pairs (last-match ranks differ per doc)") {
    import TestSpark.spark.implicits._
    // doc 1 extends doc 0: 8 vs 10 shingles sharing 7 → J = 7/11 ≥ 0.5,
    // with the last common prefix match sitting at DIFFERENT ranks in
    // the two docs (doc 1's unique tail shingles are df=1 and crowd its
    // prefix). An unsound positional bound (e.g. strict ">" turned into
    // off-by-one, or i1/i2 swapped) prunes exactly this shape; brute
    // parity pins it.
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "a b c d e f g h i k1 k2 k3")) ++
      (2 until 24).map(i => (i.toLong, (0 until 9).map(k => s"n${i}_$k").mkString(" ")))
    val df_ = docs.toDF("doc_id", "text")

    val sets = DedupOps.shinglesOf(df_)
      .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("ss"))
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val jac = inter / (size(col("s1")) + size(col("s2")) - inter)
    val brute = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.ss").as("s1"), col("b.ss").as("s2"))
      .filter(jac >= 0.5)
      .select(col("d1"), col("d2"), round(jac, 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.map(p => (p._1, p._2)) === Set((0L, 1L)), "fixture must plant the skewed pair")

    val pruned = DedupOps.ngramJaccardPairs(df_, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === brute, "qualifying skewed pair must survive the positional bound")
  }
}

class CurateOpsSpec extends SparkSpecBase {

  test("HLL overlap sketch: merged-union estimate == re-sketching the union; audit in tolerance") {
    val rows = CurateOps.overlapSketch(spark, sf).collect()
    assert(rows.length === 10) // C(5,2) source pairs
    assert(rows.forall(_.getBoolean(6)), "every pair's union estimate within 5% of exact")
    rows.foreach { r =>
      val (na, nb, nu, ov) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ov >= 0L && ov <= math.min(na, nb) && nu <= na + nb,
        s"inclusion-exclusion violated: n_a=$na n_b=$nb n_union=$nu overlap=$ov")
    }
    // Mergeability — the property the 100 TB story rests on: unioning
    // the two PREBUILT sketches (register max) yields the identical
    // estimate to sketching the unioned token stream directly.
    val toks = Tables.load(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("w"))
    val merged = toks.groupBy(col("source")).agg(hll_sketch_agg(col("w"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    val direct = toks.agg(hll_sketch_estimate(hll_sketch_agg(col("w"), 12)).as("est"))
      .head().getLong(0)
    assert(merged === direct)
  }

  test("bloom-prefiltered decontamination is byte-identical to the exact path") {
    val exact = CurateOps.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = CurateOps.decontaminateBloom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom === exact)
    assert(exact.nonEmpty) // the corpus plants cross-source contamination
  }

  test("temperature mixing flattens the language mix and preserves total volume") {
    val docs = Tables.load(spark, sf, "documents")
    val langN = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = CurateOps.mixTemperature(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("wt")))
    val realized = out.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wt = out.groupBy(_._2).view.mapValues(_.head._3).toMap
    // α = 0.3 flattening: the dominant language is THINNED (wt < 100),
    // every smaller one UPSAMPLED (wt > 100)
    val biggest = langN.maxBy(_._2)._1
    assert(wt(biggest) < 100, s"dominant $biggest wt ${wt(biggest)}")
    (langN.keySet - biggest).foreach(l => assert(wt(l) > 100, s"$l wt ${wt(l)}"))
    // realized volume per language EQUALS the deterministic rule:
    // ⌊w/100⌋ epochs for every doc plus one for docs whose md5 bucket
    // falls under the fractional percent — replayed driver-side
    val texts = docs.select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def bucketOf(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    langN.foreach { case (l, n) =>
      val frac = texts.count { case (tl, t) => tl == l && bucketOf(t) < wt(l) % 100 }
      val expect = wt(l) / 100 * n + frac
      assert(realized(l) === expect, s"$l ${realized(l)} vs $expect")
    }
    // deterministic: a rerun realizes the identical multiset
    assert(CurateOps.mixTemperature(spark, sf).collect().length === out.length)
  }

  test("SemDeDup kept-set ≡ driver-side replay of within-cell pairing + min-label resolution") {
    import graft.operators.{CurateOps, VectorOps}
    // the shared-quantizer assignment is the query's own candidate
    // blocking; replay the ACTION from it independently: all
    // within-cell pairs ≥ τ (4dp, HALF_UP like Spark's round), then
    // union-find to the min-id representative
    val a = VectorOps.cellAssignments(spark, sf)
      .select(col("vec_id"), col("v"), col("label"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2), r.getInt(3)))
    def cos4(x: Array[Double], y: Array[Double]): BigDecimal = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      BigDecimal(d / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
    }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry } // min-id root
    }
    var nPairs = 0
    for (cell <- a.groupBy(_._4).values; Array(x, y) <- cell.combinations(2))
      if (cos4(x._2, y._2) >= BigDecimal("0.4")) { union(x._1, y._1); nPairs += 1 }
    assert(nPairs > 0, "corpus must exercise the action (qualifying pairs exist)")
    val droppedReplay = a.map(_._1).filter(id => find(id) != id).toSet
    assert(droppedReplay.nonEmpty)
    val perLabel = a.groupBy(_._3).map { case (l, vs) =>
      l.toLong -> ((vs.length.toLong, vs.count(v => droppedReplay(v._1)).toLong)) }
    val out = CurateOps.semDedup(spark, sf).collect()
      .map(r => r.getAs[Any]("label").toString.toLong ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dropped")))).toMap
    assert(out === perLabel, "per-label (n_vecs, n_dropped) must equal the replay")
  }

  test("epoch shuffle is a seeded permutation assembled without a global sort") {
    val out = CurateOps.shuffle(spark, sf).cache()
    val rows = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"), r.getAs[Long]("shard")))
    val n = rows.length
    // pos is exactly the permutation 0..n-1; shard is its DIV-64 block
    assert(rows.map(_._2).sorted.toSeq === (0L until n).toSeq)
    rows.foreach { case (_, pos, shard) => assert(shard === pos / 64) }
    // the realized order is the md5 order (the portable contract)
    val byKey = rows.map(_._1).sortBy { id =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"shuffle:0:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id)
    }
    assert(rows.sortBy(_._2).map(_._1).toSeq === byKey.toSeq)
    // epoch reseeds: a different epoch yields a different permutation
    val e1 = CurateOps.shuffle(spark, sf, epoch = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(rows.exists { case (id, pos, _) => e1(id) != pos })
    assert(e1.values.toSeq.sorted === (0L until n).toSeq)
    // two-pass shape: no partition-less global sort in the plan — the
    // only sorts are bucket-partitioned (terasort offsets + local rank)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("rangepartitioning"),
      s"global range sort must not appear:\n${plan.take(1200)}")
    out.unpersist()
  }

  test("cluster balance caps every sign-LSH bucket in seeded order") {
    // cap = 2 so the 50-vector spec corpus genuinely overflows buckets
    val kept = CurateOps.clusterBalance(spark, sf, cap = 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket")))
    // replay the contract driver-side: bucket = sign bits of dims 1..8,
    // per-bucket keep the cap smallest md5('balance:'||id) keys
    val all = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        val b = (0 until 8).map(i => if (v(i) > 0.0f) 1L << i else 0L).sum
        val k = java.security.MessageDigest.getInstance("MD5")
          .digest(s"balance:${r.getAs[Long]("vec_id")}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (r.getAs[Long]("vec_id"), b, k)
      }
    val expect = all.groupBy(_._2).toSeq.flatMap { case (b, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(2).map(r => (r._1, b)).toSeq
    }.toSet
    assert(kept.toSet === expect, "kept set must equal the seeded per-bucket cap")
    // the corpus exercises the cap: some bucket overflows, none exceeds it
    val sizes = all.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.exists(_ > 2), "a dense bucket must exist at this sf")
    val keptSizes = kept.groupBy(_._2).view.mapValues(_.length)
    assert(keptSizes.values.forall(_ <= 2))
    assert(sizes.forall { case (b, n) => keptSizes.getOrElse(b, 0) == math.min(n, 2) },
      "every bucket contributes min(size, cap)")
  }

  test("mixture multiplicities follow the integer-percent weights and the holdout never leaks") {
    val mixed = CurateOps.mix(spark, sf).cache()
    // Eval holdout (weight 0) must never appear in a training mixture.
    assert(mixed.filter(col("source") === "src0").count() === 0L)
    // Per-doc multiplicity: every src1 doc (250%) appears 2 or 3 times,
    // every src3 doc (40%) 0 or 1 times, defaults exactly once.
    val perDoc = mixed.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("m"), max(col("epoch")).as("max_epoch"))
    assert(perDoc.filter(col("source") === "src1" && (col("m") < 2 || col("m") > 3)).count() === 0L)
    assert(perDoc.filter(col("source") === "src3" && col("m") =!= 1).count() === 0L)
    assert(perDoc.filter(!col("source").isin("src0", "src1", "src2", "src3") && col("m") =!= 1).count() === 0L)
    // Epochs are dense 1..m (the explode fans out a contiguous range).
    assert(perDoc.filter(col("max_epoch") =!= col("m")).count() === 0L)
    // src1's realized volume sits near 2.5x its corpus size (hash
    // thresholding is deterministic, not RNG — but the fixture corpus is
    // finite, so pin the broad band, and pin exact determinism below).
    val src1Docs = Tables.load(spark, sf, "documents").filter(col("source") === "src1").count()
    val src1Rows = mixed.filter(col("source") === "src1").count()
    assert(src1Rows >= 2 * src1Docs && src1Rows <= 3 * src1Docs)
    // Retry-stability: a second run materializes byte-identical rows.
    val again = CurateOps.mix(spark, sf)
    assert(mixed.exceptAll(again).isEmpty && again.exceptAll(mixed).isEmpty)
    mixed.unpersist()
  }

  test("mixture materialization plans one narrow map stage — zero shuffles") {
    val plan = CurateOps.mix(spark, sf).queryExecution.executedPlan.toString
    // the weights dimension broadcast is the ONLY exchange; no shuffle
    // of the corpus at any scale
    assert(!plan.replace("BroadcastExchange", "").contains("Exchange"),
      plan.linesIterator.take(25).mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"), "weights must join as a broadcast dimension")
  }

  test("distributed pack cumsum matches single-window reference and uses >1 bucket") {
    import org.apache.spark.sql.expressions.Window
    val running = CurateOps.packRunning(spark, sf, numParts = 8).cache()
    assert(running.select(col("pid")).distinct().count() > 1L)
    val ref = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("ref_running", sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bad = running.join(ref, Seq("doc_id"))
      .filter(col("running") =!= col("ref_running")).count()
    assert(bad === 0L)
  }

  test("pack output is invariant to the bucket count") {
    val p1 = CurateOps.pack(spark, sf, numParts = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val p8 = CurateOps.pack(spark, sf, numParts = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(p1 === p8)
    assert(p8.nonEmpty)
  }
}

class TextOpsSpec extends SparkSpecBase {

  test("bigram NLL replays the interpolated corpus LM driver-side") {
    val out = TextOps.bigramNll(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bigram_nll")).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").toSeq).toMap
    val uni = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val total = uni.values.sum
    val bg = docs.values.flatMap(ts => ts.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val pf = bg.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val scored = docs.filter(_._2.length >= 2)
    assert(out.keySet === scored.keySet)
    scored.foreach { case (id, ts) =>
      val nll = ts.sliding(2).filter(_.length == 2).map { p =>
        -math.log(0.75 * bg((p(0), p(1))) / pf(p(0)) + 0.25 * uni(p(1)) / total)
      }.toSeq
      val expect = math.floor(nll.sum / nll.size * 10000) / 10000
      assert(math.abs(out(id) - expect) < 2e-4, s"doc $id: ${out(id)} vs $expect")
    }
  }

  test("cross-doc dup fraction replays the corpus shingle index") {
    val out = TextOps.dupFraction(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length === docs.size, "one row per document")
    // driver-side replay of the whole index (500 docs × ~35 shingles)
    val shingles: Map[Long, Set[String]] = docs.map { case (id, text) =>
      val toks = text.split(" ")
      id -> (if (toks.length < 8) Set.empty[String]
             else toks.sliding(8).map(_.mkString(" ")).toSet)
    }
    val docFreq = shingles.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val mine = shingles(id)
      val dup = mine.count(s => docFreq(s) >= 2)
      assert(r.getAs[Long]("n_shingles") === mine.size.toLong, s"doc $id shingle count")
      assert(r.getAs[Long]("n_dup") === dup.toLong, s"doc $id dup count")
      val frac = r.getAs[Double]("dup_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      if (mine.nonEmpty)
        assert(math.abs(frac - dup.toDouble / mine.size) < 5e-5, s"doc $id fraction")
    }
    // the corpus genuinely exercises both regimes
    assert(out.exists(_.getAs[Long]("n_dup") > 0), "some cross-doc duplication exists")
    assert(out.exists(r => r.getAs[Long]("n_dup") < r.getAs[Long]("n_shingles")),
      "not everything is duplicated")
  }

  test("tfidf keywords rank distinctive tokens above corpus-wide ones") {
    val out = TextOps.tfidfKeywords(spark, sf).collect()
    assert(out.nonEmpty)
    // ranks are 1..3 per doc, scores non-increasing within a doc
    out.groupBy(_.getAs[Long]("doc_id")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Double]("score")).toSeq
      assert(scores === scores.sorted.reverse)
    }
    // a token present in EVERY document has idf 0 and can never out-rank
    // a token with positive score
    val nDocs = Tables.load(spark, sf, "documents").count()
    val everywhere = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(countDistinct(col("doc_id")).as("d"))
      .filter(col("d") === nDocs).collect().map(_.getString(0)).toSet
    out.filter(r => everywhere(r.getAs[String]("keyword")))
      .foreach(r => assert(r.getAs[Double]("score") <= 0.0))
  }

  test("redaction masks every PII pattern and counts them") {
    val out = TextOps.redact(spark, sf)
    // no email/date/money survives in any redacted line
    val leftover = out.filter(
      col("redacted").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
      col("redacted").rlike("[0-9]{4}-[0-9]{2}-[0-9]{2}") ||
      col("redacted").rlike("\\$[0-9]+\\.[0-9]{2}")).count()
    assert(leftover === 0L)
    // the stand-in line carries exactly one of each pattern
    assert(out.filter(col("n_redacted") =!= 3L).count() === 0L)
    assert(out.filter(!col("redacted").contains("[EMAIL]") ||
      !col("redacted").contains("[DATE]") || !col("redacted").contains("[MONEY]")).count() === 0L)
  }

  test("repetition filters: hand-computed fractions and the keep/drop flag") {
    import TestSpark.spark.implicits._
    val docs = Seq(
      // "x y" appears 3 times among 5 bigrams → top 0.6; trigram "x y x"
      // twice + "y x y" twice → 4 of 4 occurrences duplicated → 1.0
      (1L, "x y x y x y", "en", "s", 11L),
      // no repeated bigram or trigram
      (2L, "a b c d e f", "en", "s", 11L),
      // two words: bigrams exist, no trigrams → dup_trigram_frac 0
      (3L, "a b", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.repetition(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // short docs (< 20 bigrams): the top-bigram test is suppressed —
    // doc 2 has zero repetition yet top frac 0.2 purely from length,
    // doc 3 trivially 1.0; only the trigram-duplication test applies
    assert(out(1L) === ((5L, 0.6, 1.0, 1L))) // dup trigrams 1.0 > 0.30 → filtered
    assert(out(2L) === ((5L, 0.2, 0.0, 0L)))
    assert(out(3L) === ((1L, 1.0, 0.0, 0L)))
    // a genuinely repetitive LONG doc still trips the bigram test
    val longRep = (Seq.fill(30)("x y") ++ Seq("u", "v")).mkString(" ")
    val docs2 = Seq((4L, longRep, "en", "s", longRep.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_rep2").toString
    docs2.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r4 = TextOps.repetition(spark, dir2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(4)))).toMap
    assert(r4(4L)._1 >= 20L && r4(4L)._2 === 1L)
  }

  test("chunk token counts reassemble to whitespace token counts") {
    val chunks = TextOps.chunk(spark, sf)
      .groupBy(col("doc_id")).agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("n_chunks"))
    val toks = TextOps.tokens(spark, sf).select(col("doc_id"), col("n_ws_tokens"))
    val bad = chunks.join(toks, Seq("doc_id"))
      .filter(col("total") =!= col("n_ws_tokens")).count()
    assert(bad === 0L)
  }

  test("overlap chunks cover every token and consecutive chunks share the overlap") {
    val oc = TextOps.chunkOverlap(spark, sf).cache()
    val toks = TextOps.tokens(spark, sf).select(col("doc_id"), col("n_ws_tokens"))
    // last chunk must end at the document's last token: start + size = n
    val lastEnd = oc.groupBy(col("doc_id"))
      .agg(max(col("start_tok") + col("n_tokens")).as("covered"))
    val bad = lastEnd.join(toks, Seq("doc_id"))
      .filter(col("covered") =!= col("n_ws_tokens")).count()
    assert(bad === 0L)
    // stride < window → docs longer than one window have >= as many chunks
    val cmp = oc.groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .join(TextOps.chunk(spark, sf).groupBy(col("doc_id")).agg(count(lit(1)).as("n_plain")), Seq("doc_id"))
      .filter(col("n_overlap") < col("n_plain")).count()
    assert(cmp === 0L)
  }

  test("paragraph chunks preserve sentence boundaries and cover every token") {
    val pc = TextOps.chunkParagraph(spark, sf).cache()
    // exact coverage: chunk tokens sum back to the doc's token count
    val toks = TextOps.tokens(spark, sf).select(col("doc_id"), col("n_ws_tokens"))
    val bad = pc.groupBy(col("doc_id")).agg(sum(col("n_tokens")).as("total"))
      .join(toks, Seq("doc_id")).filter(col("total") =!= col("n_ws_tokens")).count()
    assert(bad === 0L)
    // greedy invariant: a chunk only exceeds maxSize when it is one
    // oversized sentence (chunk_by_paragraph's single-sentence case)
    assert(pc.filter(col("n_tokens") > 32 && col("n_sentences") > 1).count() === 0L)
    assert(pc.filter(col("cut_type") === "oversize").count() > 0L)
    // chunk indices are contiguous from 0 per doc
    val idx = pc.groupBy(col("doc_id"))
      .agg(min(col("chunk_idx")).as("lo"), max(col("chunk_idx")).as("hi"), count(lit(1)).as("n"))
    assert(idx.filter(col("lo") =!= 0L || col("n") =!= col("hi") + 1).count() === 0L)
  }

  test("paragraph chunker matches an independent sequential implementation on random docs") {
    import TestSpark.spark.implicits._
    // deterministic random corpus: 30 docs, 1..300 tokens from a 20-word vocab
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "table", "key", "row", "scan", "fast", "merge",
      "sort", "window", "part", "value")
    val docs = (0 until 30).map { i =>
      val n = 1 + rng.nextInt(300)
      val text = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, "en", "gen", text.length.toLong)
    }
    val out = java.nio.file.Files.createTempDirectory("graft_chunk_diff").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // independent sequential reference: same boundary rule, same greedy fold
    def fold16(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString, 16)
    }
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = docs.flatMap { case (id, text, _, _, _) =>
      val toks = text.split(" ").toVector
      val sentences = {
        val b = Vector.newBuilder[Vector[String]]
        var cur = Vector.empty[String]
        toks.foreach { t =>
          cur :+= t
          if (fold16(t) % 7 == 0) { b += cur; cur = Vector.empty }
        }
        if (cur.nonEmpty) b += cur
        b.result()
      }
      val chunks = {
        val b = Vector.newBuilder[Vector[Vector[String]]]
        var cur = Vector.empty[Vector[String]]
        var curTok = 0
        sentences.foreach { s =>
          if (curTok > 0 && curTok + s.size > 32) { b += cur; cur = Vector(s); curTok = s.size }
          else { cur :+= s; curTok += s.size }
        }
        if (cur.nonEmpty) b += cur
        b.result()
      }
      chunks.zipWithIndex.map { case (c, idx) =>
        (id, idx.toLong, c.size.toLong, c.map(_.size).sum.toLong,
          md5hex(c.map(_.mkString(" ")).mkString(" ")))
      }
    }.toSet
    val got = TextOps.chunkParagraph(spark, out).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_sentences"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_hash"))).toSet
    assert(got === expected)
  }

  test("fingerprints: exact differs across docs, tokenset collides for shuffled dups") {
    val fp = TextOps.fingerprint(spark, sf).cache()
    val n = fp.count()
    assert(fp.select(col("fp_exact")).distinct().count() === n)
    assert(fp.select(col("fp_tokenset")).distinct().count() < n)
    // rolling is order-sensitive → as discriminating as exact here
    assert(fp.select(col("fp_rolling")).distinct().count() === n)
    assert(fp.filter(col("fp_winnow").isNull).count() === 0L)
  }

  test("winnow fingerprint survives edits away from the minimizing shingle") {
    import TestSpark.spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // an edit at the far end keeps the minimizing 5-gram intact
    val edited = base.replace("kappa", "lambda")
    val out = java.nio.file.Files.createTempDirectory("graft_fp").toString
    Seq((1L, base, "en", "s", base.length), (2L, edited, "en", "s", edited.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val fp = TextOps.fingerprint(spark, out).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[String]("fp_exact"), r.getAs[Long]("fp_winnow"))).toMap
    assert(fp(1L)._1 !== fp(2L)._1)   // exact identity breaks
    assert(fp(1L)._2 === fp(2L)._2)   // winnow identity holds
  }

  test("fingerprint of a short (<5 token) doc yields NULL winnow, not a crash") {
    import TestSpark.spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_fp_short").toString
    Seq((1L, "a b c", "en", "s", 5L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val r = TextOps.fingerprint(spark, out).collect()
    assert(r.length === 1 && r.head.isNullAt(r.head.fieldIndex("fp_winnow")))
    assert(r.head.getAs[Long]("fp_rolling") > 0L)
  }
}

class TemporalExtractSpec extends SparkSpecBase {

  test("extracted events are anchored inside the window and feed temporal aggregation") {
    val ev = TextOps.temporalExtract(spark, sf)
    val rows = ev.collect()
    assert(rows.nonEmpty)
    // every anchor lands inside January 2024 and day agrees with ts_sec
    assert(rows.forall { r =>
      val ts = r.getAs[Long]("ts_sec")
      ts >= 1704067200L && ts < 1704067200L + 2678400L &&
        r.getAs[String]("day").startsWith("2024-01")
    })
    // deterministic: a second extraction is row-identical
    assert(TextOps.temporalExtract(spark, sf).collect().toSet === rows.toSet)
    // the relation drives the search_temporal window shape: per-day
    // counts over a sub-window sum back to the row count in that window
    val windowed = ev.filter(col("day") >= "2024-01-08" && col("day") < "2024-01-15")
    val byDay = windowed.groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n")).sum
    assert(byDay === windowed.count() && byDay > 0L)
  }

  test("events merge into the knowledge graph: base preserved, typed nodes, traversable edges") {
    val base = graph.TpchGraph(spark, sf)
    val g = graph.GraphQueries.temporalGraph(spark, sf)
    val ev = TextOps.temporalExtract(spark, sf)
    // base projection survives the merge intact
    assert(g.nodes.join(base.nodes.select(col("id")), Seq("id"), "left_semi").count()
      === base.nodes.count())
    assert(g.edges.filter(!col("rel").isin("occurred_in", "happened_at")).count()
      === base.edges.count())
    // one event node per extraction row; one edge of each kind per event
    val nEv = ev.count()
    assert(g.nodes.filter(col("ntype") === "event").count() === nEv)
    assert(g.edges.filter(col("rel") === "occurred_in").count() === nEv)
    assert(g.edges.filter(col("rel") === "happened_at").count() === nEv)
    // event nodes carry their anchor in the props bag, readable via cypher:
    // events on a given day resolved through the happened_at edge agree
    // with a props-bag predicate on the event node itself
    val someDay = ev.select(col("day")).groupBy(col("day")).count()
      .orderBy(col("count").desc, col("day")).head().getString(0)
    val viaEdge = graph.CypherLite.run(g,
      s"MATCH (e:event)-[:happened_at]->(d:day) WHERE d.name = '$someDay' RETURN e.id AS eid")
      .collect().map(_.getString(0)).toSet
    val viaProps = graph.CypherLite.run(g,
      s"MATCH (e:event)-[:occurred_in]->(x:document) WHERE e.day = '$someDay' RETURN e.id AS eid")
      .collect().map(_.getString(0)).toSet
    assert(viaEdge === viaProps && viaEdge.nonEmpty)
    // re-merging the same increments is a no-op (keep-first upsert)
    val again = g.mergeNodes(g.nodes.filter(col("ntype") === "event"))
      .mergeEdges(g.edges.filter(col("rel") === "happened_at"))
    assert(again.nodes.count() === g.nodes.count())
    assert(again.edges.count() === g.edges.count())
  }
}

class RelationalOpsSpec extends SparkSpecBase {

  test("approx distinct users within 5% of exact per event type") {
    val approx = RelationalOps.approxDistinctUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.loadEvents(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(1L, (ex * 0.05).toLong), s"$k: ${approx(k)} vs $ex")
    }
  }

  test("events_rfm emits monotone 1..4 value quartiles composed into the rfm code") {
    val rows = EventOps.rfm(spark, sf).collect()
    val nUsers = Tables.loadEvents(spark, sf).select("user_id").distinct().count()
    assert(rows.length.toLong === nUsers)
    // Value-quartile semantics (percentile_disc cutoffs): scores are a
    // monotone function of the metric, tied metric values share a
    // score, and each cumulative bucket holds at least its ANSI rank
    // share (cume_dist(cutoff_p) >= p → count(score <= q) >= ceil(q/4·n)).
    def metricOf(r: org.apache.spark.sql.Row, c: String): Double = c match {
      case "r_score" => r.getAs[Long]("last_seen_s").toDouble
      case "f_score" => r.getAs[Long]("frequency").toDouble
      case "m_score" => r.getAs[Double]("monetary")
    }
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val pairs = rows.map(r => (metricOf(r, c), r.getAs[Long](c))).sortBy(_._1)
      assert(pairs.forall { case (_, s) => s >= 1 && s <= 4 }, s"$c out of range")
      assert(pairs.sliding(2).forall {
        case Array((m1, s1), (m2, s2)) => s1 <= s2 && (m1 != m2 || s1 == s2)
        case _ => true
      }, s"$c not monotone in its metric / splits ties")
      (1 to 3).foreach { q =>
        val below = pairs.count(_._2 <= q)
        assert(below >= math.ceil(q / 4.0 * nUsers).toLong, s"$c bucket <=$q too small: $below")
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("rfm") ===
        r.getAs[Long]("r_score") * 100 + r.getAs[Long]("f_score") * 10 + r.getAs[Long]("m_score"))
    }
    // the most frequent user carries the maximal frequency score
    val top = rows.maxBy(_.getAs[Long]("frequency"))
    assert(top.getAs[Long]("f_score") === rows.map(_.getAs[Long]("f_score")).max)
    // and the optimized plan contains no window at all — the quartile
    // cutoffs are a broadcast 1-row aggregate, not a global sort
    val wins = EventOps.rfm(spark, sf).queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.isEmpty, "rfm must not plan any window")
  }

  test("events_attribution_linear conserves purchase value over one shuffle") {
    val credits = EventOps.attributionLinear(spark, sf)
    val rows = credits.collect()
    // every touch event appears exactly once, credited or not
    val nTouches = Tables.loadEvents(spark, sf)
      .filter(col("event_type").isin("view", "click")).count()
    assert(rows.length.toLong === nTouches)
    assert(rows.forall(_.getAs[Double]("credit") >= 0.0))
    // conservation: total credit == total value of purchases that HAD a
    // prior touch, up to the documented 5e-7-per-slice fixed-point cap
    val ev = Tables.loadEvents(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_sec"), r.getAs[Double]("value")))
    val byUser = ev.groupBy(_._2).view.mapValues(_.sortBy(e => (e._4, e._1)))
    val attributed = byUser.values.flatMap { es =>
      es.zipWithIndex.collect {
        case (e, i) if e._3 == "purchase" &&
          es.take(i).exists(t => t._3 == "view" || t._3 == "click") => (e._5, i)
      }
    }.toSeq
    val totalCredit = rows.map(_.getAs[Double]("credit")).sum
    assert(math.abs(totalCredit - attributed.map(_._1).sum) < 1e-3,
      "credits must re-assemble the attributed purchase value")
    // hand-replay one user: each purchase's micro-slice lands on every
    // prior touch
    val uid = ev.filter(_._3 == "purchase").map(_._2).head
    val es = byUser(uid)
    val expect = es.filter(e => e._3 == "view" || e._3 == "click").map { t =>
      val idx = es.indexOf(t)
      val micro = es.zipWithIndex.collect {
        case (p, i) if p._3 == "purchase" && i > idx =>
          val n = es.take(i).count(x => x._3 == "view" || x._3 == "click")
          if (n > 0) math.round(p._5 * 1000000 / n) else 0L
      }.sum
      t._1 -> micro / 1000000.0
    }.toMap
    rows.filter(_.getAs[Long]("user_id") == uid).foreach { r =>
      assert(r.getAs[Double]("credit") === expect(r.getAs[Long]("event_id")),
        s"user $uid event ${r.getAs[Long]("event_id")}")
    }
    // scale pin: both frames ride ONE user_id exchange — no self-join
    // (AQE's plan string repeats the shuffle in its Initial Plan echo —
    // count the final section only)
    val plan = credits.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges === 1, s"expected a single user_id shuffle:\n${plan.take(1500)}")
  }

  test("as-of join carries the latest at-or-before right row per key") {
    import TestSpark.spark.implicits._
    // ties: a right row at the SAME instant as the left row must match
    // (at-or-before is inclusive); later rows must not
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 99L, "r99"))
      .toDF("k", "t", "payload")
    val left = Seq((1L, 10L, "same-instant"), (1L, 15L, "between"),
      (1L, 25L, "after-both"), (2L, 50L, "no-prior"), (3L, 7L, "no-key"))
      .toDF("k", "t", "tag")
    val out = RelationalOps.asofJoin(left, right, "k", "t")
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.get(r.fieldIndex("asof_ts"))), Option(r.getAs[String]("payload")))).toMap
    assert(out("same-instant") === (Some(10L), Some("r10")))
    assert(out("between") === (Some(10L), Some("r10")))
    assert(out("after-both") === (Some(20L), Some("r20")))
    assert(out("no-prior") === (None, None))
    assert(out("no-key") === (None, None))
    // corpus query: replay per purchase against the raw click stream
    val demo = RelationalOps.asofDemo(spark, sf).collect()
    val clicks = Tables.loadEvents(spark, sf).filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_sec")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_sec")))
    demo.foreach { r =>
      val (u, p) = (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_sec"))
      val want = clicks.filter(c => c._1 == u && c._2 <= p).map(_._2).maxOption
      val got = Option(r.get(r.fieldIndex("click_sec"))).map(_.asInstanceOf[Long])
      assert(got === want, s"user $u purchase@$p")
    }
    // one keyed sort, no join operator in the plan (the union-tag shape)
    val plan = RelationalOps.asofDemo(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"),
      s"as-of must not plan a join of the two streams:\n${plan.take(1200)}")
  }

  test("range join buckets intervals and matches containment exactly") {
    import TestSpark.spark.implicits._
    // an interval spanning MANY buckets (span >> width) must still
    // match points across its whole extent, and points outside match
    // nothing
    val intervals = Seq((1L, 100L, 0L, 25000L), (1L, 200L, 30000L, 30100L))
      .toDF("k", "iv_id", "lo", "hi")
    val points = Seq((1L, 1L, 0L), (1L, 2L, 24999L), (1L, 3L, 25001L),
      (1L, 4L, 30050L), (2L, 5L, 10L)).toDF("k", "p_id", "t")
    val got = RelationalOps.rangeJoin(points, intervals, "k", "t", "lo", "hi", width = 3600L)
      .select(col("p_id"), col("iv_id")).collect()
      .map(r => r.getAs[Long]("p_id") -> r.getAs[Long]("iv_id")).toSet
    assert(got === Set(1L -> 100L, 2L -> 100L, 4L -> 200L))
    // corpus query: every event lands in exactly one session and the
    // assignment agrees with sessionize's own bounds
    val demo = RelationalOps.rangeDemo(spark, sf).collect()
    val nEvents = Tables.loadEvents(spark, sf).count()
    assert(demo.length.toLong === nEvents, "sessions partition the event stream")
    assert(demo.map(_.getAs[Long]("event_id")).distinct.length === demo.length)
    demo.foreach(r => assert(r.getAs[Long]("sec") >= r.getAs[Long]("start_s")))
  }

  test("events_attribution_position replays the U-shape model and conserves value") {
    val rows = EventOps.attributionPosition(spark, sf).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), r.getAs[Double]("credit")))
    val ev = Tables.loadEvents(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_sec"), r.getAs[Double]("value")))
    // full driver-side replay: 40/20/40 with n=1 → 100%, n=2 → 50/50,
    // in integer micro-units exactly as documented
    val expect = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    ev.groupBy(_._2).values.foreach { es =>
      val sorted = es.sortBy(e => (e._4, e._1))
      val touchIds = sorted.filter(e => e._3 == "view" || e._3 == "click").map(_._1)
      var nTouch = 0
      sorted.foreach { e =>
        if (e._3 == "view" || e._3 == "click") nTouch += 1
        else if (e._3 == "purchase" && nTouch >= 1) {
          val v6 = e._5 * 1000000
          val n = nTouch
          val end = math.round(v6 * (if (n >= 3) 0.4 else 0.5))
          expect(touchIds(0)) += end
          expect(touchIds(n - 1)) += end
          if (n >= 3) {
            val mid = math.round(v6 * 0.2 / (n - 2))
            (1 until n - 1).foreach(i => expect(touchIds(i)) += mid)
          }
        }
      }
    }
    val got = rows.map(r => r._1 -> math.round(r._3 * 1000000)).toMap
    val nTouches = ev.count(e => e._3 == "view" || e._3 == "click")
    assert(rows.length === nTouches, "one row per touch")
    got.foreach { case (id, micro) =>
      assert(micro === expect(id), s"touch $id credit mismatch")
    }
    // conservation: per attributed purchase, the end shares and the
    // (n-2) middle slices re-assemble the value up to slice rounding
    val totalCredit = rows.map(_._3).sum
    val attributedValue = ev.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._1))
      var n = 0
      sorted.flatMap { e =>
        if (e._3 == "view" || e._3 == "click") { n += 1; None }
        else if (e._3 == "purchase" && n >= 1) Some(e._5) else None
      }
    }.sum
    assert(math.abs(totalCredit - attributedValue) < 1e-2,
      "U-shape credits must re-assemble the attributed purchase value")
  }

  test("events_dau_mau stickiness is dau/mau and bounded by 1") {
    val rows = EventOps.dauMau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("mau"))
      assert(dau >= 1 && dau <= mau)
      assert(r.getAs[Double]("stickiness") === math.floor(dau * 10000.0 / mau) / 10000)
    }
    // every active day appears exactly once
    assert(rows.map(_.getAs[java.sql.Timestamp]("day")).distinct.length === rows.length)
  }

  test("two-pass Misra-Gries heavy hitters are EXACT vs the direct group-count") {
    val out = EventOps.heavyHitters(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    val ev = Tables.loadEvents(spark, sf).select(col("user_id"))
    val total = ev.count()
    val direct = ev.groupBy(col("user_id")).count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count"))
      .filter(_._2 > total * 0.005).toMap
    assert(out === direct) // superset candidates + exact second pass = exact output
    // ...and under a hostile repartitioning the answer is unchanged
    // (candidate SETS may differ; the exact pass makes the output
    // partitioning-independent)
    val shuffled = EventOps.heavyHitters(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    assert(shuffled === direct)
  }

  test("q_topn_per_group matches the window idiom row-for-row") {
    val heap = RelationalOps.qTopPerPriority(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val window = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(heap === window)
    assert(heap.length === 15) // 5 priorities × 3
  }

  test("q_pivot cells equal the direct filtered aggregate") {
    val piv = RelationalOps.qPivot(spark, sf).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    val direct = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("n_name")).agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(direct.nonEmpty)
    direct.foreach { case (nation, rev) =>
      assert(piv(nation).getAs[Double]("p1_urgent") === rev, nation)
    }
    // nations absent from the direct map must carry NULL in that cell
    piv.keySet.diff(direct.keySet).foreach { nation =>
      assert(piv(nation).isNullAt(piv(nation).fieldIndex("p1_urgent")), nation)
    }
  }
}

class ApproxPercentileSpec extends SparkSpecBase {

  test("approx percentiles land within 2% of the exact rank statistics") {
    val exact = RelationalOps.qPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = RelationalOps.approxPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (seg, (m, p95)) =>
      val (am, ap) = approx(seg)
      assert(math.abs(am - m) / m < 0.02, s"$seg median $am vs $m")
      assert(math.abs(ap - p95) / p95 < 0.02, s"$seg p95 $ap vs $p95")
    }
  }
}

class GraphAlgosSpec extends SparkSpecBase {

  test("sampled Brandes betweenness matches a textbook driver-side replay") {
    import graph.{GraphAlgos, GraphQueries, TpchGraph}
    val g = TpchGraph(spark, sf).subgraphByType(Seq("region", "nation", "supplier"))
    val seeds = g.nodes.filter(col("ntype").isin("nation", "region"))
      .select(col("id")).collect().map(_.getString(0)).toSet
    val out = GraphAlgos.betweenness(g,
        g.nodes.filter(col("ntype").isin("nation", "region")).select(col("id")), 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // textbook Brandes (BFS + stack accumulation) per seed, driver-side
    val adj = g.undirectedEdges.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    seeds.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1.0).withDefaultValue(0.0)
      val order = scala.collection.mutable.ArrayBuffer(s)
      var i = 0
      while (i < order.length) {
        val v = order(i); i += 1
        adj.getOrElse(v, Set.empty).foreach { w =>
          if (!dist.contains(w) && dist(v) + 1 <= 8) {
            dist(w) = dist(v) + 1; order += w
          }
          if (dist.get(w).contains(dist(v) + 1)) sigma(w) += sigma(v)
        }
      }
      val delta = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      order.reverse.foreach { w =>
        adj.getOrElse(w, Set.empty).foreach { v =>
          if (dist.get(v).contains(dist(w) - 1))
            delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        if (w != s) expect(w) += delta(w)
      }
    }
    val keys = expect.filter(_._2 > 1e-12).keySet
    assert(out.keySet.filter(out(_) > 1e-12) === keys)
    keys.foreach { v =>
      assert(math.abs(out(v) - expect(v)) < 1e-9, s"$v: ${out(v)} vs ${expect(v)}")
    }
  }

  test("k-core peeling matches a driver-side replay in both regimes") {
    import graph.{GraphAlgos, GraphQueries}
    val pairs = GraphQueries.coPurchase(spark, sf)
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    def replay(k: Int): Map[Long, Int] = {
      var adj = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      var changed = true
      var rounds = 0
      while (changed && rounds < 12) {
        val dead = adj.collect { case (v, ns) if ns.size < k => v }.toSet
        changed = dead.nonEmpty
        if (changed) adj = (adj -- dead).view
          .mapValues(_ -- dead).filter(_._2.nonEmpty).toMap
        rounds += 1
      }
      adj.view.mapValues(_.size).toMap
    }
    // k=60: a nontrivial core survives at this sf; k=70: the whole graph
    // cascade-peels to empty over several rounds (the collapse regime)
    for (k <- Seq(60, 70)) {
      val got = GraphAlgos.kCore(GraphQueries.coPurchase(spark, sf), k)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("core_degree")).toMap
      val want = replay(k).map { case (v, d) => v -> d.toLong }
      assert(got === want, s"k=$k")
      assert(got.values.forall(_ >= k), s"k=$k: every survivor keeps >= k in-core neighbors")
    }
    assert(GraphAlgos.kCore(GraphQueries.coPurchase(spark, sf), 60).count() > 0)
    assert(GraphAlgos.kCore(GraphQueries.coPurchase(spark, sf), 70).count() === 0L)
  }

  test("k-core cascade regime: frontier-gated joins drop the broadcast hint and keep the result") {
    import graph.{GraphAlgos, GraphQueries}
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // k=70 is past this corpus's collapse threshold: the whole graph
    // cascade-peels to empty, with per-round frontiers far above a
    // limit of 0 — every round must take the UNHINTED keyed-join path
    // and still produce exactly the hinted (and replayed) result.
    val pairs = GraphQueries.coPurchase(spark, sf)
    for (k <- Seq(60, 70)) {
      val hinted = GraphAlgos.kCore(pairs, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val keyed = GraphAlgos.kCore(pairs, k, broadcastFrontierLimit = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(keyed === hinted, s"k=$k")
    }
    // Plan shape, directly on one round: above the limit the round's
    // logical plan carries NO broadcast hint (join strategy is the
    // planner's call, from real stats); at or below it both hints stay.
    import TestSpark.spark.implicits._
    val adj = Seq((1L, Seq(2L, 3L)), (2L, Seq(1L)), (3L, Seq(1L)))
      .toDF("a", "ns")
    val deg = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("id", "d")
    def hintCount(limit: Long): Int =
      GraphAlgos.kCoreRound(adj, deg, k = 2, frontierN = 2L, limit = limit)
        .queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    assert(hintCount(limit = 1L) === 0, "cascade round must not carry broadcast hints")
    // Steady round: exactly ONE hint — the measured FRONTIER side. The
    // loss side is never force-broadcast: its cardinality is the
    // frontier's distinct-neighbor count, which a small hub frontier
    // can push to ≈|V| while frontierN stays under any limit.
    assert(hintCount(limit = 2L) === 1, "steady round hints the frontier only")
  }

  test("synchronous LPA converges a triangle and 2-cycles an isolated edge") {
    import TestSpark.spark.implicits._
    // triangle {1,2,3} plus the disjoint edge {10,11}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)).toDF("x", "y")
    val out = graph.GraphAlgos.labelPropagation(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle: (1,2,3) -> (2,1,1) -> (1,1,1), then stable
    assert(Seq(1L, 2L, 3L).map(out) === Seq(1L, 1L, 1L))
    // isolated edge: synchronous label swap has period 2, so an even
    // iteration count returns the initial labels — pinned, not hidden
    assert(out(10L) === 10L && out(11L) === 11L)
  }

  test("DataFrame PageRank equals the GraphX fixed-point loop EXACTLY") {
    // Integer recurrence (RankUnit longs, integral division) — the two
    // execution paths must agree to the last bit, not to a tolerance;
    // any float sneaking back into either loop breaks this.
    val g = TpchGraph(spark, sf)
    val df = GraphAlgos.pageRank(g, 5).withColumnRenamed("r", "r_df")
    val gx = GraphAlgos.pageRankGraphX(g, 5).withColumnRenamed("r", "r_gx")
    val joined = df.join(gx, Seq("id"))
    assert(joined.count() === df.count())
    assert(joined.filter(col("r_df") =!= col("r_gx")).count() === 0L)
    // and the ranks are real fixed-point values, not all the init mass
    assert(df.filter(col("r_df") =!= lit(GraphAlgos.RankUnit)).count() > 0L)
  }

  test("DataFrame personalized PageRank matches the GraphX loop to 1e-9") {
    import TestSpark.spark.implicits._
    val g = TpchGraph(spark, sf)
    val seeds = Seq("nation:0").toDF("id")
    val df = GraphAlgos.personalizedPageRank(g, seeds, 5).withColumnRenamed("r", "r_df")
    val gx = GraphAlgos.personalizedPageRankGraphX(g, seeds, 5)
      .filter(col("r") > 0).withColumnRenamed("r", "r_gx")
    // same sparse support (the dense GraphX loop computes exactly 0.0
    // for unreached nodes) and same values
    assert(df.count() === gx.count())
    val joined = df.join(gx, Seq("id"))
    assert(joined.count() === df.count())
    val worst = joined.select(max(abs(col("r_df") - col("r_gx"))).as("d")).head().getDouble(0)
    assert(worst < 1e-9)
  }

  test("DataFrame label propagation matches the GraphX loop exactly") {
    val g = TpchGraph(spark, sf)
    val edges = graph.GraphQueries.coPurchase(spark, sf)
    val df = GraphAlgos.labelPropagation(edges, 4).withColumnRenamed("l", "l_df")
    val gx = GraphAlgos.labelPropagationGraphX(edges, 4).withColumnRenamed("l", "l_gx")
    val mism = df.join(gx, Seq("v"))
      .filter(col("l_df") =!= col("l_gx")).count()
    assert(mism === 0L)
    assert(df.count() === gx.count())
  }

  test("k-hop BFS depths agree with Pregel hop histogram from same seed") {
    import TestSpark.spark.implicits._
    val g = TpchGraph(spark, sf)
    val seeds = Seq("nation:0").toDF("id")
    val bfs = GraphAlgos.kHop(g, seeds, 8)
      .groupBy(col("depth")).agg(count(lit(1)).as("n_nodes"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val pregel = GraphAlgos.hopDistanceHistogram(g, "nation:0", 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(bfs === pregel)
  }

  test("multi-source BFS distances equal per-seed single-source kHop") {
    import TestSpark.spark.implicits._
    val g = TpchGraph(spark, sf)
    val seedIds = Seq("nation:0", "nation:3", "region:1")
    val multi = GraphAlgos.multiSourceDistances(g, seedIds.toDF("id"), 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val single = seedIds.flatMap { s =>
      GraphAlgos.kHop(g, Seq(s).toDF("id"), 4)
        .collect().map(r => (s, r.getString(0), r.getInt(1)))
    }.toSet
    assert(multi === single)
    assert(multi.count(_._3 == 0) === seedIds.size)
  }

  test("wedge-join, adjacency, and GraphX triangle counts all agree") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    val edges = GraphAlgos.coOccurrenceEdges(li).cache()
    val df = GraphAlgos.triangleCountDF(edges).collect()(0)
    val adj = GraphAlgos.triangleCountAdj(edges).collect()(0)
    val gx = GraphAlgos.triangleCount(edges).collect()(0)
    assert(df.getLong(0) === gx.getLong(0))
    assert(adj.getLong(0) === gx.getLong(0))
    assert(adj.getLong(1) === gx.getLong(1))
    assert(adj.getLong(0) > 0L)
  }

  test("triangle kernels return zero on an empty edge set") {
    import TestSpark.spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val adj = GraphAlgos.triangleCountAdj(empty).collect()(0)
    val df = GraphAlgos.triangleCountDF(empty).collect()(0)
    assert(adj.getLong(0) === 0L && adj.getLong(1) === 0L)
    assert(df.getLong(0) === 0L && df.getLong(1) === 0L)
  }

  test("connected components of supplier-nation-region = one per region") {
    val cc = GraphAlgos.connectedComponents(
      TpchGraph(spark, sf).subgraphByType(Seq("region", "nation", "supplier")))
    assert(cc.select(col("component")).distinct().count() === 5L)
  }

  // Soak: 50 disjoint 40-cliques (2000 nodes, 39k canonical edges) have
  // exactly known structure — every kernel's answer is provable, at
  // ~100x the hand-computed spec's size.
  test("clique soak: components, clustering, and distances all exact") {
    import TestSpark.spark.implicits._
    val m = 40
    val nodes = (0 until 50 * m).map(i => (f"v:$i%04d", "t", s"n$i")).toDF("id", "ntype", "name")
    val edges = (for {
      c <- 0 until 50; a <- 0 until m; b <- (a + 1) until m
    } yield (f"v:${c * m + a}%04d", f"v:${c * m + b}%04d", "e")).toDF("src", "dst", "rel")
    val g = graph.PropertyGraph(nodes, edges)
    val cc = g.connectedComponentsDf.groupBy(col("component")).count().collect()
    assert(cc.length === 50 && cc.forall(_.getLong(1) === m.toLong))
    val lt = g.localTrianglesDf.collect()
    // every vertex: deg = m-1, triangles = C(m-1, 2) -> clustering 1.0
    assert(lt.length === 50 * m)
    assert(lt.forall(r => r.getLong(1) === (m - 1).toLong
      && r.getLong(2) === ((m - 1).toLong * (m - 2) / 2)))
    val d = g.allPairsDistancesDf.groupBy(col("depth")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // depth 0 = self rows; depth 1 = ordered in-clique pairs; nothing deeper
    assert(d === Map(0 -> 50L * m, 1 -> 50L * m * (m - 1)))
  }

  // Triangle a-b-c with pendant c-d: hand-computable local clustering
  // (a=1, b=1, c=1/3, d=0) and all-pairs distances (diameter 2 via the
  // a-c-d / b-c-d paths).
  test("localTriangles and allPairsDistances match hand-computed values") {
    import TestSpark.spark.implicits._
    val nodes = Seq(("a", "t", "a"), ("b", "t", "b"), ("c", "t", "c"), ("d", "t", "d"))
      .toDF("id", "ntype", "name")
    val edges = Seq(("a", "b", "e"), ("a", "c", "e"), ("b", "c", "e"), ("c", "d", "e"))
      .toDF("src", "dst", "rel")
    val g = graph.PropertyGraph(nodes, edges)
    val lt = GraphAlgos.localTriangles(
        g.undirectedEdges.filter(col("src") < col("dst"))
          .select(col("src").as("x"), col("dst").as("y")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(lt === Map("a" -> ((2L, 1L)), "b" -> ((2L, 1L)), "c" -> ((3L, 1L)), "d" -> ((1L, 0L))))
    val dists = GraphAlgos.allPairsDistances(g)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(dists.size === 16) // 4 sources x 4 reachable (incl. self at 0)
    assert(dists(("a", "d")) === 2 && dists(("d", "a")) === 2)
    assert(dists(("a", "b")) === 1 && dists(("c", "c")) === 0)
    assert(dists.values.max === 2)
  }
}

class GraphInterfaceSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("hasEdge / hasEdges answer membership over the projection") {
    val g = TpchGraph(spark, sf)
    val one = g.edges.limit(1).collect().head
    assert(g.hasEdge(one.getString(0), one.getString(1), one.getString(2)))
    assert(!g.hasEdge("nation:0", "nation:1", "no_such_rel"))
    val asked = Seq(
      (one.getString(0), one.getString(1), one.getString(2)),
      ("ghost:1", "ghost:2", "haunts")).toDF("src", "dst", "rel")
    assert(g.hasEdges(asked).count() === 1L)
  }

  test("nodesetSubgraph keeps the named set + neighbors with induced edges only") {
    val g = TpchGraph(spark, sf)
    val sub = g.nodesetSubgraph("nation", Seq("NATION_0"))
    val ids = sub.nodes.select(col("id")).collect().map(_.getString(0)).toSet
    assert(ids.contains("nation:0"))
    val bad = sub.edges
      .filter(!col("src").isInCollection(ids) || !col("dst").isInCollection(ids)).count()
    assert(bad === 0L)
    assert(sub.edges.filter(col("dst") === "nation:0").count() > 0L) // neighbors included
  }

  test("getNodes/getEdges point lookups return full NodeData/EdgeData shapes") {
    import TestSpark.spark.implicits._
    val g = TpchGraph(spark, sf)
    val nodes = g.getNodes(Seq("nation:0", "region:1", "missing:9").toDF("id")).collect()
    assert(nodes.length === 2)
    assert(nodes.map(_.getString(0)).toSet === Set("nation:0", "region:1"))
    assert(nodes.forall(!_.isNullAt(3))) // props bag present
    val edges = g.getEdges(Seq("nation:0").toDF("id"))
    assert(edges.columns.toSeq === Seq("src", "dst", "rel", "props"))
    val rows = edges.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) == "nation:0" || r.getString(1) == "nation:0"))
    // incident from both directions: nation:0 has an out-edge (in_region)
    // and in-edges (located_in)
    assert(rows.exists(_.getString(2) == "in_region") && rows.exists(_.getString(2) == "located_in"))
  }

  test("deleteGraph leaves an empty graph with the same schema") {
    val g = TpchGraph(spark, sf).deleteGraph
    assert(g.nodes.count() === 0L && g.edges.count() === 0L)
    assert(g.nodes.columns.toSeq === Seq("id", "ntype", "name", "props"))
    assert(g.edges.columns.toSeq === Seq("src", "dst", "rel", "props"))
  }
}

class RetrieverSurfaceSpec extends SparkSpecBase {

  test("bm25 ranking: idf favors rarer terms, length normalization favors shorter docs") {
    import TestSpark.spark.implicits._
    val docs = Seq(
      // "rare" appears in 1 doc, "common" in all 4 — idf must dominate
      (1L, "rare common filler filler", "en", "s", 24L),
      (2L, "common filler filler filler", "en", "s", 27L),
      (3L, "common filler filler filler filler filler filler filler", "en", "s", 55L),
      (4L, "common filler", "en", "s", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ranked = Retrievers.lexicalBm25(spark, dir, Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 1 holds the rare term → top; among common-only docs the SHORT
    // doc 4 outranks 2, which outranks the long doc 3 (b-normalization)
    assert(ranked.map(_._1).toSeq === Seq(1L, 4L, 2L, 3L), ranked.mkString(", "))
    assert(ranked.head._2 > ranked(1)._2)
  }

  test("rrf fusion: scores are exactly the reciprocal-rank sum of the two legs") {
    val legK = 20
    val vecRanks = Retrievers.chunks(spark, sf, k = legK).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val bm25Ranks = Retrievers.lexicalBm25(spark, sf, k = legK).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val fused = Retrievers.hybridRrf(spark, sf).collect()
    assert(fused.length > 0 && fused.length <= 10)
    fused.foreach { r =>
      val (d, score) = (r.getLong(0), r.getDouble(1))
      assert(vecRanks.contains(d) || bm25Ranks.contains(d), s"doc $d in neither leg's top-$legK")
      val expect = vecRanks.get(d).map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
        bm25Ranks.get(d).map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      assert(math.abs(score - expect) < 1e-6, s"doc $d: $score vs $expect")
    }
    // descending, ties broken by doc_id ascending
    val pairs = fused.map(r => (r.getDouble(1), r.getLong(0)))
    assert(pairs.sliding(2).forall { case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2) })
    // a doc ranked in BOTH legs must outscore one ranked in a single leg at equal-or-worse rank
    val both = fused.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    val single = fused.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getDouble(1)).max > single.map(_.getDouble(1)).min)
  }

  test("insightsAsGraph carries exactly the triplet endpoints, no dangling edges") {
    val g = Retrievers.insightsAsGraph(spark, sf)
    val t = Retrievers.insights(spark, sf)
    assert(g.edges.count() === t.count())
    val endpoints = t.select(col("src").as("id")).union(t.select(col("dst").as("id"))).distinct()
    assert(g.nodes.count() === endpoints.count())
    val dangling = g.edges.select(col("src").as("id")).union(g.edges.select(col("dst").as("id")))
      .distinct().join(g.nodes.select(col("id")), Seq("id"), "left_anti").count()
    assert(dangling === 0L)
  }

  test("insights expands the neighborhood through hash equi-joins, not a nested-loop OR-join") {
    // the only nested-loop allowed is the whitelisted 1-row query-vector
    // crossJoin feeding the centroid ranking; the edge expansion itself
    // must plan as two broadcast HASH joins on the endpoint keys
    val plan = Retrievers.insights(spark, sf).queryExecution.executedPlan.toString
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"edge expansion fell back to nested-loop:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("feedback weights persist on graph edges and shift the completion ranking") {
    val g = Retrievers.feedbackGraph(spark, sf)
    val used = g.edges.filter(col("rel") === "used_graph_element_to_answer")
    // one edge per interaction, each carrying its feedback score as weight
    val nInter = g.nodes.filter(col("ntype") === "interaction").count()
    assert(used.count() === nInter && nInter > 0L)
    val weights = used.select(element_at(col("props"), "feedback_weight").cast("double"))
      .collect().map(_.getDouble(0))
    assert(weights.exists(_ != 0.0), "some interaction must carry a non-zero sentiment")
    // re-applying feedback INCREMENTS (the reference's += semantics)
    import TestSpark.spark.implicits._
    val someEdge = used.filter(element_at(col("props"), "feedback_weight") =!= "0.0")
      .select(col("src"), element_at(col("props"), "feedback_weight").cast("double")).head()
    val again = g.applyFeedbackWeight(Seq((someEdge.getString(0), 2.5)).toDF("id", "weight"))
    val bumped = again.edges.filter(col("rel") === "used_graph_element_to_answer"
        && col("src") === someEdge.getString(0))
      .select(element_at(col("props"), "feedback_weight").cast("double")).head().getDouble(0)
    assert(math.abs(bumped - (someEdge.getDouble(1) + 2.5)) < 1e-9)
    // non-matching edges keep their bags untouched
    assert(again.edges.filter(col("rel") =!= "used_graph_element_to_answer").count()
      === g.edges.filter(col("rel") =!= "used_graph_element_to_answer").count())
    // and the ranking consumed from the graph actually moves
    val out = Retrievers.feedbackWeighted(spark, sf).collect()
    assert(out.exists(r => r.getAs[Long]("base_rank") != r.getAs[Long]("weighted_rank")),
      "feedback weights must change at least one rank")
  }

  test("search_code returns the file and codepart channels, rank-tagged") {
    val r = Retrievers.code(spark, sf).collect()
    assert(r.map(_.getString(0)).toSet === Set("file", "codepart"))
    assert(r.length === 6)
    assert(r.filter(_.getString(0) == "codepart").forall(_.getString(4) != "module"))
  }

  test("coding rules are the ordered rules of the nodeset") {
    val r = Retrievers.codingRules(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    assert(r.map(_.getLong(0)).forall(_ % 7 == 0))
    assert(r.map(_.getLong(0)).toSeq === r.map(_.getLong(0)).toSeq.sorted)
  }

  test("feedback re-rank bounds lexicon scores and keeps 5 candidates") {
    val r = Retrievers.feedback(spark, sf).collect()
    assert(r.length === 5)
    assert(r.map(_.getDouble(3)).forall(s => s >= -5.0 && s <= 5.0))
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("entity search extracts query entities and assembles per-entity context") {
    val r = Retrievers.entity(spark, sf).collect()
    val byEnt = r.groupBy(_.getString(0))
    assert(byEnt.keySet === Set("NATION_3", "NATION_7"))
    assert(byEnt.values.forall(rows => rows.nonEmpty && rows.length <= 3))
  }

  test("completionCot leaves no CacheManager entries (scratch is checkpointed, not persisted)") {
    val out = Retrievers.completionCot(spark, sf)
    // persist() would surface as InMemoryRelation in the consuming plan;
    // the checkpoint-and-release discipline leaves only LogicalRDD scans
    // whose blocks the context cleaner reclaims once `out` is dropped.
    val cached = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.isEmpty, "completionCot must not register CacheManager entries")
    assert(out.count() === 6L)
  }
}

class OntologyOpsSpec extends SparkSpecBase {

  test("every nation resolves: evens exactly, odds fuzzily above the cutoff") {
    val r = OntologyOps.resolve(spark, sf).collect()
      .map(row => row.getString(0) -> (row.getString(2), row.getDouble(3))).toMap
    assert(r.size === 25)
    (0 until 25).foreach { k =>
      val (method, sim) = r(s"nation_$k")
      if (k % 2 == 0) assert(method === "exact" && sim === 1.0, s"nation_$k")
      else assert(method === "fuzzy" && sim >= 0.8 && sim < 1.0, s"nation_$k")
    }
  }

  test("fuzzy resolution picks the closest candidate (never worse than the dash variant)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def sim(a: String, b: String): Double = 1.0 - lev(a, b).toDouble / math.max(a.length, b.length)
    val fuzzy = OntologyOps.resolve(spark, sf).collect().filter(_.getString(2) == "fuzzy")
    assert(fuzzy.nonEmpty)
    fuzzy.foreach { row =>
      val (entity, term) = (row.getString(0), row.getString(1))
      // chosen candidate is at least as similar as the planted dash variant
      assert(sim(entity, term) >= sim(entity, entity.replace("_", "-")) - 1e-9, row.toString)
      assert(lev(entity, term) <= 2, row.toString)
    }
  }
}

class MultimodalSpec extends SparkSpecBase {

  test("imageMeta parses genuine PNG/GIF/BMP headers and rejects noise") {
    import TestSpark.spark.implicits._
    // A real, complete 1x1 transparent PNG (the canonical minimal file).
    val png1x1: Array[Byte] = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52, // IHDR len + tag
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // w=1, h=1
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1F, 0x15, 0xC4, 0x89).map(_.toByte)
    // GIF89a header for a 320x200 screen (little-endian dims at 7/9).
    val gif: Array[Byte] = ("GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xC8, 0x00).map(_.toByte))
    // BMP: "BM" + 16 filler bytes + LE32 width 640, height 480.
    val bmp: Array[Byte] = ("BM".getBytes("US-ASCII") ++ Array.fill(16)(0.toByte) ++
      Array(0x80, 0x02, 0x00, 0x00, 0xE0, 0x01, 0x00, 0x00).map(_.toByte))
    val media = Seq(
      (1L, png1x1), (2L, gif), (3L, bmp),
      (4L, "not an image at all".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = MultimodalOps.imageMeta(media).collect()
      .map(r => (r.getLong(0), (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) === (("png", 1L, 1L)))
    assert(out(2L) === (("gif", 320L, 200L)))
    assert(out(3L) === (("bmp", 640L, 480L)))
    assert(out(4L) === (("unknown", -1L, -1L)))
  }

  test("imageMeta walks JPEG segments to the first SOF (baseline and progressive)") {
    import TestSpark.spark.implicits._
    def hexBytes(h: String): Array[Byte] =
      h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // The libjpeg-style prefix of a baseline 1x1 file: SOI, APP0/JFIF,
    // a full 67-byte DQT, then SOF0 — dimensions sit behind TWO
    // variable segments, so only the marker walk can find them.
    val jpgBaseline = hexBytes(
      "FFD8" +
        "FFE000104A46494600010100000100010000" +
        "FFDB0043" + "00" + "01" * 64 +
        "FFC00011" + "08" + "0001" + "0001" + "03011100021101031101")
    // Progressive (SOF2) 240x320: the non-SOF0 frame markers count too.
    val jpgProgressive = hexBytes(
      "FFD8" +
        "FFE000104A46494600010100000100010000" +
        "FFC20011" + "08" + "00F0" + "0140" + "03011100021101031101")
    // SOI but the walk never meets a SOF within the bound: NULL dims,
    // still typed jpeg — never a wrong dimension.
    val jpgNoSof = hexBytes("FFD8" + "FFE000104A46494600010100000100010000")
    val media = Seq((1L, jpgBaseline), (2L, jpgProgressive), (3L, jpgNoSof))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.imageMeta(media).collect()
      .map(r => (r.getLong(0), (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) === (("jpeg", 1L, 1L)))
    assert(out(2L) === (("jpeg", 320L, 240L)))
    assert(out(3L) === (("jpeg", -1L, -1L)))
  }

  test("videoMeta parses genuine MP4/AVI container prefixes and rejects noise") {
    import TestSpark.spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // ISO BMFF prefix: ftyp(isom) + moov/mvhd with timescale 600,
    // duration 1500 units -> 2.5 s.
    val mp4: Array[Byte] =
      b(0x00, 0x00, 0x00, 0x10) ++ "ftypisom".getBytes("US-ASCII") ++
        b(0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x74) ++
        "moov".getBytes("US-ASCII") ++ b(0x00, 0x00, 0x00, 0x6C) ++
        "mvhd".getBytes("US-ASCII") ++ Array.fill(12)(0x00.toByte) ++
        b(0x00, 0x00, 0x02, 0x58) ++ // timescale 600
        b(0x00, 0x00, 0x05, 0xDC)    // duration 1500
    // RIFF AVI: avih with 40000 us/frame and 250 frames -> 10 s.
    val avi: Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ b(0xF8, 0x00, 0x00, 0x00) ++
        "AVI LIST".getBytes("US-ASCII") ++ b(0xC8, 0x00, 0x00, 0x00) ++
        "hdrlavih".getBytes("US-ASCII") ++ b(0x38, 0x00, 0x00, 0x00) ++
        b(0x40, 0x9C, 0x00, 0x00) ++ // 40000 us/frame LE
        Array.fill(12)(0x00.toByte) ++
        b(0xFA, 0x00, 0x00, 0x00)    // 250 frames LE
    val media = Seq(
      (1L, mp4), (2L, avi), (3L, "just text".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = MultimodalOps.videoMeta(media).collect()
      .map(r => (r.getLong(0), (r.getString(1),
        if (r.isNullAt(2)) "-" else r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(out(1L) === (("mp4", "isom", -1L, 2.5)))
    assert(out(2L) === (("avi", "-", 250L, 10.0)))
    assert(out(3L) === (("unknown", "-", -1L, -1.0)))
  }

  test("audioMeta parses a genuine PCM WAV header") {
    import TestSpark.spark.implicits._
    // canonical 44-byte header: mono, 8 kHz, 16-bit, 16000 data bytes
    def le(x: Long, n: Int): Array[Byte] = (0 until n).map(i => ((x >> (8 * i)) & 0xff).toByte).toArray
    val wav: Array[Byte] = "RIFF".getBytes("US-ASCII") ++ le(36 + 16000, 4) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++ le(16, 4) ++
      le(1, 2) ++ le(1, 2) ++ le(8000, 4) ++ le(16000, 4) ++ le(2, 2) ++ le(16, 2) ++
      "data".getBytes("US-ASCII") ++ le(16000, 4)
    val media = Seq((1L, wav), (2L, "noise".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = MultimodalOps.audioMeta(media).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1.0 else r.getDouble(6))).sortBy(_._1).toList
    assert(out === List(
      (1L, "wav", 1L, 8000L, 8000L, 1.0),
      (2L, "unknown", -1L, -1L, -1L, -1.0)))
  }

  test("frame samples tile the payload at the stride with in-bounds windows") {
    val fs = MultimodalOps.frameSample(spark, sf).cache()
    assert(fs.filter(col("frame_idx") % 4 =!= 0).count() === 0L)
    assert(fs.filter(col("n_bytes") <= 0 || col("n_bytes") > 32).count() === 0L)
    // offsets never run past the document end
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val oob = fs.join(docs, Seq("doc_id"))
      .filter(col("offset") + col("n_bytes") > col("len")).count()
    assert(oob === 0L)
    assert(fs.count() > docs.count()) // long docs yield multiple sampled frames
  }

  test("feature slots sum back to byte_sum and n_bytes matches payload") {
    val bad = MultimodalOps.binaryFeatures(spark, sf)
      .filter(col("f0") + col("f1") + col("f2") + col("f3") =!= col("byte_sum").cast("double"))
      .count()
    assert(bad === 0L)
  }

  test("ahash banding is lossless vs brute-force hamming <= 3 at sf0.001") {
    // Recompute the 64-bit average hash per doc in plain Scala and take
    // ALL pairs with hamming <= 3; the 4x16-bit banded equi-join must
    // return exactly that set (pigeonhole: <= 3 flipped bits across 4
    // bands leaves at least one band identical).
    val docs = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 128)
      .select(col("doc_id"), substring(col("text"), 1, 128).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def hash(t: String): Array[Long] = {
      val ws = Array.tabulate(64)(w => t.charAt(2 * w).toInt + t.charAt(2 * w + 1).toInt)
      val total = ws.sum
      Array.tabulate(4) { b =>
        (0 until 16).foldLeft(0L)((acc, i) =>
          if (ws(b * 16 + i).toLong * 64 > total) acc | (1L << i) else acc)
      }
    }
    val hs = docs.map { case (id, t) => (id, hash(t)) }
    val expect = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      h = (0 until 4).map(k => java.lang.Long.bitCount(hs(i)._2(k) ^ hs(j)._2(k))).sum
      if h <= 3
    } yield {
      val (a, b) = if (hs(i)._1 < hs(j)._1) (hs(i)._1, hs(j)._1) else (hs(j)._1, hs(i)._1)
      (a, b, h.toLong)
    }).toSet
    val got = MultimodalOps.ahashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expect.nonEmpty) // planted cross-source dups guarantee hits
    assert(got === expect)
  }
}
