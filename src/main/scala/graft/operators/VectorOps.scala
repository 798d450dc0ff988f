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

  /** Near-dup pairs at cosine ≥ 0.4. Exact at test scale (the corpus
    * plants no high-cosine pairs, so hyperplane LSH could not be both
    * sub-quadratic and high-recall here); at 100 TB this swaps in the
    * IVF/LSH shortlist exactly like [[knnIvf]]. Canonical v1 < v2. */
  def dedupCosine(spark: SparkSession, dir: String): DataFrame = {
    // Precompute each row's norm once (sqrt of the same self-dot the
    // per-pair formula would take → bitwise-identical cosines, 3× fewer
    // dot products inside the O(n²) pair loop).
    val e = emb(spark, dir).select(col("vec_id"), col("v"), norm(col("v")).as("nv"))
    val a = e.select(col("vec_id").as("v1"), col("v").as("va"), col("nv").as("na"))
    val b = e.select(col("vec_id").as("v2"), col("v").as("vb"), col("nv").as("nb"))
    a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= 0.4)
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

  /** IVF-style ANN: coarse cells = label centroids (broadcast), probe
    * the nprobe=3 nearest cells, exact re-rank inside the shortlist.
    * Approximate by construction → rows-only driver check; the
    * ScalaTest spec measures recall against [[knn]]. */
  def knnIvf(spark: SparkSession, dir: String, nprobe: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val dims = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
    val cent = dims.groupBy(col("label"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        s => s.getField("cx")).as("centroid"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv"))
    // nearest nprobe cells per query (tiny: queries × cells)
    val cellW = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("label").asc)
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("label"), cosine(col("qv"), col("centroid")).as("ccos"))
      .withColumn("rn", row_number().over(cellW)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("label"))
    // shortlist = members of probed cells; exact re-rank
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    e.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  /** Random-hyperplane LSH ANN: nbits sign bits (deterministic ±1
    * planes) define the bucket; candidates share the query's bucket,
    * then exact re-rank. The complementary scale path to [[knnIvf]]
    * (hash-partitioned buckets instead of centroid cells); nbits=0
    * degenerates to one bucket = brute force (the spec's reduction
    * check). Approximate → rows-only driver check. */
  def knnLsh(spark: SparkSession, dir: String, nbits: Int = 8): DataFrame = {
    val rng = new java.util.Random(7)
    val planes = Array.fill(nbits)(Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
    val e = emb(spark, dir)
    def bucket(v: Column): Column =
      if (nbits == 0) lit(0L)
      else planes.zipWithIndex.map { case (p, j) =>
        when(dot(v, lit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val corpus = e.select(col("vec_id"), col("v"), bucket(col("v")).as("bucket"))
    val q = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cosine(col("qv"), col("v")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vec_knn_lsh" -> ((s: SparkSession, d: String) => knnLsh(s, d)),
    "vec_knn" -> ((s: SparkSession, d: String) => knn(s, d)),
    "vec_dedup_cosine" -> ((s: SparkSession, d: String) => dedupCosine(s, d)),
    "vec_centroids" -> ((s: SparkSession, d: String) => centroids(s, d)),
    "vec_knn_ivf" -> ((s: SparkSession, d: String) => knnIvf(s, d)))

  def oracles: Map[String, String] = Map(
    "vec_knn" -> knnSql,
    "vec_dedup_cosine" -> dedupCosineSql,
    "vec_centroids" -> centroidsSql)
}
