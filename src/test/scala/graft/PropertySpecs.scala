package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** Property-style checks (plain scalacheck Gen sampling — the
  * scalatest/scalacheck bridge artifact isn't on the classpath). */
class PropertySpecs extends SparkSpecBase {

  private val rng = new scala.util.Random(1234)

  test("SessionDirCache rebuilds when the corpus stamp changes, not otherwise") {
    var stampVal = "s1"
    var builds = 0
    val cache = new graft.graph.SessionDirCache[Int](
      (_, _) => { builds += 1; builds }, stamp = (_, _) => stampVal)
    assert(cache(spark, "d") === 1 && cache(spark, "d") === 1 && builds === 1)
    stampVal = "s2" // corpus changed (e.g. an ingest appended a file)
    assert(cache(spark, "d") === 2 && builds === 2)
    assert(cache(spark, "d") === 2 && builds === 2) // stable again
  }

  test("SessionDirCache unpersists a replaced persisted-DataFrame artifact") {
    import TestSpark.spark.implicits._
    var stampVal = "s1"
    val built = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val cache = new graft.graph.SessionDirCache[org.apache.spark.sql.DataFrame](
      (_, _) => {
        val df = Seq(built.length).toDF("x").persist()
        df.count() // materialize so the CacheManager entry exists
        built += df
        df
      }, stamp = (_, _) => stampVal)
    cache(spark, "d")
    assert(built.head.storageLevel.useMemory)
    stampVal = "s2" // ingest rewrote the corpus — artifact must rebuild
    cache(spark, "d")
    assert(built.length === 2)
    // the superseded artifact must not linger in the CacheManager
    assert(built.head.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(built(1).storageLevel.useMemory)
    built(1).unpersist()
  }

  test("graph-side artifacts rebuild when an input table is rewritten") {
    import java.nio.file.{Files, Path, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val tmp = Files.createTempDirectory("graft_stamp").toString
    for (t <- graft.graph.SessionDirCache.graphTables ++ Seq("documents", "embeddings", "events"))
      Files.copy(Path.of(s"$sf/$t.parquet"), Path.of(s"$tmp/$t.parquet"))
    val g1 = graft.graph.TpchGraph(spark, tmp)
    val t1 = operators.Retrievers.renderedTriplets(spark, tmp)
    // stable while the corpus is untouched — same cached instances
    assert(graft.graph.TpchGraph(spark, tmp) eq g1)
    assert(operators.Retrievers.renderedTriplets(spark, tmp) eq t1)
    // an ingest rewrites one input table (new mtime → new stamp)
    Files.copy(Path.of(s"$sf/nation.parquet"), Path.of(s"$tmp/nation.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(Path.of(s"$tmp/nation.parquet"),
      FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val g2 = graft.graph.TpchGraph(spark, tmp)
    assert(!(g2 eq g1), "projection must rebuild after the corpus rewrite")
    assert(!(operators.Retrievers.renderedTriplets(spark, tmp) eq t1),
      "rendered-triplet artifact must rebuild with the projection")
    // the superseded projection's persisted blocks were released
    assert(g1.nodes.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("cosine is symmetric and bounded on random vectors") {
    import TestSpark.spark.implicits._
    val cases = Seq.fill(20)((
      Array.fill(16)(rng.nextDouble() * 20 - 10),
      Array.fill(16)(rng.nextDouble() * 20 - 10)))
    val df = cases.toDF("a", "b").select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("b"), col("a")).as("ba"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("chunk count is ceil(words/64) for arbitrary word counts") {
    import TestSpark.spark.implicits._
    val ns = Seq(1, 2, 63, 64, 65, 127, 128, 129, 200, 300) ++ Seq.fill(10)(rng.nextInt(300) + 1)
    val df = ns.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val counts = df
      .select(col("doc_id"),
        explode(sequence(lit(0), ceil(size(toks) / lit(64.0)).cast("int") - 1)).as("i"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.zipWithIndex.foreach { case (n, i) =>
      assert(counts(i.toLong) === ((n + 63) / 64).toLong, s"words=$n")
    }
  }

  test("incremental add admits exactly the unseen documents") {
    import TestSpark.spark.implicits._
    val existing = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val incoming = Seq((3L, "alpha beta"), (4L, "delta"), (5L, "gamma")).toDF("doc_id", "text")
    val admitted = Pipeline.addIncrement(existing, incoming)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(admitted === Set(4L))
  }
}
