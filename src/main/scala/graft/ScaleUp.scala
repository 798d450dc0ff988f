package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-aid corpus scaler for soak runs: derives an sf×N corpus from an
  * existing testdata dir by replicating every fact table N times with
  * deterministic key offsets (replica i shifts each key domain by
  * i × (max(key)+1)), preserving referential integrity (orders→customer,
  * lineitem→orders/part/supplier) and the shared doc_id ≡ vec_id domain
  * across documents/embeddings. Dimension tables (region, nation) copy
  * verbatim. Values (prices, text, vectors, timestamps) repeat — the
  * soak measures plan scaling, not value entropy; the ten exact copies
  * per document/vector also stress the dedup/ANN pair stages with known
  * cluster size N.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [dstDir] [factor]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/testdata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-scaleup")

    def load(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def base(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val custBase = base(load("customer"), "c_custkey")
    val suppBase = base(load("supplier"), "s_suppkey")
    val partBase = base(load("part"), "p_partkey")
    val orderBase = base(load("orders"), "o_orderkey")
    val userBase = base(load("events"), "user_id")
    val eventBase = base(load("events"), "event_id")
    // documents.doc_id and embeddings.vec_id are one id domain
    // (Retrievers.scala:44) — shift both by the same base.
    val docBase = math.max(base(load("documents"), "doc_id"),
      base(load("embeddings"), "vec_id"))

    val reps = broadcast(spark.range(factor).select(col("id").as("rep")))
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }
    def replicate(name: String, shifts: (String, Long)*): Unit = {
      val df = load(name)
      val shifted = shifts.foldLeft(df.crossJoin(reps)) { case (d, (c, b)) =>
        d.withColumn(c, col(c) + col("rep") * b)
      }
      write(name, shifted.drop("rep"))
    }

    write("region", load("region"))
    write("nation", load("nation"))
    replicate("customer", "c_custkey" -> custBase)
    replicate("supplier", "s_suppkey" -> suppBase)
    replicate("part", "p_partkey" -> partBase)
    replicate("orders", "o_orderkey" -> orderBase, "o_custkey" -> custBase)
    replicate("lineitem", "l_orderkey" -> orderBase, "l_partkey" -> partBase,
      "l_suppkey" -> suppBase)
    replicate("events", "event_id" -> eventBase, "user_id" -> userBase)
    replicate("documents", "doc_id" -> docBase)
    replicate("embeddings", "vec_id" -> docBase)
    spark.stop()
  }
}
