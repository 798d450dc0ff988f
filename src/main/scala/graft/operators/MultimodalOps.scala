package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (brief-mandated): media as opaque binary
  * payloads + typed metadata, processed in partition-sized batches.
  *
  * The decode step is a DETERMINISTIC FAKE — image/audio codecs are not
  * in this environment — but everything Spark-side is real: the
  * (payload BINARY, meta STRUCT) schema, balanced repartitioning before
  * the expensive stage, and a mapPartitions batch boundary shaped like
  * a vectorized/Arrow UDF (the Scala analog of mapInPandas: one
  * iterator in, one iterator out, per partition). Swap
  * [[fakeDecode]] for a real codec and nothing else changes.
  */
object MultimodalOps {

  /** Stand-in for a real media decode: fold payload bytes into a fixed
    * 4-slot feature vector + byte stats. Marked fake on purpose. */
  private def fakeDecode(payload: Array[Byte]): (Long, Array[Double]) = {
    var sum = 0L
    val feats = new Array[Double](4)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      feats(i % 4) += b.toDouble
      i += 1
    }
    (sum, feats)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("byte_sum", LongType),
    StructField("f0", DoubleType), StructField("f1", DoubleType),
    StructField("f2", DoubleType), StructField("f3", DoubleType)))

  /** Binary ingest → metadata → batched "decode" → feature rows.
    * Payloads are synthesized from the documents table (text bytes as
    * the opaque blob; mime derived from doc_id) so the pipeline is
    * runnable on the standard testdata. */
  def binaryFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = load(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))
    // Balance the expensive stage: media blobs can be skewed, so spread
    // by doc_id hash before the per-partition batch decode.
    val balanced = media.repartition(col("doc_id"))
    val rows = balanced.rdd.mapPartitions { it =>
      it.map { r =>
        val meta = r.getAs[Row]("meta")
        val (sum, feats) = fakeDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), meta.getAs[String]("mime"), meta.getAs[Long]("n_bytes"),
          sum, feats(0), feats(1), feats(2), feats(3))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> ((s: SparkSession, d: String) => binaryFeatures(s, d)))

  /** The corpus is pure ASCII, so the fake decode is fully reproducible
    * in SQL: byte k of the payload is ascii(char k), feature slot f_k
    * sums bytes at positions ≡ k (mod 4). */
  val binaryFeaturesSql: String =
    """WITH pos AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |    i
      |  FROM documents, unnest(range(length(text))) AS u(i)
      |)
      |SELECT doc_id, any_value(mime) AS mime,
      |  CAST(count(*) AS BIGINT) AS n_bytes,
      |  CAST(sum(ascii(substr(text, CAST(i AS INT) + 1, 1))) AS BIGINT) AS byte_sum,
      |  CAST(sum(CASE WHEN i % 4 = 0 THEN ascii(substr(text, CAST(i AS INT) + 1, 1)) ELSE 0 END) AS DOUBLE) AS f0,
      |  CAST(sum(CASE WHEN i % 4 = 1 THEN ascii(substr(text, CAST(i AS INT) + 1, 1)) ELSE 0 END) AS DOUBLE) AS f1,
      |  CAST(sum(CASE WHEN i % 4 = 2 THEN ascii(substr(text, CAST(i AS INT) + 1, 1)) ELSE 0 END) AS DOUBLE) AS f2,
      |  CAST(sum(CASE WHEN i % 4 = 3 THEN ascii(substr(text, CAST(i AS INT) + 1, 1)) ELSE 0 END) AS DOUBLE) AS f3
      |FROM pos GROUP BY doc_id""".stripMargin

  def oracles: Map[String, String] = Map("mm_binary_meta" -> binaryFeaturesSql)
}
