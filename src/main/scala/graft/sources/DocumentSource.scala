package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-document ingest sources (reference: cognee add() accepts text
  * files and JSONL alongside structured data — the loaders in
  * cognee/modules/ingestion). Both readers land on the same
  * (doc_id, text, lang, source, n_chars) schema as the parquet
  * documents table, so every downstream operator (chunking, dedup,
  * curation, retrieval) runs unchanged on freshly ingested data.
  *
  * doc_id is a deterministic content hash (first 15 md5 hex digits —
  * fits a signed long), not an RDG sequence: re-ingesting the same
  * file yields the same ids, which is what makes dedup-on-ingest and
  * incremental add idempotent.
  */
object DocumentSource {

  private def withSchema(df: DataFrame, sourceTag: String): DataFrame =
    df.select(
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("doc_id"),
      col("text"),
      lit("und").as("lang"), // language id is a downstream operator (text_langid)
      lit(sourceTag).as("source"),
      length(col("text")).cast("long").as("n_chars"))

  /** One document per line of plain text (empty lines dropped). */
  def readText(spark: SparkSession, path: String, sourceTag: String = "text"): DataFrame =
    withSchema(
      spark.read.text(path).select(col("value").as("text")).filter(length(col("text")) > 0),
      sourceTag)

  /** JSON-lines with a `text` field (extra fields ignored). */
  def readJsonl(spark: SparkSession, path: String, sourceTag: String = "jsonl"): DataFrame =
    withSchema(
      spark.read.json(path).select(col("text").cast("string").as("text"))
        .filter(col("text").isNotNull && length(col("text")) > 0),
      sourceTag)

  /** Extension → document-class mapping (reference: cognee/tasks/
    * documents/classify_documents.py EXTENSION_TO_DOCUMENT_CLASS,
    * reproduced in full: pdf→Pdf, txt→Text, office formats→
    * Unstructured, image formats→Image, audio formats→Audio; unknown
    * extensions are Unstructured). The class routes each file to its
    * loader/decoder (the multimodal plumbing in MultimodalOps);
    * classification itself is one CASE projection over the path
    * column — no I/O. */
  def classify(paths: DataFrame, pathCol: String = "path"): DataFrame = {
    val ext = lower(regexp_extract(col(pathCol), "\\.([A-Za-z0-9]+)$", 1))
    val cls =
      when(ext === "pdf", "PdfDocument")
        .when(ext === "txt", "TextDocument")
        .when(ext.isin("docx", "doc", "odt", "xls", "xlsx", "ppt", "pptx", "odp", "ods"),
          "UnstructuredDocument")
        .when(ext.isin("png", "dwg", "xcf", "jpg", "jpx", "apng", "gif", "webp",
          "cr2", "tif", "bmp", "jxr", "psd", "ico", "heic", "avif"),
          "ImageDocument")
        .when(ext.isin("aac", "mid", "mp3", "m4a", "ogg", "flac", "wav", "amr", "aiff"),
          "AudioDocument")
        .otherwise("UnstructuredDocument")
    paths.withColumn("extension", ext).withColumn("document_class", cls)
  }
}
