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

  /** extension → MIME (the visible half of guess_file_type — the
    * reference's filetype lib sniffs magic bytes, but its output for
    * every routed extension is this table; unknown → octet-stream,
    * filetype's own fallback). */
  private def mimeOf(ext: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(ext === "pdf", "application/pdf")
      .when(ext === "txt", "text/plain")
      .when(ext === "png", "image/png").when(ext.isin("jpg", "jpx"), "image/jpeg")
      .when(ext === "gif", "image/gif").when(ext === "webp", "image/webp")
      .when(ext.isin("tif", "cr2"), "image/tiff").when(ext === "bmp", "image/bmp")
      .when(ext === "heic", "image/heic").when(ext === "avif", "image/avif")
      .when(ext === "mp3", "audio/mpeg").when(ext === "wav", "audio/x-wav")
      .when(ext === "flac", "audio/x-flac").when(ext === "ogg", "audio/ogg")
      .when(ext === "m4a", "audio/mp4").when(ext === "aac", "audio/aac")
      .when(ext.isin("aiff", "amr", "mid"), concat(lit("audio/"), ext))
      .otherwise("application/octet-stream")

  /** Binary-file ingest (reference: modules/ingestion/data_types/
    * BinaryData.py — get_identifier() is the metadata content hash;
    * infrastructure/files/utils/get_file_metadata.py FileMetadata =
    * name/file_path/mime_type/extension/content_hash/file_size;
    * S3BinaryData.py is the same shape over object storage, which here
    * is just a different URI through the same Hadoop FS layer — one
    * reader covers local dirs and buckets alike).
    *
    * Spark's `binaryFile` source scans the files distributed (one row
    * per file: path, length, content), so ingest parallelizes across
    * executors instead of the reference's per-file asyncio loop. Each
    * file lands as one TYPED row carrying the FileMetadata fields, its
    * routed document class, and the opaque payload + (mime, n_bytes)
    * meta struct that [[graft.operators.MultimodalOps]] decode plumbing
    * consumes directly. doc_id = content hash (same md5-fold as the
    * text readers), so re-ingesting a byte-identical file is a no-op
    * for every downstream dedup/upsert.
    */
  def readBinary(spark: SparkSession, path: String, sourceTag: String = "binary"): DataFrame = {
    val raw = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("length"), col("content"))
    classify(raw).select(
      conv(substring(md5(col("content")), 1, 15), 16, 10).cast("long").as("doc_id"),
      regexp_extract(col("path"), "([^/]*?)(\\.[A-Za-z0-9]+)?$", 1).as("name"),
      col("path").as("file_path"),
      mimeOf(col("extension")).as("mime"),
      col("extension"),
      md5(col("content")).as("content_hash"),
      col("length").as("n_bytes"),
      col("document_class"),
      lit(sourceTag).as("source"),
      col("content").as("payload"),
      struct(
        mimeOf(col("extension")).as("mime"),
        col("length").as("n_bytes")).as("meta"))
  }

  /** Project ingested binary rows onto the documents schema so the
    * dataset inventory / chunking / dedup surface sees them (reference:
    * every Document subclass read()s into the same chunk stream —
    * PdfDocument/ImageDocument/AudioDocument differ only in how text is
    * obtained). Text-class payloads decode as UTF-8; media classes get
    * a deterministic transcription STAND-IN (`[<class> transcript of
    * <name>]` — the reference transcribes via LLM, out of scope here;
    * same honesty contract as MultimodalOps.fakeDecode). */
  def toDocuments(binaryDocs: DataFrame): DataFrame = {
    val text = when(col("document_class").isin("TextDocument", "UnstructuredDocument"),
        decode(col("payload"), "UTF-8"))
      .otherwise(concat(lit("["),
        col("document_class"), lit(" transcript of "), col("name"), lit("]")))
    binaryDocs.select(
      col("doc_id"), text.as("text"), lit("und").as("lang"), col("source"),
      length(text).cast("long").as("n_chars"))
  }
}
