package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** The batched "decode" stage over any (doc_id, payload, meta{mime,
    * n_bytes}) media relation — the shape [[graft.sources.DocumentSource
    * .readBinary]] ingests files into. Balanced repartition before the
    * expensive per-partition batch, then one iterator-in/iterator-out
    * mapPartitions (the Scala analog of mapInPandas). Swap
    * [[fakeDecode]] for a real codec and nothing else changes. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    // Balance the expensive stage: media blobs can be skewed, so spread
    // by doc_id hash before the per-partition batch decode.
    val balanced = media.select(col("doc_id"), col("payload"), col("meta"))
      .repartition(col("doc_id"))
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
    decodeFeatures(spark, media)
  }

  /** Frame sampling + resize plumbing: treat each payload as a media
    * stream of fixed 32-byte frames, keep every 4th frame (the
    * video-frame-sample shape), and compute a stride-subsampled byte
    * aggregate per kept frame (the deterministic stand-in for a resize/
    * downsample kernel — swap the aggregate for a real scaler and the
    * frame bookkeeping, offsets, and schema stay). Pure expressions:
    * the frame index explodes from a sequence, every byte access is
    * offset arithmetic — no collect, no UDF. */
  def frameSample(spark: SparkSession, dir: String,
      frame: Int = 32, stride: Int = 4): DataFrame = {
    val n = length(col("text"))
    val nFrames = ceil(n / lit(frame.toDouble)).cast("int")
    val off = col("fidx") * frame
    val frameLen = least(lit(frame), n - off)
    // Byte downsample factor is fixed at 4 (the oracle pins it with the
    // defaults); `stride` governs which frames are kept.
    val subPos = sequence(lit(0), frameLen - 1, lit(4))
    load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(n > 0) // empty payload → zero frames (matches the oracle's range(0))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), nFrames - 1)).as("fidx"))
      .filter(col("fidx") % stride === 0)
      .select(
        col("doc_id"),
        col("fidx").cast("long").as("frame_idx"),
        off.cast("long").as("offset"),
        frameLen.cast("long").as("n_bytes"),
        md5(col("text").substr(off + 1, frameLen)).as("frame_hash"),
        aggregate(
          transform(subPos, p => ascii(col("text").substr(off + p + 1, lit(1)))),
          lit(0L), (acc, x) => acc + x).as("resized_sum"))
  }

  val frameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id, text, i AS frame_idx
      |  FROM documents, unnest(range(CAST(ceil(length(text) / 32.0) AS BIGINT))) AS u(i)
      |  WHERE i % 4 = 0
      |)
      |SELECT doc_id, frame_idx,
      |  frame_idx * 32 AS offset,
      |  least(32, length(text) - frame_idx * 32) AS n_bytes,
      |  md5(substr(text, CAST(frame_idx * 32 + 1 AS INT),
      |      CAST(least(32, length(text) - frame_idx * 32) AS INT))) AS frame_hash,
      |  CAST(list_sum(list_transform(
      |    range(0, least(32, length(text) - frame_idx * 32), 4),
      |    p -> ascii(substr(text, CAST(frame_idx * 32 + p + 1 AS INT), 1)))) AS BIGINT) AS resized_sum
      |FROM f""".stripMargin

  // ---------------------------------------------------------------------
  // REAL image-header sniffing — unlike the decode stand-in above, this
  // needs no codec: PNG/GIF/BMP dimensions live at fixed header offsets,
  // so magic-byte detection and width/height extraction are pure
  // codegen'd byte arithmetic over the BINARY payload (substring + hex +
  // conv), valid on genuine files (spec-proven on a real 1×1 PNG).
  // ---------------------------------------------------------------------

  private def byteAt(p: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    conv(hex(substring(p, i, 1)), 16, 10).cast("long")

  // Column-indexed byte/BE16 reads for the JPEG segment walk (the
  // marker offsets are data-dependent, unlike the fixed-offset formats).
  private def byteAtC(p: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
    conv(hex(p.substr(i, lit(1))), 16, 10).cast("long")
  private def be16C(p: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
    byteAtC(p, i) * 256 + byteAtC(p, i + 1)

  /** JPEG frame dimensions via a BOUNDED SOF marker scan (JPEG has no
    * fixed-offset dimension field — height/width live in the first
    * start-of-frame segment, behind a variable run of APPn/DQT/COM
    * segments). The segment walk `off → off + 2 + BE16(len)` is
    * unrolled `maxSegs` times as pure byte arithmetic — stays inside
    * codegen, no UDF. Each step is its OWN projection stage
    * (`__joff`/`__jw`/`__jh` scratch columns): inlining the offset
    * recurrence into one expression tree triples per step (a ~36 MiB
    * task binary at 8 steps); the staged form computes each offset
    * once, and CollapseProject keeps the stages because the non-cheap
    * alias is referenced several times. SOF markers are C0-CF minus
    * C4/C8/CC (DHT/JPG/DAC), per ITU T.81 Table B.1. Baseline files
    * carry SOF within the first handful of segments; a frame deeper
    * than the unroll bound parses as dimension-NULL, never wrong. */
  private def withJpegDims(df: DataFrame, maxSegs: Int = 8): DataFrame = {
    val p = col("payload")
    val sofMarkers = Seq(0xC0L, 0xC1L, 0xC2L, 0xC3L, 0xC5L, 0xC6L, 0xC7L,
      0xC9L, 0xCAL, 0xCBL, 0xCDL, 0xCEL, 0xCFL)
    var out = df
      .withColumn("__joff", lit(3L)) // 1-based pos of the segment's 0xFF
      .withColumn("__jw", lit(null).cast("long"))
      .withColumn("__jh", lit(null).cast("long"))
    for (_ <- 1 to maxSegs) {
      val off = col("__joff")
      val isSof = byteAtC(p, off) === 0xFFL &&
        byteAtC(p, off + 1).isin(sofMarkers: _*)
      // segment layout from `off`: FF(1) marker(1) len(2) payload…;
      // SOF payload: precision(1) height(2) width(2) …
      out = out
        .withColumn("__jh", when(col("__jh").isNull && isSof, be16C(p, off + 5))
          .otherwise(col("__jh")))
        .withColumn("__jw", when(col("__jw").isNull && isSof, be16C(p, off + 7))
          .otherwise(col("__jw")))
        .withColumn("__joff", off + 2 + be16C(p, off + 2))
    }
    out
  }

  /** Detect format and parse dimensions from any (doc_id, payload)
    * media relation: PNG (big-endian IHDR at 17/21), GIF (little-endian
    * 16-bit at 7/9), BMP (little-endian 32-bit at 19/23), JPEG (bounded
    * SOF segment scan, [[jpegDims]]); anything else is `unknown` with
    * NULL dimensions. */
  def imageMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    val isPng = hex(substring(p, 1, 8)) === "89504E470D0A1A0A"
    val isGif = hex(substring(p, 1, 4)) === "47494638"
    val isBmp = hex(substring(p, 1, 2)) === "424D"
    val isJpg = hex(substring(p, 1, 2)) === "FFD8"
    def be32(i: Int) = conv(hex(substring(p, i, 4)), 16, 10).cast("long")
    def le16(i: Int) = byteAt(p, i) + byteAt(p, i + 1) * 256
    def le32(i: Int) = byteAt(p, i) + byteAt(p, i + 1) * 256 +
      byteAt(p, i + 2) * 65536 + byteAt(p, i + 3) * 16777216
    withJpegDims(media).select(col("doc_id"),
      when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
        .when(isJpg, "jpeg").otherwise("unknown").as("format"),
      when(isPng, be32(17)).when(isGif, le16(7)).when(isBmp, le32(19))
        .when(isJpg, col("__jw")).as("width"),
      when(isPng, be32(21)).when(isGif, le16(9)).when(isBmp, le32(23))
        .when(isJpg, col("__jh")).as("height"))
  }

  /** WAV (RIFF) header parse — the audio twin of [[imageMeta]]: a
    * canonical 44-byte PCM WAV header carries the format fields at
    * fixed little-endian offsets (channels@23, sample rate@25,
    * bits-per-sample@35, data size@41), so sample-count/duration
    * arithmetic is the same codegen'd byte math, no audio lib. Non-RIFF
    * payloads yield NULL fields. */
  def audioMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    val isWav = hex(substring(p, 1, 4)) === "52494646" &&
      hex(substring(p, 9, 4)) === "57415645"
    def le16(i: Int) = byteAt(p, i) + byteAt(p, i + 1) * 256
    def le32(i: Int) = byteAt(p, i) + byteAt(p, i + 1) * 256 +
      byteAt(p, i + 2) * 65536 + byteAt(p, i + 3) * 16777216
    val channels = le16(23)
    val rate = le32(25)
    val bits = le16(35)
    val dataBytes = le32(41)
    val nSamples = (dataBytes / (channels * (bits / 8))).cast("long")
    media.select(col("doc_id"),
      when(isWav, "wav").otherwise("unknown").as("format"),
      when(isWav, channels).as("channels"),
      when(isWav, rate).as("sample_rate"),
      when(isWav, bits).as("bits"),
      when(isWav, nSamples).as("n_samples"),
      // floor-truncated (engine-independent) like the quality scores
      when(isWav, floor(nSamples.cast("double") / rate * 10000) / 10000).as("duration_s"))
  }

  /** Deterministic WAV corpus: each doc synthesizes a canonical 44-byte
    * PCM header with column-derived fields; registered as a build→parse
    * round trip against the closed-form oracle. */
  def audioHeaders(spark: SparkSession, dir: String): DataFrame = {
    val ch = (col("doc_id") % 2 + 1).cast("long")
    val rate = (lit(8000L) + (col("n_chars") % 8) * 4000L).cast("long")
    val bits = lit(16L)
    val dataBytes = (col("n_chars") * 4).cast("long")
    def leHex(x: org.apache.spark.sql.Column, nBytes: Int) = concat(
      (0 until nBytes).map(b => lpad(hex(shiftright(x, b * 8) % 256), 2, "0")): _*)
    val payloadHex = concat(
      lit("52494646"), leHex(dataBytes + 36, 4), lit("57415645"), // RIFF <size> WAVE
      lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2),     // fmt  16 PCM
      leHex(ch, 2), leHex(rate, 4),
      leHex(rate * ch * 2L, 4), leHex(ch * 2L, 2), // byte rate, block align (16-bit samples)
      leHex(bits, 2), lit("64617461"), leHex(dataBytes, 4))        // bits "data" <size>
    load(spark, dir, "documents")
      .select(col("doc_id"), unhex(payloadHex).as("payload"))
  }

  val audioMetaSql: String =
    """SELECT doc_id,
      |  'wav' AS format,
      |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
      |  CAST(8000 + (n_chars % 8) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(16 AS BIGINT) AS bits,
      |  CAST((n_chars * 4) / ((doc_id % 2 + 1) * 2) AS BIGINT) AS n_samples,
      |  floor(((n_chars * 4) // ((doc_id % 2 + 1) * 2)) * 1.0
      |        / (8000 + (n_chars % 8) * 4000) * 10000) / 10000 AS duration_s
      |FROM documents""".stripMargin

  /** Deterministic header corpus: each doc synthesizes a GENUINE
    * PNG/GIF/BMP/JPEG header (by doc_id mod 4) carrying dimensions
    * derived from its columns — so the registered query is a
    * build→parse round trip through real header layouts, and the oracle
    * pins the closed form (an endianness or offset bug breaks the
    * hash). The JPEG stratum is SOI + a full 16-byte APP0/JFIF segment
    * + SOF0, so parsing REQUIRES the segment walk to skip a non-SOF
    * segment — a parser reading a fixed offset cannot match. */
  def imageHeaders(spark: SparkSession, dir: String): DataFrame = {
    val w = (col("n_chars") % 1024 + 1).cast("long")
    val h = (col("doc_id") % 768 + 1).cast("long")
    def beHex16(x: org.apache.spark.sql.Column) = lpad(hex(x), 4, "0")
    def beHex32(x: org.apache.spark.sql.Column) = lpad(hex(x), 8, "0")
    def leHex(x: org.apache.spark.sql.Column, nBytes: Int) = concat(
      (0 until nBytes).map(b => lpad(hex(shiftright(x, b * 8) % 256), 2, "0")): _*)
    val payloadHex =
      when(col("doc_id") % 4 === 0,
        concat(lit("89504E470D0A1A0A0000000D49484452"), beHex32(w), beHex32(h)))
      .when(col("doc_id") % 4 === 1,
        concat(lit("474946383961"), leHex(w, 2), leHex(h, 2)))
      .when(col("doc_id") % 4 === 2,
        concat(lit("424D" + "00" * 16), leHex(w, 4), leHex(h, 4)))
      .otherwise(concat(
        lit("FFD8"), // SOI
        lit("FFE000104A46494600010100000100010000"), // APP0/JFIF, len 0x10
        lit("FFC0001108"), beHex16(h), beHex16(w), // SOF0, len 0x11, 8-bit
        lit("03011100021101031101"))) // 3 components
    load(spark, dir, "documents")
      .select(col("doc_id"), unhex(payloadHex).as("payload"))
  }

  val imageMetaSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
      |  CAST(n_chars % 1024 + 1 AS BIGINT) AS width,
      |  CAST(doc_id % 768 + 1 AS BIGINT) AS height
      |FROM documents""".stripMargin

  /** Video container sniff — the video leg of the image/audio/video
    * metadata family: MP4 (ISO BMFF `ftyp` fourcc at 5, brand at 9;
    * `mvhd` big-endian timescale@45 / duration@49 in the canonical
    * ftyp+moov prefix) and AVI (RIFF/`AVI ` with the `avih` main
    * header's little-endian µs-per-frame@33 and total-frames@49).
    * Same codegen'd byte arithmetic as [[imageMeta]]/[[audioMeta]];
    * non-video payloads yield NULL fields. */
  def videoMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    def be32(i: Int) = conv(hex(substring(p, i, 4)), 16, 10).cast("long")
    def le32(i: Int) = byteAt(p, i) + byteAt(p, i + 1) * 256 +
      byteAt(p, i + 2) * 65536 + byteAt(p, i + 3) * 16777216
    val isMp4 = hex(substring(p, 5, 4)) === "66747970"
    val isAvi = hex(substring(p, 1, 4)) === "52494646" &&
      hex(substring(p, 9, 4)) === "41564920"
    val timescale = be32(45)
    val durUnits = be32(49)
    val usPerFrame = le32(33)
    val nFrames = le32(49)
    media.select(col("doc_id"),
      when(isMp4, "mp4").when(isAvi, "avi").otherwise("unknown").as("format"),
      when(isMp4, substring(p, 9, 4).cast("string")).as("brand"),
      when(isAvi, nFrames).as("n_frames"),
      when(isMp4, floor(durUnits.cast("double") / timescale * 10000) / 10000)
        .when(isAvi, floor(nFrames.cast("double") * usPerFrame / 1000000 * 10000) / 10000)
        .as("duration_s"))
  }

  /** Deterministic video corpus: even doc_ids synthesize a genuine
    * MP4 ftyp+moov/mvhd prefix (brands isom/mp42 by doc_id mod 4), odd
    * ones a RIFF AVI with an avih main header — column-derived
    * timescale/duration/frame fields, oracle pinned in closed form
    * (an endianness or box-offset bug breaks the hash). */
  def videoHeaders(spark: SparkSession, dir: String): DataFrame = {
    def beHex32(x: org.apache.spark.sql.Column) = lpad(hex(x), 8, "0")
    def leHex(x: org.apache.spark.sql.Column, nBytes: Int) = concat(
      (0 until nBytes).map(b => lpad(hex(shiftright(x, b * 8) % 256), 2, "0")): _*)
    val timescale = (lit(600L) * (lit(1L) + col("n_chars") % 4)).cast("long")
    val durUnits = (col("n_chars") * 25).cast("long")
    val usPerFrame = lit(40000L)
    val nFrames = (col("n_chars") % 1000 + 1).cast("long")
    val mp4Hex = concat(
      lit("00000010" + "66747970"),                       // ftyp box, size 16
      when(col("doc_id") % 4 === 0, "69736F6D").otherwise("6D703432"), // isom | mp42
      lit("00000000"),                                    // minor version
      lit("00000074" + "6D6F6F76"),                       // moov box
      lit("0000006C" + "6D766864" + "00000000"),          // mvhd v0 box
      lit("00000000" + "00000000"),                       // ctime, mtime
      beHex32(timescale), beHex32(durUnits))
    val aviHex = concat(
      lit("52494646"), leHex(lit(248L), 4), lit("41564920"), // RIFF <sz> 'AVI '
      lit("4C495354"), leHex(lit(200L), 4), lit("6864726C"), // LIST <sz> hdrl
      lit("61766968"), leHex(lit(56L), 4),                   // avih <cb>
      leHex(usPerFrame, 4),
      lit("00" * 12),                                        // maxBytesPerSec, padding, flags
      leHex(nFrames, 4))
    load(spark, dir, "documents").select(col("doc_id"),
      unhex(when(col("doc_id") % 2 === 0, mp4Hex).otherwise(aviHex)).as("payload"))
  }

  val videoMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS format,
      |  CASE WHEN doc_id % 2 = 0
      |       THEN (CASE WHEN doc_id % 4 = 0 THEN 'isom' ELSE 'mp42' END) END AS brand,
      |  CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars % 1000 + 1 AS BIGINT) END AS n_frames,
      |  CASE WHEN doc_id % 2 = 0
      |       THEN floor((n_chars * 25)::DOUBLE / (600 * (1 + n_chars % 4)) * 10000) / 10000
      |       ELSE floor((n_chars % 1000 + 1)::DOUBLE * 40000 / 1000000 * 10000) / 10000
      |  END AS duration_s
      |FROM documents""".stripMargin

  /** Perceptual-hash NEAR-DUP over the decoded "pixels" — the image
    * analog of [[graft.operators.DedupOps]]'s simhash text pass, using
    * AVERAGE HASH (aHash, the classic perceptual-hash family member:
    * downscale, threshold each cell against the global mean, pack the
    * bits): 64 two-byte windows over the first 128 payload bytes stand
    * in for the 8×8 downscaled luma grid (swap the window sums for
    * real pixel averages and nothing downstream changes — the
    * [[fakeDecode]] contract), bit i = window i above the global mean.
    *
    * The 64-bit hash is carried as FOUR 16-bit band integers, never a
    * single word (no 2^63 overflow in any engine). Candidate keys use
    * TWO pigeonhole levels: hamming ≤ 3 forces (1) a band with ZERO
    * differing bits AND (2) — since the remaining 48 bits also carry
    * ≤ 3 differences — a clean 12-bit SUB-BAND of those 48. A key is
    * therefore (band, band_value, sub_idx, sub_value): 16 keys per doc
    * instead of 4, but 28 matching bits per key instead of 16 — which
    * collapses the hot-bucket Σn² cost that single-level banding
    * suffers on low-entropy aHash bits (word-soup content concentrates
    * band values exactly like flat images do; the single-level shape
    * measured 154 s at sf0.1, this one ~2 s, zero pairs lost). The
    * join carries doc-id pairs only; band arrays re-attach after the
    * pair distinct, and exact hamming (Σ bit_count(xor)) verifies. */
  def ahashDedup(spark: SparkSession, dir: String): DataFrame = {
    // spread: the per-row hash arithmetic below runs through aggregate
    // HOFs (CodegenFallback) — serial on a single-split corpus otherwise
    val docs = graft.Tables.spread(spark, load(spark, dir, "documents"))
      .filter(length(col("text")) >= 128)
      .select(col("doc_id"), substring(col("text"), 1, 128).as("t"))
    val ws = transform(sequence(lit(0), lit(63)), w =>
      ascii(col("t").substr(w * 2 + 1, lit(1))) + ascii(col("t").substr(w * 2 + 2, lit(1))))
    val banded = docs
      .withColumn("ws", ws)
      .withColumn("total", aggregate(col("ws"), lit(0), (a, x) => a + x))
      .withColumn("bands", transform(sequence(lit(0), lit(3)), b =>
        aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, i) =>
          acc + when(element_at(col("ws"), b * 16 + i + 1) * 64 > col("total"),
            pow(lit(2.0), i).cast("long")).otherwise(lit(0L)))))
      .select(col("doc_id"), col("bands"))
      // three consumers (key explode + both verify joins): compute the
      // HOF-heavy hash once, not three times
      .localCheckpoint(true)
    // rest(b) = the other three bands as one 48-bit value (band order);
    // key = (b, bands[b], s, 12-bit slice s of rest(b)) — 4×4 keys/doc,
    // unrolled statically (16 struct expressions, constant shifts)
    val keyParts: Seq[Column] = for { b <- 0 to 3; s <- 0 to 3 } yield {
      val rest = (0 to 3).filter(_ != b).zipWithIndex.map { case (o, j) =>
        element_at(col("bands"), o + 1) * lit(1L << (16 * j))
      }.reduce(_ + _)
      struct(lit(b).as("k"), element_at(col("bands"), b + 1).as("bv"),
        lit(s).as("sk"), shiftright(rest, 12 * s).bitwiseAND(lit(0xfffL)).as("sv"))
    }
    val keyed = banded
      .select(col("doc_id"), explode(array(keyParts: _*)).as("key"))
      .select(col("doc_id"), col("key.k").as("k"), col("key.bv").as("bv"),
        col("key.sk").as("sk"), col("key.sv").as("sv"))
    val pairs = keyed.select(col("doc_id").as("x"), col("k"), col("bv"), col("sk"), col("sv"))
      .join(keyed.select(col("doc_id").as("y"), col("k"), col("bv"), col("sk"), col("sv")),
        Seq("k", "bv", "sk", "sv"))
      .filter(col("x") < col("y"))
      .select(col("x"), col("y")).distinct()
    val cand = pairs
      .join(banded.select(col("doc_id").as("x"), col("bands").as("ba")), Seq("x"))
      .join(banded.select(col("doc_id").as("y"), col("bands").as("bb")), Seq("y"))
    val hamming = aggregate(sequence(lit(0), lit(3)), lit(0L), (acc, k) =>
      acc + bit_count(element_at(col("ba"), k + 1).bitwiseXOR(element_at(col("bb"), k + 1))))
    cand.withColumn("hamming", hamming)
      .filter(col("hamming") <= 3)
      .select(col("x"), col("y"), col("hamming"))
  }

  val ahashDedupSql: String =
    """WITH d AS (SELECT doc_id, substr(text, 1, 128) AS t FROM documents
      |           WHERE length(text) >= 128),
      |wins AS (
      |  SELECT doc_id,
      |    list_transform(range(64), w ->
      |      ascii(substr(t, CAST(w*2+1 AS INT), 1)) + ascii(substr(t, CAST(w*2+2 AS INT), 1))) AS ws
      |  FROM d
      |),
      |banded AS (
      |  SELECT doc_id,
      |    list_transform(range(4), b ->
      |      CAST(list_sum(list_transform(range(16), i ->
      |        CASE WHEN ws[CAST(b*16+i AS INT)+1]*64 > list_sum(ws)
      |             THEN power(2, i) ELSE 0 END)) AS BIGINT)) AS bands
      |  FROM wins
      |),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y, a.bands AS ba, b.bands AS bb
      |  FROM banded a, banded b, unnest(range(4)) AS u(k)
      |  WHERE a.doc_id < b.doc_id AND a.bands[CAST(k AS INT)+1] = b.bands[CAST(k AS INT)+1]
      |),
      |scored AS (
      |  SELECT x, y,
      |    CAST(list_sum(list_transform(range(4), k ->
      |      bit_count(xor(ba[CAST(k AS INT)+1], bb[CAST(k AS INT)+1])))) AS BIGINT) AS hamming
      |  FROM cand
      |)
      |SELECT x, y, hamming FROM scored WHERE hamming <= 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_ahash_dedup" -> ((s: SparkSession, d: String) => ahashDedup(s, d)),
    "mm_video_meta" -> ((s: SparkSession, d: String) => videoMeta(videoHeaders(s, d))),
    "mm_image_meta" -> ((s: SparkSession, d: String) => imageMeta(imageHeaders(s, d))),
    "mm_audio_meta" -> ((s: SparkSession, d: String) => audioMeta(audioHeaders(s, d))),
    "mm_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d)),
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

  def oracles: Map[String, String] = Map(
    "mm_ahash_dedup" -> ahashDedupSql,
    "mm_video_meta" -> videoMetaSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_binary_meta" -> binaryFeaturesSql,
    "mm_image_meta" -> imageMetaSql,
    "mm_audio_meta" -> audioMetaSql)
}
