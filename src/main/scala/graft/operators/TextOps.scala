package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over the documents corpus — the Spark-native analog of
  * cognee's chunking + token accounting (reference:
  * cognee/modules/chunking/TextChunker.py:12 read()) extended with the
  * training-data-pipeline text metrics the brief mandates (language ID,
  * quality scoring, token counting, fingerprinting).
  *
  * Everything is a narrow projection + higher-order array functions —
  * no UDFs, fully codegen'd, no shuffle except where an aggregation is
  * declared. Cross-engine determinism: hashing is md5 (identical hex in
  * Spark and DuckDB), tokenization is a literal single-space split in
  * both engines (SURVEY.md §4).
  */
object TextOps {

  private def toks: Column = split(col("text"), " ")

  /** Whitespace tokens, regex word tokens, and a BPE-ish chars/4
    * estimate per document (TextChunker counts tokens per chunk the
    * same way before cutting — TextChunker.py read()). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents").select(
      col("doc_id"),
      size(toks).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_word_tokens"),
      ceil(length(col("text")) / 4.0).cast("long").as("est_bpe_tokens"))

  val tokensSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
      |FROM documents""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** Length / stopword-ratio / word-shape quality score per document. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(toks)
    val stopCnt = size(filter(toks, t => t.isInCollection(stopwords)))
    val stopRatio = stopCnt.cast("double") / nWords
    load(spark, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      round(stopRatio, 4).as("stopword_ratio"),
      round((length(col("text")) - nWords + 1).cast("double") / nWords, 4).as("avg_word_len"),
      // floor-truncate, not half-up round: the composite lands on exact
      // .5 decimal boundaries where Spark (decimal-string HALF_UP) and
      // DuckDB (binary round) disagree; floor of the identical double is
      // engine-independent.
      (floor((least(nWords / lit(100.0), lit(1.0)) * 0.7 + least(stopRatio * 5.0, lit(1.0)) * 0.3) * 10000) / 10000)
        .as("quality_score"))
  }

  val qualitySql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  round(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
      |        / len(string_split(text, ' ')), 4) AS stopword_ratio,
      |  round((length(text) - len(string_split(text, ' ')) + 1) * 1.0
      |        / len(string_split(text, ' ')), 4) AS avg_word_len,
      |  floor((least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.7
      |        + least(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
      |                / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3) * 10000) / 10000 AS quality_score
      |FROM documents""".stripMargin

  /** Gopher-style repetition filters (Rae et al. 2021, Table A1 — the
    * repetition-removal rules every large-scale pretraining corpus
    * applies): per document, the fraction of word 2-gram occurrences
    * claimed by the single most frequent 2-gram (`top_bigram_frac`,
    * threshold 0.18) and the fraction of word 3-gram occurrences whose
    * gram repeats (`dup_trigram_frac`, threshold 0.30), plus the
    * composite keep/drop flag.
    *
    * Scale shape: the one honest distributed formulation — explode the
    * grams (≈ 2× token count rows), partial-aggregated (doc, gram)
    * counts, then a per-doc rollup; nothing driver-side, no all-pairs.
    * Fractions are floor-truncated at 4 decimals (the quality-score
    * precedent: floor of an identical double is engine-independent,
    * HALF_UP rounding is not). */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents").select(col("doc_id"), toks.as("toks"))
    def gramStats(n: Int): DataFrame = d
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n)))"))
        .as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as(s"total$n"),
        max(col("c")).as(s"max$n"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as(s"dup$n"))
    def frac4(c: Column): Column = floor(c * 10000) / 10000
    gramStats(2).join(gramStats(3), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("total2").as("n_bigrams"),
        frac4(col("max2").cast("double") / col("total2")).as("top_bigram_frac"),
        frac4(coalesce(col("dup3").cast("double") / col("total3"), lit(0.0))).as("dup_trigram_frac"))
      .withColumn("rep_filtered",
        // The top-bigram test presupposes a long document (Gopher's
        // Table A1 thresholds): with ≤5 bigrams even a zero-repetition
        // doc has top_bigram_frac ≥ 0.2 > 0.18 — so the composite flag
        // only consults it once the doc carries ≥ 20 bigrams, keeping
        // short docs judged by actual duplication, not length.
        ((col("n_bigrams") >= 20 && col("top_bigram_frac") > 0.18)
          || col("dup_trigram_frac") > 0.30).cast("int").cast("long"))
  }

  val repetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS gram
      |  FROM t WHERE len(toks) >= 2
      |),
      |bc AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY 1, 2),
      |bs AS (SELECT doc_id, sum(c) AS total2, max(c) AS max2 FROM bc GROUP BY 1),
      |tg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS gram
      |  FROM t WHERE len(toks) >= 3
      |),
      |tc AS (SELECT doc_id, gram, count(*) AS c FROM tg GROUP BY 1, 2),
      |ts AS (SELECT doc_id, sum(c) AS total3,
      |  sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3 FROM tc GROUP BY 1),
      |f AS (
      |  SELECT bs.doc_id, CAST(total2 AS BIGINT) AS n_bigrams,
      |    floor(max2 * 1.0 / total2 * 10000) / 10000 AS top_bigram_frac,
      |    floor(coalesce(dup3 * 1.0 / total3, 0) * 10000) / 10000 AS dup_trigram_frac
      |  FROM bs LEFT JOIN ts ON bs.doc_id = ts.doc_id
      |)
      |SELECT doc_id, n_bigrams, top_bigram_frac, dup_trigram_frac,
      |  CAST((n_bigrams >= 20 AND top_bigram_frac > 0.18) OR dup_trigram_frac > 0.30 AS BIGINT) AS rep_filtered
      |FROM f""".stripMargin

  /** Stopword-profile language ID (n-gram heuristic): score each
    * language's marker-word count, argmax with a fixed alphabetical
    * tie-break, reported as a confusion matrix against the labeled
    * `lang` column. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    def score(words: Seq[String]): Column =
      if (words.isEmpty) lit(0) else size(filter(toks, t => t.isInCollection(words)))
    val sDe = score(Seq("der", "die", "und"))
    val sEn = score(Seq("the", "a"))
    val sEs = score(Seq("el", "y"))
    val sFr = score(Seq("le", "et"))
    val sZh = score(Seq.empty)
    val predicted =
      when(sDe >= sEn && sDe >= sEs && sDe >= sFr && sDe >= sZh, "de")
        .when(sEn >= sEs && sEn >= sFr && sEn >= sZh, "en")
        .when(sEs >= sFr && sEs >= sZh, "es")
        .when(sFr >= sZh, "fr")
        .otherwise("zh")
    load(spark, dir, "documents")
      .select(col("lang").as("actual"), predicted.as("predicted"))
      .groupBy(col("actual"), col("predicted")).agg(count(lit(1)).as("n"))
  }

  val langIdSql: String =
    """WITH scored AS (
      |  SELECT lang AS actual,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der', 'die', 'und'))) AS s_de,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS s_en,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el', 'y'))) AS s_es,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('le', 'et'))) AS s_fr,
      |    0 AS s_zh
      |  FROM documents
      |)
      |SELECT actual,
      |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |       WHEN s_fr >= s_zh THEN 'fr'
      |       ELSE 'zh' END AS predicted,
      |  count(*) AS n
      |FROM scored GROUP BY 1, 2""".stripMargin

  /** Per-doc content fingerprints — the ingest-identity step
    * (reference: cognee/modules/ingestion/identify.py hashes content
    * to a deterministic id) plus the brief's rolling-hash variants:
    *  - fp_exact: md5 of text (64 bits of hex) — byte identity.
    *  - fp_tokenset: md5 of the sorted distinct token set — survives
    *    word reordering.
    *  - fp_rolling: Karp–Rabin polynomial hash over per-word hash
    *    primitives, h := (h·31 + fold16(md5(w))) mod p — the O(n)
    *    streaming fingerprint; one `aggregate` HOF, no UDF.
    *  - fp_winnow: minimum 5-gram shingle hash (the 1-function
    *    MinHash / winnowing-style fingerprint) — survives edits
    *    outside the minimizing shingle, the near-dup-robust identity.
    * All four are narrow per-row expressions; the oracle replays the
    * identical arithmetic via hex-digit folds. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val p = lit(1000000007L)
    def fold(c: Column, hexChars: Int): Column =
      conv(substring(md5(c), 1, hexChars), 16, 10).cast("long")
    load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), toks.as("tks"))
      .select(
        col("doc_id"),
        substring(md5(col("text")), 1, 16).as("fp_exact"),
        substring(md5(array_join(array_sort(array_distinct(col("tks"))), " ")), 1, 16).as("fp_tokenset"),
        aggregate(col("tks"), lit(0L),
          (acc, w) => (acc * lit(31L) + fold(w, 4)) % p).as("fp_rolling"),
        // guard: under 5 tokens there is no 5-shingle — NULL, matching
        // the oracle's empty range(); an unguarded sequence(0, n-5)
        // would generate a DESCENDING index list and slice() throws on
        // start 0 (SQL arrays are 1-based)
        when(size(col("tks")) >= 5,
          array_min(transform(sequence(lit(0), size(col("tks")) - 5),
            g => fold(array_join(slice(col("tks"), g + 1, lit(5)), " "), 8))))
          .as("fp_winnow"))
  }

  val fingerprintSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  substr(md5(text), 1, 16) AS fp_exact,
      |  substr(md5(array_to_string(list_sort(list_distinct(toks)), ' ')), 1, 16) AS fp_tokenset,
      |  list_reduce(list_transform(toks,
      |    w -> CAST(list_sum(list_transform(range(4),
      |           i -> (strpos('0123456789abcdef', substr(md5(w), CAST(i AS INT) + 1, 1)) - 1)
      |                * power(16, 3 - i))) AS BIGINT)),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling,
      |  list_min(list_transform(range(len(toks) - 4),
      |    g -> CAST(list_sum(list_transform(range(8),
      |           i -> (strpos('0123456789abcdef', substr(md5(array_to_string(toks[CAST(g AS INT) + 1:CAST(g AS INT) + 5], ' ')), CAST(i AS INT) + 1, 1)) - 1)
      |                * power(16, 7 - i))) AS BIGINT))) AS fp_winnow
      |FROM t""".stripMargin

  /** Fixed word-window chunking (W=64): the TextChunker analog. Chunk
    * index derives from an exploded index sequence + array slice — no
    * collect_list ordering hazards, fully deterministic. */
  def chunk(spark: SparkSession, dir: String, window: Int = 64): DataFrame = {
    val nChunks = ceil(size(col("toks")) / lit(window.toDouble)).cast("int")
    load(spark, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("toks"), col("chunk_idx") * window + 1, lit(window))).cast("long").as("n_tokens"),
        md5(array_join(slice(col("toks"), col("chunk_idx") * window + 1, lit(window)), " ")).as("chunk_hash"))
  }

  val chunkSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, toks, unnest(range(CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS chunk_idx
      |  FROM t
      |)
      |SELECT doc_id, chunk_idx,
      |  CAST(len(toks[(chunk_idx * 64 + 1):(chunk_idx * 64 + 64)]) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(toks[(chunk_idx * 64 + 1):(chunk_idx * 64 + 64)], ' ')) AS chunk_hash
      |FROM c""".stripMargin

  /** Overlapping sliding-window chunking (window W, stride S < W): the
    * training-data variant of [[chunk]] where consecutive chunks share
    * W−S tokens so no context is lost at boundaries. This is also the
    * reference's LangchainChunker (chunking/LangchainChunker.py:30):
    * RecursiveCharacterTextSplitter with its word-count length_function
    * over a single-separator corpus merges fixed-length word units
    * greedily with a chunk_overlap carry — exactly a sliding window of
    * chunk_size words at stride chunk_size−overlap. Chunk start
    * positions are 0, S, 2S, … while a full window still fits (plus one
    * tail chunk); same explode-the-index shape, no collect, no overlap
    * materialized twice beyond the slices themselves. */
  def chunkOverlap(spark: SparkSession, dir: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    // number of stride steps: 1 + ceil(max(n - window, 0) / stride)
    val n = size(col("toks"))
    val nChunks = (lit(1) + ceil(greatest(n - window, lit(0)) / lit(stride.toDouble)).cast("int"))
    load(spark, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        size(slice(col("toks"), col("chunk_idx") * stride + 1, lit(window))).cast("long").as("n_tokens"),
        md5(array_join(slice(col("toks"), col("chunk_idx") * stride + 1, lit(window)), " ")).as("chunk_hash"))
  }

  val chunkOverlapSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, toks,
      |    unnest(range(1 + CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS BIGINT))) AS chunk_idx
      |  FROM t
      |)
      |SELECT doc_id, chunk_idx,
      |  chunk_idx * 48 AS start_tok,
      |  CAST(len(toks[(chunk_idx * 48 + 1):(chunk_idx * 48 + 64)]) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(toks[(chunk_idx * 48 + 1):(chunk_idx * 48 + 64)], ' ')) AS chunk_hash
      |FROM c""".stripMargin

  /** Greedy sentence-accumulation chunking — the reference's
    * paragraph chunker (cognee/tasks/chunks/chunk_by_paragraph.py:7:
    * sentences accumulate into a chunk until adding the NEXT sentence
    * would exceed max_chunk_size, then the chunk cuts on the sentence
    * boundary; sentence units come from chunk_by_sentence.py:32 over
    * chunk_by_word.py's SENTENCE_ENDINGS). DELIBERATE DIVERGENCE: the
    * reference passes max_chunk_size into chunk_by_sentence, which cuts
    * an oversized sentence at maximum_size so no chunk ever exceeds it;
    * here an oversized single sentence is kept whole as its own chunk
    * (cut_type='oversize') — boundary preservation is traded for the
    * size cap, and Spark, oracle, and specs all agree on this choice.
    * The synthetic corpus has no
    * punctuation, so the sentence-boundary rule is a deterministic
    * stand-in (the fakeDecode precedent): a token ends a sentence iff
    * fold16(md5(token)) % 7 == 0; the last token always ends one.
    *
    * Shape, and why it scales: tokens explode to rows once; sentence
    * ids are a running flag-sum windowed PER DOCUMENT (bounded
    * partitions — the same "a document fits in memory" contract the
    * reference's generator loop has); sentences group back; the greedy
    * fold is inherently sequential per doc, so it runs as one
    * `aggregate` HOF over each doc's (small) sentence array, never on
    * the driver. Emits one row per chunk with the boundary-preserving
    * guarantee: concatenating a doc's chunks in order reproduces the
    * token stream exactly (spec-pinned).
    */
  def chunkParagraph(spark: SparkSession, dir: String, maxSize: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isEnd = conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long") % 7 === 0
    val toksRows = load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sentTok = toksRows.withColumn("sid",
      coalesce(sum(when(isEnd, 1L).otherwise(0L)).over(byDoc), lit(0L)))
    val sentences = sentTok.groupBy(col("doc_id"), col("sid"))
      .agg(count(lit(1)).as("stoks"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("stext"))
    // Per-doc greedy fold: bounds = the sentence ids where a new chunk
    // starts (chunk 0 implicitly starts at the first sentence).
    val perDoc = sentences.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("sid"), col("stoks"), col("stext")))).as("sents"))
      .withColumn("bounds",
        aggregate(
          col("sents"),
          struct(array().cast("array<bigint>").as("bs"), lit(0L).as("cur")),
          (acc, s) => {
            val cut = acc.getField("cur") > 0 && acc.getField("cur") + s.getField("stoks") > maxSize
            struct(
              when(cut, concat(acc.getField("bs"), array(s.getField("sid"))))
                .otherwise(acc.getField("bs")).as("bs"),
              when(cut, s.getField("stoks"))
                .otherwise(acc.getField("cur") + s.getField("stoks")).as("cur"))
          },
          acc => acc.getField("bs")))
    perDoc
      .select(col("doc_id"), col("bounds"), explode(col("sents")).as("s"))
      .select(col("doc_id"),
        size(filter(col("bounds"), b => b <= col("s.sid"))).cast("long").as("chunk_idx"),
        col("s.sid").as("sid"), col("s.stoks").as("stoks"), col("s.stext").as("stext"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        count(lit(1)).as("n_sentences"),
        sum(col("stoks")).as("n_tokens"),
        md5(array_join(transform(array_sort(collect_list(struct(col("sid"), col("stext")))),
          x => x.getField("stext")), " ")).as("chunk_hash"))
      .select(col("doc_id"), col("chunk_idx"), col("n_sentences"), col("n_tokens"),
        col("chunk_hash"),
        when(col("n_tokens") > maxSize, "oversize").otherwise("fit").as("cut_type"))
  }

  val chunkParagraphSql: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |),
      |tok AS (
      |  SELECT doc_id, CAST(u AS BIGINT) AS pos, toks[CAST(u AS INT) + 1] AS tok
      |  FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS u FROM t)
      |),
      |flagged AS (
      |  SELECT doc_id, pos, tok,
      |    CASE WHEN CAST(list_sum(list_transform(range(4),
      |        i -> (strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT) + 1, 1)) - 1)
      |             * power(16, 3 - i))) AS BIGINT) % 7 = 0 THEN 1 ELSE 0 END AS flag
      |  FROM tok
      |),
      |sent_tok AS (
      |  SELECT doc_id, pos, tok,
      |    COALESCE(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sid
      |  FROM flagged
      |),
      |sentences AS (
      |  SELECT doc_id, sid, count(*) AS stoks,
      |    string_agg(tok, ' ' ORDER BY pos) AS stext,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY sid) AS i
      |  FROM sent_tok GROUP BY doc_id, sid
      |),
      |r AS (
      |  SELECT doc_id, i, sid, stoks, stext, CAST(0 AS BIGINT) AS chunk_idx, stoks AS cur
      |  FROM sentences WHERE i = 1
      |  UNION ALL
      |  SELECT s.doc_id, s.i, s.sid, s.stoks, s.stext,
      |    CASE WHEN r.cur + s.stoks > 32 THEN r.chunk_idx + 1 ELSE r.chunk_idx END,
      |    CASE WHEN r.cur + s.stoks > 32 THEN s.stoks ELSE r.cur + s.stoks END
      |  FROM r JOIN sentences s ON s.doc_id = r.doc_id AND s.i = r.i + 1
      |)
      |SELECT doc_id, chunk_idx,
      |  count(*) AS n_sentences,
      |  CAST(sum(stoks) AS BIGINT) AS n_tokens,
      |  md5(string_agg(stext, ' ' ORDER BY sid)) AS chunk_hash,
      |  CASE WHEN sum(stoks) > 32 THEN 'oversize' ELSE 'fit' END AS cut_type
      |FROM r GROUP BY doc_id, chunk_idx""".stripMargin

  /** Typed regex entity extraction (reference: cognee/tasks/
    * entity_completion/entity_extractors/regex_entity_extractor.py:12 +
    * regex_entity_config.json — one compiled pattern per entity type,
    * finditer over the text, entities tagged with their type). The
    * synthetic corpus carries no emails/dates/amounts, so the text under
    * extraction is a deterministic per-doc metadata line derived from
    * real columns (the fakeDecode precedent); the extraction machinery —
    * per-type regexp_extract_all, explode, type tag — is the real
    * operator and runs unchanged on natural text. Patterns use explicit
    * ASCII classes only, so Java (Spark) and RE2 (DuckDB) agree. */
  def entityExtract(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq( // (entity_type, pattern) — regex_entity_config.json rows
      "EMAIL" -> "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
      "DATE" -> "[0-9]{4}-[0-9]{2}-[0-9]{2}",
      "MONEY" -> "\\$[0-9]+\\.[0-9]{2}")
    val line = concat(
      lit("contact u"), col("doc_id"), lit("@example.com on 2024-01-"),
      lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
      lit(" cost $"), col("n_chars"), lit(".00"))
    val base = load(spark, dir, "documents").select(col("doc_id"), line.as("meta"))
    types.map { case (t, re) =>
      base.select(col("doc_id"), lit(t).as("entity_type"),
        explode(regexp_extract_all(col("meta"), lit(re), lit(0))).as("entity"))
    }.reduce(_ union _)
  }

  /** Unigram negative-log-likelihood quality proxy — the corpus-LM
    * perplexity filter (CCNet-style) with the LM reduced to the
    * corpus's own unigram distribution: per doc, avg −ln p(w) where
    * p(w) = count(w)/total. Low = stereotypical text, high = rare-token
    * noise; the standard cheap perplexity stand-in when no trained LM
    * ships with the engine.
    *
    * Scale shape: one explode + one keyed (word) aggregation for the
    * vocabulary, a keyed join back (never broadcast — vocabularies are
    * corpus-sized), a 1-row total broadcast, and a per-doc rollup.
    * Floor-truncated (summation-order-proof). */
  def unigramNll(spark: SparkSession, dir: String): DataFrame = {
    val words = load(spark, dir, "documents").select(col("doc_id"), explode(toks).as("w"))
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("total"))
    words.join(vocab, Seq("w"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg((floor(avg(log(col("total") * 1.0 / col("c"))) * 10000) / 10000).as("nll"))
  }

  val unigramNllSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |v AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
      |t AS (SELECT sum(c) AS total FROM v)
      |SELECT doc_id, floor(avg(ln(total * 1.0 / c)) * 10000) / 10000 AS nll
      |FROM w JOIN v USING (w), t GROUP BY doc_id""".stripMargin

  /** Interpolated BIGRAM negative-log-likelihood — the CCNet/KenLM
    * perplexity filter one order up from [[unigramNll]]: per doc,
    * avg −ln P(wᵢ | wᵢ₋₁) with Jelinek–Mercer interpolation
    * P = λ·c(a,b)/c(a·) + (1−λ)·c(b)/total (λ = 0.75; c(a·) is the
    * bigram-table prefix marginal), the LM trained on the corpus
    * itself, so every observed bigram has mass and the score is fully
    * deterministic — no external model file.
    *
    * Scale shape: one position-explode into bigram pairs, keyed
    * aggregations for the bigram table and its prefix marginal
    * (map-side partial), KEYED joins back on (a,b) / a / b — LM tables
    * are corpus-sized, never broadcast — one 1-row total broadcast,
    * and a per-doc rollup. No windows, no driver loops; hot prefixes
    * shard naturally because the join key (a,b) carries the successor. */
  def bigramNll(spark: SparkSession, dir: String, lambda: Double = 0.75): DataFrame = {
    val pairsCol = transform(sequence(lit(1), size(toks) - 1), i =>
      struct(element_at(toks, i).as("a"), element_at(toks, i + 1).as("b")))
    // ONE tokenize+explode pass folded straight to per-(doc, a, b)
    // counts (the curate_dsir lesson: the r10 plan re-ran the pair
    // explode for the LM aggregation AND the rollup, and shuffled
    // per-OCCURRENCE rows through three string-keyed joins). The
    // bounded distinct-pairs-per-doc relation localCheckpoints for its
    // two consumers; the per-doc avg becomes the n-weighted mean,
    // equal to the per-occurrence average well under the 4dp floor.
    // Expansion parallelism (the vec_knn_graph lesson, via the
    // scale-aware [[graft.Tables.spread]] pin).
    val docBg = graft.Tables.spread(spark, load(spark, dir, "documents"))
      .filter(size(toks) >= 2)
      .select(col("doc_id"), explode(pairsCol).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("doc_id"), col("a"), col("b")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val bg = docBg.groupBy(col("a"), col("b")).agg(sum(col("n")).as("cab"))
    val pf = bg.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val words = load(spark, dir, "documents").select(explode(toks).as("w"))
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("total"))
    val nll = -log(lit(lambda) * col("cab") / col("ca")
      + lit(1.0 - lambda) * col("c") / col("total"))
    docBg.join(bg, Seq("a", "b")).join(pf, Seq("a"))
      .join(vocab.withColumnRenamed("w", "b"), Seq("b"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg((floor(sum(col("n") * nll) / sum(col("n")) * 10000) / 10000).as("bigram_nll"))
  }

  val bigramNllSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |pairs AS (SELECT doc_id, ts[CAST(i AS INT)] AS a, ts[CAST(i AS INT) + 1] AS b
      |          FROM d, unnest(range(1, len(ts))) AS u(i)),
      |bg AS (SELECT a, b, count(*) AS cab FROM pairs GROUP BY 1, 2),
      |pf AS (SELECT a, sum(cab) AS ca FROM bg GROUP BY 1),
      |v AS (SELECT w, count(*) AS c
      |      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1),
      |t AS (SELECT sum(c) AS total FROM v)
      |SELECT doc_id,
      |  floor(avg(-ln(0.75 * cab / ca + 0.25 * c / total)) * 10000) / 10000 AS bigram_nll
      |FROM pairs JOIN bg USING (a, b) JOIN pf USING (a) JOIN v ON v.w = pairs.b, t
      |GROUP BY doc_id""".stripMargin

  /** Per-document top-k TF-IDF keywords — the keyword-extraction
    * primitive a document-processing pipeline exposes next to
    * [[quality]] and [[fingerprint]] (and the deterministic stand-in
    * for the reference's LLM keyword extraction). tf is the in-doc
    * term count, idf = ln(N/df) with df the containing-doc count; the
    * score floor-truncates at 4dp BEFORE the per-doc rank (stable
    * under last-ulp ln differences), ties break on the token. Two
    * keyed aggregations reusing one explode, the corpus size as a
    * 1-row broadcast, and a per-doc window rank — the
    * [[unigramNll]] scale shape. */
  def tfidfKeywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = load(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    // spread before the token explode: expansion work must parallelize
    // even when the corpus arrives in one split (AQE can't see the
    // explode's output size at plan time)
    val tf = graft.Tables.spread(spark, load(spark, dir, "documents"))
      .select(col("doc_id"), explode(toks).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("w").asc)
    tf.join(dfreq, Seq("w")).crossJoin(broadcast(nDocs))
      .withColumn("score",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 10000) / 10000)
      .withColumn("rank", row_number().over(byDoc).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("w").as("keyword"), col("score"))
  }

  val tfidfKeywordsSql: String =
    """WITH n AS (SELECT count(*) AS n_docs FROM documents),
      |tf AS (
      |  SELECT doc_id, w, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |  ) GROUP BY 1, 2
      |),
      |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, w,
      |    floor(tf * ln(n_docs::DOUBLE / df) * 10000) / 10000 AS score
      |  FROM tf JOIN dfreq USING (w), n
      |),
      |ranked AS (
      |  SELECT doc_id, w, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w ASC) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, w AS keyword, score FROM ranked WHERE rank <= 3""".stripMargin

  /** Corpus bigram statistics — the n-gram frequency table a
    * tokenizer/vocabulary pipeline derives before merges are chosen
    * (BPE seeding, collocation mining): occurrence and document
    * frequency of every adjacent word pair, top-50. Bigrams are built
    * IN-ROW with an index-aware `transform` over the token array (no
    * self-join, no window) and only then exploded into the keyed
    * count — one explode + one aggregation, the [[unigramNll]] scale
    * shape with the vocabulary keyed by pair. */
  def ngramStats(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    // spread before the bigram explode (single-split corpora otherwise
    // expand in one task)
    val bigram = graft.Tables.spread(spark, load(spark, dir, "documents"))
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), (x, i) -> concat(x, ' ', element_at(t, i + 2)))"))
        .as("bigram"))
    bigram.groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("bigram").asc).limit(k)
  }

  val ngramStatsSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |b AS (
      |  SELECT doc_id, t[g] || ' ' || t[g + 1] AS bigram
      |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g) i
      |)
      |SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM b GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 50""".stripMargin

  /** PII redaction — the training-corpus scrubbing pass every
    * pretraining pipeline runs before the tokenizer (emails, dates,
    * money amounts masked to typed placeholders). Runs over the same
    * deterministic metadata-line stand-in corpus as
    * [[entityExtract]] (the testdata has no natural PII), so every
    * pattern fires and the redaction count is verifiable. One narrow
    * map — three chained regexp_replace + match counts, zero shuffles,
    * fully codegen'd. */
  def redact(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val date = "[0-9]{4}-[0-9]{2}-[0-9]{2}"
    val money = "\\$[0-9]+\\.[0-9]{2}"
    val line = concat(
      lit("contact u"), col("doc_id"), lit("@example.com on 2024-01-"),
      lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
      lit(" cost $"), col("n_chars"), lit(".00"))
    val nMatches = Seq(email, date, money)
      .map(re => size(regexp_extract_all(line, lit(re), lit(0))).cast("long"))
      .reduce(_ + _)
    load(spark, dir, "documents").select(
      col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(line,
        email, "[EMAIL]"), date, "[DATE]"), money, "[MONEY]").as("redacted"),
      nMatches.as("n_redacted"))
  }

  val redactSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    'contact u' || doc_id || '@example.com on 2024-01-' ||
      |    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
      |    ' cost $' || n_chars || '.00' AS meta
      |  FROM documents
      |)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(meta,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |    '[0-9]{4}-[0-9]{2}-[0-9]{2}', '[DATE]', 'g'),
      |    '\$[0-9]+\.[0-9]{2}', '[MONEY]', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(meta, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
      |     + len(regexp_extract_all(meta, '[0-9]{4}-[0-9]{2}-[0-9]{2}'))
      |     + len(regexp_extract_all(meta, '\$[0-9]+\.[0-9]{2}')) AS BIGINT) AS n_redacted
      |FROM base""".stripMargin

  val entityExtractSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    'contact u' || doc_id || '@example.com on 2024-01-' ||
      |    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
      |    ' cost $' || n_chars || '.00' AS meta
      |  FROM documents
      |)
      |SELECT doc_id, 'EMAIL' AS entity_type,
      |  unnest(regexp_extract_all(meta, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS entity
      |FROM base
      |UNION ALL
      |SELECT doc_id, 'DATE',
      |  unnest(regexp_extract_all(meta, '[0-9]{4}-[0-9]{2}-[0-9]{2}'))
      |FROM base
      |UNION ALL
      |SELECT doc_id, 'MONEY',
      |  unnest(regexp_extract_all(meta, '\$[0-9]+\.[0-9]{2}'))
      |FROM base""".stripMargin

  /** Cascade graph extraction — the deterministic skeleton of the
    * reference's multi-round extraction pipeline
    * (tasks/graph/cascade_extract/utils/extract_nodes.py:15 — n_rounds
    * of node proposals, each accepted only if its LOWERCASED name is
    * new (first round wins);
    * extract_content_nodes_and_relationship_names.py:16 — a second pass
    * widens the node set and accumulates relationship names under the
    * same case-insensitive first-wins rule;
    * extract_edge_triplets.py:9 — edge proposals are DROPPED unless
    * both endpoint ids were accepted as nodes, and dedup on the full
    * (source, target, relationship) triplet).
    *
    * The LLM proposer is replaced by deterministic rules with the same
    * contract (the fakeDecode/md5-fold precedent): pass 1 proposes
    * tokens of length ≥ 3, pass 2 adds length-2 tokens, a token's round
    * is fold16(md5(token)) % n_rounds (so acceptance ORDER follows
    * (round, position), which the oracle replays), relationship names
    * are tokens of length ≥ 7, and edges are proposed between ADJACENT
    * raw tokens — so proposals whose endpoint was never accepted
    * (length-1 noise) exercise the reference's endpoint filter — with
    * rel = the source token when it is a relationship name, else
    * related_to.
    *
    * Scale shape: everything is in-row HOF arithmetic over each doc's
    * own token array (the per-document-fold contract of §5) — one
    * narrow map stage, zero shuffles, zero UDFs. */
  def entityCascade(spark: SparkSession, dir: String, nRounds: Int = 2): DataFrame = {
    val low = transform(split(col("text"), " "), t => lower(t))
    def roundOf(t: Column) =
      conv(substring(md5(t), 1, 4), 16, 10).cast("long") % nRounds
    val proposals = filter(
      transform(low, (t, i) => struct(
        roundOf(t).as("r"), i.cast("long").as("pos"), t.as("tok"))),
      p => length(p.getField("tok")) >= 2)
    val pairs = zip_with(low,
      slice(low, lit(2), greatest(size(low) - 1, lit(0))),
      (a, b) => struct(a.as("src"), b.as("dst")))
    val kept = array_distinct(transform(
      filter(pairs, p => p.getField("dst").isNotNull &&
        length(p.getField("src")) >= 2 && length(p.getField("dst")) >= 2),
      p => struct(p.getField("src").as("src"), p.getField("dst").as("dst"),
        when(length(p.getField("src")) >= 7, p.getField("src"))
          .otherwise(lit("related_to")).as("rel"))))
    load(spark, dir, "documents")
      .select(col("doc_id"),
        array_min(proposals).getField("tok").as("first_node"),
        size(array_distinct(transform(proposals, p => p.getField("tok"))))
          .cast("long").as("n_nodes"),
        size(array_distinct(transform(kept, e => e.getField("rel"))))
          .cast("long").as("n_rels"),
        size(kept).cast("long").as("n_edges"))
  }

  val entityCascadeSql: String =
    """WITH t AS (SELECT doc_id, list_transform(string_split(text, ' '), x -> lower(x)) AS low FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos, low[CAST(i AS INT) + 1] AS tok
      |  FROM t, unnest(range(len(low))) AS u(i)
      |),
      |f AS (
      |  SELECT doc_id, pos, tok,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) % 2 AS r
      |  FROM tok WHERE len(tok) >= 2
      |),
      |firsts AS (SELECT doc_id, tok AS first_node FROM (
      |  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY r, pos, tok) AS rn
      |  FROM f) WHERE rn = 1),
      |nodes AS (SELECT doc_id, count(DISTINCT tok) AS n_nodes FROM f GROUP BY 1),
      |rawp AS (SELECT doc_id, pos, tok AS src,
      |           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS dst FROM tok),
      |kept AS (SELECT DISTINCT doc_id, src, dst,
      |           CASE WHEN len(src) >= 7 THEN src ELSE 'related_to' END AS rel
      |         FROM rawp WHERE dst IS NOT NULL AND len(src) >= 2 AND len(dst) >= 2),
      |edges AS (SELECT doc_id, count(*) AS n_edges, count(DISTINCT rel) AS n_rels
      |          FROM kept GROUP BY 1)
      |SELECT d.doc_id, f.first_node,
      |  coalesce(n.n_nodes, 0) AS n_nodes,
      |  coalesce(e.n_rels, 0) AS n_rels,
      |  coalesce(e.n_edges, 0) AS n_edges
      |FROM documents d
      |LEFT JOIN firsts f USING (doc_id)
      |LEFT JOIN nodes n USING (doc_id)
      |LEFT JOIN edges e USING (doc_id)""".stripMargin

  /** Time-anchored event extraction from document text — the
    * deterministic skeleton of the reference's temporal-graph pipeline
    * (tasks/temporal_graph/extract_events_and_entities.py: an LLM pulls
    * Event{name, time_from, ...} rows out of each chunk;
    * tasks/temporal_graph/models.py Timestamp defaults unknown fields;
    * generate_event_datapoint.py shapes the datapoint). The LLM call is
    * out of scope per the brief, so trigger and anchor are md5 folds
    * (the fakeDecode precedent, replayed bit-identically by the oracle):
    * a token NAMES an event iff fold16(md5(token)) % 11 == 0, and the
    * event's Timestamp anchors inside January 2024 by a fold of
    * (doc_id, position). One row per event occurrence — (doc_id, pos,
    * event, ts_sec, day) — the relation the search_temporal /
    * search_temporal_graph window queries consume (spec-pinned).
    * The extraction machinery (tokenize → posexplode → filter → anchor)
    * is the real distributed operator and runs unchanged when an
    * upstream extractor provides real triggers/timestamps. */
  def temporalExtract(spark: SparkSession, dir: String): DataFrame =
    temporalExtractFrom(load(spark, dir, "documents"))

  /** Extraction body over ANY (doc_id, text) relation — stateless row
    * arithmetic, so the streaming twin (EventStream.temporalExtractStream)
    * reuses it unchanged on a streaming frame. */
  private[graft] def temporalExtractFrom(docs: DataFrame): DataFrame = {
    def fold(c: Column, hexChars: Int): Column =
      conv(substring(md5(c), 1, hexChars), 16, 10).cast("long")
    val jan1 = lit(1704067200L) // 2024-01-01 00:00:00 UTC
    val monthSecs = lit(2678400L) // 31 days
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(fold(col("tok"), 4) % 11 === 0)
      .select(col("doc_id"), col("pos"), col("tok").as("event"),
        (jan1 + fold(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string")), 8) % monthSecs).as("ts_sec"))
      .withColumn("day", from_unixtime(col("ts_sec"), "yyyy-MM-dd"))
  }

  val temporalExtractSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos, toks[CAST(i AS INT) + 1] AS tok
      |  FROM t, unnest(range(len(toks))) AS u(i)
      |),
      |f AS (
      |  SELECT doc_id, pos, tok,
      |    CAST(list_sum(list_transform(range(4),
      |      i -> (strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 3 - i))) AS BIGINT) AS h4,
      |    CAST(list_sum(list_transform(range(8),
      |      i -> (strpos('0123456789abcdef', substr(md5(doc_id || ':' || pos), CAST(i AS INT) + 1, 1)) - 1)
      |           * power(16, 7 - i))) AS BIGINT) AS h8
      |  FROM tok
      |)
      |SELECT doc_id, pos, tok AS event,
      |  1704067200 + (h8 % 2678400) AS ts_sec,
      |  strftime(TIMESTAMP '2024-01-01 00:00:00' + ((h8 % 2678400) * INTERVAL 1 SECOND), '%Y-%m-%d') AS day
      |FROM f WHERE h4 % 11 = 0""".stripMargin

  /** CROSS-DOC duplicate-content fraction — the corpus-level companion
    * to [[repetition]]'s within-doc Gopher filters (the Dolma/Gopher
    * "fraction of characters in duplicate n-grams" quality signal):
    * for each document, the fraction of its distinct 8-gram shingles
    * that also occur in at least one OTHER document. High-fraction docs
    * are templated/mirrored content a pretraining curation pass
    * down-weights even when no single pair crosses a dedup threshold.
    *
    * Scale shape: per-doc DISTINCT shingling in-row (the
    * [[graft.operators.CurateOps.decontaminate]] inverted-index shape),
    * one shingle-keyed aggregate for global doc-frequency (map-side
    * partial — a hot boilerplate shingle folds per-partition, no hot
    * reducer), one equi-join of the per-doc shingle list back onto the
    * df≥2 flag (Catalyst reuses the shingle exchange), one doc-keyed
    * rollup. No pairwise anything: cost is O(total shingles), the same
    * class as exact decontamination. Docs under 8 tokens carry no
    * shingles and report 0 duplicated fraction over 0 shingles. */
  def dupFraction(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    // spread before the 8-shingle explode — the corpus-sized expansion
    // stage, not the scan, is the work here
    val exploded = graft.Tables.spread(spark, docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 8),
          i => array_join(slice(col("toks"), i + 1, lit(8)), " ")))).as("shingle"))
    val df2 = exploded.groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("shingle"))
    val perDoc = exploded.join(df2.withColumn("dup", lit(1L)), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)) /
          greatest(coalesce(col("n_shingles"), lit(0L)), lit(1L)), 4).as("dup_frac"))
  }

  val dupFractionSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8
      |),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[(i + 1):(i + 8)], ' ') AS shingle
      |  FROM t, unnest(range(len(toks) - 7)) AS u(i)
      |),
      |df AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 2),
      |per_doc AS (
      |  SELECT sh.doc_id, count(*) AS n_shingles,
      |    CAST(sum(CASE WHEN df.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      |  FROM sh LEFT JOIN df ON sh.shingle = df.shingle
      |  GROUP BY sh.doc_id
      |)
      |SELECT d.doc_id, d.source,
      |  coalesce(p.n_shingles, 0) AS n_shingles,
      |  coalesce(p.n_dup, 0) AS n_dup,
      |  round(coalesce(p.n_dup, 0) * 1.0 / greatest(coalesce(p.n_shingles, 0), 1), 4) AS dup_frac
      |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin

  /** Token-distribution Shannon entropy per document — the vocabulary-
    * diversity quality signal (low entropy = keyword-stuffed / looping
    * generation, the repetition family's information-theoretic twin;
    * normalized entropy H/ln(n_distinct) ∈ [0,1] compares documents of
    * different lengths). Uses the identity H = ln(n) − (Σ c·ln c)/n so
    * the whole score is ONE keyed (doc_id, token) count plus one
    * per-doc aggregation — no second pass over tokens, no windows.
    * Floor-truncated at 4dp ([[unigramNll]] rule); single-token docs
    * define norm_entropy = 0 (ln(1) denominator guarded). */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = load(spark, dir, "documents")
      .select(col("doc_id"), explode(toks).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c") * log(col("c"))).as("s"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        (floor((log(col("n")) - col("s") / col("n")) * 10000) / 10000).as("entropy"),
        when(col("n_distinct") <= 1, lit(0.0))
          .otherwise(floor((log(col("n")) - col("s") / col("n"))
            / log(col("n_distinct").cast("double")) * 10000) / 10000)
          .as("norm_entropy"))
  }

  val tokenEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1, 2
      |),
      |agg AS (
      |  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct, sum(c * ln(c)) AS s
      |  FROM c GROUP BY 1
      |)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_distinct,
      |  floor((ln(n) - s / n) * 10000) / 10000 AS entropy,
      |  CASE WHEN n_distinct <= 1 THEN 0.0
      |       ELSE floor((ln(n) - s / n) / ln(n_distinct::DOUBLE) * 10000) / 10000
      |  END AS norm_entropy
      |FROM agg""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_entropy" -> ((s: SparkSession, d: String) => tokenEntropy(s, d)),
    "entity_extract_cascade" -> ((s: SparkSession, d: String) => entityCascade(s, d)),
    "temporal_extract" -> ((s: SparkSession, d: String) => temporalExtract(s, d)),
    "text_dup_fraction" -> ((s: SparkSession, d: String) => dupFraction(s, d)),
    "entity_extract_regex" -> ((s: SparkSession, d: String) => entityExtract(s, d)),
    "text_chunk_paragraph" -> ((s: SparkSession, d: String) => chunkParagraph(s, d)),
    "text_chunk_overlap" -> ((s: SparkSession, d: String) => chunkOverlap(s, d)),
    "text_tokens" -> ((s: SparkSession, d: String) => tokens(s, d)),
    "text_quality" -> ((s: SparkSession, d: String) => quality(s, d)),
    "text_repetition" -> ((s: SparkSession, d: String) => repetition(s, d)),
    "text_redact" -> ((s: SparkSession, d: String) => redact(s, d)),
    "text_tfidf_keywords" -> ((s: SparkSession, d: String) => tfidfKeywords(s, d)),
    "text_unigram_nll" -> ((s: SparkSession, d: String) => unigramNll(s, d)),
    "text_bigram_nll" -> ((s: SparkSession, d: String) => bigramNll(s, d)),
    "text_ngram_stats" -> ((s: SparkSession, d: String) => ngramStats(s, d)),
    "text_langid" -> ((s: SparkSession, d: String) => langId(s, d)),
    "text_fingerprint" -> ((s: SparkSession, d: String) => fingerprint(s, d)),
    "text_chunk" -> ((s: SparkSession, d: String) => chunk(s, d)))

  def oracles: Map[String, String] = Map(
    "text_token_entropy" -> tokenEntropySql,
    "text_dup_fraction" -> dupFractionSql,
    "entity_extract_cascade" -> entityCascadeSql,
    "temporal_extract" -> temporalExtractSql,
    "entity_extract_regex" -> entityExtractSql,
    "text_chunk_paragraph" -> chunkParagraphSql,
    "text_chunk_overlap" -> chunkOverlapSql,
    "text_tokens" -> tokensSql,
    "text_quality" -> qualitySql,
    "text_repetition" -> repetitionSql,
    "text_redact" -> redactSql,
    "text_tfidf_keywords" -> tfidfKeywordsSql,
    "text_unigram_nll" -> unigramNllSql,
    "text_bigram_nll" -> bigramNllSql,
    "text_ngram_stats" -> ngramStatsSql,
    "text_langid" -> langIdSql,
    "text_fingerprint" -> fingerprintSql,
    "text_chunk" -> chunkSql)
}
