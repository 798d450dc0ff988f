package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repo dependency-graph construction — the Spark re-expression of the
  * reference's code-graph pipeline
  * (cognee/tasks/repo_processor/get_repo_file_dependencies.py: scan
  * source files → parse each file's imports → resolve import names to
  * repo files → CodeFile nodes with depends_on edges).
  *
  * The parse step is a per-file extraction (reference does it with an
  * AST walk; here the deterministic code-corpus projection's "import
  * block" is the file's first 8 tokens) and resolution is an
  * inverted-index equi-join on the imported name — never a pairwise
  * file comparison, so the shape survives a repo of any size: one
  * explode + count per side, one window partitioned by token, one
  * equi-join on the token key.
  */
object CodeGraphOps {

  /** (file_id, tok) — each file's imported names: the distinct tokens
    * of its header block (the import-statement stand-in). */
  private def imports(files: DataFrame): DataFrame =
    files.select(col("file_id"),
      explode(array_distinct(slice(split(col("body"), " "), 1, 8))).as("tok"))

  /** (tok, provider) — which file "provides" each name: the file using
    * it most (ties to the smallest file id), i.e. the definition-site
    * resolution of get_local_dependencies, computed with one count
    * aggregate and a token-partitioned rank. */
  private def providers(files: DataFrame): DataFrame = {
    val occ = files.select(col("file_id"), explode(split(col("body"), " ")).as("tok"))
      .groupBy(col("tok"), col("file_id")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("tok")).orderBy(col("c").desc, col("file_id").asc)
    occ.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("tok"), col("file_id").as("provider"))
  }

  /** depends_on edge list + per-file fan-out/fan-in, top-20 most
    * depended-on files (get_repo_file_dependencies output shape:
    * CodeFile nodes carrying their dependency degree). */
  def dependencies(spark: SparkSession, dir: String): DataFrame = {
    val files = Retrievers.codeTable(spark, dir)
    val edges = imports(files).join(providers(files), Seq("tok"))
      .filter(col("file_id") =!= col("provider"))
      .select(col("file_id"), col("provider")).distinct()
    val outDeg = edges.groupBy(col("file_id")).agg(count(lit(1)).as("n_imports"))
    val inDeg = edges.groupBy(col("provider").as("file_id"))
      .agg(count(lit(1)).as("n_importers"))
    files.select(col("file_id"), col("path"))
      .join(outDeg, Seq("file_id"), "left")
      .join(inDeg, Seq("file_id"), "left")
      .select(col("file_id"), col("path"),
        coalesce(col("n_imports"), lit(0L)).as("n_imports"),
        coalesce(col("n_importers"), lit(0L)).as("n_importers"))
      .orderBy(col("n_importers").desc, col("file_id").asc).limit(20)
  }

  val dependenciesSql: String =
    s"""WITH ${Retrievers.codeTableSql},
       |toks AS (SELECT file_id, string_split(body, ' ') AS ts FROM code),
       |imports AS (SELECT DISTINCT file_id, unnest(list_distinct(ts[1:8])) AS tok FROM toks),
       |cnts AS (SELECT tok, file_id, count(*) AS c
       |         FROM (SELECT file_id, unnest(ts) AS tok FROM toks) GROUP BY 1, 2),
       |prov AS (SELECT tok, file_id AS provider FROM (
       |           SELECT tok, file_id,
       |             row_number() OVER (PARTITION BY tok ORDER BY c DESC, file_id ASC) AS rn
       |           FROM cnts) WHERE rn = 1),
       |edges AS (SELECT DISTINCT i.file_id, p.provider
       |          FROM imports i JOIN prov p USING (tok)
       |          WHERE i.file_id <> p.provider),
       |outd AS (SELECT file_id, count(*) AS n_imports FROM edges GROUP BY 1),
       |ind AS (SELECT provider AS file_id, count(*) AS n_importers FROM edges GROUP BY 1)
       |SELECT c.file_id, c.path,
       |  coalesce(o.n_imports, 0) AS n_imports,
       |  coalesce(i.n_importers, 0) AS n_importers
       |FROM code c
       |LEFT JOIN outd o USING (file_id)
       |LEFT JOIN ind i USING (file_id)
       |ORDER BY n_importers DESC, file_id ASC LIMIT 20""".stripMargin

  /** Code summarization (reference: cognee/tasks/summarization/
    * summarize_code.py:11 — every code-graph node carrying source_code
    * gets a CodeSummary datapoint with id = uuid5(node.id,
    * "CodeSummary") and a `summarizes` pointer back to the node;
    * models.py CodeSummary indexes the summary text). The LLM summary
    * (extract_code_summary) is replaced by the deterministic extractive
    * rule already used for TextSummary (first 8 words), and the uuid5
    * derivation by the engine-portable md5 of (path, "CodeSummary").
    * One narrow map over the code table — no shuffle at all; the
    * summary rows join the dependency graph on file_id when the
    * SUMMARIES search type runs over code. */
  def summaries(spark: SparkSession, dir: String): DataFrame = {
    val c = Retrievers.codeTable(spark, dir)
    c.select(
      md5(concat(col("path"), lit("#CodeSummary"))).as("summary_id"),
      col("file_id"), col("path"), col("kind"),
      col("symbol").as("summarizes"),
      array_join(slice(split(col("body"), " "), 1, 8), " ").as("summary"))
  }

  val summariesSql: String =
    s"""WITH ${Retrievers.codeTableSql}
       |SELECT md5(path || '#CodeSummary') AS summary_id,
       |  file_id, path, kind, symbol AS summarizes,
       |  array_to_string(string_split(body, ' ')[1:8], ' ') AS summary
       |FROM code""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "code_dependencies" -> ((s: SparkSession, d: String) => dependencies(s, d)),
    "code_summaries" -> ((s: SparkSession, d: String) => summaries(s, d)))

  def oracles: Map[String, String] = Map(
    "code_dependencies" -> dependenciesSql,
    "code_summaries" -> summariesSql)
}
