package graft

import java.nio.file.Files
import java.security.MessageDigest

import graft.graph.{GraphExport, PropertyGraph}
import org.apache.spark.sql.functions._

/** Pins the distinctive reference semantics of the round-8 additions:
  *
  *  - entity_extract_cascade (tasks/graph/cascade_extract): node
  *    acceptance dedups CASE-INSENSITIVELY (first proposal wins), edge
  *    proposals are dropped unless BOTH endpoints were accepted, the
  *    triplet set dedups on (src, dst, rel), and acceptance order
  *    follows (round, position) — not raw text order.
  *  - pipeline_classify (tasks/chunk_naive_llm_classifier): the
  *    is_subtype_of edge is emitted only at a subtype's FIRST sighting,
  *    so a subtype seen under two types parents to the first.
  *  - graph_formatted (modules/graph/methods/get_formatted_graph_data):
  *    label falls back to <type>_<id> exactly when name is NULL or
  *    empty, and the properties bag drops reserved keys and NULL values.
  */
class CascadeAndClassifySpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("cascade_docs").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The operator's own round rule, replicated independently:
    * fold16(md5(token)) % 2. */
  private def roundOf(tok: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("cascade: case-insensitive first-wins nodes, endpoint-filtered deduped edges") {
    val dir = writeDocs(Seq(
      (1L, "Alpha alpha x bridges", "en", "s1"),
      (2L, "connects hub y hub", "en", "s1")))
    val out = operators.TextOps.entityCascade(spark, dir)
      .orderBy($"doc_id").as[(Long, String, Long, Long, Long)].collect()

    // doc 1: {alpha, bridges} — "Alpha"/"alpha" collapse case-insensitively;
    // (alpha,alpha) survives (self-adjacent, both accepted, rel=related_to);
    // (alpha,x)/(x,bridges) die on the len-1 endpoint filter.
    assert(out(0)._3 === 2L) // n_nodes
    assert(out(0)._4 === 1L) // n_rels: related_to
    assert(out(0)._5 === 1L) // n_edges
    // doc 2: (connects,hub) rides the extracted relationship name.
    assert(out(1)._3 === 2L && out(1)._4 === 1L && out(1)._5 === 1L)

    // first_node follows (round, position), not text order.
    val doc1Accepted = Seq("alpha" -> 0, "alpha" -> 1, "bridges" -> 3)
    val expectedFirst = doc1Accepted.map { case (t, p) => (roundOf(t), p, t) }.min._3
    assert(out(0)._2 === expectedFirst)
  }

  test("cascade: triplet dedup keeps one row per (src, dst, rel)") {
    val dir = writeDocs(Seq((1L, "aa bb aa bb", "en", "s1")))
    val out = operators.TextOps.entityCascade(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect().head
    // raw pairs: (aa,bb), (bb,aa), (aa,bb) → 2 distinct triplets.
    assert(out._3 === 2L && out._5 === 2L)
  }

  test("classify: is_subtype_of parents a shared subtype to its first sighting") {
    val dir = writeDocs(Seq(
      (1L, "one two", "en", "shared"),
      (2L, "eins zwei", "de", "shared")))
    val rows = Pipeline.classifyChunks(spark, dir)
      .as[(String, String, String, Long)].collect()
    val subtypes = rows.filter(_._1 == "subtype").map(r => r._2 -> (r._3, r._4)).toMap
    // src_shared appears under text_en (doc 1) before text_de (doc 2):
    // the first sighting wins the is_subtype_of edge.
    assert(subtypes("src_shared") === ("text_en", 2L))
    assert(subtypes("size_partial") === ("text_en", 2L))
    val types = rows.filter(_._1 == "type").map(r => r._2 -> r._4).toMap
    assert(types === Map("text_en" -> 1L, "text_de" -> 1L))
    // collection leg: one vector point per distinct taxonomy label.
    assert(rows.find(_._1 == "collection").get._4 === 4L)
  }

  test("formatted: label fallback on empty name; reserved keys and NULLs dropped") {
    val nodes = Seq(
      ("n1", "thing", "", Map("name" -> "reserved", "color" -> "red", "id" -> "x")),
      ("n2", "thing", "Named", Map.empty[String, String]))
      .toDF("id", "ntype", "name", "props")
    val edges = Seq(("n1", "n2", "links")).toDF("src", "dst", "rel")
      .withColumn("props", map().cast("map<string,string>"))
    val out = GraphExport.toFormatted(PropertyGraph(nodes, edges))
      .as[(String, String, String, String, Long, String)].collect()
    val n1 = out.find(_._2 == "n1").get
    assert(n1._3 === "thing_n1") // empty name → <type>_<id>
    assert(n1._5 === 1L) // name/id reserved, only color survives
    val colorFp = MessageDigest.getInstance("MD5").digest("color=red".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(n1._6 === colorFp)
    val n2 = out.find(_._2 == "n2").get
    assert(n2._3 === "Named" && n2._5 === 0L)
    val e = out.find(_._1 == "edge_label").get
    assert(e._3 === "links" && e._5 === 1L)
  }
}
