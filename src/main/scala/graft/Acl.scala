package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Permission-scoped dataset access — the reference's user→dataset ACL
  * (cognee/modules/users/permissions/methods/
  * get_specific_user_permission_datasets.py resolves the datasets a
  * user holds a permission on; get_document_ids_for_user.py narrows
  * every search to them). Every search type that takes a dataset scope
  * also accepts a user: the user's readable datasets become the scope
  * (intersected with an explicit `datasets` argument when both are
  * given), so two tenants querying the same corpus see disjoint
  * results.
  *
  * The grant table here is the deterministic in-code dim the
  * verification suite pins (users alice/bob/carol over the testdata's
  * src0..src19 document sources, read grants plus a few non-read rows
  * that must NOT grant search). A deployment would load the same
  * (user, dataset, permission) shape from its own store; the scan-side
  * mechanics are identical either way: the ACL dim is broadcast and
  * LEFT SEMI-joined into the document scan
  * ([[operators.Retrievers.chunksAcl]]) — never a driver-side filter
  * over collected ids. Unknown users resolve to ZERO datasets (deny by
  * default), not to the unscoped corpus.
  */
object Acl {

  /** (user, dataset, permission) grants — the reference's permission
    * model keeps one row per (principal, dataset, permission_name). */
  val grants: Seq[(String, String, String)] =
    (0 to 9).map(i => ("alice", s"src$i", "read")) ++
      (10 to 19).map(i => ("bob", s"src$i", "read")) ++
      (0 to 19).map(i => ("carol", s"src$i", "read")) ++
      // write/delete grants do not authorize search — the semi-join
      // filters on permission = 'read' and must ignore these rows
      Seq(("alice", "src15", "write"), ("bob", "src3", "delete"))

  /** The broadcastable ACL dim. */
  def grantsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    grants.toDF("usr", "dataset", "permission")
  }

  /** The datasets `user` may read, as a one-column (`source`) frame for
    * semi-joining into a document scan. Empty for unknown users. */
  def readableSources(spark: SparkSession, user: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    grantsDf(spark)
      .filter(col("usr") === user && col("permission") === "read")
      .select(col("dataset").as("source")).distinct()
  }

  /** Pure-Scala resolve of the same rule — the facade uses it to fold a
    * user into the existing `datasets` scope without a Spark job (the
    * in-code dim is bounded; a store-backed deployment would keep the
    * semi-join shape of [[readableSources]] instead). */
  def readableSourcesOf(user: String): Seq[String] =
    grants.collect { case (u, d, "read") if u == user => d }.distinct

  /** SQL literal of the grant dim for oracle queries (a VALUES list
    * generated from [[grants]], so the oracle can never drift from the
    * code's table). */
  def grantsValuesSql: String =
    grants.map { case (u, d, p) => s"('$u', '$d', '$p')" }.mkString(", ")
}
