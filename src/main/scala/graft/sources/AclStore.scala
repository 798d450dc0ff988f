package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Parquet-backed permission store — the reference's FULL principal
  * model (cognee/modules/users/models/: Principal is User | Role |
  * Tenant; ACL rows key (principal, dataset, permission); UserRole
  * links users into roles; Role/TenantDefaultPermissions grant at the
  * group level) with its mutation methods
  * (permissions/methods/give_permission_on_dataset.py,
  * give_default_permission_to_role.py / _to_tenant.py) re-expressed as
  * idempotent parquet mutations, and get_principal_datasets.py /
  * get_document_ids_for_user.py as a DISTRIBUTED resolution plan:
  * a user's readable datasets = direct grants ∪ grants of every group
  * (role or tenant) the user belongs to — two broadcast-dim joins and
  * a distinct, never a driver-side walk of principal objects.
  *
  * Layout under `root`:
  *  - `grants.parquet`     (principal, ptype 'user'|'role'|'tenant',
  *                          dataset, permission)
  *  - `membership.parquet` (usr, grp, gtype 'role'|'tenant')
  *
  * Mutations are idempotent (grant twice = one row) and rewrite via
  * the VectorStore tmp-write + rename-swap discipline — never an
  * in-place overwrite of a directory being read. The dims are
  * bounded-small relative to the corpus (principals × datasets), so
  * every resolution broadcasts; the CORPUS-sized side (documents)
  * only ever semi-joins the resolved scope.
  */
final case class AclStore(spark: SparkSession, root: String) {

  private val grantsSchema = StructType(Seq(
    StructField("principal", StringType), StructField("ptype", StringType),
    StructField("dataset", StringType), StructField("permission", StringType)))
  private val memberSchema = StructType(Seq(
    StructField("usr", StringType), StructField("grp", StringType),
    StructField("gtype", StringType)))

  private def path(name: String) = new org.apache.hadoop.fs.Path(s"$root/$name")
  private def fs =
    path("x").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readOr(name: String, schema: StructType): DataFrame =
    if (fs.exists(path(name))) spark.read.schema(schema).parquet(path(name).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def grants: DataFrame = readOr("grants.parquet", grantsSchema)
  def membership: DataFrame = readOr("membership.parquet", memberSchema)
  def hasGrants: Boolean = fs.exists(path("grants.parquet"))

  /** Rewrite one table through tmp + rename-swap (the VectorStore
    * delete discipline): the job lands durably in `.tmp` before either
    * metadata rename fires. */
  private def rewrite(name: String, df: DataFrame): Unit = {
    val dir = path(name)
    val tmp = new org.apache.hadoop.fs.Path(dir.toString + ".tmp")
    val old = new org.apache.hadoop.fs.Path(dir.toString + ".old")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dir)) require(fs.rename(dir, old), s"swap failed: could not park $dir")
    require(fs.rename(tmp, dir), s"swap failed: could not promote $tmp")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** give_permission_on_dataset.py (and the role/tenant default-grant
    * twins — the principal's type picks the table row shape, exactly
    * the Principal polymorphism): idempotent append. */
  def grant(principal: String, ptype: String, dataset: String, permission: String): Unit = {
    require(Seq("user", "role", "tenant").contains(ptype), s"unknown principal type $ptype")
    import spark.implicits._
    val inc = Seq((principal, ptype, dataset, permission))
      .toDF("principal", "ptype", "dataset", "permission")
    val fresh = inc.join(grants,
      Seq("principal", "ptype", "dataset", "permission"), "left_anti")
    if (!fresh.isEmpty)
      rewrite("grants.parquet", grants.unionByName(fresh))
  }

  /** Remove one grant row (the missing-in-reference inverse — its API
    * deletes principals/datasets instead; a permission store needs
    * revocation as a first-class mutation). */
  def revoke(principal: String, ptype: String, dataset: String, permission: String): Unit = {
    import spark.implicits._
    val gone = Seq((principal, ptype, dataset, permission))
      .toDF("principal", "ptype", "dataset", "permission")
    rewrite("grants.parquet",
      grants.join(gone, Seq("principal", "ptype", "dataset", "permission"), "left_anti"))
  }

  /** UserRole / tenant membership link (models/UserRole.py, User.tenant):
    * idempotent append. */
  def addMember(usr: String, grp: String, gtype: String): Unit = {
    require(Seq("role", "tenant").contains(gtype), s"unknown group type $gtype")
    import spark.implicits._
    val inc = Seq((usr, grp, gtype)).toDF("usr", "grp", "gtype")
    val fresh = inc.join(membership, Seq("usr", "grp", "gtype"), "left_anti")
    if (!fresh.isEmpty)
      rewrite("membership.parquet", membership.unionByName(fresh))
  }

  def removeMember(usr: String, grp: String, gtype: String): Unit = {
    import spark.implicits._
    val gone = Seq((usr, grp, gtype)).toDF("usr", "grp", "gtype")
    rewrite("membership.parquet",
      membership.join(gone, Seq("usr", "grp", "gtype"), "left_anti"))
  }

  /** The datasets `user` may act on with `permission`
    * (get_principal_datasets.py resolved over ALL the user's
    * principals): direct user grants ∪ grants of every role/tenant the
    * user belongs to. One-column (`source`) frame for semi-joining into
    * a document scan; deny-by-default (unknown user → empty). */
  def sourcesOf(user: String, permission: String = "read"): DataFrame = {
    val g = grants.filter(col("permission") === permission)
    val direct = g.filter(col("ptype") === "user" && col("principal") === user)
      .select(col("dataset").as("source"))
    val viaGroups = membership.filter(col("usr") === user)
      .join(g.filter(col("ptype") =!= "user"),
        col("grp") === col("principal") && col("gtype") === col("ptype"))
      .select(col("dataset").as("source"))
    direct.union(viaGroups).distinct()
  }

  /** check_permission_on_dataset.py: does `user` hold `permission` on
    * `dataset` (directly or through a group)? */
  def check(user: String, dataset: String, permission: String): Boolean =
    !sourcesOf(user, permission).filter(col("source") === dataset).isEmpty
}

object AclStore {
  /** The deterministic seed the registered query and its oracle share
    * (one constant — code and SQL can never drift): dave reads src0
    * directly, src4-7 through the analysts role, src12 through the
    * acme tenant default; erin only holds the role; a write grant must
    * not authorize search. */
  val seedGrants: Seq[(String, String, String, String)] = Seq(
    ("dave", "user", "src0", "read"),
    ("analysts", "role", "src4", "read"),
    ("analysts", "role", "src5", "read"),
    ("analysts", "role", "src6", "read"),
    ("analysts", "role", "src7", "read"),
    ("acme", "tenant", "src12", "read"),
    ("dave", "user", "src15", "write"))

  val seedMembers: Seq[(String, String, String)] = Seq(
    ("dave", "analysts", "role"),
    ("dave", "acme", "tenant"),
    ("erin", "analysts", "role"))

  /** Seed a store in one batch write (not per-row grant() calls — the
    * registered query must not pay 10 rename-swaps per run). */
  def seed(store: AclStore): Unit = {
    import store.spark.implicits._
    store.rewrite("grants.parquet",
      seedGrants.toDF("principal", "ptype", "dataset", "permission"))
    store.rewrite("membership.parquet", seedMembers.toDF("usr", "grp", "gtype"))
  }

  /** VALUES fragments of the seed for the DuckDB oracle. */
  def seedGrantsSql: String =
    seedGrants.map { case (p, t, d, m) => s"('$p', '$t', '$d', '$m')" }.mkString(", ")
  def seedMembersSql: String =
    seedMembers.map { case (u, g, t) => s"('$u', '$g', '$t')" }.mkString(", ")
}
