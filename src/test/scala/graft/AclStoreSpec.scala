package graft

import graft.sources.AclStore
import org.apache.spark.sql.functions._

/** The principal-model permission store (reference: modules/users/
  * models Principal/ACL/UserRole + permissions/methods grant surface). */
class AclStoreSpec extends SparkSpecBase {

  private def freshStore(tag: String): AclStore = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_acl_$tag").toString
    AclStore(TestSpark.spark, root)
  }

  private def sources(as: AclStore, user: String): Set[String] =
    as.sourcesOf(user).collect().map(_.getString(0)).toSet

  test("grants resolve through roles and tenant defaults; write grants never authorize read") {
    val as = freshStore("resolve")
    AclStore.seed(as)
    // dave: direct src0 + analysts role src4-7 + acme tenant src12;
    // the src15 WRITE grant must not appear in the read scope
    assert(sources(as, "dave") === Set("src0", "src4", "src5", "src6", "src7", "src12"))
    // erin holds only the role
    assert(sources(as, "erin") === Set("src4", "src5", "src6", "src7"))
    // unknown principal: deny by default
    assert(sources(as, "mallory") === Set.empty[String])
    // check() follows the same resolution
    assert(as.check("dave", "src12", "read"))
    assert(!as.check("dave", "src15", "read"))
    assert(as.check("dave", "src15", "write"))
    assert(!as.check("erin", "src0", "read"))
  }

  test("grant is idempotent; revoke removes exactly one grant row") {
    val as = freshStore("mutate")
    as.grant("u1", "user", "srcA", "read")
    as.grant("u1", "user", "srcA", "read") // idempotent
    assert(as.grants.count() === 1L)
    as.grant("u1", "user", "srcB", "read")
    assert(sources(as, "u1") === Set("srcA", "srcB"))
    as.revoke("u1", "user", "srcA", "read")
    assert(sources(as, "u1") === Set("srcB"))
    assert(as.grants.count() === 1L)
  }

  test("membership changes move group grants in and out of a user's scope") {
    val as = freshStore("member")
    as.grant("team", "role", "srcT", "read")
    as.grant("org", "tenant", "srcO", "read")
    assert(sources(as, "u2") === Set.empty[String])
    as.addMember("u2", "team", "role")
    as.addMember("u2", "team", "role") // idempotent
    assert(as.membership.count() === 1L)
    assert(sources(as, "u2") === Set("srcT"))
    as.addMember("u2", "org", "tenant")
    assert(sources(as, "u2") === Set("srcT", "srcO"))
    // a role named like a tenant must NOT cross-match (gtype joins ptype)
    as.addMember("u3", "org", "role")
    assert(sources(as, "u3") === Set.empty[String])
    as.removeMember("u2", "team", "role")
    assert(sources(as, "u2") === Set("srcO"))
  }

  test("the registered role-ACL search stays inside the resolved scope") {
    val out = SparkEntry.queries("search_chunks_acl_role")(spark, sf)
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("source"))
    val srcs = out.join(docs, Seq("doc_id")).select(col("source"))
      .collect().map(_.getString(0)).toSet
    assert(srcs.nonEmpty &&
      srcs.subsetOf(Set("src0", "src4", "src5", "src6", "src7", "src12")))
  }

  test("the facade resolves scope through a caller-named store (roles included)") {
    val as = freshStore("facade")
    AclStore.seed(as)
    def docsOf(user: String): Set[Long] =
      Graft.search(spark, sf, Graft.Summaries,
        SearchParams(user = Some(user), aclRoot = Some(as.root)))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val sources = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val daveScope = Set("src0", "src4", "src5", "src6", "src7", "src12")
    val dave = docsOf("dave")
    assert(dave.nonEmpty && dave.forall(d => daveScope(sources(d))))
    // store-resolved deny-by-default still holds
    assert(docsOf("mallory").isEmpty)
    // revocation is live: dropping the role grant narrows the next search
    as.removeMember("dave", "analysts", "role")
    val after = docsOf("dave")
    assert(after.forall(d => Set("src0", "src12")(sources(d))))
  }
}
