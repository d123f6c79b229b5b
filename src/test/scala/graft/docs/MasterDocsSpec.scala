package graft.docs

import graft.{Fixtures, SparkSpec}
import graft.model.JobcanSchemas
import graft.normalize.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-trip invariant for the master-table read path, mirroring
  * ReassemblySpec for request details: `retrieve(update(x)) == x`
  * (users.py:185-266, fix_journal.py:137-214) modulo the deterministic
  * child ordering MasterDocs pins (the reference's GROUP_CONCAT scan
  * order is unspecified, so originals are canonicalized with the same
  * sort before comparing).
  */
class MasterDocsSpec extends SparkSpec {

  private lazy val usersRaw = Fixtures.df(spark,
    JobcanSchemas.userSchema, Fixtures.user1, Fixtures.user2)
  private lazy val usersRebuilt =
    MasterDocs.usersDoc(Normalize.users(usersRaw))

  private def docs(df: DataFrame, id: String): Map[String, String] =
    df.orderBy(id).select(col(id).cast("string"),
      to_json(struct(col("*"))).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("users doc round-trips: NULL-sentinel groups, positions, " +
    "bank account, empty arrays") {
    // canonicalize the original with MasterDocs' deterministic order:
    // distinct + sorted with nulls encoded as the 'NULL' sentinel
    // (users.py:212-216)
    val canonical = usersRaw.select(
      col("id"), col("user_code"), col("email"), col("last_name"),
      col("first_name"), col("is_approver"), col("user_role"),
      col("memo"),
      transform(
        array_sort(array_distinct(transform(col("user_groups"),
          g => coalesce(g, lit("NULL"))))),
        x => when(x === "NULL", lit(null: String)).otherwise(x))
        .as("user_groups"),
      array_sort(array_distinct(col("user_positions")))
        .as("user_positions"),
      col("user_bank_account"))
    assert(docs(usersRebuilt, "id") == docs(canonical, "id"))
  }

  test("user with no children gets empty arrays and null bank " +
    "account, not nulls (users.py:246-260)") {
    val u2 = usersRebuilt.filter(col("id") === 102).collect().head
    assert(u2.getSeq[String](u2.fieldIndex("user_groups")).isEmpty)
    assert(u2.getSeq[Any](u2.fieldIndex("user_positions")).isEmpty)
    assert(u2.isNullAt(u2.fieldIndex("user_bank_account")))
  }

  test("all-null group memberships yield an empty groups array " +
    "(users.py:211-216 gates on COUNT(DISTINCT group_code) > 0)") {
    val raw = Fixtures.df(spark, JobcanSchemas.userSchema,
      """{"id": 103, "user_code": "u003", "email": "x@example.com",
         "last_name": "a", "first_name": "b", "is_approver": false,
         "user_role": 2, "memo": "", "user_groups": [null, null],
         "user_positions": [], "user_bank_account": null}""")
    val doc = MasterDocs.usersDoc(Normalize.users(raw)).collect().head
    assert(doc.getSeq[String](doc.fieldIndex("user_groups")).isEmpty)
  }

  test("all-null position codes yield an empty positions array " +
    "(users.py:218-222 gates on COUNT(DISTINCT position_code) > 0)") {
    val raw = Fixtures.df(spark, JobcanSchemas.userSchema,
      """{"id": 104, "user_code": "u004", "email": "y@example.com",
         "last_name": "a", "first_name": "b", "is_approver": false,
         "user_role": 2, "memo": "", "user_groups": [],
         "user_positions": [
           {"position_code": null, "group_code": "G1"},
           {"position_code": null, "group_code": "G2"}],
         "user_bank_account": null}""")
    val doc = MasterDocs.usersDoc(Normalize.users(raw)).collect().head
    assert(doc.getSeq[Any](doc.fieldIndex("user_positions")).isEmpty)
    // a mixed set keeps its null-coded entries (only the all-null
    // case collapses to [])
    val mixed = Fixtures.df(spark, JobcanSchemas.userSchema,
      """{"id": 105, "user_code": "u005", "email": "z@example.com",
         "last_name": "a", "first_name": "b", "is_approver": false,
         "user_role": 2, "memo": "", "user_groups": [],
         "user_positions": [
           {"position_code": null, "group_code": "G1"},
           {"position_code": "P1", "group_code": "G2"}],
         "user_bank_account": null}""")
    val md = MasterDocs.usersDoc(Normalize.users(mixed)).collect().head
    assert(md.getSeq[Any](md.fieldIndex("user_positions")).size == 2)
  }

  test("duplicate bank-account rows collapse to one user doc " +
    "(reference GROUP BY u.id, users.py:185-196)") {
    val tables = Normalize.users(usersRaw)
    val dupBank = tables("user_bank_accounts")
    val doubled = tables + ("user_bank_accounts" ->
      dupBank.unionAll(dupBank))
    val rebuilt = MasterDocs.usersDoc(doubled)
    assert(rebuilt.count() == usersRaw.count())
    assert(docs(rebuilt, "id") == docs(usersRebuilt, "id"))
  }

  private lazy val fjRaw = Fixtures.df(spark,
    JobcanSchemas.fixJournalSchema, Fixtures.fixJournal1,
    Fixtures.fixJournal2, Fixtures.fixJournal3)
  private lazy val fjRebuilt =
    MasterDocs.fixJournalsDoc(Normalize.fixJournals(fjRaw))

  test("fix_journal doc round-trips with custom_journal_item_list " +
    "reattached (fix_journal.py:137-214)") {
    val canonical = fjRaw.withColumn("custom_journal_item_list",
      array_sort(col("custom_journal_item_list")))
    assert(docs(fjRebuilt, "journal_id") == docs(canonical, "journal_id"))
  }

  test("flat masters pass silver rows through unchanged") {
    val groupsRaw = Fixtures.df(spark, JobcanSchemas.groupSchema,
      Fixtures.group1)
    val t = Map("companies" -> Fixtures.df(spark,
      JobcanSchemas.companySchema, Fixtures.company1),
      "forms" -> Fixtures.df(spark, JobcanSchemas.formSchema,
        Fixtures.form1),
      "groups" -> Normalize.groups(groupsRaw),
      "positions" -> Fixtures.df(spark, JobcanSchemas.positionSchema,
        Fixtures.position1),
      "projects" -> Fixtures.df(spark, JobcanSchemas.projectSchema,
        Fixtures.project1))
    val flat = MasterDocs.flatDocs(t)
    assert(flat.keySet == Set("companies", "forms", "groups",
      "positions", "projects"))
    assert(flat("groups").collect().toSeq ==
      Normalize.groups(groupsRaw).collect().toSeq)
  }

  test("toJsonDocs emits one parseable document per master row") {
    val t = Normalize.users(usersRaw) ++
      Normalize.fixJournals(fjRaw) ++ Map(
      "companies" -> Fixtures.df(spark, JobcanSchemas.companySchema,
        Fixtures.company1),
      "forms" -> Fixtures.df(spark, JobcanSchemas.formSchema,
        Fixtures.form1),
      "groups" -> Fixtures.df(spark, JobcanSchemas.groupSchema,
        Fixtures.group1),
      "positions" -> Fixtures.df(spark, JobcanSchemas.positionSchema,
        Fixtures.position1),
      "projects" -> Fixtures.df(spark, JobcanSchemas.projectSchema,
        Fixtures.project1))
    val all = MasterDocs.toJsonDocs(t)
    // 2 users + 3 journals + 5 flat singletons
    assert(all.count() == 10)
    val reparsed = all.select(schema_of_json(
      lit(all.filter(col("table") === "users").select("doc")
        .collect().head.getString(0)))).collect()
    assert(reparsed.nonEmpty)
  }
}
