package graft

import graft.model.JobcanSchemas
import graft.normalize.Normalize
import graft.views.Views
import org.apache.spark.sql.functions._

/** SURVEY §7.2 end-to-end slice: fixture JSON → 26-table shred → view
  * stack → golden rows. Exercises J1–J6, P3/P4, A1/A2, F1–F5 in one
  * path.
  */
class NormalizeViewsSpec extends SparkSpec {

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    val users = Normalize.users(
      Fixtures.df(spark, JobcanSchemas.userSchema, Fixtures.user1,
        Fixtures.user2))
    val reqs = Normalize.requests(
      Fixtures.df(spark, JobcanSchemas.requestDetailSchema,
        Fixtures.requestSa10, Fixtures.requestSa11))
    val groups = Map("groups" -> Normalize.groups(
      Fixtures.df(spark, JobcanSchemas.groupSchema, Fixtures.group1)))
    val companies = Map("companies" -> Normalize.companies(
      Fixtures.df(spark, JobcanSchemas.companySchema, Fixtures.company1)))
    // empty-but-typed tables the views need
    import spark.implicits._
    val fixJournals = Map(
      "fix_journals" -> Seq.empty[(Long, String, String, String, String,
        String)].toDF("journal_id", "journal_type", "journal_date",
        "view_id", "company_code", "company_name")
        .withColumn("invoice_registrated_number", lit(null).cast("string")),
      "payment" -> reqs("payment"))
    users ++ reqs ++ groups ++ companies ++ fixJournals
  }

  private lazy val views = new Views(tables)

  test("users shred: null group element survives, empty arrays drop, " +
    "bank account only when present") {
    assert(tables("users").count() == 2)
    val ug = tables("user_groups").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(ug == Set((101L, Some("G01")), (101L, None)))
    assert(tables("user_positions").count() == 1)
    assert(tables("user_bank_accounts").count() == 1)
  }

  test("requests shred: all 26+ child tables populated with natural keys") {
    assert(tables("requests").count() == 2)
    assert(tables("customized_items").count() == 3)
    assert(tables("table_data").count() == 3) // 2+1 cells, one item
    assert(tables("generic_masters").count() == 1)
    assert(tables("generic_master_additional_items").count() == 2)
    assert(tables("expense").count() == 2)
    assert(tables("expense_specifics").count() == 2)
    assert(tables("expense_specific_rows").count() == 3)
    assert(tables("custom_items").count() == 1)
    assert(tables("custom_item_values").count() == 1)
    assert(tables("custom_item_value_extension_items").count() == 1)
    assert(tables("approval_process").count() == 2)
    assert(tables("approval_steps").count() == 3)
    assert(tables("approvers").count() == 3)
    assert(tables("comments").count() == 1)
    assert(tables("viewers").count() == 1)
    assert(tables("modify_logs").count() == 1)
    assert(tables("modify_log_details").count() == 1)
    assert(tables("modify_log_detail_specifics").count() == 1)
    // f1 appears via customized_item + 2× default_attachment → ONE
    // registry row, one association with default_attachment = 2
    assert(tables("files").count() == 1)
    val fa = tables("file_associations").collect()
    assert(fa.length == 1)
    val faRow = tables("file_associations")
      .select("request_id", "file_id", "default_attachment",
        "customized_item_index").collect().head
    assert(faRow.getString(0) == "sa-10" && faRow.getString(1) == "f1")
    assert(faRow.getInt(2) == 2, "repetition counter (R1 input)")
    assert(faRow.getInt(3) == 0)
  }

  test("view_request_details: status CASE map + strftime double-space " +
    "format + 3-way left join (create_views.sql:126-178)") {
    val rd = views.viewRequestDetails.orderBy("id").collect()
    assert(rd.length == 2)
    val sa10 = rd.head
    assert(sa10.getAs[String]("status") == "完了")
    assert(sa10.getAs[String]("applied_date") == "2024/08/01  09:30:00")
    assert(sa10.getAs[Long]("amount") == 3200L) // joined from expense
    assert(sa10.getAs[String]("ec_billing_destination") == null)
    assert(rd(1).getAs[String]("status") == "進行中")
    assert(rd(1).getAs[String]("final_approved_date") == null)
  }

  test("view_request_approval_history: concat ordered by approved_date " +
    "(create_views.sql:260-281)") {
    val h = views.viewRequestApprovalHistory.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(h("sa-10") ==
      "佐藤花子（承認日時：2024/08/02  10:00:00）, " +
        "山本部長（承認日時：2024/08/03  15:00:00）")
    assert(!h.contains("sa-11"), "未承認 rows are filtered out")
  }

  test("view_expense_specifics: row_number TEXT→INT cast " +
    "(create_views.sql:208)") {
    val es = views.viewExpenseSpecifics
      .filter(col("request_id") === "sa-10")
      .orderBy("row_number").collect()
    assert(es.length == 2)
    assert(es.head.getAs[Int]("row_number") == 1)
    assert(es.head.getAs[Long]("amount") == 1600L)
  }

  test("view_立替精算(書式3): IN filter + pivot + earliest use_date + " +
    "history join (create_views.sql:293-338)") {
    val v = views.viewExpenseReportFormat3().orderBy("申請ID").collect()
    assert(v.length == 2)
    val sa10 = v.head
    assert(sa10.getAs[String]("申請ID") == "sa-10")
    assert(sa10.getAs[String]("申請ステータス") == "完了")
    assert(sa10.getAs[String]("備考") == "日帰り出張") // item_index=0 pivot
    assert(sa10.getAs[String]("【申請にあたっての確認事項】") == "確認済")
    assert(sa10.getAs[String]("経費の内訳") == "電車") // col 0 row 1
    assert(sa10.getAs[java.sql.Date]("利用日").toString == "2024-07-30")
    assert(sa10.getAs[String]("申請者メールアドレス") == "taro@example.com")
    assert(sa10.getAs[String]("承認者").startsWith("佐藤花子"))
    val sa11 = v(1)
    assert(sa11.getAs[String]("承認者") == null) // no approvals yet
    assert(sa11.getAs[String]("【申請にあたっての確認事項】") == null)
  }

  test("view_立替精算・交通費(書式3-3.): passthrough filter keeps both " +
    "(form 54142953)") {
    assert(views.viewExpenseReportFormat33().count() == 2)
  }

  test("書式3_明細: one row per expense specific row, ordered") {
    val d = views.viewExpenseReportFormat3Detail().collect()
    assert(d.length == 3)
    assert(d.map(_.getAs[String]("申請ID")).toSeq ==
      Seq("sa-10", "sa-10", "sa-11"))
  }

  test("view_companies: NULLIF('')::int casts + account type map " +
    "(create_views.sql:98-120)") {
    val c = views.viewCompanies.collect().head
    assert(c.getAs[Long]("bank_code") == 1L)
    assert(c.getAs[Any]("branch_code") == null) // '' → NULL
    assert(c.getAs[String]("bank_account_type_code") == "普通")
  }

  test("view_user_group_position: inner + null-safe composite left join " +
    "(create_views.sql:32-42)") {
    val rows = views.viewUserGroupPosition.collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)))).toSet
    // u001 has groups G01 and NULL; position only under G01
    assert(rows == Set(
      ("u001", Some("G01"), Some("P01")),
      ("u001", None, None)))
  }

  test("registerAll exposes views to spark.sql") {
    views.registerAll()
    assert(spark.sql("SELECT count(*) FROM view_request_details")
      .collect().head.getLong(0) == 2)
  }

  test("registerAll skips views whose tables are missing but THROWS " +
    "on a broken view definition (no silent unregister)") {
    // nothing ingested → every view skipped, no error
    new graft.views.Views(Map.empty).registerAll()
    // tables present but schema-broken → the resolution error must
    // surface (a Try(...) here once hid a real self-join ambiguity)
    import spark.implicits._
    val broken = Map(
      "users" -> Seq((1L, "u001")).toDF("id", "user_code"),
      "user_bank_accounts" -> Seq((1L, "0001")).toDF("user_id", "bank_code"))
    intercept[org.apache.spark.sql.AnalysisException] {
      new graft.views.Views(broken).registerAll()
    }
  }
}
