package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 19 SQL views (`config/create_views.sql`) as
  * DataFrame functions over the silver tables produced by
  * `graft.normalize.Normalize`. Views are virtual plan fragments,
  * exactly like the reference (never materialized; callers that run
  * several of the 8 CSV views stacked on viewRequestDetails should
  * cache it once via `graft.operators.ManagedCache` —
  * `create_views.sql:326,452,515,574,624,670`).
  *
  * Divergences (documented, SURVEY §7.4):
  *  - joins use the natural composite keys from Normalize instead of
  *    SQLite AUTOINCREMENT surrogates — same semantics, stable keys;
  *  - SQLite's bare-column GROUP BY ("some row") is pinned
  *    deterministic with first()/min();
  *  - timezone for strftime('localtime') is an explicit parameter
  *    (harness pins UTC).
  */
class Views(t: Map[String, DataFrame], localTz: String = "UTC") {

  private def tbl(n: String): DataFrame =
    t.getOrElse(n, throw new Views.MissingTableException(n))

  /** strftime('%Y/%m/%d  %H:%M:%S', ts, 'localtime') — F2; note the
    * reference's double space. */
  private def strf(c: Column): Column =
    date_format(from_utc_timestamp(c, localTz), "yyyy/MM/dd  HH:mm:ss")

  // -- users (create_views.sql:7-28) ----------------------------------
  def viewUserDetails: DataFrame = {
    val u = tbl("users")
    val uba = tbl("user_bank_accounts")
    u.join(broadcast(uba), u("id") === uba("user_id"), "left")
      .select(u("user_code"), u("email"), u("last_name"), u("first_name"),
        u("is_approver"), u("user_role"), u("memo"),
        uba("bank_code"), uba("bank_name"), uba("bank_name_kana"),
        uba("branch_code"), uba("branch_name"), uba("branch_name_kana"),
        uba("bank_account_type_code"), uba("bank_account_code"),
        uba("bank_account_name_kana"))
  }

  // -- user groups/positions (create_views.sql:32-42) -----------------
  def viewUserGroupPosition: DataFrame = {
    val u = tbl("users")
    val ug = tbl("user_groups")
    val up = tbl("user_positions")
    u.join(ug, u("id") === ug("user_id"), "inner")
      .join(up,
        u("id") === up("user_id") && ug("group_code") <=> up("group_code"),
        "left")
      .select(u("user_code"), ug("group_code"), up("position_code"))
  }

  // -- passthrough views (create_views.sql:48-89) ---------------------
  def viewGroups: DataFrame = tbl("groups")
    .select("group_code", "group_name", "parent_group_code", "description")

  def viewPositions: DataFrame = tbl("positions")
    .select("position_code", "position_name", "description")

  def viewForms: DataFrame = tbl("forms")
    .select("id", "category", "form_type", "settlement_type", "name",
      "view_type", "description")

  // -- companies with typed casts (create_views.sql:98-120) -----------
  def viewCompanies: DataFrame = {
    val c = tbl("companies")
    c.select(
      col("company_code"), col("company_name"), col("zip_code"),
      col("address"),
      nullif(col("bank_code"), lit("")).cast("long").as("bank_code"),
      col("bank_name"),
      nullif(col("branch_code"), lit("")).cast("long").as("branch_code"),
      col("branch_name"),
      // CASE bank_account_type_code (create_views.sql:108-115); the
      // reference's `WHEN NULL` branch never fires in SQLite either —
      // NULL input falls through to the ELSE cast (→ NULL)
      when(col("bank_account_type_code") === "", lit(null))
        .when(col("bank_account_type_code") === "1", lit("普通"))
        .when(col("bank_account_type_code") === "2", lit("当座"))
        .when(col("bank_account_type_code") === "9", lit("その他"))
        .otherwise(col("bank_account_type_code"))
        .as("bank_account_type_code"),
      nullif(col("bank_account_code"), lit("")).cast("long")
        .as("bank_account_code"),
      col("bank_account_name_kana"), col("invoice_registrated_number"))
  }

  // -- request details (create_views.sql:126-178) ---------------------
  def viewRequestDetails: DataFrame = {
    val r = tbl("requests")
    val exp = tbl("expense")
    val ec = tbl("ec")
    r.join(exp, r("id") === exp("request_id"), "left")
      .join(ec, r("id") === ec("request_id"), "left")
      .select(
        r("id"), r("title"),
        when(r("status") === "in_progress", "進行中")
          .when(r("status") === "completed", "完了")
          .when(r("status") === "rejected", "却下")
          .when(r("status") === "canceled", "取り消し")
          .when(r("status") === "returned", "差し戻し")
          .when(r("status") === "canceled_after_completion", "完了後取消")
          .otherwise(r("status")).as("status"),
        r("form_id"), r("form_name"), r("form_type"), r("settlement_type"),
        strf(r("applied_date")).as("applied_date"),
        r("applicant_code"), r("applicant_last_name"),
        r("applicant_first_name"), r("applicant_group_name"),
        r("applicant_group_code"), r("applicant_position_name"),
        r("proxy_applicant_last_name"), r("proxy_applicant_first_name"),
        r("group_name"), r("group_code"), r("project_name"),
        r("project_code"), r("flow_step_name"), r("is_content_changed"),
        r("total_amount"), r("pay_at"), r("final_approval_period"),
        strf(r("final_approved_date")).as("final_approved_date"),
        exp("amount"),
        exp("related_request_title").as("expense_related_request_title"),
        exp("related_request_id").as("expense_related_request_id"),
        exp("use_suspense_payment").as("expense_use_suspense_payment"),
        exp("content_description").as("expense_content_description"),
        exp("advanced_payment").as("expense_advanced_payment"),
        exp("suspense_payment_amount").as("expense_suspense_payment_amount"),
        ec("related_request_id").as("ec_related_request_id"),
        ec("related_request_title").as("ec_related_request_title"),
        ec("content_description").as("ec_content_description"),
        ec("billing_destination").as("ec_billing_destination"))
  }

  // NOTE: when running several of the 8 CSV views that stack on
  // viewRequestDetails, cache it once through graft.operators
  // .ManagedCache (tracked persist/release) — never a bare .cache(),
  // which leaks session-lifetime CacheManager entries (§4
  // materialization note).

  // -- approval process (create_views.sql:182-199) --------------------
  def viewApprovalProcess: DataFrame = {
    // all three tables shred from the same bronze lineage — explicit
    // aliases are required or Spark's self-join resolution is ambiguous
    val ap = tbl("approval_process").alias("ap")
    val st = tbl("approval_steps").alias("st")
    val av = tbl("approvers").alias("av")
    ap.join(st, col("ap.request_id") === col("st.request_id"), "left")
      .join(av,
        col("st.request_id") === col("av.request_id") &&
          col("st.step_index") === col("av.step_index"), "left")
      .select(col("ap.request_id").as("request_id"),
        col("st.step_index").as("step_index"), col("st.name").as("name"),
        col("st.condition").as("condition"),
        col("st.status").as("final_status"),
        col("av.status").as("approver_status"),
        col("av.approver_index").as("approver_index"),
        col("av.approved_date").as("approved_date"),
        col("av.approver_name").as("approver_name"),
        col("av.approver_code").as("approver_code"))
  }

  // -- expense specifics (create_views.sql:203-220) -------------------
  def viewExpenseSpecifics: DataFrame = {
    val e = tbl("expense").alias("e")
    val es = tbl("expense_specifics").alias("es")
    val esr = tbl("expense_specific_rows").alias("esr")
    e.join(es, col("e.request_id") === col("es.request_id"), "left")
      .join(esr,
        col("es.request_id") === col("esr.request_id") &&
          col("es.col_number") === col("esr.col_number"), "left")
      .select(col("e.request_id").as("request_id"),
        col("es.type").as("type"), col("es.col_number").as("col_number"),
        col("esr.row_number").cast("int").as("row_number"),
        col("esr.use_date").as("use_date"),
        col("esr.group_name").as("group_name"),
        col("esr.project_name").as("project_name"),
        col("esr.content_description").as("content_description"),
        col("esr.breakdown").as("breakdown"),
        col("esr.amount").as("amount"))
  }

  // -- form item catalogs (create_views.sql:228-256): SQLite
  // bare-column GROUP BY → deterministic first-per-key (A5) via
  // min(struct(...)): same lexicographic pick as a row_number window,
  // but with map-side partial aggregation and no per-key sort.
  private def formItems(keyCols: Seq[String]): DataFrame = {
    // aliases: both tables shred from the same bronze lineage
    val ci = tbl("customized_items").alias("ci")
    val r = tbl("requests").alias("r")
    val joined = ci.join(r, col("ci.request_id") === col("r.id"), "inner")
      .select(col("r.form_id").as("form_id"),
        col("r.form_name").as("form_name"), col("ci.title").as("title"),
        col("ci.item_index").as("item_index"))
    joined.groupBy(keyCols.map(col): _*)
      .agg(min(struct(col("form_id"), col("item_index"), col("title"),
        col("form_name"))).as("__m"))
      .select(col("__m.form_id").as("form_id"),
        col("__m.form_name").as("form_name"),
        col("__m.title").as("title"),
        col("__m.item_index").as("item_index"))
      .orderBy(col("form_id"), col("item_index"))
  }

  def viewFormItems: DataFrame = formItems(Seq("form_id", "item_index"))
  def viewFormItemsByName: DataFrame = formItems(Seq("form_id", "title"))

  // -- ordered approval history (create_views.sql:260-281) ------------
  def viewRequestApprovalHistory: DataFrame = {
    val ap = viewApprovalProcess
      .filter(col("approver_status") === "承認済み")
      .select(col("request_id"),
        concat(col("approver_name"), lit("（承認日時："),
          strf(col("approved_date")), lit("）")).as("approver_detail"),
        col("approved_date"))
    // ordering lives INSIDE the aggregation (A2): sort by approved
    // date (then detail for total order), then concat
    ap.groupBy(col("request_id"))
      .agg(concat_ws(", ", transform(
        array_sort(collect_list(struct(
          col("approved_date").as("d"), col("approver_detail").as("t")))),
        x => x.getField("t"))).as("approver_details"))
  }

  // -- CSV export views (create_views.sql:293-680) --------------------

  /** Pivot helper: MAX(CASE WHEN ci.item_index = k THEN content END). */
  private def itemPivot(k: Int): Column =
    max(when(col("item_index") === k, col("content")))

  /** F4 currency parse on a pivoted column. */
  private def yen(c: Column): Column =
    regexp_replace(c, "[円, ]", "").cast("long")

  private val format3FormIds = Seq(14789304L, 21063509L, 39901682L,
    54142953L, 64039825L, 66265686L, 70659861L, 84927058L, 87208398L,
    88302404L)

  /** view_立替精算(書式3) (create_views.sql:293-338). */
  def viewExpenseReportFormat3(rd: DataFrame = viewRequestDetails): DataFrame = {
    val ci = tbl("customized_items")
    val u = tbl("users")
    val rah = viewRequestApprovalHistory
    val es = viewExpenseSpecifics
    val base = rd.filter(col("form_id").isin(format3FormIds: _*))
    base
      .join(ci.select(col("request_id").as("__ci_rid"), col("item_index"),
        col("content")), base("id") === col("__ci_rid"), "left")
      .join(broadcast(u.select(col("user_code").as("__u_code"),
        col("email"))), base("applicant_code") === col("__u_code"), "left")
      .join(rah.select(col("request_id").as("__rah_rid"),
        col("approver_details")), base("id") === col("__rah_rid"), "left")
      .join(es.select(col("request_id").as("__es_rid"), col("col_number"),
        col("row_number"), col("breakdown"), col("use_date")),
        base("id") === col("__es_rid"), "left")
      .groupBy(base("id").as("申請ID"))
      .agg(
        first(base("status")).as("申請ステータス"),
        first(base("final_approved_date")).as("最終承認日"),
        first(col("approver_details")).as("承認者"),
        first(base("form_id")).as("フォームID"),
        first(base("form_name")).as("フォーム名"),
        first(base("title")).as("タイトル"),
        min(col("email")).as("申請者メールアドレス"),
        first(base("applicant_code")).as("申請者コード"),
        first(base("applicant_last_name")).as("申請者名（姓）"),
        first(base("applicant_first_name")).as("申請者名（名）"),
        first(base("applied_date")).as("申請日時"),
        first(base("group_name")).as("関連グループ名"),
        first(base("project_name")).as("関連プロジェクト名"),
        max(when(col("col_number") === 0 && col("row_number") === 1,
          col("breakdown"))).as("経費の内訳"),
        max(when(col("col_number") === 0 && col("row_number") === 1,
          col("use_date"))).as("利用日"),
        first(base("total_amount")).as("金額"),
        itemPivot(0).as("備考"),
        itemPivot(1).as("【申請にあたっての確認事項】"))
  }

  /** view_立替精算(書式3)_明細 (create_views.sql:340-364). */
  def viewExpenseReportFormat3Detail(rd: DataFrame = viewRequestDetails): DataFrame = {
    val es = viewExpenseSpecifics
    rd.filter(col("form_id").isin(format3FormIds: _*))
      .join(es, rd("id") === es("request_id"), "left")
      .select(rd("id").as("申請ID"),
        es("breakdown").as("交通費明細の内訳"),
        es("use_date").as("交通費明細の利用日"),
        es("amount").as("交通費明細の金額"),
        es("content_description").as("交通費明細の目的・備考"),
        es("group_name").as("交通費明細のグループ"),
        es("project_name").as("交通費明細のプロジェクト"))
      .orderBy(col("申請ID"), col("交通費明細の利用日"))
  }

  /** view_立替精算・交通費(書式3-3.) — SELECT * passthrough filter (P2,
    * create_views.sql:368-374). */
  def viewExpenseReportFormat33(rd: DataFrame = viewRequestDetails): DataFrame =
    viewExpenseReportFormat3(rd).filter(col("フォームID") === 54142953L)

  /** view_立替精算・交通費(書式3-3.)_明細 (create_views.sql:376-400). */
  def viewExpenseReportFormat33Detail(rd: DataFrame = viewRequestDetails): DataFrame = {
    val es = viewExpenseSpecifics
    rd.filter(col("form_id") === 54142953L)
      .join(es, rd("id") === es("request_id"), "left")
      .select(rd("id").as("申請ID"),
        es("breakdown").as("交通費明細の内訳"),
        es("use_date").as("交通費明細の利用日"),
        es("amount").as("交通費明細の金額"),
        es("content_description").as("交通費明細の目的・備考"),
        es("group_name").as("交通費明細のグループ"),
        es("project_name").as("交通費明細のプロジェクト"))
      .orderBy(col("申請ID"), col("交通費明細の利用日"))
  }

  /** Shared skeleton of the 書式4 payment-request views: rd + pivoted
    * customized_items + users email + approval history (+ optionally
    * fix_journals book/pay + companies + payment). */
  private def format4Base(rd: DataFrame, formId: Long,
      withJournals: Boolean): DataFrame = {
    val u = tbl("users")
    val rah = viewRequestApprovalHistory
    var base = rd.filter(col("form_id") === formId)
      .join(tbl("customized_items").select(
        col("request_id").as("__ci_rid"), col("item_index"), col("content")),
        col("id") === col("__ci_rid"), "left")
      .join(broadcast(u.select(col("user_code").as("__u_code"),
        col("email"))), col("applicant_code") === col("__u_code"), "left")
      .join(rah.select(col("request_id").as("__rah_rid"),
        col("approver_details")), col("id") === col("__rah_rid"), "left")
    if (withJournals) {
      val fj = tbl("fix_journals")
      // J7: same table joined twice under different constant predicates
      val fjb = fj.filter(col("journal_type") === "book")
        .select(col("view_id").as("__fjb_vid"),
          col("journal_date").as("__fjb_date"))
      val fjp = fj.filter(col("journal_type") === "pay")
        .select(col("view_id").as("__fjp_vid"),
          col("journal_date").as("__fjp_date"),
          col("company_code").as("__fjp_company_code"),
          col("company_name").as("__fjp_company_name"),
          col("invoice_registrated_number").as("__fjp_invoice"))
      // J8: non-key string join to companies
      val cp = viewCompanies.select(
        col("company_name").as("__cp_name"), col("bank_code"),
        col("bank_name"), col("branch_code"), col("branch_name"),
        col("bank_account_type_code"), col("bank_account_code"),
        col("bank_account_name_kana"))
      val p = tbl("payment").select(col("request_id").as("__p_rid"),
        col("related_request_title").as("__p_rtitle"),
        col("related_request_id").as("__p_rid2"),
        col("content_description").as("__p_desc"))
      base = base
        .join(fjb, col("id") === col("__fjb_vid"), "left")
        .join(fjp, col("id") === col("__fjp_vid"), "left")
        .join(broadcast(cp), col("__fjp_company_name") === col("__cp_name"),
          "left")
        .join(p, col("id") === col("__p_rid"), "left")
    }
    base
  }

  private def commonHeader: Seq[Column] = Seq(
    first(col("status")).as("申請ステータス"),
    first(col("final_approved_date")).as("最終承認日"),
    first(col("approver_details")).as("承認者"),
    first(col("form_name")).as("フォーム名"),
    first(col("title")).as("タイトル"),
    min(col("email")).as("申請者メールアドレス"),
    first(col("applicant_code")).as("申請者コード"),
    first(col("applicant_last_name")).as("申請者名（姓）"),
    first(col("applicant_first_name")).as("申請者名（名）"),
    first(col("applied_date")).as("申請日時"),
    first(col("project_name")).as("関連プロジェクト名"),
    first(col("group_name")).as("関連グループ名"))

  private def journalHeader: Seq[Column] = Seq(
    first(col("__p_rtitle")).as("関連申請タイトル"),
    first(col("__p_rid2")).as("関連申請ID"),
    first(col("__fjb_date")).as("計上日"),
    first(col("total_amount")).as("金額"),
    first(col("__p_desc")).as("内容"),
    first(col("__fjp_date")).as("支払予定日"),
    first(col("__fjp_company_code")).as("支払先コード"),
    first(col("__fjp_company_name")).as("支払先名"),
    first(col("__fjp_invoice")).as("支払先登録番号"),
    min(col("bank_code")).as("銀行コード"),
    min(col("bank_name")).as("銀行名"),
    min(col("branch_code")).as("支店コード"),
    min(col("branch_name")).as("支店名"))

  /** 書式4-1 支払・請求書 (create_views.sql:408-470). */
  def viewPaymentRequest41(rd: DataFrame = viewRequestDetails): DataFrame =
    format4Base(rd, 41052205L, withJournals = true)
      .groupBy(col("id").as("申請ID"))
      .agg(commonHeader.head,
        (commonHeader.tail ++ journalHeader ++ Seq(
          yen(itemPivot(0)).as("源泉徴収税額"),
          itemPivot(1).as("請求書の添付"),
          itemPivot(2).as("請求書の受取方法"),
          itemPivot(3).as("支払頻度"),
          itemPivot(4).as("備考"),
          itemPivot(5).as("【申請にあたっての確認事項】"),
          itemPivot(7).as("新しい項目"))): _*)

  /** 書式4-2 社員振込 (create_views.sql:475-533). */
  def viewPaymentRequest42(rd: DataFrame = viewRequestDetails): DataFrame =
    format4Base(rd, 75858728L, withJournals = true)
      .groupBy(col("id").as("申請ID"))
      .agg(commonHeader.head,
        (commonHeader.tail ++ journalHeader ++ Seq(
          min(col("bank_account_type_code")).as("口座種別"),
          min(col("bank_account_code")).as("口座番号"),
          min(col("bank_account_name_kana")).as("口座名"),
          itemPivot(0).as("備考"),
          itemPivot(1).as("【申請にあたっての確認事項】"))): _*)

  /** 書式4-3 窓口・コンビニ払い (create_views.sql:537-584). */
  def viewPaymentRequest43(rd: DataFrame = viewRequestDetails): DataFrame =
    format4Base(rd, 11171823L, withJournals = false)
      .groupBy(col("id").as("申請ID"))
      .agg(commonHeader.head,
        (commonHeader.tail ++ Seq(
          itemPivot(0).as("関連申請"), itemPivot(1).as("計上日"),
          yen(itemPivot(2)).as("金額"), itemPivot(3).as("内容"),
          itemPivot(4).as("支払先選択"),
          itemPivot(5).as("取引先名（既存）"),
          itemPivot(6).as("取引先名（新規）"),
          itemPivot(7).as("支払日"), itemPivot(8).as("振込手数料"),
          itemPivot(9).as("源泉徴収税"),
          yen(itemPivot(10)).as("源泉徴収税額"),
          itemPivot(11).as("請求書の添付"),
          itemPivot(12).as("請求書の受取方法"),
          itemPivot(13).as("支払い頻度"), itemPivot(14).as("備考"),
          itemPivot(15).as("【申請にあたっての確認事項】"))): _*)

  /** 書式4-4 口座振替 (create_views.sql:588-634). */
  def viewPaymentRequest44(rd: DataFrame = viewRequestDetails): DataFrame =
    format4Base(rd, 9782279L, withJournals = false)
      .groupBy(col("id").as("申請ID"))
      .agg(commonHeader.head,
        (commonHeader.tail ++ Seq(
          itemPivot(0).as("関連申請"), itemPivot(1).as("支払の内訳"),
          itemPivot(2).as("計上日"), yen(itemPivot(3)).as("金額"),
          itemPivot(4).as("内容"), itemPivot(5).as("支払先選択"),
          itemPivot(6).as("取引先名（既存）"),
          itemPivot(7).as("取引先名（新規）"),
          itemPivot(8).as("支払日"), itemPivot(9).as("振込手数料"),
          itemPivot(10).as("源泉徴収税"),
          yen(itemPivot(11)).as("源泉徴収税額"),
          itemPivot(12).as("請求書の添付"),
          itemPivot(13).as("請求書の受取方法"),
          itemPivot(14).as("支払頻度"), itemPivot(15).as("備考"))): _*)

  /** 書式4-5 コーポレートカード領収書提出 (create_views.sql:638-680). */
  def viewPaymentRequest45(rd: DataFrame = viewRequestDetails): DataFrame =
    format4Base(rd, 29608169L, withJournals = false)
      .groupBy(col("id").as("申請ID"))
      .agg(commonHeader.head,
        (commonHeader.tail ++ Seq(
          itemPivot(0).as("関連申請"), itemPivot(1).as("カードの種類"),
          itemPivot(2).as("支払の内訳"), itemPivot(3).as("計上日"),
          yen(itemPivot(4)).as("金額"), itemPivot(5).as("内容"),
          itemPivot(6).as("支払先名"), itemPivot(7).as("決済日"),
          itemPivot(8).as("領収書等の添付"),
          itemPivot(9).as("領収書等の受取方法"),
          itemPivot(10).as("支払頻度"), itemPivot(11).as("備考"))): _*)

  /** Register every view as a temp view so `spark.sql` works over the
    * same names (`gateway.py:125-126` analog). */
  def registerAll(): Unit = {
    // views are lazy thunks: a deployment that only ingested some
    // endpoints can still register the views its tables support
    val all: Seq[(String, () => DataFrame)] = Seq[(String, () => DataFrame)](
      "view_user_details" -> (() => viewUserDetails),
      "view_user_group_position" -> (() => viewUserGroupPosition),
      "view_groups" -> (() => viewGroups),
      "view_positions" -> (() => viewPositions),
      "view_forms" -> (() => viewForms),
      "view_companies" -> (() => viewCompanies),
      "view_request_details" -> (() => viewRequestDetails),
      "view_approval_process" -> (() => viewApprovalProcess),
      "view_expense_specifics" -> (() => viewExpenseSpecifics),
      "view_form_items" -> (() => viewFormItems),
      "view_form_items_by_name" -> (() => viewFormItemsByName),
      "view_request_approval_history" -> (() => viewRequestApprovalHistory),
      "view_expense_report_f3" -> (() => viewExpenseReportFormat3()),
      "view_expense_report_f3_detail" -> (() => viewExpenseReportFormat3Detail()),
      "view_expense_report_f33" -> (() => viewExpenseReportFormat33()),
      "view_expense_report_f33_detail" ->
        (() => viewExpenseReportFormat33Detail()),
      "view_payment_request_41" ->
        (() => viewPaymentRequest41()),
      "view_payment_request_42" ->
        (() => viewPaymentRequest42()),
      "view_payment_request_43" ->
        (() => viewPaymentRequest43()),
      "view_payment_request_44" ->
        (() => viewPaymentRequest44()),
      "view_payment_request_45" ->
        (() => viewPaymentRequest45()))
    // Spark 4 temp-view identifiers are ASCII-only, so the CSV views
    // use stable ASCII aliases for their reference names (the mapping
    // is documented in each view's Scaladoc). ONLY a missing silver
    // table (not yet ingested → tbl throws MissingTableException,
    // nothing else does) skips a view; any other failure — including
    // an incidental NoSuchElementException from a buggy view body —
    // is a real bug and must surface, not silently unregister.
    all.foreach { case (n, mk) =>
      try mk().createOrReplaceTempView(n)
      catch { case _: Views.MissingTableException => () }
    }
  }
}

object Views {
  /** Thrown only by the silver-table lookup, so registerAll can skip
    * exactly the not-yet-ingested case. */
  final class MissingTableException(table: String)
    extends RuntimeException(s"silver table not ingested: $table")
}
