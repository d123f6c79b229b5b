package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rebuild the nested `/v1/requests/{id}` API document from the silver
  * tables — the Spark rewrite of the reference's `retrieve()` read path
  * (`_requests.py:125-199` + the 8 sub-retrievals, SURVEY §3.3).
  *
  * Where the reference runs per-parent correlated scalar subqueries
  * with SQLite JSON1 (`_expense.py:271-345` etc.), this builds every
  * child level ONCE with `collect_list(struct(...))` sorted inside the
  * aggregation, then joins each level to its parent — O(tables) joins
  * total, not O(requests) queries; all shuffles are keyed by
  * request_id so at scale they co-partition.
  *
  * The recursive-CTE `repeated_files` (R1,
  * `_default_attachment_files.py:59-86`) becomes
  * `explode(array_repeat(file, default_attachment))`.
  *
  * Round-trip invariant (spec'd in ReassemblySpec, mirroring the
  * reference's only strong invariant): for any document d,
  * `reassemble(normalize(d)) == d` modulo timestamp canonicalization.
  */
object Reassembly {

  private def fmtTs(c: Column): Column =
    date_format(c, "yyyy/MM/dd HH:mm:ss")
  private def fmtDate(c: Column): Column = date_format(c, "yyyy/MM/dd")

  /** collect_list(struct(sortKey, payload)) sorted by sortKey, then
    * stripped to payload — deterministic nested-array assembly (W2). */
  private[docs] def sortedList(sortKey: Column, payload: Column): Column =
    transform(
      array_sort(collect_list(struct(sortKey.as("k"), payload.as("v")))),
      x => x.getField("v"))

  private def emptyArr(elemType: String): Column =
    array().cast(s"array<$elemType>")

  /** Typed empty-array literal matching `df`'s `field` column — the
    * API emits [] (never null) for an empty child collection, so
    * every left-joined array child coalesces to this. Deriving the
    * type from the child frame's own schema avoids hand-maintaining
    * a second copy of the DDL. */
  private def emptyLike(df: DataFrame, field: String): Column =
    array().cast(df.schema(field).dataType)

  /** Composed DDL strings for empty-array casts (composed, not
    * hand-written — nested `>` counting is how bugs happen). */
  private val fileDdl =
    "struct<id:string,name:string,type:string,user_name:string," +
      "date:string,deleted:boolean>"
  private val gmDdl =
    "struct<record_name:string,record_code:string," +
      "additional_items:array<string>>"
  private val cellDdl =
    s"struct<column_number:bigint,value:string,generic_master:$gmDdl>"
  private val tableDdl = s"array<array<$cellDdl>>"
  private val ciDdl =
    s"array<struct<title:string,content:string,generic_master:$gmDdl," +
      s"files:array<$fileDdl>,table:$tableDdl>>"

  def reassemble(t: Map[String, DataFrame]): DataFrame = {
    val req = t("requests").alias("req")

    // ---- shared: files joined to their associations ------------------
    val filesFull = t("file_associations").alias("fa")
      .join(t("files").alias("fi"), col("fa.file_id") === col("fi.id"))
      .select(col("fa.request_id").as("request_id"),
        col("fa.customized_item_index"),
        col("fa.expense_specific_row_key"),
        col("fa.approval_step_index"),
        col("fa.is_after_completion"),
        col("fa.default_attachment"),
        struct(col("fi.id"), col("fi.name"), col("fi.type"),
          col("fi.user_name"), fmtTs(col("fi.date")).as("date"),
          col("fi.deleted")).as("file"))

    def filesFor(cond: Column, keyCols: Seq[String]): DataFrame =
      filesFull.filter(cond)
        .groupBy((Seq("request_id") ++ keyCols).map(col): _*)
        .agg(sortedList(col("file.id"), col("file")).as("files"))

    // ---- customized_items -------------------------------------------
    val gmAdd = t("generic_master_additional_items")
      .groupBy(col("record_name").as("gm_rn"), col("record_code").as("gm_rc"))
      .agg(sortedList(col("item_index"), col("item_value"))
        .as("additional_items"))
    val gmFull = t("generic_masters").alias("gm")
      .join(gmAdd, col("gm.record_name") <=> col("gm_rn") &&
        col("gm.record_code") <=> col("gm_rc"), "left")
      .select(col("gm.request_id").as("request_id"),
        col("gm.item_index").as("item_index"),
        col("gm.index_1").as("index_1"), col("gm.index_2").as("index_2"),
        struct(col("gm.record_name").as("record_name"),
          col("gm.record_code").as("record_code"),
          coalesce(col("additional_items"), emptyArr("string"))
            .as("additional_items")).as("gm"))

    val cellsWithGm = t("table_data").alias("td")
      .join(gmFull.filter(col("index_1").isNotNull).alias("cgm"),
        col("td.request_id") === col("cgm.request_id") &&
          col("td.item_index") === col("cgm.item_index") &&
          col("td.index_1") === col("cgm.index_1") &&
          col("td.index_2") === col("cgm.index_2"), "left")
      .select(col("td.request_id").as("request_id"),
        col("td.item_index").as("item_index"),
        col("td.index_1").as("index_1"), col("td.index_2").as("index_2"),
        struct(col("td.column_number").as("column_number"),
          col("td.value").as("value"), col("cgm.gm").as("generic_master"))
          .as("cell"))
    val innerRows = cellsWithGm
      .groupBy(col("request_id"), col("item_index"), col("index_1"))
      .agg(sortedList(col("index_2"), col("cell")).as("cells"))
    val tables2d = innerRows
      .groupBy(col("request_id"), col("item_index"))
      .agg(sortedList(col("index_1"), col("cells")).as("table"))

    val ciFiles = filesFor(col("customized_item_index").isNotNull,
      Seq("customized_item_index"))
      .withColumnRenamed("customized_item_index", "item_index")
    val itemGm = gmFull.filter(col("index_1").isNull)
      .select(col("request_id"), col("item_index"), col("gm"))
    val customizedItems = t("customized_items").alias("ci")
      .join(itemGm.alias("ig"), Seq("request_id", "item_index"), "left")
      .join(ciFiles.alias("cf"), Seq("request_id", "item_index"), "left")
      .join(tables2d.alias("t2"), Seq("request_id", "item_index"), "left")
      .groupBy(col("request_id"))
      .agg(sortedList(col("item_index"),
        struct(col("title"), col("content"), col("gm").as("generic_master"),
          coalesce(col("files"), emptyArr(fileDdl)).as("files"),
          coalesce(col("table"), expr("array()").cast(tableDdl))
            .as("table")))
        .as("customized_items"))

    // ---- expense -----------------------------------------------------
    val extItems = t("custom_item_value_extension_items")
      .groupBy(col("request_id"), col("col_number"), col("row_number"),
        col("item_index"))
      .agg(sortedList(col("ext_index"),
        struct(col("name"), col("value"))).as("extension_items"))
    val itemValues = t("custom_item_values").alias("civ")
      .join(extItems.alias("ei"),
        Seq("request_id", "col_number", "row_number", "item_index"), "left")
      .select(col("request_id"), col("col_number"), col("row_number"),
        col("item_index"),
        struct(col("generic_master_code"),
          col("generic_master_record_name"),
          col("generic_master_record_code"), col("content"), col("memo"),
          coalesce(col("extension_items"),
            emptyArr("struct<name:string,value:string>"))
            .as("extension_items")).as("value"))
    val customItems = t("custom_items").alias("cit")
      .join(itemValues.alias("iv"),
        Seq("request_id", "col_number", "row_number", "item_index"), "left")
      .groupBy(col("request_id"), col("col_number"), col("row_number"))
      .agg(sortedList(col("item_index"),
        struct(col("name"), col("item_type"), col("value")))
        .as("custom_items"))
    val esrFiles = filesFor(col("expense_specific_row_key").isNotNull,
      Seq("expense_specific_row_key"))
    val expenseRows = t("expense_specific_rows").alias("esr")
      .join(customItems.alias("cim"),
        Seq("request_id", "col_number", "row_number"), "left")
      .join(esrFiles.alias("ef"),
        concat_ws("/", col("esr.col_number"), col("esr.row_number")) ===
          col("ef.expense_specific_row_key") &&
          col("esr.request_id") === col("ef.request_id"), "left")
      .groupBy(col("esr.request_id").as("request_id"),
        col("esr.col_number").as("col_number"))
      .agg(sortedList(col("esr.row_number").cast("int"),
        struct(col("esr.row_number").as("row_number"),
          fmtDate(col("esr.use_date")).as("use_date"),
          col("esr.group_name").as("group_name"),
          col("esr.project_name").as("project_name"),
          col("esr.content_description").as("content_description"),
          col("esr.breakdown").as("breakdown"),
          col("esr.amount").as("amount"),
          coalesce(col("cim.custom_items"), expr("array()").cast(
            "array<struct<name:string,item_type:string,value:struct<" +
              "generic_master_code:string,generic_master_record_name:string," +
              "generic_master_record_code:string,content:string,memo:string," +
              "extension_items:array<struct<name:string,value:string>>>>>"))
            .as("custom_items"),
          coalesce(col("ef.files"), emptyArr(fileDdl)).as("files")))
        .as("rows"))
    val expenseSpecifics = t("expense_specifics").alias("esp")
      .join(expenseRows.alias("er"), Seq("request_id", "col_number"), "left")
      .groupBy(col("request_id"))
      .agg(sortedList(col("col_number"),
        struct(col("type"), col("rows"))).as("specifics"))
    val expenseDoc = t("expense").alias("exp")
      .join(expenseSpecifics.alias("esj"), Seq("request_id"), "left")
      .select(col("request_id"),
        struct(col("amount"), col("related_request_title"),
          col("related_request_id"), col("use_suspense_payment"),
          col("content_description"), col("advanced_payment"),
          col("suspense_payment_amount"),
          coalesce(col("specifics"),
            emptyLike(expenseSpecifics, "specifics")).as("specifics"))
          .as("expense"))

    // ---- payment -----------------------------------------------------
    val paymentRows = t("payment_specific_rows")
      .groupBy(col("request_id"), col("col_number"))
      .agg(sortedList(col("row_number").cast("int"),
        struct(col("company_name"), col("zip_code"), col("address"),
          col("bank_name"), col("bank_name_kana"),
          col("bank_account_name_kana"), col("bank_code"),
          col("branch_code"), col("row_number"),
          fmtDate(col("use_date")).as("use_date"), col("group_name"),
          col("project_name"), col("content_description"),
          col("breakdown"), col("amount"),
          emptyArr(fileDdl).as("files"))).as("rows"))
    val paymentSpecifics = t("payment_specifics")
      .join(paymentRows, Seq("request_id", "col_number"), "left")
      .groupBy(col("request_id"))
      .agg(sortedList(col("col_number"),
        struct(col("type"), col("rows"))).as("specifics"))
    val paymentDoc = t("payment")
      .join(paymentSpecifics, Seq("request_id"), "left")
      .select(col("request_id"),
        struct(col("amount"), col("related_request_title"),
          col("related_request_id"), col("content_description"),
          coalesce(col("specifics"),
            emptyLike(paymentSpecifics, "specifics")).as("specifics"))
          .as("payment"))

    // ---- ec ----------------------------------------------------------
    val ecRows = t("ec_specific_rows")
      .groupBy(col("request_id"))
      .agg(sortedList(col("row_number"),
        struct(col("row_number"), col("item_name"), col("item_url"),
          col("item_id"), col("manufacturer_name"), col("sold_by"),
          col("fulfilled_by"), col("unit_price"), col("quantity"),
          col("subtotal"), emptyArr(fileDdl).as("files"))).as("rows"))
    val ecSpec = t("ec_specifics")
      .join(ecRows, Seq("request_id"), "left")
      .select(col("request_id"),
        struct(col("order_id"),
          fmtTs(col("retention_deadline")).as("retention_deadline"),
          col("tax_amount"), col("shipping_amount"), col("total_price"),
          col("total_amount"),
          coalesce(col("rows"), emptyLike(ecRows, "rows")).as("rows"))
          .as("specifics"))
    val ship = t("shipping_address")
      .select(col("request_id"),
        struct(col("shipping_address_name"), col("zip_code"),
          col("country"), col("state"), col("city"), col("address1"),
          col("address2"), col("company_name"), col("contact_name"),
          col("tel"), col("email")).as("shipping_address"))
    val ecDoc = t("ec")
      .join(ship, Seq("request_id"), "left")
      .join(ecSpec, Seq("request_id"), "left")
      .select(col("request_id"),
        struct(col("related_request_id"), col("related_request_title"),
          col("content_description"), col("billing_destination"),
          col("shipping_address"), col("specifics")).as("ec"))

    // ---- approval process -------------------------------------------
    val commentStruct = struct(col("user_name"), fmtTs(col("date")).as("date"),
      col("text"), col("deleted"))
    val approverComments = t("comment_associations").alias("ca")
      .join(t("comments").alias("cm"),
        col("ca.user_name") <=> col("cm.user_name") &&
          col("ca.date") <=> col("cm.date") &&
          col("ca.text") <=> col("cm.text"))
      .select(col("ca.request_id").as("request_id"),
        col("ca.step_index").as("step_index"),
        col("ca.is_after_completion").as("is_after_completion"),
        col("cm.user_name").as("user_name"), col("cm.date").as("date"),
        col("cm.text").as("text"), col("cm.deleted").as("deleted"))
    // comments/files attach at the STEP level (the API's real shape,
    // _approval_process.py:91-117)
    val stepComments = approverComments
      .filter(!col("is_after_completion"))
      .groupBy(col("request_id"), col("step_index"))
      .agg(sortedList(struct(col("date"), col("text")), commentStruct)
        .as("comments"))
    val stepFiles = filesFor(col("approval_step_index").isNotNull,
      Seq("approval_step_index"))
      .withColumnRenamed("approval_step_index", "step_index")
    val approverList = t("approvers")
      .groupBy(col("request_id"), col("step_index"))
      .agg(sortedList(col("approver_index"),
        struct(col("status"), fmtTs(col("approved_date")).as("approved_date"),
          col("approver_name"), col("approver_code"),
          col("proxy_approver_name"), col("proxy_approver_code")))
        .as("approvers"))
    val stepList = t("approval_steps").alias("ast")
      .join(approverList.alias("avl"), Seq("request_id", "step_index"), "left")
      .join(stepComments.alias("sc"), Seq("request_id", "step_index"), "left")
      .join(stepFiles.alias("sf"), Seq("request_id", "step_index"), "left")
      .groupBy(col("request_id"))
      .agg(sortedList(col("step_index"),
        struct(col("name"), col("condition"), col("status"),
          coalesce(col("approvers"),
            emptyLike(approverList, "approvers")).as("approvers"),
          coalesce(col("comments"), expr("array()").cast(
            "array<struct<user_name:string,date:string,text:string," +
              "deleted:boolean>>")).as("comments"),
          coalesce(col("files"), emptyArr(fileDdl)).as("files")))
        .as("steps"))
    val apLogs = t("approval_route_modify_logs")
      .groupBy(col("request_id"))
      .agg(sortedList(col("log_index"),
        struct(fmtTs(col("date")).as("date"), col("user_name")))
        .as("approval_route_modify_logs"))
    val aacComments = approverComments.filter(col("is_after_completion"))
      .groupBy(col("request_id"))
      .agg(sortedList(struct(col("date"), col("text")), commentStruct)
        .as("aac_comments"))
    val aacFiles = filesFor(col("is_after_completion"), Seq())
      .withColumnRenamed("files", "aac_files")
    val approvalDoc = t("approval_process")
      .join(apLogs, Seq("request_id"), "left")
      .join(stepList, Seq("request_id"), "left")
      .join(aacComments, Seq("request_id"), "left")
      .join(aacFiles, Seq("request_id"), "left")
      .select(col("request_id"),
        struct(col("is_route_changed_by_applicant"),
          coalesce(col("approval_route_modify_logs"),
            emptyArr("struct<date:string,user_name:string>"))
            .as("approval_route_modify_logs"),
          coalesce(col("steps"), emptyLike(stepList, "steps"))
            .as("steps"),
          struct(
            coalesce(col("aac_comments"), expr("array()").cast(
              "array<struct<user_name:string,date:string,text:string," +
                "deleted:boolean>>")).as("comments"),
            coalesce(col("aac_files"), emptyArr(fileDdl)).as("files"))
            .as("after_completion")).as("approval_process"))

    // ---- viewers / default attachments / modify logs -----------------
    val viewersDoc = t("viewers")
      .groupBy(col("request_id"))
      .agg(sortedList(col("viewer_index"),
        struct(col("user_name"), col("status"),
          col("group_name").as("group"), col("position"))).as("viewers"))
    // R1: repeat each default-attachment file `default_attachment`
    // times — explode(array_repeat(...)) replaces the recursive CTE
    val defaultFiles = filesFull
      .filter(col("default_attachment") > 0)
      .select(col("request_id"),
        explode(array_repeat(col("file"), col("default_attachment")))
          .as("file"))
      .groupBy(col("request_id"))
      .agg(sortedList(col("file.id"), col("file"))
        .as("default_attachment_files"))
    val mlSpecifics = t("modify_log_detail_specifics")
      .groupBy(col("request_id"), col("log_index"), col("log_detail_index"))
      .agg(sortedList(col("specific_index"),
        struct(col("status"), col("difference"))).as("specifics"))
    val mlDetails = t("modify_log_details")
      .join(mlSpecifics, Seq("request_id", "log_index", "log_detail_index"),
        "left")
      .groupBy(col("request_id"), col("log_index"))
      .agg(sortedList(col("log_detail_index"),
        struct(col("title"), col("old_value").as("old"),
          col("new_value").as("new"), col("log_type"),
          coalesce(col("specifics"),
            emptyArr("struct<status:string,difference:string>"))
            .as("specifics"))).as("detail"))
    val modifyLogsDoc = t("modify_logs")
      .join(mlDetails, Seq("request_id", "log_index"), "left")
      .groupBy(col("request_id"))
      .agg(sortedList(col("log_index"),
        struct(fmtTs(col("date")).as("date"), col("user_name"),
          col("detail"))).as("modify_logs"))

    // ---- assemble ----------------------------------------------------
    def lj(base: DataFrame, child: DataFrame): DataFrame =
      base.join(child.withColumnRenamed("request_id", "__rid"),
        col("req.id") === col("__rid"), "left").drop("__rid")

    val joined = Seq(customizedItems, expenseDoc, paymentDoc, ecDoc,
      approvalDoc, viewersDoc, defaultFiles, modifyLogsDoc)
      .foldLeft(req.toDF().alias("req"))((b, c) => lj(b, c))

    joined.select(
      col("req.id").as("id"), col("req.title").as("title"),
      col("req.status").as("status"), col("req.form_id").as("form_id"),
      col("req.form_name").as("form_name"),
      col("req.form_type").as("form_type"),
      col("req.settlement_type").as("settlement_type"),
      fmtTs(col("req.applied_date")).as("applied_date"),
      col("req.applicant_code").as("applicant_code"),
      col("req.applicant_last_name").as("applicant_last_name"),
      col("req.applicant_first_name").as("applicant_first_name"),
      col("req.applicant_group_name").as("applicant_group_name"),
      col("req.applicant_group_code").as("applicant_group_code"),
      col("req.applicant_position_name").as("applicant_position_name"),
      col("req.proxy_applicant_last_name").as("proxy_applicant_last_name"),
      col("req.proxy_applicant_first_name").as("proxy_applicant_first_name"),
      col("req.group_name").as("group_name"),
      col("req.group_code").as("group_code"),
      col("req.project_name").as("project_name"),
      col("req.project_code").as("project_code"),
      col("req.flow_step_name").as("flow_step_name"),
      col("req.is_content_changed").as("is_content_changed"),
      col("req.total_amount").as("total_amount"),
      fmtTs(col("req.pay_at")).as("pay_at"),
      fmtTs(col("req.final_approval_period")).as("final_approval_period"),
      fmtTs(col("req.final_approved_date")).as("final_approved_date"),
      struct(
        coalesce(col("customized_items"), expr("array()").cast(ciDdl))
          .as("customized_items"),
        col("expense"), col("payment"), col("ec"),
        col("approval_process"),
        coalesce(col("viewers"), expr("array()").cast(
          "array<struct<user_name:string,status:string,group:string," +
            "position:string>>")).as("viewers"),
        coalesce(col("default_attachment_files"), emptyArr(fileDdl))
          .as("default_attachment_files"),
        coalesce(col("modify_logs"), expr("array()").cast(
          "array<struct<date:string,user_name:string,detail:array<" +
            "struct<title:string,old:string,new:string," +
            "log_type:string,specifics:array<struct<status:string," +
            "difference:string>>>>>>")).as("modify_logs"))
        .as("detail"))
  }

  /** The JSON read-API edge (`retrieve()` output): one JSON document
    * per request. */
  def toJsonDocs(t: Map[String, DataFrame]): DataFrame =
    reassemble(t).select(col("id"),
      to_json(struct(col("*"))).as("doc"))
}
