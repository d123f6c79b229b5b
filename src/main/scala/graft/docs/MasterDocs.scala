package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rebuild the master-table API documents from silver — the Spark
  * rewrite of each master's `retrieve()` read path:
  *
  *  - users: `database/users.py:185-266` (groups array with a 'NULL'
  *    sentinel for null group codes, positions as an array of
  *    {position_code, group_code} objects, bank account as a nested
  *    object or null)
  *  - fix_journals: `database/fix_journal.py:137-214`
  *    (`custom_journal_item_list` via a correlated
  *    `json_group_array` subquery)
  *  - the flat masters — company `company.py:73-95`, forms
  *    `forms.py:66-88`, groups `group.py:69-90`, positions
  *    `positions.py:58-78`, projects `project.py:55-74` — are plain
  *    `SELECT *` reads: the silver row IS the document.
  *
  * Where the reference GROUP_CONCATs per parent row, this builds each
  * child level once with `collect_list`/`collect_set` (map-side
  * partial aggregation) and joins to the parent keyed on user_id /
  * journal_id — at scale both sides co-partition on the same key.
  * The reference's GROUP_CONCAT(DISTINCT) emits children in scan
  * order, which SQLite does not guarantee; we pin determinism by
  * sorting inside the aggregation.
  */
object MasterDocs {

  /** users.py:212-216 encodes NULL group membership as the literal
    * string 'NULL' inside GROUP_CONCAT, decoded back to null on read
    * (users.py:258-260). Reused here so null elements survive
    * collect_set + array_sort with a total order. */
  private val NullSentinel = "NULL"

  /** `users.retrieve()`: one document per user with nested groups /
    * positions / bank_account (users.py:185-266). */
  def usersDoc(t: Map[String, DataFrame]): DataFrame = {
    // users.py:211-216 gates the groups array on COUNT(DISTINCT
    // group_code) > 0 — a user whose every membership row has a null
    // group_code gets [], not [null].
    val groups = t("user_groups")
      .groupBy(col("user_id").as("g_uid"))
      .agg(
        array_sort(collect_set(coalesce(col("group_code"),
          lit(NullSentinel)))).as("g_codes"),
        count(col("group_code")).as("g_nonnull"))
      .select(col("g_uid"),
        when(col("g_nonnull") === 0, array().cast("array<string>"))
          .otherwise(transform(col("g_codes"),
            x => when(x === NullSentinel, lit(null: String)).otherwise(x)))
          .as("user_groups"))
    // users.py:218-222 gates positions the same way, on COUNT(DISTINCT
    // position_code) > 0 — all-null position_code rows yield [], but a
    // mixed set keeps its null-coded entries.
    val positions = t("user_positions")
      .groupBy(col("user_id").as("p_uid"))
      .agg(
        array_sort(collect_set(struct(
          col("position_code").as("position_code"),
          col("group_code").as("group_code")))).as("p_structs"),
        count(col("position_code")).as("p_nonnull"))
      .select(col("p_uid"),
        when(col("p_nonnull") === 0, array().cast(
          "array<struct<position_code:string,group_code:string>>"))
          .otherwise(col("p_structs")).as("user_positions"))
    // the reference's GROUP BY u.id collapses multiple bank rows into
    // one (SQLite picks an arbitrary one); pin determinism with
    // min(struct) and guarantee the 1:1 join shape
    val bank = t("user_bank_accounts")
      .groupBy(col("user_id").as("b_uid"))
      .agg(min(struct(
        col("bank_code"), col("bank_name"), col("bank_name_kana"),
        col("branch_code"), col("branch_name"), col("branch_name_kana"),
        col("bank_account_type_code"), col("bank_account_code"),
        col("bank_account_name_kana"))).as("user_bank_account"))

    t("users").alias("u")
      .join(groups, col("u.id") === col("g_uid"), "left")
      .join(positions, col("u.id") === col("p_uid"), "left")
      .join(bank, col("u.id") === col("b_uid"), "left")
      .select(col("u.id"), col("u.user_code"), col("u.email"),
        col("u.last_name"), col("u.first_name"), col("u.is_approver"),
        col("u.user_role"), col("u.memo"),
        coalesce(col("user_groups"),
          array().cast("array<string>")).as("user_groups"),
        coalesce(col("user_positions"), array().cast(
          "array<struct<position_code:string,group_code:string>>"))
          .as("user_positions"),
        col("user_bank_account"))
  }

  /** `fix_journal.retrieve()`: the flat journal row plus its
    * `custom_journal_item_list` array (fix_journal.py:137-214). The
    * reference's correlated json_group_array subquery becomes one
    * grouped collect + one keyed join. */
  def fixJournalsDoc(t: Map[String, DataFrame]): DataFrame = {
    val items = t("custom_journal_items")
      .groupBy(col("journal_id").as("i_jid"))
      .agg(Reassembly.sortedList(col("key"), struct(
        col("key").as("key"), col("value").as("value"),
        col("generic_master_record_code")
          .as("generic_master_record_code")))
        .as("custom_journal_item_list"))
    val fj = t("fix_journals")
    fj.join(items, fj("journal_id") === col("i_jid"), "left")
      .drop("i_jid")
      .withColumn("custom_journal_item_list",
        coalesce(col("custom_journal_item_list"), array().cast(
          "array<struct<key:string,value:string," +
            "generic_master_record_code:string>>")))
  }

  /** The five flat masters: retrieve == the silver row, ordered by
    * natural key for deterministic output. */
  def flatDocs(t: Map[String, DataFrame]): Map[String, DataFrame] = Map(
    "companies" -> t("companies").orderBy("company_code"),
    "forms" -> t("forms").orderBy("id"),
    "groups" -> t("groups").orderBy("group_code"),
    "positions" -> t("positions").orderBy("position_code"),
    "projects" -> t("projects").orderBy("project_code"))

  /** The JSON read-API edge for every master table: (table, id, doc)
    * with one JSON document per row, mirroring `Reassembly.toJsonDocs`
    * for request details. */
  def toJsonDocs(t: Map[String, DataFrame]): DataFrame = {
    def docs(table: String, df: DataFrame, id: Column): DataFrame =
      df.select(lit(table).as("table"), id.cast("string").as("id"),
        to_json(struct(col("*"))).as("doc"))
    docs("users", usersDoc(t), col("id"))
      .unionByName(docs("fix_journals", fixJournalsDoc(t),
        col("journal_id")))
      .unionByName(docs("companies", t("companies"), col("company_code")))
      .unionByName(docs("forms", t("forms"), col("id")))
      .unionByName(docs("groups", t("groups"), col("group_code")))
      .unionByName(docs("positions", t("positions"),
        col("position_code")))
      .unionByName(docs("projects", t("projects"), col("project_code")))
  }
}
