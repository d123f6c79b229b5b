package graft.tools

import graft.views.Views
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** Dump every view over the bundled fixture documents as JSON — one
  * file per view, named like scripts/reference_oracle.py names them —
  * so scripts/compare_reference.py can diff this engine against the
  * REFERENCE ENGINE ITSELF running on identical input.
  *
  *   ViewsDump <outDir> [fixtureDir]
  *
  * With no fixtureDir the bundled resources are used; with one, the
  * same-named JSON documents are read from it (the randomized-fixture
  * sweep: scripts/gen_fixture.py → this + reference_oracle.py →
  * compare_reference.py).
  */
object ViewsDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      s"usage: ViewsDump <outDir> [fixtureDir]; got ${args.toSeq}")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables =
      if (args.length == 2) JobcanDemo.fixtureTablesFrom(spark, args(1))
      else JobcanDemo.fixtureTables(spark)
    dumpAll(tables, outDir)
    spark.stop()
  }

  /** The 21-view dump used by both the single-shot main and the
    * multi-seed FidelitySweep (one SparkSession, N fixture sets). */
  def dumpAll(tables: Map[String, DataFrame],
      outDir: java.nio.file.Path): Unit = {
    Files.createDirectories(outDir)
    val views = new Views(tables)
    val dump: Seq[(String, DataFrame)] = Seq(
      "view_user_details" -> views.viewUserDetails,
      "view_user_group_position" -> views.viewUserGroupPosition,
      "view_groups" -> views.viewGroups,
      "view_positions" -> views.viewPositions,
      "view_forms" -> views.viewForms,
      "view_companies" -> views.viewCompanies,
      "view_request_details" -> views.viewRequestDetails,
      "view_approval_process" -> views.viewApprovalProcess,
      "view_expense_specifics" -> views.viewExpenseSpecifics,
      "view_form_items" -> views.viewFormItems,
      "view_form_items_by_name" -> views.viewFormItemsByName,
      "view_request_approval_history" -> views.viewRequestApprovalHistory,
      "view_立替精算(書式3)" -> views.viewExpenseReportFormat3(),
      "view_立替精算(書式3)_明細" -> views.viewExpenseReportFormat3Detail(),
      "view_立替精算・交通費(書式3-3.)" -> views.viewExpenseReportFormat33(),
      "view_立替精算・交通費(書式3-3.)_明細" ->
        views.viewExpenseReportFormat33Detail(),
      "view_支払依頼申請書（書式4-1. 支払・請求書）" ->
        views.viewPaymentRequest41(),
      "view_支払依頼申請書（書式4-2. 社員振込）" ->
        views.viewPaymentRequest42(),
      "view_支払依頼申請書（書式4-3. 窓口・コンビニ払い）" ->
        views.viewPaymentRequest43(),
      "view_支払依頼申請書（書式4-4. 口座振替）" ->
        views.viewPaymentRequest44(),
      "view_支払依頼申請書（書式4-5. コーポレートカード領収書提出）" ->
        views.viewPaymentRequest45())
    dump.foreach { case (name, df) =>
      val fn = name.replaceAll("[^0-9A-Za-z_]", "_") + ".json"
      val rows = df.toJSON.collect().mkString("[", ",", "]")
      Files.writeString(outDir.resolve(fn), rows)
      println(s"$name -> $fn")
    }
  }
}

/** Document read-API dump — graft's side of the retrieve() fidelity
  * diff. Writes the same three files scripts/reference_oracle.py
  * dumps from the reference engine itself:
  *
  *  - docs_requests.json: one nested request document per id
  *    (`docs.Reassembly.toJsonDocs`, the Spark rewrite of
  *    `_requests.py:125-199` retrieve()), keyed by request id;
  *  - docs_users.json: `docs.MasterDocs.usersDoc`
  *    (`users.py:185-266` retrieve());
  *  - docs_fix_journals.json: `docs.MasterDocs.fixJournalsDoc`
  *    (`fix_journal.py:137-214` retrieve()).
  *
  * scripts/compare_docs.py diffs them key-order-insensitively with
  * the documented reference divergences excluded.
  */
object DocsDump {
  def dumpDocs(tables: Map[String, DataFrame],
      outDir: java.nio.file.Path): Unit = {
    Files.createDirectories(outDir)
    // each doc is already a JSON text column; assemble the files as
    // raw text so nothing is re-parsed on the Scala side
    val req = graft.docs.Reassembly.toJsonDocs(tables)
      .orderBy("id").collect()
    Files.writeString(outDir.resolve("docs_requests.json"),
      req.map(r => "\"" + r.getString(0).replace("\\", "\\\\")
          .replace("\"", "\\\"") + "\": " + r.getString(1))
        .mkString("{", ",\n", "}"))
    Files.writeString(outDir.resolve("docs_users.json"),
      graft.docs.MasterDocs.usersDoc(tables)
        .orderBy("id").toJSON.collect().mkString("[", ",\n", "]"))
    Files.writeString(outDir.resolve("docs_fix_journals.json"),
      graft.docs.MasterDocs.fixJournalsDoc(tables)
        .orderBy("journal_id").toJSON.collect()
        .mkString("[", ",\n", "]"))
    println(s"docs_requests: ${req.length} documents")
  }
}

/** Multi-seed graft side of the randomized-fidelity sweep: expects
  * baseDir/s<i>/fixtures (written by scripts/gen_fixture.py), writes
  * baseDir/s<i>/graft — all seeds in ONE SparkSession so the sweep
  * doesn't pay JVM+Spark startup per seed. Dumps both the 21 views
  * AND the document read-API (DocsDump) per seed.
  *
  *   FidelitySweep <baseDir> <nSeeds>
  */
object FidelitySweep {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, s"usage: FidelitySweep <baseDir> <nSeeds>")
    val base = Paths.get(args(0))
    val n = args(1).toInt
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to n).foreach { seed =>
      val fixtures = base.resolve(s"s$seed/fixtures")
      require(Files.isDirectory(fixtures), s"missing $fixtures")
      val tables = JobcanDemo.fixtureTablesFrom(spark, fixtures.toString)
      ViewsDump.dumpAll(tables, base.resolve(s"s$seed/graft"))
      DocsDump.dumpDocs(tables, base.resolve(s"s$seed/graft"))
      println(s"seed $seed done")
    }
    spark.stop()
  }
}
