package graft.tools

import graft.model.JobcanSchemas
import graft.normalize.Normalize
import graft.views.Views
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Quickstart CLI: ingest the bundled Jobcan-shaped fixture documents
  * (src/main/resources/fixtures), shred them to silver tables, stack
  * the view layer, and print the CSV-export views — the whole engine
  * end to end in one command:
  *
  *   java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.JobcanDemo
  *   (SPARK_JARS = the glob over the Spark jar directory)
  *
  * Pass a directory of request-detail JSON documents (one per line or
  * file) as arg 1 to shred your own bronze data instead of the bundled
  * fixtures (masters still come from the fixtures).
  */
object JobcanDemo {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def fixtureDf(spark: SparkSession, schema: StructType,
      names: String*): DataFrame =
    docsDf(spark, schema, names.map(resource))

  private def docsDf(spark: SparkSession, schema: StructType,
      docs: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(docs.toDS)
  }

  /** Build the full silver-table map from bundled fixtures. */
  def fixtureTables(spark: SparkSession): Map[String, DataFrame] =
    tablesFrom(spark, resource)

  /** Same silver-table map, but documents read from a directory (the
    * randomized-fixture fidelity sweep: scripts/gen_fixture.py writes
    * seeded variants under one dir, reference_oracle.py and this both
    * consume them, compare_reference.py diffs the view layers).
    */
  def fixtureTablesFrom(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val base = java.nio.file.Paths.get(dir)
    tablesFrom(spark,
      name => java.nio.file.Files.readString(base.resolve(name)))
  }

  private def tablesFrom(spark: SparkSession,
      load: String => String): Map[String, DataFrame] = {
    def df(schema: StructType, names: String*): DataFrame =
      docsDf(spark, schema, names.map(load))
    Normalize.users(df(JobcanSchemas.userSchema,
      "user1.json", "user2.json")) ++
      Normalize.requests(df(JobcanSchemas.requestDetailSchema,
        "request_sa10.json", "request_sa11.json", "request_sa12.json")) ++
      Normalize.fixJournals(df(JobcanSchemas.fixJournalSchema,
        "fix_journal1.json", "fix_journal2.json", "fix_journal3.json")) ++
      Map(
        "groups" -> Normalize.groups(df(JobcanSchemas.groupSchema,
          "group1.json")),
        "positions" -> Normalize.positions(df(JobcanSchemas.positionSchema,
          "position1.json")),
        "projects" -> Normalize.projects(df(JobcanSchemas.projectSchema,
          "project1.json")),
        "companies" -> Normalize.companies(df(JobcanSchemas.companySchema,
          "company1.json")),
        "forms" -> Normalize.forms(df(JobcanSchemas.formSchema,
          "form1.json")))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("jobcan-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = if (args.nonEmpty) {
      val own = spark.read.schema(JobcanSchemas.requestDetailSchema)
        .json(args(0))
      fixtureTables(spark) ++ Normalize.requests(own)
    } else fixtureTables(spark)
    println(s"silver tables: ${tables.size}")
    tables.toSeq.sortBy(_._1).foreach { case (n, df) =>
      println(f"  $n%-36s ${df.count()}%4d rows") }

    val views = new Views(tables)
    views.registerAll()
    println("\nview_request_details:")
    views.viewRequestDetails.show(5, truncate = false)
    println("view_立替精算(書式3) [view_expense_report_f3]:")
    views.viewExpenseReportFormat3().show(5, truncate = false)
    println("approval history:")
    views.viewRequestApprovalHistory.show(5, truncate = false)
    println("SQL over registered views:")
    spark.sql(
      """SELECT `申請ID`, `申請ステータス`, `金額`
         FROM view_expense_report_f3 ORDER BY `申請ID`""")
      .show(truncate = false)

    // the retrieve() read API: silver tables → nested JSON documents
    println("reassembled documents (retrieve() analog):")
    graft.docs.Reassembly.toJsonDocs(tables)
      .orderBy("id").collect()
      .foreach(r => println(s"  ${r.getString(0)}: " +
        r.getString(1).take(160) + "..."))
    spark.stop()
  }
}
