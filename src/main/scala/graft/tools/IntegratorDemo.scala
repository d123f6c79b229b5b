package graft.tools

import graft.ingest.Ingest
import graft.integrator.Integrator
import org.apache.spark.sql.SparkSession

/** Replay the full 4-phase integrator run against the bundled raw API
  * responses (the reference's SAVE_RAW_DATA replay mode,
  * api_client.py:307-334): fetch → shred → merge → views, with
  * watermarks/DLQ in a state dir.
  *
  *   IntegratorDemo [stateDir]      (default: a temp dir; run twice
  *                                   with the same dir to see the
  *                                   incremental no-op second run)
  */
object IntegratorDemo {

  /** Fetcher replaying the bundled fixture documents. */
  class ReplayFetcher extends Ingest.Fetcher {
    private def res(name: String): String = {
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      require(in != null, s"missing fixture $name")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    private val outline = Seq(
      """{"id": "sa-10", "form_id": 54142953, "status": "completed",
         "applied_date": "2024/08/01 09:30:00"}""",
      """{"id": "sa-11", "form_id": 54142953, "status": "in_progress",
         "applied_date": "2024/08/05 11:00:00"}""")

    def fetchPage(apiType: String, query: Map[String, String],
        pageToken: Option[String]): Ingest.Page = apiType match {
      case "users" => Ingest.Page(Seq(res("user1.json"), res("user2.json")), None)
      case "groups" => Ingest.Page(Seq(res("group1.json")), None)
      case "positions" => Ingest.Page(Seq(res("position1.json")), None)
      case "projects" => Ingest.Page(Seq(res("project1.json")), None)
      case "companies" => Ingest.Page(Seq(res("company1.json")), None)
      case "fix_journals" => Ingest.Page(Seq(res("fix_journal1.json")), None)
      case "forms" => Ingest.Page(Seq(res("form1.json")), None)
      case "request_outline" =>
        if (query.get("status").contains("canceled_after_completion"))
          Ingest.Page(Nil, None)
        else {
          val after = query.get("applied_after")
          Ingest.Page(outline.filter { doc =>
            after.forall(a => doc.split("applied_date\": \"")(1)
              .takeWhile(_ != '"') > a)
          }, None)
        }
      case other => Ingest.Page(Nil, None, 404, Some(s"unknown $other"))
    }

    def fetchDetail(apiType: String, id: String): Either[String, String] =
      id match {
        case "sa-10" => Right(res("request_sa10.json"))
        case "sa-11" => Right(res("request_sa11.json"))
        case _ => Left(s"404 $id")
      }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("integrator-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stateDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-state").toString)
    println(s"state dir: $stateDir")

    val t0 = System.nanoTime()
    val integ = new Integrator(spark, new ReplayFetcher, stateDir)
    val views = integ.run()
    println(f"run completed in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    graft.normalize.NormalizeTables.all.foreach { n =>
      integ.readTable(n).foreach(df =>
        println(f"  $n%-36s ${df.count()}%4d rows"))
    }
    integ.readTable("_watermarks").foreach { wm =>
      println("watermarks:"); wm.show(truncate = false) }
    println("view_expense_report_f3 via registered SQL:")
    spark.sql("""SELECT `申請ID`, `申請ステータス`, `金額`
      FROM view_expense_report_f3 ORDER BY `申請ID`""").show()
    spark.stop()
  }
}
