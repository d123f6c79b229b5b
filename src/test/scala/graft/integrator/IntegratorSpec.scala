package graft.integrator

import graft.{Fixtures, SparkSpec}
import graft.ingest.Ingest
import org.apache.spark.sql.functions._

/** End-to-end 4-phase run against a synthetic API (SURVEY §3.1): fetch
  * → shred → merge → views, then an incremental second run that picks
  * up only new/changed data via watermarks and open-status refetch.
  */
class IntegratorSpec extends SparkSpec {

  import IntegratorSpec.SyntheticApi

  test("full 4-phase run + incremental second run") {
    val dir = java.nio.file.Files.createTempDirectory("graft-int").toString
    val api = new SyntheticApi
    val integ = new Integrator(spark, api, dir)

    // ---- run 1: cold start ------------------------------------------
    IntegratorSpec.SyntheticApi.detailCalls.clear()
    val views = integ.run()
    // each request fetched EXACTLY once (the DLQ probe / DLQ write /
    // parse must not re-execute the fetch pipeline — 5000 req/h budget)
    import scala.jdk.CollectionConverters._
    val calls = IntegratorSpec.SyntheticApi.detailCalls.asScala
      .map { case (k, v) => k -> v.get() }.toMap
    assert(calls == Map("sa-10" -> 1, "sa-11" -> 1),
      s"detail fetches must run once per id, saw $calls")
    assert(integ.readTable("users").get.count() == 2)
    assert(integ.readTable("requests").get.count() == 2)
    assert(integ.readTable("expense_specific_rows").get.count() == 3)
    val f3 = views.viewExpenseReportFormat3().orderBy("申請ID").collect()
    assert(f3.length == 2)
    assert(f3.head.getAs[String]("申請ステータス") == "完了")
    // watermark committed per form
    val wm = integ.readTable("_watermarks").get.collect()
    assert(wm.length == 1 &&
      wm.head.getTimestamp(1).toString.startsWith("2024-08-05"))

    // ---- run 2: sa-11 progresses to completed; nothing else new -----
    api.requests += ("sa-11" -> Fixtures.requestSa11
      .replace("\"in_progress\"", "\"completed\"")
      .replace("\"final_approved_date\": null",
        "\"final_approved_date\": \"2024/08/06 12:00:00\""))
    // outline returns nothing (all applied before the watermark) — the
    // open-status refetch (T3) must still re-pull sa-11
    integ.run()
    val reqs = integ.readTable("requests").get
      .select("id", "status").orderBy("id").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(reqs.toSeq == Seq("sa-10" -> "completed",
      "sa-11" -> "completed"),
      "open-status request must be re-fetched and merged")
    // still exactly 2 requests and 3 expense rows (idempotent merges)
    assert(integ.readTable("requests").get.count() == 2)
    assert(integ.readTable("expense_specific_rows").get.count() == 3)
  }

  test("fetch failures land in the DLQ, run continues") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    val api = new SyntheticApi {
      override def fetchDetail(apiType: String, id: String) =
        if (id == "sa-11") Left("500 flaky") else super.fetchDetail(apiType, id)
    }
    val integ = new Integrator(spark, api, dir)
    integ.run()
    assert(integ.readTable("requests").get.count() == 1) // sa-10 only
    val dlq = integ.readTable("_dlq").get.collect()
    assert(dlq.length == 1 && dlq.head.getAs[String]("item_id") == "sa-11")
  }
}

object IntegratorSpec {
  /** Synthetic Jobcan API: masters + 2 requests; mutable so run 2 can
    * see new data.
    */
  class SyntheticApi extends Ingest.Fetcher {
    @volatile var requests: Map[String, String] = Map(
      "sa-10" -> Fixtures.requestSa10, "sa-11" -> Fixtures.requestSa11)
    @volatile var outline: Seq[String] = Seq(
      """{"id": "sa-10", "form_id": 54142953, "status": "completed",
         "applied_date": "2024/08/01 09:30:00"}""",
      """{"id": "sa-11", "form_id": 54142953, "status": "in_progress",
         "applied_date": "2024/08/05 11:00:00"}""")

    def fetchPage(apiType: String, query: Map[String, String],
        pageToken: Option[String]): Ingest.Page = apiType match {
      case "users" => Ingest.Page(Seq(Fixtures.user1, Fixtures.user2), None)
      case "groups" => Ingest.Page(Seq(Fixtures.group1), None)
      case "positions" => Ingest.Page(Seq(Fixtures.position1), None)
      case "projects" => Ingest.Page(Seq(Fixtures.project1), None)
      case "companies" => Ingest.Page(Seq(Fixtures.company1), None)
      case "fix_journals" => Ingest.Page(Seq(Fixtures.fixJournal1), None)
      case "forms" => Ingest.Page(Seq(Fixtures.form1), None)
      case "request_outline" =>
        if (query.get("status").contains("canceled_after_completion"))
          Ingest.Page(Nil, None) // T2 re-sweep: nothing canceled
        else {
          // honor the applied_after watermark pushdown (S3)
          val after = query.get("applied_after")
          val filtered = outline.filter { doc =>
            after.forall(a => doc.split("applied_date\": \"")(1)
              .takeWhile(_ != '"') > a)
          }
          Ingest.Page(filtered, None)
        }
      case other => Ingest.Page(Nil, None, 404, Some(s"unknown $other"))
    }

    def fetchDetail(apiType: String, id: String): Either[String, String] = {
      SyntheticApi.detailCalls.computeIfAbsent(id,
        _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
      requests.get(id).toRight(s"404 $id")
    }
  }

  object SyntheticApi {
    /** per-id detail-fetch call counter (local mode: executors share
      * the JVM, so a static map observes executor-side calls) */
    val detailCalls =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.atomic.AtomicInteger]
  }
}
