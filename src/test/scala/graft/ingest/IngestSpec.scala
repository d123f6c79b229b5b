package graft.ingest

import graft.SparkSpec
import graft.model.JobcanSchemas
import org.apache.spark.sql.functions._

/** S1–S6 ingestion mechanics with a synthetic fetcher (the reference's
  * test style: mock HTTP, timing asserts —
  * test_throttled_request.py:16-78).
  */
class IngestSpec extends SparkSpec {
  import Ingest._
  import IngestSpec.FakeFetcher

  test("S1 throttle enforces the minimum interval (0.72 s analog)") {
    var now = 0L
    var slept = Seq.empty[Long]
    val t = new Throttle(720, () => now, d => { slept :+= d; now += d })
    t.acquire() // first call free
    t.acquire() // must wait 720
    now += 100
    t.acquire() // must wait 620
    assert(slept == Seq(720L, 620L))
  }

  test("throttle initial offset staggers only the FIRST acquire " +
    "(burst smoothing across fan-out partitions)") {
    var now = 0L
    var slept = Seq.empty[Long]
    val t = new Throttle(720, () => now, d => { slept :+= d; now += d },
      initialOffsetMs = 180)
    t.acquire() // staggered by the offset
    t.acquire() // then the normal interval applies
    assert(slept == Seq(180L, 720L))
  }

  test("S2 drainPages follows next-links and stops at the last page " +
    "(api_client.py:493-517)") {
    val fetcher = new FakeFetcher(Map("users" -> Seq(
      Page(Seq("{\"id\":1}"), Some("1")),
      Page(Seq("{\"id\":2}"), Some("2")),
      Page(Seq("{\"id\":3}"), None))), Map.empty)
    val pages = drainPages(fetcher, new Throttle(0), "users")
    assert(pages.size == 3)
    assert(pages.flatMap(_.results).size == 3)
  }

  test("S3 incrementalQuery builds the watermark pushdown params " +
    "(api_client.py:569-573)") {
    assert(incrementalQuery(Some(42L), Some("2024/08/01 00:00:00")) ==
      Map("form_id" -> "42", "applied_after" -> "2024/08/01 00:00:00",
        "include_canceled" -> "true"))
  }

  test("S4+S5 fetchDetails fans out over executors and classifies " +
    "errors as data") {
    import spark.implicits._
    val fetcher = new FakeFetcher(Map.empty, Map(
      "r1" -> Right("{\"id\":\"r1\"}"),
      "r2" -> Left("500 server error")))
    val out = fetchDetails(spark, fetcher, "requests",
      Seq("r1", "r2", "r3").toDS()).orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) != null && out(0).getString(2) == null)
    assert(out(1).getString(1) == null &&
      out(1).getString(2).contains("500"))
    assert(out(2).getString(2).contains("404"))
  }

  test("S5 classifyPages taxonomy: ok / warning / fatal " +
    "(api_client.py:390-453)") {
    val out = classifyPages(spark, Seq(
      ("users", Page(Seq("{}"), None)),
      ("users", Page(Nil, None, 403, Some("forbidden"))),
      ("forms", Page(Nil, None, 0, Some("ConnectionError")))))
      .select("fetch_class").collect().map(_.getString(0))
    assert(out.toSeq == Seq("ok", "warning", "fatal"))
  }

  test("K5 bronze sink: append + lastWriteWins merge-on-read " +
    "(api_client.py:154-177)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bronze")
      .toString
    val gen1 = Seq(("users", "p1", "k1", "{\"v\":1}", 1L),
      ("users", "p1", "k2", "{\"v\":2}", 1L))
      .toDF("api_type", "brief_key", "detailed_key", "response", "ingest_ts")
    val gen2 = Seq(("users", "p1", "k1", "{\"v\":9}", 2L))
      .toDF("api_type", "brief_key", "detailed_key", "response", "ingest_ts")
    appendRaw(gen1, dir); appendRaw(gen2, dir)
    val deduped = readRawDeduped(spark, dir)
    assert(deduped.count() == 2)
    assert(deduped.filter(col("detailed_key") === "k1")
      .select("response").collect().head.getString(0) == "{\"v\":9}")
  }

  test("F7 parseDocs quarantines malformed documents instead of " +
    "failing the batch") {
    import spark.implicits._
    val raw = Seq(Fixtures_requestDoc, "NOT JSON {{{").toDF("doc")
    val parsed = parseDocs(raw, "doc", JobcanSchemas.requestDetailSchema)
    val ok = parsed.filter(col("parse_ok")).count()
    val bad = parsed.filter(!col("parse_ok")).count()
    assert(ok == 1 && bad == 1)
  }

  private lazy val Fixtures_requestDoc = graft.Fixtures.requestSa11
}

object IngestSpec {
  /** Top-level so the closure shipped to executors doesn't capture the
    * (non-serializable) suite instance. */
  private class FakeFetcher(pages: Map[String, Seq[Ingest.Page]],
      details: Map[String, Either[String, String]])
      extends Ingest.Fetcher {
    def fetchPage(apiType: String, query: Map[String, String],
        pageToken: Option[String]): Ingest.Page = {
      val seq = pages(apiType)
      pageToken match {
        case None => seq.head
        case Some(t) => seq(t.toInt)
      }
    }
    def fetchDetail(apiType: String, id: String) =
      details.getOrElse(id, Left(s"404 for $id"))
  }
}
