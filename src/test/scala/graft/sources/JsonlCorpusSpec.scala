package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonlCorpusSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val good = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
    """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}""",
    """{"doc_id": 3, "text": "extra field ignored", "lang": "en", "source": "book", "n_chars": 19, "unknown": true}""")

  private val bad = Seq(
    """{"doc_id": "not-a-number", "text": "type clash", "lang": "en", "source": "web", "n_chars": 3}""",
    """{"doc_id": 5, "text": "truncated line""",
    """not json at all""")

  test("read splits clean rows from quarantined corrupt lines; " +
    "quarantine preserves the raw bytes for re-parse") {
    val dir = writeLines(scala.util.Random.shuffle(good ++ bad))
    val (clean, quarantine) = JsonlCorpus.read(spark, dir)
    try {
      val ids = clean.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
      assert(clean.columns.toSeq ==
        JsonlCorpus.documentsSchema.fieldNames.toSeq,
        "clean frame must carry exactly the contract schema")
      val raws = quarantine.collect().map(_.getString(0))
      assert(raws.length == 3, raws.mkString("|"))
      // the raw line survives byte-for-byte — a schema fix can replay
      assert(raws.exists(_.contains("not-a-number")))
      assert(raws.contains("not json at all"))
    } finally graft.operators.ManagedCache.releaseAll()
  }

  test("schema is ENFORCED, not inferred: a field absent from the " +
    "line is null, never a silently widened column") {
    val dir = writeLines(Seq(
      """{"doc_id": 9, "text": "no lang field", "source": "web", "n_chars": 13}"""))
    val (clean, _) = JsonlCorpus.read(spark, dir)
    try {
      val r = clean.collect().head
      assert(r.getLong(0) == 9L && r.isNullAt(2))
      assert(clean.schema("n_chars").dataType ==
        org.apache.spark.sql.types.LongType)
    } finally graft.operators.ManagedCache.releaseAll()
  }

  test("a schema claiming the corrupt column is rejected") {
    intercept[IllegalArgumentException] {
      JsonlCorpus.read(spark, "/tmp/nope",
        JsonlCorpus.documentsSchema.add(JsonlCorpus.corruptCol,
          org.apache.spark.sql.types.StringType))
    }
  }

  test("bronze lands clean rows as parquet + quarantine beside, and " +
    "the parquet round-trips through the standard table loader path") {
    val dir = writeLines(good ++ bad)
    val out = java.nio.file.Files
      .createTempDirectory("graft-bronze").toString
    val (nClean, nQuar) = JsonlCorpus.bronze(spark, dir, out)
    assert(nClean == 3L && nQuar == 3L)
    val back = spark.read.parquet(s"$out/clean")
    assert(back.filter(col("lang") === "en").count() == 2)
    // the parquet scan prunes columns (the reason bronze re-lands)
    val plan = back.select("doc_id").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    val rs = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(rs.contains("doc_id") && !rs.contains("text"), rs)
  }

  test("write exports round-trippable JSONL in the requested shard " +
    "count") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files
      .createTempDirectory("graft-jsonl-w").toString + "/x"
    JsonlCorpus.write(df, out, shards = 3)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val (clean, quarantine) = JsonlCorpus.read(spark, out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    try {
      assert(clean.count() == 40 && quarantine.count() == 0)
    } finally graft.operators.ManagedCache.releaseAll()
  }
}
