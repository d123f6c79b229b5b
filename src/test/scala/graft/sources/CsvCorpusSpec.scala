package graft.sources

import graft.SparkSpec

class CsvCorpusSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-csv").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "drop-000.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val header = "doc_id,text,lang,source,n_chars"

  test("read splits clean rows from quarantined type-clash lines; " +
    "quarantine preserves the raw line") {
    val dir = writeCsv(Seq(header,
      "1,hello world,en,web,11",
      "not-a-number,type clash,en,web,3",
      "2,bonjour,fr,web,7",
      "3,ok,en,book,oops"))          // n_chars not a long
    val (clean, quarantine) = CsvCorpus.read(spark, dir)
    try {
      val ids = clean.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
      assert(clean.columns.toSeq ==
        JsonlCorpus.documentsSchema.fieldNames.toSeq)
      val raws = quarantine.collect().map(_.getString(0))
      assert(raws.length == 2, raws.mkString("|"))
      assert(raws.exists(_.startsWith("not-a-number")))
      assert(raws.exists(_.endsWith("oops")))
    } finally graft.operators.ManagedCache.releaseAll()
  }

  test("columns bind by position; a reordered vendor header FAILS " +
    "loudly instead of silently transposing values") {
    val dir = writeCsv(Seq("text,doc_id,n_chars,lang,source",
      "hello,7,5,en,web"))
    val (clean, _) = CsvCorpus.read(spark, dir)
    try {
      val ex = intercept[Exception] { clean.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(m => m.contains("header") ||
        m.contains("CSV")), ex.toString)
    } finally graft.operators.ManagedCache.releaseAll()
  }

  test("a schema claiming the corrupt column is rejected; bronze " +
    "lands parquet + quarantine with the right census") {
    intercept[IllegalArgumentException] {
      CsvCorpus.read(spark, "/tmp/nope",
        JsonlCorpus.documentsSchema.add(CsvCorpus.corruptCol,
          org.apache.spark.sql.types.StringType))
    }
    val dir = writeCsv(Seq(header,
      "1,a,en,web,1", "2,b,fr,web,1", "x,bad,en,web,1"))
    val out = java.nio.file.Files
      .createTempDirectory("graft-csv-bronze").toString
    val (nClean, nBad) = CsvCorpus.bronze(spark, dir, out)
    assert(nClean == 2L && nBad == 1L, s"$nClean/$nBad")
    assert(spark.read.parquet(s"$out/clean").columns.length == 5)
  }
}
