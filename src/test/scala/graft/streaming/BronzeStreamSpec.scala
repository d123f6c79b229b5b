package graft.streaming

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The continuous-integrator path: documents landing in bronze are
  * shredded and merged into silver incrementally, with checkpointed
  * resume across restarts.
  */
class BronzeStreamSpec extends SparkSpec {

  test("bronze stream shreds + merges incrementally; restart resumes " +
    "from the checkpoint without reprocessing") {
    val root = Files.createTempDirectory("graft-bstream")
    val bronze = root.resolve("bronze"); Files.createDirectories(bronze)
    val silver = root.resolve("silver").toString
    val ckpt = root.resolve("ckpt").toString

    // land document 1, run the stream to completion (AvailableNow)
    Files.writeString(bronze.resolve("doc1.json"), Fixtures.requestSa10)
    BronzeStream.run(spark, bronze.toString, silver, ckpt)
      .start().awaitTermination()
    assert(spark.read.parquet(s"$silver/requests").count() == 1)
    assert(spark.read.parquet(s"$silver/expense_specific_rows").count() == 2)

    // land document 2 and an UPDATED document 1 (title change); new
    // stream instance on the same checkpoint = restart
    Files.writeString(bronze.resolve("doc2.json"), Fixtures.requestSa11)
    Files.writeString(bronze.resolve("doc1b.json"),
      Fixtures.requestSa10.replace("出張交通費精算", "出張精算（修正）"))
    BronzeStream.run(spark, bronze.toString, silver, ckpt)
      .start().awaitTermination()

    val reqs = spark.read.parquet(s"$silver/requests")
      .select("id", "title").orderBy("id").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(reqs.length == 2)
    assert(reqs(0) == "sa-10" -> "出張精算（修正）",
      "updated document must replace, not duplicate")
    assert(reqs(1)._1 == "sa-11")
    assert(spark.read.parquet(s"$silver/expense_specific_rows")
      .count() == 3) // 2 (sa-10, replaced not duplicated) + 1 (sa-11)

    // third run with nothing new: checkpoint prevents reprocessing —
    // state unchanged
    BronzeStream.run(spark, bronze.toString, silver, ckpt)
      .start().awaitTermination()
    assert(spark.read.parquet(s"$silver/requests").count() == 2)
  }
}
