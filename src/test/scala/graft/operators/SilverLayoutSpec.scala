package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-located-join claim, proven on plans: joining two tables
  * bucketed by the same key produces ZERO shuffle exchanges, while the
  * same join on plain parquet shuffles both sides.
  */
class SilverLayoutSpec extends SparkSpec {

  test("bucketed-by-key join is exchange-free; unbucketed join shuffles") {
    val l = graft.Tables.load(spark, sf0001, "lineitem")
    val o = graft.Tables.load(spark, sf0001, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SilverLayout.writeBucketed(l, "li_bucketed", Seq("l_orderkey"), 8,
        Seq("l_orderkey"))
      SilverLayout.writeBucketed(o, "o_bucketed", Seq("o_orderkey"), 8,
        Seq("o_orderkey"))
      val bl = spark.table("li_bucketed")
      val bo = spark.table("o_bucketed")

      val bucketedJoin = bo.join(bl,
        bo("o_orderkey") === bl("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plainJoin = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))

      val bucketedEx = SilverLayout.exchangeCount(bucketedJoin)
      val plainEx = SilverLayout.exchangeCount(plainJoin)
      assert(bucketedEx == 0,
        s"bucketed join+agg must not shuffle, saw $bucketedEx exchanges")
      assert(plainEx >= 2,
        s"plain join should shuffle both sides, saw $plainEx")
      // and the results agree
      assert(bucketedJoin.count() == plainJoin.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("bronze partition layout prunes incremental scans to the " +
    "matching partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bronze2")
      .toString
    val pages = Seq(
      ("users", "2024-08-01", "{\"id\":1}"),
      ("users", "2024-08-02", "{\"id\":2}"),
      ("forms", "2024-08-02", "{\"id\":3}"))
      .toDF("api_type", "ingest_date", "response")
    SilverLayout.writeBronze(pages, dir)
    val scan = spark.read.parquet(dir)
      .filter(col("api_type") === "users" &&
        col("ingest_date") === "2024-08-02")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("api_type"), "partition filters must reach the scan")
    assert(scan.count() == 1)
  }

  test("silver tables absorb additive schema evolution: mergeSchema " +
    "unions file schemas and null-fills old rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evo")
      .toString + "/t"
    // v1 writer: two columns; v2 writer (a later API version) adds one
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    Seq((2L, "b", 9L)).toDF("k", "v", "extra")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("k", "v", "extra"))
    val rows = merged.orderBy("k").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("extra")),
      "pre-evolution rows must null-fill the new column")
    assert(rows(1).getAs[Long]("extra") == 9L)
    // and the upsert path keeps working across the evolved schema
    val upserted = graft.operators.Upsert.fullRow(
      merged, Seq((1L, "a2", 7L)).toDF("k", "v", "extra"), Seq("k"))
    val r1 = upserted.filter(col("k") === 1L).collect()(0)
    assert(r1.getAs[String]("v") == "a2" && r1.getAs[Long]("extra") == 7L)
  }

  test("writeBloomIndexed materializes a bloom filter in the parquet " +
    "footer for the indexed column only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom")
      .toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1)
    SilverLayout.writeBloomIndexed(df, dir, Seq("k"), expectedNdv = 5000L)

    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val part = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(part, conf))
    try {
      val cols = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
      val kCol = cols.find(_.getPath.toDotString == "k").get
      val vCol = cols.find(_.getPath.toDotString == "v").get
      assert(kCol.getBloomFilterOffset > 0,
        "indexed column must carry a bloom filter")
      assert(vCol.getBloomFilterOffset <= 0,
        "non-indexed column must not pay for one")
      // and the filter actually answers membership
      val bloom = reader.readBloomFilter(kCol)
      assert(bloom != null)
      val h = bloom.hash(42L)
      assert(bloom.findHash(h), "present key must hit")
    } finally reader.close()
    // read side unaffected
    assert(spark.read.parquet(dir).where(col("k") === 42L).count() == 1)
  }
}
