package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated TPC-H-ish testdata tables
  * (`/root/testdata/sfN/<name>.parquet`, see TESTDATA.md) and registers
  * them as temp views so both the DataFrame API and `spark.sql` paths
  * work against the same inputs the DuckDB oracle reads.
  *
  * At cluster scale these would be external catalog tables over a
  * partitioned object-store layout; here the parquet files are the
  * whole table. All reads are plain `spark.read.parquet`, so Catalyst
  * predicate pushdown / column pruning apply unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension-sized tables that should always broadcast in joins. */
  val dimensions: Set[String] =
    Set("region", "nation", "customer", "supplier", "part")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table $name")
    if (name == "events") {
      // events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's
      // vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the
      // raw nanos as Long and convert to Spark's native µs timestamp.
      // Integer division (`div`), NOT `/1000`: ns-since-epoch ≈ 1.7e18
      // exceeds double's 2^53 integer range, so float division would
      // corrupt low-order digits.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
