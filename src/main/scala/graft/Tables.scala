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
      // events.ts has shipped as both INT64 TIMESTAMP(NANOS) (older
      // testdata drops — Spark's vectorized reader rejects it unless
      // nanosAsLong reads raw longs) and TIMESTAMP(MICROS)
      // isAdjustedToUTC=false (current drops — Spark infers
      // TIMESTAMP_NTZ). Branch on the INFERRED type, not the table
      // name. Nanos path: integer `div`, NOT `/1000` — ns-since-epoch
      // ≈ 1.7e18 exceeds double's 2^53 integer range. NTZ path: cast
      // to session-TZ timestamp (session is pinned UTC, so the wall
      // clock IS the instant, matching DuckDB's naive reading).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => // TIMESTAMP_NTZ
          raw.withColumn("ts", org.apache.spark.sql.functions
            .col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
