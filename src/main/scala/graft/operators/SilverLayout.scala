package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout of the silver layer for 100 TB (SURVEY §7.1.8):
  * bronze partitioned by (api_type, ingest date) for partition-pruned
  * incremental scans; silver request tables BUCKETED by request_id so
  * the entire view stack (all joins are on request_id + index columns)
  * runs without a single shuffle — the sort/hash happens once at write
  * time, every downstream join reuses it.
  */
object SilverLayout {

  /** Write a silver table bucketed by its join key. Bucketing needs
    * the session catalog (bucket metadata lives there), hence
    * saveAsTable rather than a bare path write.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty)
      w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Write bronze pages partitioned for incremental pruning. */
  def writeBronze(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("api_type", "ingest_date")): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Count shuffle exchanges in a plan — the audit primitive the
    * bucketing claim is verified with. */
  def exchangeCount(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
}
