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

  /** Write parquet with BLOOM FILTERS on the point-lookup columns —
    * the third pruning layer after partition dirs and min/max stats:
    * a needle-in-haystack key probe (S4 point lookups, DLQ retries,
    * k1-style upsert probes) skips every row group whose bloom says
    * "definitely absent", which min/max can't do for high-cardinality
    * unsorted keys. ndv sizes the filter (parquet-mr derives bits
    * from expected distinct values; too-low ndv inflates false
    * positives and silently voids the pruning).
    */
  def writeBloomIndexed(df: DataFrame, path: String,
      bloomCols: Seq[String], expectedNdv: Long): Unit = {
    val opts = bloomCols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString))
    df.write.mode("overwrite").options(opts.toMap).parquet(path)
  }

  /** Count shuffle exchanges in a plan — the audit primitive the
    * bucketing claim is verified with. */
  def exchangeCount(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
}
