package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corrupt-column split + bronze landing mechanics shared by
  * [[JsonlCorpus]] and [[CsvCorpus]] — one implementation so the DLQ
  * census and the persist-release discipline cannot drift between
  * the two formats.
  */
private[sources] object CorpusLanding {

  /** (clean, quarantine) off one materialized parse: clean rows drop
    * the corrupt column; quarantine rows carry the raw malformed line
    * as a single `raw` string column. */
  def split(parsed: DataFrame, corruptCol: String)
      : (DataFrame, DataFrame) = {
    val clean = parsed.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw"))
    (clean, quarantine)
  }

  /** Land clean rows as parquet and quarantine lines as JSONL beside
    * them; return the (n_clean, n_quarantined) census. The clean
    * count re-reads the WRITTEN parquet (verifying the landing); the
    * quarantine count comes from the persisted frame ITSELF — the old
    * `Try(read-back).getOrElse(0)` never fired on the empty case it
    * targeted (an explicit-schema read of an empty directory succeeds
    * with 0 rows) and instead swallowed genuine read failures,
    * reporting a clean ingest while malformed lines had landed. */
  def land(spark: SparkSession, clean: DataFrame,
      quarantine: DataFrame, outDir: String): (Long, Long) = {
    clean.write.mode("overwrite").parquet(s"$outDir/clean")
    quarantine.write.mode("overwrite").json(s"$outDir/quarantine")
    val counts = (spark.read.parquet(s"$outDir/clean").count(),
      quarantine.count())
    graft.operators.ManagedCache.releaseAll()
    counts
  }
}
