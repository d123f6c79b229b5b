package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV corpus source — the other interchange format real ingests
  * still receive (exports from spreadsheets, legacy warehouses, label
  * vendors). Same contract as [[JsonlCorpus]]: schema ENFORCED up
  * front, corrupt lines quarantined with their raw bytes, bronze
  * re-landing to parquet before fan-out.
  *
  * CSV-specific hazards this encodes:
  *  - `multiLine` stays OFF: quoted embedded newlines make files
  *    non-splittable (one task per file at 100 TB) — vendors who need
  *    embedded newlines should ship JSONL; a quoted-newline row
  *    arriving anyway parses as garbage and lands in quarantine
  *    instead of silently shearing;
  *  - schema enforcement means a type clash (text in a numeric
  *    column) quarantines THAT line — no inference pass, no silently
  *    widened column;
  *  - CSV columns bind by POSITION (Spark never reorders by header
  *    name), so with `header = true` the header row is VALIDATED
  *    against the schema's field names (`enforceSchema = false`): a
  *    vendor drop with reordered columns fails the task loudly
  *    instead of silently transposing values into the wrong fields —
  *    schema drift is a file-level defect, not a per-line one, so it
  *    must not drip into quarantine row by row.
  *
  * Spark's CSV PERMISSIVE mode only populates the corrupt-record
  * column for rows it cannot coerce; like the JSON path it refuses
  * filters on that column straight off the scan, so the split
  * materializes the parse ONCE via a tracked persist.
  */
object CsvCorpus {

  val corruptCol = "_graft_corrupt"

  /** Read CSV at `path` against an enforced `schema`, returning
    * (clean, quarantine) — quarantine rows carry the raw malformed
    * line (single `raw` string column) for re-parse after a fix.
    * Release the backing persist via ManagedCache.releaseAll once
    * both frames are consumed.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = JsonlCorpus.documentsSchema,
      header: Boolean = true, delimiter: String = ",")
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not claim $corruptCol")
    val parsed = graft.operators.ManagedCache.persist(
      spark.read
        .schema(schema.add(corruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol)
        .option("header", header.toString)
        .option("enforceSchema", "false")
        .option("sep", delimiter)
        .option("multiLine", "false")
        .csv(path))
    CorpusLanding.split(parsed, corruptCol)
  }

  /** Bronze landing in one pass: parse CSV shards, land clean rows
    * as parquet, quarantine lines beside them, return the
    * (n_clean, n_quarantined) census.
    */
  def bronze(spark: SparkSession, csvPath: String, outDir: String,
      schema: StructType = JsonlCorpus.documentsSchema,
      header: Boolean = true, delimiter: String = ","): (Long, Long) = {
    val (clean, quarantine) =
      read(spark, csvPath, schema, header, delimiter)
    CorpusLanding.land(spark, clean, quarantine, outDir)
  }
}
