package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) corpus source — the interchange
  * format LLM data pipelines actually exchange (Dolma, RedPajama,
  * FineWeb all ship JSONL shards): one document object per line,
  * schema known up front, corrupt lines quarantined rather than
  * killing the job or silently vanishing.
  *
  * Scale notes, encoded in the API rather than prose:
  *  - the read is Spark's native JSON FileScan — splittable per file,
  *    schema ENFORCED (no inference pass over 100 TB: `schema` is
  *    required) and column-pruned at the scan;
  *  - corrupt-line policy is PERMISSIVE + `_corrupt_record`: a typo'd
  *    shard yields (clean, quarantine) frames, never an aborted job
  *    (FAILFAST) or silent row loss (DROPMALFORMED). The quarantine
  *    frame carries the raw line for re-parse after a schema fix —
  *    the same DLQ discipline as the T5 ingest path;
  *  - gzip JSONL reads transparently but each `.gz` file is ONE task
  *    (gzip is not splittable) — bronze jobs should re-land to
  *    parquet (or zstd-seekable) before fan-out, which is exactly
  *    what [[bronze]] does in one pass.
  *
  * A caller-supplied schema must not claim the corrupt-record column;
  * Spark additionally refuses to filter on `_corrupt_record` straight
  * off a JSON scan (the referenced-columns-only restriction), so the
  * split materializes the parse ONCE via a tracked persist.
  */
object JsonlCorpus {

  val corruptCol = "_graft_corrupt"

  /** The documents-table schema (TESTDATA.md shape). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read JSONL at `path` against an enforced `schema`, returning
    * (clean, quarantine): clean rows parse fully; quarantine rows are
    * the RAW malformed lines (single `raw` string column) for later
    * re-parse. Both frames come off one parse pass (tracked persist —
    * release via [[graft.operators.ManagedCache.releaseAll]] once
    * consumed).
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not claim $corruptCol")
    val parsed = graft.operators.ManagedCache.persist(
      spark.read
        .schema(schema.add(corruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol)
        .json(path))
    CorpusLanding.split(parsed, corruptCol)
  }

  /** Bronze landing in one pass: parse JSONL shards, write the clean
    * rows as parquet (splittable, column-pruned — the format every
    * downstream stage here reads), write the quarantine lines beside
    * them, and return the (n_clean, n_quarantined) census. This is
    * the "re-land non-splittable text to parquet before fan-out" step
    * a 100 TB ingest runs first.
    */
  def bronze(spark: SparkSession, jsonlPath: String, outDir: String,
      schema: StructType = documentsSchema): (Long, Long) = {
    val (clean, quarantine) = read(spark, jsonlPath, schema)
    CorpusLanding.land(spark, clean, quarantine, outDir)
  }

  /** Export a frame as JSONL shards (the hand-off format back to
    * trainers/labelers). `shards` bounds file count without a global
    * sort — repartition by a hash of all columns for even sizes. */
  def write(df: DataFrame, path: String, shards: Int = 1): Unit = {
    require(shards >= 1, "shards must be >= 1")
    df.repartition(shards).write.mode("overwrite").json(path)
  }
}
