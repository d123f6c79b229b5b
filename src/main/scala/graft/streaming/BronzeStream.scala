package graft.streaming

import graft.model.JobcanSchemas
import graft.normalize.Normalize

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Streaming ingest: the integrator's phase-3 pipeline as a
  * Structured Streaming job. Raw request-detail documents land in a
  * bronze directory (one JSON document per line, e.g. from
  * `Ingest.appendRaw` or any collector); this job tails the
  * directory, shreds each micro-batch through the SAME
  * `Normalize.requests` used in batch, and MERGEs every silver table
  * inside `foreachBatch` — checkpointed, so restart resumes exactly
  * where it stopped (the streaming form of T4 resume).
  *
  * This is the "continuous integrator": at 100 TB/day the bronze dir
  * is an object-store prefix and maxFilesPerTrigger bounds batch
  * size; nothing else changes.
  */
object BronzeStream {

  /** Tail a bronze directory of request-detail JSON documents. */
  def readBronze(spark: SparkSession, bronzeDir: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(JobcanSchemas.requestDetailSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(bronzeDir)

  /** Merge one micro-batch of parsed documents into the silver dir —
    * the same idempotent merges the batch Integrator uses.
    */
  def mergeBatch(batch: DataFrame, silverDir: String): Unit = {
    val spark = batch.sparkSession
    // truncate lineage: the 30 table merges below must not re-read the
    // stream source (same trap as Integrator.updateFormDetails)
    val docs = batch.localCheckpoint(true)
    if (docs.isEmpty) return
    Normalize.requests(docs).foreach { case (name, df) =>
      // the SAME canonical merge semantics as the batch Integrator
      // (NormalizeTables.mergeStrategy via ParquetMerge) — the two
      // sinks cannot drift
      graft.operators.ParquetMerge.mergeTable(spark,
        s"$silverDir/$name", name, df)
    }
  }

  /** The continuous integrator: bronze dir → silver dir, exactly-once
    * at the table level via checkpoint + idempotent merges.
    */
  def run(spark: SparkSession, bronzeDir: String, silverDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    readBronze(spark, bronzeDir).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        mergeBatch(batch.toDF(), silverDir)
      }
}
