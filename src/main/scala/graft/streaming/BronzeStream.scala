package graft.streaming

import graft.model.JobcanSchemas
import graft.normalize.Normalize
import graft.operators.Upsert
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
      val path = s"$silverDir/$name"
      val (keys, merged) = name match {
        case "requests" => (Seq("id"),
          scala.util.Try(spark.read.parquet(path)).toOption
            .map(Upsert.fullRow(_, df, Seq("id"))).getOrElse(df))
        case "files" => (Seq("id"),
          scala.util.Try(spark.read.parquet(path)).toOption
            .map(Upsert.fullRow(_, df, Seq("id"))).getOrElse(df))
        case "comments" => (Seq("user_name", "date", "text"),
          scala.util.Try(spark.read.parquet(path)).toOption
            .map(Upsert.fullRow(_, df, Seq("user_name", "date", "text")))
            .getOrElse(df))
        case "generic_master_additional_items" =>
          (Seq("record_name", "record_code"),
            scala.util.Try(spark.read.parquet(path)).toOption
              .map(Upsert.reconcileChildren(_, df,
                Seq("record_name", "record_code"))).getOrElse(df))
        case _ => (Seq("request_id"),
          scala.util.Try(spark.read.parquet(path)).toOption
            .map(Upsert.reconcileChildren(_, df, Seq("request_id")))
            .getOrElse(df))
      }
      val out = merged.cache(); out.count()
      out.write.mode("overwrite").parquet(path)
      out.unpersist()
      spark.catalog.refreshByPath(path)
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
