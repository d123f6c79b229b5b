package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Compression-ratio quality signal — the "does this text deflate
  * like natural language?" filter training-data pipelines (Dolma,
  * RefinedWeb-class) run alongside the Gopher rules: machine-generated
  * boilerplate and repeated spans compress far below natural prose,
  * random/encrypted junk barely compresses at all, so per-mille
  * deflate ratio separates both tails with one cheap scan.
  *
  * Deflate is a JVM-library call, not SQL-expressible — so this is a
  * Dataset.mapPartitions op (Encoders.row — logical plan intact, no
  * RDD barrier) with ONE java.util.zip.Deflater reused per partition
  * (allocating one per row would dominate the cost). BEST_SPEED:
  * the signal needs the tails separated, not the best encoding.
  * Deterministic for a fixed input (single Deflater, fixed level,
  * fixed strategy), ScalaTest-verified; no DuckDB oracle exists for
  * deflate, so this stays a library op rather than a queries entry.
  */
object CompressionSignals {

  /** Append `deflate_ratio_mille` (compressed·1000/raw, 0 for empty)
    * and `raw_bytes` to the frame, from UTF-8 bytes of `textCol`. */
  def deflateRatio(df: DataFrame, textCol: String): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(textCol)
    val outSchema = StructType(schema.fields ++ Seq(
      StructField("raw_bytes", LongType, nullable = false),
      StructField("deflate_ratio_mille", LongType, nullable = false)))
    df.mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED)
      // end() releases NATIVE zlib buffers. The iterator-drain hook
      // below covers the happy path, but a downstream limit/take or a
      // mid-partition exception never drains the iterator — the task
      // completion listener runs on BOTH paths (end() is idempotent,
      // so double release is fine).
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](64 * 1024)
      val mapped = it.map { row =>
        val s = if (row.isNullAt(idx)) null else row.getString(idx)
        val raw = if (s == null) Array.emptyByteArray
          else s.getBytes("UTF-8")
        var compressed = 0L
        if (raw.nonEmpty) {
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
        }
        val ratio = if (raw.isEmpty) 0L
          else compressed * 1000L / raw.length
        Row.fromSeq(row.toSeq ++ Seq(raw.length.toLong, ratio))
      }
      // release the Deflater's NATIVE buffers at partition end rather
      // than waiting on GC (end() is idempotent; a drained iterator's
      // hasNext may be probed more than once)
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h) deflater.end()
          h
        }
        def next(): Row = mapped.next()
      }
    }(Encoders.row(outSchema))
  }

  /** The filter a pipeline applies on the signal: keep documents in
    * the natural-language band — below `hi` (not incompressible junk:
    * random printable text deflates to ~820‰) and above `lo` (not
    * degenerate repetition: looped spam lands under 100‰; short
    * natural prose sits around 400–750‰ at BEST_SPEED). */
  def compressionBandFilter(df: DataFrame, textCol: String,
      loMille: Long = 150L, hiMille: Long = 800L): DataFrame = {
    import org.apache.spark.sql.functions.col
    deflateRatio(df, textCol)
      .filter(col("deflate_ratio_mille") >= loMille &&
        col("deflate_ratio_mille") <= hiMille)
  }
}
