package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the lake
  * maintenance operation every incremental writer eventually needs:
  * frequent small batch writes (the reference's per-run upserts, our
  * bronze/silver appends) accumulate files far below the scan-split
  * size, and at 100 TB the resulting per-file open/footer overhead
  * and task-count explosion dominate read cost (a 128 MB-split scan
  * over 4 KB files plans 30,000× more tasks than the data needs).
  *
  * Two layers, separable for testability:
  *
  *  - [[planBins]] — pure first-fit-decreasing bin packing of
  *    (file, size) into bins of `targetBytes`. Files at or above the
  *    target stay alone in their bin (they are already "compact");
  *    the classic FFD bound keeps bins within 11/9·OPT+1.
  *  - [[compact]] — rewrites ONLY the multi-file bins (one
  *    `spark.read.parquet(files…).coalesce(1)` job per bin — the
  *    rewrite volume is proportional to the SMALL-file bytes, not
  *    the table); singleton bins are untouched, so an
  *    already-compact table is a no-op that rewrites zero bytes.
  *
  * The rewrite is offline/atomic-per-directory in spirit: output goes
  * to a fresh directory, sources are not deleted (retention/commit
  * protocols — e.g. a table format's transaction log — own deletion).
  */
object Compaction {

  /** First-fit-decreasing packing. Returns bins of file paths; every
    * input path appears in exactly one bin. Pure function — unit-test
    * the packing without a filesystem.
    */
  def planBins(files: Seq[(String, Long)],
      targetBytes: Long): Seq[Seq[(String, Long)]] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (big, small) = files.partition(_._2 >= targetBytes)
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[(String, Long)], Long)]
    for (f <- small.sortBy { case (p, sz) => (-sz, p) }) {
      val i = bins.indexWhere(_._2 + f._2 <= targetBytes)
      if (i < 0)
        bins += ((scala.collection.mutable.ArrayBuffer(f), f._2))
      else {
        bins(i)._1 += f
        bins(i) = (bins(i)._1, bins(i)._2 + f._2)
      }
    }
    big.map(f => Seq(f)) ++ bins.map(_._1.toSeq)
  }

  /** List the data files of a parquet directory (non-recursive;
    * `_`-prefixed metadata and hidden files excluded). */
  def listDataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
  }

  /** Result summary: how much was rewritten vs passed through. */
  final case class CompactStats(nInputFiles: Int, nBins: Int,
      nRewrittenFiles: Int, rewrittenBytes: Long,
      passthroughFiles: Int)

  /** Compact `inDir` into `outDir`: multi-file bins are rewritten to
    * one file each; singleton bins (big files, lone leftovers) are
    * byte-copied unchanged. Row content is preserved exactly; row
    * ORDER within the table is not a parquet contract and follows
    * bin membership.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): CompactStats = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = listDataFiles(spark, inDir)
    val bins = planBins(files, targetBytes)
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf)
    // a rerun into a dirty target would silently MIX stale and new
    // files — duplicated rows that no downstream check would catch.
    // Compaction owns its output directory; fail loudly instead.
    if (fs.exists(out) && fs.listStatus(out).exists(s =>
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")))
      throw new java.io.IOException(
        s"compact target $outDir already contains data; " +
        "clean it or choose a fresh directory")
    fs.mkdirs(out)
    var rewritten = 0
    var rewrittenBytes = 0L
    var passthrough = 0
    bins.zipWithIndex.foreach { case (bin, i) =>
      if (bin.length == 1) {
        val src = new Path(bin.head._1)
        // source FS derived from the SOURCE path: in/out may live on
        // different filesystems (hdfs → local, local → s3, …)
        org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
          fs, new Path(out, f"pass-$i%05d-${src.getName}"),
          false, conf)
        passthrough += 1
      } else {
        // mergeSchema: a bin can pack files from different append
        // batches of an EVOLVING bronze schema; without it the
        // inferred schema comes from one arbitrary footer and columns
        // present only in the other files are silently dropped —
        // breaking the "row content is preserved exactly" contract
        spark.read.option("mergeSchema", "true")
          .parquet(bin.map(_._1): _*)
          .coalesce(1)
          .write.mode("append").parquet(outDir)
        rewritten += bin.length
        rewrittenBytes += bin.map(_._2).sum
      }
    }
    CompactStats(files.length, bins.length, rewritten,
      rewrittenBytes, passthrough)
  }
}
