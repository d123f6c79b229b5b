package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max statistics manifests — the file-skipping layer a
  * parquet lake needs to make clustered layout (ZOrder/SilverLayout)
  * actually pay at read time. Writing 100 TB Z-ordered and then
  * listing-and-opening every parquet footer per query wastes the
  * layout: the scan planner touches every file's metadata even when
  * 99% of files can't match. A manifest is ONE small sidecar the
  * driver reads instead — the same design as Delta's add-file stats
  * and Iceberg's manifest min/max (public formats; this is the
  * minimal from-scratch version for the Snapshots store).
  *
  * Format: `_stats.json` inside the version directory (the `_` prefix
  * makes it invisible to parquet directory reads), one JSON line per
  * data file: relative path, row count, and per-column [min,max] as
  * DECIMAL STRINGS — exact for every integral/decimal value (a
  * double round-trip would corrupt longs above 2^53) and ordered
  * lexicographically-correct after BigDecimal parse. All-null or
  * missing stats for a column mean the file is always KEPT
  * (pruning must be conservative, never lossy).
  *
  * The manifest is computed by one extra scan of the freshly staged
  * files (grouped by `input_file_name`) — distributed, one pass,
  * map-side-combined — and written by the driver (the manifest is
  * files-count-sized: ~100k lines at 100 TB, the same driver-bounded
  * metadata every table format keeps). It lands in the STAGE before
  * the atomic slot rename, so a published version and its stats are
  * inseparable: readers never see a version without its manifest.
  */
object FileStats {

  val ManifestName = "_stats.json"

  /** One data file's stats: path relative to the version root, rows,
    * and per-column (min, max) as exact decimal strings (None when
    * the file's column is all-null). */
  case class FileStat(relPath: String, rows: Long,
      cols: Map[String, Option[(String, String)]])

  /** Pruning census — surfaced by readers so a skipped file is
    * always visible accounting, never silence. */
  case class PruneStats(filesRead: Long, filesSkipped: Long,
      rowsInRead: Long, rowsInSkipped: Long)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Compute per-file stats for `statsCols` over the parquet files
    * under `dataDir` and write `_stats.json` there. One distributed
    * scan reading ONLY the stats columns (column-pruned at the
    * parquet footer), one file-keyed aggregate.
    */
  def writeManifest(spark: SparkSession, dataDir: String,
      statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    val rootUri = fs(spark, dataDir)
      .makeQualified(new Path(dataDir)).toUri.getPath
    val aggs = count(lit(1L)).as("__rows") +:
      statsCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
    val perFile = spark.read.parquet(dataDir)
      .select((input_file_name().as("__file") +:
        statsCols.map(col)): _*)
      .groupBy(col("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val lines = perFile.toSeq.map { r =>
      val full = new java.net.URI(r.getString(0)).getPath
      val rel = full.stripPrefix(rootUri).stripPrefix("/")
      // the hand-rolled JSON below doesn't escape — Spark part-file
      // names are safe, but a STRING partition value becomes a
      // `key=value` directory in the path: refuse metacharacters
      // loudly rather than write a manifest readManifest can't parse
      require(!rel.exists(c => c == '"' || c == '\\' || c == '\n'),
        s"manifest path contains JSON metacharacters: $rel")
      val colsJson = statsCols.map { c =>
        val mn = r.getAs[String](s"__min_$c")
        val mx = r.getAs[String](s"__max_$c")
        val v = if (mn == null || mx == null) "null"
          else s"""["$mn","$mx"]"""
        s""""$c":$v"""
      }.mkString(",")
      s"""{"file":"$rel","rows":${r.getAs[Long]("__rows")},"cols":{$colsJson}}"""
    }.sorted
    val f = fs(spark, dataDir)
    val out = f.create(new Path(dataDir, ManifestName), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Parse `_stats.json` under `dataDir`. Hand-rolled parse of the
    * exact format [[writeManifest]] emits (keys and decimal strings
    * contain no JSON metacharacters — column names are Spark
    * identifiers, values are decimal renderings). */
  def readManifest(spark: SparkSession, dataDir: String): Seq[FileStat] = {
    val f = fs(spark, dataDir)
    val in = f.open(new Path(dataDir, ManifestName))
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val FileR = """"file":"([^"]+)"""".r.unanchored
    val RowsR = """"rows":(\d+)""".r.unanchored
    val ColR = """"([^"]+)":(?:null|\["([^"]*)","([^"]*)"\])""".r
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val rel = line match { case FileR(p) => p }
      val rows = line match { case RowsR(n) => n.toLong }
      val colsBlob = line.substring(line.indexOf("\"cols\":{") + 8)
      val cols = ColR.findAllMatchIn(colsBlob).map { m =>
        m.group(1) -> Option(m.group(2)).map(mn => (mn, m.group(3)))
      }.toMap
      FileStat(rel, rows, cols)
    }
  }

  /** Split the manifest into (kept, skipped) for a CONJUNCTION of
    * range predicates `column BETWEEN lo AND hi`: a file is skipped
    * when ANY predicate's stats PROVE no row can match (max < lo or
    * min > hi, compared as exact BigDecimal). Predicates on columns
    * a file has no stats for — absent or all-null — keep the file
    * conservatively. Multi-column conjunctions are where a Z-ordered
    * layout beats a single-column sort: each Morton tile is tight on
    * BOTH dimensions, so both ranges prune multiplicatively.
    */
  def pruneRanges(manifest: Seq[FileStat],
      preds: Seq[(String, BigDecimal, BigDecimal)])
      : (Seq[FileStat], Seq[FileStat]) = {
    require(preds.nonEmpty, "at least one range predicate")
    // stats for a non-numeric column (writeManifest casts min/max of
    // ANY type to string) don't parse as BigDecimal — keep the file,
    // never throw: pruning must degrade to reading, not to failing
    def num(s: String): Option[BigDecimal] =
      try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
    manifest.partition { fstat =>
      preds.forall { case (column, lo, hi) =>
        fstat.cols.get(column).flatten match {
          case Some((mn, mx)) =>
            (num(mn), num(mx)) match {
              case (Some(nmn), Some(nmx)) => !(nmx < lo || nmn > hi)
              case _ => true
            }
          case None => true
        }
      }
    }
  }

  /** Single-predicate [[pruneRanges]]. */
  def pruneRange(manifest: Seq[FileStat], column: String,
      lo: BigDecimal, hi: BigDecimal): (Seq[FileStat], Seq[FileStat]) =
    pruneRanges(manifest, Seq((column, lo, hi)))

  /** Manifest-pruned read of `dataDir`: resolve the manifest, keep
    * only files whose [min,max] on `column` intersects [lo,hi], and
    * read THOSE files (basePath preserves partition-directory
    * columns). The predicate itself is NOT applied — the caller
    * filters, exactly like a table format's scan planner (pruning is
    * a superset guarantee, not a filter). Returns the pruned frame
    * plus the [[PruneStats]] census.
    */
  def readRangePruned(spark: SparkSession, dataDir: String,
      column: String, lo: BigDecimal, hi: BigDecimal)
      : (DataFrame, PruneStats) =
    readRangesPruned(spark, dataDir, Seq((column, lo, hi)))

  /** [[readRangePruned]] for a conjunction of range predicates —
    * a file survives only if every predicate's range intersects its
    * stats. */
  def readRangesPruned(spark: SparkSession, dataDir: String,
      preds: Seq[(String, BigDecimal, BigDecimal)])
      : (DataFrame, PruneStats) = {
    val manifest = readManifest(spark, dataDir)
    val (kept, skipped) = pruneRanges(manifest, preds)
    val stats = PruneStats(kept.size.toLong, skipped.size.toLong,
      kept.map(_.rows).sum, skipped.map(_.rows).sum)
    val df =
      if (kept.isEmpty)
        // preserve schema on a fully-pruned read: scan the directory
        // with an always-false filter instead of fabricating a frame
        spark.read.parquet(dataDir).filter(lit(false))
      else
        spark.read.option("basePath", dataDir)
          .parquet(kept.map(k => s"$dataDir/${k.relPath}"): _*)
    (df, stats)
  }
}
