package graft.operators

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot tables — the minimal transaction protocol a
  * parquet lake needs before a real table format arrives: every
  * commit writes a COMPLETE new version directory and then publishes
  * it by atomically replacing a tiny `_latest` pointer file. Readers
  * resolve the pointer first, so they only ever see fully-written
  * versions (a crashed writer leaves an orphan directory the vacuum
  * reclaims — never a torn table), and a published version is
  * immutable, which is exactly what makes time travel and rollback
  * trivial: both are pointer moves.
  *
  * This complements the Upsert family (which computes WHAT the next
  * version contains) and Compaction (which can rewrite a version's
  * files): at 100 TB the same protocol holds — the pointer is O(1)
  * regardless of table size, and the full-rewrite `commit` becomes a
  * manifest-reusing incremental commit under a real table format.
  *
  * Layout: `dir/v=N/…parquet` + `dir/_latest` (ASCII version number).
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_latest")

  /** The committed version, 0 if the table has never been published. */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = pointer(dir)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "US-ASCII").trim.toLong
      finally in.close()
    }
  }

  /** Write `df` as the next version and publish it atomically.
    * Returns the new version number. A crash between the data write
    * and the pointer replace leaves the table at the PREVIOUS
    * version with an orphan directory — vacuum() reclaims it.
    */
  def commit(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val v = latestVersion(spark, dir) + 1
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    publish(spark, dir, v)
    v
  }

  /** Point `_latest` at `v` via write-temp-then-rename (rename is
    * atomic on HDFS/posix; object stores substitute a conditional
    * put). */
  private def publish(spark: SparkSession, dir: String, v: Long): Unit = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val tmp = new Path(dir, s"_latest.tmp.$v")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("US-ASCII")) finally out.close()
    if (f.exists(pointer(dir))) f.delete(pointer(dir), false)
    if (!f.rename(tmp, pointer(dir)))
      throw new java.io.IOException(s"publish of v=$v lost a race")
  }

  /** Read a specific version (default: the committed latest). */
  def read(spark: SparkSession, dir: String,
      version: Long = -1L): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, dir)
    require(v > 0, s"$dir has no committed version")
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Roll the table back to an earlier committed version — a pointer
    * move; later versions stay on disk (forensics) until vacuumed. */
  def rollback(spark: SparkSession, dir: String, v: Long): Unit = {
    require(v > 0 && v <= latestVersion(spark, dir),
      s"cannot roll back to unpublished v=$v")
    publish(spark, dir, v)
  }

  /** Write-audit-publish: stage `df` as the next version directory,
    * run the quality suite AGAINST THE STAGED FILES (what readers
    * would see, not the in-memory plan), and publish the pointer only
    * if every check passes. On violations the staged directory is
    * left unpublished (an orphan vacuum() reclaims) and the table
    * stays at its previous version — the WAP pattern lakehouse
    * pipelines run on every batch. Returns Right(version) or
    * Left(violation census rows).
    */
  def commitChecked(spark: SparkSession, df: DataFrame, dir: String,
      checks: DataFrame => Seq[DataFrame])
      : Either[Seq[(String, Long)], Long] = {
    val v = latestVersion(spark, dir) + 1
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    val staged = spark.read.parquet(s"$dir/v=$v")
    val bad = DataQuality.suite(checks(staged))
      .filter(org.apache.spark.sql.functions.col("n_violations") > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    if (bad.nonEmpty) Left(bad)
    else { publish(spark, dir, v); Right(v) }
  }

  /** Delete version directories that are (a) orphans ABOVE the
    * committed pointer (failed/rolled-back writes) or (b) older than
    * the `keepLast` most recent committed versions. Never touches the
    * pointer or the versions it protects. Returns deleted versions.
    */
  def vacuum(spark: SparkSession, dir: String,
      keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val f = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    val versions = f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
    val doomed = versions.filter(v =>
      v > latest || v <= latest - keepLast)
    doomed.foreach(v => f.delete(new Path(dir, s"v=$v"), true))
    doomed
  }
}
