package graft.sources

import graft.SparkSpec
import graft.operators.{FileStats, Snapshots}
import graft.plans.StatsFileIndex
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** The registered `format("snapshot")` batch connector: SQL/pyspark
  * users must get the full lakehouse stack — time travel, manifest
  * pruning, metadata-only aggregates, catalog tables — from the
  * format name alone, and the write path must commit real versions.
  */
class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** v1 = 4 bucketed files with stats on v; v2 = a decoy head. */
  private def store(): String = {
    val dir = freshDir("graft-src")
    val df = (0L until 400L).map(i => (i, i / 100))
      .toDF("v", "b").repartition(col("b"))
    Snapshots.commitWithStats(spark, df, dir, statsCols = Seq("v"),
      partitionByCols = Seq("b"))
    Snapshots.commit(spark, Seq((-1L, 9L)).toDF("v", "b"), dir)
    dir
  }

  test("load() reads the latest head; versionAsOf/tag/branch pin " +
    "history; the pins are mutually exclusive") {
    val dir = store()
    assert(spark.read.format("snapshot").load(dir).count() == 1L)
    val v1 = spark.read.format("snapshot")
      .option("versionAsOf", "1").load(dir)
    assert(v1.count() == 400L)
    Snapshots.tag(spark, dir, "audit", 1L)
    assert(spark.read.format("snapshot").option("tag", "audit")
      .load(dir).count() == 400L)
    Snapshots.createBranch(spark, dir, "dev", 1L)
    assert(spark.read.format("snapshot").option("branch", "dev")
      .load(dir).count() == 400L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("snapshot").option("versionAsOf", "1")
        .option("tag", "audit").load(dir)
    }
    assert(e.getMessage.contains("mutually exclusive"))
    // a v=N subdirectory would bypass versioning as a bare parquet
    // path — refused with a pointer to versionAsOf
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("snapshot").load(s"$dir/v=1")
    }
    assert(e2.getMessage.contains("versionAsOf"), e2.getMessage)
  }

  test("timestampAsOf pins the newest version committed at or " +
    "before the instant; pre-history timestamps fail loudly") {
    val dir = freshDir("graft-srct")
    Snapshots.commit(spark, Seq((1L, 1L)).toDF("v", "b"), dir)
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    Snapshots.commit(spark, Seq((1L, 1L), (2L, 2L)).toDF("v", "b"), dir)
    assert(Snapshots.versionAt(spark, dir, between) == 1L)
    assert(Snapshots.versionAt(spark, dir,
      System.currentTimeMillis()) == 2L)
    // the connector route, epoch-millis form
    assert(spark.read.format("snapshot")
      .option("timestampAsOf", between.toString).load(dir)
      .count() == 1L)
    // ISO and SQL forms parse (future instant pins the head)
    assert(spark.read.format("snapshot")
      .option("timestampAsOf", "2099-01-01T00:00:00Z").load(dir)
      .count() == 2L)
    assert(spark.read.format("snapshot")
      .option("timestampAsOf", "2099-01-01 00:00:00").load(dir)
      .count() == 2L)
    // a pre-history instant throws with a vacuum-aware message
    val e = intercept[IllegalArgumentException] {
      spark.read.format("snapshot").option("timestampAsOf", "1000")
        .load(dir)
    }
    assert(e.getMessage.contains("oldest retained"), e.getMessage)
    // mutually exclusive with versionAsOf
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("snapshot").option("timestampAsOf", "1000")
        .option("versionAsOf", "1").load(dir)
    }
    assert(e2.getMessage.contains("mutually exclusive"))
  }

  test("backfillPubtimes makes a pre-timestamp-travel store " +
    "versionAt-able (mtime-approximate, create-exclusive, " +
    "idempotent; genuine records never overwritten)") {
    val dir = freshDir("graft-srcbf")
    Snapshots.commit(spark, Seq((1L, 1L)).toDF("v", "b"), dir)
    Thread.sleep(30)
    Snapshots.commit(spark, Seq((1L, 1L), (2L, 2L)).toDF("v", "b"), dir)
    // simulate a pre-r16 store: strip the publication records
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq(1L, 2L).foreach(v => f.delete(
      new org.apache.hadoop.fs.Path(dir, s"_pubtime.$v"), false))
    val e = intercept[IllegalArgumentException] {
      Snapshots.versionAt(spark, dir, System.currentTimeMillis())
    }
    assert(e.getMessage.contains("no publication records"), e.getMessage)
    // backfill stamps both from directory mtimes; travel works again
    assert(Snapshots.backfillPubtimes(spark, dir) == Seq(1L, 2L))
    assert(Snapshots.versionAt(spark, dir,
      System.currentTimeMillis()) == 2L)
    // idempotent: a second run stamps nothing and overwrites nothing
    assert(Snapshots.backfillPubtimes(spark, dir).isEmpty)
  }

  test("timestamp travel serves PUBLISHED main-line history only: a " +
    "branch-only commit in the middle is never surfaced") {
    val dir = freshDir("graft-srcb")
    Snapshots.commit(spark, Seq((1L, 1L)).toDF("v", "b"), dir) // v1
    Snapshots.createBranch(spark, dir, "dev")
    // occupies v2 WITHOUT touching the main pointer
    Snapshots.commitToBranch(spark,
      (0L until 9L).map(i => (i, 0L)).toDF("v", "b"), dir, "dev")
    Thread.sleep(30)
    val afterBranch = System.currentTimeMillis()
    Thread.sleep(30)
    Snapshots.commit(spark, Seq((1L, 1L), (2L, 2L)).toDF("v", "b"),
      dir) // v3, main head
    // between the branch commit and the main commit, main WAS v1
    assert(Snapshots.versionAt(spark, dir, afterBranch) == 1L)
    assert(Snapshots.versionAt(spark, dir,
      System.currentTimeMillis()) == 3L)
  }

  test("readChangeFeed: a caught-up consumer gets an EMPTY frame, " +
    "not an error, and head pins are refused") {
    val dir = freshDir("graft-srcc")
    Snapshots.commit(spark, Seq((1L, 1L)).toDF("v", "b"), dir)
    Snapshots.commit(spark, Seq((2L, 2L)).toDF("v", "b"), dir)
    val caughtUp = spark.read.format("snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2").load(dir)
    assert(caughtUp.count() == 0L)
    assert(caughtUp.columns.contains("_version"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("snapshot").option("readChangeFeed", "true")
        .option("versionAsOf", "1").load(dir)
    }
    assert(e.getMessage.contains("readChangeFeed"), e.getMessage)
    // bound options are validated like every other option: zero /
    // negative endingVersion and inverted ranges are loud errors,
    // never silently "latest"
    def cdf(opts: (String, String)*) = {
      val r = spark.read.format("snapshot")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(dir)
    }
    val e0 = intercept[IllegalArgumentException] {
      cdf("endingVersion" -> "0")
    }
    assert(e0.getMessage.contains("endingVersion"), e0.getMessage)
    intercept[IllegalArgumentException] { cdf("endingVersion" -> "-3") }
    intercept[IllegalArgumentException] {
      cdf("startingVersion" -> "2", "endingVersion" -> "1")
    }
    intercept[IllegalArgumentException] {
      cdf("startingVersion" -> "-1")
    }
    // equal bounds = a caught-up consumer: empty feed, not an error
    assert(cdf("startingVersion" -> "2", "endingVersion" -> "2")
      .count() == 0L)
  }

  test("a filtered read through the connector prunes via the stats " +
    "index, and an ungrouped aggregate answers metadata-only") {
    val dir = store()
    val tbl = spark.read.format("snapshot")
      .option("versionAsOf", "1").load(dir)
    val q = tbl.filter(col("v").between(0, 99))
    assert(q.count() == 100L)
    val ps = StatsFileIndex.indexOf(tbl).flatMap(_.lastPrune)
      .getOrElse(fail("connector read carried no stats index"))
    assert(ps.filesRead == 1L && ps.filesSkipped == 3L, ps)
    // metadata-only count/min/max: no file relation left in the plan
    val agg = spark.read.format("snapshot").option("versionAsOf", "1")
      .load(dir).agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
    val metadataOnly = agg.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation => lr
    }.isEmpty
    assert(metadataOnly, agg.queryExecution.optimizedPlan.toString)
    val r = agg.head()
    assert(r.getLong(0) == 400L && r.getLong(1) == 0L &&
      r.getLong(2) == 399L)
  }

  test("CREATE TABLE ... USING snapshot serves plain SQL, and " +
    "refreshTable picks up a new head") {
    val dir = store()
    spark.sql("DROP TABLE IF EXISTS snap_spec_t")
    spark.sql(
      s"CREATE TABLE snap_spec_t USING snapshot OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM snap_spec_t")
        .head().getLong(0) == 1L) // the decoy head
      Snapshots.commit(spark,
        (0L until 7L).map(i => (i, 0L)).toDF("v", "b"), dir)
      spark.catalog.refreshTable("snap_spec_t")
      assert(spark.sql("SELECT count(*) AS n FROM snap_spec_t")
        .head().getLong(0) == 7L)
    } finally spark.sql("DROP TABLE IF EXISTS snap_spec_t")
  }

  test("the write path commits real versions: overwrite starts a " +
    "table with sidecars from options, append splices instead of " +
    "rescanning, ErrorIfExists/Ignore honor existing stores") {
    val dir = freshDir("graft-srcw")
    val a = (0L until 200L).map(i => (i, i / 100)).toDF("v", "b")
      .repartition(col("b"))
    a.write.format("snapshot").option("statsCols", "v")
      .option("partitionBy", "b").mode("overwrite").save(dir)
    assert(Snapshots.latestVersion(spark, dir) == 1L)
    val m1 = FileStats.readManifest(spark, s"$dir/v=1")
    assert(m1.size == 2 && m1.map(_.rows).sum == 200L)
    // append: old entries carried VERBATIM (same relPaths), new files
    // scanned; missing columns conform to NULL
    (200L until 250L).map(i => (i, 2L)).toDF("v", "b").coalesce(1)
      .write.format("snapshot").mode("append").save(dir)
    assert(Snapshots.latestVersion(spark, dir) == 2L)
    val m2 = FileStats.readManifest(spark, s"$dir/v=2")
    assert(m2.map(_.rows).sum == 250L)
    assert(m1.map(_.relPath).toSet.subsetOf(m2.map(_.relPath).toSet))
    val back = spark.read.format("snapshot").load(dir)
    assert(back.count() == 250L)
    assert(back.agg(max(col("v"))).head().getLong(0) == 249L)
    // a column the table does not have is refused
    val e = intercept[IllegalArgumentException] {
      Seq((1L, 1L, "x")).toDF("v", "b", "zz")
        .write.format("snapshot").mode("append").save(dir)
    }
    assert(e.getMessage.contains("zz"))
    // ErrorIfExists refuses a live store; Ignore leaves it untouched
    intercept[IllegalStateException] {
      a.write.format("snapshot").mode("errorifexists").save(dir)
    }
    a.write.format("snapshot").mode("ignore").save(dir)
    assert(Snapshots.latestVersion(spark, dir) == 2L)
    // time travel across connector-written versions
    assert(spark.read.format("snapshot").option("versionAsOf", "1")
      .load(dir).count() == 200L)
  }

  test("one format, three directions: readStream.format(\"snapshot\") " +
    "streams the version log; readChangeFeed reads the ranged " +
    "append replay as a batch frame") {
    val dir = freshDir("graft-srcs")
    (0 until 3).foreach(i => Snapshots.commit(spark,
      (i * 10L until i * 10L + 10L).map(k => (k, s"s$k"))
        .toDF("k", "s"), dir))
    // streaming: same contract as snapshot-log, via the batch name
    val q = spark.readStream.format("snapshot").option("path", dir)
      .load()
      .writeStream.format("memory").queryName("snapsrc_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("snapsrc_stream")
      assert(got.count() == 30L)
      assert(got.select("_version").distinct().count() == 3L)
    } finally q.stop()
    // change feed as a batch frame, version-ranged
    val cdf = spark.read.format("snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir)
    assert(cdf.count() == 20L)
    assert(cdf.select("_version").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(cdf.filter(col("_version") === 3L)
      .agg(min("k")).head().getLong(0) == 20L)
  }

  test("writeStream.format(\"snapshot\"): store -> stream -> store " +
    "entirely through the one format name, exactly-once across a " +
    "checkpoint restart, epoch-fenced versions on the sink side") {
    val src = freshDir("graft-snksrc")
    val dst = freshDir("graft-snkdst")
    val ckpt = freshDir("graft-snkck")
    (0 until 3).foreach(i => Snapshots.commit(spark,
      (i * 10L until i * 10L + 10L).map(k => (k, s"s$k")).toDF("k", "s"),
      src))
    def run() = spark.readStream.format("snapshot")
      .option("path", src).load()
      .drop("_version")
      .writeStream.format("snapshot")
      .option("path", dst)
      .option("checkpointLocation", ckpt)
      .start()
    val q = run()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.format("snapshot").load(dst)
    assert(got.count() == 30L)
    assert(got.select("k").distinct().count() == 30L)
    // epoch markers seal each sink version (the exactly-once fence)
    val f = new org.apache.hadoop.fs.Path(dst).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v1Files = f.listStatus(new org.apache.hadoop.fs.Path(
      s"$dst/v=1")).map(_.getPath.getName)
    assert(v1Files.exists(_.startsWith("_epoch.")), v1Files.toSeq)
    // new source commits + a RESTARTED query from the same
    // checkpoint: only the new versions land, zero redelivery
    (3 until 5).foreach(i => Snapshots.commit(spark,
      (i * 10L until i * 10L + 10L).map(k => (k, s"s$k")).toDF("k", "s"),
      src))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val got2 = spark.read.format("snapshot").load(dst)
    assert(got2.count() == 50L, "redelivery or loss across restart")
    assert(got2.select("k").distinct().count() == 50L)
    // refused shapes: partitionBy and non-append output modes
    val e = intercept[Exception] {
      spark.readStream.format("snapshot").option("path", src).load()
        .writeStream.format("snapshot").partitionBy("k")
        .option("path", freshDir("graft-snkp"))
        .option("checkpointLocation", freshDir("graft-snkpc"))
        .start()
    }
    assert(e.getMessage.contains("partitionBy"), e.getMessage)
  }

  test("catalog persistence: saveAsTable registers a snapshot table " +
    "in the external catalog; a NEW session (fresh SessionState over " +
    "the shared catalog) lists, queries, and DMLs it — and the " +
    "original session sees that DML through the freshness rule") {
    val dir = freshDir("graft-srcsat")
    (0L until 20L).map(i => (i, s"s$i")).toDF("k", "s")
      .write.format("snapshot").option("path", dir)
      .saveAsTable("sat_persist")
    assert(spark.catalog.tableExists("sat_persist"))
    assert(Snapshots.latestVersion(spark, dir) == 1L)
    // a fresh session: new SessionState (new analyzer, new relation
    // cache), SAME external catalog — the session-restart shape the
    // in-process harness can exercise. (Surviving a full JVM restart
    // additionally needs a persistent metastore:
    // spark.sql.catalogImplementation=hive — the table record is
    // provider + path, nothing graft-specific.)
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("sat_persist"))
    assert(s2.sql("SELECT count(*) AS n FROM sat_persist")
      .head.getLong(0) == 20L)
    // extensions travel with the session build: SQL DML works in the
    // new session too
    assert(s2.sql("DELETE FROM sat_persist WHERE k < 5")
      .head.getLong(0) == 5L)
    // and the ORIGINAL session's cached relation refreshes
    assert(spark.sql("SELECT count(*) AS n FROM sat_persist")
      .head.getLong(0) == 15L)
    spark.sql("DROP TABLE sat_persist")
  }

  test("appended rows land in the right partition directories and " +
    "prune alongside the originals") {
    val dir = freshDir("graft-srcp")
    (0L until 100L).map(i => (i, i / 50)).toDF("v", "b")
      .repartition(col("b"))
      .write.format("snapshot").option("statsCols", "v")
      .option("partitionBy", "b").mode("overwrite").save(dir)
    (100L until 150L).map(i => (i, 2L)).toDF("v", "b").coalesce(1)
      .write.format("snapshot").mode("append").save(dir)
    val tbl = spark.read.format("snapshot").load(dir)
    assert(tbl.filter(col("v") >= 100L).count() == 50L)
    val ps = StatsFileIndex.indexOf(tbl).flatMap(_.lastPrune)
      .getOrElse(fail("no stats index after append"))
    assert(ps.filesSkipped == 2L && ps.filesRead == 1L, ps)
    assert(tbl.filter(col("b") === 2L).count() == 50L)
  }
}
