package graft.plans

import graft.SparkSpec
import graft.operators.{FileStats, Snapshots}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Metadata-only aggregates (StatsAggRule): a whole-table
  * count(*)/min/max over a manifest-carrying directory must answer
  * from `_stats.json` as a LocalRelation — no file scan in the plan —
  * with exact values; anything the manifest cannot PROVE (filters,
  * string bounds, untracked columns, files outside the manifest)
  * must fall back to the scan, never to a wrong answer.
  */
class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** 4-file store: k in [0,400), one month of date-text per file, a
    * decimal price, a half-null long (all-null in bucket 0), and an
    * ALL-null long. */
  private def buildStore(): String = {
    val dir = freshDir("graft-agg")
    val df = (0L until 400L).map { i =>
      val month = i / 100 + 1
      (i, f"2024-$month%02d-${i % 28 + 1}%02d", i / 100,
        if (i < 100) None else Some(i * 3), BigDecimal(i) / 4)
    }.toDF("k", "d", "bucket", "v", "price")
      .withColumn("dt", to_date(col("d")))
      .withColumn("w", lit(null).cast("long"))
      .withColumn("price", col("price").cast("decimal(10,2)"))
      .repartition(col("bucket"))
    Snapshots.commitWithStats(spark, df, dir,
      statsCols = Seq("k", "d", "v", "price", "dt", "w"),
      partitionByCols = Seq("bucket"))
    dir
  }

  private def metadataOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation => lr
    }.isEmpty

  test("count/min/max answer from the manifest as a LocalRelation: " +
    "no relation in the plan, exact values, dates and decimals typed") {
    val dir = buildStore()
    val q = Snapshots.table(spark, dir).agg(
      count(lit(1)).as("n"),
      min("k").as("k_mn"), max("k").as("k_mx"),
      min("dt").as("dt_mn"), max("dt").as("dt_mx"),
      min("price").as("p_mn"), max("price").as("p_mx"))
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 400L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 399L)
    assert(r.getDate(3).toString == "2024-01-01" &&
      r.getDate(4).toString == "2024-04-28")
    assert(r.getDecimal(5) == new java.math.BigDecimal("0.00") &&
      r.getDecimal(6) == new java.math.BigDecimal("99.75"))
  }

  test("null semantics: all-null files contribute nothing; an " +
    "all-null column answers NULL — both still metadata-only") {
    val dir = buildStore()
    val q = Snapshots.table(spark, dir).agg(
      min("v").as("v_mn"), max("v").as("v_mx"),
      min("w").as("w_mn"))
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    // v is null in bucket 0 (k<100): true min is 100*3
    assert(r.getLong(0) == 300L && r.getLong(1) == 399L * 3)
    assert(r.isNullAt(2), "all-null column must answer NULL")
  }

  test("plain spark.read.parquet of the version dir rewrites too " +
    "(the injected rule, no Snapshots.table call)") {
    val dir = buildStore()
    val q = spark.read.parquet(s"$dir/v=1")
      .agg(count(lit(1)).as("n"), max("k").as("k_mx"))
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 400L && r.getLong(1) == 399L)
  }

  test("refusals fall back to the scan, never to a wrong answer: " +
    "filter, string bounds, count(col), untracked column, avg") {
    val dir = buildStore()
    val tbl = () => Snapshots.table(spark, dir)
    // a filter between scan and aggregate: whole-file rows are not an
    // answer — must scan, and the scanned answer is exact
    val f = tbl().filter(col("k") >= 100).agg(count(lit(1)).as("n"))
    assert(!metadataOnly(f))
    assert(f.head().getLong(0) == 300L)
    // string min/max: the manifest may truncate string bounds — refuse
    val s = tbl().agg(min("d").as("mn"))
    assert(!metadataOnly(s))
    assert(s.head().getString(0) == "2024-01-01")
    // count(col) answers from the manifest's non-null counts — but
    // count of an UNTRACKED column (the partition col) must refuse
    val c = tbl().agg(count(col("v")).as("n"))
    assert(metadataOnly(c), "count(col) should answer from nn counts")
    assert(c.head().getLong(0) == 300L)
    val cp = tbl().agg(count(col("bucket")).as("n"))
    assert(!metadataOnly(cp))
    assert(cp.head().getLong(0) == 400L)
    // partition column (read back as Int): no stats tracked for it
    val p = tbl().agg(max("bucket").as("mx"))
    assert(!metadataOnly(p))
    assert(p.head().getAs[Number](0).longValue == 3L)
    // one unanswerable aggregate poisons the whole rewrite
    val a = tbl().agg(count(lit(1)).as("n"), avg("k").as("a"))
    assert(!metadataOnly(a))
    assert(a.head().getLong(0) == 400L)
  }

  test("GROUP BY a partition column answers per-group count/min/max " +
    "from the manifest — no scan, values match the brute force") {
    val dir = buildStore()
    val q = Snapshots.table(spark, dir).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min("k").as("k_mn"),
        max("k").as("k_mx"))
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == (0L to 3L).map(b =>
      (b, 100L, b * 100, b * 100 + 99)))
    // null partition value groups as NULL, matching the scan
    val dir2 = freshDir("graft-aggnull")
    Snapshots.commitWithStats(spark,
      (0L until 90L).map(k => (k, if (k < 30) None else Some(k / 30)))
        .toDF("k", "p").repartition(col("p")),
      dir2, statsCols = Seq("k"), partitionByCols = Seq("p"))
    val qn = Snapshots.table(spark, dir2).groupBy(col("p"))
      .agg(count(lit(1)).as("n"))
    assert(metadataOnly(qn), qn.queryExecution.optimizedPlan.toString)
    val gotN = qn.collect()
      .map(r => (if (r.isNullAt(0)) -1L
        else r.getAs[Number](0).longValue, r.getLong(1))).sorted
    assert(gotN.toSeq == Seq((-1L, 30L), (1L, 30L), (2L, 30L)))
  }

  test("a PARTITION-ONLY filter is evaluated per file: filtered " +
    "count/min/max answer metadata-only, including the empty match") {
    val dir = buildStore()
    val q = Snapshots.table(spark, dir)
      .filter(col("bucket").isin(1, 3) && col("bucket") =!= 0)
      .agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"))
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 200L && r.getLong(1) == 100L &&
      r.getLong(2) == 399L)
    // grouped + filtered
    val qg = Snapshots.table(spark, dir).filter(col("bucket") >= 2)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    assert(metadataOnly(qg), qg.queryExecution.optimizedPlan.toString)
    assert(qg.collect().map(r2 =>
      (r2.getAs[Number](0).longValue, r2.getLong(1))).sorted.toSeq ==
      Seq((2L, 100L), (3L, 100L)))
    // nothing matches: one row, count 0, null bounds — still no scan
    val qe = Snapshots.table(spark, dir).filter(col("bucket") === 99)
      .agg(count(lit(1)).as("n"), max("k").as("mx"))
    assert(metadataOnly(qe), qe.queryExecution.optimizedPlan.toString)
    val re = qe.head()
    assert(re.getLong(0) == 0L && re.isNullAt(1))
    // a data-column reference in the filter falls back to the scan
    val qd = Snapshots.table(spark, dir)
      .filter(col("bucket") === 1 && col("k") < 150)
      .agg(count(lit(1)).as("n"))
    assert(!metadataOnly(qd))
    assert(qd.head().getLong(0) == 50L)
  }

  test("filtered metadata evaluation covers null-sentinel and " +
    "string/date partition values, not just ints") {
    val dir = freshDir("graft-aggfs")
    // string partition p (one null group), date partition d
    Snapshots.commitWithStats(spark,
      (0L until 120L).map { k =>
        (k, if (k < 30) None else Some(s"s${k / 30}"),
          f"2024-0${k % 3 + 1}-01")
      }.toDF("k", "p", "d")
        .withColumn("d", to_date(col("d")))
        .repartition(col("p"), col("d")),
      dir, statsCols = Seq("k"), partitionByCols = Seq("p", "d"))
    val tbl = () => Snapshots.table(spark, dir)
    // string equality on a partition value
    val qs = tbl().filter(col("p") === "s2").agg(count(lit(1)).as("n"))
    assert(metadataOnly(qs), qs.queryExecution.optimizedPlan.toString)
    assert(qs.head().getLong(0) == 30L)
    // the Hive null sentinel evaluates as SQL NULL
    val qn = tbl().filter(col("p").isNull).agg(count(lit(1)).as("n"))
    assert(metadataOnly(qn), qn.queryExecution.optimizedPlan.toString)
    assert(qn.head().getLong(0) == 30L)
    val qnn = tbl().filter(col("p").isNotNull)
      .agg(count(lit(1)).as("n"))
    assert(metadataOnly(qnn))
    assert(qnn.head().getLong(0) == 90L)
    // date-typed partition range
    val qd = tbl().filter(col("d") >= java.sql.Date.valueOf("2024-02-01"))
      .agg(count(lit(1)).as("n"))
    assert(metadataOnly(qd), qd.queryExecution.optimizedPlan.toString)
    assert(qd.head().getLong(0) ==
      spark.read.parquet(s"$dir/v=1")
        .filter(col("d") >= "2024-02-01").count())
  }

  test("GROUP BY a non-partition column falls back to the scan") {
    val dir = buildStore()
    val q = Snapshots.table(spark, dir).groupBy(col("d"))
      .agg(count(lit(1)).as("n"))
    assert(!metadataOnly(q))
    assert(q.count() == 112L) // distinct d values
  }

  test("non-canonical partition encodings group on the TYPED value: " +
    "p=03 and p=3 are one group, exactly like the real scan") {
    // externally-assembled tree — the commit protocol would never
    // write p=03, but a manifest over such a tree must not emit
    // duplicate group rows where the scan returns one
    val dir = freshDir("graft-aggenc")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$dir/p=3")
    Seq((3L, 30L), (4L, 40L)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$dir/p=03")
    FileStats.writeManifest(spark, dir, Seq("k"))
    val q = spark.read.parquet(dir).groupBy(col("p"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("mk"))
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.toString)
    val rows = q.collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows.head.getInt(0) == 3 && rows.head.getLong(1) == 4L &&
      rows.head.getLong(2) == 4L)
    // and the metadata answer equals the scan's (rule disabled by a
    // DATA-column filter, which refuses the rewrite but keeps all rows)
    val scan = spark.read.parquet(dir).filter(col("k") >= Long.MinValue)
      .groupBy(col("p")).agg(count(lit(1)).as("n"), max(col("k")).as("mk"))
    assert(!metadataOnly(scan))
    assert(scan.collect().toSeq == rows.toSeq)
  }

  test("a file outside the manifest disables the rewrite (coverage " +
    "guard) — the scan sees it, a manifest answer would not") {
    val dir = buildStore()
    val vDir = s"$dir/v=1"
    // plant 50 extra rows as a stray file the commit protocol never saw
    (400L until 450L).map(i => (i, "2024-05-01", 0L,
        Some(i * 3), BigDecimal(0)))
      .toDF("k", "d", "bucket", "v", "price")
      .withColumn("dt", to_date(col("d")))
      .withColumn("w", lit(null).cast("long"))
      .withColumn("price", col("price").cast("decimal(10,2)"))
      .coalesce(1)
      .write.parquet(s"$vDir/bucket=9")
    val q = spark.read.parquet(vDir).agg(count(lit(1)).as("n"),
      max("k").as("mx"))
    assert(!metadataOnly(q),
      "rewrite fired over files the manifest does not cover")
    val r = q.head()
    assert(r.getLong(0) == 450L && r.getLong(1) == 449L)
  }
}
