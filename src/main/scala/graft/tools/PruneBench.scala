package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{FileStats, Snapshots, ZOrder}

/** Controlled planner-pruning measurement (ROUNDLOG evidence): build
  * one Z-bucketed store from sf lineitem, then time the SAME
  * selective aggregate (a) through the manifest-consulting planner
  * index and (b) over an explicit all-files read that the
  * StatsPruneRule cannot touch (multiple root paths — the honest
  * index-less baseline inside an extension-bearing session). Prints
  * one JSON line with the prune census and both median-of-3 times;
  * requires both arms to return identical rows.
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    // z-bucket divisor: 16384 → 64 files (xq22's shape); 1024 → 1024
    // files — the regime where per-file open/footer/scheduling cost
    // (what manifests remove) dominates over raw scan bytes
    val div = if (args.nonEmpty) args(0).toLong else 16384L
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new java.io.File(
      System.getProperty("java.io.tmpdir", "/tmp"),
      s"graft-prunebench-${java.util.UUID.randomUUID()}")
      .getAbsolutePath
    try {
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(pmod(col("l_partkey"), lit(1024)).as("x"),
          pmod(col("l_suppkey"), lit(1024)).as("y"),
          col("l_quantity"), col("l_extendedprice"))
        .withColumn("z", ZOrder.interleave2(col("x"), col("y"), 10))
        .withColumn("z_bucket",
          call_function("div", col("z"), lit(div))).drop("z")
        .repartition(col("z_bucket"))
      val v = Snapshots.commitWithStats(spark, base, store,
        statsCols = Seq("x"), partitionByCols = Seq("z_bucket"))
      val vDir = s"$store/v=$v"
      val allFiles = FileStats.readManifest(spark, vDir)
        .map(m => s"$vDir/${m.relPath}")
      def agg(df: org.apache.spark.sql.DataFrame): Long =
        df.filter(col("x").between(100, 299))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).as("s")).head().getLong(0)
      def median3(f: () => Long): (Double, Long) = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = f()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (runs.map(_._1).sorted.apply(1), runs.head._2)
      }
      // construct each frame ONCE (listing/schema/manifest are
      // table-open costs, not per-query costs) and time the query
      val indexed = Snapshots.table(spark, store, v)
      val plain = spark.read.option("basePath", vDir)
        .parquet(allFiles: _*)
      // one unmeasured warmup of each arm: codegen/JIT for the shared
      // query shape must not be billed to whichever arm runs first
      agg(indexed); agg(plain)
      val (tIdx, nIdx) = median3(() => agg(indexed))
      val (tPlain, nPlain) = median3(() => agg(plain))
      require(nIdx == nPlain, s"row mismatch: $nIdx vs $nPlain")
      val q = Snapshots.table(spark, store, v)
        .filter(col("x").between(100, 299))
      q.count()
      val ps = graft.plans.StatsFileIndex.indexOf(q).get.lastPrune.get
      // metadata-only aggregate arm: whole-table count/min/max through
      // StatsAggRule (a LocalTableScan) vs the same aggregate forced
      // through a real scan (the explicit multi-root read the rule
      // cannot rewrite)
      def metaAgg(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(count(lit(1)).as("n"), min(col("x")).as("mn"),
          max(col("x")).as("mx")).head().getLong(0)
      metaAgg(indexed); metaAgg(plain)
      val (tMetaIdx, nMetaIdx) = median3(() => metaAgg(indexed))
      val (tMetaScan, nMetaScan) = median3(() => metaAgg(plain))
      require(nMetaIdx == nMetaScan,
        s"metadata-agg mismatch: $nMetaIdx vs $nMetaScan")
      println(s"""{"bench":"planner_prune","sf_dir":"$sfDir",""" +
        s""""files_read":${ps.filesRead},""" +
        s""""files_skipped":${ps.filesSkipped},""" +
        s""""rows_in_read":${ps.rowsInRead},""" +
        s""""rows_in_skipped":${ps.rowsInSkipped},""" +
        s""""t_indexed_sec":${"%.3f".format(tIdx)},""" +
        s""""t_plain_sec":${"%.3f".format(tPlain)},""" +
        s""""t_meta_agg_sec":${"%.3f".format(tMetaIdx)},""" +
        s""""t_scan_agg_sec":${"%.3f".format(tMetaScan)},""" +
        s""""rows":$nIdx}""")
    } finally {
      new Path(store).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .delete(new Path(store), true)
      spark.stop()
    }
  }
}
