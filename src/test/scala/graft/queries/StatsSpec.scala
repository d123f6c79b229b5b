package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-truth tests for the Stats module: fixtures small enough to
  * hand-compute the exact integer outputs (or tight bounds where a
  * terminal sqrt is involved).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("stats").toString

  test("xq17: a perfectly linear pair reads ~+1, an anti-linear " +
    "pair ~-1, and column pair names come out alphabetical") {
    val dir = tmp()
    // quantity q = i, extendedprice p = 2q (corr +1),
    // discount d = -q scaled (corr -1 with quantity), tax constant-ish
    (1 to 40).map(i => (i.toDouble, 2.0 * i, (41 - i) / 10000.0 * 100,
        ((i % 2) + 1) / 10000.0 * 100))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Stats.queries("xq17_correlation_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(out.keys.forall { case (a, b) => a < b }, out.keys.toString)
    assert(out(("extendedprice", "quantity")) >= 999998L,
      s"linear pair should read ~1e6: $out")
    assert(out(("discount", "quantity")) <= -999998L,
      s"anti-linear pair should read ~-1e6: $out")
  }

  test("xq18: an exactly independent grid has zero chi-square " +
    "contribution in every cell, and exp_micro matches R*C/N") {
    val dir = tmp()
    // priorities A,B with 2:1 weight; statuses X,Y with 3:1 weight;
    // counts exactly proportional => N*O == R*C everywhere
    val rows = for {
      (pri, pw) <- Seq(("A", 2), ("B", 1))
      (st, sw) <- Seq(("X", 3), ("Y", 1))
      _ <- 0 until (pw * sw * 5)
    } yield (pri, st)
    rows.toDF("o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Stats.queries("xq18_chi_square")(spark, dir).collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(4) == 0L),
      s"independent grid must have zero chi: ${out.mkString(",")}")
    // N=60, R(A)=40, C(X)=45 -> E = 30, exp_micro = 30e6
    val ax = out.find(r => r.getString(0) == "A" && r.getString(1) == "X").get
    assert(ax.getLong(2) == 30L && ax.getLong(3) == 30000000L, ax.toString)
  }

  test("xq19: equal shares give Gini 0 and HHI 1e9/n; a monopoly " +
    "nation reads high concentration") {
    val dir = tmp()
    // nation 0: four suppliers, equal revenue 100.00 each
    // nation 1: two suppliers, 1.00 vs 99.00
    val li = Seq.tabulate(4)(i => (i.toLong + 1, 100.0)) ++
      Seq((10L, 1.0), (11L, 99.0))
    li.toDF("l_suppkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0), (10L, 1), (11L, 1)))
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((0, "EQUALIA"), (1, "MONOPOLIA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = Stats.queries("xq19_concentration")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 4 equal shares: HHI = 4*(1/4)^2 = 0.25, Gini = 0
    assert(out("EQUALIA") == ((4L, 40000L, 250000000L, 0L)), out.toString)
    // shares 0.01/0.99: HHI = 0.0001+0.9801 = 0.9802
    // Gini: sorted x=(100,9900), num = (2*1-2-1)*100+(2*2-2-1)*9900
    //     = 9800, den = 2*10000 -> 0.49 -> 490000 micro
    assert(out("MONOPOLIA") == ((2L, 10000L, 980200000L, 490000L)),
      out.toString)
  }

  test("xg5: two parts sharing two deg-2 suppliers score RA = 1e9 " +
    "with 2 common suppliers; a part tied via one busier supplier " +
    "scores less") {
    val dir = tmp()
    // suppliers 100,101 each serve parts 1,2 (deg 2)
    // supplier 102 serves parts 1,2,3 (deg 3)
    val edges = Seq((1L, 100L), (2L, 100L), (1L, 101L), (2L, 101L),
      (1L, 102L), (2L, 102L), (3L, 102L))
    edges.toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Stats.queries("xg5_link_prediction")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // pair (1,2): suppliers 100,101 at 1/2 each + 102 at 1/3
    assert(out((1L, 2L)) == ((3L, 500000000L + 500000000L + 333333333L)),
      out.toString)
    // pairs (1,3),(2,3): only supplier 102
    assert(out((1L, 3L)) == ((1L, 333333333L)), out.toString)
    assert(out((2L, 3L)) == ((1L, 333333333L)), out.toString)
  }

  test("ts9: a series that echoes another one day later correlates " +
    "maximally at lag +1") {
    val dir = tmp()
    def at(day: Int, i: Int) = new java.sql.Timestamp(
      86400000L * day + i * 1000L)
    // type a: day d has an APERIODIC count (a periodic pattern would
    // also correlate perfectly at lag = shift - period)
    // type b: day d+1 has the same count (echo)
    val counts = Array(1, 4, 2, 5, 3, 1, 5, 2, 4)
    val rows = (for {
      d <- 0 to 8; i <- 0 until counts(d)
      r <- Seq((s"a-$d-$i", at(d, i), "a"), (s"b-$d-$i", at(d + 1, i), "b"))
    } yield r).zipWithIndex.map { case ((_, ts, et), id) =>
      (id.toLong, ts, 1L, et, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Stats.queries("ts9_lag_correlation")(spark, dir)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) Long.MinValue else r.getLong(4))).toMap
    assert(out(1L) >= 999998L, s"echo lag must read ~1e6: $out")
    assert(out.filterNot(_._1 == 1L).values.forall(_ < 999998L), out.toString)
  }

  test("ts10: a planted level shift puts the CUSUM peak on the last " +
    "day of the first regime with the exact cleared-denominator " +
    "magnitude") {
    val dir = tmp()
    // type a: days 0-4 one event/day, days 5-9 eleven events/day.
    // n=10, S=60; C_k = 10*cumx - 60k peaks at |C|=250, k=5 (day 4)
    val rows = (for {
      d <- 0 to 9; i <- 0 until (if (d < 5) 1 else 11)
    } yield (d * 100L + i, new java.sql.Timestamp(86400000L * d + i),
      1L, "a", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Stats.queries("ts10_cusum_changepoint")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("a", 10L, 4L, 250L)), r.toString)
  }

  test("ts11: the alpha=beta=1/2 integer Holt fold tracks a planted " +
    "ramp with the exact hand-computed state") {
    val dir = tmp()
    // daily counts 10,20,...,60 over days 0-5:
    // l: 10,15,23,34,46,58 ; b: 0,2,5,8,10,11
    val rows = (for {
      d <- 0 to 5; i <- 0 until (10 * (d + 1))
    } yield (d * 1000L + i, new java.sql.Timestamp(86400000L * d + i),
      1L, "a", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Stats.queries("ts11_holt_trend")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("a", 6L, 58L, 11L, 135L)), r.toString)
  }

  test("px13: identical texts tie every score, so AUC is exactly " +
    "1/2; labels split by observed score rank give exactly 1 (or 0 " +
    "inverted)") {
    val dir = tmp()
    def writeDocs(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // 1) one distinct score (same text everywhere), mixed labels:
    //    every pos-neg pair is a tie -> U = n1*n0/2 -> 500000
    writeDocs((1L to 6L).map(i =>
      (i, "same text for every doc", if (i <= 3) 300L else 10L)))
    val tied = Stats.queries("px13_auc_exact")(spark, dir).collect()(0)
    assert((tied.getLong(0), tied.getLong(1), tied.getLong(2)) ==
      ((3L, 3L, 500000L)), tied.toString)
    // 2) distinct texts; label the top-half BY OBSERVED SCORE -> AUC 1
    val texts = Seq("alpha beta gamma", "delta epsilon", "zeta eta theta",
      "iota kappa", "lambda mu nu xi", "omicron pi")
    writeDocs(texts.zipWithIndex.map { case (t, i) => (i + 1L, t, 0L) })
    val byScore = Pipeline.queries("px8_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).sortBy(_._2)
    assume(byScore.map(_._2).distinct.length == 6, "need distinct scores")
    val topHalf = byScore.drop(3).map(_._1).toSet
    writeDocs(texts.zipWithIndex.map { case (t, i) =>
      (i + 1L, t, if (topHalf(i + 1L)) 300L else 10L) })
    val sep = Stats.queries("px13_auc_exact")(spark, dir).collect()(0)
    assert(sep.getLong(2) == 1000000L, sep.toString)
    // inverted labels -> AUC exactly 0
    writeDocs(texts.zipWithIndex.map { case (t, i) =>
      (i + 1L, t, if (topHalf(i + 1L)) 10L else 300L) })
    val inv = Stats.queries("px13_auc_exact")(spark, dir).collect()(0)
    assert(inv.getLong(2) == 0L, inv.toString)
  }

  test("tx24: powers-of-two Zipf staircase yields the exact integer " +
    "least-squares slope") {
    val dir = tmp()
    // frequencies 16,8,4,2,1 for tokens w1..w5:
    // lx = 0,1,1,2,2 ; ly = 4,3,2,1,0
    // n=5 sx=6 sy=10 sxy=7 sxx=10
    // slope = (35-60)*1e6 div 14 = -1785714 (truncating div)
    val text = (List.fill(16)("w1") ++ List.fill(8)("w2") ++
      List.fill(4)("w3") ++ List.fill(2)("w4") ++ List("w5"))
      .mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Stats.queries("tx24_zipf_slope")(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 5L, out(0).toString)
    assert(out(0).getLong(1) == -1785714L, out(0).toString)
  }
}
