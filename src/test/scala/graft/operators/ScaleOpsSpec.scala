package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants for the round-5 scale operators: the distributed prefix
  * sum (PrefixSum), the binned range join (Joins.rangeJoinBinned), and
  * the Misra-Gries heavy-hitter sketch (functions.MisraGries).
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("PrefixSum equals a single-partition window cumsum, at any partitioning") {
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("k", "v")
    val expected = df
      .withColumn("cum", sum($"v").over(
        Window.orderBy($"k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(2)))
    for (parts <- Seq(1, 3, 16)) {
      val got = PrefixSum
        .withRunningSum(df.repartition(parts), Seq("k"), "v", "cum")
        .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(got.toSeq == expected.toSeq, s"parts=$parts")
    }
  }

  test("PrefixSum tolerates empty input and all-equal keys with tiebreaker") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.withRunningSum(empty, Seq("k"), "v", "cum")
      .count() == 0)
    // constant order key + unique tiebreaker still yields a total order
    val const = (1 to 50).map(i => (0L, i.toLong, 2L)).toDF("k", "id", "v")
    val cums = PrefixSum
      .withRunningSum(const, Seq("k", "id"), "v", "cum")
      .orderBy($"id").collect().map(_.getLong(3))
    assert(cums.toSeq == (1 to 50).map(_ * 2L))
  }

  test("withRunningSums: N columns over one sort equal N windowed " +
    "cumsums; nulls stay null until the first non-null") {
    // col a: dense values; col b: null until row 200, then sparse —
    // the cum must be NULL before the first non-null (not 0), and a
    // null value must not advance the total. Differential vs the
    // single-partition window at several partitionings exercises the
    // per-partition seed handoff for BOTH accumulators.
    val df = (1 to 400).map { i =>
      (i.toLong, (i * 37 % 101).toLong,
        if (i < 200 || i % 3 == 0) None else Some((i * 7 % 13).toLong))
    }.toDF("k", "a", "b")
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("ca", sum($"a").over(w))
      .withColumn("cb", sum($"b").over(w))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    for (parts <- Seq(1, 5, 16)) {
      val got = PrefixSum
        .withRunningSums(df.repartition(parts), Seq("k"),
          Seq("a" -> "ca", "b" -> "cb"))
        .orderBy($"k").collect()
        .map(r => (r.getLong(0), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      assert(got.toSeq == expected.toSeq, s"parts=$parts")
    }
  }

  test("withRunningSums rejects non-integral value columns") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.withRunningSums(df, Seq("k"), Seq("v" -> "cv"))
    }
  }

  test("withRunningMaxBefore equals a single-partition exclusive cummax") {
    val df = (1 to 300).map(i => (i.toLong, ((i * 73) % 97).toLong))
      .toDF("k", "v")
    val expected = df
      .withColumn("m", max($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, -1)))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    for (parts <- Seq(1, 4, 13)) {
      val got = PrefixSum
        .withRunningMaxBefore(df.repartition(parts), Seq("k"), "v", "m")
        .orderBy($"k").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      assert(got.toSeq == expected.toSeq, s"parts=$parts")
    }
  }

  test("HotBuckets: a planted 1200-doc identical-band bucket is " +
    "excluded from the join and accounted; normal buckets unaffected") {
    // without the cap this bucket alone is C(1200,2) = 719 400
    // candidates on ONE key — the straggler shape the cap exists for
    val banded = ((1 to 1200).map(i => (i.toLong, "HOT")) ++
      Seq((2001L, "ok1"), (2002L, "ok1"), (2003L, "ok1"), (2004L, "ok1"),
        (3001L, "ok2"), (3002L, "ok2"), (3003L, "ok2")))
      .toDF("doc_id", "band")
    val (cand, hot) = HotBuckets.cappedCandidates(
      banded, "doc_id", "band", cap = 100)
    val pairs = cand.collect()
    assert(pairs.length == 6 + 3, s"got ${pairs.length}") // C(4,2)+C(3,2)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    val h = hot.collect()
    assert(h.length == 1 && h(0).getString(0) == "HOT" &&
      h(0).getLong(1) == 1200L, h.mkString(","))
    // the exclusion must be a BROADCAST anti join (the over-cap set is
    // |rows|/cap-bounded): no extra shuffle of the big table
    cand.queryExecution.toRdd.count()
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan.take(2000))
    // boundary: a bucket AT the cap still joins
    val edge = (1 to 100).map(i => (i.toLong, "edge")).toDF("doc_id", "band")
    val (c2, h2) = HotBuckets.cappedCandidates(edge, "doc_id", "band", 100)
    assert(h2.count() == 0L && c2.count() == 100L * 99 / 2)
  }

  test("HotBuckets.routeOverCapStar: hot-bucket members route to " +
    "min-id star edges per discriminator group — linear, never " +
    "quadratic; sub-cap buckets contribute nothing") {
    // hot bucket "HOT" (6 members): sigs X (1,3,5) and Y (2,4), plus a
    // singleton sig Z (6). Star edges: X -> (1,3),(1,5); Y -> (2,4);
    // Z none. Sub-cap bucket "ok" must not route.
    val banded = Seq(
      (1L, "X", "HOT"), (3L, "X", "HOT"), (5L, "X", "HOT"),
      (2L, "Y", "HOT"), (4L, "Y", "HOT"), (6L, "Z", "HOT"),
      (7L, "X", "ok"), (8L, "X", "ok"))
      .toDF("doc_id", "sig_key", "bucket")
    val (cand, overCap) = HotBuckets.cappedCandidates(
      banded, "doc_id", "bucket", cap = 5)
    val routed = HotBuckets.routeOverCapStar(
      banded, "doc_id", "bucket", "sig_key", overCap)
    val got = routed.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 3L), (1L, 5L), (2L, 4L)), got.toString)
    // C(6,2)=15 pairs avoided; 3 star edges emitted — and the capped
    // join still produced the sub-cap bucket's pair
    assert(cand.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((7L, 8L)))
    // star edges span each sub-group: closure over routed edges
    // reaches every member of a signature-identical group
    assert(got.flatMap(p => Seq(p._1, p._2)) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("HotBuckets.filterOverQuantile: a planted super-hub lands above " +
    "the p90 degree cut, is excluded and accounted; the threshold is " +
    "the exact discrete quantile; ties cut by VALUE, not rank") {
    // 20 buckets: 18 of size 2, one of size 3, one planted 500-member
    // hub. n=20 -> ceil(0.9*20)=18 -> cap_n = smallest size whose
    // cumulative bucket count reaches 18 = 2 (18 buckets of size 2).
    val banded = ((1 to 18).flatMap(b =>
      Seq((b * 10L, s"b$b"), (b * 10L + 1, s"b$b"))) ++
      (1 to 3).map(i => (900L + i, "mid")) ++
      (1 to 500).map(i => (5000L + i, "HUB")))
      .toDF("id", "bucket")
    val (safe, hot, thr) =
      HotBuckets.filterOverQuantile(banded, "bucket", 9, 10)
    val th = thr.collect()
    assert(th.length == 1 && th(0).getLong(0) == 2L &&
      th(0).getLong(1) == 20L, th.mkString(","))
    // both over-cut buckets excluded (value cut: mid(3) AND HUB(500))
    val h = hot.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(h == Map("mid" -> 3L, "HUB" -> 500L), h.toString)
    assert(safe.count() == 36L)
    // the exclusion is a BROADCAST anti join — no extra big shuffle
    safe.queryExecution.toRdd.count()
    val plan = safe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan.take(2000))
    // uniform degrees: the quantile excludes NOTHING (cap = max size)
    val uni = (1 to 40).map(i => (i.toLong, s"u${i % 8}"))
      .toDF("id", "bucket")
    val (s2, h2, t2) = HotBuckets.filterOverQuantile(uni, "bucket", 9, 10)
    assert(h2.count() == 0L && s2.count() == 40L &&
      t2.collect()(0).getLong(0) == 5L)
  }

  test("PrefixSum at 2000 shuffle partitions: pass 2 is a narrow scan " +
    "(no second exchange, no window, no when-chain)") {
    // the scale regime the operator exists for: thousands of shuffle
    // partitions. Failure modes this guards against: a when-chain
    // offset map (a 2000-branch CaseWhen, past the 64KB codegen
    // method limit) and a Window.partitionBy(pid) second pass (an
    // extra Exchange hashpartitioning + full re-sort of ALL the
    // data). The correct shape has ONE shuffle — the range partition
    // inside pass 1 — and the consumer-visible plan is a pure narrow
    // scan over it.
    val conf = spark.conf
    val oldParts = conf.get("spark.sql.shuffle.partitions")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.shuffle.partitions", "2000")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1 to 4000).map(i => (i.toLong, (i % 7).toLong))
        .toDF("k", "v")
      val res = PrefixSum
        .withRunningSum(df.repartition(64), Seq("k"), "v", "cum")
      val p = res.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CASE WHEN") && !p.contains("CaseWhen"),
        "offset mapping regressed to a when-chain")
      assert(!p.contains("Window"),
        "pass 2 regressed to a window (second exchange + re-sort)")
      assert(!p.contains("Exchange"),
        s"pass 2 must add no shuffle:\n${p.take(2000)}")
      val got = res.orderBy($"k").collect().map(_.getLong(2))
      val exp = (1 to 4000).map(i => (i % 7).toLong)
        .scanLeft(0L)(_ + _).tail
      assert(got.toSeq == exp)
    } finally {
      conf.set("spark.sql.shuffle.partitions", oldParts)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      PrefixSum.unpersistAll()
    }
  }

  test("PrefixSum honors the StorageLevel parameter and unpersistAll releases the cache") {
    import org.apache.spark.storage.StorageLevel
    PrefixSum.unpersistAll()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("k", "v")
    val res = PrefixSum.withRunningSum(df, Seq("k"), "v", "cum",
      StorageLevel.DISK_ONLY)
    assert(res.count() == 100)
    val added = spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
    assert(added.nonEmpty, "expected the range-partitioned frame cached")
    assert(added.values.forall(_.getStorageLevel == StorageLevel.DISK_ONLY),
      s"wrong storage level: ${added.values.map(_.getStorageLevel)}")
    PrefixSum.unpersistAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.keySet.forall(!after.contains(_)),
      "unpersistAll left the frame cached")
  }

  test("rangeJoinBinned equals the naive theta join, across bin widths") {
    val points = (0L to 300L).map(p => (p, s"p$p")).toDF("pt", "pname")
    val intervals = (0L until 40L)
      .map(i => (i, i * 7, i * 7 + (i % 13) * 3)).toDF("iid", "s", "e")
    val naive = points.join(intervals,
        $"pt" >= $"s" && $"pt" <= $"e")
      .select($"iid", $"pt").orderBy($"iid", $"pt")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (w <- Seq(1L, 8L, 64L, 1000L)) {
      val got = Joins.rangeJoinBinned(points, "pt", intervals, "s", "e",
          identity, w)
        .select($"iid", $"pt").orderBy($"iid", $"pt")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == naive.toSeq, s"binWidth=$w")
      assert(got.length == got.distinct.length,
        s"binWidth=$w produced duplicate pairs")
    }
  }

  test("rangeJoinBinned bins exactly beyond 2^53 and on negative axes") {
    // double division would round these axis values (53-bit mantissa)
    // into the wrong bin and silently drop matching pairs; the long
    // floor-div must not. Also covers negative axis floor semantics.
    val base = (1L << 60) + 12345L
    val points = Seq(base, base + 1, base + 2, -base, -base - 7)
      .zipWithIndex.map { case (p, i) => (p, s"p$i") }.toDF("pt", "pname")
    val intervals = Seq(
      (1L, base, base + 1),        // matches base, base+1
      (2L, base + 2, base + 2),    // matches base+2 exactly
      (3L, -base - 10, -base))     // matches both negatives
      .toDF("iid", "s", "e")
    for (w <- Seq(1L, 7L, 1000L)) {
      val got = Joins.rangeJoinBinned(points, "pt", intervals,
          "s", "e", identity, w)
        .select($"iid", $"pt").orderBy($"iid", $"pt")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == Seq((1L, base), (1L, base + 1), (2L, base + 2),
        (3L, -base - 7), (3L, -base)), s"binWidth=$w: ${got.toSeq}")
    }
    // the Long.MinValue shore: (x - pmod(x, w)) would underflow here;
    // truncate-then-adjust must bin and match exactly
    val lo = Long.MinValue
    val extremePts = Seq(lo, lo + 1, lo + 6).zipWithIndex
      .map { case (p, i) => (p, s"x$i") }.toDF("pt", "pname")
    val extremeIv = Seq((9L, lo, lo + 2)).toDF("iid", "s", "e")
    val got = Joins.rangeJoinBinned(extremePts, "pt", extremeIv,
        "s", "e", identity, 7L)
      .select($"iid", $"pt").orderBy($"pt")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((9L, lo), (9L, lo + 1)), got.toSeq.toString)
  }

  test("rangeJoinBinned rejects colliding column names") {
    val p = Seq((1L, 2L)).toDF("ts", "x")
    val iv = Seq((1L, 2L)).toDF("ts", "e")
    intercept[IllegalArgumentException] {
      Joins.rangeJoinBinned(p, "ts", iv, "ts", "e", identity, 10L)
    }
  }

  test("MisraGries: candidate set supersets all true > n/(k+1) hitters") {
    // 10k rows: 'hot1' 2000, 'hot2' 1500, tail of 650 keys ~10 each
    val rows = (Seq.fill(2000)("hot1") ++ Seq.fill(1500)("hot2") ++
      (0 until 6500).map(i => s"t${i % 650}"))
    // scatter deterministically so hot keys span partitions
    val df = rows.zipWithIndex.sortBy(x => (x._2 * 2654435761L) % 10007)
      .map(_._1).toDF("key").repartition(7)
    val k = 9 // threshold n/10 = 1000
    val mg = df.agg(graft.functions.MisraGries($"key", k).as("mg"))
      .select(explode(map_keys($"mg")).as("key"))
      .collect().map(_.getString(0)).toSet
    assert(mg.size <= k, s"sketch exceeded capacity: ${mg.size}")
    assert(mg.contains("hot1") && mg.contains("hot2"),
      s"true heavy hitters missing from candidates: $mg")
  }

  test("MisraGries: under-capacity domains are preserved exactly") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("key").repartition(3)
    val m = df.agg(graft.functions.MisraGries($"key", 10).as("mg"))
      .collect()(0).getMap[String, Long](0)
    assert(m == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("SkewProbe: planted 90% hot key shows in max/hot-share while " +
    "uniform keys stay flat; percentiles are exact") {
    // 'hot' holds 900 rows; 100 cold keys hold 1 row each
    val rows = Seq.fill(900)("hot") ++ (0 until 100).map(i => s"k$i")
    val df = rows.toDF("key").repartition(5)
    val got = SkewProbe.keySkew(df, Seq("key")).collect().head
    graft.operators.ManagedCache.releaseAll()
    assert(got.getLong(1) == 101L && got.getLong(2) == 1000L)
    assert(got.getLong(3) == 900L, s"max: $got")
    // p50 over 101 keys = 51st smallest count = 1; p99 = 100th = 1
    // (the hot key is the 101st) — exact crossing, not an estimate
    assert(got.getLong(4) == 1L && got.getLong(5) == 1L, got.toString)
    assert(got.getLong(6) == 900L, s"hot share: $got") // 900‰
    // a uniform key has max == p50 == p99
    val uni = (0 until 500).map(i => s"u${i % 50}").toDF("key")
    val g2 = SkewProbe.keySkew(uni, Seq("key")).collect().head
    graft.operators.ManagedCache.releaseAll()
    assert(g2.getLong(3) == 10L && g2.getLong(4) == 10L &&
      g2.getLong(5) == 10L, g2.toString)
  }

  test("source guard: no operator uses the boxed df.rdd round-trip") {
    // The round-6 perf bug class: `df.rdd` deserializes every row out
    // of Tungsten (boxed Row) and `createDataFrame` re-serializes it.
    // The sanctioned bridge is queryExecution.toRdd + GraftColumnBridge
    // (InternalRow, never boxed) — currently PrefixSum and Joins. Any
    // new literal `.rdd` call in main sources must go through that
    // path instead; this guard fails the build if one appears.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala")
    val boxed = raw"\.rdd\b".r
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val rel = root.relativize(p).toString
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i)
            if boxed.findFirstIn(line).isDefined &&
              !line.contains("toRdd") &&
              !line.trim.startsWith("*") && !line.trim.startsWith("//") &&
              // the RDD TYPE name (imports, params), not a .rdd call
              !line.contains("org.apache.spark.rdd") =>
            s"$rel:${i + 1}: ${line.trim}"
        }
      }.toList
    assert(offenders.isEmpty,
      "boxed .rdd round-trip found (use queryExecution.toRdd + " +
        s"GraftColumnBridge instead):\n${offenders.mkString("\n")}")
  }
}
