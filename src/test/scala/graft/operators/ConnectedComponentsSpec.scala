package graft.operators

import graft.SparkSpec

/** Min-label propagation correctness: component = min reachable id,
  * isolated vertices are their own component, convergence is reached
  * within the diameter bound, and the dedup closure picks exactly one
  * keeper per component.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labels(vs: Seq[Long], es: Seq[(Long, Long)]) =
    ConnectedComponents.minLabel(
      vs.toDF("id"), es.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle and isolated vertex resolve to min-id " +
    "components") {
    // 1-2-3-4 chain (diameter 3), 10-11-12 triangle, 99 isolated
    val got = labels(Seq(1, 2, 3, 4, 10, 11, 12, 99),
      Seq((2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("edge orientation and duplicate edges don't matter") {
    val a = labels(Seq(1, 2, 3), Seq((3, 1), (2, 3)))
    val b = labels(Seq(1, 2, 3), Seq((1, 3), (3, 2), (3, 2), (2, 3)))
    assert(a == b && a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two merging chains converge (worst case for label " +
    "propagation: min label enters from one end)") {
    // 5-4-3-2-1-0: min 0 sits at the far end of a diameter-5 path
    val got = labels(0L to 5L,
      Seq((5, 4), (4, 3), (3, 2), (2, 1), (1, 0)))
    assert(got.values.toSet == Set(0L))
  }

  test("dedupClusters emits exactly one keeper per component") {
    val out = ConnectedComponents.dedupClusters(
      Seq(1L, 2L, 3L, 7L).toDF("id"),
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (7L, 7L, 1)))
    val keepersPerCluster = out.groupBy(_._2).map { case (_, rows) =>
      rows.count(_._3 == 1) }
    assert(keepersPerCluster.forall(_ == 1))
  }

  test("convergence check rides the checkpoint job: one action per round") {
    // diameter-5 path, min label at the far end: 5 propagation rounds
    // + 1 fixpoint round = 6 rounds. Each round must cost ONE SQL
    // execution (the localCheckpoint materialization, which carries
    // the observed changed-counter); a separate count() per round —
    // the old scheme — would show ~2x the executions.
    val sc = spark.sparkContext
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart => execs.incrementAndGet()
          case _ => ()
        }
    }
    org.apache.spark.GraftTestBridge.drainListenerBus(sc)
    sc.addSparkListener(listener)
    try {
      val got = labels(0L to 5L,
        Seq((5, 4), (4, 3), (3, 2), (2, 1), (1, 0)))
      assert(got.values.toSet == Set(0L))
      org.apache.spark.GraftTestBridge.drainListenerBus(sc)
      // 3 setup checkpoints (sym, vertex set, initial labels) + 6
      // round checkpoints + the collect = 10; leave headroom of 1 for
      // AQE sub-executions, still strictly below the ~15 of a
      // count-per-round scheme
      assert(execs.get() <= 11,
        s"expected one action per round, saw ${execs.get()} SQL executions")
    } finally sc.removeSparkListener(listener)
  }

  test("isolate-heavy graph: iterated state is edge-touched only, " +
    "isolates attach unchanged") {
    // 1000 isolates + one 3-vertex component: the fixpoint loop must
    // run on the 3 active vertices, not the 1003 — pinned by the
    // changed-counter trace (round 0 can move at most |active| labels)
    val vs = (0L until 1003L).toDF("id")
    val es = Seq((1000L, 1001L), (1001L, 1002L)).toDF("src", "dst")
    val out = ConnectedComponents.minLabel(vs, es)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 1003)
    assert((0L until 1000L).forall(i => out(i) == i), "isolates moved")
    assert(Seq(1000L, 1001L, 1002L).forall(i => out(i) == 1000L))
  }

  test("maxIter too small to converge throws instead of returning " +
    "wrong labels") {
    val vs = (0L to 10L).toDF("id")
    val es = (0L until 10L).map(i => (i + 1, i)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      ConnectedComponents.minLabel(vs, es, maxIter = 2)
    }
  }
}
