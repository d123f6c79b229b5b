package graft.operators

import graft.{Fixtures, SparkSpec}
import graft.model.JobcanSchemas
import graft.normalize.Normalize
import graft.views.Views
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance must be indistinguishable from a full
  * recompute after any mix of update / insert / delete in one batch.
  */
class IncrementalViewSpec extends SparkSpec {

  private def baseTables: Map[String, DataFrame] = {
    val reqs = Normalize.requests(
      Fixtures.df(spark, JobcanSchemas.requestDetailSchema,
        Fixtures.requestSa10, Fixtures.requestSa11))
    reqs
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("refreshKeyed(update+insert+delete) equals a full recompute") {
    import spark.implicits._
    val t0 = baseTables
    // the view as-of t0 — stands in for the persisted materialization
    // (t0's DataFrames are immutable; the batch builds a new map)
    val materialized = new Views(t0).viewRequestDetails

    // one batch: sa-10 updated, sa-11 deleted, sa-99 inserted
    val r0 = t0("requests")
    val updated = r0.filter(col("id") =!= "sa-11")
      .withColumn("status",
        when(col("id") === "sa-10", lit("completed"))
          .otherwise(col("status")))
    val inserted = r0.filter(col("id") === "sa-10")
      .withColumn("id", lit("sa-99"))
      .withColumn("title", lit("cloned request"))
    val t1 = t0 + ("requests" -> updated.unionByName(inserted))

    val v1 = new Views(t1).viewRequestDetails
    val full = sortedRows(v1)
    val incr = sortedRows(IncrementalView.refreshKeyed(
      materialized, v1,
      "id", Seq("sa-10", "sa-11", "sa-99").toDF("id")))
    assert(incr == full)
    // the delete really vanished and the insert really appeared
    assert(!incr.exists(_.startsWith("sa-11|")))
    assert(incr.exists(_.startsWith("sa-99|")))
  }

  test("refreshMultiKeyed: a child-table-only batch (expense changed, " +
    "requests untouched) equals a full recompute") {
    val t0 = baseTables
    val materialized = new Views(t0).viewRequestDetails

    // the batch touches ONLY the expense table: sa-10's expense row
    // gets a new description. The view key (request id) is reached
    // through the child row's request_id FK.
    val e0 = t0("expense")
    val delta = e0.filter(col("request_id") === "sa-10")
      .withColumn("content_description", lit("re-filed expense"))
    val e1 = e0.filter(col("request_id") =!= "sa-10")
      .unionByName(delta)
    val t1 = t0 + ("expense" -> e1)

    val v1 = new Views(t1).viewRequestDetails
    val incr = IncrementalView.refreshMultiKeyed(
      materialized, v1, "id", Seq(delta -> "request_id"))
    assert(sortedRows(incr) == sortedRows(v1))
    // and it actually picked the child change up
    assert(sortedRows(incr).exists(_.contains("re-filed expense")))
    assert(sortedRows(materialized) != sortedRows(v1),
      "fixture must actually change the view or the test proves nothing")
  }

  test("refreshMultiKeyed: simultaneous parent+child deltas, null FKs " +
    "dropped, keys de-duplicated across sources") {
    import spark.implicits._
    val t0 = baseTables
    val materialized = new Views(t0).viewRequestDetails

    // one batch touches BOTH sides of the join: sa-10's request row
    // (status) and sa-10's + sa-11's expense rows; the expense delta
    // also carries an orphan row with a null FK
    val r1 = t0("requests").withColumn("status",
      when(col("id") === "sa-10", lit("completed"))
        .otherwise(col("status")))
    val reqDelta = r1.filter(col("id") === "sa-10")
    val e0 = t0("expense")
    val expDelta = e0.filter(col("request_id").isin("sa-10", "sa-11"))
      .withColumn("advanced_payment", lit(1L))
      .unionByName(e0.limit(1).withColumn("request_id",
        lit(null).cast("string")))
    val e1 = e0.filter(!col("request_id").isin("sa-10", "sa-11"))
      .unionByName(expDelta.filter(col("request_id").isNotNull))
    val t1 = t0 + ("requests" -> r1) + ("expense" -> e1)

    val v1 = new Views(t1).viewRequestDetails
    val incr = IncrementalView.refreshMultiKeyed(
      materialized, v1, "id",
      Seq(reqDelta -> "id", expDelta -> "request_id"))
    assert(sortedRows(incr) == sortedRows(v1))
  }

  test("refreshKeyed with an empty change set is the identity") {
    import spark.implicits._
    val t0 = baseTables
    val v0 = new Views(t0).viewRequestDetails
    val out = IncrementalView.refreshKeyed(v0, v0, "id",
      Seq.empty[String].toDF("id"))
    assert(sortedRows(out) == sortedRows(v0))
  }

  test("refreshKeyed rejects malformed change-key frames") {
    import spark.implicits._
    val v = Seq(("a", 1)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      IncrementalView.refreshKeyed(v, v, "id",
        Seq(("a", 1)).toDF("id", "x"))
    }
  }

  test("refreshAdditive merges per-key deltas; untouched keys and " +
    "non-measure columns pass through; empty delta is identity") {
    import spark.implicits._
    val mat = Seq(("a", "x", 10L, 2L), ("b", "y", 5L, 1L))
      .toDF("id", "tag", "sum_qty", "n_items")
    val delta = Seq(("a", -3L)).toDF("id", "delta_sum_qty")
    val out = IncrementalView.refreshAdditive(mat, "id", delta)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq ==
      Seq(("a", "x", 7L, 2L), ("b", "y", 5L, 1L)))
    val empty = Seq.empty[(String, Long)].toDF("id", "delta_sum_qty")
    val same = IncrementalView.refreshAdditive(mat, "id", empty)
      .orderBy("id").collect().map(_.toSeq)
    assert(same.toSeq == mat.orderBy("id").collect().map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      IncrementalView.refreshAdditive(mat, "id",
        Seq(("a", 1L)).toDF("id", "not_a_delta"))
    }
  }

  test("deltaJoin emits exactly the appended join rows: old+delta " +
    "joined minus old joined, including the delta-delta cross term") {
    import spark.implicits._
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val aDel = Seq((2, "a2b"), (3, "a3")).toDF("k", "av")
    val bOld = Seq((1, "b1"), (3, "b3")).toDF("k", "bv")
    val bDel = Seq((2, "b2"), (3, "b3b")).toDF("k", "bv")
    val got = IncrementalView
      .deltaJoin(aOld, aDel, bOld, bDel, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    // full(new) = {1a1b1, 2a2b2, 2a2bb2, 3a3b3, 3a3b3b};
    // old join = {1a1b1}; delta = the other four
    assert(got == Seq((2, "a2", "b2"), (2, "a2b", "b2"),
      (3, "a3", "b3"), (3, "a3", "b3b")), got.toString)
    // appended rows + old join == join of the unioned states (bag)
    val full = aOld.unionByName(aDel)
      .join(bOld.unionByName(bDel), Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val oldJ = aOld.join(bOld, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert((got ++ oldJ).sorted == full, "append identity broken")
  }
}
