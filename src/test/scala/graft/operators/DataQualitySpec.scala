package graft.operators

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("every check counts its planted violations exactly; the " +
    "clean frame gates at zero") {
    val dirty = Seq(
      (1L, Some(10L), "O", 5.0),
      (1L, Some(11L), "F", -2.0),   // dup key, negative value
      (2L, None, "X", 2000.0),      // null FK-ish col, bad status, high
      (3L, Some(99L), "P", 7.0))
      .toDF("id", "ref", "status", "v")
    val parents = Seq(10L, 11L).toDF("pid")
    val out = DataQuality.suite(Seq(
      DataQuality.uniqueKey(dirty, Seq("id"), "pk"),
      DataQuality.fkOrphans(dirty, "ref", parents, "pid", "fk"),
      DataQuality.nonNull(dirty, "ref", "nn"),
      DataQuality.inRange(dirty, "v",
        org.apache.spark.sql.functions.lit(0.0),
        org.apache.spark.sql.functions.lit(1000.0), "rng"),
      DataQuality.inSet(dirty, "status", Seq("O", "F", "P"), "dom")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("pk") == (4L, 1L))     // id=1 twice -> 1 excess row
    assert(out("fk") == (3L, 1L))     // null ref excluded; 99 orphan
    assert(out("nn") == (4L, 1L))
    assert(out("rng") == (4L, 2L))    // -2.0 and 2000.0
    assert(out("dom") == (4L, 1L))    // "X"
    assert(out.values.map(_._2).sum == 6L)
    // clean frame: all zeros -> the publish gate passes
    val clean = Seq((1L, Some(10L), "O", 1.0), (2L, Some(11L), "F", 2.0))
      .toDF("id", "ref", "status", "v")
    val zeros = DataQuality.suite(Seq(
      DataQuality.uniqueKey(clean, Seq("id"), "pk"),
      DataQuality.fkOrphans(clean, "ref", parents, "pid", "fk"),
      DataQuality.nonNull(clean, "ref", "nn")))
      .collect().map(_.getLong(2))
    assert(zeros.forall(_ == 0L))
  }
}
