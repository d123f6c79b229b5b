package graft.docs

import graft.{Fixtures, SparkSpec}
import graft.model.JobcanSchemas
import graft.normalize.Normalize
import org.apache.spark.sql.functions._

/** The reference's only strong invariant (SURVEY §5):
  * `retrieve(update(x)) == x` — normalize a document to 30 tables,
  * reassemble, and compare against the original (timestamps
  * canonicalized to the API's "yyyy/MM/dd HH:mm:ss" format, which the
  * fixtures already use, so equality is exact).
  */
class ReassemblySpec extends SparkSpec {

  private lazy val original = Fixtures.df(spark,
    JobcanSchemas.requestDetailSchema, Fixtures.requestSa10,
    Fixtures.requestSa11)
  private lazy val tables = Normalize.requests(original)
  private lazy val rebuilt = Reassembly.reassemble(tables)

  test("root fields round-trip exactly") {
    val rootCols = JobcanSchemas.requestDetailSchema.fieldNames
      .filterNot(_ == "detail").toSeq
    val a = original.select(rootCols.map(col): _*).orderBy("id").collect()
    val b = rebuilt.select(rootCols.map(col): _*).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("customized_items round-trip: order, generic_master, 2-D table, " +
    "files") {
    def items(df: org.apache.spark.sql.DataFrame) = df.orderBy("id")
      .select(col("id"), to_json(col("detail.customized_items")).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(items(rebuilt) == items(original))
  }

  test("expense tree round-trips (specifics→rows→custom_items→value→" +
    "extensions)") {
    def j(df: org.apache.spark.sql.DataFrame) = df.orderBy("id")
      .select(col("id"), to_json(col("detail.expense")).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(j(rebuilt) == j(original))
  }

  test("approval_process round-trips (steps→approvers→comments, " +
    "after-completion block)") {
    def j(df: org.apache.spark.sql.DataFrame) = df.orderBy("id")
      .select(col("id"), to_json(col("detail.approval_process")).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(j(rebuilt) == j(original))
  }

  test("viewers + modify_logs round-trip; default attachments repeat " +
    "by counter (R1)") {
    def j(df: org.apache.spark.sql.DataFrame, f: String) = df.orderBy("id")
      .select(col("id"), to_json(col(s"detail.$f")).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(j(rebuilt, "viewers") == j(original, "viewers"))
    assert(j(rebuilt, "modify_logs") == j(original, "modify_logs"))
    assert(j(rebuilt, "default_attachment_files") ==
      j(original, "default_attachment_files"))
  }

  test("null sub-documents stay null (payment/ec absent in fixtures)") {
    val r = rebuilt.orderBy("id")
      .select(col("detail.payment").isNull.as("p"),
        col("detail.ec").isNull.as("e")).collect()
    assert(r.forall(row => row.getBoolean(0) && row.getBoolean(1)))
  }

  test("toJsonDocs emits one parseable document per request") {
    val docs = Reassembly.toJsonDocs(tables)
    assert(docs.count() == 2)
    val reparsed = docs.select(
      from_json(col("doc"), JobcanSchemas.requestDetailSchema).as("d"))
      .select(col("d.id"), col("d.total_amount"))
      .orderBy("id").collect()
    assert(reparsed.map(_.getString(0)).toSeq == Seq("sa-10", "sa-11"))
    assert(reparsed.map(_.getLong(1)).toSeq == Seq(3200L, 2400L))
  }
}
