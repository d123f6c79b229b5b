package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Jobcan-shaped API fixtures (FIXTURES.md §A; shapes from the
  * reference's writers, e.g. users.py:88-181, _requests.py:58-122).
  * The JSON lives in src/main/resources/fixtures — shared with the
  * `graft.tools.JobcanDemo` quickstart so tests and the runnable demo
  * can't drift. Edge cases covered: null element in user_groups,
  * missing bank account, out-of-order approval dates, file reuse with
  * default_attachment repetition, empty child arrays.
  */
object Fixtures {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def df(spark: SparkSession, schema: StructType, json: String*): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(json.toDS)
  }

  val user1: String = resource("user1.json")
  val user2: String = resource("user2.json")
  val requestSa10: String = resource("request_sa10.json")
  val requestSa11: String = resource("request_sa11.json")
  val group1: String = resource("group1.json")
  val company1: String = resource("company1.json")
  val position1: String = resource("position1.json")
  val project1: String = resource("project1.json")
  val form1: String = resource("form1.json")
  val fixJournal1: String = resource("fix_journal1.json")
  val fixJournal2: String = resource("fix_journal2.json")
  val fixJournal3: String = resource("fix_journal3.json")
}
