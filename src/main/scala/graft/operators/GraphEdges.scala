package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-list plumbing shared by the graph operators. */
object GraphEdges {

  /** Both orientations of an edge list from ONE evaluation of `df`.
    *
    * The tempting `df.union(df.select(dst, src))` evaluates the
    * upstream pipeline TWICE — two parquet scans when `df` is a
    * projection (xg1/xg3/xg7's lineitem edges), or the entire
    * LSH-verify pipeline twice when it's a computed pair list
    * (dd11's closure edges, measured ~20 s of pure waste at 1M
    * docs). One explode emits the same rows from a single pass; the
    * downstream distinct/shuffle volume is identical either way.
    * Output columns: (src, dst).
    */
  def symmetrize(df: DataFrame, src: String, dst: String): DataFrame = {
    // the long cast only exists to give the two explode structs one
    // type; it must stay LOSSLESS — a silent cast of string ids would
    // turn the whole edge list into (NULL, NULL) rows and every graph
    // consumer would "succeed" on an empty graph
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    for (c <- Seq(src, dst)) {
      val t = df.schema(c).dataType
      require(integral.contains(t),
        s"edge column $c must be an integral id type, got " +
          t.simpleString)
    }
    df.select(explode(array(
        struct(col(src).cast("long").as("s"),
          col(dst).cast("long").as("d")),
        struct(col(dst).cast("long").as("s"),
          col(src).cast("long").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
  }
}
