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
  def symmetrize(df: DataFrame, src: String, dst: String): DataFrame =
    df.select(explode(array(
        struct(col(src).cast("long").as("s"),
          col(dst).cast("long").as("d")),
        struct(col(dst).cast("long").as("s"),
          col(src).cast("long").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
}
