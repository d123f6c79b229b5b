package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle enumeration with degree-ordered orientation (Schank &
  * Wagner 2005; the MapReduce form is Suri & Vassilvitskii, WWW'11).
  *
  * Every undirected edge is directed from its (degree, id)-smaller
  * endpoint to the larger; each triangle then has exactly ONE apex
  * with two out-edges, so it is enumerated exactly once, and wedge
  * generation is bounded by Σ outdeg² = O(m^1.5) — a hub node is
  * ordered LAST in the total order, so it collects in-edges instead
  * of fanning out O(deg²) wedges. The id-ordered naive join has the
  * same output but explodes on skew; orientation is the 100 TB shape.
  *
  * All stages are equi-joins on node / pair keys; nothing is
  * collected to the driver. Intermediates ride [[ManagedCache]] and
  * are released by the caller's per-query lifecycle.
  */
object Triangles {

  /** `edges`: distinct undirected edges as (u, v) with u < v, node
    * ids < 1e9 (the order key packs degree·1e9 + id into one bigint).
    * Returns one row (x, y, z) per triangle, where x is the
    * orientation apex and ord(y) < ord(z).
    */
  def enumerate(edges: DataFrame): DataFrame = {
    val e0 = ManagedCache.persist(edges.select(col("u"), col("v")))
    val deg = e0.select(col("u").as("n"))
      .union(e0.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    def ord(d: Column, n: Column): Column = d * 1000000000L + n
    val withDeg = e0
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = ord(col("du"), col("u")) < ord(col("dv"), col("v"))
    val o = ManagedCache.persist(withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, ord(col("dv"), col("v")))
        .otherwise(ord(col("du"), col("u"))).as("dst_ord")))
    // wedges from each apex, the (y, z) pair canonicalized by the SAME
    // total order — so a closing edge, if present, is oriented y→z.
    // The wedge frame is the volume driver (Σ outdeg² rows), so it
    // carries only (apex, packed-pair-key): one bigint join key keeps
    // the shuffle as narrow as the algorithm allows.
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.src") === col("e2.src") &&
          col("e1.dst_ord") < col("e2.dst_ord"))
      .select(col("e1.src").as("x"),
        (col("e1.dst") * 1000000000L + col("e2.dst")).as("pk"))
    val closing = o.select(
      (col("src") * 1000000000L + col("dst")).as("pk"))
    wedges.join(closing, Seq("pk"))
      .select(col("x"),
        call_function("div", col("pk"), lit(1000000000L)).as("y"),
        pmod(col("pk"), lit(1000000000L)).as("z"))
  }
}
