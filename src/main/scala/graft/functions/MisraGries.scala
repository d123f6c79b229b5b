package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra-Gries heavy-hitter sketch as a typed, MERGEABLE Aggregator.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): a sketch of capacity `k` returns a
  * candidate set that is a SUPERSET of every item with true frequency
  * > n/(k+1). Counts are underestimates (off by at most n/(k+1)), so a
  * production pipeline runs a cheap exact second pass over only the
  * candidates — that two-pass shape is `xs4_heavy_hitters`.
  *
  * Scale: the sketch is O(k) memory per partial, merged associatively
  * on the map side like any partial aggregate — ONE reduce of k-sized
  * maps instead of a full groupBy over 100 TB of raw keys. The exact
  * second pass is a broadcast semi-join (candidate set is ≤ k rows).
  */
object MisraGries {

  /** capacity-bounded counter map with the MG decrement rule */
  class Agg(k: Int) extends Aggregator[String, mutable.Map[String, Long],
      Map[String, Long]] {
    require(k > 0, s"capacity must be positive, got $k")

    def zero: mutable.Map[String, Long] = mutable.Map.empty

    private def decrementAll(b: mutable.Map[String, Long], by: Long): Unit = {
      b.keys.toArray.foreach { key =>
        val v = b(key) - by
        if (v <= 0) b.remove(key) else b(key) = v
      }
    }

    def reduce(b: mutable.Map[String, Long], a: String):
        mutable.Map[String, Long] = {
      if (a != null) {
        if (b.contains(a)) b(a) += 1L
        else if (b.size < k) b(a) = 1L
        else decrementAll(b, 1L) // the MG step: charge 1 to all k+1 items
      }
      b
    }

    /** merge = add counts, then decrement all by the (k+1)-th largest
      * so at most k survive — preserves the n/(k+1) error bound. */
    def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]):
        mutable.Map[String, Long] = {
      b2.foreach { case (key, v) =>
        b1(key) = b1.getOrElse(key, 0L) + v
      }
      if (b1.size > k) {
        val kth = b1.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        decrementAll(b1, kth)
        // ties at the k-th value can leave > k survivors at count 0
        // handled by decrementAll's <= 0 eviction; re-check size
        while (b1.size > k) {
          val minKey = b1.minBy { case (key, v) => (v, key) }._1
          b1.remove(minKey)
        }
      }
      b1
    }

    def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column-API entry: misra_gries(key, k) → map<string,bigint> of at
    * most k candidate heavy hitters with underestimated counts. */
  def apply(key: Column, k: Int): Column = {
    val agg = org.apache.spark.sql.functions.udaf(new Agg(k),
      Encoders.STRING)
    agg(key.cast("string"))
  }
}
