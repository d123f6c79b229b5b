package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002): keep
  * the k smallest DISTINCT hash values seen per group. A typed
  * Aggregator so partial aggregation bounds state at O(k) per group
  * per partition and merges map-side — the shape that turns a 100 TB
  * per-group DISTINCT (full shuffle of every distinct value) into a
  * shuffle of fixed 64-element arrays.
  *
  * Unlike HLL (xs6), KMV sketches support SET OPERATIONS: the k
  * smallest of a union is computable from the two sketches alone, and
  * the intersection estimate falls out of the union sketch's overlap
  * ratio — which is why dataset-overlap audits (train/eval contamination
  * at corpus scale) ship KMV next to HLL. Estimator: with hashes
  * uniform in [0, 2^60), distinct ≈ (k-1) · 2^60 / h_(k), exact when
  * the group has fewer than k distinct hashes (the sketch IS the set).
  *
  * The buffer stays sorted ascending; inserts binary-search, reject
  * duplicates, and drop the max once size k is reached — so reduce is
  * O(log k) compare + O(k) shift worst-case, and merge is bounded by
  * 2k inserts regardless of group cardinality.
  */
object MinKSketch {

  class Agg(k: Int) extends Aggregator[Long, ArrayBuffer[Long], Array[Long]] {
    // fail at construction, not with a NoSuchElementException on
    // b.last deep inside an executor task (MisraGries/MinHashSig
    // validate the same way)
    require(k > 0, s"k must be positive, got $k")
    def zero: ArrayBuffer[Long] = ArrayBuffer.empty

    private def insert(b: ArrayBuffer[Long], v: Long): ArrayBuffer[Long] = {
      if (b.size >= k && v >= b.last) return b
      // binary search for insertion point; equal hit = duplicate, drop
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compare(b(mid), v)
        if (c == 0) return b
        else if (c < 0) lo = mid + 1
        else hi = mid
      }
      b.insert(lo, v)
      if (b.size > k) b.remove(b.size - 1)
      b
    }

    def reduce(b: ArrayBuffer[Long], a: Long): ArrayBuffer[Long] =
      insert(b, a)
    def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      var i = 0
      while (i < b2.size) { insert(b1, b2(i)); i += 1 }
      b1
    }
    def finish(b: ArrayBuffer[Long]): Array[Long] = b.toArray
    def bufferEncoder: Encoder[ArrayBuffer[Long]] =
      Encoders.kryo[ArrayBuffer[Long]]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column-API entry: min_k_sketch(hash) → sorted array<long> of the
    * k smallest distinct hashes. */
  def apply(hash: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new Agg(k), Encoders.scalaLong)(hash)
}
