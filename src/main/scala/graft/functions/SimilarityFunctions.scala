package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity / sketching primitives for near-duplicate detection and
  * ANN search at corpus scale: MinHash signatures + LSH banding,
  * SimHash, and double-precision cosine over `array<float>` embedding
  * columns. All pure `Column` algebra (higher-order functions) —
  * distributed, codegen-friendly, no driver involvement.
  */
object SimilarityFunctions {

  /** k-element MinHash signature of a (distinct) shingle array.
    * minhash[i] = min over shingles of xxhash64(seed_i, shingle).
    * Deterministic across runs/executors (xxhash64 is seeded, not
    * random). Empty shingle set → null signature.
    */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    // native fused-loop expression (graft.expressions.MinHashSig):
    // bit-identical to minhashSignatureHof below, but one codegen
    // loop — no per-shingle k-array allocation, and a compact
    // expression tree that plans/compiles in milliseconds
    graft.expressions.MinHashSig(shingleArr, k)

  /** The higher-order-function formulation MinHashSig replaces — kept
    * as the executable semantics reference (SimilaritySpec asserts the
    * two produce identical signatures). */
  def minhashSignatureHof(shingleArr: Column, k: Int): Column =
    // single pass over the shingles with a k-slot min accumulator
    // (the per-seed `array_min(transform(...))` form materializes k
    // intermediate hash arrays per row — same trap as simhash64)
    when(size(shingleArr) <= 0, lit(null)).otherwise(
      aggregate(
        shingleArr,
        array_repeat(lit(Long.MaxValue), k),
        (acc, s) => zip_with(acc,
          sequence(lit(0), lit(k - 1)),
          (a, seed) => least(a, xxhash64(seed, s)))))

  /** LSH bands over a MinHash signature: array of `b` structs
    * (band_id, band_hash) where band_hash fingerprints `r` consecutive
    * signature entries. Docs sharing any (band_id, band_hash) are
    * candidate pairs — the explode+groupBy of these structs IS the
    * scalable near-dup join (no O(n²) cross product).
    */
  def lshBands(signature: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      i => struct(
        i.as("band_id"),
        xxhash64(concat_ws(",",
          transform(slice(signature, i * r + 1, lit(r)),
            x => x.cast("string"))))
          .as("band_hash")))

  /** 64-bit SimHash of a shingle array: bit j of the result is 1 iff
    * the sum over shingles of ±1 (sign of bit j of xxhash64(shingle))
    * is positive. Near-identical docs differ in few bits → hamming
    * radius search via `bit_count(a ^ b)`.
    */
  def simhash64(shingleArr: Column): Column =
    simhashBits(shingleArr, 64, xxhash64(_))

  /** The first 15 hex chars of md5 as a 60-bit non-negative long —
    * an "engine-portable" hash: any SQL engine with md5() reproduces
    * it exactly (the DuckDB oracle does), unlike xxhash64. Use it when
    * a sketch must be independently recomputable; use xxhash64 when
    * only Spark needs to agree with itself (it is ~5× cheaper).
    */
  def md5hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** SimHash over an arbitrary bit width / hash function (simhash64 is
    * `simhashBits(_, 64, xxhash64)`; the oracle-portable variant is
    * `simhashBits(_, 60, md5hash60)`).
    */
  def simhashBits(shingleArr: Column, bits: Int,
      hashFn: Column => Column): Column = {
    require(bits >= 2 && bits <= 64, s"bits must be 2..64, got $bits")
    // Single pass over the shingles with a bits-slot balance
    // accumulator. (The obvious formulation — for each bit, aggregate
    // over shingles — re-evaluates the whole hash array per bit: 64×
    // the work, measured 473 s vs ~7 s on 200 docs at sf0.1.) hashFn
    // runs once per shingle via the outer transform; the Scala
    // `shiftleft`/`shiftrightunsigned` wrappers only take Int bit
    // counts, so call_function passes the lambda-bound bit index.
    val bitIdx = sequence(lit(0), lit(bits - 1))
    val balances = aggregate(
      transform(shingleArr, hashFn),
      array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, bitIdx, (a, j) =>
        a + when(
          call_function("shiftrightunsigned", h, j)
            .bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(balances, bitIdx, (b, j) =>
        call_function("shiftleft",
          when(b > 0, lit(1L)).otherwise(lit(0L)), j)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Double-precision dot product of two float-array embeddings.
    * Elements are cast to double BEFORE multiplying so accumulation
    * matches engines that compute in double (and avoids float
    * rounding differences).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array embedding, in double. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two embeddings: the native codegen'd
    * expression (one fused loop inside whole-stage codegen). Identical
    * numerics to [[cosineHof]] — index-order double accumulation.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.CosineSimilarity(a, b)

  /** Jaro–Winkler similarity (native codegen'd expression), parameter
    * choices bit-replayable in DuckDB's `jaro_winkler_similarity` —
    * see [[graft.expressions.JaroWinkler]].
    */
  def jaroWinkler(a: Column, b: Column): Column =
    graft.expressions.JaroWinkler(a, b)

  /** Higher-order-function cosine (built-ins only): the reference
    * formulation the native expression is checked against; kept for
    * engines/sessions where custom expressions can't be deployed.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic random-hyperplane LSH bucket for an embedding:
    * `p` pseudo-hyperplanes whose component d of plane i is derived
    * from xxhash64(i, d) (uniform in [-0.5, 0.5)); bit i of the bucket
    * id is the sign of the projection. No RNG — reproducible across
    * runs, which real pipelines need for incremental indexing.
    */
  def hyperplaneBucket(embedding: Column, planes: Int): Column = {
    // shiftleft wraps its shift amount mod 64, so plane 64 would OR
    // its sign bit into plane 0's bit and buckets would silently
    // alias (arithmeticHyperplaneBucket/simhashBlocks guard the same)
    require(planes >= 1 && planes <= 64,
      s"planes must be in [1, 64], got $planes")
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, i) => {
        val proj = aggregate(
          zip_with(embedding, sequence(lit(0), size(embedding) - 1),
            (x, d) => x.cast("double") *
              ((pmod(xxhash64(i, d), lit(1000L)).cast("double") / 1000.0) - 0.5)),
          lit(0.0), (a, v) => a + v)
        acc.bitwiseOR(call_function("shiftleft",
          when(proj > 0, lit(1L)).otherwise(lit(0L)), i))
      })
  }

  /** Arithmetic-hyperplane LSH bucket: like [[hyperplaneBucket]] but
    * the component d of plane p is `((d*(p+1)+p) mod 5) - 2` ∈
    * {-2..2} — a fixed arithmetic pattern instead of a hash, so ANY
    * engine (including a plain-SQL oracle) can reproduce the bucket
    * ids and independently verify the whole bucketed-ANN pipeline end
    * to end. Modulus 5 (not 3): plane p's weight pattern is the
    * residue class of its multiplier `(p+1) mod 5`, so planes 0..3
    * get four genuinely DISTINCT patterns (a mod-3 scheme repeats
    * with period 3 — planes 0 and 3 would be identical, capping the
    * partition at 8 buckets no matter how many planes are asked for).
    * Still a valid sign-of-projection partition for cosine search;
    * [[hyperplaneBucket]] remains the production choice when isotropy
    * matters more than cross-engine checkability. Bit p of the bucket
    * is the projection sign; both engines fold the products in index
    * order, and the minimum |projection| on the test corpora is
    * ~2.5e-4 — nine orders above double rounding — so the sign agrees.
    */
  def arithmeticHyperplaneBucket(embedding: Column, planes: Int): Column = {
    require(planes >= 1 && planes <= 4,
      s"$planes planes: multipliers (p+1) mod 5 are distinct only for" +
        " p in 0..3 — beyond that, planes repeat (use hyperplaneBucket)")
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(embedding, sequence(lit(0), size(embedding) - 1),
            (x, d) => x.cast("double") *
              (pmod(d * (p + 1) + p, lit(5)) - 2).cast("double")),
          lit(0.0), (a, v) => a + v)
        acc.bitwiseOR(call_function("shiftleft",
          when(proj > 0, lit(1L)).otherwise(lit(0L)), p))
      })
  }

  /** SimHash block keys for complete hamming-radius search (Manku et
    * al., WWW'07 §3): split the 64-bit signature into `nBlocks` equal
    * blocks and emit one (block_id, block_value) struct per block. Two
    * signatures within hamming distance `nBlocks - 1` MUST agree on at
    * least one block (pigeonhole), so a join on the exploded keys is a
    * complete candidate generator for that radius — unlike bucketing
    * by one fixed byte, which silently drops pairs that differ there.
    */
  def simhashBlocks(sig: Column, nBlocks: Int, bits: Int = 64): Column = {
    // nBlocks == 1 would make w = 64 and (1L << 64) wrap to 1 on the
    // JVM (shifts are mod 64) — mask 0, every block_val 0, and the
    // candidate join degenerates to a cross product; nBlocks > bits
    // (e.g. bits = 0) makes w = 0 with the same degenerate mask
    require(bits % nBlocks == 0 && nBlocks > 1 && nBlocks <= bits &&
      bits <= 64,
      s"need 2..$bits blocks dividing $bits, got $nBlocks")
    val w = bits / nBlocks
    transform(sequence(lit(0), lit(nBlocks - 1)),
      k => struct(
        k.as("block_id"),
        call_function("shiftrightunsigned", sig, k * w)
          .bitwiseAND(lit((1L << w) - 1)).as("block_val")))
  }
}
