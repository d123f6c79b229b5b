package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}
import graft.operators.ManagedCache

/** Large-scale training-data pipeline operators (beyond the reference's
  * surface, first-class per the build contract): deduplication,
  * similarity search, text analysis, multimodal plumbing — over the
  * `documents` / `embeddings` testdata tables.
  *
  * Scale design notes:
  *  - pair-emitting dedup queries avoid O(n²): candidates come from
  *    postings joins (shared shingle / shared LSH band / shared
  *    bucket), which shuffle on the shingle/band key and scale with
  *    corpus size × near-dup density, not corpus².
  *  - Queries that DO brute-force (the oracle-checkable exact ones)
  *    bound their input (doc_id < 200 / vec_id < 300) explicitly.
  *  - Everything is deterministic: hash-seeded sketches, no RNG.
  */
object TrainingData {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Shared normalized-token shingle postings (doc_id, shingle). */
  private def postings(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(TF.wordShingles(col("text"), n)).as("sh"))

  /** TF-IDF top-3 terms per doc, shared by tx9 (bounded row dump) and
    * tx11 (full-corpus aggregate). The idf factor is the RATIONAL
    * n_docs/df (not ln) so the ranking key is an exact IEEE quotient
    * both engines compute bit-identically — log-scaled idf only
    * reorders monotonically, and transcendental libm differences would
    * make the oracle flaky. df is a distinct postings agg; n_docs a
    * 1-row broadcast. Emits (doc_id, rank, term, tf, df, score).
    */
  private def tfidfTop3(d: DataFrame): DataFrame = {
    // three independent aggregations (tf, df, n_docs) read this frame;
    // without the tracked persist the tokenize+explode of every
    // document — the dominant cost at full corpus — would run 3×
    val terms = ManagedCache.persist(d.select(col("doc_id"),
      explode(TF.tokens(lower(col("text")))).as("term")))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // count docs from `terms` (not `d`) so a null-text doc can't
    // skew n_docs on one side only
    val total = terms.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf") * (col("n_docs").cast("double") / col("df")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  /** The FULL-corpus minhash near-dup pipeline shared by dd10/dd11:
    * 2-shingles → 16-slot minhash → 8×2 LSH band join for candidates →
    * exact-Jaccard verification at the 0.3 threshold. Returns
    * (pairs (doc_a, doc_b, j), over-cap bucket accounting). The band
    * join rides [[graft.operators.HotBuckets]] with a 1000-doc bucket
    * cap: a pathological bucket can't quadratically explode one task
    * at scale, and excluded buckets are SURFACED (dd10 pins the
    * accounting to zero against the exact oracle at test SFs — if the
    * cap ever bites, both the dropped-pair checksums AND the nonzero
    * accounting fail the compare, no silent truncation). The shingle
    * table feeds the band join and both verification joins, so it
    * rides a tracked persist (at scale: materialize the sketch table
    * once); Bench/Verify release it after each query's action.
    */
  private def lshVerifiedPairsWithStats(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    // fanOut: the shingle+minhash sketch pass must not run at
    // one-file scan width (measured 2.0-2.6 s single-task stages in
    // dd10/dd11 at sf0.1/local[32]); no-op at scale
    val docs = ManagedCache.persist(
      graft.operators.Parallelism.fanOut(t(s, dir, "documents"))
        .select(col("doc_id"), TF.wordShingles(col("text"), 2).as("sh"))
        .filter(size(col("sh")) > 0))
    // the banded frame is scanned THREE times (bucket sizes, join
    // side a, join side b) and the 16-slot minhash above it is the
    // expensive part — persist the (doc_id, band) result, not the
    // recompute; it is 8 small rows per doc
    val banded = ManagedCache.persist(docs.select(col("doc_id"),
      explode(SF.lshBands(SF.minhashSignature(col("sh"), 16), 8, 2))
        .as("band")))
    val (cand0, overCap) = graft.operators.HotBuckets
      .cappedCandidates(banded, "doc_id", "band", cap = 1000)
    val cand = cand0
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    // Exact verification, hot-bucket-proof: common shingles make a few
    // LSH buckets huge (measured: 150+ docs -> 100k+ candidates of
    // which a few hundred are real), so per-candidate array work is
    // the cost that matters. The j >= 0.3 test is rewritten in pure
    // integer arithmetic with the CHEAP conjuncts first —
    //   size band:  10*min(na,nb) >= 3*max(na,nb)   (j <= min/max)
    //   exact:      13*ni >= 3*(na+nb)              (<=> ni/(na+nb-ni) >= 0.3)
    // so array_intersect runs only on size-band survivors, array_union
    // is never built (shingles are distinct, so union = na+nb-ni), and
    // the double j is computed only for emitted pairs. Identical pair
    // set and j values as the naive form (integer test is exact; the
    // oracle keeps the double filter).
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      size(col("sh")).as("n_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      size(col("sh")).as("n_b"))
    val ni = size(array_intersect(col("sh_a"), col("sh_b")))
    val pairs = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .filter(lit(10) * least(col("n_a"), col("n_b")) >=
          lit(3) * greatest(col("n_a"), col("n_b")) &&
        lit(13) * ni >= lit(3) * (col("n_a") + col("n_b")))
      .select(col("doc_a"), col("doc_b"),
        (ni.cast("double") / (col("n_a") + col("n_b") - ni))
          .as("j"))
    (pairs, overCap)
  }

  private def lshVerifiedPairs(s: SparkSession, dir: String): DataFrame =
    lshVerifiedPairsWithStats(s, dir)._1

  val queries: Map[String, Q] = Map(
    // ---- text analysis -------------------------------------------------
    // Language ID via stopword-marker ratios (n-gram heuristic family).
    "tx1_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TF.langId(col("text")).as("predicted_lang"))
        .orderBy(col("doc_id"))
    }),

    // Composite quality score (length / punctuation / stopword ratios).
    "tx2_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens + BPE-ish chars/4 estimate.
    "tx3_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.tokenCount(col("text")).as("n_tokens"),
          TF.tokenEstimate(col("text")).as("n_tokens_bpe_est"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint of normalized text (md5 128-bit; the
    // xxhash64 variant backs 64-bit joins at scale).
    "tx4_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Character-trigram frequency profile per labeled language — the
    // n-gram machinery actual language-ID models train on: top-5 most
    // frequent char 3-grams per lang (rank ties broken by gram).
    "tx5_ngram_profile" -> ((s, dir) => {
      // profile a bounded deterministic sample — a frequency profile
      // from 5k docs is statistically equivalent and keeps the explode
      // bounded at any SF (full-corpus: drop the filter, the plan is
      // identical)
      // fanOut: the trigram explode otherwise runs in the single
      // scan task (measured 2.1 s at sf0.1/local[32]); no-op at scale
      val d = graft.operators.Parallelism.fanOut(
        t(s, dir, "documents").filter(col("doc_id") < 5000))
      val grams = d.select(col("lang"),
        explode(TF.shingles(col("text"), 3)).as("gram"))
      val counts = grams.groupBy(col("lang"), col("gram"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("gram"))
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("rank"), col("gram"), col("n"))
        .orderBy(col("lang"), col("rank"))
    }),

    // ---- deduplication -------------------------------------------------
    // Exact dedup: hash-groupBy, keep lowest doc_id per content hash.
    "dd1_exact_dedup" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper_doc_id"),
          count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_doc_id"))
    }),

    // MinHash + LSH near-dup: shingle → minhash(k=16) → band(b=8,r=2)
    // → band-bucket join → exact-Jaccard verification of candidates.
    // The band join is the scale path: no cross product, shuffle keyed
    // by (band_id, band_hash). Oracle: because candidates are
    // verified with EXACT Jaccard at the same threshold, the output
    // equals the exact all-pairs answer whenever LSH recall is 1 —
    // which the driver now checks end-to-end against a postings-join
    // SQL oracle (recall is empirically 1.0 at every test SF; any
    // future LSH miss fails the hash compare, which is the point).
    "dd2_minhash_lsh" -> ((s, dir) => {
      // the shingle table feeds the band join AND both verification
      // joins — persist it tracked + disk-spillable (at scale: write
      // the sketch table once); Bench/Verify release after the action
      val docs = ManagedCache.persist(
        t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), TF.wordShingles(col("text"), 2).as("sh"))
          .filter(size(col("sh")) > 0))
      val banded = docs.select(col("doc_id"),
        explode(SF.lshBands(SF.minhashSignature(col("sh"), 16), 8, 2))
          .as("band"))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val withSh = cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          Seq("doc_b"))
      withSh.select(col("doc_a"), col("doc_b"),
          round(size(array_intersect(col("sh_a"), col("sh_b")))
            .cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Exact n-gram Jaccard via shingle-postings join (the
    // oracle-checkable exact twin of dd2): candidates = docs sharing
    // ≥1 shingle — a postings self-join, not a cross product.
    "dd3_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      val p = postings(docs, 3)
      val counts = p.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = p.as("a").join(p.as("b"),
          col("a.sh") === col("b.sh") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("ni"))
      inter
        .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(col("ni").cast("double") /
            (col("na") + col("nb") - col("ni")).cast("double"), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= 0.15)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // LSH tuning evaluation — the dedup sibling of ann7's recall
    // harness: precision/recall of MinHash band-bucket CANDIDATE
    // GENERATION against the exact set-Jaccard ≥ 0.3 truth, on the
    // ENGINE-PORTABLE md5-60 minhash (k=12, b=6, r=2) so the DuckDB
    // oracle replays the LSH internals themselves — dd2/dd10's
    // oracles can only assert the post-verification answer (they
    // lean on recall = 1); this one audits the banding. Candidates
    // come from the band-bucket equi-join (never all-pairs); truth
    // from the shingle-postings join; both census-sized after the
    // bounded-subset scan. Production dedup keeps the ~5× cheaper
    // xxhash64 path (dd2) — this harness is how its (b, r) gets
    // chosen.
    "dd19_lsh_eval" -> ((s, dir) => {
      val k = 12; val r = 2
      val docs = ManagedCache.persist(
        t(s, dir, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id"),
            array_distinct(TF.wordShingles(col("text"), 2)).as("sh"))
          .filter(size(col("sh")) > 0))
      val sig = docs.select(col("doc_id"),
        aggregate(col("sh"), array_repeat(lit(Long.MaxValue), k),
          (acc, sh0) => zip_with(acc, sequence(lit(0), lit(k - 1)),
            (a, i) => least(a, SF.md5hash60(concat(lit("mh:"),
              i.cast("string"), lit(":"), sh0))))).as("sig"))
      val bands = sig.select(col("doc_id"),
          explode(transform(sequence(lit(0), lit(k / r - 1)),
            j => struct(j.as("band"),
              concat_ws(",", transform(slice(col("sig"), j * r + 1,
                lit(r)), x => x.cast("string"))).as("key")))).as("b"))
        .select(col("doc_id"), col("b.band").as("band"),
          col("b.key").as("key"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      val p = docs.select(col("doc_id"), explode(col("sh")).as("s0"))
      val counts = p.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val truth = p.as("a").join(p.as("b"),
          col("a.s0") === col("b.s0") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ni"))
        .join(counts.select(col("doc_id").as("da"), col("n").as("na")),
          Seq("da"))
        .join(counts.select(col("doc_id").as("db"), col("n").as("nb")),
          Seq("db"))
        .filter(round(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"), 6) >= 0.3)
        .select(col("da"), col("db"))
      val hits = cand.join(truth, Seq("da", "db"), "left_semi")
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
        .select(col("n_truth"), col("n_candidates"), col("n_hits"),
          call_function("div", col("n_hits") * lit(1000L),
            nullif(col("n_candidates"), lit(0L))).as("precision_mille"),
          call_function("div", col("n_hits") * lit(1000L),
            nullif(col("n_truth"), lit(0L))).as("recall_mille"))
    }),

    // SimHash near-dup: 60-bit engine-portable sketch (md5hash60 —
    // any engine with md5() recomputes it bit-for-bit, so the DuckDB
    // oracle replays the WHOLE pipeline: shingle → hash → bit-vote →
    // pairwise hamming), 10-block candidate join (Manku et al. —
    // pigeonhole-complete for hamming ≤ 9, so every radius-7 pair
    // must share a block and the output is EXACTLY "all pairs with
    // hamming ≤ 7", independent of the blocking). The production
    // xxhash64/64-bit variant stays under dd7's recall check.
    "dd4_simhash" -> ((s, dir) => {
      // a <2-token doc has no shingles and would sketch to sig = 0
      // (pairing all such docs at hamming 0) while the oracle's `sigs`
      // CTE drops it — exclude shingle-less docs so both engines
      // define the same doc set (dd5 already guards the same way)
      val docs = ManagedCache.persist(
        t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), TF.wordShingles(col("text"), 2).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("doc_id"),
            SF.simhashBits(col("sh"), 60, SF.md5hash60).as("sig")))
        // sketch computed once, exploded to 10 block keys — persist
        // tracked (the 16-byte-per-doc sketch table is exactly what
        // you'd materialize at 100 TB)
      val blocked = docs.select(col("doc_id"), col("sig"),
        explode(SF.simhashBlocks(col("sig"), 10, 60)).as("blk"))
      blocked.as("a").join(blocked.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          SF.hamming64(col("a.sig"), col("b.sig")).cast("long")
            .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 7)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Unbounded scale twin of dd4: the simhash block join over the
    // FULL corpus, reduced to (pair count, key checksum, hamming sum).
    // The oracle replays the whole portable md5-60 pipeline on the
    // full corpus with exact pairwise hamming — the Manku 10-block
    // join is pigeonhole-complete at radius 7, so the Spark side must
    // reproduce the exact pair set or the checksums shift.
    "dd12_simhash_full" -> ((s, dir) => {
      // blocked is scanned three times (bucket sizes + both join
      // sides); persist the exploded result, not the md5-simhash
      // recompute. The block join carries the 8-byte sig through the
      // shuffle so verification is in-join — HotBuckets.filterOverCap
      // (not cappedCandidates) keeps that shape while still bounding
      // a pathological block bucket; the accounting is oracle-pinned
      // to zero like dd10's (the oracle is the exact brute twin — a
      // biting cap fails the compare twice).
      // fanOut: the md5-simhash sketch otherwise runs in the single
      // scan task (measured 6.1 s at sf0.1/local[32]); no-op at scale
      val docs = graft.operators.Parallelism
        .fanOut(t(s, dir, "documents"))
        .select(col("doc_id"), TF.wordShingles(col("text"), 2).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          SF.simhashBits(col("sh"), 60, SF.md5hash60).as("sig"))
      val blocked = ManagedCache.persist(
        docs.select(col("doc_id"), col("sig"),
          explode(SF.simhashBlocks(col("sig"), 10, 60)).as("blk")))
      val (safe, overCap) = graft.operators.HotBuckets
        .filterOverCap(blocked, "blk", cap = 1000)
      val agg = safe.as("a").join(safe.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          SF.hamming64(col("a.sig"), col("b.sig")).cast("long")
            .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 7)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("doc_a") * lit(1000003L) + col("doc_b")).as("key_sum"),
          sum(col("hamming")).as("hamming_sum"))
      val hotAgg = overCap.agg(
        count(lit(1)).as("n_hot_buckets"),
        coalesce(sum(col("bucket_n")), lit(0L)).as("hot_docs"))
      agg.crossJoin(hotAgg) // two 1-row frames
    }),

    // Unbounded scale twin of dd2: the SAME minhash band-join near-dup
    // pipeline over the FULL corpus (no doc_id bound), reduced to a
    // deterministic one-row aggregate — pair count, key checksum,
    // integer-micros jaccard sum — so the oracle (exact postings join
    // over the full corpus) hash-compares without materializing the
    // pair list. dd2 verifies the band join's CORRECTNESS on a bounded
    // subset; this entry MEASURES its scale shape at full SF in Bench
    // instead of arguing it. Equals the exact twin iff LSH recall is 1
    // (any miss shifts all three aggregates — the point of the check).
    "dd10_minhash_full" -> ((s, dir) => {
      val (pairs, overCap) = lshVerifiedPairsWithStats(s, dir)
      val agg = pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(col("doc_a") * lit(1000003L) + col("doc_b")).as("key_sum"),
        sum(round(col("j") * lit(1e6)).cast("long"))
          .as("jaccard_micros_sum"))
      // hot-bucket accounting rides the output: the oracle (which is
      // EXACT all-pairs) pins both to zero, so a cap that ever bites
      // at this SF fails the compare twice over — once in the missing
      // pairs' checksums, once here. No silent truncation.
      val hotAgg = overCap.agg(
        count(lit(1)).as("n_hot_buckets"),
        coalesce(sum(col("bucket_n")), lit(0L)).as("hot_docs"))
      agg.crossJoin(hotAgg) // two 1-row frames
    }),

    // dd10's over-cap path under LIVE fire: the same LSH dedup shape
    // with a cap LOW enough (4) that real buckets exceed it at every
    // test SF (5 at sf0.001, 953 at sf0.1) — the oracle replays the
    // portable banding itself (dd19's md5 minhash), the capped join,
    // AND the nonzero hot-bucket accounting bit-for-bit, so the
    // exclusion branch is pinned by data, not by a zero. Over-cap
    // buckets are not dropped: they route through
    // HotBuckets.routeOverCapStar — members sub-grouped by FULL
    // signature, min-id representative star edges, linear where the
    // capped-out self-join was quadratic — and routed pairs the
    // capped join missed are verified and accounted separately
    // (n_pairs_routed / routed_key_sum).
    "dd20_minhash_capped" -> ((s, dir) => {
      val k = 8; val r = 2
      // fanOut: the shingle pass + 8-slot md5 minhash below run at
      // scan width otherwise (measured 4.1 s single-task stages)
      val docs = ManagedCache.persist(
        graft.operators.Parallelism.fanOut(t(s, dir, "documents"))
          .select(col("doc_id"),
            array_distinct(TF.wordShingles(col("text"), 2)).as("sh"))
          .filter(size(col("sh")) > 0))
      val sig = docs.select(col("doc_id"),
        aggregate(col("sh"), array_repeat(lit(Long.MaxValue), k),
          (acc, sh0) => zip_with(acc, sequence(lit(0), lit(k - 1)),
            (a, i) => least(a, SF.md5hash60(concat(lit("mh:"),
              i.cast("string"), lit(":"), sh0))))).as("sig"))
      val banded = ManagedCache.persist(sig.select(col("doc_id"),
        concat_ws(",", transform(col("sig"), x => x.cast("string")))
          .as("sig_key"),
        explode(transform(sequence(lit(0), lit(k / r - 1)),
          j => concat_ws(":", j.cast("string"),
            concat_ws(",", transform(slice(col("sig"), j * r + 1,
              lit(r)), x => x.cast("string")))))).as("bucket")))
      val (cand0, overCap) = graft.operators.HotBuckets
        .cappedCandidates(banded, "doc_id", "bucket", cap = 4)
      val routed0 = graft.operators.HotBuckets
        .routeOverCapStar(banded, "doc_id", "bucket", "sig_key", overCap)
      val cand = cand0
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val routedCand = routed0
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        .join(cand, Seq("doc_a", "doc_b"), "left_anti")
      // exact-jaccard verification (dd10's integer-exact rewrite; the
      // size-band preconjunct is implied by the exact test, and these
      // candidate sets are already bucket-bounded)
      def verified(c: DataFrame): DataFrame = {
        val a = docs.select(col("doc_id").as("doc_a"),
          col("sh").as("sh_a"), size(col("sh")).as("n_a"))
        val b = docs.select(col("doc_id").as("doc_b"),
          col("sh").as("sh_b"), size(col("sh")).as("n_b"))
        val ni = size(array_intersect(col("sh_a"), col("sh_b")))
        c.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
          .filter(lit(13) * ni >= lit(3) * (col("n_a") + col("n_b")))
          .select(col("doc_a"), col("doc_b"),
            (ni.cast("double") / (col("n_a") + col("n_b") - ni))
              .as("j"))
      }
      val agg = verified(cand).agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(col("doc_a") * lit(1000003L) + col("doc_b")),
          lit(0L)).as("key_sum"),
        coalesce(sum(round(col("j") * lit(1e6)).cast("long")), lit(0L))
          .as("jaccard_micros_sum"))
      val rAgg = verified(routedCand).agg(
        count(lit(1)).as("n_pairs_routed"),
        coalesce(sum(col("doc_a") * lit(1000003L) + col("doc_b")),
          lit(0L)).as("routed_key_sum"))
      val hotAgg2 = overCap.agg(
        count(lit(1)).as("n_hot_buckets"),
        coalesce(sum(col("bucket_n")), lit(0L)).as("hot_docs"))
      agg.crossJoin(hotAgg2).crossJoin(rAgg) // three 1-row frames
    }),

    // Unbounded scale twin of dd6: the dedup CLOSURE over the full
    // corpus — LSH-candidate edges (dd10's verified pairs) closed into
    // connected components, reduced to component-census aggregates the
    // recursive-CTE oracle replays over the exact edge set. This is
    // the full 100 TB dedup pipeline measured end to end at full SF:
    // sketch → band join → exact verify → min-label closure.
    "dd11_cc_full" -> ((s, dir) => {
      val edges = lshVerifiedPairs(s, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val cc = graft.operators.ConnectedComponents.dedupClusters(
        t(s, dir, "documents").select(col("doc_id").as("id")), edges)
      val census = cc.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(when(col("doc_id") =!= col("cluster_id"), 1L).otherwise(0L))
          .as("n_dropped"),
        sum(col("cluster_id")).as("cluster_id_sum"))
      val biggest = cc.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("csize"))
        .agg(max(col("csize")).as("max_cluster_size"))
      census.crossJoin(biggest) // two 1-row frames
    }),

    // SimHash recall check (the driver-hashable cross-check for dd4):
    // exact 2-shingle near-dup pairs (postings join, same criterion as
    // the dd2 oracle) SEMI-joined to dd4's simhash candidates. The
    // oracle lists ALL exact pairs ≥ 0.3 — if the simhash block join
    // ever misses a true near-dup, the row disappears from the Spark
    // side and the driver's hash compare fails.
    "dd7_simhash_recall" -> ((s, dir) => {
      val docs = ManagedCache.persist(
        t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"),
            SF.simhash64(TF.wordShingles(col("text"), 2)).as("sig")))
      val blocked = docs.select(col("doc_id"),
        explode(SF.simhashBlocks(col("sig"), 8)).as("blk"))
      val simhashPairs = blocked.as("a").join(blocked.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val p = postings(t(s, dir, "documents")
        .filter(col("doc_id") < 200), 2)
      val counts = p.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val exact = p.as("a").join(p.as("b"),
          col("a.sh") === col("b.sh") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("ni"))
        .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(col("ni").cast("double") /
            (col("na") + col("nb") - col("ni")).cast("double"), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= 0.3)
      exact.join(simhashPairs, Seq("doc_a", "doc_b"), "semi")
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Embedding near-dup: exact cosine over a bounded window (oracle
    // brute-force); the unbounded path goes through ann2's buckets.
    "dd5_embedding_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), col("embedding"))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(SF.cosine(col("a.embedding"), col("b.embedding")), 5)
            .as("cos"))
        .filter(col("cos") >= 0.4)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Fuzzy near-dup via edit distance with prefix blocking: candidate
    // pairs share (lang, 16-char prefix) and are within 20 chars in
    // length — an equi-join on the block key, NOT an O(n²) distance
    // matrix — then exact Levenshtein verifies. The oracle replays the
    // identical blocking + distance, so blocking and verification are
    // both checked. At 100 TB the block key shuffles like any join
    // key; prefix blocking catches same-head edits, and pairing it
    // with dd2/dd4 (which catch edits anywhere) covers the rest.
    "dd8_fuzzy_edit" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
          substring(col("text"), 1, 16).as("blk"))
      // the distance predicate is written as the LAST conjunct of the
      // explicit join condition: a post-join filter would be pushed
      // into the join by Catalyst and land AHEAD of the cheap
      // predicates, running levenshtein on every same-block key match
      // (including the ~n self-pairs) — measured 3.5× slower. Here the
      // cheap conjuncts (doc_id <, length band) prune first and the
      // banded O(len·9) levenshtein runs only on surviving candidates.
      d.as("a").join(d.as("b"),
          col("a.lang") === col("b.lang") &&
            col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id") &&
            abs(col("a.n_chars") - col("b.n_chars")) <= 20 &&
            levenshtein(col("a.text"), col("b.text"), 9).between(0, 8))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.text"), col("b.text"), 9).cast("long")
            .as("edit_dist"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Duplicate-span accounting (the n-gram-granular dedup of Lee et
    // al. 2021, "Deduplicating Training Data Makes Language Models
    // Better"): for every doc, the fraction of token positions covered
    // by an 8-gram that also appears in ANOTHER doc. Positional
    // 8-grams → global doc-frequency on the gram key (one shuffle,
    // map-side partial agg) → covered positions via sequence-explode →
    // distinct count per doc. The usual next step — splicing out the
    // covered spans — is a cheap filter on the same covered-position
    // set.
    "dd9_dup_spans" -> ((s, dir) => {
      val n = 8
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .withColumn("nt", size(col("toks")))
      val grams = d.filter(col("nt") >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), col("nt") - n),
            i => struct(i.as("i"),
              array_join(slice(col("toks"), i + 1, lit(n)), " ")
                .as("gram")))).as("g"))
        .select(col("doc_id"), col("g.i").as("i"), col("g.gram").as("gram"))
      val dupGrams = grams.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
      val covered = grams.join(dupGrams.select("gram"), Seq("gram"))
        .select(col("doc_id"),
          explode(sequence(col("i"), col("i") + (n - 1))).as("pos"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("pos")).as("n_dup_tokens"))
      d.join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("nt").cast("long").as("n_tokens"),
          coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
          round(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
            col("nt").cast("double"), 6).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-wide exact chunk dedup — the REWRITE counterpart to
    // dd9's accounting (C4's line dedup / Lee et al. 2021 exact
    // substring dedup, at chunk granularity since this corpus's docs
    // are single-line): split every document into NON-overlapping
    // 8-token chunks, drop each chunk whose exact text already
    // occurred earlier in the corpus (first occurrence by
    // (doc_id, chunk_idx) wins), and reassemble the survivors into
    // the cleaned document. Scale shape: exactly two shuffles — one
    // on the chunk text (first-occurrence window; min(struct) over an
    // UNORDERED whole-partition frame, so no per-partition sort key
    // beyond the partition hash), one on doc_id (reassembly). No
    // self-join and no candidate pairs: exact equality dedups via
    // grouping, so cost is linear in corpus size, not density².
    "dd13_chunk_dedup" -> ((s, dir) => {
      val n = 8
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .withColumn("nt", size(col("toks")))
        .filter(col("nt") > 0)
      val chunks = d.select(col("doc_id"),
          explode(transform(
            sequence(lit(0), floor((col("nt") - 1) / n).cast("int")),
            i => struct(i.as("i"),
              array_join(slice(col("toks"), i * n + 1, lit(n)), " ")
                .as("t")))).as("c"))
        .select(col("doc_id"), col("c.i").as("ci"), col("c.t").as("chunk"))
      val firstSeen = min(struct(col("doc_id"), col("ci")))
        .over(Window.partitionBy(col("chunk")))
      val marked = chunks.withColumn("keep",
        struct(col("doc_id"), col("ci")) === firstSeen)
      marked.groupBy(col("doc_id")).agg(
          concat_ws(" ", transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("ci").as("i"), col("chunk").as("t"))))),
            x => x.getField("t"))).as("text_clean"),
          count(lit(1)).as("n_chunks"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // INCREMENTAL near-dup admission — the production ingestion shape
    // the one-shot dd2/dd10 batch dedups don't exercise: a NEW batch
    // (doc_id ≡ 7 mod 10, ~10% of the corpus) arrives against an
    // EXISTING corpus whose banded-minhash index already exists (in
    // production: materialized once, appended per batch — here derived
    // in-plan from the same sketch, SF-independent split). Each new
    // doc joins the index on band buckets (corpus matches) AND its own
    // batch's buckets restricted to EARLIER batch members (within-
    // batch dups admit the first, drop the rest), then exact-verifies
    // candidates with dd10's integer-arithmetic size-band + 13·ni ≥
    // 3·(na+nb) test. admitted = no corpus match and no earlier batch
    // match. The oracle is the EXACT restricted-pair-space answer
    // (postings join), so an LSH recall miss fails the hash — same
    // guarantee as dd2/dd10. Scale: candidate volume ∝ batch × density
    // (never corpus²); the index side streams from storage, only the
    // batch's buckets are probed.
    "dd14_incremental_dedup" -> ((s, dir) => {
      val docs = ManagedCache.persist(
        t(s, dir, "documents")
          .select(col("doc_id"), TF.wordShingles(col("text"), 2).as("sh"))
          .filter(size(col("sh")) > 0))
      val isNew = pmod(col("doc_id"), lit(10)) === 7
      val oldDocs = docs.filter(!isNew)
      val newDocs = ManagedCache.persist(docs.filter(isNew))
      def bandsOf(d: DataFrame): DataFrame = d.select(col("doc_id"),
        explode(SF.lshBands(SF.minhashSignature(col("sh"), 16), 8, 2))
          .as("band"))
      val bOld = bandsOf(oldDocs)
      val bNew = ManagedCache.persist(bandsOf(newDocs))
      val candCorpus = bNew.as("a").join(bOld.as("b"),
          col("a.band") === col("b.band"))
        .select(col("a.doc_id").as("new_id"),
          col("b.doc_id").as("match_id")).distinct()
      val candBatch = bNew.as("a").join(bNew.as("b"),
          col("a.band") === col("b.band") &&
            col("b.doc_id") < col("a.doc_id"))
        .select(col("a.doc_id").as("new_id"),
          col("b.doc_id").as("match_id")).distinct()
      def verify(cand: DataFrame, side: DataFrame): DataFrame = {
        val a = newDocs.select(col("doc_id").as("new_id"),
          col("sh").as("sh_a"), size(col("sh")).as("n_a"))
        val b = side.select(col("doc_id").as("match_id"),
          col("sh").as("sh_b"), size(col("sh")).as("n_b"))
        val ni = size(array_intersect(col("sh_a"), col("sh_b")))
        cand.join(a, Seq("new_id")).join(b, Seq("match_id"))
          .filter(lit(10) * least(col("n_a"), col("n_b")) >=
              lit(3) * greatest(col("n_a"), col("n_b")) &&
            lit(13) * ni >= lit(3) * (col("n_a") + col("n_b")))
          .select(col("new_id"), col("match_id"))
      }
      val cStats = verify(candCorpus, oldDocs)
        .groupBy(col("new_id"))
        .agg(count(lit(1)).as("n_corpus"),
          sum(col("match_id")).as("corpus_key_sum"))
      val bStats = verify(candBatch, newDocs)
        .groupBy(col("new_id"))
        .agg(count(lit(1)).as("n_batch_prior"))
      newDocs.select(col("doc_id").as("new_id"))
        .join(cStats, Seq("new_id"), "left")
        .join(bStats, Seq("new_id"), "left")
        .select(col("new_id"),
          coalesce(col("n_corpus"), lit(0L)).as("n_corpus"),
          coalesce(col("corpus_key_sum"), lit(0L)).as("corpus_key_sum"),
          coalesce(col("n_batch_prior"), lit(0L)).as("n_batch_prior"))
        .withColumn("admitted",
          (col("n_corpus") === 0 && col("n_batch_prior") === 0)
            .cast("int"))
        .orderBy(col("new_id"))
    }),

    // Context-window chunking: split each doc into 64-token windows
    // every 48 tokens (16-token overlap) — the chunking step of a
    // RAG/pretraining pipeline. One narrow projection + explode, no
    // shuffle until the output sort; chunk text is fingerprinted, not
    // materialized, so the shuffled bytes stay small.
    "tx6_chunk_windows" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") > 0)
      d.select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), col("n") - 1, lit(48))).as("start"))
        .select(col("doc_id"),
          (col("start") / 48).cast("long").as("chunk_id"),
          size(slice(col("toks"), col("start") + 1, lit(64)))
            .cast("long").as("n_tokens"),
          md5(array_join(slice(col("toks"), col("start") + 1, lit(64)),
            " ")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // TF-IDF keyword extraction: top-3 terms per doc. The idf factor
    // is the RATIONAL n_docs/df (not ln) so the ranking key is an
    // exact IEEE quotient both engines compute bit-identically —
    // log-scaled idf only reorders monotonically, and transcendental
    // libm differences would make the oracle flaky. df is a distinct
    // postings agg; n_docs a 1-row broadcast.
    "tx9_tfidf" -> ((s, dir) => {
      tfidfTop3(t(s, dir, "documents").filter(col("doc_id") < 200))
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          col("df"), round(col("score"), 6).as("tfidf_lin"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Unbounded scale twin of tx9: TF-IDF keyword extraction over the
    // FULL corpus, reduced to aggregates over the per-doc top-3 rows
    // (row count, tf/df sums, 60-bit term-hash checksum, integer-
    // micros score sum) so the oracle hash-compares without dumping
    // 3 × n_docs rows. Everything is key-partitioned — the top-3 is a
    // doc-partitioned window, never a global sort — so this measures
    // the corpus-scale shape in Bench.
    "tx11_tfidf_full" -> ((s, dir) => {
      tfidfTop3(t(s, dir, "documents")).agg(
        count(lit(1)).as("n_rows"),
        sum(col("tf")).as("tf_sum"),
        sum(col("df")).as("df_sum"),
        // 40-bit hash, not 60: the sum of ~3n_docs 60-bit values
        // overflows ANSI long; 2^40 × corpus stays in range
        sum(conv(substring(md5(col("term")), 1, 10), 16, 10)
          .cast("long")).as("term_hash_sum"),
        sum(round(col("score") * lit(1e6)).cast("long"))
          .as("score_micros_sum"))
    }),

    // Vocabulary induction with contiguous token ids: corpus term
    // frequencies, ids assigned densely in (freq desc, term) order.
    // The id assignment is a global rank — at scale NOT a
    // partition-less row_number window (single task) but a
    // distributed prefix sum of ones over the range-partitioned sort
    // order (operators.PrefixSum, same machinery as px4).
    "tx10_vocab_ids" -> ((s, dir) => {
      val terms = t(s, dir, "documents")
        .select(explode(TF.tokens(lower(col("text")))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 2)
        .withColumn("nf", -col("freq"))
        .withColumn("one", lit(1L))
      graft.operators.PrefixSum
        .withRunningSum(terms, Seq("nf", "term"), "one", "cum")
        .select(col("term"), col("freq"),
          (col("cum") - 1).as("token_id"))
        .orderBy(col("token_id"))
    }),

    // Unicode canonicalization before dedup — the native
    // UnicodeNormalize expression (codegen, zero-allocation fast path
    // for already-normal text) driven end to end: every doc is split
    // into a COMPOSED variant (suffix "…caf" + é U+00E9) and a
    // DECOMPOSED one (… + "cafe" + combining acute U+0301) — distinct
    // byte strings that exact dedup would keep apart. NFC must unify
    // them: n_raw stays 2, n_norm collapses to 1, and exactly the
    // composed variant is already normal. The corpus text itself is
    // NFC-clean (checked), so already_nfc counts BOTH variants' prefix
    // scan through the fast path. Oracle = DuckDB's nfc_normalize.
    // At 100 TB this is a pure map stage fused into the scan.
    "tx12_nfc_dedup" -> ((s, dir) => {
      import graft.expressions.UnicodeNormalize
      val prefix = substring(col("text"), 1, 60)
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), explode(array(
          concat(prefix, lit("caf"), lit("\u00e9")),
          concat(prefix, lit("cafe"), lit("\u0301")))).as("variant"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("variant")).as("n_raw"),
          countDistinct(UnicodeNormalize.nfc(col("variant")))
            .as("n_norm"),
          sum(when(UnicodeNormalize.nfc(col("variant")) ===
            col("variant"), 1L).otherwise(0L)).as("n_already_nfc"))
        .orderBy(col("doc_id"))
    }),

    // BPE merge training (Sennrich et al., ACL 2016) over the full
    // corpus — the tokenizer-TRAINING workload, not just counting:
    // words become char sequences (+ </w> marker), then 3 merge
    // rounds, each = count adjacent symbol pairs (flatMap + one
    // groupBy) → global best pair (count desc, then lexicographic —
    // deterministic) → greedy left-to-right merge applied corpus-wide.
    // The corpus rides a spaced-token string (" a  b  </w> ": double
    // spaces BETWEEN tokens, single-space pad) so the merge is ONE
    // literal `replace(' a  b ', ' ab ')` — non-overlapping
    // left-to-right replacement IS greedy BPE merging, and DuckDB's
    // replace scans identically, which is what makes the oracle
    // replay exact (e.g. "aaa" + pair (a,a) -> [aa, a] in both).
    // Per round the driver holds ONE row (the argmax pair) — the
    // bounded-collect discipline PrefixSum uses; everything heavy
    // stays distributed. At 100 TB: 3 shuffles of symbol-pair counts,
    // each count frame shrinking as merges fuse tokens.
    "tx13_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      // fanOut: the corpus cache inherits the scan's partitioning, so
      // an un-fanned one-file scan makes EVERY merge round a
      // single-task pass over the cached corpus (explode + pair count
      // fused into one partition); no-op at scale
      val words = graft.operators.Parallelism
        .fanOut(t(s, dir, "documents"))
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "[^a-z0-9]+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      var corpus = ManagedCache.persist(
        words.select(TF.bpeSpaced(col("word")).as("s")))
      val merges =
        scala.collection.mutable.ArrayBuffer[(Int, String, String,
          String, Long)]()
      for (round <- 1 to 3) {
        val best = corpus
          .select(TF.bpeTokens(col("s")).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("t"),
            explode(sequence(lit(0), size(col("t")) - 2)).as("i"))
          .select(element_at(col("t"), col("i") + 1).as("a"),
            element_at(col("t"), col("i") + 2).as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("a"), col("b")).limit(1)
          .collect()(0)
        val (a, b, n) =
          (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((round, a, b, a + b, n))
        corpus = ManagedCache.persist(corpus.select(
          TF.bpeMerge(col("s"), a, b).as("s")))
      }
      merges.toSeq
        .toDF("round", "pair_a", "pair_b", "merged", "n_occurrences")
        .orderBy(col("round"))
    }),

    // BPE ENCODE — the apply half of the tokenizer (tx13 trains the
    // merges; this tokenizes the corpus with them): re-derive the 3
    // trained merges (same bounded 1-row-per-round collect), then
    // apply the chain greedily to every document's words and emit
    // per-doc token statistics. Application is pure per-row Column
    // algebra (3 literal replaces on the spaced form) — ZERO extra
    // shuffle beyond the training counts; the per-doc agg keys on
    // doc_id. n_merged counts tokens that ARE one of the trained
    // symbols — the compression the merges actually bought.
    "tx16_bpe_encode" -> ((s, dir) => {
      // fanOut: tx13's note — the corpus cache and the final encode
      // otherwise run at one-file scan width; no-op at scale
      val docsW = graft.operators.Parallelism
        .fanOut(t(s, dir, "documents"))
        .select(col("doc_id"), explode(split(trim(regexp_replace(
          lower(col("text")), "[^a-z0-9]+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      var corpus = ManagedCache.persist(
        docsW.select(TF.bpeSpaced(col("word")).as("s")))
      val merged = scala.collection.mutable.ArrayBuffer[String]()
      var chain: List[(String, String)] = Nil
      for (_ <- 1 to 3) {
        val best = corpus
          .select(TF.bpeTokens(col("s")).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("t"),
            explode(sequence(lit(0), size(col("t")) - 2)).as("i"))
          .select(element_at(col("t"), col("i") + 1).as("a"),
            element_at(col("t"), col("i") + 2).as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("a"), col("b")).limit(1)
          .collect()(0)
        val (a, b) = (best.getString(0), best.getString(1))
        chain = chain :+ ((a, b))
        merged += (a + b)
        corpus = ManagedCache.persist(corpus.select(
          TF.bpeMerge(col("s"), a, b).as("s")))
      }
      val enc = chain.foldLeft(TF.bpeSpaced(col("word"))) {
        case (c, (a, b)) => TF.bpeMerge(c, a, b)
      }
      val mergedArr = array(merged.toSeq.map(lit): _*)
      docsW
        .select(col("doc_id"), TF.bpeTokens(enc).as("t"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(size(col("t")).cast("long")).as("n_tokens"),
          sum(size(filter(col("t"),
            x => array_contains(mergedArr, x))).cast("long"))
            .as("n_merged"))
        .orderBy(col("doc_id"))
    }),

    // Mixed-script detection — the spoofing/spam signal (Cyrillic
    // chars inside Latin text, CJK mixed into neither): per-doc
    // counts of Latin/Cyrillic/Han characters via Unicode script
    // classes (Java `\p{IsX}` in Spark, RE2 `\p{X}` in the oracle —
    // same script property, different spelling), plus a scripts-
    // present census and the mixed flag. Script suffixes are PLANTED
    // deterministically (the synthetic corpus is single-script), the
    // px5 pattern. Pure scan-side Column algebra.
    "tx18_script_mix" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3))
      val t2 = concat(col("text"),
        when(m === 0, lit(" Привет мир"))
          .when(m === 1, lit(" 漢字文本")).otherwise(lit("")))
      t(s, dir, "documents").select(col("doc_id"),
          length(regexp_replace(t2, "[^\\p{IsLatin}]", ""))
            .cast("long").as("n_latin"),
          length(regexp_replace(t2, "[^\\p{IsCyrillic}]", ""))
            .cast("long").as("n_cyrillic"),
          length(regexp_replace(t2, "[^\\p{IsHan}]", ""))
            .cast("long").as("n_han"))
        .withColumn("n_scripts",
          ((col("n_latin") > 0).cast("int") +
            (col("n_cyrillic") > 0).cast("int") +
            (col("n_han") > 0).cast("int")).cast("long"))
        .withColumn("is_mixed", (col("n_scripts") >= 2).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // Flesch-style readability signals in EXACT integers: words,
    // sentences (terminator runs, min 1), syllable proxy (vowel
    // groups), and a milli-scaled score via two floor divisions —
    // the classic readability filter, zero floats, zero shuffles
    // beyond the final sort (all signals are per-row Column algebra
    // fused into the scan).
    "tx17_readability" -> ((s, dir) => {
      val txt = lower(col("text"))
      val nWords = size(split(trim(regexp_replace(txt,
        "[^a-z0-9]+", " ")), " "))
      val nSent = greatest(lit(1),
        size(split(col("text"), "[.!?]+")) - 1)
      val nSyll = greatest(lit(1), size(split(
        regexp_replace(txt, "[aeiouy]+", "#"), "#")) - 1)
      t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          nWords.cast("long").as("n_words"),
          nSent.cast("long").as("n_sentences"),
          nSyll.cast("long").as("n_syllables"))
        .withColumn("score_milli",
          lit(206835L) -
            call_function("div", lit(1015L) * col("n_words"),
              col("n_sentences")) -
            call_function("div", lit(84600L) * col("n_syllables"),
              col("n_words")))
        .orderBy(col("doc_id"))
    }),

    // Corpus-informed n-gram novelty — the rarity signal that
    // separates TEMPLATE text (bigrams shared corpus-wide, high mean
    // document frequency) from novel-or-junk text (mostly unique
    // bigrams): per doc, the mean DF of its distinct bigrams, in
    // exact integer micros (df_sum·1e6 div n_grams — no float). The
    // postings ⋈ DF join shuffles on the gram key — at 100 TB the DF
    // table is corpus-sized, so this is the genuine distributed
    // shape (a broadcast would not survive scale-up), and the
    // postings frame is persisted so shingling runs once for both
    // sides.
    "tx14_ngram_novelty" -> ((s, dir) => {
      val p = ManagedCache.persist(
        postings(t(s, dir, "documents"), 2))
      val df = p.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      p.join(df, Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(col("df")).as("df_sum"))
        .withColumn("mean_df_micros", call_function("div",
          col("df_sum") * lit(1000000L), col("n_grams")))
        .withColumn("is_novel",
          (col("mean_df_micros") < 2000000L).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // WITHIN-doc repetition signals (Gopher, Rae et al. 2021 §A1.1):
    // duplicate-word fraction and most-frequent-bigram share — the
    // self-repetition filters that catch degenerate/looping text
    // exact dedup can't (each repetitive doc is globally unique).
    // ZERO shuffle: every signal is per-row Column algebra — the top
    // bigram count comes from a sort-then-max-run fold over the doc's
    // OWN bigram array (`aggregate` over `array_sort`), never an
    // explode→groupBy — so at 100 TB this fuses into the scan like
    // tx2/tx3. All outputs are exact integers; the flag thresholds
    // (top bigram ≥ 20 % of bigrams, distinct words ≤ 30 % of words)
    // are integer cross-multiplications, no float anywhere.
    "tx15_repetition_signals" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .withColumn("n_words", size(col("toks")).cast("long"))
        .filter(col("n_words") > 0)
      // count of the most frequent bigram = max equal-run over the
      // sorted bigram array — row-local, fuses into the scan
      val topBigram = TF.topRepeatCount(TF.adjacentBigrams(col("toks")))
      d.select(col("doc_id"), col("n_words"),
          size(array_distinct(col("toks"))).cast("long")
            .as("n_distinct_words"),
          greatest(col("n_words") - 1, lit(0L)).as("n_bigrams"),
          topBigram.as("top_bigram_n"))
        .withColumn("rep_flag",
          ((col("n_bigrams") > 0 &&
            col("top_bigram_n") * 5 >= col("n_bigrams")) ||
            col("n_distinct_words") * 10 <= col("n_words") * 3)
            .cast("int"))
        .orderBy(col("doc_id"))
    }),

    // ---- similarity search --------------------------------------------
    // Brute-force cosine top-k (the exactness baseline): 5 query
    // vectors against the full corpus, rank on ROUNDED cosine + vec_id
    // so both engines break ties identically.
    "ann1_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(SF.cosine(col("qv"), col("embedding")), 5).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN (the scale path): deterministic hyperplane
    // buckets (16 buckets here; 2^p grows with corpus), search only
    // the query's bucket. Uses the arithmetic hyperplanes — a fixed
    // mod-5 weight pattern in {-2..2} instead of hashed components —
    // so the
    // ENTIRE pipeline (bucket assignment → bucket-restricted top-k)
    // is reproducible in plain SQL and oracle-checked end to end;
    // hyperplaneBucket (hashed) stays available for production.
    "ann2_lsh_ann" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          SF.arithmeticHyperplaneBucket(col("embedding"), 4).as("bucket"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("bucket").as("qbucket"))
      val scored = e.join(broadcast(q),
          col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(SF.cosine(col("qv"), col("embedding")), 5).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- multimodal plumbing ------------------------------------------
    // Opaque-binary column handling: encode text as the stand-in blob
    // (the container has no image/audio libs — see graft.multimodal
    // for the stubbed decode pipeline), extract typed metadata.
    "mm1_binary_metadata" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
          col("source"))
        .select(col("doc_id"), octet_length(col("blob")).as("n_bytes"),
          substring(hex(col("blob")), 1, 8).as("magic_hex"),
          col("source"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = {
    // lowercased to mirror TextFunctions.langId (caps still match)
    val toks = """string_split_regex(trim(lower(text)), '\s+')"""
    val scoreOf = (markers: String) =>
      s"round(len(list_filter($toks, x -> x IN ($markers)))::DOUBLE / greatest(len($toks), 1), 9)"
    val sEn = scoreOf("'the','a','of','and','is'")
    val sDe = scoreOf("'der','die','das','und','ist'")
    val sEs = scoreOf("'el','la','de','y','es'")
    val sFr = scoreOf("'le','la','de','et','est'")
    val sZh = scoreOf("'的','是','了','在','我'")
    Map(
      "tx1_lang_id" ->
        s"""SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN en >= de AND en >= es AND en >= fr AND en >= zh THEN 'en'
             WHEN de >= es AND de >= fr AND de >= zh THEN 'de'
             WHEN es >= fr AND es >= zh THEN 'es'
             WHEN fr >= zh THEN 'fr'
             ELSE 'zh' END AS predicted_lang
           FROM (SELECT doc_id, lang, $sEn AS en, $sDe AS de, $sEs AS es,
             $sFr AS fr, $sZh AS zh FROM documents)
           ORDER BY doc_id""",
      "tx5_ngram_profile" ->
        """WITH d AS (SELECT lang,
             list_distinct(list_transform(
               range(1, greatest(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) - 1, 1)),
               i -> substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), i, 3))) AS gs
           FROM documents WHERE doc_id < 5000),
         g AS (SELECT lang, unnest(gs) AS gram FROM d),
         c AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY 1, 2)
         SELECT lang, rank, gram, n FROM (
           SELECT *, row_number() OVER (PARTITION BY lang
             ORDER BY n DESC, gram) AS rank FROM c)
         WHERE rank <= 5 ORDER BY lang, rank""",
      "tx2_quality_score" ->
        """SELECT doc_id, round(
             0.4 * (1.0 - nonalpha / len) +
             0.3 * least(stop * 5.0, 1.0) +
             0.2 * least(len / 500.0, 1.0) +
             0.1 * (1.0 - least(punct / len * 10.0, 1.0)), 6) AS quality
           FROM (SELECT doc_id,
             greatest(length(text), 1)::DOUBLE AS len,
             (length(text) - length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')))::DOUBLE AS nonalpha,
             (length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))::DOUBLE AS punct,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x IN ('the','a','of','and','is')))::DOUBLE /
               greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1)
               AS stop
             FROM documents)
           ORDER BY doc_id""",
      "tx3_token_count" ->
        """SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe_est
           FROM documents ORDER BY doc_id""",
      "tx4_fingerprint" ->
        """SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fp
           FROM documents ORDER BY doc_id""",
      // replays all 3 BPE rounds: the spaced-token representation
      // makes DuckDB's left-to-right replace() identical to the
      // Spark-side greedy merge
      "tx13_bpe_merges" ->
        """WITH words AS (
             SELECT unnest(string_split(trim(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
             FROM documents),
           w0 AS (SELECT ' ' ||
               regexp_replace(word, '(.)', '\1  ', 'g') || '</w> ' AS s
             FROM words WHERE length(word) > 0),
           p1 AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS n FROM (
               SELECT t, unnest(range(1, len(t))) AS i FROM
                 (SELECT string_split(trim(s), '  ') AS t FROM w0))
             GROUP BY 1, 2),
           b1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
           w1 AS (SELECT replace(s, ' ' || b1.a || '  ' || b1.b || ' ',
               ' ' || b1.a || b1.b || ' ') AS s
             FROM w0 CROSS JOIN b1),
           p2 AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS n FROM (
               SELECT t, unnest(range(1, len(t))) AS i FROM
                 (SELECT string_split(trim(s), '  ') AS t FROM w1))
             GROUP BY 1, 2),
           b2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
           w2 AS (SELECT replace(s, ' ' || b2.a || '  ' || b2.b || ' ',
               ' ' || b2.a || b2.b || ' ') AS s
             FROM w1 CROSS JOIN b2),
           p3 AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS n FROM (
               SELECT t, unnest(range(1, len(t))) AS i FROM
                 (SELECT string_split(trim(s), '  ') AS t FROM w2))
             GROUP BY 1, 2),
           b3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1)
         SELECT round, pair_a, pair_b, merged, n_occurrences FROM (
           SELECT 1 AS round, a AS pair_a, b AS pair_b,
             a || b AS merged, n AS n_occurrences FROM b1
           UNION ALL SELECT 2, a, b, a || b, n FROM b2
           UNION ALL SELECT 3, a, b, a || b, n FROM b3)
         ORDER BY round""",
      // tx13's training CTEs re-run verbatim, then the 3-merge chain
      // applied per doc (innermost replace first = chain order)
      "tx16_bpe_encode" ->
        """WITH words AS (
             SELECT unnest(string_split(trim(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
             FROM documents),
           w0 AS (SELECT ' ' ||
               regexp_replace(word, '(.)', '\1  ', 'g') || '</w> ' AS s
             FROM words WHERE length(word) > 0),
           p1 AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS n FROM (
               SELECT t, unnest(range(1, len(t))) AS i FROM
                 (SELECT string_split(trim(s), '  ') AS t FROM w0))
             GROUP BY 1, 2),
           b1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
           w1 AS (SELECT replace(s, ' ' || b1.a || '  ' || b1.b || ' ',
               ' ' || b1.a || b1.b || ' ') AS s
             FROM w0 CROSS JOIN b1),
           p2 AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS n FROM (
               SELECT t, unnest(range(1, len(t))) AS i FROM
                 (SELECT string_split(trim(s), '  ') AS t FROM w1))
             GROUP BY 1, 2),
           b2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
           w2 AS (SELECT replace(s, ' ' || b2.a || '  ' || b2.b || ' ',
               ' ' || b2.a || b2.b || ' ') AS s
             FROM w1 CROSS JOIN b2),
           p3 AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS n FROM (
               SELECT t, unnest(range(1, len(t))) AS i FROM
                 (SELECT string_split(trim(s), '  ') AS t FROM w2))
             GROUP BY 1, 2),
           b3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1),
           ml AS (SELECT [b1.a || b1.b, b2.a || b2.b, b3.a || b3.b]
               AS l FROM b1, b2, b3),
           dw AS (SELECT doc_id, unnest(string_split(trim(
               regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
               ' ')) AS word
             FROM documents),
           ds AS (SELECT doc_id, ' ' ||
               regexp_replace(word, '(.)', '\1  ', 'g') || '</w> ' AS s
             FROM dw WHERE length(word) > 0),
           enc AS (SELECT doc_id, replace(replace(replace(s,
               ' ' || b1.a || '  ' || b1.b || ' ',
               ' ' || b1.a || b1.b || ' '),
               ' ' || b2.a || '  ' || b2.b || ' ',
               ' ' || b2.a || b2.b || ' '),
               ' ' || b3.a || '  ' || b3.b || ' ',
               ' ' || b3.a || b3.b || ' ') AS s
             FROM ds CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3),
           tok AS (SELECT doc_id, string_split(trim(s), '  ') AS t
             FROM enc)
         SELECT doc_id, count(*) AS n_words,
           CAST(sum(len(t)) AS BIGINT) AS n_tokens,
           CAST(sum(len(list_filter(t,
             x -> list_contains(ml.l, x)))) AS BIGINT) AS n_merged
         FROM tok CROSS JOIN ml
         GROUP BY doc_id ORDER BY doc_id""",
      // same plants, RE2 script classes, per-codepoint counts
      "tx18_script_mix" ->
        """WITH t AS (SELECT doc_id, text ||
             CASE doc_id % 3 WHEN 0 THEN ' Привет мир'
               WHEN 1 THEN ' 漢字文本' ELSE '' END AS t2
           FROM documents),
         c AS (SELECT doc_id,
             CAST(length(regexp_replace(t2, '[^\p{Latin}]', '', 'g'))
               AS BIGINT) AS n_latin,
             CAST(length(regexp_replace(t2, '[^\p{Cyrillic}]', '',
               'g')) AS BIGINT) AS n_cyrillic,
             CAST(length(regexp_replace(t2, '[^\p{Han}]', '', 'g'))
               AS BIGINT) AS n_han
           FROM t)
         SELECT doc_id, n_latin, n_cyrillic, n_han,
           CAST(CAST(n_latin > 0 AS INT) + CAST(n_cyrillic > 0 AS INT)
             + CAST(n_han > 0 AS INT) AS BIGINT) AS n_scripts,
           CAST(CAST(n_latin > 0 AS INT) + CAST(n_cyrillic > 0 AS INT)
             + CAST(n_han > 0 AS INT) >= 2 AS INT) AS is_mixed
         FROM c ORDER BY doc_id""",
      // integer Flesch proxy: terminator-run sentences, vowel-group
      // syllables, two floor divisions on exact bigints
      "tx17_readability" ->
        """SELECT doc_id,
             CAST(len(string_split(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), ' ')) AS BIGINT) AS n_words,
             CAST(greatest(1, len(string_split_regex(text, '[.!?]+'))
               - 1) AS BIGINT) AS n_sentences,
             CAST(greatest(1, len(string_split(regexp_replace(
               lower(text), '[aeiouy]+', '#', 'g'), '#')) - 1)
               AS BIGINT) AS n_syllables,
             206835 - (1015 * CAST(len(string_split(trim(
                 regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                 ' ')) AS BIGINT))
               // CAST(greatest(1, len(string_split_regex(text,
                 '[.!?]+')) - 1) AS BIGINT)
               - (84600 * CAST(greatest(1, len(string_split(
                 regexp_replace(lower(text), '[aeiouy]+', '#', 'g'),
                 '#')) - 1) AS BIGINT))
               // CAST(len(string_split(trim(regexp_replace(
                 lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))
                 AS BIGINT) AS score_milli
           FROM documents WHERE length(trim(text)) > 0
           ORDER BY doc_id""",
      // same shingle table; integer mean-DF replayed exactly
      "tx14_ngram_novelty" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
         a AS (SELECT sh.doc_id, count(*) AS n_grams,
             CAST(sum(df.df) AS BIGINT) AS df_sum
           FROM sh JOIN df ON df.s = sh.s GROUP BY 1)
         SELECT doc_id, n_grams, df_sum,
           (df_sum * 1000000) // n_grams AS mean_df_micros,
           CAST((df_sum * 1000000) // n_grams < 2000000 AS INT)
             AS is_novel
         FROM a ORDER BY doc_id""",
      // semantics-level replay (explode → group → max), not the fold:
      // the oracle pins WHAT the max-run fold computes, independent of
      // the sorted-array mechanism
      "tx15_repetition_signals" ->
        """WITH w AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS ws
           FROM documents),
         b AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(len(list_distinct(ws)) AS BIGINT)
               AS n_distinct_words,
             list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1]) AS bg
           FROM w WHERE len(ws) > 0),
         g AS (SELECT doc_id, unnest(bg) AS gram FROM b),
         c AS (SELECT doc_id, max(cnt) AS top_n FROM (
             SELECT doc_id, gram, count(*) AS cnt FROM g
             GROUP BY 1, 2) GROUP BY 1)
         SELECT b.doc_id, n_words, n_distinct_words,
           greatest(n_words - 1, 0) AS n_bigrams,
           CAST(coalesce(top_n, 0) AS BIGINT) AS top_bigram_n,
           CAST((greatest(n_words - 1, 0) > 0 AND
               coalesce(top_n, 0) * 5 >= greatest(n_words - 1, 0))
             OR n_distinct_words * 10 <= n_words * 3 AS INT)
             AS rep_flag
         FROM b LEFT JOIN c ON c.doc_id = b.doc_id
         ORDER BY b.doc_id""",
      // composed (chr(233) = U+00E9) vs decomposed (chr(769) = U+0301
      // combining acute) variants; nfc_normalize must unify them
      "tx12_nfc_dedup" ->
        """WITH v AS (SELECT doc_id, unnest([
             substr(text, 1, 60) || 'caf' || chr(233),
             substr(text, 1, 60) || 'cafe' || chr(769)]) AS variant
           FROM documents WHERE doc_id < 300)
         SELECT doc_id, count(DISTINCT variant) AS n_raw,
           count(DISTINCT nfc_normalize(variant)) AS n_norm,
           CAST(sum(CASE WHEN nfc_normalize(variant) = variant
             THEN 1 ELSE 0 END) AS BIGINT) AS n_already_nfc
         FROM v GROUP BY doc_id ORDER BY doc_id""",
      "dd1_exact_dedup" ->
        """SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id, count(*) AS n_copies
           FROM documents GROUP BY 1 ORDER BY keeper_doc_id""",
      // dd2 + dd7 share this oracle: ALL exact 2-shingle near-dup
      // pairs at the 0.3 threshold. dd2 equals it iff LSH recall is 1;
      // dd7 equals it iff the simhash block join found every pair.
      "dd2_minhash_lsh" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents WHERE doc_id < 200),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(ni::DOUBLE / (ca.n + cb.n - ni), 6) AS jaccard
         FROM inter
         JOIN counts ca ON ca.doc_id = doc_a
         JOIN counts cb ON cb.doc_id = doc_b
         WHERE round(ni::DOUBLE / (ca.n + cb.n - ni), 6) >= 0.3
         ORDER BY doc_a, doc_b""",
      // dd10's oracle: the exact postings-join twin over the FULL
      // corpus, collapsed to the same one-row aggregate. Integer
      // count/key/micros sums are order-independent, so parallel
      // summation cannot flip a ULP.
      // full LSH replay: portable md5-60 minhash signatures, banded
      // keys, candidate bucket join, exact-Jaccard truth, both counted
      "dd19_lsh_eval" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents WHERE doc_id < 150),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d WHERE len(toks) >= 2),
         sig AS (SELECT doc_id, i,
             min(('0x' || substr(md5('mh:' || i || ':' || s), 1, 15))
               ::BIGINT) AS m
           FROM sh, LATERAL (SELECT unnest(range(0, 12)) AS i) _
           GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 2 AS band,
             string_agg(m::VARCHAR, ',' ORDER BY i) AS key
           FROM sig GROUP BY doc_id, i // 2),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bands a JOIN bands b ON a.band = b.band
             AND a.key = b.key AND a.doc_id < b.doc_id),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         truth AS (SELECT da, db FROM (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2) i
           JOIN counts ca ON ca.doc_id = i.da
           JOIN counts cb ON cb.doc_id = i.db
           WHERE round(ni::DOUBLE / (ca.n + cb.n - ni), 6) >= 0.3),
         hits AS (SELECT count(*) AS n_hits FROM cand
           WHERE EXISTS (SELECT 1 FROM truth
             WHERE truth.da = cand.da AND truth.db = cand.db)),
         m AS (SELECT
             (SELECT count(*) FROM truth) AS n_truth,
             (SELECT count(*) FROM cand) AS n_candidates,
             (SELECT n_hits FROM hits) AS n_hits)
         SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           (n_hits * 1000) // nullif(n_candidates, 0)
             AS precision_mille,
           (n_hits * 1000) // nullif(n_truth, 0) AS recall_mille
         FROM m""",
      "dd10_minhash_full" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT doc_a, doc_b,
             ni::DOUBLE / (ca.n + cb.n - ni) AS j
           FROM inter
           JOIN counts ca ON ca.doc_id = doc_a
           JOIN counts cb ON cb.doc_id = doc_b
           WHERE ni::DOUBLE / (ca.n + cb.n - ni) >= 0.3)
         SELECT count(*) AS n_pairs,
           CAST(sum(doc_a * 1000003::BIGINT + doc_b) AS BIGINT)
             AS key_sum,
           CAST(sum(CAST(round(j * 1e6) AS BIGINT)) AS BIGINT)
             AS jaccard_micros_sum,
           CAST(0 AS BIGINT) AS n_hot_buckets,
           CAST(0 AS BIGINT) AS hot_docs
         FROM pairs""",
      // dd20's oracle replays the PORTABLE banding itself (dd19's md5
      // minhash), the cap, the star routing, and the verification —
      // the hot-bucket accounting is pinned at its true NONZERO value.
      "dd20_minhash_capped" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d WHERE len(toks) >= 2),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         sig AS (SELECT doc_id, i,
             min(('0x' || substr(md5('mh:' || i || ':' || s), 1, 15))
               ::BIGINT) AS m
           FROM sh, LATERAL (SELECT unnest(range(0, 8)) AS i) _
           GROUP BY doc_id, i),
         sigkey AS (SELECT doc_id,
             string_agg(m::VARCHAR, ',' ORDER BY i) AS sk
           FROM sig GROUP BY doc_id),
         bands AS (SELECT doc_id, (i // 2)::VARCHAR || ':' ||
             string_agg(m::VARCHAR, ',' ORDER BY i) AS bucket
           FROM sig GROUP BY doc_id, i // 2),
         bsz AS (SELECT bucket, count(*) AS bucket_n
           FROM bands GROUP BY 1),
         hot AS (SELECT bucket, bucket_n FROM bsz WHERE bucket_n > 4),
         safe AS (SELECT b.* FROM bands b
           WHERE bucket NOT IN (SELECT bucket FROM hot)),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM safe a JOIN safe b
             ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
         hotrows AS (SELECT b.doc_id, b.bucket, s.sk
           FROM bands b JOIN sigkey s USING (doc_id)
           WHERE b.bucket IN (SELECT bucket FROM hot)),
         reps AS (SELECT bucket, sk, min(doc_id) AS rep
           FROM hotrows GROUP BY 1, 2),
         routed AS (SELECT DISTINCT r.rep AS da, h.doc_id AS db
           FROM hotrows h
           JOIN reps r ON r.bucket = h.bucket AND r.sk = h.sk
           WHERE h.doc_id <> r.rep),
         routed2 AS (SELECT da, db FROM routed
           WHERE NOT EXISTS (SELECT 1 FROM cand
             WHERE cand.da = routed.da AND cand.db = routed.db)),
         vb AS (SELECT c.da, c.db, ca.n AS na, cb.n AS nb,
             (SELECT count(*) FROM sh a JOIN sh b2
               ON b2.s = a.s AND a.doc_id = c.da AND b2.doc_id = c.db)
               AS ni
           FROM cand c
           JOIN counts ca ON ca.doc_id = c.da
           JOIN counts cb ON cb.doc_id = c.db),
         bp AS (SELECT da, db, ni::DOUBLE / (na + nb - ni) AS j
           FROM vb WHERE 13 * ni >= 3 * (na + nb)),
         vr AS (SELECT c.da, c.db, ca.n AS na, cb.n AS nb,
             (SELECT count(*) FROM sh a JOIN sh b2
               ON b2.s = a.s AND a.doc_id = c.da AND b2.doc_id = c.db)
               AS ni
           FROM routed2 c
           JOIN counts ca ON ca.doc_id = c.da
           JOIN counts cb ON cb.doc_id = c.db),
         rp AS (SELECT da, db FROM vr
           WHERE 13 * ni >= 3 * (na + nb))
         SELECT
           (SELECT count(*) FROM bp) AS n_pairs,
           (SELECT CAST(coalesce(sum(da * 1000003::BIGINT + db), 0)
             AS BIGINT) FROM bp) AS key_sum,
           (SELECT CAST(coalesce(sum(CAST(round(j * 1e6) AS BIGINT)),
             0) AS BIGINT) FROM bp) AS jaccard_micros_sum,
           (SELECT count(*) FROM hot) AS n_hot_buckets,
           (SELECT CAST(coalesce(sum(bucket_n), 0) AS BIGINT)
             FROM hot) AS hot_docs,
           (SELECT count(*) FROM rp) AS n_pairs_routed,
           (SELECT CAST(coalesce(sum(da * 1000003::BIGINT + db), 0)
             AS BIGINT) FROM rp) AS routed_key_sum""",
      // dd11's oracle: recursive-CTE closure over the exact full-corpus
      // edge set, collapsed to the same component census. Equals the
      // Spark side iff LSH recall is 1 (a missed edge splits a
      // component and shifts every aggregate).
      "dd11_cc_full" ->
        """WITH RECURSIVE d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         edges AS (SELECT doc_a, doc_b FROM inter
           JOIN counts ca ON ca.doc_id = doc_a
           JOIN counts cb ON cb.doc_id = doc_b
           WHERE ni::DOUBLE / (ca.n + cb.n - ni) >= 0.3),
         sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
           UNION SELECT doc_b, doc_a FROM edges),
         reach AS (
           SELECT doc_id AS id, doc_id AS comp FROM d
           UNION
           SELECT s.dst AS id, r.comp FROM reach r
           JOIN sym s ON s.src = r.id),
         comps AS (SELECT id, min(comp) AS cluster_id
           FROM reach GROUP BY id),
         sizes AS (SELECT cluster_id, count(*) AS csize
           FROM comps GROUP BY 1)
         SELECT count(*) AS n_docs,
           count(DISTINCT c.cluster_id) AS n_clusters,
           CAST(sum(CASE WHEN c.id <> c.cluster_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dropped,
           CAST(sum(c.cluster_id) AS BIGINT) AS cluster_id_sum,
           (SELECT max(csize) FROM sizes) AS max_cluster_size
         FROM comps c""",
      // dd4's oracle replays the ENTIRE portable simhash pipeline:
      // same shingles, same md5-60-bit hash, same bit-vote, exact
      // pairwise hamming (the Spark side's block join is pigeonhole-
      // complete for radius 7 < 10 blocks, so both sides define the
      // identical pair set).
      "dd4_simhash" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents WHERE doc_id < 200),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         hashed AS (SELECT doc_id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
           FROM sh),
         votes AS (SELECT doc_id, j,
             sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS bal
           FROM hashed CROSS JOIN range(60) r(j)
           GROUP BY 1, 2),
         sigs AS (SELECT doc_id,
             sum(CASE WHEN bal > 0 THEN (1::BIGINT << j) ELSE 0 END)
               AS sig
           FROM votes GROUP BY 1)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 7
         ORDER BY doc_a, doc_b""",
      // dd12's oracle: the dd4 replay (same shingles, md5-60 hash,
      // bit-vote, exact pairwise hamming) over the FULL corpus,
      // collapsed to order-independent integer aggregates.
      "dd12_simhash_full" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         hashed AS (SELECT doc_id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
           FROM sh),
         votes AS (SELECT doc_id, j,
             sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS bal
           FROM hashed CROSS JOIN range(60) r(j)
           GROUP BY 1, 2),
         sigs AS (SELECT doc_id,
             sum(CASE WHEN bal > 0 THEN (1::BIGINT << j) ELSE 0 END)
               AS sig
           FROM votes GROUP BY 1),
         pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
           FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.sig, b.sig)) <= 7)
         SELECT count(*) AS n_pairs,
           CAST(sum(doc_a * 1000003::BIGINT + doc_b) AS BIGINT)
             AS key_sum,
           CAST(sum(hamming) AS BIGINT) AS hamming_sum,
           CAST(0 AS BIGINT) AS n_hot_buckets,
           CAST(0 AS BIGINT) AS hot_docs
         FROM pairs""",
      "dd7_simhash_recall" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents WHERE doc_id < 200),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(ni::DOUBLE / (ca.n + cb.n - ni), 6) AS jaccard
         FROM inter
         JOIN counts ca ON ca.doc_id = doc_a
         JOIN counts cb ON cb.doc_id = doc_b
         WHERE round(ni::DOUBLE / (ca.n + cb.n - ni), 6) >= 0.3
         ORDER BY doc_a, doc_b""",
      // identical blocking (lang + 16-char prefix + length band) and
      // identical Levenshtein — the oracle replays the whole pipeline
      "dd8_fuzzy_edit" ->
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.text, b.text)::BIGINT AS edit_dist
           FROM documents a JOIN documents b
             ON a.lang = b.lang
             AND substr(a.text, 1, 16) = substr(b.text, 1, 16)
             AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 20
           WHERE levenshtein(a.text, b.text) <= 8
           ORDER BY doc_a, doc_b""",
      "dd9_dup_spans" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (SELECT doc_id,
             unnest(range(0, greatest(len(toks) - 7, 0)))::INT AS i,
             toks
           FROM d),
         g2 AS (SELECT doc_id, i,
             array_to_string(toks[i+1 : i+8], ' ') AS gram FROM g),
         dup AS (SELECT gram FROM g2
           GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
         cov AS (SELECT doc_id, count(DISTINCT pos) AS n_dup_tokens
           FROM (SELECT g2.doc_id,
               unnest(generate_series(g2.i, g2.i + 7)) AS pos
             FROM g2 JOIN dup USING (gram))
           GROUP BY doc_id)
         SELECT d.doc_id, len(d.toks)::BIGINT AS n_tokens,
           coalesce(cov.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
           round(coalesce(cov.n_dup_tokens, 0)::DOUBLE / len(d.toks), 6)
             AS dup_frac
         FROM d LEFT JOIN cov USING (doc_id)
         ORDER BY d.doc_id""",
      "dd13_chunk_dedup" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE len(string_split_regex(trim(text),
             '\s+')) > 0),
         c AS (SELECT doc_id,
             unnest(range(0, (len(toks) - 1) // 8 + 1))::INT AS ci,
             toks FROM d),
         c2 AS (SELECT doc_id, ci,
             array_to_string(toks[ci*8+1 : least(ci*8+8, len(toks))],
               ' ') AS chunk
           FROM c),
         m AS (SELECT doc_id, ci, chunk,
             row_number() OVER (PARTITION BY chunk
               ORDER BY doc_id, ci) AS rn
           FROM c2)
         SELECT doc_id,
           coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
             ORDER BY ci), '') AS text_clean,
           count(*)::BIGINT AS n_chunks,
           sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END)::BIGINT AS n_removed
         FROM m GROUP BY doc_id ORDER BY doc_id""",
      // EXACT restricted-pair-space replay of the incremental
      // admission: new docs (doc_id % 10 = 7) vs the corpus AND vs
      // earlier batch members; the same integer jaccard test
      // (13*ni >= 3*(na+nb) with the size band implied by it) — a
      // Spark-side LSH recall miss would drop a row and fail the hash
      "dd14_incremental_dedup" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]))) AS s
           FROM d),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS new_id, b.doc_id AS match_id,
             count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s
             AND a.doc_id % 10 = 7
             AND (b.doc_id % 10 <> 7 OR b.doc_id < a.doc_id)
           GROUP BY 1, 2),
         j AS (SELECT new_id, match_id FROM inter
           JOIN counts ca ON ca.doc_id = new_id
           JOIN counts cb ON cb.doc_id = match_id
           WHERE 10 * least(ca.n, cb.n) >= 3 * greatest(ca.n, cb.n)
             AND 13 * ni >= 3 * (ca.n + cb.n)),
         agg AS (SELECT new_id,
             sum(CASE WHEN match_id % 10 <> 7 THEN 1 ELSE 0 END)
               AS n_corpus,
             sum(CASE WHEN match_id % 10 <> 7 THEN match_id ELSE 0 END)
               AS corpus_key_sum,
             sum(CASE WHEN match_id % 10 = 7 THEN 1 ELSE 0 END)
               AS n_batch_prior
           FROM j GROUP BY 1)
         SELECT c.doc_id AS new_id,
           coalesce(n_corpus, 0)::BIGINT AS n_corpus,
           coalesce(corpus_key_sum, 0)::BIGINT AS corpus_key_sum,
           coalesce(n_batch_prior, 0)::BIGINT AS n_batch_prior,
           CAST(coalesce(n_corpus, 0) = 0 AND
             coalesce(n_batch_prior, 0) = 0 AS INT) AS admitted
         FROM counts c LEFT JOIN agg ON agg.new_id = c.doc_id
         WHERE c.doc_id % 10 = 7 ORDER BY new_id""",
      "tx6_chunk_windows" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE len(string_split_regex(trim(text),
             '\s+')) > 0),
         s AS (SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 48)) AS start
           FROM d)
         SELECT doc_id, start // 48 AS chunk_id,
           len(toks[start+1 : least(start+64, len(toks))])::BIGINT
             AS n_tokens,
           md5(array_to_string(
             toks[start+1 : least(start+64, len(toks))], ' '))
             AS chunk_fp
         FROM s ORDER BY doc_id, chunk_id""",
      "tx10_vocab_ids" ->
        """SELECT term, freq,
           row_number() OVER (ORDER BY freq DESC, term) - 1
             AS token_id
           FROM (SELECT term, count(*) AS freq FROM (
               SELECT unnest(string_split_regex(trim(lower(text)),
                 '\s+')) AS term FROM documents)
             GROUP BY term HAVING count(*) >= 2)
           ORDER BY token_id""",
      "tx9_tfidf" ->
        """WITH terms AS (SELECT doc_id, unnest(string_split_regex(
             trim(lower(text)), '\s+')) AS term
           FROM documents WHERE doc_id < 200),
         tf AS (SELECT doc_id, term, count(*) AS tf
           FROM terms GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM (
             SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
         tot AS (SELECT count(DISTINCT doc_id) AS n_docs FROM terms),
         scored AS (SELECT doc_id, term, tf, df,
             tf * (n_docs::DOUBLE / df) AS score
           FROM tf JOIN df USING (term) CROSS JOIN tot)
         SELECT doc_id, rank, term, tf, df,
           round(score, 6) AS tfidf_lin FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term) AS rank FROM scored)
         WHERE rank <= 3 ORDER BY doc_id, rank""",
      // tx11's oracle: the same TF-IDF pipeline over the full corpus,
      // collapsed to order-independent integer aggregates.
      "tx11_tfidf_full" ->
        """WITH terms AS (SELECT doc_id, unnest(string_split_regex(
             trim(lower(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
           FROM terms GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM (
             SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
         tot AS (SELECT count(DISTINCT doc_id) AS n_docs FROM terms),
         scored AS (SELECT doc_id, term, tf, df,
             tf * (n_docs::DOUBLE / df) AS score
           FROM tf JOIN df USING (term) CROSS JOIN tot),
         top3 AS (SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rank FROM scored)
           WHERE rank <= 3)
         SELECT count(*) AS n_rows,
           CAST(sum(tf) AS BIGINT) AS tf_sum,
           CAST(sum(df) AS BIGINT) AS df_sum,
           CAST(sum(('0x' || substr(md5(term), 1, 10))::BIGINT)
             AS BIGINT) AS term_hash_sum,
           CAST(sum(CAST(round(score * 1e6) AS BIGINT)) AS BIGINT)
             AS score_micros_sum
         FROM top3""",
      // ann2's arithmetic hyperplanes are a fixed weight pattern, so
      // the oracle recomputes the buckets (1-based list index d here
      // maps to the 0-based dim d-1 in the Spark side) and replays the
      // bucket-restricted top-k exactly.
      "ann2_lsh_ann" ->
        """WITH b AS (SELECT vec_id, embedding,
               (CASE WHEN list_sum(list_transform(
                  range(1, len(embedding)+1),
                  d -> embedding[d]::DOUBLE * ((((d-1)*1+0) % 5) - 2)))
                  > 0 THEN 1 ELSE 0 END)
           + 2*(CASE WHEN list_sum(list_transform(
                  range(1, len(embedding)+1),
                  d -> embedding[d]::DOUBLE * ((((d-1)*2+1) % 5) - 2)))
                  > 0 THEN 1 ELSE 0 END)
           + 4*(CASE WHEN list_sum(list_transform(
                  range(1, len(embedding)+1),
                  d -> embedding[d]::DOUBLE * ((((d-1)*3+2) % 5) - 2)))
                  > 0 THEN 1 ELSE 0 END)
           + 8*(CASE WHEN list_sum(list_transform(
                  range(1, len(embedding)+1),
                  d -> embedding[d]::DOUBLE * ((((d-1)*4+3) % 5) - 2)))
                  > 0 THEN 1 ELSE 0 END) AS bucket
           FROM embeddings)
         SELECT query_id, neighbor_id, cos, rank FROM (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(
               q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5) AS cos,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(
                 q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5)
                 DESC, e.vec_id) AS rank
           FROM b q JOIN b e
             ON e.bucket = q.bucket AND e.vec_id != q.vec_id
           WHERE q.vec_id < 5)
         WHERE rank <= 5 ORDER BY query_id, rank""",
      "dd3_ngram_jaccard" ->
        """WITH d AS (SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
           FROM documents WHERE doc_id < 200),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 1, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
           FROM d),
         counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS ni
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(ni::DOUBLE / (ca.n + cb.n - ni), 6) AS jaccard
         FROM inter
         JOIN counts ca ON ca.doc_id = doc_a
         JOIN counts cb ON cb.doc_id = doc_b
         WHERE round(ni::DOUBLE / (ca.n + cb.n - ni), 6) >= 0.15
         ORDER BY doc_a, doc_b""",
      "dd5_embedding_neardup" ->
        """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5)
             AS cos
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE a.vec_id < 300 AND b.vec_id < 300
             AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5)
               >= 0.4
           ORDER BY vec_a, vec_b""",
      "ann1_cosine_topk" ->
        """SELECT query_id, neighbor_id, cos, rank FROM (
             SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5)
                 AS cos,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5)
                   DESC, e.vec_id) AS rank
             FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
             WHERE q.vec_id < 5)
           WHERE rank <= 10 ORDER BY query_id, rank""",
      "mm1_binary_metadata" ->
        """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           substr(hex(encode(text)), 1, 8) AS magic_hex, source
           FROM documents ORDER BY doc_id"""
    )
  }
}
