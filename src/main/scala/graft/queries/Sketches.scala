package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{MinKSketch, SimilarityFunctions => SF, TextFunctions => TF}

/** Sketch operators — the approximate structures that make 100 TB
  * queries affordable: HyperLogLog cardinality, quantile sketches,
  * and a Bloom-filter semi-join. Sketches can't be hash-compared
  * directly against an exact oracle, so each query emits the EXACT
  * answer plus a deterministic acceptance flag (estimate within
  * tolerance / zero false negatives); the oracle expects the exact
  * value and flag=1 — a drifting sketch flips the flag and fails the
  * driver's hash compare.
  *
  * The Bloom filter is built from PORTABLE md5-60 hashes (not
  * xxhash64), so the DuckDB oracle replays the full build+probe via
  * position-set semantics — bit-identical candidate sets.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Bloom bit width (16384 bits = 256 longs): sized so the sf0.01
    * urgent-custkey set (~1.3k keys, k=2) yields a small but nonzero
    * false-positive rate — both engines count the same FPs. */
  private val BloomBits = 16384

  private def bloomPos(salt: String, key: Column): Column =
    pmod(SF.md5hash60(concat(lit(salt), key.cast("string"))),
      lit(BloomBits.toLong))

  val queries: Map[String, Q] = Map(
    // HyperLogLog cardinality (DataSketches HLL): exact distinct count
    // + flag that the sketch estimate lands within 5%. At scale the
    // sketch is mergeable across partitions/days (hll_union_agg) —
    // the property countDistinct lacks.
    "xs1_hll_distinct" -> ((s, dir) => {
      t(s, dir, "orders").agg(
          countDistinct(col("o_custkey")).as("n_exact"),
          hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))
            .as("est"))
        .select(col("n_exact"),
          (abs(col("est") - col("n_exact")).cast("double") /
            col("n_exact").cast("double") <= 0.05).cast("int")
            .as("hll_ok"))
    }),

    // Quantile sketch: exact interpolated median per return flag +
    // flag that percentile_approx(accuracy=10000) is within 5% —
    // the single-pass mergeable path for 100 TB percentiles.
    "xs2_quantile_sketch" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 2)
            .as("p50_exact"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .as("p50_est"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("p50_est") - col("p50_exact")) /
            col("p50_exact") <= 0.05).cast("int").as("sketch_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Bloom-filter semi-join: build a 16384-bit filter over the
    // distinct urgent-order custkeys (k=2 portable hashes, bitset =
    // groupBy word + bit_or — map-side partial agg), broadcast it,
    // probe every customer. Emits candidate/exact/false-positive
    // counts and n_missed, which MUST be 0 (Bloom filters cannot have
    // false negatives — a miss is a bug, and the oracle pins it).
    "xs3_bloom_join" -> ((s, dir) => {
      val keys = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("key")).distinct()
      // build: one row per set bit word — 256 rows max, broadcastable
      val positions = keys.select(bloomPos("b1:", col("key")).as("pos"))
        .union(keys.select(bloomPos("b2:", col("key")).as("pos")))
      val bitset = positions
        .groupBy((col("pos") / 64).cast("long").as("word"))
        .agg(bit_or(call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int"))).as("bits"))
      val probe = t(s, dir, "customer")
        .select(col("c_custkey"),
          bloomPos("b1:", col("c_custkey")).as("h1"),
          bloomPos("b2:", col("c_custkey")).as("h2"))
      def hasBit(h: Column, word: Column, bits: Column): Column =
        word.isNotNull &&
          call_function("shiftrightunsigned", bits, pmod(h, lit(64L))
            .cast("int")).bitwiseAND(lit(1L)) === lit(1L)
      val b1 = bitset.select(col("word").as("w1"), col("bits").as("bits1"))
      val b2 = bitset.select(col("word").as("w2"), col("bits").as("bits2"))
      val tested = probe
        .join(broadcast(b1), (col("h1") / 64).cast("long") === col("w1"),
          "left")
        .join(broadcast(b2), (col("h2") / 64).cast("long") === col("w2"),
          "left")
        .select(col("c_custkey"),
          (hasBit(col("h1"), col("w1"), col("bits1")) &&
            hasBit(col("h2"), col("w2"), col("bits2"))).as("candidate"))
      val exact = keys.select(col("key").as("c_custkey"))
        .withColumn("is_exact", lit(1))
      tested.join(broadcast(exact), Seq("c_custkey"), "left")
        .agg(count(lit(1)).as("n_probed"),
          count(when(col("candidate"), 1)).as("n_candidates"),
          count(col("is_exact")).as("n_exact"),
          count(when(col("candidate") && col("is_exact").isNull, 1))
            .as("n_false_pos"),
          count(when(!col("candidate") && col("is_exact").isNotNull, 1))
            .as("n_missed"))
    }),

    // Count-Min frequency sketch: depth 2 × width 1024 counter matrix
    // from PORTABLE md5-60 hashes (one groupBy per row — map-side
    // partial agg, 1024 cells each, always broadcastable), probed with
    // est = min over rows. CMS never undercounts, and because the
    // hashes are engine-portable the DuckDB oracle replays the build
    // AND the probe — the estimates match cell for cell, not just
    // within tolerance. The 100 TB story: frequency queries over an
    // unbounded key domain in O(depth × width) memory.
    "xs5_count_min" -> ((s, dir) => {
      val keys = t(s, dir, "orders").select(col("o_custkey").as("key"))
      def cells(salt: String) = keys
        .groupBy(pmod(SF.md5hash60(concat(lit(salt),
          col("key").cast("string"))), lit(1024L)).as("b"))
        .agg(count(lit(1)).as("cnt"))
      val c1 = cells("c1:").select(col("b").as("b1"), col("cnt").as("n1"))
      val c2 = cells("c2:").select(col("b").as("b2"), col("cnt").as("n2"))
      val truth = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_true"))
      t(s, dir, "customer").filter(col("c_custkey") < 50)
        .select(col("c_custkey"),
          pmod(SF.md5hash60(concat(lit("c1:"),
            col("c_custkey").cast("string"))), lit(1024L)).as("b1"),
          pmod(SF.md5hash60(concat(lit("c2:"),
            col("c_custkey").cast("string"))), lit(1024L)).as("b2"))
        .join(broadcast(c1), Seq("b1"), "left")
        .join(broadcast(c2), Seq("b2"), "left")
        .join(truth.select(col("o_custkey").as("c_custkey"),
          col("n_true")), Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_true"), lit(0L)).as("n_true"),
          least(coalesce(col("n1"), lit(0L)),
            coalesce(col("n2"), lit(0L))).as("n_est"))
        .orderBy(col("c_custkey"))
    }),

    // Portable HyperLogLog (Flajolet et al. 2007) whose REGISTERS the
    // oracle replays exactly — upgrading xs1's tolerance-flag check to
    // a bit-exact sketch compare: md5-based 60-bit hash splits into a
    // 6-bit register index and a 54-bit tail whose rank (leading-zero
    // count + 1) both engines derive from length(bin(tail)) — integer
    // string ops, no log2 floats. The harmonic-mean denominator
    // Σ2^-M[j] is kept EXACT as the scaled integer Σ2^(55-M[j])
    // (every term a power of two ≤ 2^54, sum < 2^61 — no float
    // summation-order risk); the raw estimate divides once and rounds.
    // No small-range correction (it needs ln; V is emitted so a caller
    // can apply linear counting). Scale: one groupBy to 64·G register
    // rows, mergeable map-side like any max-aggregate — the shape that
    // replaces a 100 TB COUNT(DISTINCT) shuffle with O(64) state.
    "xs6_hll_portable" -> ((s, dir) => {
      // two scopes so the ORACLE exercises both register regimes:
      // 'all' saturates all 64 registers; 'sparse' (user_id < 30)
      // leaves most registers empty — the zero-register terms of the
      // harmonic mean are load-bearing there
      val base = t(s, dir, "events")
        .select(col("event_type"), col("user_id"))
      val e = base.withColumn("scope", lit("all"))
        .unionByName(base.filter(col("user_id") < 30)
          .withColumn("scope", lit("sparse")))
      val h = SF.md5hash60(col("user_id").cast("string"))
      val ranked = e.select(col("scope"), col("event_type"),
          pmod(h, lit(64L)).cast("int").as("j"),
          call_function("div", h, lit(64L)).as("rest"))
        .select(col("scope"), col("event_type"), col("j"),
          when(col("rest") === 0, lit(55))
            .otherwise(lit(55) - length(bin(col("rest")))).as("rnk"))
      val regs = ranked.groupBy(col("scope"), col("event_type"),
          col("j"))
        .agg(max(col("rnk")).as("mreg"))
      val sketch = regs.groupBy(col("scope"), col("event_type"))
        .agg(count(lit(1)).as("n_regs_hit"),
          sum(col("j") * col("mreg")).cast("long").as("reg_checksum"),
          sum(expr("CAST(pow(2, 55 - mreg) AS BIGINT)")).cast("long")
            .as("s_hit"))
      val exact = e.groupBy(col("scope"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      // EVERY register participates in the harmonic mean — each of
      // the 64 - hits empty registers contributes 2^-0 = 1, i.e.
      // 2^55 scaled (omitting them inflates sparse estimates ~m/hits×)
      val sFull = col("s_hit") +
        (lit(64L) - col("n_regs_hit")) * lit(36028797018963968L)
      sketch.join(exact, Seq("scope", "event_type"))
        .select(col("scope"), col("event_type"), col("n_regs_hit"),
          (lit(64L) - col("n_regs_hit")).as("v_zero"),
          col("reg_checksum"), sFull.as("s_scaled"),
          round(lit(0.709) * 4096 * 36028797018963968.0 /
            sFull.cast("double"), 3).as("est_hll"),
          col("n_exact"))
        .orderBy(col("scope"), col("event_type"))
    }),

    // K-minimum-values sketch with SET OPERATIONS (Bar-Yossef et al.
    // 2002) — the capability xs6's HLL lacks: per-language vocabulary
    // sketches (the k = 64 smallest DISTINCT md5-60 hashes of word
    // 3-shingles, via the bounded-state MinKSketch Aggregator)
    // compose into union and intersection estimates per language
    // PAIR from the sketches alone — the dataset-overlap-audit shape
    // (train/eval contamination at corpus scale). Every sketch
    // witness (k-th minima, union overlap count, integer Jaccard
    // micros) is an exact integer the oracle replays hash-for-hash;
    // the float estimates are one explicit-double divide + round-3
    // like xs6. Scale: the corpus collapses MAP-SIDE to 64-element
    // arrays per group (O(k) Aggregator state), the pair stage then
    // touches only 5 sketch rows — no second scan of the data; the
    // exact distinct/intersection columns are the test-SF comparison
    // companion, not part of the sketch path.
    "xs7_kmv_set_ops" -> ((s, dir) => {
      val k = 64
      val two60d = lit(1152921504606846976L).cast("double")
      // fanOut: the shingle explode + md5 otherwise run in the
      // single scan task (measured 1.3 s at sf0.1); no-op at scale
      val dist = graft.operators.ManagedCache.persist(
        graft.operators.Parallelism.fanOut(t(s, dir, "documents"))
          .select(col("lang"),
            explode(TF.wordShingles(col("text"), 3)).as("sh"))
          .select(col("lang"),
            SF.md5hash60(concat(lit("kmv:"), col("sh"))).as("h"))
          .distinct())
      val sk = dist.groupBy(col("lang"))
        .agg(MinKSketch(col("h"), k).as("sk"),
          count(lit(1)).as("n_exact"))
      val exactInter = dist.as("x").join(dist.as("y"),
          col("x.h") === col("y.h") && col("x.lang") < col("y.lang"))
        .groupBy(col("x.lang").as("la"), col("y.lang").as("lb"))
        .agg(count(lit(1)).as("exact_inter"))
      def kth(a: Column): Column =
        element_at(a, least(lit(k), size(a)))
      def est(a: Column): Column =
        when(size(a) < k, size(a).cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * two60d /
            element_at(a, k).cast("double"), 3))
      val pairs = sk.as("a").join(sk.as("b"),
          col("a.lang") < col("b.lang"))
        .select(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
          col("a.sk").as("ska"), col("b.sk").as("skb"),
          col("a.n_exact").as("exact_a"), col("b.n_exact").as("exact_b"))
        .withColumn("u",
          slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
        .withColumn("n_inter_k", size(filter(col("u"),
          x => array_contains(col("ska"), x) &&
            array_contains(col("skb"), x))).cast("long"))
        .withColumn("k_union", size(col("u")).cast("long"))
      pairs.join(broadcast(exactInter),
          col("lang_a") === col("la") && col("lang_b") === col("lb"),
          "left")
        .select(col("lang_a"), col("lang_b"),
          col("exact_a"), col("exact_b"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
          kth(col("ska")).as("kth_a"), kth(col("skb")).as("kth_b"),
          kth(col("u")).as("kth_union"), col("k_union"),
          col("n_inter_k"),
          call_function("div", col("n_inter_k") * 1000000L,
            col("k_union")).as("jaccard_micros"),
          est(col("ska")).as("est_a"), est(col("skb")).as("est_b"),
          est(col("u")).as("est_union"))
        .withColumn("est_inter",
          round(col("est_union") * col("n_inter_k").cast("double") /
            col("k_union").cast("double"), 3))
        .orderBy(col("lang_a"), col("lang_b"))
    }),

    // Two-pass heavy hitters: pass 1 is a Misra-Gries sketch (typed
    // Aggregator, capacity 15, O(k) memory, mergeable map-side like
    // any partial agg) whose candidate set provably SUPERSETS every
    // key with frequency > n/16; pass 2 broadcast-semi-joins the ≤15
    // candidates and counts them EXACTLY, so the output is the exact
    // heavy-hitter set regardless of sketch noise — the shape that
    // replaces a full 100 TB groupBy with one O(k) scan + one
    // filtered count. The key is a deterministically skewed domain
    // extraction (3 hot keys ≈ 10% of rows each, the rest ~0.7%).
    "xs4_heavy_hitters" -> ((s, dir) => {
      val key = when(col("user_id") % 10 < 3,
          concat(lit("hot_"), (col("user_id") % 3).cast("string")))
        .otherwise(concat(lit("u_"), col("user_id").cast("string")))
      val keyed = t(s, dir, "events").select(key.as("key"))
      val sketch = keyed.agg(
        graft.functions.MisraGries(col("key"), 15).as("mg"),
        count(lit(1)).as("n"))
      val cand = sketch.select(
        explode(map_keys(col("mg"))).as("key"), col("n"))
      keyed.join(broadcast(cand.select("key")), Seq("key"), "left_semi")
        .groupBy(col("key")).agg(count(lit(1)).as("freq"))
        .join(broadcast(cand), Seq("key"))
        .filter(col("freq").cast("double") >
          col("n").cast("double") / 16.0)
        .select(col("key"), col("freq"))
        .orderBy(col("key"))
    })
  )

  val oracle: Map[String, String] = Map(
    "xs1_hll_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_exact, 1 AS hll_ok
         FROM orders""",
    "xs2_quantile_sketch" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 2) AS p50_exact,
         1 AS sketch_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // position-set semantics ≡ the bitset: a probe key is a candidate
    // iff both its bit positions were set by some build key
    "xs3_bloom_join" ->
      """WITH k AS (SELECT DISTINCT o_custkey AS key FROM orders
           WHERE o_orderpriority = '1-URGENT'),
       pos AS (
         SELECT ('0x' || substr(md5('b1:' || CAST(key AS VARCHAR)),
           1, 15))::BIGINT % 16384 AS p FROM k
         UNION
         SELECT ('0x' || substr(md5('b2:' || CAST(key AS VARCHAR)),
           1, 15))::BIGINT % 16384 FROM k),
       c AS (SELECT c_custkey,
           ('0x' || substr(md5('b1:' || CAST(c_custkey AS VARCHAR)),
             1, 15))::BIGINT % 16384 AS h1,
           ('0x' || substr(md5('b2:' || CAST(c_custkey AS VARCHAR)),
             1, 15))::BIGINT % 16384 AS h2
         FROM customer),
       tested AS (SELECT c_custkey,
           (h1 IN (SELECT p FROM pos) AND h2 IN (SELECT p FROM pos))
             AS candidate,
           c_custkey IN (SELECT key FROM k) AS is_exact
         FROM c)
       SELECT count(*) AS n_probed,
         count(CASE WHEN candidate THEN 1 END) AS n_candidates,
         count(CASE WHEN is_exact THEN 1 END) AS n_exact,
         count(CASE WHEN candidate AND NOT is_exact THEN 1 END)
           AS n_false_pos,
         count(CASE WHEN NOT candidate AND is_exact THEN 1 END)
           AS n_missed
       FROM tested""",
    // cell-for-cell CMS replay: same salted md5-60 buckets, same
    // depth-2 min — the estimate itself must match, not a tolerance
    // registers, checksum, scaled denominator and raw estimate all
    // replayed from the same md5 hash split
    "xs6_hll_portable" ->
      """WITH e AS (SELECT 'all' AS scope, event_type, user_id
           FROM events
           UNION ALL
           SELECT 'sparse', event_type, user_id FROM events
           WHERE user_id < 30),
         r AS (SELECT scope, event_type,
           ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 64
             AS j,
           CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 15))
               ::BIGINT // 64 = 0 THEN 55
             ELSE 55 - length(bin(('0x' || substr(md5(
               user_id::VARCHAR), 1, 15))::BIGINT // 64)) END AS rnk
           FROM e),
         regs AS (SELECT scope, event_type, j, max(rnk) AS mreg
           FROM r GROUP BY 1, 2, 3),
         sk AS (SELECT scope, event_type,
             count(*) AS n_regs_hit,
             CAST(sum(j * mreg) AS BIGINT) AS reg_checksum,
             CAST(sum(CAST(pow(2, 55 - mreg) AS BIGINT)) +
               (64 - count(*)) * 36028797018963968 AS BIGINT)
               AS s_scaled
           FROM regs GROUP BY 1, 2),
         ex AS (SELECT scope, event_type,
             count(DISTINCT user_id) AS n_exact
           FROM e GROUP BY 1, 2)
         SELECT sk.scope, sk.event_type, n_regs_hit,
           64 - n_regs_hit AS v_zero,
           reg_checksum, s_scaled,
           round(0.709::DOUBLE * 4096 * 36028797018963968::DOUBLE /
             s_scaled::DOUBLE, 3) AS est_hll,
           n_exact
         FROM sk JOIN ex ON ex.event_type = sk.event_type
           AND ex.scope = sk.scope
         ORDER BY sk.scope, sk.event_type""",
    // full KMV replay: the k smallest distinct hashes per language
    // from the raw shingle set, union/intersection from list algebra —
    // every integer witness hash-compared, floats via the same
    // explicit-double divide + round(,3)
    "xs7_kmv_set_ops" ->
      """WITH d AS (SELECT lang,
           string_split_regex(trim(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
         FROM documents),
       g AS (SELECT lang, unnest(list_transform(
           range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
         FROM d),
       hs AS (SELECT DISTINCT lang,
           ('0x' || substr(md5('kmv:' || s), 1, 15))::BIGINT AS h
         FROM g),
       sk AS (SELECT lang, list_sort(list(h))[1:64] AS sk,
           count(*) AS n_exact
         FROM hs GROUP BY lang),
       ei AS (SELECT x.lang AS la, y.lang AS lb, count(*) AS ein
         FROM hs x JOIN hs y ON x.h = y.h AND x.lang < y.lang
         GROUP BY 1, 2),
       p AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
           a.sk AS ska, b.sk AS skb,
           a.n_exact AS exact_a, b.n_exact AS exact_b,
           list_sort(list_distinct(a.sk || b.sk))[1:64] AS u
         FROM sk a JOIN sk b ON a.lang < b.lang),
       p2 AS (SELECT *,
           CAST(len(list_filter(u, x -> list_contains(ska, x)
             AND list_contains(skb, x))) AS BIGINT) AS n_inter_k,
           CAST(len(u) AS BIGINT) AS k_union
         FROM p),
       p3 AS (SELECT lang_a, lang_b, exact_a, exact_b,
           ska[least(64, len(ska))] AS kth_a,
           skb[least(64, len(skb))] AS kth_b,
           u[least(64, len(u))] AS kth_union,
           k_union, n_inter_k,
           (n_inter_k * 1000000) // k_union AS jaccard_micros,
           CASE WHEN len(ska) < 64 THEN len(ska)::DOUBLE
             ELSE round(63.0 * 1152921504606846976::DOUBLE / ska[64],
               3) END AS est_a,
           CASE WHEN len(skb) < 64 THEN len(skb)::DOUBLE
             ELSE round(63.0 * 1152921504606846976::DOUBLE / skb[64],
               3) END AS est_b,
           CASE WHEN len(u) < 64 THEN len(u)::DOUBLE
             ELSE round(63.0 * 1152921504606846976::DOUBLE / u[64],
               3) END AS est_union
         FROM p2)
       SELECT lang_a, lang_b, exact_a, exact_b,
         coalesce(ein, 0) AS exact_inter,
         kth_a, kth_b, kth_union, k_union, n_inter_k, jaccard_micros,
         est_a, est_b, est_union,
         round(est_union * n_inter_k / k_union, 3) AS est_inter
       FROM p3 LEFT JOIN ei ON ei.la = lang_a AND ei.lb = lang_b
       ORDER BY lang_a, lang_b""",
    "xs5_count_min" ->
      """WITH k AS (SELECT o_custkey AS key FROM orders),
         c1 AS (SELECT ('0x' || substr(md5('c1:' ||
               CAST(key AS VARCHAR)), 1, 15))::BIGINT % 1024 AS b1,
             count(*) AS n1 FROM k GROUP BY 1),
         c2 AS (SELECT ('0x' || substr(md5('c2:' ||
               CAST(key AS VARCHAR)), 1, 15))::BIGINT % 1024 AS b2,
             count(*) AS n2 FROM k GROUP BY 1),
         tr AS (SELECT o_custkey, count(*) AS n_true FROM orders
           GROUP BY 1),
         p AS (SELECT c_custkey,
             ('0x' || substr(md5('c1:' || CAST(c_custkey AS VARCHAR)),
               1, 15))::BIGINT % 1024 AS b1,
             ('0x' || substr(md5('c2:' || CAST(c_custkey AS VARCHAR)),
               1, 15))::BIGINT % 1024 AS b2
           FROM customer WHERE c_custkey < 50)
         SELECT p.c_custkey, coalesce(tr.n_true, 0) AS n_true,
           least(coalesce(c1.n1, 0), coalesce(c2.n2, 0)) AS n_est
         FROM p LEFT JOIN c1 USING (b1) LEFT JOIN c2 USING (b2)
         LEFT JOIN tr ON tr.o_custkey = p.c_custkey
         ORDER BY p.c_custkey""",
    // exact heavy hitters — the sketch pass may only change HOW the
    // answer is found, never the answer itself
    "xs4_heavy_hitters" ->
      """WITH keyed AS (
           SELECT CASE WHEN user_id % 10 < 3
             THEN 'hot_' || CAST(user_id % 3 AS VARCHAR)
             ELSE 'u_' || CAST(user_id AS VARCHAR) END AS key
           FROM events),
         tot AS (SELECT count(*) AS n FROM keyed)
         SELECT key, count(*) AS freq
         FROM keyed, tot GROUP BY key, n
         HAVING count(*) > n / 16.0
         ORDER BY key"""
  )
}
