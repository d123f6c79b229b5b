package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Round-10 corpus-curation operators: duplicated-substring span
  * analysis (the exact-substring complement to MinHash/SimHash doc
  * dedup), TF-IDF keyword extraction, sketch-thresholded percentile
  * pruning, and RAG-style overlapping chunking.
  *
  * Float discipline (TrainingData.scala:35): no transcendentals in
  * compared output — IDF rides an integer N div df proxy, quantile
  * thresholds are integer bucket lower bounds, chunk geometry is pure
  * integer arithmetic.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  private def tokEst: Column =
    call_function("div", col("n_chars") + lit(3L), lit(4L))

  val queries: Map[String, Q] = Map(

    // Duplicated-substring spans (Lee et al., "Deduplicating Training
    // Data Makes Language Models Better"): a doc's near-dup score by
    // CONTENT OVERLAP, not whole-doc signature — the fraction of its
    // 8-token shingles that occur more than once in the corpus
    // (cross-doc boilerplate AND in-doc loops both count). The
    // suffix-array of the paper becomes Spark-shaped: explode
    // shingles → corpus-wide count keyed on the shingle hash → join
    // back → per-doc fraction. Both shuffles key on the shingle hash
    // / doc_id (high-cardinality); no all-pairs anywhere, so the
    // shape survives 100 TB where a suffix array over one machine's
    // memory cannot.
    "dd17_substring_spans" -> ((s, dir) => {
      val K = 8
      val toks = TF.tokens(lower(col("text")))
      val shingles = TF.bindOnce(toks)(tk =>
        when(size(tk) >= K,
          transform(sequence(lit(1), size(tk) - (K - 1)),
            i => md5(concat_ws(" ", slice(tk, i, lit(K))))))
          .otherwise(array().cast("array<string>")))
      // fanOut: the 8-token shingle explode otherwise runs in the
      // single scan task (measured 1.0 s stages at sf0.1)
      val sh = graft.operators.ManagedCache.persist(
        graft.operators.Parallelism.fanOut(t(s, dir, "documents"))
          .select(col("doc_id"), explode(shingles).as("h")))
      val counts = sh.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      sh.join(counts, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          call_function("div",
            lit(1000L) * sum(when(col("cnt") > 1, 1L).otherwise(0L)),
            count(lit(1))).as("dup_mille"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF keyword extraction — top-3 most characteristic tokens
    // per document. IDF stays integer (score = tf · (N div df): the
    // log is monotone in N/df, and ranking only needs the order, not
    // the value — no transcendentals to drift between engines).
    // Shapes: one explode + (doc, token) count, a vocab-sized df
    // aggregation (AQE broadcasts when it fits; 10^8-row web vocabs
    // shuffle — no forced hint), and the top-3 window partitions on
    // doc_id — high-cardinality, and WindowGroupLimit prunes to ≤3
    // rows per doc before the shuffle.
    "tx21_tfidf_keywords" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TF.tokens(lower(col("text")))).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"))
      val cached = graft.operators.ManagedCache.persist(tf)
      val df_ = cached.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val nd = cached.agg(countDistinct(col("doc_id")).as("nd"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("w"))
      cached.join(df_, Seq("w"))
        .crossJoin(broadcast(nd))
        .withColumn("score",
          col("tf") * call_function("div", col("nd"), col("df")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("w"), col("tf"),
          col("score"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Percentile pruning via the ADDITIVE log-bucket sketch (xs8's
    // geometry): drop each source's shortest quartile of documents.
    // The per-source p25 threshold comes from the mergeable sketch —
    // bucket counts add across shards/days, so at 100 TB yesterday's
    // sketches merge with today's by plain +, where an exact
    // percentile would re-sort the corpus. Threshold = the LOWER
    // BOUND of the first bucket whose cumulative count reaches
    // ceil(n/4) — an exact integer (sub · 2^shift; doubles represent
    // it exactly to 2^52, far past any token count), so membership
    // is a pure integer scan filter after one tiny broadcast.
    "px11_percentile_prune" -> ((s, dir) => {
      val x = tokEst
      val e = (length(bin(x)) - 1).cast("long")
      val shift = greatest(e - lit(3L), lit(0L))
      val denom = pow(lit(2.0), shift.cast("double"))
      val sub = floor(x.cast("double") / denom).cast("long")
      val bucket = e * lit(16L) + sub
      val lo = (sub.cast("double") * denom).cast("long")
      val d = t(s, dir, "documents")
      val counts = d
        .select(col("source"), bucket.as("bucket"), lo.as("lo"))
        .groupBy(col("source"), col("bucket"), col("lo"))
        .agg(count(lit(1)).as("n"))
      val wcum = Window.partitionBy(col("source")).orderBy(col("bucket"))
      val wtot = Window.partitionBy(col("source"))
      val thr = counts
        .withColumn("cum", sum(col("n")).over(wcum))
        .withColumn("total", sum(col("n")).over(wtot))
        .groupBy(col("source"))
        .agg(min(when(col("cum") >= call_function("div",
            lit(25L) * col("total") + lit(99L), lit(100L)),
          col("lo"))).as("thr_lo"),
          max(col("total")).as("n_total"))
      d.select(col("source"), x.as("nt"))
        .join(broadcast(thr), Seq("source"))
        .groupBy(col("source"))
        .agg(max(col("thr_lo")).as("thr_lo"),
          max(col("n_total")).as("n_total"),
          sum(when(col("nt") >= col("thr_lo"), 1L).otherwise(0L))
            .as("n_kept"))
        .orderBy(col("source"))
    }),

    // Cross-source duplication matrix — which source pairs ship the
    // same content (licensing leakage, double-counting in mixture
    // weights). Keyed on the LEADING-SHINGLE fingerprint (first 8
    // tokens): exact-whole-doc overlap misses the near-dup mass that
    // actually leaks between crawls (same opening boilerplate,
    // diverging tails), and the opening span is the highest-signal
    // single shingle. Per fingerprint, the DISTINCT source set —
    // bounded by #sources, so collect_set is O(1) per key — then one
    // pair-explode of those tiny sets. Never a doc×doc join: the
    // hash aggregation is the only corpus-sized shuffle.
    "dd18_cross_source_overlap" -> ((s, dir) => {
      val perHash = t(s, dir, "documents")
        .select(md5(concat_ws(" ",
          slice(TF.tokens(trim(lower(col("text")))), 1, 8))).as("h"),
          col("source"))
        .groupBy(col("h"))
        .agg(array_sort(collect_set(col("source"))).as("srcs"),
          count(lit(1)).as("n_copies"))
        .filter(size(col("srcs")) >= 2)
      perHash
        .select(col("h"), col("n_copies"),
          explode(col("srcs")).as("src_a"), col("srcs"))
        .select(col("h"), col("n_copies"), col("src_a"),
          explode(col("srcs")).as("src_b"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared_hashes"),
          sum(col("n_copies")).as("n_copies_total"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Per-source vocabulary census — the data-card lexical-diversity
    // block: token volume, distinct types, hapax legomena (frequency-
    // 1 types: the long tail that inflates embedding tables), and
    // exact per-mille type/token + hapax/type ratios. Two keyed
    // aggregations, map-side partial combine on both.
    "tx23_vocab_census" -> ((s, dir) => {
      val wc = t(s, dir, "documents")
        .select(col("source"),
          explode(TF.tokens(lower(col("text")))).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c"))
      wc.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          call_function("div", lit(1000L) * col("n_types"),
            col("n_tokens")).as("ttr_mille"),
          call_function("div", lit(1000L) * col("n_hapax"),
            col("n_types")).as("hapax_mille"))
        .orderBy(col("source"))
    }),

    // Snapshot version diff — the change-data-feed a versioned table
    // gives for free: full-outer join of two versions on the key,
    // classify added / removed / changed / unchanged, emit the
    // census. Here the two versions derive deterministically from the
    // documents table (v1 = doc_id % 10 < 9; v2 drops the %7==0 docs
    // and doubles the %5==0 lengths) so the oracle replays them; in
    // production both sides are Snapshots.read(dir, v). One keyed
    // full-outer shuffle — the minimal cost of any exact diff.
    "k9_snapshot_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val v1 = d.filter(pmod(col("doc_id"), lit(10L)) < 9)
        .select(col("doc_id"), col("n_chars").as("v1_chars"))
      val v2 = d.filter(pmod(col("doc_id"), lit(10L)) < 9 &&
          pmod(col("doc_id"), lit(7L)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(5L)) === 0,
            col("n_chars") * 2).otherwise(col("n_chars"))
            .as("v2_chars"))
      v1.join(v2, Seq("doc_id"), "full")
        .select(when(col("v1_chars").isNull, "added")
          .when(col("v2_chars").isNull, "removed")
          .when(col("v1_chars") =!= col("v2_chars"), "changed")
          .otherwise("unchanged").as("op"))
        .groupBy(col("op")).agg(count(lit(1)).as("n"))
        .orderBy(col("op"))
    }),

    // Per-user event-type co-occurrence (basket analysis): which
    // behaviors travel together, with integer per-mille lift. The
    // per-user DISTINCT type set is bounded by #types, so the pair
    // explode is O(#types²) per user — never a row-level self-join;
    // the support aggregation is the only corpus-sized shuffle.
    "xq15_cooccurrence" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sets = e.groupBy(col("user_id"))
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
      val nUsers = sets.agg(count(lit(1)).as("n_users"))
      val singles = graft.operators.ManagedCache.persist(
        sets.select(col("user_id"), explode(col("types")).as("a"))
          .groupBy(col("a")).agg(count(lit(1)).as("n_a")))
      val pairs = sets
        .select(col("user_id"), explode(col("types")).as("a"),
          col("types"))
        .select(col("user_id"), col("a"),
          explode(col("types")).as("b"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      // lift·1000 = 1000·n_ab·N / (n_a·n_b), exact integer div
      pairs
        .join(broadcast(singles), Seq("a"))
        .join(broadcast(singles.select(col("a").as("b"),
          col("n_a").as("n_b"))), Seq("b"))
        .crossJoin(broadcast(nUsers))
        .select(col("a"), col("b"), col("n_ab"),
          call_function("div",
            lit(1000L) * col("n_ab") * col("n_users"),
            col("n_a") * col("n_b")).as("lift_mille"))
        .orderBy(col("a"), col("b"))
    }),

    // Period-over-period deltas — the WoW/MoM movement block on every
    // BI dashboard: weekly event counts and cents per type, each with
    // its previous-week value and an exact per-mille delta. The lag
    // window runs over the POST-AGG (type, week) frame — bounded by
    // #types × #weeks, the plan-guard-sanctioned shape — never the
    // raw events.
    "ts8_period_over_period" -> ((s, dir) => {
      val weekUs = 7L * 86400L * 1000000L
      val weekly = t(s, dir, "events")
        .groupBy(col("event_type"),
          call_function("div", unix_micros(col("ts")), lit(weekUs))
            .as("week"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
      // a shrinking week makes the numerator NEGATIVE — verified both
      // engines truncate integer division toward zero (Spark div and
      // DuckDB //: -7//2 = -3 in both), so plain div IS the parity
      weekly
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("delta_mille", when(col("prev_n").isNotNull,
          call_function("div",
            lit(1000L) * (col("n") - col("prev_n")), col("prev_n"))))
        .select(col("event_type"), col("week"), col("n"),
          col("cents"), col("prev_n"), col("delta_mille"))
        .orderBy(col("event_type"), col("week"))
    }),

    // Train/val/test splitting with a LEAKAGE census — the eval-split
    // step every pretraining run needs done right. Two assignment
    // policies side by side: NAIVE (salted doc_id hash, 80/10/10 —
    // near-dups scatter across splits and leak eval into train) vs
    // GROUP-AWARE (hash the content FINGERPRINT instead, so every doc
    // sharing an opening shingle lands in one split — leakage zero BY
    // CONSTRUCTION). Emits per-(source, split) counts under both
    // policies plus the global leaky-fingerprint counts; membership
    // is a pure scan expression either way — the corpus is never
    // shuffled for assignment, only for the tiny censuses.
    "px12_train_val_split" -> ((s, dir) => {
      import graft.functions.{SimilarityFunctions => SF}
      def bucket(salt: String, key: Column): Column = pmod(
        SF.md5hash60(concat(lit(salt), key.cast("string"))), lit(100L))
      def splitOf(h: Column): Column = when(h < 80, lit("train"))
        .when(h < 90, lit("val")).otherwise(lit("test"))
      val fp = md5(concat_ws(" ",
        slice(TF.tokens(trim(lower(col("text")))), 1, 8)))
      val a = graft.operators.ManagedCache.persist(
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), fp.as("fp"))
          .withColumn("naive_split",
            splitOf(bucket("split:", col("doc_id"))))
          .withColumn("group_split",
            splitOf(bucket("gsplit:", col("fp")))))
      val cn = a.groupBy(col("source"), col("naive_split").as("split"))
        .agg(count(lit(1)).as("n_naive"))
      val cg = a.groupBy(col("source"), col("group_split").as("split"))
        .agg(count(lit(1)).as("n_group"))
      def leak(splitCol: String, out: String) = a
        .groupBy(col("fp"))
        .agg(countDistinct(col(splitCol)).as("ns"))
        .filter(col("ns") >= 2)
        .agg(count(lit(1)).as(out))
      cn.join(cg, Seq("source", "split"), "full")
        .select(col("source"), col("split"),
          coalesce(col("n_naive"), lit(0L)).as("n_naive"),
          coalesce(col("n_group"), lit(0L)).as("n_group"))
        .crossJoin(broadcast(leak("naive_split", "leak_naive")))
        .crossJoin(broadcast(leak("group_split", "leak_group")))
        .orderBy(col("source"), col("split"))
    }),

    // ANN recall evaluation — the number that justifies shipping the
    // LSH path: per query, how much of the EXACT cosine top-5 the
    // bucket-restricted search recovers. Joins the two result sets
    // (both already oracle-checked as ann1/ann2) on (query, neighbor)
    // and emits integer recall per-mille. Both sides broadcast the
    // 5-query frame; the corpus is scanned, never self-joined.
    "ann7_recall_eval" -> ((s, dir) => {
      import graft.functions.{SimilarityFunctions => SF}
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      def top5(scored: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("neighbor_id"))
      }
      val exact = top5(e.join(broadcast(q),
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(SF.cosine(col("qv"), col("embedding")), 5).as("cos")))
      val bucketed = e.select(col("vec_id"), col("embedding"),
        SF.arithmeticHyperplaneBucket(col("embedding"), 4).as("bucket"))
      val qb = bucketed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("bucket").as("qbucket"))
      val lsh = top5(bucketed.join(broadcast(qb),
          col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(SF.cosine(col("qv"), col("embedding")), 5).as("cos")))
      exact.join(lsh.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("query_id"), col("n_hits"),
          (col("n_hits") * 200L).as("recall_mille"))
        .orderBy(col("query_id"))
    }),

    // RAG-style overlapping chunking: 32-token windows advancing by a
    // 24-token stride (8-token overlap keeps context across chunk
    // boundaries); the final chunk may be short, and every token is
    // covered. Chunk geometry is pure integer arithmetic off the
    // token array — a per-row explode, NO shuffle before the output
    // sort, so at 100 TB this fuses into whatever scan reads the
    // text. Emits each chunk's first token as the slice witness.
    "tx22_chunk_overlap" -> ((s, dir) => {
      val C = 32L
      val S = 24L
      val toks = TF.tokens(lower(col("text")))
      val withN = t(s, dir, "documents")
        .select(col("doc_id"), toks.as("tk"))
        .withColumn("nt", size(col("tk")).cast("long"))
        .filter(col("nt") >= 1)
      val lastIdx = when(col("nt") <= C, lit(0L))
        .otherwise(call_function("div",
          col("nt") - C + S - 1, lit(S)))
      withN
        .withColumn("i", explode(sequence(lit(0L), lastIdx)))
        .select(col("doc_id"), col("i").as("chunk_idx"),
          (col("i") * S).as("tok_start"),
          least(col("nt"), col("i") * S + C).as("tok_end"),
          element_at(col("tk"), (col("i") * S + 1).cast("int"))
            .as("first_tok"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    })
  )

  val oracle: Map[String, String] = Map(
    "dd17_substring_spans" ->
      """WITH toks AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS t
           FROM documents),
         sh AS (SELECT doc_id,
             md5(array_to_string(t[i:i+7], ' ')) AS h
           FROM toks, LATERAL (SELECT unnest(
             generate_series(1, len(t) - 7)) AS i) _),
         c AS (SELECT h, count(*) AS cnt FROM sh GROUP BY 1)
         SELECT doc_id, count(*) AS n_shingles,
           CAST((1000 * sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END))
             // count(*) AS BIGINT) AS dup_mille
         FROM sh JOIN c USING (h)
         GROUP BY doc_id ORDER BY doc_id""",

    "tx21_tfidf_keywords" ->
      """WITH tf AS (SELECT doc_id, w, count(*) AS tf FROM (
             SELECT doc_id, unnest(
               string_split_regex(trim(lower(text)), '\s+')) AS w
             FROM documents) GROUP BY 1, 2),
         df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
         scored AS (SELECT doc_id, w, tf,
             CAST(tf * (nd // df) AS BIGINT) AS score
           FROM tf JOIN df USING (w) CROSS JOIN n)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, w, tf, score FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, w) AS rk FROM scored)
         WHERE rk <= 3 ORDER BY doc_id, rk""",

    "px11_percentile_prune" ->
      """WITH b AS (SELECT source, nt,
             CAST(length(format('{:b}', nt)) - 1 AS BIGINT) AS e
           FROM (SELECT source, (n_chars + 3) // 4 AS nt
                 FROM documents)),
         bk AS (SELECT source, nt,
             e * 16 + CAST(FLOOR(nt / power(2, GREATEST(e - 3, 0)))
               AS BIGINT) AS bucket,
             CAST(CAST(FLOOR(nt / power(2, GREATEST(e - 3, 0)))
                 AS BIGINT) * power(2, GREATEST(e - 3, 0)) AS BIGINT)
               AS lo
           FROM b),
         c AS (SELECT source, bucket, lo, count(*) AS n
           FROM bk GROUP BY 1, 2, 3),
         cum AS (SELECT source, bucket, lo, n,
             SUM(n) OVER (PARTITION BY source ORDER BY bucket) AS cum,
             SUM(n) OVER (PARTITION BY source) AS total
           FROM c),
         thr AS (SELECT source,
             MIN(CASE WHEN cum >= (25 * total + 99) // 100
               THEN lo END) AS thr_lo,
             CAST(MAX(total) AS BIGINT) AS n_total
           FROM cum GROUP BY source)
         SELECT source, thr_lo, n_total,
           CAST(sum(CASE WHEN nt >= thr_lo THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept
         FROM bk JOIN thr USING (source)
         GROUP BY source, thr_lo, n_total ORDER BY source""",

    "k9_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, n_chars AS v1_chars
           FROM documents WHERE doc_id % 10 < 9),
         v2 AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN n_chars * 2
               ELSE n_chars END AS v2_chars
           FROM documents
           WHERE doc_id % 10 < 9 AND doc_id % 7 != 0)
         SELECT op, count(*) AS n FROM (
           SELECT CASE WHEN v1_chars IS NULL THEN 'added'
             WHEN v2_chars IS NULL THEN 'removed'
             WHEN v1_chars != v2_chars THEN 'changed'
             ELSE 'unchanged' END AS op
           FROM v1 FULL JOIN v2 USING (doc_id))
         GROUP BY op ORDER BY op""",

    "xq15_cooccurrence" ->
      """WITH sets AS (SELECT user_id,
             list_sort(list_distinct(list(event_type))) AS types
           FROM events GROUP BY 1),
         nu AS (SELECT count(*) AS n_users FROM sets),
         singles AS (SELECT a, count(*) AS n_a FROM (
             SELECT user_id, unnest(types) AS a FROM sets)
           GROUP BY 1),
         pairs AS (SELECT a, b, count(*) AS n_ab FROM (
             SELECT user_id, a, b FROM (
               SELECT user_id, types, a FROM sets,
                 LATERAL (SELECT unnest(types) AS a) _a),
               LATERAL (SELECT unnest(types) AS b) _b
             WHERE a < b)
           GROUP BY 1, 2)
         SELECT pairs.a AS a, pairs.b AS b, n_ab,
           CAST((1000 * n_ab * n_users) //
             (sa.n_a * sb.n_a) AS BIGINT) AS lift_mille
         FROM pairs
           JOIN singles sa ON pairs.a = sa.a
           JOIN singles sb ON pairs.b = sb.a
           CROSS JOIN nu
         ORDER BY 1, 2""",

    "ts8_period_over_period" ->
      """WITH weekly AS (SELECT event_type,
             epoch_us(ts) // 604800000000 AS week,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
           FROM events GROUP BY 1, 2)
         SELECT event_type, week, n, cents,
           lag(n, 1) OVER w AS prev_n,
           CASE WHEN lag(n, 1) OVER w IS NOT NULL THEN
             CAST((1000 * (n - lag(n, 1) OVER w)) //
               lag(n, 1) OVER w AS BIGINT) END AS delta_mille
         FROM weekly
         WINDOW w AS (PARTITION BY event_type ORDER BY week)
         ORDER BY event_type, week""",

    "px12_train_val_split" ->
      """WITH d AS (SELECT doc_id, source,
             md5(array_to_string(
               (string_split_regex(trim(lower(text)), '\s+'))[1:8],
               ' ')) AS fp
           FROM documents),
         a AS (SELECT doc_id, source, fp,
             CASE WHEN ('0x' || substr(md5('split:' ||
                 CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80
               THEN 'train'
               WHEN ('0x' || substr(md5('split:' ||
                 CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
               THEN 'val' ELSE 'test' END AS naive_split,
             CASE WHEN ('0x' || substr(md5('gsplit:' || fp), 1, 15))
                 ::BIGINT % 100 < 80 THEN 'train'
               WHEN ('0x' || substr(md5('gsplit:' || fp), 1, 15))
                 ::BIGINT % 100 < 90 THEN 'val'
               ELSE 'test' END AS group_split
           FROM d),
         cn AS (SELECT source, naive_split AS split,
             count(*) AS n_naive FROM a GROUP BY 1, 2),
         cg AS (SELECT source, group_split AS split,
             count(*) AS n_group FROM a GROUP BY 1, 2),
         ln AS (SELECT count(*) AS leak_naive FROM (
           SELECT fp FROM a GROUP BY fp
           HAVING count(DISTINCT naive_split) >= 2)),
         lg AS (SELECT count(*) AS leak_group FROM (
           SELECT fp FROM a GROUP BY fp
           HAVING count(DISTINCT group_split) >= 2))
         SELECT source, split,
           COALESCE(n_naive, 0) AS n_naive,
           COALESCE(n_group, 0) AS n_group,
           leak_naive, leak_group
         FROM cn FULL JOIN cg USING (source, split)
           CROSS JOIN ln CROSS JOIN lg
         ORDER BY source, split""",

    "ann7_recall_eval" ->
      """WITH exact AS (SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5)
                   DESC, e.vec_id) AS rank
             FROM embeddings q JOIN embeddings e
               ON e.vec_id != q.vec_id
             WHERE q.vec_id < 5)
           WHERE rank <= 5),
         b AS (SELECT vec_id, embedding,
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
           FROM embeddings),
         lsh AS (SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5)
                   DESC, e.vec_id) AS rank
             FROM b q JOIN b e
               ON e.bucket = q.bucket AND e.vec_id != q.vec_id
             WHERE q.vec_id < 5)
           WHERE rank <= 5)
         SELECT exact.query_id,
           CAST(sum(CASE WHEN lsh.neighbor_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(200 * sum(CASE WHEN lsh.neighbor_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS recall_mille
         FROM exact LEFT JOIN lsh USING (query_id, neighbor_id)
         GROUP BY exact.query_id ORDER BY query_id""",

    "dd18_cross_source_overlap" ->
      """WITH ph AS (SELECT md5(array_to_string(
             (string_split_regex(trim(lower(text)), '\s+'))[1:8],
             ' ')) AS h,
             list_sort(list_distinct(list(source))) AS srcs,
             count(*) AS n_copies
           FROM documents GROUP BY 1
           HAVING len(list_distinct(list(source))) >= 2),
         pairs AS (SELECT h, n_copies, a AS src_a, b AS src_b
           FROM ph,
             LATERAL (SELECT unnest(srcs) AS a) _a,
             LATERAL (SELECT unnest(srcs) AS b) _b
           WHERE a < b)
         SELECT src_a, src_b, count(*) AS n_shared_hashes,
           CAST(sum(n_copies) AS BIGINT) AS n_copies_total
         FROM pairs GROUP BY 1, 2 ORDER BY src_a, src_b""",

    "tx23_vocab_census" ->
      """WITH wc AS (SELECT source, w, count(*) AS c FROM (
             SELECT source, unnest(
               string_split_regex(trim(lower(text)), '\s+')) AS w
             FROM documents) GROUP BY 1, 2)
         SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST((1000 * count(*)) // sum(c) AS BIGINT) AS ttr_mille,
           CAST((1000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))
             // count(*) AS BIGINT) AS hapax_mille
         FROM wc GROUP BY source ORDER BY source""",

    "tx22_chunk_overlap" ->
      """WITH d AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS t
           FROM documents),
         n AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS nt
           FROM d WHERE len(t) >= 1),
         ch AS (SELECT doc_id, t, nt, i
           FROM n, LATERAL (SELECT unnest(generate_series(0,
             CASE WHEN nt <= 32 THEN 0
               ELSE (nt - 32 + 24 - 1) // 24 END)) AS i) _)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * 24 AS BIGINT) AS tok_start,
           CAST(LEAST(nt, i * 24 + 32) AS BIGINT) AS tok_end,
           t[CAST(i * 24 + 1 AS BIGINT)] AS first_tok
         FROM ch ORDER BY doc_id, chunk_idx"""
  )
}
