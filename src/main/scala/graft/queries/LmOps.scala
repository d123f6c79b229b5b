package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Language-model data-pipeline operators: n-gram LM quality scoring
  * (the CCNet/Gopher-style "perplexity filter" stage), GPT-style
  * sequence packing (concatenate the corpus, chunk into fixed
  * token-budget bins), and a portable log-bucket quantile sketch
  * (HDR/DDSketch-shaped: relative-error buckets whose counts are
  * additive, so the sketch merges across partitions/days by plain
  * count addition — the property exact percentiles lack at 100 TB).
  *
  * Float discipline follows the repo rule (TrainingData.scala:35):
  * no transcendentals in compared output — probabilities stay exact
  * IEEE quotients of corpus counts, cross-row reductions are
  * fixed-point integer sums, bucket geometry is integer/power-of-two
  * arithmetic both engines compute bit-identically.
  */
object LmOps {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Tokens-per-doc estimate from the precomputed n_chars (integer
    * ceil(n/4), the ~4-chars/token heuristic) — no text scan. */
  private def tokEst: Column =
    call_function("div", col("n_chars") + lit(3L), lit(4L))

  val queries: Map[String, Q] = Map(

    // Bigram-LM quality scoring — the "train a cheap LM on the corpus,
    // score every document, filter the tail" stage of a pretraining
    // pipeline (CCNet does this with KenLM; the Spark-shaped version
    // is two count aggregations + two equi-joins, nothing sequential).
    // Add-one smoothing over the corpus vocabulary:
    //   p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
    // Each p is an exact IEEE quotient of integers; per-doc scores are
    // fixed-point nano sums (order-independent longs), so the oracle
    // replays bit-identically — no transcendentals anywhere. Scale
    // shape: the exploded bigram stream joins bigram counts on the
    // (w1,w2) key — a shuffle equi-join that partitions by bigram and
    // never collects; unigram counts (vocab-sized) broadcast.
    "tx19_bigram_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = TF.tokens(lower(col("text")))
      // guard: Spark's sequence(1, n) DESCENDS for n < 1, so 0/1-token
      // docs must short-circuit to an empty bigram list
      val bigrams = TF.bindOnce(toks)(tk =>
        when(size(tk) >= 2,
          transform(sequence(lit(1), size(tk) - 1), i =>
            struct(element_at(tk, i).as("w1"),
              element_at(tk, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
      val pairs = graft.operators.ManagedCache.persist(
        docs.select(col("doc_id"), explode(bigrams).as("b"))
          .select(col("doc_id"), col("b.w1"), col("b.w2")))
      val uni = docs
        .select(explode(toks).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = uni.agg(count(lit(1)).as("v"))
      val big = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val p = (col("c12") + lit(1L)).cast("double") /
        (col("c1") + col("v")).cast("double")
      // uni is vocab-sized: tiny here, 10^8 rows on a web corpus — no
      // broadcast hint, AQE broadcasts exactly when it actually fits
      pairs
        .join(big, Seq("w1", "w2"))
        .join(uni, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          round(p * lit(1e9)).cast("long").as("p_nano"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          call_function("div", sum(col("p_nano")), count(lit(1)))
            .as("avg_p_nano"))
        .orderBy(col("doc_id"))
    }),

    // GPT-style sequence packing: documents concatenated in (source,
    // doc_id) order, chunked into 2048-token bins; a straddling doc
    // contributes its overlap to every bin it crosses. The per-source
    // cumsum is the PrefixSum two-pass shape (range partition →
    // per-partition subtotals → narrow fold): a
    // `Window.partitionBy(source)` would sort each source's ENTIRE
    // corpus in one task — source is low-cardinality, the exact
    // single-key skew the plan guard bans. The per-source reset is
    // recovered by subtracting each source's prior-sources offset —
    // itself a PrefixSum over the #sources-row total frame (no
    // single-partition window, no driver when-chain).
    "tx20_sequence_packing" -> ((s, dir) => {
      val B = 2048L
      val spans0 = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), tokEst.as("nt"))
        .filter(col("nt") >= 1)
      val glob = graft.operators.PrefixSum.withRunningSum(
        spans0, Seq("source", "doc_id"), "nt", "gcum")
      // per-source starting offsets: prior = global running total of
      // all earlier sources' tokens (tiny frame, broadcast back)
      val srcTot = spans0.groupBy(col("source"))
        .agg(sum(col("nt")).as("st"))
      val offs = graft.operators.PrefixSum.withRunningSum(
          srcTot, Seq("source"), "st", "cum")
        .select(col("source"), (col("cum") - col("st")).as("prior"))
      val spans = glob.join(broadcast(offs), Seq("source"))
        .withColumn("end", col("gcum") - col("prior"))
        .withColumn("start", col("end") - col("nt"))
      val binned = spans
        .withColumn("bin", explode(sequence(
          call_function("div", col("start"), lit(B)),
          call_function("div", col("end") - 1, lit(B)))))
        .withColumn("overlap",
          least(col("end"), (col("bin") + 1) * B) -
            greatest(col("start"), col("bin") * B))
      binned.groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("overlap")).as("n_tokens"),
          sum(when(col("start") >= col("bin") * B &&
            col("end") <= (col("bin") + 1) * B, 1L).otherwise(0L))
            .as("n_whole_docs"))
        .orderBy(col("source"), col("bin"))
    }),

    // Portable log-bucket quantile sketch (HDR/DDSketch shape):
    // bucket = (e, 3-bit mantissa) where e = floor(log2(x)) computed
    // EXACTLY as the binary-string length (no libm), sub-bucket by an
    // exact power-of-two divide — relative error ≤ 2^-3 ≈ 6%. Bucket
    // counts are ADDITIVE (mergeable across shards/days by plain +),
    // and the quantile is the first bucket whose cumulative count
    // crosses the integer ceil-rank — every step replayable
    // bit-identically in DuckDB, unlike percentile_approx's opaque
    // internals (xs2 can only flag-check). Per-source p50/p90/p99 of
    // document length in tokens.
    "xs8_hdr_quantiles" -> ((s, dir) => {
      val x = tokEst
      val e = (length(bin(x)) - 1).cast("long")
      val shift = greatest(e - lit(3L), lit(0L))
      val denom = pow(lit(2.0), shift.cast("double")) // exact 2^k
      val sub = floor(x.cast("double") / denom).cast("long")
      val bucket = e * lit(16L) + sub
      val rep = (sub.cast("double") + lit(0.5)) * denom // exact .5 ulp
      val counts = t(s, dir, "documents")
        .select(col("source"), bucket.as("bucket"), rep.as("rep"))
        .groupBy(col("source"), col("bucket"), col("rep"))
        .agg(count(lit(1)).as("n"))
      val wcum = Window.partitionBy(col("source")).orderBy(col("bucket"))
      val wtot = Window.partitionBy(col("source"))
      def thr(pct: Int): Column =
        call_function("div", lit(pct.toLong) * col("total") + lit(99L),
          lit(100L))
      counts
        .withColumn("cum", sum(col("n")).over(wcum))
        .withColumn("total", sum(col("n")).over(wtot))
        .groupBy(col("source"))
        .agg(min(when(col("cum") >= thr(50), col("rep"))).as("p50"),
          min(when(col("cum") >= thr(90), col("rep"))).as("p90"),
          min(when(col("cum") >= thr(99), col("rep"))).as("p99"),
          max(col("total")).as("n_docs"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(
    "tx19_bigram_lm" ->
      """WITH toks AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS t
           FROM documents),
         pairs AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
           FROM toks, LATERAL (SELECT unnest(
             generate_series(1, len(t)-1)) AS i) _),
         uni AS (SELECT w1, count(*) AS c1 FROM (
             SELECT unnest(t) AS w1 FROM toks) GROUP BY 1),
         vocab AS (SELECT count(*) AS v FROM uni),
         big AS (SELECT w1, w2, count(*) AS c12
           FROM pairs GROUP BY 1, 2)
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(CAST(round(
             ((c12 + 1)::DOUBLE / (c1 + v)) * 1e9) AS BIGINT))
             AS BIGINT) // count(*) AS avg_p_nano
         FROM pairs JOIN big USING (w1, w2) JOIN uni USING (w1)
           CROSS JOIN vocab
         GROUP BY doc_id ORDER BY doc_id""",

    "tx20_sequence_packing" ->
      """WITH spans AS (SELECT source, doc_id, nt,
             CAST(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id)
               AS BIGINT) AS "end"
           FROM (SELECT source, doc_id, (n_chars + 3) // 4 AS nt
                 FROM documents)
           WHERE nt >= 1),
         binned AS (SELECT source, doc_id, nt,
             "end" - nt AS "start", "end", bin,
             LEAST("end", (bin + 1) * 2048) -
               GREATEST("end" - nt, bin * 2048) AS overlap
           FROM spans, LATERAL (SELECT unnest(generate_series(
             ("end" - nt) // 2048, ("end" - 1) // 2048)) AS bin) _)
         SELECT source, bin, count(*) AS n_docs,
           CAST(sum(overlap) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN "start" >= bin * 2048
             AND "end" <= (bin + 1) * 2048 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_whole_docs
         FROM binned GROUP BY 1, 2 ORDER BY source, bin""",

    "xs8_hdr_quantiles" ->
      """WITH b AS (SELECT source,
             CAST(length(format('{:b}', nt)) - 1 AS BIGINT) AS e, nt
           FROM (SELECT source, (n_chars + 3) // 4 AS nt
                 FROM documents)),
         bk AS (SELECT source,
             e * 16 + CAST(FLOOR(nt / power(2, GREATEST(e - 3, 0)))
               AS BIGINT) AS bucket,
             (CAST(FLOOR(nt / power(2, GREATEST(e - 3, 0))) AS BIGINT)
               ::DOUBLE + 0.5) * power(2, GREATEST(e - 3, 0)) AS rep
           FROM b),
         c AS (SELECT source, bucket, rep, count(*) AS n
           FROM bk GROUP BY 1, 2, 3),
         cum AS (SELECT source, bucket, rep, n,
             SUM(n) OVER (PARTITION BY source ORDER BY bucket) AS cum,
             SUM(n) OVER (PARTITION BY source) AS total
           FROM c)
         SELECT source,
           MIN(CASE WHEN cum >= (50 * total + 99) // 100 THEN rep END)
             AS p50,
           MIN(CASE WHEN cum >= (90 * total + 99) // 100 THEN rep END)
             AS p90,
           MIN(CASE WHEN cum >= (99 * total + 99) // 100 THEN rep END)
             AS p99,
           CAST(MAX(total) AS BIGINT) AS n_docs
         FROM cum GROUP BY source ORDER BY source"""
  )
}
