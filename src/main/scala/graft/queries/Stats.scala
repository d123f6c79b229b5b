package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}

/** Statistical / relationship analytics: correlation matrix,
  * chi-square independence, market-concentration indices (HHI +
  * Gini), bipartite link prediction (resource-allocation index),
  * lagged cross-correlation between event streams, and a Zipf
  * rank-frequency fit over the token distribution.
  *
  * House determinism style throughout (xq5's contract): every
  * aggregate accumulates EXACT integer (or decimal-128) moment sums
  * with map-side partial aggregation, and at most a handful of IEEE
  * double operations happen at the very end on identical exact
  * operands — so Spark and the DuckDB oracle agree bit-for-bit, with
  * no order-dependent float summation anywhere.
  */
object Stats {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** exact int64 per-row product, summed loss-free as decimal(38,0)
    * (the sf0.1 sums exceed int64; decimal-128 keeps them exact —
    * DuckDB mirrors with its automatic HUGEINT sum promotion) */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,0)"))

  val queries: Map[String, Q] = Map(

    // Pairwise Pearson correlation matrix over lineitem's four
    // numeric measures. ONE full scan computes all 15 exact moment
    // sums (4 sums + 4 sum-of-squares + 6 cross-products, all
    // map-side partial into a single row); the 6 correlations then
    // come from that row with two sqrts + one divide each — the only
    // float ops, on operands both engines derive identically from the
    // exact decimals. At 100 TB this is the textbook single-pass
    // moments pattern: no per-pair re-scan, no covariance shuffle.
    "xq17_correlation_matrix" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        round(col("l_quantity") * 100).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"),
        round(col("l_discount") * 10000).cast("long").as("d"),
        round(col("l_tax") * 10000).cast("long").as("x"))
      val vars = Seq("q", "p", "d", "x")
      val cross = for (i <- vars.indices; j <- i until vars.size)
        yield dsum(col(vars(i)) * col(vars(j)))
          .as(s"s_${vars(i)}${vars(j)}")
      val m = li.agg(count(lit(1)).as("n"),
        (vars.map(v => dsum(col(v)).as(s"s_$v")) ++ cross): _*)
      val human = Map("q" -> "quantity", "p" -> "extendedprice",
        "d" -> "discount", "x" -> "tax")
      def ss(a: String, b: String) = // cross sums stored i<=j in decl order
        if (vars.indexOf(a) <= vars.indexOf(b)) col(s"s_$a$b")
        else col(s"s_$b$a")
      def corrMicro(a: String, b: String) = {
        val num = (col("n") * ss(a, b) - col(s"s_$a") * col(s"s_$b"))
          .cast("double")
        def v(c: String) =
          (col("n") * ss(c, c) - col(s"s_$c") * col(s"s_$c")).cast("double")
        floor(num * lit(1000000.0) /
          nullif(sqrt(v(a)) * sqrt(v(b)), lit(0.0))).cast("long")
      }
      // emit the 6 unordered pairs in (col_x < col_y) name order
      val pairs = (for (i <- vars.indices; j <- (i + 1) until vars.size)
        yield (vars(i), vars(j)))
        .map { case (a, b) =>
          val (x, y) = if (human(a) < human(b)) (a, b) else (b, a)
          struct(lit(human(x)).as("col_x"), lit(human(y)).as("col_y"),
            corrMicro(x, y).as("corr_micro"))
        }
      m.select(col("n"), explode(array(pairs: _*)).as("pr"))
        .select(col("pr.col_x").as("col_x"), col("pr.col_y").as("col_y"),
          col("n"), col("pr.corr_micro").as("corr_micro"))
        .orderBy(col("col_x"), col("col_y"))
    }),

    // Chi-square test of independence: o_orderpriority ×
    // o_orderstatus contingency grid. ONE fact scan builds the
    // observed cell counts; marginals and N derive from that tiny
    // (|pri|·|status| rows) aggregate, then the full grid is a
    // broadcast cross of the two marginal frames left-joined with the
    // observed cells (absent combos count 0 but still contribute
    // their expectation). Per cell: d = N·O − R·C exact int64;
    // contribution (O−E)²/E = d²/(N·R·C) evaluated as one double
    // quotient of exact operands.
    "xq18_chi_square" -> ((s, dir) => {
      val obs = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o_n"))
      val rr = obs.groupBy(col("pri")).agg(sum(col("o_n")).cast("long").as("r_n"))
      val cc = obs.groupBy(col("st")).agg(sum(col("o_n")).cast("long").as("c_n"))
      val nn = obs.agg(sum(col("o_n")).cast("long").as("n"))
      val d = col("n") * col("n_obs") - col("r_n") * col("c_n")
      broadcast(rr).crossJoin(broadcast(cc)).crossJoin(broadcast(nn))
        .join(obs, Seq("pri", "st"), "left")
        .select(col("pri"), col("st"), col("r_n"), col("c_n"), col("n"),
          coalesce(col("o_n"), lit(0L)).as("n_obs"))
        .select(
          col("pri").as("o_orderpriority"), col("st").as("o_orderstatus"),
          col("n_obs"),
          call_function("div", col("r_n") * col("c_n") * lit(1000000L),
            col("n")).as("exp_micro"),
          floor(d.cast("double") * d.cast("double") * lit(1000000.0) /
            (col("n") * col("r_n") * col("c_n")).cast("double"))
            .cast("long").as("chi_contrib_micro"))
        .orderBy(col("o_orderpriority"), col("o_orderstatus"))
    }),

    // Market concentration per nation: supplier revenue shares →
    // Herfindahl–Hirschman index (Σ share², nano-scaled) and Gini
    // coefficient (micro-scaled). The fact table aggregates ONCE on
    // its own join key (l_suppkey) — the only fact-sized shuffle —
    // then everything else runs on the supplier dimension: broadcast
    // joins to nation, a rank window partitioned by nation (bounded:
    // |suppliers| rows total, a dimension, never fact-scale), and the
    // Gini numerator in closed form Σ(2i−n−1)xᵢ = 2Σ(i·xᵢ) − (n+1)Σxᵢ
    // so a single pass over the ranked rows suffices.
    "xq19_concentration" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("sk"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .groupBy(col("sk")).agg(sum(col("cents")).as("r"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("sk"),
          col("s_nationkey").cast("long").as("nk"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      val ranked = rev.join(broadcast(sup), Seq("sk"))
        .join(broadcast(nat), Seq("nk"))
        .withColumn("i", row_number().over(
          Window.partitionBy(col("nk")).orderBy(col("r"), col("sk"))))
      ranked.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("r")).as("s"),
          // r² overflows int64 (revenue cents squared) — widen BOTH
          // operands to decimal-128 BEFORE the multiply
          sum(col("r").cast("decimal(19,0)") *
            col("r").cast("decimal(19,0)")).as("ssq"),
          sum(col("i") * col("r")).as("six"))
        .select(col("n_name"), col("n_suppliers"),
          col("s").as("rev_total_cents"),
          floor(col("ssq").cast("double") * lit(1000000000.0) /
            (col("s").cast("double") * col("s").cast("double")))
            .cast("long").as("hhi_nano"),
          floor((lit(2L) * col("six") - (col("n_suppliers") + 1) * col("s"))
              .cast("double") * lit(1000000.0) /
            (col("n_suppliers") * col("s")).cast("double"))
            .cast("long").as("gini_micro"))
        .orderBy(col("n_name"))
    }),

    // Bipartite link prediction: rank part pairs by the
    // resource-allocation index RA(a,b) = Σ_{s ∈ Γ(a)∩Γ(b)} 1/deg(s),
    // in exact nano fixed point (10⁹ div deg). Candidate pairs come
    // from the supplier-keyed self-join of the induced subgraph — the
    // standard postings blocking, never an all-pairs product. Scoped
    // to parts < 500 (the induced-subgraph contract, like dd6's
    // doc_id < 200); xg8 below is the UNBOUNDED twin — full graph,
    // hub-degree cap on the wedge join — RA's 1/deg weight is exactly
    // why dropping super-hubs is sound (each contributes ≤ 1/cap).
    "xg5_link_prediction" -> ((s, dir) => {
      val e = t(s, dir, "lineitem").filter(col("l_partkey") < 500)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val deg = e.groupBy(col("sk")).agg(count(lit(1)).as("deg"))
      val ew = e.join(broadcast(deg), Seq("sk"))
        .withColumn("w", call_function("div", lit(1000000000L), col("deg")))
      ew.as("a").join(ew.as("b"),
          col("a.sk") === col("b.sk") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("common_suppliers"),
          sum(col("a.w")).as("ra_nano"))
        .orderBy(col("ra_nano").desc, col("part_a"), col("part_b"))
        .limit(25)
    }),

    // xg5's unbounded twin: link prediction over the FULL bipartite
    // graph, no induced-subgraph bound. The wedge center flips to the
    // PART side (supplier pairs by shared parts) because that is the
    // side whose degrees stay bounded as the corpus grows — Σ deg²
    // drives the wedge-join row count, and part degrees here are two
    // orders of magnitude below supplier degrees. The super-hub tail
    // is then capped by HotBuckets.filterOverQuantile: parts above
    // the p90 degree threshold (exact-integer discrete quantile, a
    // scale-free cut where any absolute cap would drift with SF) are
    // EXCLUDED from the wedge join and surfaced as accounting columns
    // (n_hub_parts / hub_edges_excluded / deg_cap) on every output
    // row — dropping a hub part loses ≤ 1/deg_cap of any pair's RA
    // score by construction. RA weights use the TRUE pre-cap degree.
    "xg8_link_prediction_full" -> ((s, dir) => {
      // the deduped edge list feeds four consumers (size census, true
      // degrees, both wedge sides) — left UNCACHED deliberately: the
      // subtrees are identical, so ReuseExchange collapses their
      // shuffles, which measures FASTER than a ManagedCache persist
      // that blocks the reuse (4.5 s vs 7.7 s at sf0.1)
      val e = t(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val (safe, hot, thr) =
        graft.operators.HotBuckets.filterOverQuantile(e, "pk", 9, 10)
      val deg = e.groupBy(col("pk")).agg(count(lit(1)).as("deg"))
      val ew = safe.join(broadcast(deg), Seq("pk"))
        .withColumn("w",
          call_function("div", lit(1000000000L), col("deg")))
      val pairs = ew.as("a").join(ew.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("sup_a"), col("b.sk").as("sup_b"))
        .agg(count(lit(1)).as("common_parts"),
          sum(col("a.w")).as("ra_nano"))
        .orderBy(col("ra_nano").desc, col("sup_a"), col("sup_b"))
        .limit(25)
      val acct = hot
        .agg(count(lit(1)).as("n_hub_parts"),
          coalesce(sum(col("bucket_n")), lit(0L))
            .as("hub_edges_excluded"))
        .crossJoin(broadcast(thr.select(col("cap_n").as("deg_cap"))))
      pairs.crossJoin(broadcast(acct))
    }),

    // Lagged cross-correlation between event-type daily series: for
    // every ordered type pair and every lag in −3..+3 days, the
    // Pearson correlation of (count_a(day), count_b(day + lag)) over
    // the days both series exist. The fact table shrinks FIRST to the
    // (type, day) daily census — the only fact-sized shuffle — and
    // the 7 lag shifts explode that tiny census, join on the shifted
    // day, and reduce to exact int64 moment sums per (pair, lag).
    "ts9_lag_correlation" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type").as("et"),
          call_function("div", unix_micros(col("ts")),
            lit(86400000000L)).as("day"))
        .groupBy(col("et"), col("day")).agg(count(lit(1)).as("x"))
      val a = daily
        .select(col("et").as("ta"), col("day"), col("x").as("xa"))
        .withColumn("lag", explode(array((-3 to 3).map(i =>
          lit(i.toLong)): _*)))
        .withColumn("day_b", col("day") + col("lag"))
      val b = daily.select(col("et").as("tb"), col("day").as("day_b"),
        col("x").as("xb"))
      a.join(b, Seq("day_b")).filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"), col("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
          sum(col("xa") * col("xb")).as("sxy"),
          sum(col("xa") * col("xa")).as("sxx"),
          sum(col("xb") * col("xb")).as("syy"))
        .select(col("ta"), col("tb"), col("lag"), col("n_days"),
          floor((col("n_days") * col("sxy") - col("sx") * col("sy"))
              .cast("double") * lit(1000000.0) /
            nullif(
              sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
              sqrt((col("n_days") * col("syy") - col("sy") * col("sy"))
                .cast("double")), lit(0.0)))
            .cast("long").as("corr_micro"))
        .orderBy(col("ta"), col("tb"), col("lag"))
    }),

    // Zipf rank-frequency fit over the corpus token distribution:
    // least-squares slope of log₂-floor(frequency) against
    // log₂-floor(rank) for the top-64 tokens — an INTEGER-exact Zipf
    // exponent surrogate: both logs are bit-lengths (length(bin(v))−1,
    // exact string arithmetic in both engines), and the regression is
    // xq5's exact integer moment form with a truncating integer
    // divide. The token census is the one corpus-scale aggregation;
    // the top-64 selection and the 64-row rank window ride after a
    // limit, so no corpus-wide single-partition sort exists.
    "tx24_zipf_slope" -> ((s, dir) => {
      val freq = t(s, dir, "documents")
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      val top = freq.orderBy(col("f").desc, col("tok")).limit(64)
      val pts = top
        .withColumn("rank", row_number().over(
          Window.orderBy(col("f").desc, col("tok"))))
        .select((length(bin(col("rank"))) - 1).cast("long").as("lx"),
          (length(bin(col("f"))) - 1).cast("long").as("ly"))
      val m = pts.agg(count(lit(1)).as("n"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"))
      val den = m("n") * col("sxx") - col("sx") * col("sx")
      m.select(col("n").as("n_points"),
        call_function("div",
          (col("n") * col("sxy") - col("sx") * col("sy")) * lit(1000000L),
          den).as("slope_micro"),
        call_function("div",
          (col("sy") * col("sxx") - col("sx") * col("sxy")) * lit(1000000L),
          den).as("intercept_micro"))
    }),

    // CUSUM changepoint detection per event type: the day where the
    // cumulative deviation from the series mean peaks — the classic
    // single-changepoint estimator. Denominator-cleared to exact
    // integers: C_k = n·(Σ_{d≤k} x_d) − k·S peaks exactly where
    // Σ(x−μ) does (μ = S/n), so no rational mean ever materializes.
    // The fact table reduces FIRST to the (type, day) daily census;
    // the running sum's window partitions by event_type over that
    // census — bounded by calendar days per type, never fact-sized.
    // Ties on |C| break to the earliest day via one max(struct).
    "ts10_cusum_changepoint" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type").as("et"),
          call_function("div", unix_micros(col("ts")),
            lit(86400000000L)).as("day"))
        .groupBy(col("et"), col("day")).agg(count(lit(1)).as("x"))
      val w = Window.partitionBy(col("et")).orderBy(col("day"))
      val tot = daily.groupBy(col("et"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val c = daily
        .withColumn("k", row_number().over(w))
        .withColumn("cumx", sum(col("x")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(tot), Seq("et"))
        .withColumn("cdev", col("n") * col("cumx") - col("k") * col("s"))
      c.groupBy(col("et"))
        .agg(max(col("n")).as("n_days"),
          max(struct(abs(col("cdev")).as("a"), (-col("day")).as("nd")))
            .as("pk"))
        .select(col("et").as("event_type"), col("n_days"),
          (-col("pk.nd")).as("cp_day"), col("pk.a").as("cusum_peak"))
        .orderBy(col("event_type"))
    }),

    // Holt linear-trend (double-exponential) smoothing per event
    // type, EXACT: with α = β = ½ both recurrences become integer
    // divisions — l ← (x + l + b) div 2, b ← ((l′−l) + b) div 2 — so
    // the fold is bit-replayable (DuckDB runs it as a recursive CTE).
    // The fact table shrinks FIRST to the (type, day) census; the
    // sequential recurrence then folds over each type's ordered
    // day array (bounded by calendar days — the same census-bound
    // contract as ts10), never over raw events. Emits the final
    // level/trend state and the h=7 linear forecast.
    "ts11_holt_trend" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type").as("et"),
          call_function("div", unix_micros(col("ts")),
            lit(86400000000L)).as("day"))
        .groupBy(col("et"), col("day")).agg(count(lit(1)).as("x"))
      val series = daily.groupBy(col("et"))
        .agg(count(lit(1)).as("n_days"),
          array_sort(collect_list(struct(col("day"), col("x"))))
            .as("xs"))
      // state (l, b, started): l₀ = x₀, b₀ = 0
      val folded = series.select(col("et"), col("n_days"),
        aggregate(col("xs"),
          struct(lit(0L).as("l"), lit(0L).as("b"),
            lit(false).as("started")),
          (st, e) => {
            val x = e.getField("x")
            val l2 = when(st.getField("started"),
              call_function("div",
                x + st.getField("l") + st.getField("b"), lit(2L)))
              .otherwise(x)
            val b2 = when(st.getField("started"),
              call_function("div",
                (l2 - st.getField("l")) + st.getField("b"), lit(2L)))
              .otherwise(lit(0L))
            struct(l2.as("l"), b2.as("b"), lit(true).as("started"))
          }).as("st"))
      folded.select(col("et").as("event_type"), col("n_days"),
          col("st.l").as("level"), col("st.b").as("trend"),
          (col("st.l") + lit(7L) * col("st.b")).as("forecast_7d"))
        .orderBy(col("event_type"))
    }),

    // EXACT ROC-AUC of the px8 hash-feature quality classifier
    // against an independent length-band label, via the Mann-Whitney
    // rank-sum identity AUC = U / (n₁·n₀) — computed WITHOUT ranking
    // individual documents: the corpus reduces to the per-distinct-
    // score (n_pos, n_neg) census first, the below-count prefix runs
    // over that bounded census through PrefixSum (two-pass
    // distributed prefix — no single-partition window), and ties get
    // the standard half credit, doubled into integers: U·2 =
    // Σ n₁(s)·(2·cum₀(<s) + n₀(s)). One corpus scan + one census
    // shuffle, everything after is census-sized.
    "px13_auc_exact" -> ((s, dir) => {
      // px8's exact scoring: hashed-bucket token weights, summed per
      // doc over token OCCURRENCES (docs with no tokens are out of
      // the classifier's domain, as in px8). The label rides THROUGH
      // the token explode (one byte per token row) so score and label
      // come off ONE scan + ONE doc-keyed shuffle — no second
      // documents read, no scores⋈labels join.
      val toks = t(s, dir, "documents").select(col("doc_id"),
          col("n_chars").between(200, 8000).cast("long").as("y"),
          explode(split(trim(regexp_replace(lower(col("text")),
            "[^a-z0-9]+", " ")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val bucket = pmod(SF.md5hash60(concat(lit("ft:"), col("tok"))),
        lit(1024L))
      val weight = pmod(bucket * lit(2654435761L), lit(2001L)) -
        lit(1000L)
      val lab = toks.select(col("doc_id"), col("y"), weight.as("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("w")).as("sc"), max(col("y")).as("y"))
      val g = lab.groupBy(col("sc"))
        .agg(sum(col("y")).as("n1"), sum(lit(1L) - col("y")).as("n0"))
      val c = graft.operators.PrefixSum.withRunningSum(
        g, Seq("sc"), "n0", "cum0")
      c.agg(sum(col("n1")).as("np"), sum(col("n0")).as("nn"),
          sum(col("n1") * (lit(2L) * col("cum0") - col("n0"))).as("u2"))
        .select(col("np").as("n_pos"), col("nn").as("n_neg"),
          floor(col("u2").cast("double") * lit(1000000.0) /
            (lit(2.0) * col("np").cast("double") *
              col("nn").cast("double"))).cast("long").as("auc_micro"))
    }),

    // Calibration / reliability table for the same classifier: fixed
    // 2000-wide score buckets (truncating div, both engines agree on
    // negatives), observed positive rate per bucket in integer
    // per-mille. The eval every score-thresholding curation pipeline
    // needs next to its AUC; census-sized after one corpus scan.
    "px14_calibration" -> ((s, dir) => {
      // same single-scan shape as px13: label through the explode
      val toks = t(s, dir, "documents").select(col("doc_id"),
          col("n_chars").between(200, 8000).cast("long").as("y"),
          explode(split(trim(regexp_replace(lower(col("text")),
            "[^a-z0-9]+", " ")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val bucket = pmod(SF.md5hash60(concat(lit("ft:"), col("tok"))),
        lit(1024L))
      val weight = pmod(bucket * lit(2654435761L), lit(2001L)) -
        lit(1000L)
      toks.select(col("doc_id"), col("y"), weight.as("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("w")).as("sc"), max(col("y")).as("y"))
        .groupBy(call_function("div", col("sc"), lit(2000L)).as("score_bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"))
        .select(col("score_bucket"), col("n_docs"), col("n_pos"),
          call_function("div", col("n_pos") * lit(1000L), col("n_docs"))
            .as("pos_rate_mille"))
        .orderBy(col("score_bucket"))
    })
  )

  val oracle: Map[String, String] = Map(
    "xq17_correlation_matrix" ->
      """WITH b AS (SELECT
           CAST(round(l_quantity*100) AS BIGINT) AS q,
           CAST(round(l_extendedprice*100) AS BIGINT) AS p,
           CAST(round(l_discount*10000) AS BIGINT) AS d,
           CAST(round(l_tax*10000) AS BIGINT) AS x
         FROM lineitem),
       m AS (SELECT count(*) AS n,
           sum(q) AS s_q, sum(p) AS s_p, sum(d) AS s_d, sum(x) AS s_x,
           sum(q*q) AS s_qq, sum(q*p) AS s_qp, sum(q*d) AS s_qd,
           sum(q*x) AS s_qx, sum(p*p) AS s_pp, sum(p*d) AS s_pd,
           sum(p*x) AS s_px, sum(d*d) AS s_dd, sum(d*x) AS s_dx,
           sum(x*x) AS s_xx
         FROM b)
       SELECT col_x, col_y, n, corr_micro FROM (
         SELECT 'discount' AS col_x, 'extendedprice' AS col_y, n,
           CAST(floor(CAST(n*s_pd - s_p*s_d AS DOUBLE)*1000000.0 /
             nullif(sqrt(CAST(n*s_dd - s_d*s_d AS DOUBLE)) *
                    sqrt(CAST(n*s_pp - s_p*s_p AS DOUBLE)), 0.0))
             AS BIGINT) AS corr_micro FROM m
         UNION ALL
         SELECT 'discount', 'quantity', n,
           CAST(floor(CAST(n*s_qd - s_q*s_d AS DOUBLE)*1000000.0 /
             nullif(sqrt(CAST(n*s_dd - s_d*s_d AS DOUBLE)) *
                    sqrt(CAST(n*s_qq - s_q*s_q AS DOUBLE)), 0.0))
             AS BIGINT) FROM m
         UNION ALL
         SELECT 'discount', 'tax', n,
           CAST(floor(CAST(n*s_dx - s_d*s_x AS DOUBLE)*1000000.0 /
             nullif(sqrt(CAST(n*s_dd - s_d*s_d AS DOUBLE)) *
                    sqrt(CAST(n*s_xx - s_x*s_x AS DOUBLE)), 0.0))
             AS BIGINT) FROM m
         UNION ALL
         SELECT 'extendedprice', 'quantity', n,
           CAST(floor(CAST(n*s_qp - s_q*s_p AS DOUBLE)*1000000.0 /
             nullif(sqrt(CAST(n*s_pp - s_p*s_p AS DOUBLE)) *
                    sqrt(CAST(n*s_qq - s_q*s_q AS DOUBLE)), 0.0))
             AS BIGINT) FROM m
         UNION ALL
         SELECT 'extendedprice', 'tax', n,
           CAST(floor(CAST(n*s_px - s_p*s_x AS DOUBLE)*1000000.0 /
             nullif(sqrt(CAST(n*s_pp - s_p*s_p AS DOUBLE)) *
                    sqrt(CAST(n*s_xx - s_x*s_x AS DOUBLE)), 0.0))
             AS BIGINT) FROM m
         UNION ALL
         SELECT 'quantity', 'tax', n,
           CAST(floor(CAST(n*s_qx - s_q*s_x AS DOUBLE)*1000000.0 /
             nullif(sqrt(CAST(n*s_qq - s_q*s_q AS DOUBLE)) *
                    sqrt(CAST(n*s_xx - s_x*s_x AS DOUBLE)), 0.0))
             AS BIGINT) FROM m)
       ORDER BY col_x, col_y""",

    "xq18_chi_square" ->
      """WITH obs AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
           count(*) AS o_n FROM orders GROUP BY 1, 2),
       r AS (SELECT pri, CAST(sum(o_n) AS BIGINT) AS r_n FROM obs GROUP BY 1),
       c AS (SELECT st, CAST(sum(o_n) AS BIGINT) AS c_n FROM obs GROUP BY 1),
       t AS (SELECT CAST(sum(o_n) AS BIGINT) AS n FROM obs),
       grid AS (SELECT r.pri, c.st, r.r_n, c.c_n, t.n,
           coalesce(obs.o_n, 0) AS n_obs
         FROM r CROSS JOIN c CROSS JOIN t
         LEFT JOIN obs ON obs.pri = r.pri AND obs.st = c.st)
       SELECT pri AS o_orderpriority, st AS o_orderstatus, n_obs,
         (r_n * c_n * 1000000) // n AS exp_micro,
         CAST(floor(
           CAST(n*n_obs - r_n*c_n AS DOUBLE) *
           CAST(n*n_obs - r_n*c_n AS DOUBLE) * 1000000.0 /
           CAST(n * r_n * c_n AS DOUBLE)) AS BIGINT)
           AS chi_contrib_micro
       FROM grid
       ORDER BY o_orderpriority, o_orderstatus""",

    "xq19_concentration" ->
      """WITH rev AS (SELECT l_suppkey AS sk,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
             AS BIGINT) AS r
         FROM lineitem GROUP BY 1),
       ranked AS (SELECT n_name, r,
           row_number() OVER (PARTITION BY s_nationkey
             ORDER BY r, sk) AS i
         FROM rev
         JOIN supplier ON s_suppkey = sk
         JOIN nation ON n_nationkey = s_nationkey)
       SELECT n_name, count(*) AS n_suppliers,
         CAST(sum(r) AS BIGINT) AS rev_total_cents,
         CAST(floor(CAST(sum(CAST(r AS HUGEINT)*r) AS DOUBLE) * 1000000000.0 /
           (CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE)))
           AS BIGINT) AS hhi_nano,
         CAST(floor(CAST(2*sum(i*r) - (count(*)+1)*sum(r) AS DOUBLE)
             * 1000000.0 /
           CAST(count(*)*sum(r) AS DOUBLE)) AS BIGINT) AS gini_micro
       FROM ranked GROUP BY n_name
       ORDER BY n_name""",

    "xg5_link_prediction" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
           FROM lineitem WHERE l_partkey < 500),
       deg AS (SELECT sk, count(*) AS deg FROM e GROUP BY 1),
       ew AS (SELECT e.pk, e.sk, 1000000000 // deg.deg AS w
         FROM e JOIN deg ON deg.sk = e.sk)
       SELECT a.pk AS part_a, b.pk AS part_b,
         count(*) AS common_suppliers,
         CAST(sum(a.w) AS BIGINT) AS ra_nano
       FROM ew a JOIN ew b ON a.sk = b.sk AND a.pk < b.pk
       GROUP BY 1, 2
       ORDER BY ra_nano DESC, part_a, part_b
       LIMIT 25""",

    "xg8_link_prediction_full" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
           FROM lineitem),
       deg AS (SELECT pk, count(*) AS deg FROM e GROUP BY 1),
       hist AS (SELECT deg AS bucket_n, count(*) AS n_at
         FROM deg GROUP BY 1),
       tot AS (SELECT count(*) AS n_buckets FROM deg),
       cdf AS (SELECT h.bucket_n,
           (SELECT sum(n_at) FROM hist h2
             WHERE h2.bucket_n <= h.bucket_n) AS cum
         FROM hist h),
       thr AS (SELECT min(bucket_n) AS cap_n FROM cdf, tot
         WHERE cum >= (9 * n_buckets + 9) // 10),
       hot AS (SELECT pk, deg FROM deg, thr WHERE deg > cap_n),
       acct AS (SELECT count(*) AS n_hub_parts,
           coalesce(sum(deg), 0) AS hub_edges_excluded FROM hot),
       safe AS (SELECT e.* FROM e
         WHERE pk NOT IN (SELECT pk FROM hot)),
       ew AS (SELECT s.pk, s.sk, 1000000000 // deg.deg AS w
         FROM safe s JOIN deg ON deg.pk = s.pk),
       pairs AS (SELECT a.sk AS sup_a, b.sk AS sup_b,
           count(*) AS common_parts, CAST(sum(a.w) AS BIGINT) AS ra_nano
         FROM ew a JOIN ew b ON a.pk = b.pk AND a.sk < b.sk
         GROUP BY 1, 2
         ORDER BY ra_nano DESC, sup_a, sup_b
         LIMIT 25)
       SELECT sup_a, sup_b, common_parts, ra_nano,
         CAST(n_hub_parts AS BIGINT) AS n_hub_parts,
         CAST(hub_edges_excluded AS BIGINT) AS hub_edges_excluded,
         (SELECT CAST(cap_n AS BIGINT) FROM thr) AS deg_cap
       FROM pairs, acct""",

    "ts9_lag_correlation" ->
      """WITH daily AS (SELECT event_type AS et,
           epoch_us(ts) // 86400000000 AS day, count(*) AS x
         FROM events GROUP BY 1, 2),
       lags AS (SELECT CAST(unnest(generate_series(-3, 3)) AS BIGINT)
         AS lag),
       m AS (SELECT a.et AS ta, b.et AS tb, lags.lag,
           count(*) AS n_days,
           CAST(sum(a.x) AS BIGINT) AS sx,
           CAST(sum(b.x) AS BIGINT) AS sy,
           CAST(sum(a.x*b.x) AS BIGINT) AS sxy,
           CAST(sum(a.x*a.x) AS BIGINT) AS sxx,
           CAST(sum(b.x*b.x) AS BIGINT) AS syy
         FROM daily a CROSS JOIN lags
         JOIN daily b ON b.day = a.day + lags.lag AND a.et < b.et
         GROUP BY 1, 2, 3)
       SELECT ta, tb, lag, n_days,
         CAST(floor(CAST(n_days*sxy - sx*sy AS DOUBLE) * 1000000.0 /
           nullif(sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE)) *
                  sqrt(CAST(n_days*syy - sy*sy AS DOUBLE)), 0.0))
           AS BIGINT) AS corr_micro
       FROM m ORDER BY ta, tb, lag""",

    "tx24_zipf_slope" ->
      """WITH f AS (SELECT tok, count(*) AS f FROM (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM documents)
         WHERE len(tok) > 0 GROUP BY 1),
       top AS (SELECT tok, f FROM f ORDER BY f DESC, tok LIMIT 64),
       r AS (SELECT row_number() OVER (ORDER BY f DESC, tok) AS rank,
           CAST(f AS BIGINT) AS f FROM top),
       pts AS (SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS lx,
           CAST(length(bin(f)) - 1 AS BIGINT) AS ly FROM r),
       m AS (SELECT count(*) AS n, CAST(sum(lx) AS BIGINT) AS sx,
           CAST(sum(ly) AS BIGINT) AS sy,
           CAST(sum(lx*ly) AS BIGINT) AS sxy,
           CAST(sum(lx*lx) AS BIGINT) AS sxx
         FROM pts)
       SELECT n AS n_points,
         ((n*sxy - sx*sy) * 1000000) // (n*sxx - sx*sx) AS slope_micro,
         ((sy*sxx - sx*sxy) * 1000000) // (n*sxx - sx*sx)
           AS intercept_micro
       FROM m""",

    // the α=β=½ integer recurrence replayed as a recursive CTE over
    // the row-numbered daily census (both engines truncate toward 0)
    "ts11_holt_trend" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS et,
           epoch_us(ts) // 86400000000 AS day, count(*) AS x
         FROM events GROUP BY 1, 2),
       seq AS (SELECT et, CAST(x AS BIGINT) AS x,
           CAST(row_number() OVER (PARTITION BY et ORDER BY day)
             AS BIGINT) AS k
         FROM daily),
       n AS (SELECT et, count(*) AS n_days FROM seq GROUP BY 1),
       rec AS (
         SELECT et, k, x AS l, CAST(0 AS BIGINT) AS b
         FROM seq WHERE k = 1
         UNION ALL
         SELECT s.et, s.k,
           (s.x + r.l + r.b) // 2,
           (((s.x + r.l + r.b) // 2 - r.l) + r.b) // 2
         FROM rec r JOIN seq s ON s.et = r.et AND s.k = r.k + 1)
       SELECT r.et AS event_type, n.n_days, r.l AS level,
         r.b AS trend, r.l + 7 * r.b AS forecast_7d
       FROM rec r JOIN n ON n.et = r.et AND r.k = n.n_days
       ORDER BY event_type""",

    // denominator-cleared CUSUM replay: n*cum - k*S, peak by
    // (|C| max, earliest day)
    "ts10_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type AS et,
           epoch_us(ts) // 86400000000 AS day, count(*) AS x
         FROM events GROUP BY 1, 2),
       tot AS (SELECT et, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
         FROM daily GROUP BY 1),
       c AS (SELECT daily.et, day,
           CAST(row_number() OVER w AS BIGINT) AS k,
           CAST(sum(x) OVER (PARTITION BY daily.et ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumx,
           tot.n, tot.s
         FROM daily JOIN tot ON tot.et = daily.et
         WINDOW w AS (PARTITION BY daily.et ORDER BY day)),
       dev AS (SELECT et, day, n, abs(n*cumx - k*s) AS a FROM c),
       pk AS (SELECT et, max(n) AS n_days,
           max({'a': a, 'nd': -day}) AS m
         FROM dev GROUP BY et)
       SELECT et AS event_type, n_days, -(m.nd) AS cp_day,
         CAST(m.a AS BIGINT) AS cusum_peak
       FROM pk ORDER BY event_type""",

    // px8's scoring replayed, then the rank-sum AUC over the
    // distinct-score census with a window prefix (the oracle may
    // single-partition; the engine may not)
    "px13_auc_exact" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
         FROM documents),
       sc AS (SELECT doc_id, CAST(sum(
           (('0x' || substr(md5('ft:' || tok), 1, 15))::BIGINT
             % 1024) * 2654435761 % 2001 - 1000) AS BIGINT) AS sc
         FROM toks WHERE length(tok) > 0 GROUP BY 1),
       lab AS (SELECT sc.sc,
           CASE WHEN d.n_chars BETWEEN 200 AND 8000 THEN 1 ELSE 0 END
             AS y
         FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
       g AS (SELECT sc, CAST(sum(y) AS BIGINT) AS n1,
           CAST(sum(1 - y) AS BIGINT) AS n0
         FROM lab GROUP BY sc),
       c AS (SELECT n1, n0,
           CAST(sum(n0) OVER (ORDER BY sc) AS BIGINT) AS cum0
         FROM g),
       m AS (SELECT CAST(sum(n1) AS BIGINT) AS np,
           CAST(sum(n0) AS BIGINT) AS nn,
           CAST(sum(n1 * (2*cum0 - n0)) AS BIGINT) AS u2
         FROM c)
       SELECT np AS n_pos, nn AS n_neg,
         CAST(floor(CAST(u2 AS DOUBLE) * 1000000.0 /
           (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)))
           AS BIGINT) AS auc_micro
       FROM m""",

    "px14_calibration" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
         FROM documents),
       sc AS (SELECT doc_id, CAST(sum(
           (('0x' || substr(md5('ft:' || tok), 1, 15))::BIGINT
             % 1024) * 2654435761 % 2001 - 1000) AS BIGINT) AS sc
         FROM toks WHERE length(tok) > 0 GROUP BY 1),
       lab AS (SELECT sc.sc,
           CASE WHEN d.n_chars BETWEEN 200 AND 8000 THEN 1 ELSE 0 END
             AS y
         FROM sc JOIN documents d ON d.doc_id = sc.doc_id)
       SELECT sc // 2000 AS score_bucket, count(*) AS n_docs,
         CAST(sum(y) AS BIGINT) AS n_pos,
         (CAST(sum(y) AS BIGINT) * 1000) // count(*) AS pos_rate_mille
       FROM lab GROUP BY 1 ORDER BY score_bucket"""
  )
}
