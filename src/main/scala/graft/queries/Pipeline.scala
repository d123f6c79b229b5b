package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}
import graft.operators.ConnectedComponents

/** Training-data pipeline composites (round 5): the steps BETWEEN the
  * primitive operators that a 100 TB preprocessing run actually
  * chains — dedup-cluster closure, deterministic sampling,
  * anonymization, corpus statistics, and the staged filter funnel.
  *
  * Scale design:
  *  - dd6 turns pair lists into the cluster drop-list with iterative
  *    min-label propagation (one shuffle per round, rounds = component
  *    diameter — tiny for near-dup families).
  *  - Sampling is HASH-based, never rand(): reproducible across
  *    retries, engines, and partitionings, and embarrassingly parallel
  *    (a pure filter — no shuffle at all for sx1).
  *  - The funnel (px2) is ONE scan with conditional aggregates, not
  *    one pass per stage.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Shared normalized-token shingle postings (doc_id, sh). */
  private def postings(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(TF.wordShingles(col("text"), n)).as("sh"))

  /** 60-bit engine-portable hash of a salted key — the sampling committee:
    * any engine with md5() recomputes membership bit-for-bit. */
  private def sampleHash(salt: String, key: org.apache.spark.sql.Column) =
    SF.md5hash60(concat(lit(salt), key.cast("string")))

  val queries: Map[String, Q] = Map(
    // Dedup-cluster closure: exact 2-gram-Jaccard near-dup pairs
    // (dd2/dd3's criterion) closed into connected components, keeper =
    // min doc_id per component. THIS is the artifact a dedup pipeline
    // applies — pair lists aren't transitive; the closure is.
    "dd6_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      val p = postings(docs, 2)
      val counts = p.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val edges = p.as("a").join(p.as("b"),
          col("a.sh") === col("b.sh") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .agg(count(lit(1)).as("ni"))
        .join(counts.select(col("doc_id").as("src"), col("n").as("na")),
          Seq("src"))
        .join(counts.select(col("doc_id").as("dst"), col("n").as("nb")),
          Seq("dst"))
        .filter(round(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"), 6) >= 0.3)
        .select(col("src"), col("dst"))
      ConnectedComponents
        .dedupClusters(docs.select(col("doc_id").as("id")), edges)
        .orderBy(col("doc_id"))
    }),

    // Deterministic stratified sampling: per-language keep rates via a
    // salted 60-bit hash mod 100 — a pure filter (no shuffle), fully
    // reproducible, and the oracle recomputes membership exactly.
    "sx1_stratified_sample" -> ((s, dir) => {
      val rate = when(col("lang") === "en", lit(10L)).otherwise(lit(50L))
      t(s, dir, "documents")
        .filter(pmod(sampleHash("sample:", col("doc_id")), lit(100L)) < rate)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Fixed-size per-stratum sample: deterministic top-20 per language
    // by (hash, doc_id) — the "exactly k per stratum" variant; one
    // shuffle on lang, per-partition top-k.
    "sx2_stratum_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h"), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("h", sampleHash("strat:", col("doc_id")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    }),

    // Data mixing toward a TARGET distribution — the step after
    // sampling in a pretraining pipeline: rebalance the corpus to
    // equal language shares at a 60% token budget. Per-language
    // acceptance rates are integer per-mille computed from the
    // (tiny, broadcast) language census — rate = min(1000,
    // (3000·N) div (25·n_l)), i.e. budget·share/n_l in exact integer
    // arithmetic — and membership is the sx1 salted-hash filter: the
    // corpus itself is never shuffled, only scanned. Over-represented
    // languages are downsampled toward the target; languages below
    // their share pass whole (rate capped at 1000). The oracle
    // replays census, rates and membership exactly.
    "sx3_data_mixing" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      val total = d.agg(count(lit(1)).as("n_total"))
      val rates = counts.crossJoin(broadcast(total))
        .select(col("lang"), col("n_l"),
          least(lit(1000L), call_function("div",
            lit(3000L) * col("n_total"), lit(25L) * col("n_l")))
            .as("rate_mille"))
      val sampled = d.join(broadcast(rates), Seq("lang"))
        .filter(pmod(sampleHash("mix:", col("doc_id")), lit(1000L)) <
          col("rate_mille"))
      sampled.groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
        .join(rates, Seq("lang"))
        .select(col("lang"), col("n_l"), col("rate_mille"),
          col("n_sampled"))
        .orderBy(col("lang"))
    }),

    // Corpus token-length histogram (64-token buckets) — the length
    // distribution every data card reports; map-side partial agg on a
    // tiny key space.
    "tx7_token_histogram" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(floor(TF.tokenCount(col("text")) / lit(64)).as("bucket"),
          TF.tokenCount(col("text")).as("nt"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), min(col("nt")).as("min_tokens"),
          max(col("nt")).as("max_tokens"))
        .orderBy(col("bucket"))
    }),

    // Sequence packing (concatenate-and-split): assign every doc a
    // (pack_id, offset) in fixed 2048-token training packs, in a
    // deterministic hash order. The running token total comes from
    // operators.PrefixSum — a two-pass distributed prefix sum (range
    // partition → per-partition subtotals → broadcast offsets), NOT a
    // partition-less window, which would serialize 100 TB through one
    // task. Result is provably independent of partition boundaries.
    "px4_pack_sequences" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.PrefixSum
        .withRunningSum(d, Seq("h", "doc_id"), "n_tokens", "cum")
        .select(col("doc_id"), col("n_tokens"),
          expr("(cum - n_tokens) div 2048").as("pack_id"),
          expr("(cum - n_tokens) % 2048").as("pack_offset"))
        .orderBy(col("doc_id"))
    }),

    // PII detection (px1's masking sibling): per-doc counts of
    // email / phone / IPv4 / URL matches — pure regexp_count Column
    // algebra, one scan, no shuffle before the output sort; at 100 TB
    // this fuses into whatever scan already reads the text. The
    // corpus is synthetic and PII-free (checked), so each doc plants
    // a deterministic fixture set keyed on doc_id (mod-3/4/5/7
    // schedule) — the oracle replays the planting AND the regexes,
    // so a drifting pattern or count semantics breaks the hash.
    // Patterns avoid lookaround so Java and RE2-style engines count
    // identical non-overlapping matches.
    "px5_pii_detect" -> ((s, dir) => {
      val did = col("doc_id")
      val body = concat_ws(" ",
        substring(col("text"), 1, 80),
        when(pmod(did, lit(3)) === 0, concat(lit("user"),
          did.cast("string"), lit("@example.com"))),
        when(pmod(did, lit(4)) === 0, concat(lit("+1-555-"),
          lpad(pmod(did, lit(10000)).cast("string"), 4, "0"))),
        when(pmod(did, lit(5)) === 0, concat(lit("10."),
          pmod(did, lit(256)).cast("string"), lit(".0.1"))),
        when(pmod(did, lit(7)) === 0, concat(lit("https://ex.org/d"),
          did.cast("string"))))
      t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), body.as("body"))
        .select(col("doc_id"),
          regexp_count(col("body"),
            lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"))
            .cast("long").as("n_email"),
          regexp_count(col("body"), lit("\\+1-555-[0-9]{4}"))
            .cast("long").as("n_phone"),
          regexp_count(col("body"),
            lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"))
            .cast("long").as("n_ipv4"),
          regexp_count(col("body"), lit("https://[a-z0-9./]+"))
            .cast("long").as("n_url"))
        .withColumn("has_pii",
          (col("n_email") + col("n_phone") + col("n_ipv4") +
            col("n_url") > 0).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-wide BOILERPLATE removal (C4 / RefinedWeb): a 5-token
    // chunk that appears in >= 3 DISTINCT documents is template text
    // (nav bars, license headers, cookie banners) and is dropped from
    // EVERY document — unlike dd13's first-occurrence-keeps exact
    // dedup, boilerplate keeps no copy at all. Scale shape: the chunk
    // DF table is corpus-sized (NOT broadcastable at 100 TB), so
    // membership is an equi-join on the chunk key — the same key the
    // DF aggregation just shuffled on, so the exchange is reused —
    // then one keyed shuffle on doc_id reassembles survivors in chunk
    // order. Chunks materialize once (tracked persist) for both the
    // DF side and the probe side.
    "px6_boilerplate_removal" -> ((s, dir) => {
      graft.operators.Boilerplate
        .remove(t(s, dir, "documents"), n = 5, minDf = 3)
        .orderBy(col("doc_id"))
    }),

    // fastText-style linear quality classifier (the CCNet/LLaMA
    // corpus-filter shape): hashed bag-of-words features — token →
    // 60-bit portable hash → 1024 buckets — scored against a
    // deterministic integer weight vector (weight = mixed bucket id,
    // so the oracle derives it arithmetically; a real model would
    // broadcast learned weights the same way). Everything is integer:
    // score = Σ_occurrences w[bucket(tok)]; accept = score > 0. ONE
    // shuffle (the per-doc agg); the hash + weight lookup is per-row
    // Column algebra — at 100 TB this is a pure scan-side filter.
    "px8_quality_classifier" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(trim(regexp_replace(
          lower(col("text")), "[^a-z0-9]+", " ")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val bucket = pmod(SF.md5hash60(concat(lit("ft:"), col("tok"))),
        lit(1024L))
      val weight = pmod(bucket * lit(2654435761L), lit(2001L)) -
        lit(1000L)
      toks.select(col("doc_id"), weight.as("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
        .withColumn("accept", (col("score") > 0).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // Curation-pipeline capstone: the four stages a pretraining run
    // chains — language gate, quality gate (token-count band), exact
    // dedup (first occurrence per normalized-text hash), and the
    // deterministic 50% sample — COMPOSED INTO ONE PLAN. Both gates
    // and the hash fuse into the single scan; dedup is one hash-agg
    // shuffle + a keyed join back; the sample is a pure filter; the
    // final census is a tiny agg. The point at 100 TB: stages chain
    // without materializing between them, and the scan happens ONCE.
    "px9_curation_pipeline" -> ((s, dir) => {
      val gated = t(s, dir, "documents")
        .filter(col("lang").isin("en", "de"))
        .withColumn("nt", TF.tokenCount(col("text")))
        .filter(col("nt") >= 10 && col("nt") <= 5000)
        .withColumn("h", SF.md5hash60(lower(trim(col("text")))))
      val keepers = gated.groupBy(col("h"))
        .agg(min(col("doc_id")).as("doc_id"))
      gated.join(keepers, Seq("h", "doc_id"))
        .filter(pmod(sampleHash("cur:", col("doc_id")), lit(100L))
          < 50)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .orderBy(col("lang"), col("source"))
    }),

    // URL canonicalization + dedup census — the crawl-side dedup a
    // web corpus runs BEFORE content dedup: lowercase scheme/host,
    // strip default ports (:80 http / :443 https), strip trailing
    // slashes, drop utm_* tracking params, sort surviving params.
    // URLs are synthesized in-plan (4 variants per site, 3 of which
    // canonicalize together) since the corpus has no URL column; the
    // canonicalizer itself is the real operator — pure per-row
    // Column algebra fused into the scan, census keyed on the
    // canonical string (ONE shuffle).
    "dd16_url_canonical" -> ((s, dir) => {
      val k = call_function("div", col("doc_id"), lit(4L))
      val v = pmod(col("doc_id"), lit(4L))
      val base = concat(lit("site"), k, lit(".example.com"))
      val url =
        when(v === 0, concat(lit("http://"), base, lit("/p/"), k))
          .when(v === 1, concat(lit("HTTP://"), upper(base),
            lit(":80/p/"), k))
          .when(v === 2, concat(lit("http://"), base, lit("/p/"), k,
            lit("/")))
          .otherwise(concat(lit("http://"), base, lit(":80/p/"), k,
            lit("?utm_source=feed&b=2&a=1")))
      val u = t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
      val scheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
      val hostport = lower(regexp_extract(col("url"),
        "^[A-Za-z]+://([^/?]+)", 1))
      val host =
        when(scheme === "http", regexp_replace(hostport, ":80$", ""))
          .when(scheme === "https",
            regexp_replace(hostport, ":443$", ""))
          .otherwise(hostport)
      val path = regexp_replace(regexp_extract(col("url"),
        "^[A-Za-z]+://[^/?]+([^?]*)", 1), "/+$", "")
      val q = regexp_extract(col("url"), "\\?(.*)$", 1)
      val params = filter(split(q, "&"),
        p => !p.startsWith("utm_") && p =!= "")
      val sortedQ = array_join(array_sort(params), "&")
      val canon = concat(scheme, lit("://"), host, path,
        when(sortedQ === "", lit(""))
          .otherwise(concat(lit("?"), sortedQ)))
      u.select(col("doc_id"), canon.as("canonical_url"))
        .groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_urls"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("canonical_url"))
    }),

    // Benchmark decontamination: flag training docs whose 5-gram
    // overlap with the eval set (here: doc_id < 10 as the stand-in
    // benchmark) exceeds 50%. The eval gram set is tiny relative to
    // the corpus — BROADCAST it; the train side then needs no shuffle
    // until the per-doc count, which is keyed on doc_id (the scan
    // key). At 100 TB: identical plan, eval grams stay < a few MB.
    "px3_decontaminate" -> ((s, dir) => {
      val grams = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TF.wordShingles(col("text"), 5)).as("gram"))
      val evalGrams = grams.filter(col("doc_id") < 10)
        .select(col("gram")).distinct().withColumn("hit", lit(1))
      grams.filter(col("doc_id") >= 10)
        .join(broadcast(evalGrams), Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit").cast("double") /
            col("n_grams").cast("double"), 6).as("contamination"),
          (col("n_hit").cast("double") / col("n_grams").cast("double")
            >= 0.5).cast("int").as("flagged"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition/quality rules (Rae et al. 2021 §A1.1
    // family): mean word length, distinct-token fraction, top-token
    // dominance — pure per-row Column algebra (the token array is
    // bound ONCE; the nested frequency count runs inside codegen, no
    // UDF, no shuffle until the final sort).
    "tx8_quality_rules" -> ((s, dir) => {
      val m = TF.bindOnce(TF.tokens(col("text"))) { toks =>
        val nt = size(toks).cast("double")
        val meanLen = round(
          aggregate(toks, lit(0), (a, x) => a + length(x))
            .cast("double") / nt, 6)
        val distinctFrac = round(
          size(array_distinct(toks)).cast("double") / nt, 6)
        val topFrac = round(
          array_max(transform(array_distinct(toks),
            tk => size(filter(toks, x => x === tk))))
            .cast("double") / nt, 6)
        struct(size(toks).as("nt"), meanLen.as("mean_word_len"),
          distinctFrac.as("distinct_frac"), topFrac.as("top_token_frac"))
      }
      t(s, dir, "documents").withColumn("m", m)
        .select(col("doc_id"), col("m.nt").as("n_tokens"),
          col("m.mean_word_len"), col("m.distinct_frac"),
          col("m.top_token_frac"),
          (col("m.distinct_frac") < 0.35).cast("int").as("repetitive"),
          (col("m.top_token_frac") > 0.15).cast("int").as("dominated"),
          (col("m.mean_word_len") < 4.0).cast("int").as("short_words"))
        .orderBy(col("doc_id"))
    }),

    // REAL WAV header round-trip: build canonical PCM RIFF headers
    // in-plan from table values (binary concat + little-endian
    // encode), then parse them back with the real header decoder —
    // field-for-field. The oracle computes the same fields straight
    // from the table, so a decode bug anywhere (offsets, endianness,
    // magic checks, duration math) breaks the hash compare.
    "mm2_wav_metadata" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val ch = (lit(1) + pmod(col("doc_id"), lit(2))).cast("long")
      val rate = (lit(8000) + pmod(col("doc_id"), lit(5)) * 4000)
        .cast("long")
      val bits = lit(16L)
      val payload = Multimodal.wavHeader(ch, rate, bits, col("n_chars"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.wavMeta(payload).as("m"))
        .select(col("doc_id"), col("m.audio_format"), col("m.channels"),
          col("m.sample_rate"), col("m.bits_per_sample"),
          col("m.data_bytes"), col("m.duration_ms"))
        .orderBy(col("doc_id"))
    }),

    // REAL PCM sample decode round-trip (the full-decode audio
    // sibling of mm2): synthesize mono 16-bit WAVs whose data chunks
    // encode a known signed waveform, run the ACTUAL byte-level
    // decoder (wavPcm16 — LE pair assembly + two's complement), and
    // aggregate audio features: peak amplitude, signed sum, energy
    // (sum of squares) and integer-milli RMS. The oracle replays the
    // waveform formula arithmetically, so a bug in the synth writer,
    // the LE assembly, the sign conversion, or the aggregates breaks
    // the hash compare. Zero shuffles before the output sort: decode
    // and features are per-row Column algebra.
    "mm9_wav_pcm" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = (lit(64) + pmod(col("doc_id"), lit(64))).cast("long")
      val payload = Multimodal.wavPcm16Synth(col("doc_id"), n, lit(8000L))
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"),
          Multimodal.wavPcm16(payload).as("sm"))
        .select(col("media_id"),
          size(col("sm")).cast("long").as("n_samples"),
          array_max(transform(col("sm"), x => abs(x))).as("peak"),
          aggregate(col("sm"), lit(0L), (a, x) => a + x).as("sum_val"),
          aggregate(col("sm"), lit(0L), (a, x) => a + x * x).as("sum_sq"))
        .withColumn("rms_milli",
          floor(sqrt(col("sum_sq").cast("double") / col("n_samples")) *
            1000).cast("long"))
        .orderBy(col("media_id"))
    }),

    // REAL JPEG marker-segment walk (ITU T.81 — the big-endian
    // marker/length family, after RIFF-LE and GIF sub-blocks):
    // synthesize structurally-real JPEG header streams with a
    // VARIABLE-length COM segment, walk them with the real decoder
    // (jpegMeta), and emit segment count, SOF kind, geometry and the
    // consumed-byte offset. The oracle replays every field
    // arithmetically — a mis-stepped offset, a missed standalone
    // marker or swapped height/width (SOF stores HEIGHT first)
    // breaks the hash.
    "mm10_jpeg_metadata" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val h = lit(100) + pmod(col("doc_id"), lit(400))
      val w = lit(64) + pmod(col("doc_id"), lit(256))
      val comLen = lit(10) + pmod(col("doc_id"), lit(20))
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.jpegSynth(h, w, comLen).as("payload"))
      Multimodal.jpegMeta(media).orderBy(col("doc_id"))
    }),

    // REAL PNG chunk-table walk: synthesize structurally-real PNG
    // streams in-plan (variable IDAT count + per-doc geometry, so the
    // offset accumulation is exercised, not a fixed layout), walk
    // them with the real chunk parser. The oracle replays every field
    // arithmetically from the synthesis parameters.
    "mm11_png_chunks" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val w = lit(16) + pmod(col("doc_id"), lit(1000))
      val h = lit(16) + pmod(col("doc_id"), lit(700))
      val nIdat = lit(1) + pmod(col("doc_id"), lit(5))
      val idatLen = lit(20) + pmod(col("doc_id"), lit(40))
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.pngSynth(w, h, nIdat, idatLen).as("payload"))
      Multimodal.pngMeta(media).orderBy(col("doc_id"))
    }),

    // REAL POSIX-ustar tar walk (the WebDataset training-shard
    // container): synthesize spec-valid ustar shards in-plan
    // (variable entry count, directory entries, per-entry sizes, and
    // a REAL header checksum computed in Column algebra), then walk
    // them with the real JVM parser. chksum_ok pins the TWO
    // independent checksum computations (in-plan synthesis byte sum
    // vs walker byte sum) against each other; the oracle replays
    // names, sizes and the 512-block offset arithmetic.
    "mm12_tar_entries" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = (lit(1) + pmod(col("doc_id"), lit(4))).cast("int")
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.tarShard(n,
            i => concat(lit("doc"), col("doc_id"), lit("/"),
              i.cast("string"), lit(".txt")),
            i => pmod(col("doc_id") * 31 + i * 97, lit(1200)),
            i => when(pmod(i, lit(3)) === 0, lit("5"))
              .otherwise(lit("0"))).as("payload"))
      Multimodal.tarEntries(media)
        .orderBy(col("doc_id"), col("entry_index"))
    }),

    // REAL ZIP central-directory walk (PKWARE APPNOTE): synthesize
    // spec-valid STORED zips in-plan (variable entry count/sizes,
    // true LE local offsets folded in-plan, real EOCD), walk them
    // with the real parser — EOCD backward discovery, central
    // records, local-header signature probes. The oracle replays
    // names, sizes, the mixed CRC field, and the offset prefix sums.
    "mm13_zip_entries" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = lit(1) + pmod(col("doc_id"), lit(5))
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.zipShard(n,
            i => lit(10L) + pmod(col("doc_id") + i, lit(4)) * 5L)
            .as("payload"))
      Multimodal.zipEntries(media)
        .orderBy(col("doc_id"), col("entry_index"))
    }),

    // REAL TIFF 6.0 multi-page IFD-chain walk: synthesize chained
    // little-endian IFDs in-plan, walk them with the real parser
    // (in-band byte-order dispatch, tag scan, next-IFD chain). The
    // oracle replays page count, geometry and the 54-byte offset
    // chain arithmetically.
    "mm14_tiff_pages" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = lit(1) + pmod(col("doc_id"), lit(3))
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.tiffMulti(n,
            i => lit(100) + pmod(col("doc_id"), lit(50)) + i,
            i => lit(80) + i * 2).as("payload"))
      Multimodal.tiffPages(media)
        .orderBy(col("doc_id"), col("page_index"))
    }),

    // REAL ISO-BMFF (MP4) box-tree walk: synthesize ftyp+moov(mvhd+
    // n×trak(tkhd))+mdat in-plan (exact v0 box layouts, BE), walk it
    // back with the real recursive-descent parser — DFS indexes,
    // depths, offsets, sizes, mvhd timescale/duration. The oracle
    // replays the tree as pure offset arithmetic on (nTraks, mdatLen).
    "mm15_mp4_boxes" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = lit(1) + pmod(col("doc_id"), lit(3))
      val dur = (lit(1000) + pmod(col("doc_id"), lit(500))).cast("long")
      val mlen = (lit(16) + pmod(col("doc_id"), lit(32))).cast("long")
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.mp4Shard(n, lit(600L), dur, mlen).as("payload"))
      Multimodal.mp4Boxes(media)
        .orderBy(col("doc_id"), col("box_index"))
    }),

    // REAL FLAC metadata-block walk — TENTH byte-layout family, the
    // first with sub-byte BIT-PACKED fields: 20-bit sample rate,
    // 3-bit channels, 5-bit depth and a 36-bit sample count unpacked
    // across byte boundaries from STREAMINFO, plus the padding-block
    // chain and last-flag semantics. Synthesis packs the same fields
    // with explicit integer shifts; the oracle replays the block
    // table as closed-form doc_id arithmetic.
    "mm18_flac_blocks" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val sr = (lit(8000L) + pmod(col("doc_id"), lit(8)) * 4000L)
      val ch = lit(1) + pmod(col("doc_id"), lit(2))
      val tot = lit(100000L) + col("doc_id")
      val nPad = pmod(col("doc_id"), lit(3))
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.flacShard(sr, ch, lit(16), tot, nPad).as("payload"))
      Multimodal.flacBlocks(media)
        .orderBy(col("doc_id"), col("block_index"))
    }),

    // Magic-byte format dispatch over a MIXED media lake: five
    // different containers synthesized per doc (GIF/WAV/MP4/EBML/
    // garbage), routed by the pure-Column sniffer — the pre-walker
    // step that fans a heterogeneous blob column out to per-format
    // pipelines without decoding anything. The census is a tiny agg
    // after a scan-side expression; the oracle replays the dispatch
    // as closed-form doc_id arithmetic.
    "mm17_format_sniff" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val payload = when(pmod(col("doc_id"), lit(5)) === 0,
          Multimodal.gifHeader(lit(100L), lit(50L), lit(128L)))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          Multimodal.wavHeader(lit(1), lit(8000), lit(16), lit(64)))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          Multimodal.mp4Shard(lit(1), lit(600L), lit(1000L), lit(16L)))
        .when(pmod(col("doc_id"), lit(5)) === 3,
          Multimodal.ebmlShard(lit(1), lit(1000000L)))
        .otherwise(substring(md5(col("doc_id").cast("string")), 1, 16)
          .cast("binary"))
      t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(Multimodal.sniffFormat(payload).as("format"))
        .groupBy(col("format")).agg(count(lit(1)).as("n_blobs"))
        .orderBy(col("format"))
    }),

    // Mixed-media lake capstone: sniffFormat COMPOSED with the
    // per-format walkers in one plan. A heterogeneous blob column
    // (five container families synthesized per doc, full corpus) is
    // routed by the magic-byte sniffer, each family fans out to its
    // REAL walker/meta extractor — gifMeta + wavMeta scalar reads,
    // mp4Boxes + ebmlElements tree walks, byte-length for the
    // unroutable rest — and the per-family metadata tables collapse
    // to a (format, n_blobs, n_units, val_sum) census the oracle
    // replays as closed-form doc_id arithmetic. This is the lake
    // ingest shape at 100 TB: one scan, scan-side dispatch, walkers
    // only touch their own family's bytes, and the union of censuses
    // is five 1-row aggregates.
    "mm19_media_lake" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val d5 = pmod(col("doc_id"), lit(5))
      val payload = when(d5 === 0, Multimodal.gifHeader(
          (lit(100) + pmod(col("doc_id"), lit(900))).cast("long"),
          (lit(50) + pmod(col("doc_id"), lit(500))).cast("long"),
          (lit(128) + pmod(col("doc_id"), lit(8))).cast("long")))
        .when(d5 === 1, Multimodal.wavHeader(
          lit(1) + pmod(col("doc_id"), lit(2)),
          lit(8000) + pmod(col("doc_id"), lit(8)) * 4000, lit(16),
          lit(64) + pmod(col("doc_id"), lit(100)) * 2))
        .when(d5 === 2, Multimodal.mp4Shard(
          (lit(1) + pmod(col("doc_id"), lit(3))).cast("int"),
          lit(600L), (lit(1000) + pmod(col("doc_id"), lit(500)))
            .cast("long"), lit(16L)))
        .when(d5 === 3, Multimodal.ebmlShard(
          (lit(1) + pmod(col("doc_id"), lit(3))).cast("int"),
          (lit(1000000) + pmod(col("doc_id"), lit(1000))).cast("long")))
        .otherwise(substring(md5(col("doc_id").cast("string")), 1, 16)
          .cast("binary"))
      // persisted: five family branches read this frame — without the
      // tracked persist each branch re-runs the documents scan AND the
      // payload synthesis when-chain over the full corpus (5× the
      // dominant cost at lake scale); with it the scan+synthesis runs
      // once and the branches read the materialized (doc_id, payload,
      // format) table, which is the staged-ingest shape the comment
      // above describes
      val media = graft.operators.ManagedCache.persist(
        t(s, dir, "documents")
          .select(col("doc_id"), payload.as("payload"))
          .withColumn("format", Multimodal.sniffFormat(col("payload"))))
      def one(name: String, nBlobs: org.apache.spark.sql.Column,
          nUnits: org.apache.spark.sql.Column,
          valSum: org.apache.spark.sql.Column,
          src: DataFrame): DataFrame =
        src.agg(nBlobs.as("n_blobs"),
            coalesce(nUnits, lit(0L)).as("n_units"),
            coalesce(valSum, lit(0L)).as("val_sum"))
          .select(lit(name).as("format"), col("n_blobs"),
            col("n_units"), col("val_sum"))
      val gif = media.filter(col("format") === "gif")
        .select(Multimodal.gifMeta(col("payload")).as("m"))
      val wav = media.filter(col("format") === "wav")
        .select(Multimodal.wavMeta(col("payload")).as("m"))
      val mp4 = Multimodal.mp4Boxes(media.filter(col("format") === "mp4")
        .select(col("doc_id"), col("payload")))
      val ebml = Multimodal.ebmlElements(
        media.filter(col("format") === "ebml")
          .select(col("doc_id"), col("payload")))
      val unk = media.filter(col("format") === "unknown")
      one("gif", count(lit(1)), count(lit(1)).cast("long"),
          sum(col("m.width") * col("m.height")), gif)
        .unionAll(one("wav", count(lit(1)), count(lit(1)).cast("long"),
          sum(col("m.data_bytes")), wav))
        .unionAll(one("mp4", countDistinct(col("doc_id")),
          count(lit(1)).cast("long"), sum(col("box_size")), mp4))
        .unionAll(one("ebml", countDistinct(col("doc_id")),
          count(lit(1)).cast("long"), sum(col("data_size")), ebml))
        .unionAll(one("unknown", count(lit(1)),
          count(lit(1)).cast("long"),
          sum(octet_length(col("payload")).cast("long")), unk))
        .orderBy(col("format"))
    }),

    // REAL EBML (Matroska/WebM) element-tree walk — ninth byte-layout
    // family, the only varint-framed one: marker-bit VINT ids/sizes
    // (1-, 2-, 3- and 4-byte ids, 1- and 2-byte sizes all exercised),
    // DFS through master elements, TimestampScale/TrackNumber values
    // surfaced. Synthesis is pure Column algebra; the oracle replays
    // the element tree as closed-form offset arithmetic in (n, ts).
    "mm16_ebml_elements" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = lit(1) + pmod(col("doc_id"), lit(3))
      val ts = (lit(1000000) + pmod(col("doc_id"), lit(1000)))
        .cast("long")
      val media = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.ebmlShard(n, ts).as("payload"))
      Multimodal.ebmlElements(media)
        .orderBy(col("doc_id"), col("elem_index"))
    }),

    // REAL GIF header round-trip (the image sibling of mm2): build
    // GIF89a logical-screen descriptors in-plan, parse them back with
    // the real decoder — version, LE dimensions, packed
    // global-color-table byte. Oracle recomputes the fields from the
    // table directly.
    "mm3_gif_metadata" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val w = (lit(100) + pmod(col("doc_id"), lit(900))).cast("long")
      val h = (lit(50) + pmod(col("doc_id"), lit(500))).cast("long")
      val packed = (lit(128) + pmod(col("doc_id"), lit(8))).cast("long")
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.gifMeta(Multimodal.gifHeader(w, h, packed)).as("m"))
        .select(col("doc_id"), col("m.version"), col("m.width"),
          col("m.height"), col("m.has_gct"), col("m.gct_colors"))
        .orderBy(col("doc_id"))
    }),

    // REAL pixel round-trip (the full-decode sibling of mm2/mm3):
    // synthesize REAL uncompressed 24-bit BMPs in pure Column algebra
    // (bmpGray — BMP has no compression, so a spec-exact file is a
    // binary concat), then run the ACTUAL pixel path: ImageIO
    // BufferedImage decode + deterministic nearest-neighbour resize
    // (8x6 -> 4x3), emitting thumb dims + pixel sum. The oracle
    // recomputes the expected NN-sampled pixels arithmetically, so a
    // bug anywhere in the BMP writer, the decoder, the fit-box
    // geometry, or the NN sampling breaks the hash compare.
    "mm4_thumbnail_pixels" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val media = t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id").as("media_id"), lit("image").as("kind"),
          Multimodal.bmpGray(8, 6, (x, y) =>
            col("doc_id") * 7 + x * 13 + y * 29).as("payload"),
          lit("bmp://synth").as("source_uri"))
      Multimodal.thumbnailImages(media, 4, 4, realDecoder = true)
        .select(col("media_id"), col("thumb.width").as("width"),
          col("thumb.height").as("height"),
          col("thumb.pixel_sum").as("pixel_sum"))
        .orderBy(col("media_id"))
    }),

    // REAL multi-frame demux round-trip (the video-container sibling
    // of mm4): synthesize spec-valid ANIMATED GIFs in pure Column
    // algebra — header + per-frame image descriptors + LZW-coded
    // sub-blocks + trailer — then demux them back with the ACTUAL
    // block walker (gifFrameTable) and aggregate per media. The
    // oracle recomputes frame counts/geometry/payload sizes
    // arithmetically, so a bug in either the container writer or the
    // walker's block arithmetic (GCT skip, sub-block chains,
    // extension skip) breaks the hash compare.
    "mm5_gif_frames" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val w = lit(4) + pmod(col("doc_id"), lit(16))
      val h = lit(3) + pmod(col("doc_id"), lit(8))
      val n = lit(1) + pmod(col("doc_id"), lit(5))
      val media = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
          Multimodal.gifAnimated(w, h, n,
            i => lit(1) + pmod(col("doc_id") * 3 + i * 7, lit(200)))
            .as("payload"),
          lit("gif://synth").as("source_uri"))
      Multimodal.gifFrameTable(media)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          max(col("width")).as("width"),
          max(col("height")).as("height"),
          sum(col("data_bytes")).as("data_bytes_sum"))
        .orderBy(col("media_id"))
    }),

    // FULL pixel decode round-trip (closes the demux→decode gap mm5
    // left): synthesize animated GIFs whose frames carry a VALID
    // byte-aligned LZW code stream encoding a known pixel formula
    // (gifAnimatedPixels — min code 7 makes every code one byte),
    // then run the ACTUAL demux + LZW decoder (gifFramePixels) and
    // emit per-frame pixel statistics, including a position-weighted
    // sum that breaks if the decoder reorders, drops, or duplicates
    // a single pixel. The oracle recomputes all three stats
    // arithmetically from the formula. Synthesis i is 1-based; the
    // walker's frame_index is 0-based.
    "mm6_gif_pixels" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val w = lit(3) + pmod(col("doc_id"), lit(10))
      val h = lit(2) + pmod(col("doc_id"), lit(7))
      val n = lit(1) + pmod(col("doc_id"), lit(4))
      val media = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
          Multimodal.gifAnimatedPixels(w, h, n,
            (i, p) => col("doc_id") * 5 + i * 11 + p * 3).as("payload"),
          lit("gif://synth").as("source_uri"))
      Multimodal.gifFramePixels(media)
        .select(col("media_id"), col("frame_index"), col("width"),
          col("height"), col("n_pixels"), col("px_sum"), col("px_wsum"))
        .orderBy(col("media_id"), col("frame_index"))
    }),

    // REAL video-container demux round-trip (the AVI sibling of mm5,
    // reusing the RIFF machinery wavMeta established): synthesize
    // spec-valid AVI containers in Column algebra — RIFF tree, hdrl
    // avih header, movi chunk list with even-offset padding — then
    // demux with the ACTUAL recursive RIFF walker. Absolute chunk
    // offsets are part of the output, so a single mis-sized or
    // mis-padded chunk anywhere desynchronizes every later offset and
    // breaks the hash compare. The oracle replays the offset
    // arithmetic with a window prefix-sum over frame lengths.
    "mm7_avi_frames" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val w = lit(16) + pmod(col("doc_id"), lit(32))
      val h = lit(9) + pmod(col("doc_id"), lit(16))
      val n = lit(1) + pmod(col("doc_id"), lit(4))
      val media = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
          Multimodal.aviContainer(w, h, n, lit(33333),
            i => lit(1) + pmod(col("doc_id") * 3 + i * 7, lit(50)))
            .as("payload"),
          lit("avi://synth").as("source_uri"))
      Multimodal.aviFrameTable(media)
        .select(col("media_id"), col("frame_index"), col("stream_id"),
          col("chunk_type"), col("offset"), col("size"),
          col("avi_width"), col("avi_height"))
        .orderBy(col("media_id"), col("frame_index"))
    }),

    // FULL video-frame pixel decode (the MJPEG-shaped slice that needs
    // no codec library): synthesize AVI containers whose 00dc chunks
    // are REAL BMP images (aviContainerWith composing bmpGray), then
    // run the ACTUAL demux + per-frame ImageIO decode (aviFramePixels)
    // and emit decoded dims + 24-bit RGB pixel sums. The oracle
    // recomputes the sums arithmetically, so a bug in the container
    // writer, the chunk walk, the byte slicing, OR the raster decode
    // breaks the hash compare. Synthesis i is 1-based.
    "mm8_avi_frame_pixels" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val n = lit(1) + pmod(col("doc_id"), lit(3))
      val media = t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
          Multimodal.aviContainerWith(lit(8), lit(6), n, lit(33333),
            i => Multimodal.bmpGray(8, 6, (x, y) =>
              col("doc_id") * 7 + x * 13 + y * 29 + i * 11))
            .as("payload"),
          lit("avi://bmp").as("source_uri"))
      Multimodal.aviFramePixels(media)
        .select(col("media_id"), col("frame_index"), col("chunk_type"),
          col("img_width"), col("img_height"), col("pixel_sum"))
        .orderBy(col("media_id"), col("frame_index"))
    }),

    // Deterministic anonymization: format-preserving digit masking +
    // salted-hash pseudonym token + value banding. Pure per-row Column
    // algebra — no shuffle, codegen throughout.
    "px1_pii_mask" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
          md5(concat(lit("pseudo:"), col("c_name"))).as("name_token"),
          floor(col("c_acctbal") / 1000).as("acctbal_band"))
        .orderBy(col("c_custkey"))
    }),

    // The preprocessing funnel: raw → lang filter → quality filter →
    // length filter → vocabulary-fingerprint dedup (order-insensitive
    // exact dedup: md5 of the sorted distinct token set, which catches
    // token-shuffled copies plain md5(text) misses), reported as
    // per-stage survivor counts. ONE scan with conditional aggregates
    // (count(when) + countDistinct(when)) — not one pass per stage.
    "px2_prep_funnel" -> ((s, dir) => {
      val q = TF.qualityScore(col("text"))
      val nt = TF.tokenCount(col("text"))
      val en = col("lang") === "en"
      val keepQ = en && (q >= 0.65)
      val keepL = keepQ && (nt >= 32)
      val vocabFp = md5(concat_ws(" ",
        array_sort(array_distinct(TF.tokens(col("text"))))))
      val agg = t(s, dir, "documents").agg(
        count(lit(1)).as("raw"),
        count(when(en, 1)).as("lang_en"),
        count(when(keepQ, 1)).as("quality"),
        count(when(keepL, 1)).as("length"),
        countDistinct(when(keepL, vocabFp)).as("dedup"))
      agg.select(explode(array(
          struct(lit(1).as("stage_id"), lit("raw").as("stage"),
            col("raw").as("n_docs")),
          struct(lit(2).as("stage_id"), lit("lang_en").as("stage"),
            col("lang_en").as("n_docs")),
          struct(lit(3).as("stage_id"), lit("quality").as("stage"),
            col("quality").as("n_docs")),
          struct(lit(4).as("stage_id"), lit("length").as("stage"),
            col("length").as("n_docs")),
          struct(lit(5).as("stage_id"), lit("dedup").as("stage"),
            col("dedup").as("n_docs")))).as("r"))
        .select(col("r.stage_id"), col("r.stage"), col("r.n_docs"))
        .orderBy(col("stage_id"))
    }),

    // px10 — deflate-ratio quality-signal census (the Dolma /
    // RefinedWeb-class "does it compress like natural language?"
    // filter, CompressionSignals.deflateRatio): per (source,
    // ratio-band-of-100‰) document counts + raw byte volume. The one
    // mapPartitions scan in the suite — deflate is a zlib-library
    // call, not SQL — so there is NO DuckDB oracle entry (the driver
    // records a rows-only check); instead the dump is TWO-SIDED via
    // `scripts/compare_deflate.py`, a CPython-zlib twin that
    // recomputes every band from the same parquet (JDK's Deflater and
    // CPython's zlib are the same madler zlib at level 1 — verified
    // size-identical empirically; a zlib-ng JDK would diverge LOUDLY,
    // not subtly). Correctness of the scan internals stays pinned by
    // CompressionSignalsSpec.
    "px10_deflate_scan" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      graft.functions.CompressionSignals.deflateRatio(docs, "text")
        .groupBy(col("source"), call_function("div",
          col("deflate_ratio_mille"), lit(100L)).as("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("raw_bytes")).as("raw_bytes"))
        .orderBy(col("source"), col("band"))
    })
  )

  private val qualitySql =
    """round(
         0.4 * (1.0 - nonalpha / len) +
         0.3 * least(stop * 5.0, 1.0) +
         0.2 * least(len / 500.0, 1.0) +
         0.1 * (1.0 - least(punct / len * 10.0, 1.0)), 6)"""

  val oracle: Map[String, String] = Map(
    // WITH RECURSIVE closure over the same exact-Jaccard edges dd2's
    // oracle emits: reach propagates labels along symmetrized edges;
    // min(reachable) IS the component id.
    "dd6_dedup_clusters" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
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
         GROUP BY 1, 2),
       edges AS (SELECT doc_a, doc_b FROM inter
         JOIN counts ca ON ca.doc_id = doc_a
         JOIN counts cb ON cb.doc_id = doc_b
         WHERE round(ni::DOUBLE / (ca.n + cb.n - ni), 6) >= 0.3),
       sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
         UNION SELECT doc_b, doc_a FROM edges),
       reach AS (
         SELECT doc_id AS id, doc_id AS comp FROM d
         UNION
         SELECT s.dst AS id, r.comp FROM reach r
         JOIN sym s ON s.src = r.id)
       SELECT id AS doc_id, min(comp) AS cluster_id,
         CAST(id = min(comp) AS INT) AS is_keeper
       FROM reach GROUP BY id ORDER BY doc_id""",
    "px9_curation_pipeline" ->
      """WITH gated AS (
           SELECT doc_id, lang, source,
             len(string_split_regex(trim(text), '\s+')) AS nt,
             ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT
               AS h
           FROM documents WHERE lang IN ('en', 'de')),
         g2 AS (SELECT * FROM gated WHERE nt BETWEEN 10 AND 5000),
         keep AS (SELECT h, min(doc_id) AS doc_id FROM g2 GROUP BY 1),
         dd AS (SELECT g2.* FROM g2 JOIN keep USING (h, doc_id)),
         samp AS (SELECT * FROM dd
           WHERE ('0x' || substr(md5('cur:' ||
             CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 50)
         SELECT lang, source, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens
         FROM samp GROUP BY 1, 2 ORDER BY lang, source""",
    "sx1_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)),
             1, 15))::BIGINT % 100 <
           CASE WHEN lang = 'en' THEN 10 ELSE 50 END
         ORDER BY doc_id""",
    "sx2_stratum_topk" ->
      """SELECT lang, rk, doc_id FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             ORDER BY ('0x' || substr(md5('strat:' ||
               CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id) AS rk
           FROM documents)
         WHERE rk <= 20 ORDER BY lang, rk""",
    "tx7_token_histogram" ->
      """SELECT nt // 64 AS bucket, count(*) AS n_docs,
           min(nt) AS min_tokens, max(nt) AS max_tokens
         FROM (SELECT len(string_split_regex(trim(text), '\s+')) AS nt
           FROM documents)
         GROUP BY 1 ORDER BY bucket""",
    // census → integer rates → salted-hash membership, all replayed
    "sx3_data_mixing" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents
           GROUP BY 1),
         t AS (SELECT count(*) AS n_total FROM documents),
         r AS (SELECT lang, n_l,
             least(1000, (3000 * n_total) // (25 * n_l)) AS rate_mille
           FROM c, t),
         s AS (SELECT d.lang, count(*) AS n_sampled
           FROM documents d JOIN r ON r.lang = d.lang
           WHERE ('0x' || substr(md5('mix:' ||
               CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 <
             rate_mille
           GROUP BY 1)
         SELECT r.lang, n_l, rate_mille, n_sampled
         FROM r JOIN s ON s.lang = r.lang ORDER BY r.lang""",
    // replants the same fixtures and counts with regexp_extract_all
    "px5_pii_detect" ->
      """WITH b AS (SELECT doc_id, concat_ws(' ', substr(text, 1, 80),
           CASE WHEN doc_id % 3 = 0
             THEN 'user' || doc_id || '@example.com' END,
           CASE WHEN doc_id % 4 = 0 THEN '+1-555-' ||
             lpad((doc_id % 10000)::VARCHAR, 4, '0') END,
           CASE WHEN doc_id % 5 = 0
             THEN '10.' || (doc_id % 256) || '.0.1' END,
           CASE WHEN doc_id % 7 = 0
             THEN 'https://ex.org/d' || doc_id END) AS body
         FROM documents WHERE doc_id < 500)
       SELECT doc_id,
         len(regexp_extract_all(body,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT
           AS n_email,
         len(regexp_extract_all(body, '\+1-555-[0-9]{4}'))::BIGINT
           AS n_phone,
         len(regexp_extract_all(body,
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT
           AS n_ipv4,
         len(regexp_extract_all(body, 'https://[a-z0-9./]+'))::BIGINT
           AS n_url,
         CAST(len(regexp_extract_all(body,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) +
           len(regexp_extract_all(body, '\+1-555-[0-9]{4}')) +
           len(regexp_extract_all(body,
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) +
           len(regexp_extract_all(body, 'https://[a-z0-9./]+')) > 0
           AS INT) AS has_pii
       FROM b ORDER BY doc_id""",
    // same chunk arithmetic as dd13's oracle; membership is a HAVING
    // over distinct doc counts, removal hits every occurrence
    "px6_boilerplate_removal" ->
      """WITH d AS (SELECT doc_id,
           string_split_regex(trim(text), '\s+') AS toks
         FROM documents WHERE len(string_split_regex(trim(text),
           '\s+')) > 0),
       c AS (SELECT doc_id,
           unnest(range(0, (len(toks) - 1) // 5 + 1))::INT AS ci,
           toks FROM d),
       c2 AS (SELECT doc_id, ci,
           array_to_string(toks[ci*5+1 : least(ci*5+5, len(toks))],
             ' ') AS chunk
         FROM c),
       df AS (SELECT chunk FROM c2 GROUP BY chunk
         HAVING count(DISTINCT doc_id) >= 3)
       SELECT doc_id,
         coalesce(string_agg(CASE WHEN df.chunk IS NULL
           THEN c2.chunk END, ' ' ORDER BY ci), '') AS text_clean,
         count(*)::BIGINT AS n_chunks,
         sum(CASE WHEN df.chunk IS NULL THEN 0 ELSE 1 END)::BIGINT
           AS n_boiler
       FROM c2 LEFT JOIN df ON df.chunk = c2.chunk
       GROUP BY doc_id ORDER BY doc_id""",
    // same md5-60 bucket, same mixed-integer weight, per occurrence
    "px8_quality_classifier" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
         FROM documents),
       w AS (SELECT doc_id,
           (('0x' || substr(md5('ft:' || tok), 1, 15))::BIGINT
             % 1024) * 2654435761 % 2001 - 1000 AS w
         FROM toks WHERE length(tok) > 0)
       SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(w) AS BIGINT) AS score,
         CAST(sum(w) > 0 AS INT) AS accept
       FROM w GROUP BY 1 ORDER BY doc_id""",
    // replays synthesis + every canonicalization step: lowercase,
    // default-port strip, trailing-slash strip, utm drop, param sort
    "dd16_url_canonical" ->
      """WITH u AS (SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN 'http://site' || (doc_id // 4) ||
               '.example.com/p/' || (doc_id // 4)
             WHEN 1 THEN 'HTTP://' || upper('site' || (doc_id // 4) ||
               '.example.com') || ':80/p/' || (doc_id // 4)
             WHEN 2 THEN 'http://site' || (doc_id // 4) ||
               '.example.com/p/' || (doc_id // 4) || '/'
             ELSE 'http://site' || (doc_id // 4) ||
               '.example.com:80/p/' || (doc_id // 4) ||
               '?utm_source=feed&b=2&a=1' END AS url
         FROM documents),
       c AS (SELECT doc_id,
           lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
           lower(regexp_extract(url, '^[A-Za-z]+://([^/?]+)', 1))
             AS hostport,
           regexp_replace(regexp_extract(url,
             '^[A-Za-z]+://[^/?]+([^?]*)', 1), '/+$', '') AS path,
           coalesce(regexp_extract(url, '\?(.*)$', 1), '') AS q
         FROM u),
       c2 AS (SELECT doc_id, scheme,
           CASE WHEN scheme = 'http'
               THEN regexp_replace(hostport, ':80$', '')
             WHEN scheme = 'https'
               THEN regexp_replace(hostport, ':443$', '')
             ELSE hostport END AS host,
           path,
           coalesce(array_to_string(list_sort(list_filter(
             string_split(q, '&'),
             p -> NOT starts_with(p, 'utm_') AND p <> '')), '&'), '')
             AS sq
         FROM c),
       canon AS (SELECT doc_id,
           scheme || '://' || host || path ||
             CASE WHEN sq = '' THEN '' ELSE '?' || sq END
             AS canonical_url
         FROM c2)
       SELECT canonical_url, count(*) AS n_urls,
         min(doc_id) AS first_doc
       FROM canon GROUP BY 1 ORDER BY canonical_url""",
    // the oracle computes the same running sum with a plain window —
    // the distributed two-pass result must be bit-identical
    "px4_pack_sequences" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h,
           len(string_split_regex(trim(text), '\s+'))::BIGINT
             AS n_tokens
         FROM documents),
       c AS (SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum
         FROM d)
       SELECT doc_id, n_tokens,
         (cum - n_tokens) // 2048 AS pack_id,
         (cum - n_tokens) % 2048 AS pack_offset
       FROM c ORDER BY doc_id""",
    "px3_decontaminate" ->
      """WITH d AS (SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
         FROM documents),
       g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - 3),
           i -> array_to_string(toks[i:i+4], ' ')))) AS gram
         FROM d),
       e AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
       tr AS (SELECT g.doc_id, count(*) AS n_grams,
           count(e.gram) AS n_hit
         FROM g LEFT JOIN e ON g.gram = e.gram
         WHERE g.doc_id >= 10 GROUP BY 1)
       SELECT doc_id, n_grams, n_hit,
         round(n_hit::DOUBLE / n_grams, 6) AS contamination,
         CAST(n_hit::DOUBLE / n_grams >= 0.5 AS INT) AS flagged
       FROM tr ORDER BY doc_id""",
    "tx8_quality_rules" ->
      """SELECT doc_id, nt AS n_tokens, mean_word_len, distinct_frac,
           top_token_frac,
           CAST(distinct_frac < 0.35 AS INT) AS repetitive,
           CAST(top_token_frac > 0.15 AS INT) AS dominated,
           CAST(mean_word_len < 4.0 AS INT) AS short_words
         FROM (SELECT doc_id, len(toks) AS nt,
           round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
             / len(toks), 6) AS mean_word_len,
           round(len(list_distinct(toks))::DOUBLE / len(toks), 6)
             AS distinct_frac,
           round(list_max(list_transform(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t))))::DOUBLE
             / len(toks), 6) AS top_token_frac
           FROM (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
             FROM documents))
         ORDER BY doc_id""",
    // mirrors the header-construction formulas; duration =
    // data*1000 // byte_rate with byte_rate = rate*ch*16/8
    "mm2_wav_metadata" ->
      """SELECT doc_id, 1 AS audio_format,
           (1 + doc_id % 2) AS channels,
           (8000 + (doc_id % 5) * 4000) AS sample_rate,
           16 AS bits_per_sample,
           n_chars AS data_bytes,
           (n_chars * 1000) // ((8000 + (doc_id % 5) * 4000) *
             (1 + doc_id % 2) * 2) AS duration_ms
         FROM documents ORDER BY doc_id""",
    // replays samples[i] = ((doc_id*131 + i*7) % 65536) - 2^16·[u>=2^15]
    // over 64 + doc_id % 64 samples per doc
    // every field replays arithmetically from the synthesis layout:
    // 4 segments (APP0, COM, SOF0, SOS), header = 47 + COM text len
    "mm10_jpeg_metadata" ->
      """SELECT doc_id, 4 AS n_segments, 192 AS sof_marker,
           64 + doc_id % 256 AS width,
           100 + doc_id % 400 AS height,
           1 AS n_components,
           47 + (10 + doc_id % 20) AS header_bytes
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    // n_chunks = IHDR + nIdat + IEND; walked = sig 8 + IHDR 25 +
    // nIdat·(12+idatLen) + IEND 12
    "mm11_png_chunks" ->
      """SELECT doc_id,
           CAST(2 + (1 + doc_id % 5) AS INT) AS n_chunks,
           CAST(16 + doc_id % 1000 AS INT) AS width,
           CAST(16 + doc_id % 700 AS INT) AS height,
           8 AS bit_depth, 0 AS color_type,
           CAST((1 + doc_id % 5) * (20 + doc_id % 40) AS BIGINT)
             AS idat_bytes,
           1 AS has_iend,
           CAST(8 + 25 + (1 + doc_id % 5) * (12 + 20 + doc_id % 40)
             + 12 AS BIGINT) AS walked_bytes
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    // replays the ustar layout: dir entries (i%3=0) carry size 0; the
    // data offset of entry i is 512 past the end of the previous
    // entry's 512-rounded data; checksum and magic always validate
    "mm12_tar_entries" ->
      """WITH e AS (
           SELECT doc_id,
             unnest(generate_series(1, CAST(1 + doc_id % 4 AS INT)))
               AS i
           FROM documents WHERE doc_id < 200),
         x AS (
           SELECT doc_id, i,
             CASE WHEN i % 3 = 0 THEN '5' ELSE '0' END AS typeflag,
             CASE WHEN i % 3 = 0 THEN 0
               ELSE (doc_id * 31 + i * 97) % 1200 END AS sz
           FROM e)
         SELECT doc_id, CAST(i - 1 AS INT) AS entry_index,
           'doc' || doc_id || '/' || i || '.txt' AS name,
           typeflag, CAST(sz AS BIGINT) AS size,
           CAST(512 + coalesce(sum(512 + 512 * ((sz + 511) // 512))
             OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS data_offset,
           1 AS is_ustar, 1 AS chksum_ok
         FROM x ORDER BY doc_id, entry_index""",
    // stored zip: sz_i = 10 + ((doc_id+i)%4)*5; entry i's local
    // header sits after i-1 earlier (30+6+sz) blocks; crc is the
    // deterministic size mix the synthesis writes
    "mm13_zip_entries" ->
      """WITH e AS (
           SELECT doc_id,
             unnest(generate_series(1, CAST(1 + doc_id % 5 AS INT)))
               AS i
           FROM documents WHERE doc_id < 200),
         x AS (SELECT doc_id, i,
             10 + ((doc_id + i) % 4) * 5 AS sz
           FROM e)
         SELECT doc_id, CAST(i - 1 AS INT) AS entry_index,
           'f' || i || '.bin' AS name, 0 AS method,
           CAST(sz AS BIGINT) AS comp_size,
           CAST(sz AS BIGINT) AS uncomp_size,
           (sz * 2654435761) % 4294967296 AS crc32,
           CAST(coalesce(sum(36 + sz) OVER (PARTITION BY doc_id
             ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND
             1 PRECEDING), 0) AS BIGINT) AS local_offset,
           1 AS local_sig_ok
         FROM x ORDER BY doc_id, entry_index""",
    // page i: IFD at 8 + (i-1)*54, next = that + 54 except the last
    "mm14_tiff_pages" ->
      """WITH e AS (
           SELECT doc_id,
             CAST(1 + doc_id % 3 AS INT) AS np,
             unnest(generate_series(1, CAST(1 + doc_id % 3 AS INT)))
               AS i
           FROM documents WHERE doc_id < 200)
         SELECT doc_id, CAST(i - 1 AS INT) AS page_index,
           'II' AS byte_order, 4 AS n_entries,
           CAST(100 + doc_id % 50 + i AS BIGINT) AS width,
           CAST(80 + i * 2 AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bits_per_sample,
           CAST(8 + (i - 1) * 54 AS BIGINT) AS ifd_offset,
           CAST(CASE WHEN i < np THEN 8 + i * 54 ELSE 0 END AS BIGINT)
             AS next_ifd
         FROM e ORDER BY doc_id, page_index""",
    // the DFS box tree as offset arithmetic: ftyp(16) moov(116+100n)
    // [mvhd(108) n×(trak(100)[tkhd(92)])] mdat(L+8)
    "mm15_mp4_boxes" ->
      """WITH d AS (SELECT doc_id,
             CAST(1 + doc_id % 3 AS BIGINT) AS n,
             CAST(1000 + doc_id % 500 AS BIGINT) AS dur,
             CAST(16 + doc_id % 32 AS BIGINT) AS len
           FROM documents WHERE doc_id < 200),
         boxes AS (
           SELECT doc_id, 0 AS box_index, 0 AS depth,
             'ftyp' AS box_type, 0 AS off, 16 AS box_size,
             -1 AS timescale, -1 AS duration FROM d
           UNION ALL SELECT doc_id, 1, 0, 'moov', 16, 116 + 100 * n,
             -1, -1 FROM d
           UNION ALL SELECT doc_id, 2, 1, 'mvhd', 24, 108, 600, dur
           FROM d
           UNION ALL SELECT doc_id, 1 + 2 * i, 1, 'trak',
             132 + (i - 1) * 100, 100, -1, -1
           FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i) _
           UNION ALL SELECT doc_id, 2 + 2 * i, 2, 'tkhd',
             140 + (i - 1) * 100, 92, -1, -1
           FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i) _
           UNION ALL SELECT doc_id, 3 + 2 * n, 0, 'mdat',
             132 + 100 * n, len + 8, -1, -1 FROM d)
         SELECT doc_id, CAST(box_index AS INT) AS box_index,
           CAST(depth AS INT) AS depth, box_type,
           CAST(off AS BIGINT) AS "offset",
           CAST(box_size AS BIGINT) AS box_size,
           CAST(timescale AS BIGINT) AS timescale,
           CAST(duration AS BIGINT) AS duration
         FROM boxes ORDER BY doc_id, box_index""",
    // block table replay: STREAMINFO (34 bytes, is_last iff no
    // padding) + nPad 4-byte PADDING blocks, fields from the params
    "mm18_flac_blocks" ->
      """WITH d AS (SELECT doc_id,
             CAST(8000 + (doc_id % 8) * 4000 AS BIGINT) AS sr,
             CAST(1 + doc_id % 2 AS BIGINT) AS ch,
             CAST(100000 + doc_id AS BIGINT) AS tot,
             CAST(doc_id % 3 AS BIGINT) AS np
           FROM documents WHERE doc_id < 200),
         blocks AS (
           SELECT doc_id, 0 AS bi, 0 AS bt,
             CASE WHEN np = 0 THEN 1 ELSE 0 END AS lastf,
             34 AS len, sr, ch, CAST(16 AS BIGINT) AS bps, tot
           FROM d
           UNION ALL
           SELECT doc_id, i, 1,
             CASE WHEN i = np THEN 1 ELSE 0 END, 4,
             -1, -1, -1, -1
           FROM d, LATERAL (SELECT unnest(generate_series(1, np)) AS i) _)
         SELECT doc_id, CAST(bi AS INT) AS block_index,
           CAST(bt AS INT) AS block_type, CAST(lastf AS INT) AS is_last,
           CAST(len AS BIGINT) AS block_len,
           CAST(sr AS BIGINT) AS sample_rate,
           CAST(ch AS BIGINT) AS n_channels,
           CAST(bps AS BIGINT) AS bits_per_sample,
           CAST(tot AS BIGINT) AS total_samples
         FROM blocks ORDER BY doc_id, block_index""",

    // the dispatch replayed as closed-form doc_id arithmetic
    "mm17_format_sniff" ->
      """SELECT format, count(*) AS n_blobs FROM (
           SELECT CASE doc_id % 5 WHEN 0 THEN 'gif' WHEN 1 THEN 'wav'
             WHEN 2 THEN 'mp4' WHEN 3 THEN 'ebml'
             ELSE 'unknown' END AS format
           FROM documents WHERE doc_id < 500)
         GROUP BY 1 ORDER BY format""",
    // per-family closed forms: gif w*h from the synthesized header
    // params; wav the data chunk size; mp4 the box table of
    // mp4Shard(nt traks) — 4+2*nt boxes summing 264+292*nt bytes
    // (mm15's table with len=16); ebml the element tree of
    // ebmlShard(ne tracks) — 7+3*ne elements, data sizes 55+24*ne
    // (mm16's table); unknown the 16-byte md5-prefix payload
    "mm19_media_lake" ->
      """WITH fam AS (SELECT doc_id, doc_id % 5 AS f,
           100 + doc_id % 900 AS w, 50 + doc_id % 500 AS h,
           64 + (doc_id % 100) * 2 AS data_bytes,
           1 + doc_id % 3 AS nt, 1 + doc_id % 3 AS ne
         FROM documents)
       SELECT * FROM (
         SELECT 'gif' AS format, count(*) AS n_blobs,
           count(*) AS n_units, CAST(sum(w * h) AS BIGINT) AS val_sum
         FROM fam WHERE f = 0
         UNION ALL
         SELECT 'wav', count(*), count(*),
           CAST(sum(data_bytes) AS BIGINT) FROM fam WHERE f = 1
         UNION ALL
         SELECT 'mp4', count(*), CAST(sum(4 + 2 * nt) AS BIGINT),
           CAST(sum(264 + 292 * nt) AS BIGINT) FROM fam WHERE f = 2
         UNION ALL
         SELECT 'ebml', count(*), CAST(sum(7 + 3 * ne) AS BIGINT),
           CAST(sum(55 + 24 * ne) AS BIGINT) FROM fam WHERE f = 3
         UNION ALL
         SELECT 'unknown', count(*), count(*),
           CAST(count(*) * 16 AS BIGINT) FROM fam WHERE f = 4)
       ORDER BY format""",
    // the EBML tree as closed-form offset arithmetic: header 20
    // bytes (3 elements), segment at 20 with a 2-byte size VINT,
    // info/timestamp-scale, tracks with n (entry, number, lacing)
    // triples of 8 bytes each
    "mm16_ebml_elements" ->
      """WITH d AS (SELECT doc_id,
             CAST(1 + doc_id % 3 AS BIGINT) AS n,
             CAST(1000000 + doc_id % 1000 AS BIGINT) AS ts
           FROM documents WHERE doc_id < 200),
         elems AS (
           SELECT doc_id, 0 AS idx, 0 AS depth, '1A45DFA3' AS id,
             0 AS off, 5 AS hdr, 15 AS sz, -1 AS uv FROM d
           UNION ALL SELECT doc_id, 1, 1, '4286', 5, 3, 1, 1 FROM d
           UNION ALL SELECT doc_id, 2, 1, '4282', 9, 3, 8, -1 FROM d
           UNION ALL SELECT doc_id, 3, 0, '18538067', 20, 6,
             19 + 8*n, -1 FROM d
           UNION ALL SELECT doc_id, 4, 1, '1549A966', 26, 5, 8, -1
           FROM d
           UNION ALL SELECT doc_id, 5, 2, '2AD7B1', 31, 4, 4, ts
           FROM d
           UNION ALL SELECT doc_id, 6, 1, '1654AE6B', 39, 6, 8*n, -1
           FROM d
           UNION ALL SELECT doc_id, 7 + 3*(i-1), 2, 'AE',
             45 + 8*(i-1), 2, 6, -1
           FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i) _
           UNION ALL SELECT doc_id, 8 + 3*(i-1), 3, 'D7',
             47 + 8*(i-1), 2, 1, i
           FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i) _
           UNION ALL SELECT doc_id, 9 + 3*(i-1), 3, '9C',
             50 + 8*(i-1), 2, 1, 0
           FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i) _)
         SELECT doc_id, CAST(idx AS INT) AS elem_index,
           CAST(depth AS INT) AS depth, id AS elem_id,
           CAST(off AS BIGINT) AS "offset",
           CAST(hdr AS BIGINT) AS header_len,
           CAST(sz AS BIGINT) AS data_size,
           CAST(uv AS BIGINT) AS uint_val
         FROM elems ORDER BY doc_id, elem_index""",
    "mm9_wav_pcm" ->
      """WITH s AS (
           SELECT d.doc_id AS media_id,
             ((d.doc_id * 131 + i.i * 7) % 65536) AS u
           FROM documents d, range(128) i(i)
           WHERE d.doc_id < 100 AND i.i < 64 + d.doc_id % 64),
         v AS (SELECT media_id,
             u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS sv
           FROM s)
         SELECT media_id, count(*)::BIGINT AS n_samples,
           max(abs(sv))::BIGINT AS peak,
           sum(sv)::BIGINT AS sum_val,
           sum(sv * sv)::BIGINT AS sum_sq,
           CAST(floor(sqrt(sum(sv * sv)::DOUBLE / count(*)) * 1000)
             AS BIGINT) AS rms_milli
         FROM v GROUP BY media_id ORDER BY media_id""",

    // has_gct is always 1 (packed = 128 + k); gct_colors = 2^(k+1)
    "mm3_gif_metadata" ->
      """SELECT doc_id, '89a' AS version,
           (100 + doc_id % 900) AS width,
           (50 + doc_id % 500) AS height,
           1 AS has_gct,
           CAST(power(2, (doc_id % 8) + 1) AS BIGINT) AS gct_colors
         FROM documents ORDER BY doc_id""",
    // thumb is 4x3 of an 8x6 source: NN sample at (2x, 2y), gray g =
    // (id*7 + 13*2x + 29*2y) % 256, RGB int = g * 0x010101 = g * 65793
    "mm4_thumbnail_pixels" ->
      """SELECT d.doc_id AS media_id, 4 AS width, 3 AS height,
           CAST(sum(((d.doc_id * 7 + 26 * x.i + 58 * y.i) % 256)
             * 65793) AS BIGINT) AS pixel_sum
         FROM documents d, range(4) x(i), range(3) y(i)
         WHERE d.doc_id < 50
         GROUP BY 1 ORDER BY media_id""",
    // frame i of doc d carries 1 + (d*3 + i*7) % 200 coded bytes;
    // geometry is constant per doc
    "mm5_gif_frames" ->
      """SELECT d.doc_id AS media_id,
           count(*) AS n_frames,
           CAST(max(4 + d.doc_id % 16) AS INT) AS width,
           CAST(max(3 + d.doc_id % 8) AS INT) AS height,
           CAST(sum(1 + (d.doc_id * 3 + i.i * 7) % 200) AS BIGINT)
             AS data_bytes_sum
         FROM documents d JOIN range(1, 6) i(i)
           ON i.i <= 1 + d.doc_id % 5
         WHERE d.doc_id < 100
         GROUP BY d.doc_id ORDER BY media_id""",
    // frame (1-based synthesis index i) of doc d is w x h with pixel
    // p = (d*5 + i*11 + pos*3) % 128 at stream position pos; w*h <= 96
    // so the 126-literal cap never binds and n_pixels = w*h exactly
    "mm6_gif_pixels" ->
      """SELECT d.doc_id AS media_id,
           CAST(f.i - 1 AS INT) AS frame_index,
           CAST(3 + d.doc_id % 10 AS INT) AS width,
           CAST(2 + d.doc_id % 7 AS INT) AS height,
           CAST((3 + d.doc_id % 10) * (2 + d.doc_id % 7) AS INT)
             AS n_pixels,
           CAST(sum((d.doc_id * 5 + f.i * 11 + p.p * 3) % 128)
             AS BIGINT) AS px_sum,
           CAST(sum(((d.doc_id * 5 + f.i * 11 + p.p * 3) % 128) * p.p)
             AS BIGINT) AS px_wsum
         FROM documents d
         JOIN range(1, 5) f(i) ON f.i <= 1 + d.doc_id % 4
         JOIN range(0, 96) p(p)
           ON p.p < (3 + d.doc_id % 10) * (2 + d.doc_id % 7)
         WHERE d.doc_id < 100
         GROUP BY 1, 2, 3, 4, 5
         ORDER BY media_id, frame_index""",
    // frame j (1-based) of doc d carries len = 1 + (d*3 + j*7) % 50
    // bytes; its data starts at RIFF(12) + hdrl(76) + movi hdr(12) +
    // sum of earlier chunks (8 + len + pad) + its own 8-byte header
    "mm7_avi_frames" ->
      """WITH f AS (
           SELECT d.doc_id, i.i,
                  1 + (d.doc_id * 3 + i.i * 7) % 50 AS len
           FROM documents d JOIN range(1, 5) i(i)
             ON i.i <= 1 + d.doc_id % 4
           WHERE d.doc_id < 100)
         SELECT doc_id AS media_id,
           CAST(i - 1 AS INT) AS frame_index,
           CAST(0 AS INT) AS stream_id,
           'dc' AS chunk_type,
           CAST(108 + coalesce(sum(8 + len + len % 2) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS "offset",
           CAST(len AS BIGINT) AS size,
           CAST(16 + doc_id % 32 AS INT) AS avi_width,
           CAST(9 + doc_id % 16 AS INT) AS avi_height
         FROM f ORDER BY media_id, frame_index""",
    // frame i (1-based) of doc d is an 8x6 BMP with gray
    // g = (d*7 + 13x + 29y + 11i) % 256 at (x, y); RGB int = g*65793
    "mm8_avi_frame_pixels" ->
      """SELECT d.doc_id AS media_id,
           CAST(f.i - 1 AS INT) AS frame_index,
           'dc' AS chunk_type,
           CAST(8 AS INT) AS img_width,
           CAST(6 AS INT) AS img_height,
           CAST(sum(((d.doc_id * 7 + 13 * x.i + 29 * y.i + 11 * f.i)
             % 256) * 65793) AS BIGINT) AS pixel_sum
         FROM documents d
         JOIN range(1, 4) f(i) ON f.i <= 1 + d.doc_id % 3
         CROSS JOIN range(8) x(i) CROSS JOIN range(6) y(i)
         WHERE d.doc_id < 40
         GROUP BY 1, 2, 3, 4, 5
         ORDER BY media_id, frame_index""",
    "px1_pii_mask" ->
      """SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
           md5('pseudo:' || c_name) AS name_token,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band
         FROM customer ORDER BY c_custkey""",
    "px2_prep_funnel" ->
      s"""WITH s AS (SELECT lang, text,
           $qualitySql AS q,
           len(string_split_regex(trim(text), '\\s+')) AS nt
         FROM (SELECT lang, text,
           greatest(length(text), 1)::DOUBLE AS len,
           (length(text) - length(regexp_replace(text, '[^a-zA-Z ]', '',
             'g')))::DOUBLE AS nonalpha,
           (length(text) - length(regexp_replace(text, '[.!?,;:]', '',
             'g')))::DOUBLE AS punct,
           len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             x -> x IN ('the','a','of','and','is')))::DOUBLE /
             greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)
             AS stop
           FROM documents)),
       a AS (SELECT count(*) AS raw,
           count(CASE WHEN lang = 'en' THEN 1 END) AS lang_en,
           count(CASE WHEN lang = 'en' AND q >= 0.65 THEN 1 END)
             AS quality,
           count(CASE WHEN lang = 'en' AND q >= 0.65 AND nt >= 32
             THEN 1 END) AS len_pass,
           count(DISTINCT CASE WHEN lang = 'en' AND q >= 0.65
             AND nt >= 32 THEN md5(array_to_string(list_sort(
               list_distinct(string_split_regex(trim(text), '\\s+'))),
               ' ')) END) AS dedup
         FROM s)
       SELECT 1 AS stage_id, 'raw' AS stage, raw AS n_docs FROM a
       UNION ALL SELECT 2, 'lang_en', lang_en FROM a
       UNION ALL SELECT 3, 'quality', quality FROM a
       UNION ALL SELECT 4, 'length', len_pass FROM a
       UNION ALL SELECT 5, 'dedup', dedup FROM a
       ORDER BY stage_id"""
  )
}
