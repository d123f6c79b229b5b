package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: language ID, quality scoring, token counting, document
  * fingerprinting. All pure `Column` algebra — codegen'd end to end,
  * no UDFs, so they run inside whole-stage codegen over 100 TB of
  * documents.
  */
object TextFunctions {

  /** Evaluate `c` ONCE per row and pass the bound value to `f`.
    *
    * Inside a single expression tree, a sub-expression referenced from
    * a higher-order-function lambda is RE-EVALUATED per element — e.g.
    * `transform(sequence(...), i => norm.substr(i, 3))` runs the whole
    * regexp normalization len× per row (O(len²), measured 20 s vs 2 s
    * on the trigram profile). Lambda variables, by contrast, are
    * evaluated once — so wrap the expensive base in a 1-element array
    * and bind it through a lambda.
    */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), x => f(x)), 1)

  /** Whitespace tokens of a text column. NOTE the documented SQL-twin
    * semantics: splitting empty/whitespace-only text yields ONE empty
    * token (`[""]`, count 1) — identical to the DuckDB
    * `string_split_regex(trim(text), '\s+')` every oracle replays.
    * Callers that must treat empty docs as zero-token (membership
    * filters, shingle floors) filter `length(tok) > 0` explicitly,
    * on BOTH sides.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count (empty text counts 1 — see [[tokens]]). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: ~4 chars/token heuristic used by LLM
    * pipelines when the real tokenizer is too expensive for a scan.
    */
  def tokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Count regex matches by length difference — stays codegen'd. */
  def matchCount(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  private def markerRatio(toks: Column, markers: Seq[String]): Column = {
    val markerArr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(markerArr, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** N-gram/stopword-heuristic language ID. Scores each language by
    * its marker-token ratio and returns the argmax (deterministic
    * tie-break by score then language code). The marker lists are the
    * heuristic's "model" — swap per corpus.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(text: Column): Column = {
    // lowercase BEFORE matching: the marker lists are lowercase, so
    // an all-caps document would otherwise score 0 for every language
    // and deterministically (wrongly) classify as the rank-0 code
    val toks = tokens(lower(text))
    // build struct(score, negLangRank) per language and take array_max:
    // argmax with total deterministic ordering.
    val scored = langMarkers.zipWithIndex.map { case ((code, markers), i) =>
      struct(
        round(markerRatio(toks, markers), 9).as("score"),
        lit(-i).as("rank"),
        lit(code).as("code"))
    }
    array_max(array(scored: _*)).getField("code")
  }

  /** Composite quality score in [0,1]: rewards alpha density and
    * stopword presence, penalizes very short docs and punctuation
    * walls. Deterministic, codegen'd.
    */
  def qualityScore(text: Column): Column = {
    val len = greatest(length(text), lit(1)).cast("double")
    val nonAlphaRatio = matchCount(text, "[^a-zA-Z ]").cast("double") / len
    val punctRatio = matchCount(text, "[.!?,;:]").cast("double") / len
    // lowercased for the same reason as langId: caps must still earn
    // their stopword bonus
    val stopRatio = markerRatio(tokens(lower(text)), langMarkers.head._2)
    val lenScore = least(len / 500.0, lit(1.0))
    round(
      lit(0.4) * (lit(1.0) - nonAlphaRatio) +
        lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.2) * lenScore +
        lit(0.1) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))),
      6)
  }

  /** Canonical text normalization for fingerprinting: lowercase,
    * strip non-alphanumerics to single spaces, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Content fingerprint of the normalized text (md5 here; the
    * rolling-hash variant is `xxhash64` for 64-bit joins). Two docs
    * with the same fingerprint are exact near-duplicates modulo
    * casing/punctuation — the first dedup pass of every corpus.
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 64-bit fingerprint for compact joins at scale. */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  /** Character n-gram shingles of the normalized text, distinct.
    * `sequence` + `transform` keeps it inside codegen; empty/short
    * docs yield an empty array.
    */
  def shingles(text: Column, n: Int): Column =
    bindOnce(normalized(text)) { norm =>
      // sequence(1, 0) yields a DESCENDING sequence in Spark, not
      // empty — short docs must be guarded explicitly.
      when(length(norm) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(
            sequence(lit(1), length(norm) - (n - 1)),
            i => norm.substr(i, lit(n)))))
    }

  /** Adjacent (overlapping) word bigrams of a RAW token array — every
    * occurrence, NOT distinct (unlike [[wordShingles]]): repetition
    * counting needs multiplicity. Single-token / empty arrays yield
    * an empty array (`sequence(1, 0)` would count DOWN, see
    * [[shingles]]).
    */
  def adjacentBigrams(toks: Column): Column =
    bindOnce(toks) { ts =>
      when(size(ts) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(ts) - 1),
          i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
    }

  /** Count of the MOST FREQUENT element of an array = the longest
    * equal-run of its sorted form — an `aggregate` fold with O(1)
    * state (prev, run, best), zero shuffle, O(n log n) per row. The
    * Gopher-style repetition signals (tx15) ride this instead of an
    * explode → groupBy → max, which would shuffle every bigram of a
    * 100 TB corpus twice. Empty arrays yield 0.
    */
  def topRepeatCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Word n-gram shingles (arrays of n consecutive tokens joined by a
    * space), distinct.
    */
  def wordShingles(text: Column, n: Int): Column =
    bindOnce(tokens(normalized(text))) { toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(
            sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))))
    }

  // ---- BPE merge-training primitives (tx13) ---------------------------
  // A word rides a SPACED-TOKEN string — double spaces BETWEEN tokens,
  // one pad space at each end, "</w>" end-of-word marker:
  //   "low" -> " l  o  w  </w> "
  // In this representation merging pair (a, b) is one literal
  // replace(" a  b ", " ab "): each match consumes only the inner
  // halves of its neighbours' double-space boundaries, so consecutive
  // pairs all match, and non-overlapping left-to-right replacement is
  // EXACTLY greedy BPE ("aaa" + (a,a) -> [aa, a]). DuckDB's replace
  // scans the same way, which is what makes tx13's oracle replay
  // bit-exact.

  /** A word as its spaced char-token string (+ `</w>` marker). */
  def bpeSpaced(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1  "), lit("</w> "))

  /** Token array of a spaced string. */
  def bpeTokens(spaced: Column): Column = split(trim(spaced), "  ")

  /** Greedy left-to-right merge of the (a, b) symbol pair. */
  def bpeMerge(spaced: Column, a: String, b: String): Column =
    replace(spaced, lit(s" $a  $b "), lit(s" $a$b "))
}
