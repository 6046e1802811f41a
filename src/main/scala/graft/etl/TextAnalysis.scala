package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Text-analysis kit for large-scale training-data pipelines: tokenization,
  * token counting, quality scoring, language ID, and document
  * fingerprinting — all as pure column expressions (codegen-friendly, no
  * UDFs) with bit-exact DuckDB-oracle equivalents.
  *
  * The reference has no text operators (SURVEY.md §2 covers its whole
  * surface); this module is part of the LLM-pipeline extension mandated by
  * BASELINE.json's north star.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens; empty input → empty array. */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  /** Deletion neighborhood of a string: the string itself plus every
    * one-char-deleted variant, deduplicated — the SymSpell blocking key
    * set. Two strings with levenshtein ≤ 1 ALWAYS share at least one
    * key (substitution → both delete-at-i keys collide; insert/delete →
    * the longer side's deletion equals the shorter side), so an
    * equi-join on these keys has exact recall at edit distance 1. Key
    * fan-out is len+1 per string — linear, never a metric cross join.
    */
  def deletionKeys(c: Column): Column =
    array_union(array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - lit(1)),
          c.substr(i + lit(1), length(c)))))

  /** Real subword token count: greedy longest-match over the compiled-in
    * merge vocabulary ([[graft.functions.SubwordCount.vocab]]), one
    * native codegen'd expression per row (no UDF). This is the token
    * economics t01 reports and t17's sequence packing consumes; the
    * oracle mirrors it with a recursive-CTE longest-match
    * ([[graft.queries.OracleSql.subwordCountCtes]]).
    */
  def subwordCount(toks: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.SubwordCount(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks)))

  /** Unicode NFC canonicalization — native codegen'd expression
    * ([[graft.functions.NfcNormalize]]), byte-exact with DuckDB's
    * `nfc_normalize`. Composed vs decomposed accent sequences collapse
    * to one form, so normalized fingerprints catch the dups byte-md5
    * misses.
    */
  def nfc(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Crude char-based token estimate (the common len/4 heuristic). */
  def tokenEstimate(text: Column): Column = ceil(length(text) / lit(4.0)).cast("long")

  /** Stopword hit count (duplicates counted — a frequency signal). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))

  /** Per-language stopword lists for the language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is", "to", "in"),
    "fr" -> Seq("le", "la", "et", "de", "un", "les", "des"),
    "es" -> Seq("el", "la", "y", "de", "un", "los", "que"),
    "de" -> Seq("der", "die", "und", "ein", "ist", "das", "nicht"))

  /** Fraction of CJK characters (drives the zh branch of language ID). */
  def cjkRatio(text: Column): Column = {
    val len = length(text)
    when(len > 0,
      (len - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))).cast("double") / len)
      .otherwise(lit(0.0))
  }

  /** Language pick from precomputed per-language stopword scores: CJK
    * ratio > 0.3 → zh, else the language with the highest score in
    * priority order (the declared order of [[langStopwords]]), "und" when
    * no hits. Callers with the scores already materialized (query plans)
    * use this directly; the oracle mirrors the exact CASE order, so ties
    * break identically.
    */
  def langIdFromScores(cjk: Column, scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    val byPriority = scores.foldLeft(when(lit(false), lit("")): Column) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }
    when(cjk > 0.3, lit("zh"))
      .when(best > 0, byPriority)
      .otherwise(lit("und"))
  }

  /** N-gram/stopword language-ID heuristic over raw text. */
  def langId(text: Column): Column =
    Portable.once(tokens(text)) { toks =>
      langIdFromScores(cjkRatio(text),
        langStopwords.map { case (l, sw) => l -> stopwordHits(toks, sw) })
    }

  /** Quality score in [0,1]: rewards reasonable length, low punctuation
    * density, stopword presence (natural-language-ness), and word shape.
    * All double arithmetic is identical in the oracle → bit-exact.
    */
  def qualityScore(text: Column): Column =
    Portable.once(tokens(text))(qualityScoreFromToks(text, _))

  /** [[qualityScore]] over already-materialized tokens — callers that
    * have `toks` as a column attribute skip the second tokenization.
    */
  def qualityScoreFromToks(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val len = length(text).cast("double")
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}]", ""))
    val punctRatio = when(len > 0, punct.cast("double") / len).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      stopwordHits(toks, langStopwords.flatMap(_._2)).cast("double") / nTok)
      .otherwise(lit(0.0))
    val avgTokLen = when(nTok > 0,
      aggregate(toks, lit(0.0), (acc, t) => acc + length(t)) / nTok)
      .otherwise(lit(0.0))
    // NULL text must score NULL, not 0.6: without the guard, least()
    // SKIPS the null length term (both Spark and DuckDB least ignore
    // NULLs) and a contentless document earns full length + punctuation
    // credit — outranking real documents through every quality gate.
    // The oracle mirror (OracleSql.qualityExprSql) carries the same
    // CASE guard so the engines agree on any input.
    when(text.isNotNull,
      round(
        lit(0.3) * least(nTok / lit(50.0), lit(1.0)) +
          lit(0.3) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) +
          lit(0.2) * least(stopRatio * lit(5.0), lit(1.0)) +
          lit(0.2) * least(avgTokLen / lit(8.0), lit(1.0)),
        6))
  }

  private val fpMod = 1L << 40

  /** Position-sensitive document fingerprint: fold each token's position
    * into its hash and sum mod 2^40. Order-sensitive like a rolling hash,
    * but overflow-free under ANSI mode (each term < 2^40, ≤ 2^20 tokens
    * before the sum could approach 2^62) and expressible in both engines
    * without a mutable fold.
    */
  def polyFingerprint(toks: Column): Column = Portable.once(toks) { ts =>
    when(size(ts) > 0,
      pmod(
        aggregate(
          zip_with(ts, sequence(lit(0), size(ts) - 1),
            (t, i) => pmod(Portable.hash60(concat(t, lit("@"), i)), lit(fpMod))),
          lit(0L),
          (acc, v) => acc + v),
        lit(fpMod)))
      .otherwise(lit(0L))
  }

  /** Whole-document content fingerprint (md5 of normalized text). */
  def md5Fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  // ---- PII scrubbing (training-data curation) -------------------------
  //
  // Patterns are written in the Java ∩ RE2 regex dialect so the Spark
  // expression and the DuckDB oracle compile the SAME automaton: no
  // backreferences, no lookaround, ASCII word boundaries only.

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count PII occurrences of one pattern (pre-redaction signal). */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Redact emails → [EMAIL], IPv4s → [IP], dash phones → [PHONE].
    * Replacement order is fixed (email, ip, phone) and the patterns are
    * mutually non-overlapping (an IPv4 group can't span a phone's
    * dashes), so the rewrite is confluent — same result in any engine.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      phoneRe, "[PHONE]")

  // ---- repetition scoring (Gopher-style quality gate) -----------------

  /** Non-distinct token bigrams ("a_b") — the repetition signal needs
    * multiplicity, unlike the LSH shingles (which dedup). Inputs with
    * fewer than 2 tokens yield an empty array.
    */
  def tokenBigrams(toks: Column): Column = Portable.once(toks) { ts =>
    when(size(ts) >= 2,
      zip_with(slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))
  }
}
