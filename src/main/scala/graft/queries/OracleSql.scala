package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, when}

import graft.etl.{TextAnalysis => TA}
import graft.functions.Portable

/** Shared DuckDB-side fragments for the oracle SQL — ONE copy of each
  * normalization/scoring formula, mirrored 1:1 against its Spark
  * implementation in [[graft.etl.Normalize]] / [[graft.etl.TextAnalysis]].
  * Queries that embed these fragments stay in lock-step: a contract
  * change edits the Spark helper and the fragment here, and every
  * dependent oracle follows.
  */
object OracleSql {

  /** The numeric-shape guard of `Normalize.toNumber` (DuckDB's TRY_CAST
    * accepts 'nan' as a float literal; the guarded cast must keep it
    * null ≡ pandas NaN→fillna(0)).
    */
  val numberShapeRe = """[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?"""

  /** Infinity tokens parse to ±inf (pandas precise_xstrtod; DuckDB's
    * DOUBLE cast accepts the same spellings case-insensitively).
    */
  val infShapeRe = """(?i)[+-]?inf(inity)?"""

  def cleanNumSql(raw: String): String =
    s"replace(replace(trim($raw), ',', ''), '%', '')"

  /** `Normalize.toNumber`: human-format cleanup, coerce-to-null. */
  def toNumberSql(raw: String): String =
    s"""CASE WHEN regexp_full_match(${cleanNumSql(raw)}, '$numberShapeRe')
               OR regexp_full_match(${cleanNumSql(raw)}, '$infShapeRe')
                  THEN CAST(${cleanNumSql(raw)} AS DOUBLE)
             END"""

  /** toNumber + fillna(0) (aggregate_by_store.py:112–119, 135). */
  def toNum0Sql(raw: String): String =
    s"coalesce(${toNumberSql(raw)}, 0)"

  /** `Normalize.bareNumber` (aggregate_by_store.py:736–739): plain
    * numeric coercion, no thousands-separator/percent cleanup.
    */
  def bareNumberSql(raw: String): String =
    s"""CASE WHEN regexp_full_match(trim($raw), '$numberShapeRe')
               OR regexp_full_match(trim($raw), '$infShapeRe')
                  THEN CAST(trim($raw) AS DOUBLE)
             END"""

  /** bareNumber + fillna(0) (the generic config path's coercion). */
  def bareNum0Sql(raw: String): String =
    s"coalesce(${bareNumberSql(raw)}, 0)"

  /** `Normalize.parseMonth` (aggregate_by_store.py:436–446) as a scalar
    * subquery over one raw value.
    */
  def parseMonthSql(raw: String): String =
    s"""(SELECT CASE WHEN mo BETWEEN 1 AND 12 THEN mo END FROM (
          SELECT TRY_CAST(CASE WHEN length(dg) >= 6 THEN substr(dg, length(dg) - 1, 2)
                               ELSE dg END AS INTEGER) AS mo
          FROM (SELECT regexp_replace(trim($raw), '[^0-9]', '', 'g') AS dg)))"""

  /** DuckDB equivalent of `Portable.hash60(x, seed)`. */
  def hSql(x: String, seed: Int): String =
    s"CAST(('0x'||substr(md5($x||'#$seed'),1,15)) AS BIGINT)"

  /** The t15 deterministic hash-split rule — the ONE source of truth for
    * every operator that composes over the corpus partition
    * (t15/t33/t48/t58/e33): bucket = hash60(id, 13) % 100, < 90 train,
    * < 95 val, else test. A seed/threshold change edits THIS pair and
    * every dependent audit follows in lock-step.
    */
  def splitOf(id: Column): Column = {
    val b = pmod(Portable.hash60(id.cast("string"), 13), lit(100L))
    when(b < 90, lit("train")).when(b < 95, lit("val")).otherwise(lit("test"))
  }

  /** DuckDB mirror of [[splitOf]]. */
  def splitSql(id: String): String =
    s"""CASE WHEN ${hSql(s"CAST($id AS VARCHAR)", 13)} % 100 < 90 THEN 'train'
             WHEN ${hSql(s"CAST($id AS VARCHAR)", 13)} % 100 < 95 THEN 'val'
             ELSE 'test' END"""

  /** `TextAnalysis.tokens(text)`. */
  val toksSql =
    "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"

  /** Code points consumed by ONE greedy longest-match step over `rest` —
    * the CASE ladder mirrors [[graft.functions.SubwordCount]]'s
    * longest-first probe (vocab literals generated from the SAME Seq, so
    * the two engines cannot drift).
    */
  def subwordStepSql(rest: String): String = {
    // group by CODE POINTS (what SubwordCount matches and DuckDB substr
    // counts), not UTF-16 length — they differ for astral-plane pieces
    val byLen = graft.functions.SubwordCount.vocab
      .groupBy(p => p.codePointCount(0, p.length))
    (graft.functions.SubwordCount.maxLen to 2 by -1).map { l =>
      val lst = byLen.getOrElse(l, Nil).map(p => s"'$p'").mkString("[", ",", "]")
      s"WHEN list_contains($lst, substr($rest, 1, $l)) THEN $l"
    }.mkString("CASE ", " ", " ELSE 1 END")
  }

  /** CTE chain `(w, r, subwc)` computing per-doc greedy subword counts
    * over `documents` — each recursion step consumes one piece, so rows
    * with a non-empty remainder count the pieces. Callers MUST open the
    * query with `WITH RECURSIVE` and left-join `subwc(doc_id, bpe)`
    * (docs with no tokens are absent → coalesce to 0).
    */
  val subwordCountCtes: String = s"""
      w AS (SELECT doc_id, unnest($toksSql) AS rest FROM documents),
      r AS (
        SELECT doc_id, rest FROM w
        UNION ALL
        SELECT doc_id, substr(rest, 1 + ${subwordStepSql("rest")}) AS rest
        FROM r WHERE rest <> ''),
      subwc AS (
        SELECT doc_id, count(*) AS bpe FROM r WHERE rest <> ''
        GROUP BY doc_id)"""

  /** Quality-score measure columns over a relation with (text, toks) —
    * mirrors `TextAnalysis.qualityScoreFromToks`'s inputs.
    */
  val qualityColsSql: String = {
    val allStops = TA.langStopwords.flatMap(_._2)
      .map(w => s"'$w'").mkString("[", ",", "]")
    s"""CAST(len(toks) AS DOUBLE) AS ntok,
               CAST(length(text) AS DOUBLE) AS len,
               CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\\[\\]{}]', '', 'g')) AS DOUBLE) AS punct,
               CAST(len(list_filter(toks, t -> list_contains($allStops, t))) AS DOUBLE) AS stops,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS toklen"""
  }

  /** The quality formula over the [[qualityColsSql]] measures. NULL text
    * scores NULL (the outer CASE on `len`, which is NULL iff text is —
    * `text` itself is not in scope in every measure CTE): DuckDB's
    * least() skips NULLs exactly like Spark's, so without the guard a
    * contentless doc would earn 0.6 and outrank real documents.
    */
  val qualityExprSql: String =
    """CASE WHEN len IS NOT NULL THEN
               round(0.3 * least(ntok / 50.0, 1.0)
                 + 0.3 * (1.0 - least(CASE WHEN len > 0 THEN punct / len ELSE 0.0 END * 10.0, 1.0))
                 + 0.2 * least(CASE WHEN ntok > 0 THEN stops / ntok ELSE 0.0 END * 5.0, 1.0)
                 + 0.2 * least(CASE WHEN ntok > 0 THEN coalesce(toklen, 0.0) / ntok ELSE 0.0 END / 8.0, 1.0),
               6) END"""

  /** CJK-character ratio of `text` (`TextAnalysis.cjkRatio`). */
  val cjkSql: String =
    """CASE WHEN length(text) > 0
                    THEN CAST(length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE) / length(text)
                    ELSE 0.0 END"""

  /** Per-language stopword-score select list over `toks`. */
  val langScoreSelSql: String = TA.langStopwords.map { case (l, sw) =>
    val lst = sw.map(w => s"'$w'").mkString("[", ",", "]")
    s"len(list_filter(toks, t -> list_contains($lst, t))) AS s_$l"
  }.mkString(",\n               ")

  /** `greatest` over the per-language scores. */
  val langBestSql: String =
    s"greatest(${TA.langStopwords.map("s_" + _._1).mkString(", ")})"

  /** The language pick over columns (cjk, best, s_*) — mirrors
    * `TextAnalysis.langIdFromScores`, same CASE priority order.
    */
  val langCaseSql: String = {
    val pick = TA.langStopwords.map(_._1)
      .map(l => s"WHEN s_$l = best THEN '$l'").mkString(" ")
    s"""CASE WHEN cjk > 0.3 THEN 'zh'
                  WHEN best > 0 THEN (CASE $pick END)
                  ELSE 'und' END"""
  }

  /** Top-k ranking tail over a CTE `scored(qid, cid, cos)` — mirrors
    * `TopK.topK` with the (cos DESC, cid ASC) total order.
    */
  def knnTailSql(k: Int): String =
    s"""r AS (SELECT qid, cid, cos,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS INTEGER) AS rnk
            FROM scored)
      SELECT qid, cid, rnk, round(cos, 6) AS sim FROM r WHERE rnk <= $k"""
}
