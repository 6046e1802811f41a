package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Distributed near-duplicate detection: MinHash signatures + banded LSH
  * candidate generation + exact-Jaccard verification.
  *
  * Scale design (the whole point of LSH — never materialize all pairs):
  *   - signatures: one `groupBy(doc_id)` shuffle over exploded shingles,
  *     k min-aggregates computed map-side-partial;
  *   - candidates: an equi-join on (band_idx, band_hash) — md5-derived
  *     band hashes distribute uniformly, so the shuffle is balanced;
  *   - skew guard: `maxBucket` drops pathologically hot buckets (a
  *     super-frequent band value — boilerplate text, tiny alphabets —
  *     would otherwise create a quadratic bucket self-join). This is the
  *     standard production mitigation; the cap is part of the operator's
  *     declared semantics so the oracle mirrors it deterministically.
  *   - verification: exact Jaccard only on same-bucket pairs.
  */
object Dedup {

  /** (id, sh: array<string>) → (id, m0..m{k-1}) MinHash signature matrix.
    *
    * CONTRACT: rows with empty `sh` produce NO signature (explode emits
    * nothing) and silently leave the pipeline — callers filter
    * `size(sh) > 0` first and handle too-short docs by policy (the
    * registry queries route them to exact dedup, which needs no
    * shingles).
    *
    * ONE md5 per shingle; the k hash family members are affine transforms
    * of that base hash ([[Portable.minhashTransform]]) — integer-only,
    * overflow-free, bit-identical in the DuckDB oracle. The k mins are
    * map-side-partial aggregates over a single shuffle on the id.
    */
  def minhashSignatures(base: DataFrame, idCol: String, shCol: String, k: Int): DataFrame =
    // per-row array fold, NOT explode+groupBy: the shingle sets already
    // live one-row-per-doc, so aggregating k mins over an exploded
    // (doc, shingle) relation pays a corpus-sized SHUFFLE for math the
    // row can do in place (array_min over transform) — measured 2.2 s
    // → 1.3 s on t08's signature build at sf0.1, and the map-only form
    // pipelines into the band explode with no exchange between them.
    // Bit-equal to [[minhashSignaturesAgg]] (same hash60, same affine
    // family, min ≡ array_min — DedupSplitSpec pins the equivalence),
    // so every oracle mirror of the explode+GROUP BY formulation is
    // untouched. Requires one row per id (every shingle builder's
    // contract; the agg form is the one to reach for if rows were ever
    // pre-exploded). The size filter preserves the agg form's implicit
    // drop of empty/null shingle sets (explode emits nothing for them;
    // array_min would emit a null-signature row instead).
    rowSignatures(base.select(col(idCol), col(shCol))
      .filter(size(col(shCol)) > 0), shCol, k).drop(shCol)

  /** The explode + groupBy formulation of [[minhashSignatures]] — the
    * literal mirror of the oracle SQL's `unnest … GROUP BY`, kept as
    * the equivalence-pin reference and for inputs that arrive
    * pre-exploded (multiple rows per id).
    */
  def minhashSignaturesAgg(base: DataFrame, idCol: String, shCol: String, k: Int): DataFrame = {
    val consts = Portable.minhashConsts(k)
    val ex = base.select(col(idCol), explode(col(shCol)).as("_s"))
      .select(col(idCol), Portable.hash60(col("_s")).as("_h"))
    val aggs = consts.zipWithIndex.map { case (c, i) =>
      min(Portable.minhashTransform(col("_h"), c)).as(s"m$i")
    }
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Signature matrix → (id, bidx, bh) band rows. */
  private def banded(sig: DataFrame, idCol: String,
                     numBands: Int, rowsPerBand: Int,
                     keep: Seq[String] = Nil): DataFrame = {
    val bandCols = (0 until numBands).map { b =>
      val ms = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i"))
      struct(lit(b).as("bidx"), Portable.hash60(concat_ws("|", ms: _*), 1000 + b).as("bh"))
    }
    val carried = col(idCol) +: keep.map(col)
    sig.select(carried :+ explode(array(bandCols: _*)).as("band"): _*)
      .select(carried ++ Seq(col("band.bidx").as("bidx"),
        col("band.bh").as("bh")): _*)
  }

  /** Drop band rows in buckets hotter than `maxBucket` — the bounded but
    * recall-losing guard (a doc whose every band is hot escapes
    * detection); [[splitCandidates]] is the recall-preserving
    * alternative.
    */
  private def capped(bands: DataFrame, maxBucket: Int): DataFrame =
    bands
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bidx"), col("bh"))))
      .filter(col("_n") <= maxBucket)
      .drop("_n")

  /** Signature matrix → distinct candidate id pairs (a < b) via banded LSH
    * with a bucket-size cap.
    */
  def bandCandidates(
      sig: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    val small = capped(banded(sig, idCol, numBands, rowsPerBand), maxBucket)
    small.as("x")
      .join(small.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
  }

  /** Persist a signature matrix about to feed a candidate SELF-join
    * (r19, guide §2.4 shared computation): the band pipeline traverses
    * `sig` THREE times per run — the hot-bucket count aggregate plus
    * both sides of the candidate self-join (the r18 t08 final plan
    * shows all three as separate full subtrees; only the hot agg's
    * exchange is reused) — and each traversal recomputes the
    * md5-based shingle hashes and k min-folds, the dominant cost of
    * candidate generation when the matrix is an inline pipeline
    * (measured: t08 candidates 4.3 s → 2.8 s, t06 −0.7, lshpairs
    * build −0.7). One MEMORY_AND_DISK persist of the narrow
    * (id, m0..m{k-1}) matrix makes that one traversal; at 100 TB it
    * is O(corpus) × ~(8·k+8) bytes and spills by level.
    *
    * CALLER-side by design, not inside [[splitCandidates]]: a sig that
    * is already a MATERIALIZED table (t70/t72 read theirs from an
    * Artifacts parquet) re-reads for near-free, and caching it anyway
    * measured +0.4–0.8 s per entry (cache write + InMemoryTableScan
    * overhead for traversals that were cheap pruned scans). The caller
    * knows which kind it holds; this helper is the one-line way to say
    * "mine is expensive".
    */
  def persistSig(sig: DataFrame): DataFrame =
    sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Band rows with their split sub-bucket join keys — the assignment
    * stage of [[splitCandidates]], package-visible so DedupSplitSpec can
    * audit key-group sizes directly.
    *
    * Sub-bucket assignment is SORT-FREE and fully distributed:
    *   1. per-bucket counts come from one `groupBy(bidx, bh)` aggregate
    *      (map-side partial — the hottest bucket contributes one count
    *      row per input partition, never its row set);
    *   2. only buckets over the cap survive the filter, so the joined-
    *      back table holds ≤ |bands|/maxBucket rows — usually tiny (AQE
    *      picks a broadcast join at runtime) and, when a pathological
    *      corpus makes it large, still a plain equi-join AQE can
    *      skew-split — unlike a Window partitioned by (bidx, bh), which
    *      is un-splittable by construction;
    *   3. each hot-bucket row's sub-bucket label is a pure map-side
    *      expression: `pmod(salted_hash, ⌈n/maxBucket⌉)` — no rank, no
    *      per-bucket sort, no task that ever holds a whole bucket.
    * Cold rows take label 0 and emit no adjacent key, paying exactly the
    * [[bandCandidates]] cost.
    */
  private[graft] def splitKeyed(
      sig: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val bands = banded(sig, idCol, numBands, rowsPerBand)
    val hot = splitHot(bands, maxBucket)
    // ⌈n/maxBucket⌉ in exact integer math (DIV) — mirrored verbatim by
    // the DuckDB oracle's `//`; ONE formula with the probe seam
    // ([[splitProbeKeys]]), via the shared nsubCol/saltedCol helpers
    val nsub = nsubCol(maxBucket)
    val salted = saltedCol(idCol)
    bands.join(hot, Seq("bidx", "bh"), "left")
      .withColumn("_sub",
        when(col("_n").isNotNull, pmod(salted, nsub)).otherwise(lit(0L)))
      .select(col(idCol), col("bidx"), col("bh"),
        explode(when(col("_n").isNotNull,
            array(col("_sub"), pmod(col("_sub") + lit(1L), nsub)))
          .otherwise(array(col("_sub")))).as("_k"))
  }

  /** Recall-preserving hot-bucket strategy: SPLIT instead of DROP.
    *
    * [[capped]] deletes every band row of a bucket hotter than
    * `maxBucket` — the declared (and oracle-mirrored) skew guard, but on
    * a boilerplate-heavy crawl the hottest buckets are exactly where
    * near-identical duplicates live, and a doc whose EVERY band is hot
    * silently escapes detection. This variant keeps all rows: a bucket of
    * n rows is partitioned into nsub = ⌈n/maxBucket⌉ sub-buckets of
    * expected size ≤ maxBucket via a per-band salted-hash modulus
    * (`pmod(hash60(id#bidx, 77), nsub)`), and candidates are generated
    * within each sub-bucket AND across the ADJACENT label — k with
    * (k+1) mod nsub, the wraparound making the label ring symmetric:
    * at nsub = 2 every row reaches BOTH labels (the split is lossless
    * there), and at any nsub the top label's neighbor is a real
    * sub-bucket instead of a phantom. Per row that bounds the
    * comparisons at ~2·maxBucket expected (total O(n·maxBucket) per
    * bucket, never O(n²)) with ZERO dropped rows.
    *
    * The label is salted per band: each of the `numBands` bands
    * partitions the bucket independently, so a pair missed in one band's
    * split (assigned non-adjacent labels) gets an independent draw in
    * every other band — recall degrades gracefully with bucket heat
    * instead of stepping to zero at the cap. Deterministic (hash
    * arithmetic, no RNG), so the DuckDB oracle mirrors the split
    * bit-exactly.
    *
    * Plan shape (the round-9 revision): NO window anywhere — the former
    * per-bucket `row_number` sort ran a hot bucket's entire row set on
    * ONE task, the exact straggler/OOM shape this operator exists to
    * kill at 100 TB. Now the assignment is an agg + equi-join + map
    * (see [[splitKeyed]]); the candidate self-join keys on
    * (bidx, bh, _k), so a hot bucket's shuffle work spreads over its
    * nsub+1 labels instead of landing on one partition. If `sig` is
    * expensive to compute, persist it (or read it from an
    * [[graft.etl.Artifacts]] parquet, as t70/t72 do) — the band table is
    * traversed once for counts and twice for the self-join.
    */
  def splitCandidates(
      sig: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    val keyed = splitKeyed(sig, idCol, numBands, rowsPerBand, maxBucket)
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bh") === col("y.bh") &&
          col("x._k") === col("y._k") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
  }

  /** Signature matrix → the (id, bidx, bh) band rows as a first-class
    * result — the artifact a MANAGED LSH index persists (parquet on
    * storage) and appends to per ingest. Signatures are per-doc, so
    * building per-ingest band tables and appending them is exactly
    * equivalent to banding the whole corpus at once; the hot-bucket cap
    * is applied at PROBE time over the full persisted table (capping
    * per ingest would under-count cross-ingest hot buckets).
    */
  def bandTable(sig: DataFrame, idCol: String,
                numBands: Int, rowsPerBand: Int): DataFrame =
    banded(sig, idCol, numBands, rowsPerBand)

  /** Public cap (see [[capped]]) for callers holding a band table
    * directly — e.g. the streaming probe, which caps the STATIC index
    * side at plan time.
    */
  def capBands(bands: DataFrame, maxBucket: Int): DataFrame =
    capped(bands, maxBucket)

  /** Per-ROW minhash signature columns m0..m{k-1} via an array fold over
    * the shingle column — same math as [[minhashSignatures]] (one
    * hash60 per shingle, affine family, min), but with NO aggregation:
    * the right formulation when the input is an unbounded STREAM (zero
    * shuffle, zero state) or when rows already carry their shingle
    * arrays. Empty shingle arrays yield null signatures (array_min of
    * empty) — callers filter `size(sh) > 0` first, same contract as
    * [[minhashSignatures]].
    */
  def rowSignatures(base: DataFrame, shCol: String, k: Int): DataFrame = {
    val consts = Portable.minhashConsts(k)
    val withH = base.withColumn("_hs",
      transform(col(shCol), s => Portable.hash60(s)))
    consts.zipWithIndex.foldLeft(withH) { case (df, (c, i)) =>
      df.withColumn(s"m$i",
        array_min(transform(col("_hs"), h => Portable.minhashTransform(h, c))))
    }.drop("_hs")
  }

  /** Band rows from signature COLUMNS (the [[banded]] shape) — public
    * for per-row/streaming callers; `keep` names extra columns to carry
    * through the explode (e.g. event time + shingles on a stream, where
    * joining back for them would be a stream-stream join).
    */
  def rowBands(sig: DataFrame, idCol: String, numBands: Int,
               rowsPerBand: Int, keep: Seq[String] = Nil): DataFrame =
    banded(sig, idCol, numBands, rowsPerBand, keep)

  /** Probe a PERSISTED index band table with the DROP-cap guard: the
    * probe batch's bands equi-join the index bands only; cost scales
    * with the batch, never the corpus. Cap semantics follow
    * [[crossBandCandidates]] (index side capped, probe side not). Since
    * round 10 the production incremental entries (t32/t34) run
    * [[splitProbeBandTable]] instead — this capped variant remains the
    * audited baseline (t72's comparison subject) and the simpler
    * formulation for callers who accept hot-bucket recall loss in
    * exchange for never fanning a hot bucket out at all.
    */
  def probeBandTable(
      probeSig: DataFrame,
      indexBands: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    val p = banded(probeSig, idCol, numBands, rowsPerBand)
      .select(col(idCol).as("a"), col("bidx"), col("bh"))
    val ix = capped(indexBands, maxBucket)
      .select(col(idCol).as("b"), col("bidx"), col("bh"))
    p.join(ix, Seq("bidx", "bh"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Recall-preserving PROBE of a persisted band table — the
    * [[splitKeyed]] strategy applied at the index/probe seam, closing
    * the asymmetry where [[probeBandTable]]'s cap DELETES every hot
    * index row (a probe whose near-duplicate lives in a
    * boilerplate-hot bucket silently misses it). Index rows take ONE
    * sub-bucket label (`pmod(salted_hash, ⌈n/maxBucket⌉)`, counts over
    * the FULL persisted table so cross-ingest hot buckets are counted
    * correctly — the [[bandTable]] contract); probe rows take their own
    * label AND the adjacent one, with wraparound — (label+1) mod nsub —
    * so at nsub = 2 a probe reaches both labels (lossless) and the top
    * label's neighbor is always a real sub-bucket. Per probe row the
    * hot-bucket join work is bounded at ~2·maxBucket expected with ZERO
    * index rows dropped; per band a hot pair is caught when the index
    * label ∈ {probe label, (probe label+1) mod nsub} (≈ 2/nsub),
    * independently per band —
    * the [[splitCandidates]] recall algebra at the probe seam. Cold
    * buckets behave exactly like the capped probe. Same sort-free plan
    * shape: one map-side-partial count agg, two equi-joins, no window.
    */
  def splitProbeBandTable(
      probeSig: DataFrame,
      indexBands: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val hot = splitHot(indexBands, maxBucket)
    val ix = splitIndexLabels(indexBands, hot, idCol, maxBucket)
    val p = splitProbeKeys(banded(probeSig, idCol, numBands, rowsPerBand),
      hot, idCol, maxBucket)
    p.join(ix, Seq("bidx", "bh", "_k"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** EXACT probe of a persisted band table — zero recall loss on
    * either side RELATIVE TO THE UNCAPPED BANDED JOIN (LSH band recall
    * itself stays probabilistic, as everywhere), with the sub-bucket
    * labels retained purely as a skew spreader.
    *
    * Semantics: identical to the UNCAPPED probe join (probe bands ⋈
    * index bands on (bidx, bh), self-pairs removed). Proof: every index
    * row of a hot bucket takes exactly one label in [0, nsub)
    * ([[splitIndexLabels]]), and here a probe row in that bucket emits
    * ALL nsub labels — so a (probe, index) co-bucket pair always shares
    * a key, in every band. [[DedupSplitSpec]] pins the equality
    * set-for-set against `probeBandTable` with the cap disabled, and the
    * t76 oracle mirrors the plain uncapped join (no label math to
    * mirror — the labels are invisible in the result).
    *
    * What the labels buy at 100 TB: a boilerplate-hot index bucket of n
    * rows becomes nsub = ⌈n/maxBucket⌉ distinct join keys instead of
    * ONE — its probe work spreads over nsub reducers rather than
    * landing a whole crawl cluster's fan-out on a single straggler
    * task. The cost is honest and linear in true bucket heat: a hot
    * probe row does ~nsub·maxBucket ≈ n index comparisons — exact
    * recall is PAID FOR, not conjured. Right when the probe batch is
    * small relative to the corpus (the daily-ingest shape) and recall
    * must be total (legal/dedup-before-release). When the probe side is
    * itself crawl-scale, use [[splitProbeBandTable]] — its bounded
    * ~2·maxBucket per-row cost with the graceful per-band recall model
    * is the scalable trade.
    */
  def exactProbeBandTable(
      probeSig: DataFrame,
      indexBands: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val hot = splitHot(indexBands, maxBucket)
    val ix = splitIndexLabels(indexBands, hot, idCol, maxBucket)
    val p = exactProbeKeys(banded(probeSig, idCol, numBands, rowsPerBand),
      hot, idCol, maxBucket)
    p.join(ix, Seq("bidx", "bh", "_k"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Hot buckets of a band table — `(bidx, bh, _n)` for every bucket
    * over the cap. ONE map-side-partial count agg; the result is small
    * by construction (≤ |bands|/maxBucket rows), which is what lets a
    * streaming caller broadcast it.
    */
  private[graft] def splitHot(bands: DataFrame, maxBucket: Int): DataFrame =
    bands.groupBy(col("bidx"), col("bh"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxBucket)

  // nsub = ceil(_n / maxBucket), exact integer math (expects `_n` in
  // scope); the per-band salted label hash — ONE formula for both join
  // sides and the DuckDB mirror (lshSplitProbeSql)
  private def nsubCol(maxBucket: Int) =
    expr(s"CAST((_n + ${maxBucket - 1}) DIV $maxBucket AS BIGINT)")
  private def saltedCol(idCol: String) =
    Portable.hash60(concat_ws("#", col(idCol), col("bidx")), 77)

  /** Index band rows with their single sub-bucket label:
    * `(b, bidx, bh, _k)`. `hot` is [[splitHot]] of the SAME band table
    * (passed in so a streaming caller can pin one copy and share it
    * with [[splitProbeKeys]]).
    */
  private[graft] def splitIndexLabels(indexBands: DataFrame, hot: DataFrame,
                                      idCol: String, maxBucket: Int): DataFrame =
    indexBands.join(hot, Seq("bidx", "bh"), "left")
      .withColumn("_k",
        when(col("_n").isNotNull,
          pmod(saltedCol(idCol), nsubCol(maxBucket))).otherwise(lit(0L)))
      .select(col(idCol).as("b"), col("bidx"), col("bh"), col("_k"))

  /** Probe band rows exploded to their own + wraparound-adjacent
    * sub-bucket keys: `(a, keep..., bidx, bh, _k)`. Pure map work after
    * the (tiny, broadcastable) `hot` join — the shape that stays
    * stateless on a stream.
    */
  private[graft] def splitProbeKeys(bandRows: DataFrame, hot: DataFrame,
                                    idCol: String, maxBucket: Int,
                                    keep: Seq[String] = Nil): DataFrame = {
    val nsub = nsubCol(maxBucket)
    val carried = Seq(col(idCol).as("a")) ++ keep.map(col) ++
      Seq(col("bidx"), col("bh"))
    bandRows.join(hot, Seq("bidx", "bh"), "left")
      .withColumn("_sub",
        when(col("_n").isNotNull,
          pmod(saltedCol(idCol), nsub)).otherwise(lit(0L)))
      .select(carried :+ explode(when(col("_n").isNotNull,
          array(col("_sub"), pmod(col("_sub") + lit(1L), nsub)))
        .otherwise(array(col("_sub")))).as("_k"): _*)
  }

  /** Probe band rows exploded to ALL `nsub` sub-bucket keys of their
    * bucket — the exact-recall analog of [[splitProbeKeys]]:
    * `(a, keep..., bidx, bh, _k)`. The candidate set downstream EQUALS
    * the uncapped probe join (every index label is visited), while a
    * hot bucket still arrives as nsub distinct join keys. Same
    * stateless shape on a stream: pure map work after the (tiny,
    * broadcastable) `hot` join.
    *
    * CEILING: the `sequence(0, nsub−1)` expansion materializes one
    * nsub-element array PER HOT PROBE ROW before the explode, so nsub
    * (= ceil(bucketHeat / maxBucket)) is bounded by per-row memory —
    * at maxBucket 64, a 10⁸-hot bucket means a ~1.5M-element (~12 MB)
    * array per probe row touching it, and Spark arrays cap at 2³¹
    * elements outright. In that regime EXACT recall against a
    * boilerplate bucket is the wrong trade by construction (the
    * candidate join itself is bucketHeat-sized per probe row); use the
    * recall-preserving [[splitProbeKeys]] (bounded ~2·maxBucket keys
    * per probe row) or raise maxBucket so nsub stays plan-sized
    * (≤ ~10⁵). Callers at 100 TB should treat nsub > 10⁵ as a signal
    * the bucket belongs on the split path, not the exact one.
    */
  private[graft] def exactProbeKeys(bandRows: DataFrame, hot: DataFrame,
                                    idCol: String, maxBucket: Int,
                                    keep: Seq[String] = Nil): DataFrame = {
    val nsub = nsubCol(maxBucket)
    val carried = Seq(col(idCol).as("a")) ++ keep.map(col) ++
      Seq(col("bidx"), col("bh"))
    // Twilight-zone guard, explode edition: each HOT probe band row
    // explodes to nsub = ceil(n/maxBucket) sub-label rows where n is
    // the INDEX bucket's heat — the relation is quadratic-capable by
    // construction (probe hot rows x hot-bucket size), but the planner
    // sizes it from the PRE-explode stats, which sit under the
    // broadcast threshold. Measured: the 100x-skew replica exploded
    // this side into a ~3 GiB broadcast collect that died on
    // driver.maxResultSize while both verify joins were already
    // guarded (dev/scale_experiment_r15/
    // t76_100x_skew_noconf_verifyguardonly.log; the offending node is
    // plan node 18 in t76_100x_skew_noconf_plan_verifyguardonly.txt —
    // the post-guard success run is t76_100x_skew_noconf.log). The
    // split variant stays unguarded: its explode
    // multiplier is a constant 2 labels per hot row, bounded by the
    // probe batch contract.
    noBroadcastPairs(bandRows.join(hot, Seq("bidx", "bh"), "left")
      .select(carried :+ explode(when(col("_n").isNotNull,
          sequence(lit(0L), nsub - lit(1L)))
        .otherwise(array(lit(0L)))).as("_k"): _*))
  }

  /** Incremental probe (drop-cap variant): candidate (probe, index)
    * pairs — the probe batch's bands equi-join the INDEX's bands only
    * (never corpus×corpus). The hot-bucket cap applies to the index
    * side (a boilerplate-hot corpus band would fan every probe row out
    * quadratically); the probe batch is small by definition and stays
    * uncapped. At 100 TB the index band table is the persisted artifact
    * (computed once, appended to per ingest) and each new batch joins
    * against it — near-dup checking cost scales with the BATCH, not the
    * corpus. Production default since round 10 is the recall-preserving
    * [[splitProbeBandTable]]; see [[probeBandTable]] for when the cap
    * is still the right trade.
    */
  def crossBandCandidates(
      probeSig: DataFrame,
      indexSig: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame =
    probeBandTable(probeSig, banded(indexSig, idCol, numBands, rowsPerBand),
      idCol, numBands, rowsPerBand, maxBucket)

  /** Resolve verified near-dup pairs into clusters: every member maps to
    * its cluster's minimum doc id (the canonical representative a
    * training pipeline keeps). Distributed label propagation — each
    * round every node takes the min label among itself and its
    * neighbors; converges in O(diameter) rounds (near-dup clusters are
    * dense, so typically 2–4). The driver loop is over ITERATIONS, not
    * groups; each round is one join + one aggregation, all data stays
    * distributed. Each round's eager barrier pins one copy of the
    * (small) label table until the ContextCleaner reclaims it — bounded
    * by maxIter copies of edge-set-sized data. `policy` picks the
    * barrier's placement ([[CheckpointPolicy]]): Local for bench/local
    * runs, Reliable for cluster jobs that must survive executor loss.
    */
  def resolveClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                      maxIter: Int = 20,
                      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    // eager barrier per round truncates the lineage — iterative
    // self-joins otherwise nest the whole plan history and the driver
    // dies on plan size long before the data is large
    val edges = policy.barrier(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))
    var labels = policy.barrier(edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("rep")).as("nrep"))
      // old and new label sit in the same row, so convergence detection
      // rides along in a flag column — one job per round (the eager
      // checkpoint), plus a cheap scan of the checkpointed frame
      val stepped = policy.barrier(
        labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
          .select(col("id"),
            least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"),
            (coalesce(col("nrep"), col("rep")) < col("rep")).as("_chg")))
      converged = stepped.filter(col("_chg")).limit(1).count() == 0
      labels = stepped.drop("_chg")
      i += 1
    }
    // a silent partial fixpoint would return non-minimal reps that LOOK
    // valid (and diverge from any exact transitive-closure oracle) —
    // refuse instead; chains longer than maxIter hops need a bigger
    // budget, and each round is cheap (one join over the edge set)
    if (!converged)
      throw new IllegalStateException(
        s"resolveClusters did not converge in $maxIter rounds — " +
          "a near-dup chain exceeds the iteration budget; raise maxIter")
    // published in the bench artifact's `iters` field: fixpoint-entry
    // variance attribution is read (rounds moved?) instead of argued
    IterStats.record("resolve_clusters_rounds", i)
    labels.select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
  }

  /** Join candidates back to shingle sets and keep pairs with exact
    * Jaccard ≥ threshold.
    */
  def verifyJaccard(
      base: DataFrame,
      idCol: String,
      shCol: String,
      cand: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccard(base, base, idCol, shCol, cand, threshold)

  /** Two-sided verify: `a` ids resolve in `baseA`, `b` ids in `baseB`
    * (the incremental probe-vs-index case).
    *
    * `probeBounded`: the shingle sides carry the twilight-zone guard by
    * DEFAULT (see below) — a caller whose `baseA` is bounded by a batch
    * contract (a streaming micro-batch, a takedown list: size fixed
    * regardless of corpus scale) may pass `probeBounded = true` to let
    * the planner broadcast THAT side, which is the scale-correct plan
    * there (a small probe broadcast spares the corpus-side shuffle
    * entirely). The corpus side (`baseB`) is never exempt — nothing
    * bounds it.
    *
    * The declaration is ENFORCED, not trusted: a `probeBounded = true`
    * probe is counted (capped scan — `limit(bound+1).count()`, cheap by
    * the caller's own declaration) and the call fails loudly past
    * [[probeBoundedMaxRows]] (10⁶ rows ≈ the last size where a
    * shingle-array broadcast is unconditionally safe at ~1 KB/row
    * serialized). A corpus-sized frame mislabeled "bounded" would
    * otherwise re-open the exact twilight-zone death the guard closed —
    * silently, and only at scale.
    *
    * TRIPWIRE COST (r16 ADVICE #2): the capped count is an EAGER Spark
    * job at call time, and `limit` caps returned rows, not upstream
    * work — a probe with a wide lineage (shuffles/windows above it)
    * executes that lineage here AND again in the real join, and a
    * previously-lazy call path now launches a job on construction. The
    * intended callers (a micro-batch, a takedown list) have trivial
    * lineage, where the count is one cheap scan; a caller handing in a
    * derived probe should `persist`/`localCheckpoint` it first so the
    * tripwire counts the materialized form instead of re-deriving it.
    */
  def verifyJaccard(
      baseA: DataFrame,
      baseB: DataFrame,
      idCol: String,
      shCol: String,
      cand: DataFrame,
      threshold: Double,
      probeBounded: Boolean = false): DataFrame = {
    if (probeBounded) {
      // capped count: scans at most bound+1 rows even on a huge frame
      val n = baseA.limit(probeBoundedMaxRows + 1).count()
      require(n <= probeBoundedMaxRows,
        s"probeBounded=true, but the probe side has > $probeBoundedMaxRows " +
          "rows — the bounded-batch declaration is false, and broadcasting " +
          "a corpus-scale shingle relation is the twilight-zone death " +
          "(serialized rows run ~15-20x compressed stats; " +
          "dev/scale_experiment_r15/t76_100x_skew_noconf_preguard.log). " +
          "Drop probeBounded (guarded shuffle plan) or pre-bound the batch.")
    }
    // Broadcast-twilight-zone guard, shingle edition: a shingle-array
    // relation's SERIALIZED rows run ~15-20x its compressed parquet
    // stats (short strings dedupe brutally on disk, not in memory), so
    // stats-based broadcast selection is systematically wrong for this
    // input class — the 100x-skew probe side measured 3+ GiB serialized
    // while its stats sat under the threshold, and the broadcast
    // collect died on driver.maxResultSize
    // (dev/scale_experiment_r15/t76_100x_skew_noconf_preguard.log; the
    // post-guard success run is t76_100x_skew_noconf.log). Guard both
    // array-carrying sides unless the caller DECLARES the probe side
    // bounded; the planner still picks SMJ vs shuffled-hash by cost.
    // Verify-kernel selection (r18, guide §1.2 per-task work): on
    // PACKED-LONG shingle arrays (t08's injective packChar3 longs) the
    // per-doc sides are sorted once with `sort_array` — a primitive
    // radix-ish sort — so the per-PAIR intersection runs as
    // [[graft.functions.IntersectCountSorted]]'s zero-allocation merge
    // scan instead of `array_intersect`'s hash-set build + result-array
    // materialization (the candidate join fans each set out per pair,
    // so per-doc work amortizes over every pair; measured t08
    // 6.9 → ~4.6 s). STRING shingle arrays keep the hash-set kernel:
    // their per-doc sort is n·log n full UTF8String compares paid for
    // EVERY doc row (including docs with zero candidates), which
    // measured net-negative on the low-candidate-density entries (t06
    // +1.6 s) — the pairs-per-doc ratio decides, and for strings it is
    // too low here. Values are bit-identical either way (an
    // intersection COUNT is element-order-insensitive; TextDedupSpec
    // pins jaccardSorted ≡ jaccard).
    // Kernel choice derives from BOTH sides (r18 ADVICE #1): a two-base
    // call with mismatched element types (long probe vs string corpus)
    // would otherwise pick the kernel from baseA alone and fail with an
    // opaque IntersectCountSorted type-check error deep in analysis.
    // Mismatched sides are a caller contract violation either way (the
    // hash kernel's array_intersect type-errors on them too), so fail
    // here with a named message instead.
    def shElemType(df: DataFrame): org.apache.spark.sql.types.DataType =
      df.schema(shCol).dataType match {
        case org.apache.spark.sql.types.ArrayType(et, _) => et
        case other => throw new IllegalArgumentException(
          s"verifyJaccard: column '$shCol' must be an array type, got $other")
      }
    val (etA, etB) = (shElemType(baseA), shElemType(baseB))
    require(etA == etB,
      s"verifyJaccard: shingle element types must match across sides — " +
        s"probe side '$shCol' is array<$etA>, corpus side is array<$etB>. " +
        "Build both sides with the same shingle builder (e.g. pack BOTH " +
        "through Portable.packChar3, or neither).")
    val sortedKernel = etA == org.apache.spark.sql.types.LongType
    val shByKernel: Column => Column =
      if (sortedKernel) sort_array(_) else identity
    val sa0 = baseA.select(col(idCol).as("a"),
      shByKernel(col(shCol)).as("_sha"))
    val sa = if (probeBounded) sa0 else noBroadcastPairs(sa0)
    val sb = noBroadcastPairs(
      baseB.select(col(idCol).as("b"), shByKernel(col(shCol)).as("_shb")))
    // Broadcast-twilight-zone guard: `cand` is a candidate-pair relation
    // — quadratic-capable by construction (hot LSH buckets square), and
    // its upstream COMPRESSED stats can sit under
    // autoBroadcastJoinThreshold while the in-memory rows run to
    // gigabytes; planning it as a broadcast build dies on
    // driver.maxResultSize/the broadcast row cap (observed at 658M
    // pairs, 100x-skew). NO_BROADCAST_HASH states exactly that
    // invariant per join — the shingle sides stay free to broadcast
    // when genuinely small, and at corpus scale the planner's
    // stats-based shuffle choice is untouched. Both joins carry the
    // hint (a strategy hint binds to the nearest join only).
    val guard = noBroadcastPairs _
    // Length upper-bound prefilter (r19, PPJoin size bound / guide §1.2
    // per-pair work): |∩| ≤ min(|a|,|b|), so a pair's BEST achievable
    // jaccard is min/(na+nb−min) — reached at full containment. Pairs
    // whose bound already fails the threshold skip the intersection
    // kernel entirely (measured 46% of t08's candidates at sf0.1).
    // EXACTLY result-preserving by construction: the bound is compared
    // through the SAME round(·, 6) >= threshold predicate as the real
    // filter below, jaccard is monotone in |∩| (and double division +
    // half-up rounding are monotone), so round(jmax) < t ⟹
    // round(j) < t for every achievable |∩| — a dropped pair could
    // never have survived the declared filter. Cost: two array-length
    // reads + one division per pair, paid before any element is
    // touched.
    val _na = size(col("_sha")).cast("double")
    val _nb = size(col("_shb")).cast("double")
    val _mn = least(_na, _nb)
    val lengthBound =
      round(_mn / (_na + _nb - _mn), 6) >= threshold
    guard(guard(cand).join(sa, Seq("a"))).join(sb, Seq("b"))
      .filter(lengthBound)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        round(if (sortedKernel) Portable.jaccardSorted(col("_sha"), col("_shb"))
              else Portable.jaccard(col("_sha"), col("_shb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Upper bound enforced on a `probeBounded = true` probe side
    * ([[verifyJaccard]]): 10⁶ rows ≈ ~1 GB serialized at the measured
    * ~1 KB/row shingle payload — the last size where an unconditional
    * broadcast is safe under default driver/broadcast limits.
    */
  val probeBoundedMaxRows: Int = 1000000

  /** A relation marked un-broadcastable
    * ([[org.apache.spark.sql.graftbridge.PlanBridge.noBroadcastHash]]):
    * the scale-correct plan for every verify-stage join side that can
    * outgrow the driver — candidate-pair relations (quadratic-capable)
    * and shingle-array relations (serialized ~15-20x their compressed
    * stats) — unconditional under ANY conf. Applies to the NEAREST
    * join above — re-apply per join in multi-join verify chains.
    */
  def noBroadcastPairs(pairs: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.noBroadcastHash(pairs)

  /** EXACT set-similarity self-join via AllPairs/PPJoin prefix
    * filtering: every (a < b) pair with Jaccard(setA, setB) >= num/den
    * is returned with its exact intersection and union sizes — no
    * probabilistic recall (the LSH family's trade), no doubles anywhere
    * (the threshold runs as (den+num)·i >= num·(na+nb)).
    *
    * PRECONDITION: `idCol` must be UNIQUE per row (r16 ADVICE #3). The
    * r16 window collapse derives the representative table as
    * filter(_oid === _gid), which emits one rep row per (id, set) input
    * row bearing the group-min id — under duplicate ids that is MORE
    * rep rows than the r15 groupBy/min shape emitted, additionally
    * inflating token document frequencies and inter_n. Duplicate ids
    * were outside the contract in every prior shape too (the output
    * keys pairs by id), but the failure mode under violation changed
    * with the collapse re-key, so the contract — and the collapse's
    * exactness argument being CONDITIONED on it — is now explicit.
    *
    * EXECUTION CONTRACT: calling this RUNS the pipeline — the returned
    * frame is a materialized checkpoint (a table, not a lazy view), so
    * the operator's persist lifetime is self-contained. Plan-only
    * callers (schema inspection, plan audits) therefore pay full
    * compute and see a LogicalRDD, not the join tree.
    *
    * Exactness argument: order all distinct elements by ascending
    * global frequency (ties by value — a total order); a set of n
    * elements keeps its first n − ceil(t·n) + 1 as the prefix. If
    * J(A,B) >= t then |A∩B| >= t·max(|A|,|B|), and removing the
    * non-prefix (last ceil(t·n) − 1) elements of each side cannot erase
    * an overlap that large — the pair shares at least one PREFIX
    * element, so the equi-join on prefix elements finds it. The length
    * filter (den·min >= num·max, implied by J >= t) prunes candidates
    * without touching results. TextDedupSpec pins the exactness against
    * the brute-force definition.
    *
    * Scale shape: element frequency is one shuffle with map-side
    * partials; prefix ranking is a per-set window; join keys are by
    * construction each set's RAREST elements (the frequency order IS
    * the load balancer); verification explodes candidate pairs only.
    */
  def ppJoinPairs(base: DataFrame, idCol: String, shCol: String,
                  num: Int, den: Int,
                  policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val (pairs, release) = ppJoinPairsPlan(base, idCol, shCol, num, den)
    val out = policy.barrier(pairs)
    release()
    out
  }

  /** The LAZY plan behind [[ppJoinPairs]], plus a cache-release hook —
    * the plan-audit seam: the public operator materializes eagerly
    * (execution contract above), so its returned frame is a LogicalRDD
    * and the verify-stage join tree is not collectible from it.
    * PlanAuditSpec builds this form under the adversarial broadcast
    * threshold to pin the twilight-zone guards. Callers MUST invoke the
    * release hook exactly once after the frame is materialized (or the
    * audit is done) — the three intermediate persists otherwise outlive
    * the call.
    */
  private[graft] def ppJoinPairsPlan(
      base: DataFrame, idCol: String, shCol: String,
      num: Int, den: Int): (DataFrame, () => Unit) = {
    require(0 < num && num <= den, s"threshold $num/$den outside (0,1]")
    val w = org.apache.spark.sql.expressions.Window
    // Exact-duplicate collapse (the PPJoin+ duplicate-elimination step):
    // rows with IDENTICAL shingle arrays enter the quadratic machinery as
    // ONE representative (the group's min id) and the duplicate pairs are
    // expanded back afterward BY CONSTRUCTION — intra-group pairs have
    // jaccard exactly 1 (always ≥ any valid threshold) and every
    // cross-group member pair inherits its representatives' exact
    // inter/union counts (identical sets ⇒ identical counts). On a corpus
    // with duplicate multiplicity m the candidate/verify work drops m²-fold
    // while the (inherently quadratic-in-m) OUTPUT is reproduced exactly;
    // on an all-distinct corpus the collapse is one extra vocabulary-sized
    // shuffle. Grouping is BY THE ARRAY VALUE itself (no fingerprint, no
    // collision risk) — the arrays shuffle once to form groups.
    // Normalize to CANONICAL SETS first — sort + distinct: the contract
    // is set similarity, so duplicate elements must not double-count in
    // the intersection (they would make inter_n exceed union_n), and
    // [a,b] vs [b,a] must land in the SAME collapse group. Callers
    // passing already-distinct arrays (the shingle builders) pay one
    // cheap per-row pass.
    // Persist lifetime is SELF-CONTAINED: the returned pair set is
    // eagerly materialized (localCheckpoint) and the three intermediate
    // persists are released before returning, so long-lived sessions
    // (Cli, notebooks) calling this repeatedly don't accumulate cache
    // blocks until memory pressure evicts them. The eager materialize is
    // the cost a caller of an inherently-multi-pass operator pays anyway
    // (at cluster scale: a checkpoint to storage, same shape).
    val rows = base.select(col(idCol).as("_oid"),
        array_sort(array_distinct(col(shCol))).as("_osh"))
      .filter(size(col("_osh")) > 0)
    // Collapse WITHOUT a membership join (round 16): min(_oid) OVER a
    // window partitioned by the set value yields the member→rep map AND
    // (filtered to _oid == _gid) the representative table from ONE
    // shuffle — the r15 shape paid a groupBy shuffle plus a both-sides
    // array-KEYED SMJ, whose array sort key was the measured regression
    // the blanket guard bought (t52 100x ~30→~64 s). The partition key
    // leads with a fixed-width 64-bit STRUCTURAL hash of the canonical
    // array (xxhash64 over the array value itself — r19: the former
    // md5-of-NUL-joined-string built a multi-KB concat per row and ran
    // md5 over it inside the collapse stage, the operator's dominant
    // measured cost; xxhash64 streams the elements with no intermediate
    // string and no separator-ambiguity caveat), so shuffle-sort
    // comparisons are long-first; the array itself rides as the SECOND
    // partition key purely as an exactness tiebreak — a hash collision
    // merely co-locates two groups in one sort run, it can never merge
    // them, so the no-collision contract is structural, not
    // probabilistic. The hash is INTERNAL (partition key only, never in
    // any output), so the algorithm swap is invisible to every oracle.
    // The scalar-first key is also why no twilight-zone guard is needed
    // here anymore: there is no join left to mis-plan.
    val wg = w.partitionBy(col("_oshk"), col("_osh"))
    val withRep = rows
      .withColumn("_oshk", xxhash64(col("_osh")))
      .withColumn("_gid", min(col("_oid")).over(wg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val memb = withRep.select(col("_gid"), col("_oid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = withRep.filter(col("_oid") === col("_gid"))
      .select(col("_osh"), col("_oid").as("_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sets = groups.select(col("_id"), col("_osh").as("_sh"))
    // set size rides THROUGH the explode (r19): the arrays are distinct
    // by canonicalization, so size(_sh) ≡ the former count(*) window
    // over the exploded rows — carrying it as a column drops one of the
    // two window functions (same shuffle, half the window state; the
    // count was also the only full-frame window aggregate here)
    val tok = sets.select(col("_id"), size(col("_sh")).cast("long").as("_n"),
      explode(col("_sh")).as("_tok"))
    val dfreq = tok.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    val ranked = tok.join(dfreq, "_tok")
      .select(col("_id"), col("_tok"), col("_n"),
        row_number().over(
          w.partitionBy(col("_id")).orderBy(col("_df"), col("_tok"))).as("_rn"))
    val prefix = ranked
      .filter(col("_rn") <= col("_n") - expr(s"($num*_n + ${den - 1}) div $den") + 1)
      .select(col("_id"), col("_tok"), col("_n"))
    val cand = prefix.as("x")
      .join(prefix.as("y"),
        col("x._tok") === col("y._tok") && col("x._id") < col("y._id") &&
          lit(den.toLong) * col("y._n") >= lit(num.toLong) * col("x._n") &&
          lit(den.toLong) * col("x._n") >= lit(num.toLong) * col("y._n"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .distinct()
    // Verify stage: the token-equi-join shape, KEPT after an r19
    // experiment — the alternative (attach both canonical arrays per
    // pair by scalar id and run the IntersectCountSorted merge scan)
    // measured 0.72 → 1.17 s WORSE warm at sf0.1 once the attach sides
    // carried the mandatory twilight-zone guard: shingle-array
    // relations must never be broadcast builds (serialized rows run
    // ~15-20× their stats), so the attach joins become shuffle joins,
    // while THIS shape's non-pair sides (token and size relations) are
    // stats-honest scalar relations that legitimately ride broadcasts.
    // (Unguarded, the kernel shape wins 0.72 → 0.48 — the kernel is
    // fine, the guard's lost broadcasts are the cost. Row-identical
    // either way; measured diff 0.) Every join below with a
    // candidate/verified PAIR relation on one side carries the
    // twilight-zone guard ([[noBroadcastPairs]]): the pair side is
    // quadratic-capable and must never be a broadcast build, under any
    // conf/stats estimate — the token and size sides stay free to
    // broadcast when small.
    val inter = noBroadcastPairs(noBroadcastPairs(cand)
        .join(tok.select(col("_id").as("a"), col("_tok")), Seq("a")))
      .join(tok.select(col("_id").as("_idb"), col("_tok").as("_tok2")),
        col("b") === col("_idb") && col("_tok") === col("_tok2"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter_n"))
    val sizes = sets.select(col("_id"), size(col("_sh")).cast("long").as("_n"))
    val repPairs = noBroadcastPairs(noBroadcastPairs(inter)
        .join(sizes.select(col("_id").as("a"), col("_n").as("_na")), Seq("a")))
      .join(sizes.select(col("_id").as("b"), col("_n").as("_nb")), Seq("b"))
      .filter(lit((den + num).toLong) * col("inter_n") >=
        lit(num.toLong) * (col("_na") + col("_nb")))
      .select(col("a"), col("b"), col("inter_n"),
        (col("_na") + col("_nb") - col("inter_n")).as("union_n"))
    // expand representative pairs back to member pairs (cross-group), and
    // emit the intra-group pairs the collapse removed (jaccard 1:
    // inter = union = |set|); ids re-ordered so a < b holds member-wise
    val szByGid = groups
      .select(col("_id").as("_gid"), size(col("_osh")).cast("long").as("_gn"))
    val intra = noBroadcastPairs(memb.as("x")
        .join(memb.as("y"),
          col("x._gid") === col("y._gid") && col("x._oid") < col("y._oid"))
        .select(col("x._gid").as("_gid"),
          col("x._oid").as("a"), col("y._oid").as("b")))
      .join(szByGid, Seq("_gid"))
      .select(col("a"), col("b"),
        col("_gn").as("inter_n"), col("_gn").as("union_n"))
    val cross = noBroadcastPairs(noBroadcastPairs(repPairs)
        .join(memb.select(col("_gid").as("a"), col("_oid").as("_ida")), Seq("a")))
      .join(memb.select(col("_gid").as("b"), col("_oid").as("_idb")), Seq("b"))
      .select(least(col("_ida"), col("_idb")).as("a"),
        greatest(col("_ida"), col("_idb")).as("b"),
        col("inter_n"), col("union_n"))
    // the eager materialize (in the public ppJoinPairs) keeps the
    // operator's persist lifetime self-contained; `policy` decides where
    // it lands — executor-local blocks (default; non-replayable, fine
    // for local/bench) or a reliable storage checkpoint (the
    // ADVICE-flagged executor-loss trade at cluster scale — callers
    // wanting a NAMED durable artifact instead use the Artifacts.shared
    // parquet contract one level up)
    val release = () => {
      withRep.unpersist(false); groups.unpersist(false); memb.unpersist(false)
      ()
    }
    (cross.unionAll(intra), release)
  }
}
