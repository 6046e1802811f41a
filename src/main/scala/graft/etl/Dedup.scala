package graft.etl

import org.apache.spark.sql.DataFrame
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
    * ONE md5 per shingle; the k hash family members are affine transforms
    * of that base hash ([[Portable.minhashTransform]]) — integer-only,
    * overflow-free, bit-identical in the DuckDB oracle. The k mins are
    * map-side-partial aggregates over a single shuffle on the id.
    */
  def minhashSignatures(base: DataFrame, idCol: String, shCol: String, k: Int): DataFrame = {
    val consts = Portable.minhashConsts(k)
    val ex = base.select(col(idCol), explode(col(shCol)).as("_s"))
      .select(col(idCol), Portable.hash60(col("_s")).as("_h"))
    val aggs = consts.zipWithIndex.map { case (c, i) =>
      min(Portable.minhashTransform(col("_h"), c)).as(s"m$i")
    }
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Signature matrix → distinct candidate id pairs (a < b) via banded LSH
    * with a bucket-size cap.
    */
  def bandCandidates(
      sig: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      maxBucket: Int): DataFrame = {
    val bandCols = (0 until numBands).map { b =>
      val ms = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i"))
      struct(lit(b).as("bidx"), Portable.hash60(concat_ws("|", ms: _*), 1000 + b).as("bh"))
    }
    val banded = sig
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.bidx").as("bidx"), col("band.bh").as("bh"))
    val small = banded
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bidx"), col("bh"))))
      .filter(col("_n") <= maxBucket)
      .drop("_n")
    small.as("x")
      .join(small.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
  }

  /** Join candidates back to shingle sets and keep pairs with exact
    * Jaccard ≥ threshold.
    */
  def verifyJaccard(
      base: DataFrame,
      idCol: String,
      shCol: String,
      cand: DataFrame,
      threshold: Double): DataFrame = {
    val sa = base.select(col(idCol).as("a"), col(shCol).as("_sha"))
    val sb = base.select(col(idCol).as("b"), col(shCol).as("_shb"))
    cand.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        round(Portable.jaccard(col("_sha"), col("_shb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
