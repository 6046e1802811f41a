package graft.etl

import org.apache.spark.sql.Dataset

/** Misra-Gries heavy-hitter candidate generation.
  *
  * The scale problem: "which tokens exceed φ of the corpus?" answered
  * with a plain `groupBy(token).count()` shuffles the ENTIRE long-tail
  * token table — at 100 TB that is billions of distinct keys moved to
  * answer a question about a few hundred. The two-phase shape here is
  * the classic fix (Misra-Gries 1982; merged-summary guarantee per
  * Agarwal et al., PODS'12):
  *
  *   phase 1 — each partition folds its tokens through a k-counter
  *     Misra-Gries summary (bounded state, no shuffle) and emits only
  *     its surviving keys: ≤ k rows per partition. MG guarantees any
  *     item with partition frequency > n_p/(k+1) survives; pigeonhole
  *     lifts that to the corpus — an item with global count ≥ N/(k+1)
  *     exceeds n_p/(k+1) in at least one partition. With k ≥ 1/φ the
  *     candidate set therefore has NO false negatives at threshold φN.
  *   phase 2 — exact counts for the candidates only (broadcast
  *     semi-join: the corpus is probed map-side, never shuffled on the
  *     long tail) and the exact threshold filter. False positives from
  *     phase 1 die here, so the OUTPUT is exact even though the
  *     candidate set depends on partitioning and arrival order.
  *
  * Candidate volume is ≤ k × numPartitions. At extreme partition
  * counts (100k+) either raise φ, or interpose a second MG pass over
  * the per-partition candidate counts before the exact phase — the
  * summaries merge with the same guarantee.
  */
object HeavyHitters {

  /** Per-partition MG(k) survivors — a SUPERSET of every item with
    * global frequency ≥ N/(k+1) (see object doc), deduplicated by the
    * caller. Typed mapPartitions (object iterator, no UDF): state is
    * exactly k counters.
    */
  def mgCandidates(toks: Dataset[String], k: Int): Dataset[String] = {
    // k = 0 would silently emit NOTHING (every token takes the decrement
    // branch over an empty counter map) — a total false negative where
    // the guarantee above promises a superset; fail loudly instead
    require(k >= 1, s"Misra-Gries needs at least one counter, got $k")
    import toks.sparkSession.implicits._
    toks.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // MG decrement step: all k counters drop by one, zeros evict
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }
  }
}
