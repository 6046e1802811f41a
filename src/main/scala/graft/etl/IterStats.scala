package graft.etl

/** Driver-side iteration counters for the fixpoint/convergence
  * operators (Lloyd passes, BPE merge rounds, label-propagation /
  * star-contraction rounds, PageRank rounds).
  *
  * Why: run-to-run variance on a fixpoint entry has two candidate
  * causes — box noise and a different iteration count — and without a
  * recorded count the attribution is argued from seed-stability
  * instead of read off the artifact. Each operator records the rounds
  * it actually executed; [[graft.Bench]] drains the records after each
  * query and publishes them as the bench JSON's `iters` field, so a
  * +0.8 s anomaly on e06/t46/t67 is settled by one look at the
  * artifact (count moved vs count constant ⇒ noise).
  *
  * Driver-side only (the loops run on the driver), so a plain
  * concurrent map keyed by tag is enough; within one query the LAST
  * record per tag wins ([[record]]) and additive passes accumulate
  * ([[add]]).
  */
object IterStats {
  private val pending =
    new java.util.concurrent.ConcurrentHashMap[String, Long]

  /** Record the rounds a loop executed (last call per tag wins). */
  def record(tag: String, n: Long): Unit = { pending.put(tag, n); () }

  /** Accumulate `n` onto `tag` — for operators invoked once per pass
    * (e.g. a k-means assignment stage built twice per query).
    */
  def add(tag: String, n: Long): Unit = {
    pending.merge(tag, n, (a, b) => a + b); ()
  }

  /** Records since the last drain; clears them. */
  def drain(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val out = pending.asScala.toMap
    pending.clear()
    out
  }
}
