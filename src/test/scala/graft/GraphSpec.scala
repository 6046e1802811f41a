package graft

import org.apache.spark.sql.functions._

import graft.etl.{Dedup, Graph}

/** Connected-components cross-check: large-star/small-star
  * ([[Graph.connectedComponentsLSS]]) must produce the exact labeling of
  * min-label propagation ([[Dedup.resolveClusters]]) on structures
  * chosen to stress each algorithm's weak spot — long chains (diameter
  * >> log n, where propagation is slow) and celebrity stars (hub degree
  * = component size, where neighbor-list formulations blow up).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)],
                       f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
    f(pairs.toDF("a", "b"))
      .select(col("doc_id"), col("cluster_rep"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  private def crossCheck(pairs: Seq[(Long, Long)]): Unit = {
    val lss = labelsOf(pairs, Graph.connectedComponentsLSS(_))
    val prop = labelsOf(pairs, Dedup.resolveClusters(_, maxIter = 200))
    assert(lss == prop, s"LSS vs propagation disagree on $pairs")
    // every node labeled, label = component min ≤ node id
    assert(lss.forall { case (id, rep) => rep <= id })
  }

  test("long chain: 60-hop path resolves to one cluster in O(log n) rounds") {
    // path 0-1-2-…-60: diameter 60; LSS must converge well inside its
    // default 15-round budget (propagation needs 60+ rounds)
    val chain = (0L until 60L).map(i => (i, i + 1))
    val lss = labelsOf(chain, Graph.connectedComponentsLSS(_))
    assert(lss.forall(_._2 == 0L), s"chain must collapse to rep 0: $lss")
    val prop = labelsOf(chain, Dedup.resolveClusters(_, maxIter = 200))
    assert(lss == prop)
  }

  test("mixed structures: star, triangle+tail, isolated pair, two chains") {
    val star = (1L to 20L).map(i => (100L, 100L + i)) // celebrity hub
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L), (202L, 203L))
    val pair = Seq((300L, 301L))
    val chainA = (400L until 410L).map(i => (i, i + 1))
    val chainB = (500L until 520L).map(i => (i + 1, i)) // reversed order
    crossCheck(star ++ tri ++ pair ++ chainA ++ chainB)
  }

  test("duplicate and reversed edges don't change the labeling") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val noisy = base ++ base.map(_.swap) ++ base // dups both directions
    assert(labelsOf(noisy, Graph.connectedComponentsLSS(_)) ==
      labelsOf(base, Graph.connectedComponentsLSS(_)))
  }

  test("self-pair-only nodes survive as singleton clusters (≡ propagation)") {
    // node 9 appears ONLY as a self-pair: the self-edge filter drops its
    // edges, but the node must still label itself — resolveClusters
    // does, and the operators are documented interchangeable
    crossCheck(Seq((1L, 2L), (9L, 9L), (2L, 3L)))
    val lss = labelsOf(Seq((7L, 7L)), Graph.connectedComponentsLSS(_))
    assert(lss == Seq((7L, 7L)), s"self-pair-only node lost: $lss")
  }

  test("dangling pageRank: sinks keep their mass in the system") {
    // star with planted sinks: 1..4 each link to sink 10 and hub 11;
    // 10 and 11 have NO out-edges (dangling). Without redistribution
    // the sinks would absorb and leak ~all mass toward the teleport
    // floor; with it total mass stays ≈ N·1e6 up to integer floor loss.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L),
      (1L, 11L), (2L, 11L), (3L, 11L), (4L, 11L)).toDF("src", "dst")
    val pr = Graph.pageRankDanglingMicro(edges, 3)
      .as[(Long, Long)].collect().toMap
    val n = 6
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L))
    val total = pr.values.sum
    // each round loses < 1 micro-unit per node per floor division (three
    // floors: contribution, share, damping) — bound generously
    assert(total <= n * 1000000L && total > n * 1000000L - 3 * 3 * n - 100,
      s"mass not conserved: $total vs ${n * 1000000L}")
    // symmetric sources tie; sinks receive strictly more than sources
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L) && pr(3L) == pr(4L))
    assert(pr(10L) == pr(11L) && pr(10L) > pr(1L))
  }

  test("dangling pageRank == pageRankMicro when no node is dangling") {
    // on a bidirected graph the sink set is empty, dm = 0 and the share
    // term vanishes — the generalization must reduce to the base operator
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val base = Graph.pageRankMicro(edges, 3).as[(Long, Long)].collect().toSet
    val gen = Graph.pageRankDanglingMicro(edges, 3).as[(Long, Long)].collect().toSet
    assert(base == gen)
  }

  test("dangling pageRank round never re-shuffles the edge table") {
    // same discipline as the base operator's one-exchange pin, relaxed
    // for the two O(1)-output additions (the dangling-mass scalar agg
    // plans a SinglePartition exchange of partial sums; the share joins
    // back as a broadcast, never a hash exchange): the EDGE-sized table
    // must still satisfy its SMJ from the pre-partitioned checkpoint.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (11L, 2L))
      .toDF("src", "dst")
    val pr = Graph.pageRankDanglingMicro(edges, 2)
    val plan = pr.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(src"),
      s"edge side of the round join re-shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scalar share must broadcast, not cartesian:\n$plan")
  }

  test("pageRank round plans exactly one node-sized exchange") {
    // the pre-partitioned+sorted edge/node checkpoints must leave a
    // round's SMJs exchange-free and sort-free: the only shuffle left
    // is the contribution partials moving to their dst. Static planning
    // (Bench's configuration) — AQE re-inserts managed exchanges over
    // checkpoint partitioning, which is a latency choice, not a
    // correctness one (AqeParitySpec pins result parity).
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pageRankMicro(edges, 2)
    val plan = pr.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"expected exactly 1 shuffle in the final round's plan, got $shuffles:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(src"),
      s"edge side of the round join still shuffles:\n$plan")
  }
}
