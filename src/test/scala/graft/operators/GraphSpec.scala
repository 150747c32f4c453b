package graft.operators

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: the identical fixed-point recurrence in
    * driver-side BigInt arithmetic (no Spark, no float).
    */
  private def referencePageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000L, dampNum: Long = 85,
      dampDen: Long = 100): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val base = (dampDen - dampNum) * scale / dampDen
    var r: Map[Long, Long] = deg.map { case (n, _) => n -> scale }.toMap
    for (_ <- 1 to iters) {
      val inflow = edges
        .filter { case (s, _) => r.contains(s) }
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _) => BigInt(r(s) / deg(s)) }.sum
        }
      r = deg.map { case (n, _) =>
        val f = inflow.getOrElse(n, BigInt(0))
        n -> (base + (BigInt(dampNum) * f / dampDen)).toLong
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap

  test("2-cycle is symmetric and stationary at full mass") {
    // each node forwards its whole rank to the other: r stays `scale`
    // up to damping: r' = 0.15 + 0.85*r; fixpoint at scale exactly
    val edges = Seq((1L, 2L), (2L, 1L))
    for (iters <- Seq(1, 3, 7)) {
      val got = run(edges, iters)
      assert(got == Map(1L -> 1000000000L, 2L -> 1000000000L),
        s"iters=$iters: $got")
    }
  }

  test("matches the driver-side BigInt recurrence on a directed graph") {
    // a small web: hub (1) pointed at by everyone, a chain, a cycle
    val edges = Seq(
      (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 2L),
      (2L, 4L), (3L, 5L))
    for (iters <- Seq(0, 1, 2, 4)) {
      assert(run(edges, iters) == referencePageRank(edges, iters),
        s"iters=$iters")
    }
  }

  test("hub outranks leaves; source-only nodes stay at the teleport floor") {
    // star: leaves 2..6 all point at 1; 1 points at 2 (so node 1 has
    // out-degree). node 7 points at 8's... no: 7 -> 1 only, nothing
    // points back at 7 — after one round 7 sits at base + 0.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L),
      (1L, 2L), (7L, 1L))
    val got = run(edges, 3)
    val ref = referencePageRank(edges, 3)
    assert(got == ref)
    assert(got(1L) > got(2L) && got(2L) > got(7L))
    // 7 receives nothing: exactly the teleport floor after round 1+
    assert(got(7L) == 150000000L)
  }

  test("iters=0 returns the uniform start for every out-degree node") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 0)
    assert(got == Map(1L -> 1000000000L, 2L -> 1000000000L,
      3L -> 1000000000L))
  }

  test("undirected (bidirectional) graph conserves mass within truncation") {
    // bidirectional edges: total fixed-point mass stays within
    // n_edges units of n_nodes * scale (each `div` loses < 1 unit)
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    val got = run(edges, 5)
    val total = got.values.sum
    val ideal = 4L * 1000000000L
    // loss bound: < 1 unit per edge-div + 1 per damping-div, per round
    assert(total <= ideal && total >= ideal - 5 * (edges.size + 4 + 1),
      s"mass $total vs ideal $ideal")
  }
}
