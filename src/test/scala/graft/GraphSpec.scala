package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank (q108): the fixed-point integer recurrence must match a
  * plain-Scala model exactly, be bitwise stable across partitionings
  * (integer sums are associative — the whole point of the fixed-point
  * form), conserve mass up to floor losses, and cost exactly ONE
  * shuffle per power iteration. */
class GraphSpec extends SparkSuite {

  private val Scale = 1000000000000L

  /** Driver-side re-statement of the recurrence in Graph.pageRankFixed
    * (same floor-division order), over an explicit edge list. */
  private def model(nodes: Seq[Long], directed: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val und = (directed ++ directed.map(e => (e._2, e._1))).distinct
    val n = nodes.size
    val init = Scale / n
    val tele = Scale * 15 / 100 / n
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nonIso = und.map(_._1).distinct
    var rank = nonIso.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      rank = und
        .map { case (s, d) => d -> (rank(s) * 85 / 100 / deg(s)) }
        .groupBy(_._1)
        .map { case (d, cs) => d -> (tele + cs.map(_._2).sum) }
    }
    rank ++ nodes.filterNot(nonIso.contains).map(_ -> tele)
  }

  private def run(nodes: Seq[Long], directed: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val s = initSpark()
    import s.implicits._
    val nodesDf = nodes.toDF("node_id")
    val edgesDf = Graph.undirect(directed.toDF("a", "b"), "a", "b")
    Graph.pageRankFixed(s, nodesDf, edgesDf, "node_id", "src", "dst",
        iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // path 1-2-3 plus a star at 10, node 99 isolated: asymmetric degrees
  // (2 has outdeg 2, leaves outdeg 1) so the division order matters
  private val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 99L)
  private val edges =
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (10L, 13L))

  test("pageRankFixed replays the integer recurrence exactly") {
    for (iters <- Seq(1, 3, 5)) {
      assert(run(nodes, edges, iters) === model(nodes, edges, iters),
        s"iters=$iters")
    }
    // and the isolated node holds exactly the teleport term
    assert(run(nodes, edges, 5)(99L) === Scale * 15 / 100 / nodes.size)
  }

  test("ranks are bitwise identical across input partitionings") {
    val s = initSpark()
    import s.implicits._
    val nodesDf = nodes.toDF("node_id")
    val base = Graph.undirect(edges.toDF("a", "b"), "a", "b")
    val byParts = Seq(1, 3, 17).map { p =>
      Graph.pageRankFixed(s, nodesDf.repartition(p),
          base.repartition(p), "node_id", "src", "dst", iters = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        .toSeq
    }
    assert(byParts.distinct.size === 1,
      "fixed-point ranks drifted across partitionings")
  }

  test("mass is conserved up to floor losses + the documented " +
      "isolated-node leak") {
    val got = run(nodes, edges, 5)
    val total = got.values.sum
    // isolated nodes keep teleport but never re-emit: their damped
    // share (85% of one init each) leaves the system ONCE, in
    // iteration 1, and the total is stable thereafter (the documented
    // simplification in Graph.pageRankFixed). On top of that, every
    // floor division loses < 1 unit: init (n), per-iteration per-edge
    // two divisions (2*E directed edges) + teleport (n).
    val isolatedLeak = (Scale / nodes.size) * 85 / 100 // one node
    val undirectedE = edges.size * 2
    val slack = nodes.size + 5 * (2 * undirectedE + nodes.size)
    assert(total <= Scale - isolatedLeak + slack,
      s"mass grew past the leak model: $total")
    assert(total >= Scale - isolatedLeak - slack,
      s"mass leaked beyond floor losses: $total < " +
        s"${Scale - isolatedLeak - slack}")
  }

  test("DIRECTED edge lists are exact: dst-only nodes appear exactly " +
      "once, source-only nodes hold teleport, mass never exceeds scale") {
    val s = initSpark()
    import s.implicits._
    // 4 -> 2 -> 3, 1 -> 2: node 3 is dst-only (the double-count bug
    // surface), 1 and 4 are source-only, 99 isolated
    val dNodes = Seq(1L, 2L, 3L, 4L, 99L)
    val dEdges = Seq((1L, 2L), (2L, 3L), (4L, 2L))
    val got = Graph.pageRankFixed(s, dNodes.toDF("node_id"),
        dEdges.toDF("src", "dst"), "node_id", "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // exactly one row per node — the r9 form emitted dst-only nodes
    // twice (loop row + "isolated" row)
    assert(got.map(_._1).sorted === dNodes.sorted)
    val gotMap = got.toMap
    val n = dNodes.size
    val init = Scale / n
    val tele = Scale * 15 / 100 / n
    // driver-side replay of the documented directed semantics:
    // receivers accumulate, non-receivers coalesce to teleport
    val deg = dEdges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = dEdges.map(_._1).distinct.map(_ -> init).toMap
    for (_ <- 1 to 3) {
      rank = dEdges
        .map { case (sr, d) =>
          d -> (rank.getOrElse(sr, tele) * 85 / 100 / deg(sr)) }
        .groupBy(_._1)
        .map { case (d, cs) => d -> (tele + cs.map(_._2).sum) }
    }
    val want = dNodes.map(v => v -> rank.getOrElse(v, tele)).toMap
    assert(gotMap === want)
    // source-only and isolated nodes hold exactly the teleport term
    assert(gotMap(1L) === tele)
    assert(gotMap(4L) === tele)
    assert(gotMap(99L) === tele)
    // dangling leak (node 3 re-emits nothing) only ever SHRINKS mass
    assert(gotMap.values.sum <= Scale)
  }

  test("one extra power iteration costs exactly one extra shuffle") {
    val s = initSpark()
    val dir = "/root/testdata/sf0.001"
    def exchanges(iters: Int): Int = {
      val base = s.read.parquet(s"$dir/orders.parquet")
        .join(s.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000L)).as("dst"))
      val nodesDf = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("node_id"))
      val df = Graph.pageRankFixed(s, nodesDf,
        Graph.undirect(base, "src", "dst"), "node_id", "src", "dst",
        iters)
      // count REAL shuffle operators: executedPlan (EnsureRequirements
      // has run — sparkPlan has no requirement-inserted exchanges yet),
      // AQE off so the plan is a plain tree, and collect() so the
      // cached edge relation's inner plan (a leaf here) isn't
      // re-counted per reference the way line-counting would
      df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.size
    }
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val twoMore = exchanges(4) - exchanges(2)
      assert(twoMore === 2,
        s"2 extra iterations should add exactly 2 shuffles (the per-" +
          s"round contribution groupBy, nothing else), added $twoMore")
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("deep-iteration checkpointing changes the plan, never the ranks") {
    val s = initSpark()
    import s.implicits._
    val nodesDf = nodes.toDF("node_id")
    val edgesDf = Graph.undirect(edges.toDF("a", "b"), "a", "b")
    def ranksWith(every: Int): Map[Long, Long] =
      Graph.pageRankFixed(s, nodesDf, edgesDf, "node_id", "src", "dst",
          iters = 11, checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every=3 checkpoints mid-loop 3 times; every=1000 never does —
    // the fixed-point integers must agree bit-for-bit either way, and
    // both must equal the driver-side model
    val ckpt = ranksWith(3)
    assert(ckpt === ranksWith(1000))
    assert(ckpt === model(nodes, edges, 11))
  }
}
