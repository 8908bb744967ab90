package graft.algo

import graft.SparkSpec
import graft.graph.EdgeTable
import org.apache.spark.sql.functions._
import scala.util.Random

class AlgoSpec extends SparkSpec {

  def clique(ids: Seq[Long]): Seq[(Long, Long, Double)] =
    for (a <- ids; b <- ids if a < b) yield (a, b, 1.0)

  test("pagerank: cycle is uniform, ranks sum to 1 (F4)") {
    val n = 8
    val cyc = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong, 1.0))
    val edges = EdgeTable.of(spark, cyc)
    val pr = PageRank.run(edges).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v => assert(approx(v, 1.0 / n, 1e-9)))
    assert(approx(pr.values.sum, 1.0, 1e-9))
  }

  test("pagerank: seeded random digraph matches sequential oracle to 1e-6 (F4)") {
    val rnd = new Random(42)
    val es = (for (a <- 0 until 34; b <- 0 until 34 if a != b && rnd.nextDouble() < 0.12)
      yield (a.toLong, b.toLong, 1.0 + rnd.nextInt(3).toDouble))
    val edges = EdgeTable.of(spark, es)
    // tol pinned below the 1e-6 comparison bound so an off-by-one-iteration
    // stop between the two implementations cannot masquerade as a mismatch.
    // Both execution paths are pinned: the driver-local tail (default
    // threshold — this graph is far below it) AND the distributed plan
    // (threshold 0 forces it), each allclose 1e-6 to the sequential oracle.
    val want = PageRank.sequential(es, tol = 1e-9)
    // all three tiers: driver-local tail (default threshold), dense
    // shared-array kernel (threshold 0, local master, dense ids), and the
    // Catalyst distributed plan (threshold 0, denseKernel=false pins it)
    for ((thresh, dense) <- Seq((2000000L, true), (0L, true), (0L, false))) {
      val got = PageRank.run(edges, tol = 1e-9, localEdgeThreshold = thresh,
          denseKernel = dense)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) => assert(approx(v, want(k), 1e-6), s"thresh=$thresh dense=$dense vertex $k: $v vs ${want(k)}") }
      assert(approx(got.values.sum, 1.0, 1e-9))
    }
  }

  test("pagerank fixed-iteration nano-ranks: tail, distributed, sequential agree") {
    // the g_pagerank_k5 oracle contract: 5 fixed power iterations rounded
    // to integer nano-ranks are identical whatever the execution path or
    // summation order (the double noise between paths is ~1e-16 relative,
    // ~1e10x below the 1e-9 grid)
    val rnd = new Random(7)
    val es = (for (a <- 0 until 34; b <- 0 until 34 if a != b && rnd.nextDouble() < 0.12)
      yield (a.toLong, b.toLong, 1.0 + rnd.nextInt(3).toDouble))
    val edges = EdgeTable.of(spark, es)
    def nano(m: Map[Long, Double]) =
      m.view.mapValues(v => math.floor(v * 1e9 + 0.5).toLong).toMap
    val want = nano(PageRank.sequential(es, tol = 0.0, maxIters = 5))
    for ((thresh, dense) <- Seq((2000000L, true), (0L, true), (0L, false))) {
      val got = nano(PageRank.run(edges, tol = 0.0, maxIters = 5,
          localEdgeThreshold = thresh, denseKernel = dense)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
      assert(got === want, s"thresh=$thresh dense=$dense")
    }
  }

  test("connected components: forest of 3 trees gets min-id labels (F4)") {
    val es = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), // tree A
      (10L, 11L, 1.0), // tree B
      (20L, 21L, 1.0), (21L, 22L, 1.0), (22L, 23L, 1.0)) // tree C
    val edges = EdgeTable.undirected(spark, es)
    val cc = Components.connectedComponents(edges, EdgeTable.vertices(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    assert(Components.componentCount(
      Components.connectedComponents(edges, EdgeTable.vertices(edges))) === 3L)
  }

  test("label propagation: two cliques + bridge split into two label groups") {
    val edges = EdgeTable.undirected(spark,
      clique(0L to 3L) ++ clique(4L to 7L) :+ ((3L, 4L, 1.0)))
    val labels = LabelProp.run(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).map(labels).toSet.size === 1)
    assert((4L to 7L).map(labels).toSet.size === 1)
    assert(labels(0L) !== labels(7L))
  }

  test("label propagation recovers a modular SBM's blocks (collapse on dense graphs is graph-truth)") {
    // the driver's sf0.01 co-purchase graph collapses to ONE label — this
    // pins that the collapse is epidemic behavior of that dense graph, not
    // the incumbent-stability rule over-favoring current labels: on a
    // modular graph LPA recovers the planted blocks exactly
    val rnd = new Random(11)
    val es = Seq.newBuilder[(Long, Long, Double)]
    for (a <- 0 until 120; b <- a + 1 until 120) {
      val p = if (a / 30 == b / 30) 0.3 else 0.01
      if (rnd.nextDouble() < p) es += ((a.toLong, b.toLong, 1.0))
    }
    val edges = EdgeTable.undirected(spark, es.result())
    val groups = LabelProp.run(edges).collect().groupBy(_.getLong(1))
      .values.map(_.map(_.getLong(0) / 30).toSet).toList
    assert(groups.size === 4, s"labels=${groups.size}")
    assert(groups.forall(_.size == 1), "every label group lies within one planted block")
  }

  test("low-memory LPA (MG sketch + exact re-score) recovers the same SBM blocks") {
    val rnd = new Random(11)
    val es = Seq.newBuilder[(Long, Long, Double)]
    for (a <- 0 until 120; b <- a + 1 until 120) {
      val p = if (a / 30 == b / 30) 0.3 else 0.01
      if (rnd.nextDouble() < p) es += ((a.toLong, b.toLong, 1.0))
    }
    val edges = EdgeTable.undirected(spark, es.result())
    // k=8 slots: far fewer than a vertex's distinct neighbor labels in the
    // first rounds, so the sketch path is genuinely exercised. Exact label
    // VALUES may differ from the exact run (round-0 streams are all-ties,
    // below every 1/(k+1) survival share); the contract is the recovered
    // partition: the four planted blocks, exactly — the same bar the exact
    // run is held to above.
    val groups = LabelProp.run(edges, sketchSlots = 8).collect().groupBy(_.getLong(1))
      .values.map(_.map(_.getLong(0) / 30).toSet).toList
    assert(groups.size === 4, s"labels=${groups.size}")
    assert(groups.forall(_.size == 1), "every label group lies within one planted block")
  }

  test("g_lpa golden: committed SHA-256 of the full sf0.001 label assignment") {
    // the driver's g_lpa query is rows-only (iterative fixpoint); the
    // tie-breaks and weights are fully deterministic, so the complete
    // (id, label) assignment on the fixed sf0.001 co-purchase graph is
    // pinned by content hash (the PagesSpec p_link_edges device)
    val labels = LabelProp.run(graft.SparkEntry.copurchaseSym(spark, "/root/testdata/sf0.001"))
      .orderBy("id").collect().map(r => s"${r.getLong(0)},${r.getLong(1)}")
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(labels.mkString("\n").getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(labels.length === 200)
    assert(h === "86888741fed60597bfbb8c9c8487803e6ecdc24de1e0a926ec519ec3ed1eb412")
  }

  test("DFS (T2): pre/post orders with ascending-neighbor rule; unreachable absent") {
    // directed: 0->{1,2}, 1->3, 2->3, 4 isolated-from-source
    val spark2 = spark
    import spark2.implicits._
    val e = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (4L, 0L, 1.0))
      .toDF("src", "dst", "w")
    val o = Dfs.run(e, 0L).collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // ascending-neighbor DFS from 0: visit 0,1,3 (3's nbrs empty), back to 0, then 2
    assert(o === Map(0L -> ((0, 3)), 1L -> ((1, 1)), 3L -> ((2, 0)), 2L -> ((3, 2))))
    assert(!o.contains(4L)) // 4 reaches 0, but 0 does not reach 4
    // edge bound is enforced, not silently truncated
    intercept[IllegalArgumentException](Dfs.run(e, 0L, maxEdges = 2))
  }

  test("triangles: two K4 + bridge = 8 triangles, 3 per clique vertex; cycle has 0 (F4)") {
    val edges = EdgeTable.undirected(spark,
      clique(0L to 3L) ++ clique(4L to 7L) :+ ((3L, 4L, 1.0)))
    assert(Triangles.globalCount(edges) === 8L)
    val pv = Triangles.perVertex(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 7L).foreach(v => assert(pv(v) === 3L, s"vertex $v"))
    val cyc = EdgeTable.undirected(spark, (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong, 1.0)))
    assert(Triangles.globalCount(cyc) === 0L)
  }

  test("triangles: brute-force oracle on a seeded graph (F4)") {
    val rnd = new Random(7)
    val n = 20
    val pairs = for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.3)
      yield (a.toLong, b.toLong, 1.0)
    val edges = EdgeTable.undirected(spark, pairs)
    val adj = pairs.map(p => (p._1, p._2)).toSet
    def has(a: Long, b: Long) = adj.contains((math.min(a, b), math.max(a, b)))
    var brute = 0L
    for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n)
      if (has(a, b) && has(b, c) && has(a, c)) brute += 1
    assert(Triangles.globalCount(edges) === brute)
  }

  test("triangles: kernel tier == Catalyst join plan, incl. asymmetric input and gate fallback") {
    val rnd = new Random(11)
    // symmetric seeded graph
    val symPairs = for (a <- 0 until 40; b <- a + 1 until 40 if rnd.nextDouble() < 0.2)
      yield (a.toLong, b.toLong, 1.0)
    val sym = EdgeTable.undirected(spark, symPairs)
    assert(Triangles.kernelCount(sym) === Some(Triangles.triangles(sym).count()))
    // ASYMMETRIC directed input (only some reverse edges present): the
    // kernel must reproduce the join plan's orientation semantics exactly
    val asymm = (for (a <- 0 until 30; b <- 0 until 30
                      if a != b && rnd.nextDouble() < 0.25)
      yield (a.toLong, b.toLong, 1.0))
    val asymmDf = EdgeTable.of(spark, asymm)
    assert(Triangles.kernelCount(asymmDf) === Some(Triangles.triangles(asymmDf).count()))
    // huge-id graph fails the dense gate: kernelCount declines, globalCount
    // falls back to the join plan and still counts correctly
    val shifted = EdgeTable.undirected(spark,
      clique(0L to 3L).map { case (a, b, w) => (a + 5000000000L, b + 5000000000L, w) })
    assert(Triangles.kernelCount(shifted) === None)
    assert(Triangles.globalCount(shifted) === 4L)
    // simpleInput contract: on an input that IS a simple symmetric pair set
    // the distinct-skipping feed counts identically to the defensive path
    assert(Triangles.kernelCount(sym, simpleInput = true) ===
      Triangles.kernelCount(sym))
    assert(Triangles.globalCount(sym, simpleInput = true) ===
      Triangles.globalCount(sym))
  }
}
