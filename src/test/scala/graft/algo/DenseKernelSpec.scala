package graft.algo

import graft.SparkSpec
import graft.graph.EdgeTable
import scala.util.Random

/** The dense shared-array CC/BFS kernels (DenseKernel) against both a
  * sequential oracle and the Catalyst join-iterate tier they stand in for
  * on local masters. Both results are exact integers (min reachable id,
  * hop count), so parity is equality, not tolerance.
  */
class DenseKernelSpec extends SparkSpec {

  /** Seeded sparse undirected graph with several components + isolates. */
  private def fixture(seed: Int, n: Int, p: Double): Seq[(Long, Long, Double)] = {
    val rnd = new Random(seed)
    // forbid edges across k residue classes to force >=2 components
    (for (a <- 0 until n; b <- 0 until n
          if a < b && (a % 3) == (b % 3) && rnd.nextDouble() < p)
      yield (a.toLong, b.toLong, 1.0))
  }

  private def seqCC(n: Int, es: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val lab = Array.tabulate(n)(identity)
    var changed = true
    while (changed) {
      changed = false
      es.foreach { case (a, b, _) =>
        val (x, y) = (a.toInt, b.toInt)
        if (lab(x) < lab(y)) { lab(y) = lab(x); changed = true }
        else if (lab(y) < lab(x)) { lab(x) = lab(y); changed = true }
      }
    }
    (0 until n).map(i => i.toLong -> lab(i).toLong).toMap
  }

  private def seqBfs(n: Int, es: Seq[(Long, Long, Double)], src: Int,
                     maxDepth: Int): Map[Long, Long] = {
    val adj = Array.fill(n)(List.empty[Int])
    es.foreach { case (a, b, _) =>
      adj(a.toInt) ::= b.toInt; adj(b.toInt) ::= a.toInt
    }
    val dist = Array.fill(n)(-1)
    dist(src) = 0
    var frontier = List(src)
    var d = 0
    while (frontier.nonEmpty && d < maxDepth) {
      d += 1
      frontier = frontier.flatMap(adj).filter { v =>
        if (dist(v) < 0) { dist(v) = d; true } else false
      }
    }
    (0 until n).collect { case i if dist(i) >= 0 => i.toLong -> dist(i).toLong }.toMap
  }

  test("dense CC kernel equals sequential oracle and the Catalyst tier") {
    val n = 120
    val es = fixture(11, n, 0.05)
    val edges = EdgeTable.symmetrize(EdgeTable.of(spark, es))
    val verts = spark.range(n).toDF("id")
    val kernel = Components.connectedComponents(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // maxIters below the kernel gate forces the join-iterate Catalyst plan
    val catalyst = Components.connectedComponents(edges, verts, maxIters = 199)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = seqCC(n, es)
    assert(kernel === want)
    assert(catalyst === want)
  }

  test("dense CC kernel: path graph (worst diameter for round counting)") {
    val n = 300
    val es = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong, 1.0))
    val edges = EdgeTable.symmetrize(EdgeTable.of(spark, es))
    val verts = spark.range(n).toDF("id")
    val got = Components.connectedComponents(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0 until n).map(i => i.toLong -> 0L).toMap)
  }

  test("dense BFS kernel equals sequential oracle at full and truncated depth") {
    val n = 120
    val es = fixture(23, n, 0.04)
    val edges = EdgeTable.symmetrize(EdgeTable.of(spark, es))
    for (depth <- Seq(200, 2)) {
      val got = Bfs.run(edges, spark.range(1).selectExpr("0L as id"), maxDepth = depth)
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      assert(got === seqBfs(n, es, 0, depth), s"depth=$depth")
    }
  }

  test("dense BFS kernel: unreached vertices are absent, sources are dist 0") {
    val es = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (5L, 6L, 1.0))
    val edges = EdgeTable.symmetrize(EdgeTable.of(spark, es))
    val got = Bfs.run(edges, spark.range(1).selectExpr("0L as id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2))
  }
}
