package graft.leiden

import graft.SparkSpec
import graft.graph.EdgeTable
import graft.algo.{Components, PageRank}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants (SURVEY.md §5.2) over seeded random graphs.
  * Plain seeded sampling instead of a ScalaCheck runner: each property
  * evaluation runs real Spark jobs, so a handful of deterministic samples
  * beats hundreds of shrunk cases.
  */
class PropertySpec extends SparkSpec {

  def randomGraph(seed: Long, n: Int, p: Double) = {
    val rnd = new Random(seed)
    val es = for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < p)
      yield (a.toLong, b.toLong, (1 + rnd.nextInt(3)).toDouble)
    EdgeTable.undirected(spark, es)
  }

  test("a local-move sweep never decreases modularity from singletons") {
    for (seed <- Seq(11L, 42L, 97L, 1234L)) {
      val edges = randomGraph(seed, 24, 0.2).cache()
      val m = EdgeTable.totalWeight(edges) / 2
      if (m > 0) {
        val vtot = EdgeTable.vertexWeights(edges)
        val st0 = vtot.select(col("id"), col("id").as("comm"), col("vtot"), lit(true).as("aff"))
        val q0 = Modularity.modularity(edges, st0.select("id", "comm"), m)
        val swept = LocalMove.sweep(edges, st0, m, 1.0, 0).state
        val q1 = Modularity.modularity(edges, swept.select("id", "comm"), m)
        assert(q1 >= q0 - 1e-9, s"seed=$seed q0=$q0 q1=$q1")
      }
      edges.unpersist()
    }
  }

  test("final membership is total and single-valued; PageRank sums to 1; CC idempotent") {
    for (seed <- Seq(7L, 21L)) {
      val edges = randomGraph(seed, 30, 0.2).cache()
      val r = Leiden.detect(edges)
      assert(r.membership.groupBy("id").count().filter(col("count") =!= 1).count() === 0L)
      assert(r.membership.count() === EdgeTable.vertices(edges).count())
      val verts = EdgeTable.vertices(edges)
      val cc1 = Components.connectedComponents(edges, verts)
      val cc2 = Components.connectedComponents(edges, verts)
      assert(cc1.except(cc2).count() === 0L)
      val prSum = PageRank.run(edges, tol = 1e-10).agg(sum("rank")).head.getDouble(0)
      assert(approx(prSum, 1.0, 1e-9), s"seed=$seed prSum=$prSum")
      edges.unpersist()
    }
  }

  test("sketch candidate set contains every community above the 1/(k+1) weight share") {
    for (seed <- 1L to 20L; k <- Seq(2, 4, 8)) {
      val rnd = new Random(seed)
      val stream = Seq.fill(60)((rnd.nextInt(10).toLong, (1 + rnd.nextInt(4)).toDouble))
      val total = stream.map(_._2).sum
      val heavy = stream.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter(_._2 > total / (k + 1)).keySet
      val survivors = MGSketch.sequential(k, stream).map(_.comm).toSet
      assert(heavy.subsetOf(survivors), s"seed=$seed k=$k heavy=$heavy survivors=$survivors")
    }
  }
}
