package graft.leiden

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P4 (SURVEY.md §2.2): the partition-local CSR first pass.
  *
  * The reference's first local-moving pass is asynchronous: threads sweep
  * vertices in parallel, each reading whatever mixture of old and new
  * community assignments its neighbors currently hold
  * (`/root/reference/inc/leiden.hxx:409-435`, relaxed atomics at
  * `:359-384`). The distributed analog here: edges arrive hash-partitioned
  * by `src`, so a partition holds EVERY out-edge of each of its source
  * vertices (the input is symmetric, so out-edges = all incident edges).
  * Each partition builds a local CSR over its vertices and runs bounded
  * asynchronous local-move sweeps against STALE remote state — a remote
  * neighbor is held at its singleton community with ctot = vtot(neighbor),
  * exactly what a reference thread sees before another thread's first
  * update lands.
  *
  * The emitted (id, comm) membership is a WARM-START SEED, not a final
  * answer: Leiden accepts any membership as its pass-0 initialization (the
  * `fi` hook), and the synchronous distributed sweeps then correct every
  * stale-remote artifact — convergence criteria are unchanged. The payoff
  * is at scale: the first pass does the overwhelming majority of all moves
  * (singletons collapsing into communities), and this pass does those moves
  * with ZERO shuffled bytes beyond the one-time vtot join — each Spark task
  * is the twin of one reference OpenMP thread. Opt-in via
  * `LeidenOptions.localFirstPassIters` because a different move schedule
  * reaches a (valid) different local optimum than the cold-start goldens.
  */
object LocalFirstPass {

  /** Compute the seed membership: (id, comm) for every vertex appearing as
    * src. `iters` bounds the local sweeps per partition (2-3 captures most
    * of the first pass's moves).
    */
  def seed(edges: DataFrame, m: Double, resolution: Double = 1.0,
           iters: Int = 3): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(m > 0, "total edge weight must be positive")

    val vtot = graft.graph.EdgeTable.vertexWeights(edges)
    // ship each edge with its DESTINATION's weighted degree (the stale
    // remote ctot); the source's degree is re-derivable partition-locally
    val shipped = edges
      .join(vtot.select(col("id").as("dst"), col("vtot").as("vdst")), "dst")
      .select(col("src"), col("dst"), col("w"), col("vdst"))
      .repartition(col("src"))
      .as[(Long, Long, Double, Double)]

    shipped.mapPartitions { rows =>
      val es = rows.toArray
      if (es.isEmpty) Iterator.empty
      else {
        // group the partition's edges into a local CSR, sources ascending
        // (deterministic sweep order, like the reference's vertex order)
        java.util.Arrays.sort(es, Ordering.by((t: (Long, Long, Double, Double)) => (t._1, t._2)))
        val nbrOf = mutable.LinkedHashMap.empty[Long, (Int, Int)] // src -> [from, until)
        var i = 0
        while (i < es.length) {
          val s = es(i)._1
          var j = i
          while (j < es.length && es(j)._1 == s) j += 1
          nbrOf(s) = (i, j)
          i = j
        }
        val locals = nbrOf.keys.toArray // ascending by construction

        // local vertex weights (all out-edges present => exact vtot);
        // community state: label -> total weighted degree. Remote labels
        // materialize lazily at their stale singleton ctot.
        val vw = mutable.HashMap.empty[Long, Double]
        val remoteVtot = mutable.HashMap.empty[Long, Double]
        locals.foreach { u =>
          val (from, until) = nbrOf(u)
          var s = 0.0
          var k = from
          while (k < until) { s += es(k)._3; remoteVtot(es(k)._2) = es(k)._4; k += 1 }
          vw(u) = s
        }
        val comm = mutable.HashMap.empty[Long, Long]
        locals.foreach(u => comm(u) = u)
        def commOf(v: Long): Long = comm.getOrElse(v, v) // remote: stale singleton
        val ctot = mutable.HashMap.empty[Long, Double]
        def ctotOf(c: Long): Double =
          ctot.getOrElse(c, vw.getOrElse(c, remoteVtot.getOrElse(c, 0.0)))
        locals.foreach(u => ctot(u) = vw(u)) // local singletons

        val wuc = mutable.HashMap.empty[Long, Double] // per-vertex scratch
        var sweep = 0
        var moving = true
        while (sweep < iters && moving) {
          moving = false
          var li = 0
          while (li < locals.length) {
            val u = locals(li)
            val cu = comm(u)
            val vu = vw(u)
            wuc.clear()
            val (from, until) = nbrOf(u)
            var k = from
            while (k < until) {
              val d = es(k)._2
              if (d != u) { // self loops never scanned (leiden.hxx:255-256)
                val cd = commOf(d)
                wuc(cd) = wuc.getOrElse(cd, 0.0) + es(k)._3
              }
              k += 1
            }
            // argmax over candidate communities; ties toward the smallest
            // label (LocalMove's deterministic tie-break)
            var bestC = -1L
            var bestScore = Double.NegativeInfinity
            wuc.foreach { case (c, w) =>
              if (c != cu) {
                val score = w / m - resolution * vu * ctotOf(c) / (2 * m * m)
                if (score > bestScore || (score == bestScore && (bestC < 0 || c < bestC))) {
                  bestScore = score; bestC = c
                }
              }
            }
            if (bestC >= 0) {
              val wud = wuc.getOrElse(cu, 0.0)
              val dq = bestScore - wud / m -
                resolution * vu * (vu - ctotOf(cu)) / (2 * m * m)
              if (dq > 0) {
                ctot(cu) = ctotOf(cu) - vu
                ctot(bestC) = ctotOf(bestC) + vu
                comm(u) = bestC
                moving = true
              }
            }
            li += 1
          }
          sweep += 1
        }
        locals.iterator.map(u => (u, comm(u)))
      }
    }.toDF("id", "comm")
  }
}
