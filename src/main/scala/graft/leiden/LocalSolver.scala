package graft.leiden

import scala.collection.mutable

/** Driver-local tail solver: a faithful SEQUENTIAL twin of the distributed
  * pass loop, invoked by Leiden.detect once a (coarsened) graph falls under
  * `LeidenOptions.localSolveEdgeThreshold` edge rows.
  *
  * Rationale: coarsening shrinks graphs geometrically, so after a pass or
  * two a 10^12-edge input is a few thousand super-vertices — running ~1 s
  * of Spark job scheduling per half-sweep on a table that fits in a single
  * cache line's worth of partitions is pure fixed cost (measured: passes
  * 1-3 of the sf0.1 co-purchase graph spent 60+ s moving <3k vertices).
  * Finishing the multi-level tail locally is standard practice and is
  * exactly the reference's own execution model
  * (`/root/reference/inc/leiden.hxx:662-780` is a single-node solver); the
  * threshold bounds driver memory by construction.
  *
  * Semantics replicate LocalMove.sweep / Leiden.detect EXACTLY, including
  * the Jacobi snapshot rule (all movers of a half-sweep see community
  * state as of the half-sweep start), the parity schedule, the singleton
  * swap guard, (score, smaller-community) tie-breaks, the affected-
  * neighbor frontier, refinement's still-singleton/bound guards, the
  * tolerance ladder, and the aggregation-tolerance stop — on graphs with
  * exact (integer-valued) weights the result is bit-identical to the
  * distributed path (pinned by LeidenSpec), because every sum is exact so
  * no tie can resolve differently.
  */
object LocalSolver {

  case class Result(leaf: Map[Long, Long], iterations: Int, passes: Int)

  /** One synchronous half-sweep (twin of LocalMove.sweep).
    * @return (moves, dqSum) — comm/aff arrays are updated in place
    */
  private def sweep(adj: Map[Long, Array[(Long, Double)]], ids: Array[Long],
                    comm: mutable.Map[Long, Long], vtot: Map[Long, Double],
                    aff: mutable.Map[Long, Boolean], m: Double, resolution: Double,
                    parity: Int, bound: Option[Map[Long, Long]],
                    refineSingletons: Boolean): (Long, Double) = {
    // snapshot of community state at half-sweep start
    val commSnap = comm.toMap
    val ctot = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    val csize = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    ids.foreach { u =>
      val c = commSnap(u)
      ctot(c) += vtot(u)
      csize(c) += 1
    }

    val moves = mutable.ArrayBuffer.empty[(Long, Long)] // (vertex, newcomm)
    var dqSum = 0.0
    ids.foreach { u =>
      val eligibleMover = aff(u) && java.lang.Math.floorMod(u, 2L) == parity &&
        (!refineSingletons || csize(commSnap(u)) == 1)
      if (eligibleMover) {
        val d = commSnap(u)
        val vt = vtot(u)
        // neighbor-community weights (self loops excluded from the scan)
        val wuc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
        adj.getOrElse(u, Array.empty).foreach { case (v, w) =>
          if (v != u && bound.forall(b => b(u) == b(v))) wuc(commSnap(v)) += w
        }
        if (wuc.nonEmpty) {
          var bestScore = Double.NegativeInfinity
          var bestC = Long.MaxValue
          wuc.foreach { case (c, w) =>
            val eligible = c != d && !(csize(c) == 1 && csize(d) == 1 && c > d)
            if (eligible) {
              val score = w / m - resolution * vt * ctot(c) / (2 * m * m)
              if (score > bestScore || (score == bestScore && c < bestC)) {
                bestScore = score; bestC = c
              }
            }
          }
          if (bestC != Long.MaxValue) {
            val wud = wuc(d)
            val mdq = bestScore - wud / m -
              resolution * vt * (vt - ctot(d)) / (2 * m * m)
            if (mdq > 0) { moves += ((u, bestC)); dqSum += mdq }
          }
        }
      }
    }

    // apply all moves simultaneously; recompute aff exactly like the
    // distributed rule: neighbors of moved become affected, a visited
    // mover clears its flag unless parity-mismatched or re-marked
    val movedSet = moves.map(_._1).toSet
    val affNext = mutable.Set.empty[Long]
    movedSet.foreach(u => adj.getOrElse(u, Array.empty).foreach { case (v, _) => affNext += v })
    moves.foreach { case (u, c) => comm(u) = c }
    ids.foreach { u =>
      aff(u) = affNext.contains(u) ||
        (aff(u) && java.lang.Math.floorMod(u, 2L) != parity)
    }
    (moves.size.toLong, dqSum)
  }

  private def runPhase(adj: Map[Long, Array[(Long, Double)]], ids: Array[Long],
                       comm: mutable.Map[Long, Long], vtot: Map[Long, Double],
                       aff: mutable.Map[Long, Boolean], m: Double, resolution: Double,
                       tolerance: Double, maxIterations: Int, minMoves: Long,
                       bound: Option[Map[Long, Long]], refineSingletons: Boolean): (Int, Long) = {
    var it = 0
    var total = 0L
    var go = true
    while (go && it < maxIterations) {
      val (m0, d0) = sweep(adj, ids, comm, vtot, aff, m, resolution, 0, bound, refineSingletons)
      val (m1, d1) = sweep(adj, ids, comm, vtot, aff, m, resolution, 1, bound, refineSingletons)
      it += 1
      total += m0 + m1
      if (m0 + m1 < math.max(1L, minMoves) || d0 + d1 <= tolerance) go = false
    }
    (it, total)
  }

  /** Full pass loop over an in-memory edge list (directed, symmetric).
    * @param initComm warm-start membership (fi hook); empty = singletons
    * @param affected warm-start affected set (fm hook); None = all
    */
  def solve(edges: Array[(Long, Long, Double)], m: Double, opts: LeidenOptions,
            startTolerance: Double, maxPasses: Int,
            initComm: Map[Long, Long] = Map.empty,
            affected: Option[Set[Long]] = None): Result = {
    var adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(e => (e._2, e._3)) }
    var ids = adj.keySet.union(edges.map(_._2).toSet).toArray.sorted
    // leaf membership over ORIGINAL ids
    val leaf = mutable.Map.empty[Long, Long]
    ids.foreach(u => leaf(u) = u)
    var gn = ids.length.toLong
    var tolerance = startTolerance
    var pass = 0
    var totalIters = 0
    var done = false
    var firstPass = true

    while (!done && pass < maxPasses) {
      val vtot = ids.map(u => u -> adj.getOrElse(u, Array.empty).map(_._2).sum).toMap
      val minMoves = if (opts.minMovedFraction > 0) (opts.minMovedFraction * gn).toLong else 0L
      val comm = mutable.Map.empty[Long, Long]
      val aff = mutable.Map.empty[Long, Boolean]
      ids.foreach { u =>
        comm(u) = if (firstPass) initComm.getOrElse(u, u) else u
        aff(u) = if (firstPass) affected.forall(_.contains(u)) else true
      }
      firstPass = false

      val (lIters, lMoves) = runPhase(adj, ids, comm, vtot, aff, m, opts.resolution,
        tolerance, opts.maxIterations, minMoves, None, refineSingletons = false)

      val boundMap = comm.toMap
      ids.foreach { u => comm(u) = u; aff(u) = true }
      val (rIters, rMoves) = runPhase(adj, ids, comm, vtot, aff, m, opts.resolution,
        tolerance, opts.maxIterations, minMoves, Some(boundMap), refineSingletons = true)
      totalIters += math.max(lIters + rIters, 1)

      val refined = comm.toMap
      leaf.keys.toArray.foreach(u => leaf(u) = refined(leaf(u)))
      pass += 1

      if (lMoves + rMoves == 0 || pass >= maxPasses) done = true
      else {
        val cn = refined.values.toSet.size.toLong
        if (cn.toDouble / gn >= opts.aggregationTolerance) done = true
        else {
          // exact coarsening (self loops carry intra weight)
          val coarse = mutable.Map.empty[(Long, Long), Double].withDefaultValue(0.0)
          adj.foreach { case (u, es) =>
            es.foreach { case (v, w) => coarse((refined(u), refined(v))) += w }
          }
          adj = coarse.toArray.map { case ((a, b), w) => (a, b, w) }
            .groupBy(_._1).map { case (u, es) => u -> es.map(e => (e._2, e._3)) }
          ids = adj.keySet.union(coarse.keys.map(_._2).toSet).toArray.sorted
          gn = cn
          tolerance /= opts.toleranceDrop
        }
      }
    }
    Result(leaf.toMap, totalIters, pass)
  }
}
