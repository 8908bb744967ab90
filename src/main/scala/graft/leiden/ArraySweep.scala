package graft.leiden

import graft.catalyst.{BcDoubles, BcLongs}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeColumns

/** The Leiden local-moving phase with all O(V) state held on the DRIVER as
  * primitive arrays — the densest tier of the sweep ladder, gated on a
  * measured dense id space (`Leiden.detect`: `maxId + 1 <= CtBroadcastMax`
  * and exact scans, i.e. no Misra-Gries slots).
  *
  * The reference engine's inner loop reads/writes flat per-vertex arrays
  * (`vcom`, `ctot`, `vaff` — `/root/reference/inc/leiden.hxx:255-344`);
  * the earlier Catalyst tiers re-expressed those arrays as DataFrame state
  * joined back per half-sweep. This tier splits the work by its natural
  * cardinality instead: the O(E) gather-and-argmax stays a distributed
  * Catalyst job over the src-partitioned edge cache, while every O(V)
  * structure — membership, community totals, singleton flags, the
  * affected frontier — lives in driver arrays (4M vertices = a few
  * hundred MB ceiling; the gate guarantees it) and reaches executors as:
  *
  *   - `comm` / `ctot`: torrent-broadcast primitive arrays read through
  *     codegen'd [[graft.catalyst.BcLookupLongExpr]] lookups — one 8-byte
  *     indexed load per edge row instead of a broadcast-hash-relation
  *     probe (no hash, no relation build, no join operator at all);
  *   - singleton flags and the frontier: V-bit bitmap literals
  *     ([[graft.catalyst.BitSetContainsExpr]]) riding the stage's task
  *     binary;
  *   - `vtot`: broadcast once per phase (it never changes within one).
  *
  * A half-sweep is then exactly TWO zero-shuffle jobs: (1) scan the edge
  * cache, aggregate candidates and the argmax on the cache's src
  * partitioning (`HashPartitioning(src)` satisfies both groupings, so no
  * exchange is planned), and collect the O(moves) winners; (2) OR the
  * moved vertices' neighbor ids into the next frontier bitmap. The driver
  * applies the moves and rebuilds community totals in an O(V) pass —
  * microseconds against the cluster-side scan, and rebuilt from scratch
  * each half-sweep so no float drift accumulates across sweeps.
  *
  * Move selection reproduces [[LocalMove.sweep]] decision-for-decision:
  * the same score/ΔQ expression trees, the same singleton swap guard, the
  * same smallest-community-id tie-break, the same mdq > 0 acceptance. On
  * integer-weight graphs every arithmetic input (vtot, ctot sums below
  * 2^53) is exact, so memberships are bit-identical to the column tiers —
  * pinned by LeidenSpec's array-tier parity tests.
  *
  * At 10^12-document scale this tier serves every pass whose coarsened
  * vertex set fits the gate — on web graphs that is every pass after the
  * first one or two; the oversized early passes keep the distributed
  * state tiers ([[LocalMove.sweep]] scaladoc ladder).
  */
object ArraySweep {

  /** Driver-held per-phase state. `vtot` is broadcast once here and
    * destroyed by [[close]]; `comm` and the frontier mutate per half-sweep.
    */
  final class ArrayState(val edges: DataFrame, val n: Int,
                         val vtot: Array[Double], val comm: Array[Long],
                         var bits: Array[Byte]) {
    private[ArraySweep] val bcVtot =
      new BcDoubles(edges.sparkSession.sparkContext.broadcast(vtot))
    def close(): Unit = bcVtot.bc.destroy()
    /** Deep-copy of the mutable members (bench repetition restarts). */
    def snapshot(): (Array[Long], Array[Byte]) = (comm.clone(), bits.clone())
    def restore(s: (Array[Long], Array[Byte])): Unit = {
      Array.copy(s._1, 0, comm, 0, n); bits = s._2.clone()
    }
    /** Re-init to singletons for the refinement phase, reusing this
      * state's vtot broadcast; returns the previous membership (the
      * refinement bound).
      */
    def resetToSingletons(): Array[Long] = {
      val prev = comm.clone()
      var i = 0
      while (i < n) { comm(i) = i.toLong; i += 1 }
      bits = Array.fill[Byte]((n + 7) / 8)(-1)
      prev
    }
  }

  def init(edges: DataFrame, n: Int, vtot: Array[Double],
           comm0: Array[Long], aff0: Array[Byte]): ArrayState =
    new ArrayState(edges, n, vtot, comm0, aff0)

  /** Identity membership + all-affected frontier (singleton init). */
  def singleton(edges: DataFrame, n: Int, vtot: Array[Double]): ArrayState = {
    val comm = Array.tabulate(n)(_.toLong)
    val bits = Array.fill[Byte]((n + 7) / 8)(-1)
    new ArrayState(edges, n, vtot, comm, bits)
  }

  /** One synchronous half-sweep at `parity`; mutates `st` and returns
    * (moves, dqSum). Bound lookups (refinement) come via a per-run
    * broadcast the caller owns.
    */
  def halfSweep(st: ArrayState, m: Double, resolution: Double, parity: Int,
                bound: Option[BcLongs] = None,
                refineSingletons: Boolean = false): (Long, Double) = {
    if (FrontierBits.isEmpty(st.bits, parity)) return (0L, 0.0)
    val n = st.n
    // community totals + singleton flags: O(V) driver rebuild, exact on
    // integer-weight graphs, no drift (never incrementally patched)
    val ctot = new Array[Double](n)
    val csize = new Array[Int](n)
    var i = 0
    while (i < n) { val c = st.comm(i).toInt; ctot(c) += st.vtot(i); csize(c) += 1; i += 1 }
    val sgl = new Array[Byte]((n + 7) / 8)
    i = 0
    while (i < n) {
      if (csize(i) == 1) sgl(i >> 3) = (sgl(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    val sc = st.edges.sparkSession.sparkContext
    val bcComm = new BcLongs(sc.broadcast(st.comm))
    val bcCtot = new BcDoubles(sc.broadcast(ctot))
    try {
      def commOf(c: Column): Column = NativeColumns.bcLookupLong(bcComm, c)
      var cond = col("src") =!= col("dst") &&
        pmod(col("src"), lit(2)) === parity &&
        NativeColumns.bitsetContains(lit(st.bits), col("src"))
      // REFINE: only still-singleton vertices scan at all
      // (/root/reference/inc/leiden.hxx:422) — exact here, the singleton
      // flags are this half-sweep's, not a stale superset
      if (refineSingletons)
        cond = cond && NativeColumns.bitsetContains(lit(sgl), commOf(col("src")))
      // refinement bound: both endpoints inside the same move-phase
      // community (/root/reference/inc/leiden.hxx:255-256 with REFINE)
      bound.foreach { b =>
        cond = cond && (NativeColumns.bcLookupLong(b, col("src")) ===
          NativeColumns.bcLookupLong(b, col("dst")))
      }
      // J1 gather: (src, comm(dst), w) — SELF=false, one indexed load for
      // the membership; both aggregations below cluster by src, which the
      // cache's HashPartitioning(src) already satisfies: zero exchanges.
      val scan = st.edges.filter(cond)
        .select(col("src"), commOf(col("dst")).as("cdst"), col("w"))
      val scored = scan.groupBy("src", "cdst").agg(sum("w").as("wuc"))
        .withColumn("ccur", commOf(col("src")))
        .withColumn("vtot_u", NativeColumns.bcLookupDouble(st.bcVtot, col("src")))
        .withColumn("ctot_c", NativeColumns.bcLookupDouble(bcCtot, col("cdst")))
        // identical expression tree to LocalMove.sweep's `score`
        .withColumn("score",
          col("wuc") / lit(m) -
            lit(resolution) * col("vtot_u") * col("ctot_c") / lit(2 * m * m))
        // swap guard, singleton flags replacing csize === 1
        .withColumn("eligible",
          col("cdst") =!= col("ccur") &&
            !(NativeColumns.bitsetContains(lit(sgl), col("cdst")) &&
              NativeColumns.bitsetContains(lit(sgl), col("ccur")) &&
              col("cdst") > col("ccur")))
      // one aggregation: argmax (ties toward the smaller community id) +
      // wud; the per-vertex constants need no `first()` carriage — they
      // are O(1) lookups again on the aggregated O(movers) stream
      val best = scored.groupBy(col("src"))
        .agg(
          max(when(col("eligible"), struct(col("score").as("score"),
            (-col("cdst")).as("tb"), col("cdst").as("best")))).as("mx"),
          sum(when(col("cdst") === col("ccur"), col("wuc")).otherwise(lit(0.0))).as("wud"))
        .filter(col("mx").isNotNull)
        .withColumn("vtot_u", NativeColumns.bcLookupDouble(st.bcVtot, col("src")))
        .withColumn("ctot_d", NativeColumns.bcLookupDouble(bcCtot, commOf(col("src"))))
        .withColumn("mdq",
          col("mx.score") - col("wud") / lit(m) -
            lit(resolution) * col("vtot_u") * (col("vtot_u") - col("ctot_d")) / lit(2 * m * m))
        .filter(col("mdq") > 0)
        .select(col("src"), col("mx.best").as("newcomm"), col("mdq"))
      val moves = best.collect()
      if (moves.isEmpty) return (0L, 0.0)
      // synchronous apply: every accepted move was scored against the OLD
      // totals; totals refresh wholesale at the next half-sweep
      java.util.Arrays.sort(moves, Ordering.by((r: Row) => r.getLong(0)))
      val movedBits = new Array[Byte](st.bits.length)
      var dq = 0.0
      moves.foreach { r =>
        val s = r.getLong(0)
        st.comm(s.toInt) = r.getLong(1)
        dq += r.getDouble(2)
        movedBits((s >>> 3).toInt) = (movedBits((s >>> 3).toInt) | (1 << (s & 7).toInt)).toByte
      }
      // neighbors of moved become affected (/root/reference/inc/leiden.hxx:427-429)
      val nbBits = st.edges
        .filter(NativeColumns.bitsetContains(lit(movedBits), col("src")))
        .agg(NativeColumns.bitsetOr(col("dst"), st.bits.length * 8))
        .head.getAs[Array[Byte]](0)
      st.bits = FrontierBits.next(st.bits, nbBits, parity)
      (moves.length.toLong, dq)
    } finally {
      bcComm.bc.destroy(); bcCtot.bc.destroy()
    }
  }

  /** Iterate half-sweep pairs with [[LocalMove.run]]'s exact termination
    * rule (tolerance on dq, minMoves churn stop, maxIterations). Mutates
    * `st`; returns (iterations, totalMoves).
    */
  def run(st: ArrayState, m: Double, resolution: Double, tolerance: Double,
          maxIterations: Int, boundArr: Option[Array[Long]] = None,
          refineSingletons: Boolean = false, minMoves: Long = 0L): (Int, Long) = {
    val sc = st.edges.sparkSession.sparkContext
    val bound = boundArr.map(b => new BcLongs(sc.broadcast(b)))
    try {
      var it = 0
      var totalMoves = 0L
      var continue = true
      while (continue && it < maxIterations) {
        val (am, adq) = halfSweep(st, m, resolution, 0, bound, refineSingletons)
        val (bm, bdq) = halfSweep(st, m, resolution, 1, bound, refineSingletons)
        it += 1
        totalMoves += am + bm
        if (am + bm < math.max(1L, minMoves) || adq + bdq <= tolerance)
          continue = false
      }
      (it, totalMoves)
    } finally bound.foreach(_.bc.destroy())
  }
}
