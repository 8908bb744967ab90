package graft.leiden

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeColumns

/** Driver-held affected-frontier bitmap for the local-moving sweeps.
  *
  * The reference marks neighbors of moved vertices affected and lets only
  * affected vertices rescan (`/root/reference/inc/leiden.hxx:422-429`) — an
  * O(1)-per-touch flag write into its CSR arrays. The Catalyst translation
  * used to maintain that flag as a state COLUMN, which cost per half-sweep:
  * an O(V/2) mover broadcast-relation build (driver-serial), a full
  * edge-cache scan feeding a V-sized hash `distinct` (the most DRAM-bound
  * stage in the scaling profile), and an O(V) join in the state update.
  *
  * When the pass's vertex ids are DENSE (max id bounded — true for every
  * post-aggregation pass by construction, and for pass 0 of any renumbered
  * input), the frontier is instead a V-bit bitmap held on the DRIVER
  * (2M vertices = 250 KB):
  *   - mover pruning = a codegen'd [[graft.catalyst.BitSetContainsExpr]]
  *     literal filter — zero broadcast builds, rides the stage's task
  *     binary;
  *   - the frontier update = one [[graft.catalyst.BitSetOrAgg]] pass over
  *     the moved vertices' edges — a branch + bit-OR per row into an
  *     L2-resident buffer instead of a V-sized hash map;
  *   - the parity carry-over ("flags of the other parity survive") = a
  *     byte-wise mask on the driver: vertex id parity IS bit-position
  *     parity, so even ids are the 0x55 bits of every byte.
  * Semantics are bit-for-bit those of the column path (LeidenSpec pins the
  * goldens across both), only the physical carrier changes.
  */
object FrontierBits {

  /** Byte mask selecting the bits of ids with id % 2 == parity. */
  def parityMask(parity: Int): Int = if (parity == 0) 0x55 else 0xAA

  /** Frontier after a half-sweep at `parity`: neighbors of moved vertices,
    * plus carried flags of the OTHER parity (this parity's vertices just
    * scanned; they stay affected only if a neighbor moved —
    * `/root/reference/inc/leiden.hxx:427-429`).
    */
  def next(cur: Array[Byte], neighborsOfMoved: Array[Byte], parity: Int): Array[Byte] = {
    require(cur.length == neighborsOfMoved.length,
      s"frontier width mismatch: ${cur.length} vs ${neighborsOfMoved.length}")
    val keep = ~parityMask(parity)
    val out = new Array[Byte](cur.length)
    var i = 0
    while (i < cur.length) {
      out(i) = ((neighborsOfMoved(i) & 0xFF) | (cur(i) & keep)).toByte
      i += 1
    }
    out
  }

  /** Materialize the aff column of `state` as a bitmap (one small job). */
  def fromState(state: DataFrame, numBits: Int): Array[Byte] =
    state.filter(col("aff"))
      .agg(NativeColumns.bitsetOr(col("id"), numBits))
      .head.getAs[Array[Byte]](0)

  def isEmpty(bits: Array[Byte], parity: Int): Boolean = {
    val mask = parityMask(parity)
    bits.forall(b => (b & mask) == 0)
  }
}
