package graft.leiden

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Weighted Misra-Gries sketch over (community, weight) streams — the
  * low-memory candidate filter of `leidenLowmemScanCommunityW`
  * (`/root/reference/inc/leidenLowmem.hxx:69-95`):
  *   - weight added to the matching slot,
  *   - otherwise inserted into an empty (zero-weight) slot,
  *   - otherwise subtracted from every slot (clamped at 0).
  * SLOTS=1 degenerates to weighted Boyer-Moore majority voting
  * (`/root/reference/inc/leidenLowmem.hxx:151-164`).
  *
  * In Spark the per-vertex scan is a hash aggregation; partial buffers are
  * merged across partitions, which the sequential reference never does. The
  * merge below is the standard Misra-Gries combine: sum matching slots, then
  * decrement all by the (k+1)-th largest weight so at most k survive. The
  * sketch's CONTRACT is only that surviving slots ⊇ every community holding
  * more than 1/(k+1) of the vertex's scanned weight — exact scores are
  * restored by re-scoring the survivors against the edges
  * (`/root/reference/inc/leidenLowmem.hxx:207-231`), so merge-order
  * differences never change final move decisions, only the candidate pool.
  *
  * Buffer = 2*k doubles + k longs per GROUP (0.5 KB at k=64, matching the
  * reference's per-thread footprint, README.md:5) versus the exact path's
  * one hash-map entry per distinct neighbor community — for a 10^6-degree
  * hub vertex that is the difference between a bounded buffer and a
  * multi-MB spill-prone aggregation state.
  */
object MGSketch {

  case class Buf(var keys: Array[Long], var ws: Array[Double])

  case class Cand(comm: Long, w: Double)

  class Agg(slots: Int) extends Aggregator[(Long, Double), Buf, Seq[Cand]] {
    require(slots >= 1)

    override def zero: Buf = Buf(Array.fill(slots)(-1L), Array.fill(slots)(0.0))

    /** slots>1 replays /root/reference/inc/leidenLowmem.hxx:69-95 exactly
      * (key -1 in a zero-weight slot meaning "empty"). slots==1 replays the
      * weighted Boyer-Moore REPLACEMENT vote the reference uses for its
      * majority variant (/root/reference/inc/leidenLowmem.hxx:151-164):
      * add on match, subtract while heavier, else replace — this keeps the
      * majority-survival guarantee the k=1 decrement rule would lose.
      * EXACT ties keep the SMALLER community id (the reference's winner on
      * ties is a thread race; ours must be order-insensitive — and the
      * engine's swap guard only admits singleton moves toward smaller
      * community ids, so a larger-id tie winner would deadlock tie-heavy
      * graphs under synchronous sweeps).
      */
    override def reduce(b: Buf, a: (Long, Double)): Buf = {
      val (c, w) = a
      if (slots == 1) {
        if (b.keys(0) == c && b.ws(0) > 0) b.ws(0) += w
        else if (b.ws(0) > w) b.ws(0) -= w
        else if (b.ws(0) < w) { b.keys(0) = c; b.ws(0) = w }
        else { b.keys(0) = math.min(if (b.ws(0) > 0) b.keys(0) else c, c); b.ws(0) = w }
        return b
      }
      var i = 0
      var has = false
      while (i < slots) {
        if (b.keys(i) == c && b.ws(i) > 0) { b.ws(i) += w; has = true }
        i += 1
      }
      if (!has) {
        var f = -1
        i = 0
        while (i < slots) { if (b.ws(i) == 0.0) f = i; i += 1 }
        if (f >= 0) { b.keys(f) = c; b.ws(f) = w }
        else {
          i = 0
          while (i < slots) { b.ws(i) = math.max(b.ws(i) - w, 0.0); i += 1 }
        }
      }
      b
    }

    /** Misra-Gries combine: union slots summing equal keys; if more than
      * `slots` positive entries remain, subtract the (slots+1)-th largest
      * weight from all and keep the positive top `slots`.
      */
    override def merge(x: Buf, y: Buf): Buf = {
      if (slots == 1) {
        // Boyer-Moore pairwise combine; exact tie keeps the smaller key
        // WITH its weight (strict BM would cancel both and leave no
        // candidate — a true majority can never tie, so the guarantee holds)
        val out = zero
        if (x.ws(0) <= 0) { out.keys(0) = y.keys(0); out.ws(0) = y.ws(0) }
        else if (y.ws(0) <= 0) { out.keys(0) = x.keys(0); out.ws(0) = x.ws(0) }
        else if (x.keys(0) == y.keys(0)) { out.keys(0) = x.keys(0); out.ws(0) = x.ws(0) + y.ws(0) }
        else if (x.ws(0) > y.ws(0)) { out.keys(0) = x.keys(0); out.ws(0) = x.ws(0) - y.ws(0) }
        else if (x.ws(0) < y.ws(0)) { out.keys(0) = y.keys(0); out.ws(0) = y.ws(0) - x.ws(0) }
        else { out.keys(0) = math.min(x.keys(0), y.keys(0)); out.ws(0) = x.ws(0) }
        return out
      }
      val m = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
      var i = 0
      while (i < slots) { if (x.ws(i) > 0) m.update(x.keys(i), m.getOrElse(x.keys(i), 0.0) + x.ws(i)); i += 1 }
      i = 0
      while (i < slots) { if (y.ws(i) > 0) m.update(y.keys(i), m.getOrElse(y.keys(i), 0.0) + y.ws(i)); i += 1 }
      val entries = m.toArray
      val kept =
        if (entries.length <= slots) entries
        else {
          // deterministic order: weight desc, key asc
          val sorted = entries.sortBy { case (k, w) => (-w, k) }
          val cut = sorted(slots)._2
          sorted.take(slots).map { case (k, w) => (k, math.max(w - cut, 0.0)) }
            .filter(_._2 > 0)
        }
      val out = zero
      i = 0
      kept.foreach { case (k, w) => out.keys(i) = k; out.ws(i) = w; i += 1 }
      out
    }

    override def finish(b: Buf): Seq[Cand] = {
      val out = Seq.newBuilder[Cand]
      var i = 0
      while (i < slots) { if (b.ws(i) > 0) out += Cand(b.keys(i), b.ws(i)); i += 1 }
      out.result().sortBy(c => (-c.w, c.comm))
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Cand]]()
  }

  /** Reflection-free input encoder — functions.udaf's TypeTag overload
    * resolves encoders via runtime scala-reflection against the context
    * classloader, which breaks under REPL-style loaders.
    */
  private val inputEnc: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  /** Column function: mg_sketch(comm, w) -> array<struct<comm,w>>. */
  def sketch(slots: Int)(comm: Column, w: Column): Column =
    udaf(new Agg(slots), inputEnc).apply(comm, w)

  /** Sequential replay (tests, oracle for F5 micro-fixtures). */
  def sequential(slots: Int, stream: Seq[(Long, Double)]): Seq[Cand] = {
    val agg = new Agg(slots)
    finishOf(agg, stream.foldLeft(agg.zero)(agg.reduce))
  }

  private def finishOf(agg: Agg, b: Buf): Seq[Cand] = agg.finish(b)
}
