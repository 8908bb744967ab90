package graft.leiden

import graft.SparkSpec
import graft.graph.EdgeTable

/** Executor-mirror lifecycle (round-5 verdict #5): the delta-mode mirror
  * registry's watermark eviction and stale-generation rejection are
  * correctness-critical cluster paths; this spec drives them directly on
  * the shared-JVM executor side (local master => tasks and driver share the
  * registry) plus end-to-end through two live CsrStates.
  */
class CsrMirrorSpec extends SparkSpec {

  private def pack(s: Int, to: Int): Long = (s.toLong << 32) | to.toLong

  test("resolveMirror: base materialization, incremental replay, rebase, stale-gen throw, eviction") {
    val sc = spark.sparkContext
    val n = 6
    val vt = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    def freshBase = CsrSweep.CsrBase(
      Array.tabulate(n)(identity), vt.clone(), Array.fill(n)(1),
      { val s = new Array[Long](1); var i = 0; while (i < n) { s(0) |= 1L << i; i += 1 }; s })
    val base = sc.broadcast(freshBase)
    val d1 = sc.broadcast(Array(pack(0, 1), pack(2, 1))) // 0->1, 2->1
    val d2 = sc.broadcast(Array(pack(3, 1)))             // 3->1

    // 1. first resolve materializes from base and replays delta 1
    CsrSweep.resolveMirror(9101L, 1L, 0L, base, IndexedSeq(d1), vt)
    val Some((g1, e1, c1, ct1, cs1)) = CsrSweep.mirrorProbe(9101L)
    assert(g1 === 1L && e1 === 1)
    assert(c1.toSeq === Seq(1, 1, 1, 3, 4, 5))
    assert(ct1.toSeq === Seq(0.0, 2.0 + 1.0 + 3.0, 0.0, 4.0, 5.0, 6.0))
    assert(cs1.toSeq === Seq(0, 3, 0, 1, 1, 1))

    // 2. same gen, one more delta: only the new epoch replays
    CsrSweep.resolveMirror(9101L, 1L, 0L, base, IndexedSeq(d1, d2), vt)
    val Some((_, e2, c2, ct2, cs2)) = CsrSweep.mirrorProbe(9101L)
    assert(e2 === 2)
    assert(c2.toSeq === Seq(1, 1, 1, 1, 4, 5))
    assert(ct2(1) === 2.0 + 1.0 + 3.0 + 4.0 && ct2(3) === 0.0)
    assert(cs2.toSeq === Seq(0, 4, 0, 0, 1, 1))

    // 3. rebase (gen bump) re-materializes from the new base, epoch resets
    val base2 = sc.broadcast(freshBase)
    CsrSweep.resolveMirror(9101L, 2L, 0L, base2, IndexedSeq.empty, vt)
    val Some((g3, e3, c3, _, _)) = CsrSweep.mirrorProbe(9101L)
    assert(g3 === 2L && e3 === 0)
    assert(c3.toSeq === (0 until n))

    // 4. a zombie/speculative task from before the rebase must fail fast
    val ex = intercept[IllegalStateException] {
      CsrSweep.resolveMirror(9101L, 1L, 0L, base, IndexedSeq(d1), vt)
    }
    assert(ex.getMessage.contains("stale sweep generation"))

    // 5. watermark eviction: a resolve carrying a higher live watermark
    //    drops every mirror of driver-closed (lower-id) states
    CsrSweep.resolveMirror(9102L, 1L, 0L, base2, IndexedSeq.empty, vt)
    assert(CsrSweep.mirrorProbe(9101L).isDefined && CsrSweep.mirrorProbe(9102L).isDefined)
    CsrSweep.resolveMirror(9103L, 1L, 9103L, base2, IndexedSeq.empty, vt)
    assert(CsrSweep.mirrorProbe(9101L).isEmpty, "mirror below watermark must evict")
    assert(CsrSweep.mirrorProbe(9102L).isEmpty, "mirror below watermark must evict")
    assert(CsrSweep.mirrorProbe(9103L).isDefined)
    // cleanup: evict the test entries so later suites see a clean registry
    CsrSweep.mirrorEvictBelow(Long.MaxValue)
    base.destroy(); base2.destroy(); d1.destroy(); d2.destroy()
  }

  test("end-to-end: two live delta-mode states; close + next sweep evicts the dead mirror") {
    val n = 8
    // two simple unit-weight graphs (integral => delta mode allowed)
    val es = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong, 1.0))
    val edges = EdgeTable.undirected(spark, es)
    val m = EdgeTable.totalWeight(edges) / 2
    val vt = new Array[Double](n)
    EdgeTable.vertexWeights(edges).collect().foreach(r => vt(r.getLong(0).toInt) = r.getDouble(1))
    val csr = CsrSweep.build(edges, n).cache()
    csr.count()
    val before = CsrSweep.mirrorCount
    val st1 = CsrSweep.singleton(csr, n, vt.clone(), deltaBcast = Some(true))
    val st2 = CsrSweep.singleton(csr, n, vt.clone(), deltaBcast = Some(true))
    CsrSweep.halfSweep(st1, m, 1.0, 0)
    CsrSweep.halfSweep(st2, m, 1.0, 0)
    assert(CsrSweep.mirrorCount >= before + 2, "both live states hold a mirror")
    st1.close()
    // the next sweep on the surviving state ships the advanced watermark,
    // and the dead state's mirror is evicted on resolve
    CsrSweep.halfSweep(st2, m, 1.0, 1)
    assert(CsrSweep.mirrorCount <= before + 1, "closed state's mirror must evict")
    st2.close()
    CsrSweep.mirrorEvictBelow(Long.MaxValue)
    csr.unpersist(blocking = false)
  }
}
