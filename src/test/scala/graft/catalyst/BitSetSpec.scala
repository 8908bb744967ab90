package graft.catalyst

import graft.SparkSpec
import graft.leiden.FrontierBits
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeColumns

import scala.util.Random

/** The fixed-width bitmap kernels backing the Leiden frontier-bitmap tier:
  * [[BitSetOrAgg]] / [[BitSetContainsExpr]] vs a driver-side reference
  * model, and the [[FrontierBits]] parity-mask algebra vs the legacy
  * aff-column semantics (`/root/reference/inc/leiden.hxx:427-429`).
  */
class BitSetSpec extends SparkSpec {

  private def refBits(ids: Set[Long], numBits: Int): Array[Byte] = {
    val out = new Array[Byte]((numBits + 7) / 8)
    ids.foreach { id =>
      out((id >>> 3).toInt) = (out((id >>> 3).toInt) | (1 << (id & 7).toInt)).toByte
    }
    out
  }

  test("bitsetOr aggregates a random id set to the reference byte layout") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(11)
    // duplicates on purpose (OR is idempotent); ids straddle byte edges
    val ids = Seq.fill(500)(rnd.nextInt(777).toLong) ++ Seq(0L, 7L, 8L, 776L)
    val got = ids.toDF("id").repartition(7)
      .agg(NativeColumns.bitsetOr(col("id"), 777)).head.getAs[Array[Byte]](0)
    assert(got.toSeq === refBits(ids.toSet, 777).toSeq)
  }

  test("bitsetOr on an empty input is the all-zero bitmap") {
    val spark2 = spark
    import spark2.implicits._
    val got = Seq.empty[Long].toDF("id")
      .agg(NativeColumns.bitsetOr(col("id"), 64)).head.getAs[Array[Byte]](0)
    assert(got.toSeq === new Array[Byte](8).toSeq)
  }

  test("bitsetOr fails loudly on an out-of-range id (never silently drops)") {
    val spark2 = spark
    import spark2.implicits._
    val ex = intercept[Exception] {
      Seq(3L, 64L).toDF("id").agg(NativeColumns.bitsetOr(col("id"), 64)).head
    }
    assert(ex.getMessage != null)
  }

  test("bitsetContains matches the set, out-of-range ids are false") {
    val spark2 = spark
    import spark2.implicits._
    val ids = Set(0L, 1L, 63L, 64L, 200L)
    val bits = refBits(ids, 201)
    val probe = (0L to 250L) ++ Seq(-1L, 10000L)
    val rows = probe.toDF("id")
      .select(col("id"), NativeColumns.bitsetContains(lit(bits), col("id")).as("in"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(1) === ids.contains(r.getLong(0)), s"id=${r.getLong(0)}")
    }
  }

  test("FrontierBits.next equals the legacy aff-column update rule") {
    // legacy rule per vertex: aff' = neighborOfMoved || (aff && id%2 != parity)
    val rnd = new Random(23)
    val n = 203
    for (parity <- 0 to 1) {
      val cur = (0 until n).filter(_ => rnd.nextBoolean()).map(_.toLong).toSet
      val nb = (0 until n).filter(_ => rnd.nextDouble() < 0.3).map(_.toLong).toSet
      val got = FrontierBits.next(refBits(cur, n), refBits(nb, n), parity)
      val want = (0 until n).map(_.toLong)
        .filter(id => nb.contains(id) || (cur.contains(id) && id % 2 != parity)).toSet
      assert(got.toSeq === refBits(want, n).toSeq, s"parity=$parity")
    }
  }

  test("FrontierBits.isEmpty sees only the requested parity") {
    val n = 40
    val even = refBits(Set(2L, 20L), n)
    assert(!FrontierBits.isEmpty(even, 0))
    assert(FrontierBits.isEmpty(even, 1))
    val odd = refBits(Set(3L, 39L), n)
    assert(FrontierBits.isEmpty(odd, 0))
    assert(!FrontierBits.isEmpty(odd, 1))
    assert(FrontierBits.isEmpty(new Array[Byte](5), 0))
  }

  test("FrontierBits.fromState round-trips the aff column") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0L until 97L).map(id => (id, id % 3 == 0))
    val st = rows.toDF("id", "aff")
    val bits = FrontierBits.fromState(st, 97)
    assert(bits.toSeq === refBits(rows.filter(_._2).map(_._1).toSet, 97).toSeq)
  }
}
