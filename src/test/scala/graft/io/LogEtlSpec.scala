package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogEtlSpec extends SparkSpec {

  test("parse extracts every field of a real reference-format result line") {
    // a line in exactly the shape /root/reference/main.cxx:54-60 prints
    // (printf %09.1f / %09.4f / %.3e / %04d / %03d / %01.9f / %zu/%zu)
    val line = "{0013189.4ms, 0000021.7ms mark, 0000108.2ms init, " +
      "0002792.4ms firstpass, 0006512.9ms locmove, 0002103.0ms refine, " +
      "0001651.2ms aggr, 0042.1875GB memory, 6.400e+01 slots, 0041 iters, " +
      "009 passes, 0.787567459 modularity, 0/4528 disconnected} " +
      "leidenLowmemStaticOmpMajorities"
    val spark2 = spark
    import spark2.implicits._
    val out = LogEtl.parse(Seq((1L, line)).toDF("line_id", "line")).collect()(0)
    assert(out.getAs[String]("total_ms") === "0013189.4")
    assert(out.getAs[String]("mark_ms") === "0000021.7")
    assert(out.getAs[String]("init_ms") === "0000108.2")
    assert(out.getAs[String]("firstpass_ms") === "0002792.4")
    assert(out.getAs[String]("locmove_ms") === "0006512.9")
    assert(out.getAs[String]("refine_ms") === "0002103.0")
    assert(out.getAs[String]("aggr_ms") === "0001651.2")
    assert(out.getAs[String]("memory_gb") === "0042.1875")
    assert(out.getAs[String]("slots") === "6.400e+01")
    assert(out.getAs[Long]("iters") === 41L)
    assert(out.getAs[Long]("passes") === 9L)
    assert(out.getAs[String]("modularity") === "0.787567459")
    assert(out.getAs[Long]("disconnected") === 0L)
    assert(out.getAs[Long]("total_comms") === 4528L)
    assert(out.getAs[String]("technique") === "leidenLowmemStaticOmpMajorities")
  }

  test("refLogLine -> parse round-trips the generated fields") {
    val spark2 = spark
    import spark2.implicits._
    val ks = Seq(1L, 14L, 27L, 9998L, 123456789L)
    val lines = ks.toDF("k")
      .select(col("k").as("line_id"), LogEtl.refLogLine(col("k")).as("line"))
    val out = LogEtl.parse(lines).collect().map(r => r.getLong(0) -> r).toMap
    ks.foreach { k =>
      val r = out(k)
      assert(r.getAs[Long]("iters") === k % 500, s"k=$k")
      assert(r.getAs[Long]("passes") === k % 10, s"k=$k")
      assert(r.getAs[Long]("disconnected") === k % 7, s"k=$k")
      assert(r.getAs[Long]("total_comms") === k % 1000 + 1, s"k=$k")
      val v = (k * 7) % 100000000
      assert(r.getAs[String]("total_ms") === f"${v / 10}%07d.${v % 10}", s"k=$k")
      assert(r.getAs[String]("modularity") === "0." + f"${k % 1000000000}%09d", s"k=$k")
    }
    // non-matching lines extract to empty/null, like process.js skipping them
    val junk = LogEtl.parse(Seq((0L, "order: 12 size: 34 {}")).toDF("line_id", "line")).collect()(0)
    assert(junk.getAs[String]("technique") === "")
    assert(junk.isNullAt(junk.fieldIndex("iters")))
  }
}
