package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S7 log→CSV ETL (the reference's `process.js:5-131` analog): the
  * reference benchmark prints one result record per run in a fixed printf
  * format (`/root/reference/main.cxx:54-60`) and a Node script regexes the
  * fields back out into CSV rows (`process.js:8`, the `RRESLT` pattern).
  * `parse` is that extraction as a single distributed projection — one
  * 15-group `regexp_extract` over a text column, scan-only, codegen'd, no
  * shuffle (the 100-TB shape of any log ETL: parse in the scan, aggregate
  * later). graft.Bench itself emits structured JSON instead (SURVEY §2.1
  * S7 note), so this operator exists for interop with reference-format
  * logs.
  *
  * `refLogLine` builds a byte-exact reference-format line from integer
  * fields via pure string ops (lpad/concat — no float formatting, so the
  * generated fixture is reproducible in ANSI SQL for the cross-engine
  * oracle, `SparkEntry s7_log_etl`).
  */
object LogEtl {

  /** `main.cxx:56` printf pattern, anchored, every field captured — the
    * process.js `RRESLT` regex with the groups this parser extracts.
    */
  val ResultPattern: String =
    "^\\{(.+?)ms, (.+?)ms mark, (.+?)ms init, (.+?)ms firstpass, " +
    "(.+?)ms locmove, (.+?)ms refine, (.+?)ms aggr, (.+?)GB memory, " +
    "(.+?) slots, (.+?) iters, (.+?) passes, (.+?) modularity, " +
    "(.+?)/(.+?) disconnected\\} (.+)$"

  /** A `%09.1f`-shaped ms field (7 int digits, '.', 1 frac digit) from an
    * integer in [0, 1e8) — string-built, so both engines agree byte-wise.
    */
  private def msField(v: Column): Column =
    concat(lpad(floor(v / 10).cast("long").cast("string"), 7, "0"),
      lit("."), (v % 10).cast("string"))

  /** Deterministic reference-format log line keyed by an integer id (the
    * oracle fixture generator; every field is a pure function of `k`).
    */
  def refLogLine(k: Column): Column = {
    def m(mult: Int, off: Int) = msField(pmod(k * mult + off, lit(100000000L)))
    val memV = pmod(k * 23 + 7, lit(100000000L))
    val mem = concat(lpad(floor(memV / 10000).cast("long").cast("string"), 4, "0"),
      lit("."), lpad((memV % 10000).cast("string"), 4, "0"))
    val slots = when(pmod(k, lit(3)) === 0, "0.000e+00")
      .when(pmod(k, lit(3)) === 1, "6.400e+01").otherwise("1.000e+00")
    val tech = when(pmod(k, lit(2)) === 0, "leidenStaticOmp")
      .otherwise("leidenLowmemStaticOmpMajorities")
    concat(
      lit("{"), m(7, 0), lit("ms, "), m(3, 1), lit("ms mark, "),
      m(5, 2), lit("ms init, "), m(11, 3), lit("ms firstpass, "),
      m(13, 4), lit("ms locmove, "), m(17, 5), lit("ms refine, "),
      m(19, 6), lit("ms aggr, "), mem, lit("GB memory, "),
      slots, lit(" slots, "), lpad(pmod(k, lit(500)).cast("string"), 4, "0"),
      lit(" iters, "), lpad(pmod(k, lit(10)).cast("string"), 3, "0"),
      lit(" passes, 0."), lpad(pmod(k, lit(1000000000L)).cast("string"), 9, "0"),
      lit(" modularity, "), pmod(k, lit(7)).cast("string"), lit("/"),
      (pmod(k, lit(1000)) + 1).cast("string"), lit(" disconnected} "), tech)
  }

  /** The ETL: extract every record field from reference-format log lines.
    * Timings/memory/modularity stay strings (they are printf-formatted
    * decimals — parse-then-reformat would destroy the byte fidelity a log
    * archive diff needs); counts become longs. Non-matching lines yield
    * empty strings / nulls, exactly like process.js skipping them.
    *
    * @param lines any DataFrame with a string column `lineCol`
    */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val l = col(lineCol)
    def g(i: Int) = regexp_extract(l, ResultPattern, i)
    // non-matching lines extract "" — nullif before the cast keeps ANSI
    // mode from throwing on them (they become null counts, not errors)
    def n(i: Int) = nullif(g(i), lit("")).cast("long")
    lines.select(
      lines.columns.filter(_ != lineCol).map(col) ++ Seq(
        g(1).as("total_ms"), g(2).as("mark_ms"), g(3).as("init_ms"),
        g(4).as("firstpass_ms"), g(5).as("locmove_ms"), g(6).as("refine_ms"),
        g(7).as("aggr_ms"), g(8).as("memory_gb"), g(9).as("slots"),
        n(10).as("iters"), n(11).as("passes"),
        g(12).as("modularity"), n(13).as("disconnected"),
        n(14).as("total_comms"), g(15).as("technique")): _*)
  }
}
