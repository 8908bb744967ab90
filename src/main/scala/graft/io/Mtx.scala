package graft.io

import graft.graph.EdgeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MatrixMarket / SNAP edge-list readers (SURVEY.md §2.1 S1-S5).
  *
  * The reference parses MTX with a hand-rolled chunked parallel scanner
  * (`/root/reference/inc/mtx.hxx:39-192`); Spark's split-parallel text scan
  * provides the parallelism for free, so the reader is just header sniffing
  * plus a columnar projection. Semantics preserved:
  *   - 1-indexed vertex ids (kept as-is; ids are opaque Longs here),
  *   - `%` comment lines skipped,
  *   - missing weights read as 1 (`/root/reference/inc/mtx.hxx:128-134`),
  *   - `symmetric` header emits both directions
  *     (`/root/reference/inc/mtx.hxx:133,183`),
  *   - duplicate (src,dst) resolved last-write-wins is the caller's choice
  *     via EdgeTable.dedup/dedupLastSeq.
  */
object Mtx {

  case class Header(rows: Long, cols: Long, nnz: Long, symmetric: Boolean, pattern: Boolean)

  /** Sniff the MTX banner + size line (S1). Reads only the file head.
    * Also returns the 0-based file line index of the size line, so the
    * body scan can skip the header EXPLICITLY instead of pattern-matching.
    */
  def headerWithOffset(spark: SparkSession, path: String): (Header, Long) = {
    val head = spark.read.text(path).limit(4096).collect().map(_.getString(0))
    val banner = head.headOption.getOrElse("")
    require(banner.startsWith("%%MatrixMarket"), s"not an mtx file: $banner")
    val symmetric = banner.contains("symmetric")
    val pattern = banner.contains("pattern")
    val sizeIdx = head.indexWhere(l => !l.startsWith("%") && l.trim.nonEmpty)
    require(sizeIdx >= 0, "mtx: no size line in the first 4096 lines")
    val parts = head(sizeIdx).trim.split("\\s+")
    (Header(parts(0).toLong, parts(1).toLong, parts(2).toLong, symmetric, pattern),
      sizeIdx.toLong)
  }

  def header(spark: SparkSession, path: String): Header = headerWithOffset(spark, path)._1

  /** Body scan (S2/S3): distributed text scan -> (src,dst,w). Mirrors
    * symmetric files; vertex/edge predicates (S4) compose as .filter.
    *
    * The banner/comment/size-line header is dropped by GLOBAL LINE INDEX
    * (zipWithIndex — one extra distributed pass over the text, the price of
    * not guessing): a size line "rows cols nnz" is textually
    * indistinguishable from an edge row, and partition-local id tricks
    * silently keep it when a comment block crosses a split boundary.
    */
  def read(spark: SparkSession, path: String, weighted: Boolean = true): DataFrame = {
    val (h, sizeIdx) = headerWithOffset(spark, path)
    import spark.implicits._
    val body = spark.read.text(path).select(col("value")).as[String].rdd
      .zipWithIndex().toDF("value", "__idx")
      .filter(col("__idx") > sizeIdx &&
        !col("value").startsWith("%") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .select(col("f").getItem(0).cast("long").as("src"),
        col("f").getItem(1).cast("long").as("dst"),
        when(lit(!weighted || h.pattern), lit(1.0))
          .otherwise(coalesce(col("f").getItem(2).cast("double"), lit(1.0))).as("w"))
    if (h.symmetric)
      body.unionByName(body.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .filter(col("src") =!= col("dst"))
        .unionByName(body.filter(col("src") === col("dst")))
    else body
  }

  /** SNAP-style whitespace edge list (S5): `u v [w]`, `#` comments. */
  def readSnap(spark: SparkSession, path: String, weighted: Boolean = false,
               limit: Option[Long] = None): DataFrame = {
    val txt = spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
    val lim = limit.fold(txt)(n => txt.limit(n.toInt))
    lim.select(split(trim(col("value")), "\\s+").as("f"))
      .select(col("f").getItem(0).cast("long").as("src"),
        col("f").getItem(1).cast("long").as("dst"),
        when(lit(!weighted), lit(1.0))
          .otherwise(coalesce(col("f").getItem(2).cast("double"), lit(1.0))).as("w"))
  }

  /** Write a graph as MTX (general, real) — for interop with RAW-ID readers
    * only (this repo's `read`, the reference binary's loader): vertex ids
    * are written verbatim, so a graph with 0-based ids 0..n-1 gets header
    * dims max(id) = n-1 while id 0 appears in the body — malformed for
    * strict 1-based MatrixMarket consumers. tools/ref_parity.sh generates
    * its fixtures under the same convention; shift ids to 1-based before
    * calling if a standard MM consumer must read the file.
    */
  def write(edges: DataFrame, path: String): Unit = {
    val n = EdgeTable.vertices(edges).agg(max("id")).head.getLong(0)
    val rows = edges.select(concat_ws(" ",
      col("src").cast("string"), col("dst").cast("string"), col("w").cast("string")))
      .collect().map(_.getString(0))
    val header = s"%%MatrixMarket matrix coordinate real general\n$n $n ${rows.length}\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      header + rows.mkString("\n") + "\n")
  }
}
