package graft.io

import graft.SparkSpec
import graft.graph.{Batch, EdgeTable}
import graft.algo.Bfs
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MtxBatchSpec extends SparkSpec {

  test("mtx roundtrip: general real file") {
    val p = Files.createTempFile("g", ".mtx").toString
    Files.writeString(java.nio.file.Paths.get(p),
      """%%MatrixMarket matrix coordinate real general
        |% a comment
        |3 3 4
        |1 2 5.0
        |2 3 1.5
        |3 1 2.0
        |1 1 7.0
        |""".stripMargin)
    val h = Mtx.header(spark, p)
    assert(h === Mtx.Header(3, 3, 4, symmetric = false, pattern = false))
    val e = Mtx.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e === Set((1L, 2L, 5.0), (2L, 3L, 1.5), (3L, 1L, 2.0), (1L, 1L, 7.0)))
  }

  test("mtx write -> read roundtrip (the mtx-dump interop path)") {
    val spark2 = spark
    import spark2.implicits._
    val edges = Seq((0L, 3L, 1.0), (3L, 0L, 1.0), (1L, 2L, 2.5), (2L, 1L, 2.5),
      (3L, 3L, 4.0)).toDF("src", "dst", "w")
    val p = Files.createTempFile("w", ".mtx").toString
    Mtx.write(edges, p)
    val h = Mtx.header(spark, p)
    assert(h.rows === 3 && h.nnz === 5 && !h.symmetric) // max id, all 5 rows
    val back = Mtx.read(spark, p, weighted = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back === Set((0L, 3L, 1.0), (3L, 0L, 1.0), (1L, 2L, 2.5),
      (2L, 1L, 2.5), (3L, 3L, 4.0)))
  }

  test("mtx symmetric pattern: both directions, w=1, self loop kept once") {
    val p = Files.createTempFile("s", ".mtx").toString
    Files.writeString(java.nio.file.Paths.get(p),
      """%%MatrixMarket matrix coordinate pattern symmetric
        |3 3 3
        |2 1
        |3 2
        |2 2
        |""".stripMargin)
    val e = Mtx.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e === Set((2L, 1L, 1.0), (1L, 2L, 1.0), (3L, 2L, 1.0), (2L, 3L, 1.0), (2L, 2L, 1.0)))
  }

  test("snap reader: comments skipped, unweighted w=1") {
    val p = Files.createTempFile("s", ".txt").toString
    Files.writeString(java.nio.file.Paths.get(p),
      "# SNAP-ish\n1 2\n2 3\n")
    val e = Mtx.readSnap(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e === Set((1L, 2L, 1.0), (2L, 3L, 1.0)))
  }

  test("batch apply: delete existing only, insert new only, last write wins") {
    val spark2 = spark
    import spark2.implicits._
    val edges = EdgeTable.of(spark, Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0)))
    val dels = Seq((2L, 3L), (9L, 9L)).toDF("src", "dst") // (9,9) doesn't exist
    val ins = Seq((1L, 2L, 5.0, 0L), (4L, 5L, 1.0, 0L), (4L, 5L, 9.0, 1L))
      .toDF("src", "dst", "w", "seq") // (1,2) exists -> dropped; (4,5) dup -> seq 1 wins
    val next = Batch.apply(edges, ins, dels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(next === Set((1L, 2L, 1.0), (3L, 4L, 1.0), (4L, 5L, 9.0)))
  }

  test("mtx: an edge row textually equal to the size line is NOT dropped") {
    // 2x2 with 2 entries; the edge (2,2,2.0) repeats the size line "2 2 2"
    val p = Files.createTempFile("m", ".mtx").toString
    Files.writeString(java.nio.file.Paths.get(p),
      "%%MatrixMarket matrix coordinate real general\n% c1\n% c2\n2 2 2\n1 2 1.0\n2 2 2\n")
    val e = Mtx.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e === Set((1L, 2L, 1.0), (2L, 2L, 2.0)))
  }

  test("symmetric batch with conflicting directions resolves deterministically (last seq wins)") {
    val spark2 = spark
    import spark2.implicits._
    val edges = EdgeTable.of(spark, Seq((8L, 9L, 1.0), (9L, 8L, 1.0)))
    // both directions of the SAME unordered pair in one batch with
    // different weights: the higher seq must win in BOTH directions
    val ins = Seq((1L, 2L, 5.0, 1L), (2L, 1L, 9.0, 2L)).toDF("src", "dst", "w", "seq")
    val next = Batch.apply(edges, ins, spark.emptyDataFrame
        .select(lit(0L).as("src"), lit(0L).as("dst")).limit(0), symmetric = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(next === Set((8L, 9L, 1.0), (9L, 8L, 1.0), (1L, 2L, 9.0), (2L, 1L, 9.0)))
  }

  test("bfs distances on a path graph") {
    val spark2 = spark
    import spark2.implicits._
    val edges = EdgeTable.undirected(spark,
      Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (10L, 11L, 1.0)))
    val d = Bfs.run(edges, Seq(0L).toDF("id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3)) // other component unreached
  }
}
