package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GraphStreamSpec extends SparkSpec {
  import GraphStream.EdgeOp
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def edgeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("src", "dst", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed batches land as a snapshot chain with tidy batch semantics") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graphstream").toString

    val b0 = Seq(EdgeOp("I", 1, 2, 1.0, 0), EdgeOp("I", 2, 3, 1.0, 1))
    // inserting an existing edge is a no-op (the reference's tidy rule)
    val b1 = Seq(EdgeOp("I", 3, 4, 2.0, 0), EdgeOp("I", 1, 2, 9.0, 1))
    // delete + insert in one batch = weight update
    val b2 = Seq(EdgeOp("D", 2, 3, 0.0, 0), EdgeOp("I", 2, 3, 5.0, 1),
                 EdgeOp("D", 9, 9, 0.0, 2)) // deleting a missing edge is a no-op
    val ms = MemoryStream[EdgeOp]
    val q = GraphStream.maintain(ms.toDS(), root, "g",
      onBatch = (_, edges, _) => Map("edges" -> edges.count().toString))
    try {
      ms.addData(b0); q.processAllAvailable()
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()

    assert(Snapshots.committed(root, "g") === Seq(0L, 1L, 2L))
    val (lastId, finalEdges) = GraphStream.current(spark, root, "g").get
    assert(lastId === 2L)
    assert(edgeSet(finalEdges) === Set((1L, 2L, 1.0), (3L, 4L, 2.0), (2L, 3L, 5.0)))
    // time travel: every historical state stays readable
    assert(edgeSet(Snapshots.read(spark, root, "g", 0, GraphStream.EdgeState)) ===
      Set((1L, 2L, 1.0), (2L, 3L, 1.0)))
    // manifests chain parent ids and carry the onBatch metrics
    assert(Snapshots.manifestText(root, "g", 1).contains(""""parentId":0"""))
    assert(Snapshots.manifestText(root, "g", 2).contains(""""parentId":1"""))
    assert(Snapshots.manifestText(root, "g", 2).contains(""""edges":"3""""))

    // streaming fold == batch fold of the same batches
    val batched = Seq(b0, b1, b2).foldLeft(
      spark.emptyDataset[EdgeOp].toDF().select(col("src"), col("dst"), col("w"))) {
      (st, b) => GraphStream.applyOps(st, b.toDF(), symmetric = false)
    }
    assert(edgeSet(batched) === edgeSet(finalEdges))

    // idempotent sink: a fresh stream re-delivering already-committed batch
    // ids (a restart replay) must not change any committed state
    val ms2 = MemoryStream[EdgeOp]
    val q2 = GraphStream.maintain(ms2.toDS(), root, "g")
    try { ms2.addData(Seq(EdgeOp("I", 7, 8, 1.0, 0))); q2.processAllAvailable() }
    finally q2.stop()
    assert(Snapshots.committed(root, "g") === Seq(0L, 1L, 2L))
    assert(edgeSet(GraphStream.current(spark, root, "g").get._2) === edgeSet(finalEdges))
  }

  test("streaming community maintenance tracks graph evolution incrementally") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graphstream-leiden").toString
    def clique(ids: Seq[Long]) = for {
      a <- ids; b <- ids if a < b
    } yield EdgeOp("I", a, b, 1.0, 0)
    // batch 0: two 4-cliques weakly bridged; batch 1: cut the bridge, add a third clique
    val b0 = clique(Seq(0, 1, 2, 3)) ++ clique(Seq(10, 11, 12, 13)) :+ EdgeOp("I", 3, 10, 0.1, 0)
    val b1 = Seq(EdgeOp("D", 3, 10, 0.0, 0)) ++ clique(Seq(20, 21, 22, 23))
    val opts = graft.leiden.LeidenOptions(maxIterations = 8, maxPasses = 3)
    val ms = MemoryStream[EdgeOp]
    val q = GraphStream.maintainCommunities(ms.toDS(), root, "comm", opts)
    try {
      ms.addData(b0); q.processAllAvailable()
      ms.addData(b1); q.processAllAvailable()
    } finally q.stop()

    def parts(df: DataFrame): Set[Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
        .values.map(_.map(_._1).toSet).toSet
    val m0 = parts(Snapshots.read(spark, root, "comm", 0, GraphStream.MembershipState))
    assert(m0 === Set(Set(0L, 1L, 2L, 3L), Set(10L, 11L, 12L, 13L)))
    val m1 = parts(Snapshots.read(spark, root, "comm", 1, GraphStream.MembershipState))
    assert(m1 === Set(Set(0L, 1L, 2L, 3L), Set(10L, 11L, 12L, 13L), Set(20L, 21L, 22L, 23L)))
    assert(Snapshots.manifestText(root, "comm", 1).contains(""""communities":"3""""))

    // incremental result == from-scratch detection on the final edge table
    val finalEdges = GraphStream.current(spark, root, "comm").get._2
    val scratch = graft.leiden.Leiden.detect(finalEdges, opts)
    assert(parts(scratch.membership) === m1)
    val incQ = Snapshots.manifestText(root, "comm", 1)
      .split("\"modularity\":\"")(1).takeWhile(_ != '"').toDouble
    assert(approx(incQ, scratch.modularity, 1e-9))
  }

  test("symmetric maintenance mirrors every touched pair") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graphstream-sym").toString
    val ms = MemoryStream[EdgeOp]
    val q = GraphStream.maintain(ms.toDS(), root, "sym", symmetric = true)
    try {
      ms.addData(Seq(EdgeOp("I", 1, 2, 1.0, 0))); q.processAllAvailable()
      ms.addData(Seq(EdgeOp("D", 2, 1, 0.0, 0))); q.processAllAvailable()
    } finally q.stop()
    assert(edgeSet(Snapshots.read(spark, root, "sym", 0, GraphStream.EdgeState)) ===
      Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
    assert(GraphStream.current(spark, root, "sym").get._2.count() === 0L)
  }
}
