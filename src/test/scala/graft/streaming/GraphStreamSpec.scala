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
