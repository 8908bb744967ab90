package graft.streaming

import graft.graph.Batch
import graft.io.Snapshots
import graft.leiden.{Leiden, LeidenOptions}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Streaming edge-table maintenance: a `readStream` of edge operations
  * applied micro-batch by micro-batch through the tidy batch-update
  * pipeline (graft.graph.Batch — the reference's applyBatchUpdateU,
  * `/root/reference/inc/batch.hxx:223-248`), each batch committed as a new
  * Snapshots snapshot. This is the reference's dynamic-graph batch loop
  * (SURVEY.md §2.8) lifted onto Structured Streaming: where the reference
  * replays insertion/deletion batches over an in-memory CSR on one node,
  * the stream lands every batch as a durable Iceberg-style snapshot whose
  * manifest carries the parent id, per-partition lineage, and the caller's
  * metrics — so the maintained graph is resumable, time-travelable (every
  * historical state stays readable by snapshot id), and immediately
  * queryable by the batch operators (degrees, PageRank, incremental Leiden
  * seeded from the previous membership).
  *
  * Operation schema: (op string 'I'|'D', src long, dst long, w double,
  * seq long). Within a batch the semantics are exactly Batch.apply's:
  * deletions restricted to existing edges run first, then insertions
  * restricted to still-absent (src,dst) with last-write-wins by (seq, w)
  * — so "update edge weight" is a D followed by an I in the same or a
  * later batch, and inserting an existing edge is a no-op (the reference's
  * tidy rule). With `symmetric`, both directions of every touched
  * unordered pair are updated.
  *
  * Exactly-once: the streaming engine can re-deliver the last batch after
  * a crash; the snapshot id IS the micro-batch id, so a replayed batch
  * whose id is already committed is skipped (idempotent sink — the same
  * txn-id pattern Delta/Iceberg sinks use).
  *
  * Scale shape: state lives in the snapshot store, never in executor
  * memory. Each batch costs one left_anti + one left_semi join of the
  * current edge table against the batch — shuffle keyed by (src,dst) on
  * the big side only when the batch is too large to broadcast (AQE
  * broadcasts typical batches), plus one parquet rewrite of the table.
  * At 100 TB the rewrite dominates; the drop-in Iceberg backend
  * (Snapshots' scaladoc) turns that into metadata-only append/delete-file
  * commits while this interface stays fixed.
  */
object GraphStream {

  /** Dataset name of the maintained edge table inside each snapshot. */
  val EdgeState = "edges"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Loud witness of the idempotent-sink skip: a skipped NON-EMPTY batch is
    * the legitimate crash-replay of an already-committed batch — unless the
    * stream was restarted WITHOUT a checkpointLocation, in which case source
    * batch ids reset to 0 and genuinely new data would collide with old
    * snapshot ids and be dropped here. The two cases are indistinguishable
    * from inside the sink (same id, both non-empty), so this warns instead
    * of throwing; run restarted streams with a checkpoint (scaladoc below).
    */
  private def warnSkip(table: String, batchId: Long, batch: Dataset[Row]): Unit =
    if (!batch.isEmpty)
      log.warn(s"[$table] skipping non-empty batch $batchId: snapshot already " +
        "committed. If this stream was RESTARTED without a checkpointLocation, " +
        "this is NEW DATA being dropped as a presumed replay - restart-with-new-" +
        "data semantics require the checkpoint option.")

  case class EdgeOp(op: String, src: Long, dst: Long, w: Double, seq: Long)

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("w", DoubleType)))

  private def emptyEdges(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], edgeSchema)

  /** The latest committed (snapshotId, edge table) of a maintained graph,
    * if any — the resume/read point for downstream batch analytics.
    */
  def current(spark: SparkSession, root: String, table: String): Option[(Long, DataFrame)] =
    Snapshots.committed(root, table).lastOption
      .map(id => id -> Snapshots.read(spark, root, table, id, EdgeState))

  /** One batch of ops applied to one edge-table state (the pure core —
    * the streaming sink below folds it over micro-batches; batch callers
    * and tests use it directly).
    */
  def applyOps(edges: DataFrame, ops: DataFrame, symmetric: Boolean = false): DataFrame =
    Batch.apply(edges,
      ops.filter(col("op") === "I").select(col("src"), col("dst"), col("w"), col("seq")),
      ops.filter(col("op") === "D").select(col("src"), col("dst")),
      symmetric)

  /** Start the maintenance sink on a streaming Dataset/DataFrame of edge
    * ops. `onBatch(spark, newEdges, batchId)` runs inside each commit and
    * its returned metrics land in the snapshot manifest (e.g. edge count,
    * modularity of an incremental re-cluster); keep it cheap or absent.
    *
    * @param init edge table used as the parent state of the FIRST batch
    *             only (ignored whenever a committed snapshot exists)
    * @param checkpoint Structured Streaming checkpoint dir (source offsets).
    *                   REQUIRED for restart-with-new-data semantics: without
    *                   it a restarted source numbers fresh batches from 0,
    *                   which the idempotent sink must treat as replays of the
    *                   committed snapshots 0..N and skip (with a loud WARN).
    *                   Crash-replay within one checkpointed stream is safe
    *                   either way.
    */
  def maintain(ops: Dataset[_], root: String, table: String,
               symmetric: Boolean = false,
               init: Option[DataFrame] = None,
               checkpoint: Option[String] = None,
               onBatch: (SparkSession, DataFrame, Long) => Map[String, String] =
                 (_, _, _) => Map.empty): StreamingQuery = {
    val writer: DataStreamWriter[Row] = ops.toDF().writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val last = Snapshots.committed(root, table).lastOption
        if (last.exists(_ >= batchId)) warnSkip(table, batchId, batch)
        else {
          val prev = last.map(id => Snapshots.read(spark, root, table, id, EdgeState))
            .orElse(init).getOrElse(emptyEdges(spark))
          val next = applyOps(prev, batch.toDF(), symmetric)
          Snapshots.commit(root, table, batchId, last, Map(EdgeState -> next),
            Map("batchId" -> batchId.toString) ++ onBatch(spark, next, batchId))
        }
        ()
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Dataset name of the maintained community membership. */
  val MembershipState = "membership"

  /** Streaming DYNAMIC community detection: maintainCommunities folds each
    * op batch into the edge table (always symmetric — Leiden's input
    * contract) and re-clusters INCREMENTALLY, seeding Leiden's fi/fm hooks
    * from the previous snapshot: the last membership warm-starts every
    * vertex and only the batch's touched endpoints start marked affected
    * (moves re-mark their neighbors, so corrections propagate exactly as
    * far as the update's impact — the reference family's delta-screening
    * dynamic batch loop, run as a stream). Each snapshot carries BOTH
    * datasets (edges + membership) and the clustering metrics
    * (modularity, communities, iterations) in its manifest, so the
    * community history of the graph is itself time-travelable.
    *
    * Scale: per batch, one tidy batch-apply plus one warm Leiden run whose
    * pass-0 scan touches only the affected frontier — for a batch touching
    * k vertices of an n-vertex graph the re-cluster is O(frontier), not
    * O(n), except when moves genuinely cascade.
    */
  def maintainCommunities(ops: Dataset[_], root: String, table: String,
                          leidenOpts: LeidenOptions = LeidenOptions(),
                          checkpoint: Option[String] = None): StreamingQuery = {
    require(leidenOpts.snapshotDir.isEmpty,
      "pass-level Leiden snapshots clash with the per-batch catalog; leave snapshotDir empty")
    val writer: DataStreamWriter[Row] = ops.toDF().writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val last = Snapshots.committed(root, table).lastOption
        if (last.exists(_ >= batchId)) warnSkip(table, batchId, batch)
        else {
          val prev = last.map(id => Snapshots.read(spark, root, table, id, EdgeState))
            .getOrElse(emptyEdges(spark))
          val prevMemb = last.map(id => Snapshots.read(spark, root, table, id, MembershipState))
          val next = applyOps(prev, batch.toDF(), symmetric = true)
          val touched = batch.select(col("src").cast("long").as("id"))
            .unionByName(batch.select(col("dst").cast("long").as("id"))).distinct()
          val r = Leiden.detect(next, leidenOpts,
            prevMembership = prevMemb,
            affected = if (prevMemb.isDefined) Some(touched) else None)
          Snapshots.commit(root, table, batchId, last,
            Map(EdgeState -> next, MembershipState -> r.membership),
            Map("batchId" -> batchId.toString,
              "modularity" -> r.modularity.toString,
              "communities" -> r.communities.toString,
              "iterations" -> r.iterations.toString))
        }
        ()
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
