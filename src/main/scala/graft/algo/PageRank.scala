package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanUtils

/** PageRank by power iteration (mandated by BASELINE.json north_rule;
  * standard public algorithm — damping alpha, dangling mass redistributed
  * uniformly, double precision throughout, ranks sum to 1).
  *
  * One HEAVY job per iteration: the edges-x-contribs gather join + hash
  * aggregation + state update, materialized once (PlanUtils). Everything
  * else reads that materialization: the state row carries `outw` and the
  * previous rank, so the dangling mass for the NEXT iteration and the L1
  * delta for THIS one come from a single cheap scan-aggregation over the
  * checkpointed blocks — no extra joins, no per-iteration recomputation.
  * (Round-1 shape ran three driver actions per iteration — dangling `head`,
  * checkpoint, delta `head` — which dominated wall-clock at fixed cost.)
  *
  * Edges are cached pre-partitioned by `src`, so the gather join reuses the
  * cache's hash partitioning and only the O(V) contribs side shuffles.
  */
object PageRank {

  /** @param edges directed (src,dst,w) — weights define the split of a
    *              vertex's rank among its out-neighbors
    * @return (id, rank), sum(rank) == 1 +- fp error
    */
  def run(edges: DataFrame, alpha: Double = 0.85, tol: Double = 1e-6,
          maxIters: Int = 100): DataFrame = {
    val e = edges.select("src", "dst", "w").repartition(col("src")).cache()
    val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()

    // out-weight per vertex; dangling vertices have none
    val outW = e.groupBy(col("src").as("id")).agg(sum("w").as("outw"))
    val base = PlanUtils.checkpointTruncated(
      verts.join(outW, Seq("id"), "left").na.fill(0.0, Seq("outw"))
        .select(col("id"), col("outw")))
    val n = base.count().toDouble
    var state = PlanUtils.checkpointTruncated(
      base.select(col("id"), col("outw"), lit(1.0 / n).as("rank")))
    PlanUtils.release(base)
    var dangling = state.filter(col("outw") === 0.0)
      .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)

    var it = 0
    var delta = Double.MaxValue
    while (delta > tol && it < maxIters) {
      val contribs = state.filter(col("outw") > 0.0)
        .select(col("id").as("src"), (col("rank") / col("outw")).as("unit"))
      val gathered = e.join(contribs.hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("w") * col("unit")).as("gath"))
      val next = PlanUtils.checkpointTruncated(
        state.select(col("id"), col("outw"), col("rank").as("prev"))
          .join(gathered, Seq("id"), "left")
          .select(col("id"), col("outw"),
            (lit((1 - alpha) / n) + lit(alpha) *
              (coalesce(col("gath"), lit(0.0)) + lit(dangling / n))).as("rank"),
            col("prev")))
      // one cheap scan: dangling mass for iteration t+1, L1 delta for t
      val stats = next.agg(
        coalesce(sum(when(col("outw") === 0.0, col("rank"))), lit(0.0)),
        coalesce(sum(abs(col("rank") - col("prev"))), lit(0.0))).head
      dangling = stats.getDouble(0)
      delta = stats.getDouble(1)
      PlanUtils.release(state)
      state = next
      it += 1
    }
    e.unpersist()
    state.select("id", "rank")
  }

  /** Sequential double-precision oracle for tests (same semantics). */
  def sequential(edges: Seq[(Long, Long, Double)], alpha: Double = 0.85,
                 tol: Double = 1e-6, maxIters: Int = 100): Map[Long, Double] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = verts.size.toDouble
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byDst = edges.groupBy(_._2)
    var ranks = verts.map(v => v -> 1.0 / n).toMap
    var it = 0
    var delta = Double.MaxValue
    while (delta > tol && it < maxIters) {
      val dangling = verts.filter(v => outW.getOrElse(v, 0.0) == 0.0).map(ranks).sum
      val next = verts.map { v =>
        val gath = byDst.getOrElse(v, Seq.empty)
          .map { case (s, _, w) => ranks(s) / outW(s) * w }.sum
        v -> ((1 - alpha) / n + alpha * (gath + dangling / n))
      }.toMap
      delta = verts.map(v => math.abs(next(v) - ranks(v))).sum
      ranks = next
      it += 1
    }
    ranks
  }
}
