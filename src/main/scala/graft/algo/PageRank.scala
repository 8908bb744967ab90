package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanUtils

/** PageRank by power iteration (mandated by BASELINE.json north_rule;
  * standard public algorithm — damping alpha, dangling mass redistributed
  * uniformly, double precision throughout, ranks sum to 1).
  *
  * Per iteration: one shuffle join (ranks x edges on src) + one hash
  * aggregation on dst + a broadcast-joined update. Lineage/statistics are
  * truncated every iteration (PlanUtils) — the same pattern every iterative
  * operator in this engine uses. Convergence on L1 delta <= tol.
  */
object PageRank {

  /** @param edges directed (src,dst,w) — weights define the split of a
    *              vertex's rank among its out-neighbors
    * @return (id, rank), sum(rank) == 1 +- fp error
    */
  def run(edges: DataFrame, alpha: Double = 0.85, tol: Double = 1e-9,
          maxIters: Int = 100): DataFrame = {
    val e = edges.select("src", "dst", "w").cache()
    val verts = PlanUtils.checkpointTruncated(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val n = verts.count().toDouble

    // out-weight per vertex; dangling vertices have none
    val outW = e.groupBy(col("src").as("id")).agg(sum("w").as("outw"))
    val base = PlanUtils.checkpointTruncated(
      verts.join(outW, Seq("id"), "left").na.fill(0.0, Seq("outw"))).cache()

    var ranks = PlanUtils.checkpointTruncated(
      base.select(col("id"), lit(1.0 / n).as("rank")))
    var it = 0
    var delta = Double.MaxValue
    while (delta > tol && it < maxIters) {
      val withOut = ranks.join(base, "id")
      val dangling = withOut.filter(col("outw") === 0.0)
        .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)
      val contribs = withOut.filter(col("outw") > 0.0)
        .select(col("id").as("src"), (col("rank") / col("outw")).as("unit"))
      val gathered = e.join(contribs, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("w") * col("unit")).as("gath"))
      val next = PlanUtils.checkpointTruncated(
        ranks.select("id")
          .join(gathered, Seq("id"), "left")
          .select(col("id"),
            (lit((1 - alpha) / n) + lit(alpha) *
              (coalesce(col("gath"), lit(0.0)) + lit(dangling / n))).as("rank")))
      delta = next.join(ranks.withColumnRenamed("rank", "prev"), "id")
        .agg(coalesce(sum(abs(col("rank") - col("prev"))), lit(0.0))).head.getDouble(0)
      PlanUtils.release(ranks)
      ranks = next
      it += 1
    }
    e.unpersist()
    base.unpersist()
    ranks
  }

  /** Sequential double-precision oracle for tests (same semantics). */
  def sequential(edges: Seq[(Long, Long, Double)], alpha: Double = 0.85,
                 tol: Double = 1e-9, maxIters: Int = 100): Map[Long, Double] = {
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
