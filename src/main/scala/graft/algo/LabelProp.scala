package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanUtils

/** Synchronous weighted label propagation (mandated by BASELINE.json
  * north_rule; standard public algorithm).
  *
  * Each round a vertex adopts the label with the highest incident edge
  * weight among its neighbors; ties break to the smallest label (the
  * deterministic stand-in for random tie-breaks in the literature). Rounds
  * are parity-gated half-sweeps like the Leiden local move — synchronous
  * whole-graph updates oscillate on bipartite structures, the 2-coloring
  * schedule does not. Stops when no label changes or maxRounds.
  */
object LabelProp {

  /** @param edges symmetrized (src,dst,w)
    * @return (id, label); label = a vertex id, communities = equal labels
    */
  def run(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val e = edges.filter(col("src") =!= col("dst")).cache()
    val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    var materialized = PlanUtils.checkpointTruncated(
      verts.select(col("id"), col("id").as("label")))
    var labels = materialized
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      changed = 0
      for (parity <- 0 to 1) {
        // phase classes are re-drawn every round from a deterministic hash:
        // fixed classes (plain id parity) let same-class neighbor pairs swap
        // labels forever; varying the 2-coloring per round guarantees every
        // conflicting pair is eventually split across phases and resolves
        // sequentially.
        val lw = e
          .join(labels.select(col("id").as("dst"), col("label")), "dst")
          .filter(pmod(hash(col("src"), lit(round)), lit(2)) === parity)
          .groupBy(col("src"), col("label"))
          .agg(sum("w").as("lw"))
        val best = lw
          .groupBy(col("src"))
          .agg(max(struct(col("lw").as("lw"), (-col("label")).as("tb"),
            col("label").as("best"))).as("mx"))
          .select(col("src").as("id"), col("mx.best").as("nl"), col("mx.lw").as("nw"))
        // weight of the vertex's CURRENT label among its neighbors — a
        // vertex keeps its label unless strictly beaten (ties only break
        // toward a smaller label). Without this stability rule synchronous
        // LPA falls into limit cycles and never reaches an absorbing state.
        val curW = lw
          .join(labels.withColumnRenamed("id", "src"), Seq("src", "label"), "left_semi")
          .select(col("src").as("id"), col("lw").as("cw"))
        val next = PlanUtils.checkpointTruncated(
          labels.join(best, Seq("id"), "left")
            .join(curW, Seq("id"), "left")
            .na.fill(0.0, Seq("cw"))
            .select(col("id"),
              when(col("nl").isNotNull &&
                (col("nw") > col("cw") ||
                  (col("nw") === col("cw") && col("nl") < col("label"))), col("nl"))
                .otherwise(col("label")).as("newlabel"),
              col("label").as("old")))
        changed += next.filter(col("newlabel") =!= col("old")).count()
        // next is materialized; the superseded half-round's blocks are dead
        PlanUtils.release(materialized)
        materialized = next
        labels = next.select(col("id"), col("newlabel").as("label"))
      }
      round += 1
    }
    e.unpersist()
    labels
  }
}
