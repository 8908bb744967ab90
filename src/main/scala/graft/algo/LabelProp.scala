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
    * @param sketchSlots low-memory variant (the reference family's MG-LPA,
    *        `/root/reference/README.md:3`: the per-thread hashtable is
    *        replaced by a Misra-Gries sketch in Leiden AND LPA): a bounded
    *        `graft.leiden.MGSketch` buffer per vertex selects <= k
    *        candidate labels, then EXACT weights are recomputed only for
    *        the survivors plus the vertex's own label — hub vertices get a
    *        fixed-size aggregation state instead of one hash-map entry per
    *        distinct neighbor label. 0 = exact (default). Any label holding
    *        more than 1/(k+1) of a vertex's scanned weight always survives
    *        the sketch, so on modular graphs the recovered blocks match the
    *        exact run (pinned by AlgoSpec).
    * @param phase the 2-coloring schedule: maps (src column, round) to a
    *        0/1 phase class. Default: murmur3 of (src, round) — re-drawn
    *        every round (see the in-loop comment). Any deterministic
    *        function works; `g_lpa_k2` passes plain (src + round) parity so
    *        a DuckDB oracle can replicate the schedule cross-engine (the
    *        same device as the md5 twins of the xxhash pipelines).
    * @return (id, label); label = a vertex id, communities = equal labels
    */
  def run(edges: DataFrame, maxRounds: Int = 20, sketchSlots: Int = 0,
          phase: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
            (src, round) => pmod(hash(src, lit(round)), lit(2))): DataFrame = {
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
        val scanned = e
          .join(labels.select(col("id").as("dst"), col("label")), "dst")
          .filter(phase(col("src"), round) === parity)
          .select(col("src"), col("label"), col("w"))
        val lw =
          if (sketchSlots <= 0)
            scanned.groupBy(col("src"), col("label")).agg(sum("w").as("lw"))
          else {
            // MG candidate filter + exact re-score of the survivors — the
            // same two-step shape as the Leiden low-memory scan
            // (graft.leiden.LocalMove). The vertex's own label is always
            // re-scored too: the stability rule compares against cw, which
            // must be the TRUE current-label weight, not a sketch estimate.
            val candPairs = scanned.groupBy(col("src"))
              .agg(graft.leiden.MGSketch.sketch(sketchSlots)(col("label"), col("w")).as("cands"))
              .select(col("src"), explode(col("cands")).as("c"))
              .select(col("src"), col("c.comm").as("label"))
            scanned.join(
                candPairs.unionByName(labels.select(col("id").as("src"), col("label"))).distinct(),
                Seq("src", "label"), "left_semi")
              .groupBy(col("src"), col("label")).agg(sum("w").as("lw"))
          }
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
