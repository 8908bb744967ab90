package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanUtils

/** Connected components by iterative min-label propagation.
  *
  * Exact component id = min vertex id in the component (SURVEY.md §2.10).
  * Each round every vertex adopts min(own label, neighbors' labels); fixpoint
  * when no label changes. Rounds ~ graph diameter; each round is one
  * shuffle-join (edges x labels) + one aggregation. Lineage is truncated
  * every round with localCheckpoint so 100+ round road-network-style graphs
  * don't blow up the driver.
  *
  * Also the engine's Leiden refinement core: restricted to intra-community
  * edges it yields the sub-communities that make aggregation well-connected
  * (`/root/reference/inc/leiden.hxx:734-743` refinement goal; see
  * graft.leiden.Refine for the semantic mapping).
  */
object Components {

  /** @param edges    symmetrized (src,dst,w)
    * @param vertices single-column DF "id" — every vertex that must get a
    *                 label even if isolated
    * @return (id, comp) with comp = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame, maxIters: Int = 200): DataFrame = {
    val spark = edges.sparkSession
    // dense tier (DenseKernel scaladoc): local master + ids below the
    // broadcast gate => shared-array atomic-min propagation, one job per
    // round instead of a join+agg+count per round. Fixpoint-exact, so it
    // only stands in when maxIters is the run-to-convergence default.
    if (spark.sparkContext.isLocal && maxIters >= 200) {
      val maxV = vertices.agg(max(col("id").cast("long"))).head()
      val maxE = edges.agg(greatest(max(col("src").cast("long")), max(col("dst").cast("long")))).head()
      val hi = math.max(if (maxV.isNullAt(0)) -1L else maxV.getLong(0),
        if (maxE.isNullAt(0)) -1L else maxE.getLong(0))
      if (hi >= 0 && hi < graft.leiden.LocalMove.CtBroadcastMax) {
        import spark.implicits._
        val packed = DenseKernel.pack(edges).cache()
        val lab = DenseKernel.cc(packed, hi.toInt + 1)
        packed.unpersist(blocking = false)
        val labB = spark.sparkContext.broadcast(lab)
        val out = PlanUtils.checkpointTruncated(
          vertices.select(col("id").cast("long")).as[Long]
            .mapPartitions(it => it.map(v => (v, labB.value(v.toInt).toLong)))
            .toDF("id", "comp"))
        labB.destroy()
        return out
      }
    }
    val e = edges.select("src", "dst").cache()
    var labels = PlanUtils.checkpointTruncated(
      vertices.select(col("id"), col("id").as("comp")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      // candidate label for dst = min over incoming src labels
      val viaEdges = e
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("nc"))
      val next = PlanUtils.checkpointTruncated(labels
        .join(viaEdges, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"),
          (col("nc").isNotNull && col("nc") < col("comp")).as("moved")))
      changed = next.filter(col("moved")).count()
      PlanUtils.release(labels)
      labels = next.select("id", "comp")
      it += 1
    }
    e.unpersist()
    labels
  }

  /** Number of distinct components. */
  def componentCount(labels: DataFrame): Long =
    labels.select("comp").distinct().count()

  /** Component size histogram: (comp, size). */
  def componentSizes(labels: DataFrame): DataFrame =
    labels.groupBy("comp").agg(count(lit(1)).as("size"))
}
