package graft.leiden

import graft.algo.Components
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Refinement phase: split each community into well-connected sub-communities
  * before aggregation.
  *
  * The reference re-runs local moving over singletons restricted to each
  * community bound, with CAS-guarded first-wins merges
  * (`/root/reference/inc/leiden.hxx:734-743,359-375`). Its purpose — the
  * property Leiden guarantees over Louvain — is that every aggregated
  * super-vertex is an internally CONNECTED subset of a community, so no
  * disconnected communities survive
  * (`/root/reference/README.md` Leiden premise; disconnected check
  * `/root/reference/inc/properties.hxx:379-401`).
  *
  * Distributed formulation: the refined partition is the set of connected
  * components of each community's induced subgraph — deterministic, shuffle-
  * friendly (reuses the Components superstep), and guarantees the same
  * invariant by construction. Sub-community ids are globally unique (min
  * member vertex id), so no renumbering join is needed before aggregation.
  */
object Refine {

  /** @param edges symmetrized (src,dst,w) of the current pass's graph
    * @param membership (id, comm) after local moving — becomes the "bound"
    * @return (id, comm, bound): refined sub-community + its bound community
    */
  def refine(edges: DataFrame, membership: DataFrame): DataFrame = {
    val ms = membership.select(col("id").as("src"), col("comm").as("csrc"))
    val md = membership.select(col("id").as("dst"), col("comm").as("cdst"))
    val intra = edges
      .filter(col("src") =!= col("dst"))
      .join(ms, "src").join(md, "dst")
      .filter(col("csrc") === col("cdst"))
      .select("src", "dst", "w")
    val labels = Components.connectedComponents(intra, membership.select("id"))
    labels
      .join(membership, "id")
      .select(col("id"), col("comp").as("comm"), col("comm").as("bound"))
  }
}
