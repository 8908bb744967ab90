package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanUtils

/** Frontier-swap breadth-first search (SURVEY.md §2.9 T1;
  * `/root/reference/inc/bfs.hxx:22-72`): per level, the frontier joins the
  * edge table, unvisited targets become the next frontier. Returns
  * (id, dist) for reached vertices. The reference's recursive DFS (T2) has
  * no distributed analog and no caller in the Leiden path; BFS covers its
  * uses (reachability, per-community connectivity).
  */
object Bfs {

  def run(edges: DataFrame, sources: DataFrame, maxDepth: Int = 200): DataFrame = {
    val e = edges.select("src", "dst").cache()
    var visited = PlanUtils.checkpointTruncated(
      sources.select(col("id"), lit(0).as("dist")))
    var frontier = visited.select("id")
    var ownFrontier = false // first frontier shares the visited checkpoint
    var depth = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val next = PlanUtils.checkpointTruncated(
        e.join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(visited.select("id"), Seq("id"), "left_anti"))
      frontierSize = next.count()
      // the old frontier's blocks are dead once `next` is materialized
      if (ownFrontier) PlanUtils.release(frontier)
      if (frontierSize > 0) {
        val nv = PlanUtils.checkpointTruncated(
          visited.unionByName(next.select(col("id"), lit(depth).as("dist"))))
        PlanUtils.release(visited)
        visited = nv
        frontier = next
        ownFrontier = true
      } else PlanUtils.release(next)
    }
    e.unpersist()
    visited
  }
}
