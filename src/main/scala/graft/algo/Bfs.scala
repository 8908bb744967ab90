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
    val spark = edges.sparkSession
    // dense tier (DenseKernel scaladoc): local master + ids below the
    // broadcast gate => shared dist array + frontier bitset, one job per
    // LEVEL instead of a join + distinct + anti-join + two counts. Level
    // semantics are identical (synchronous frontier swap), so (id, dist)
    // matches the Catalyst plan exactly at any maxDepth.
    if (spark.sparkContext.isLocal) {
      val maxE = edges.agg(greatest(max(col("src").cast("long")), max(col("dst").cast("long")))).head()
      val maxS = sources.agg(max(col("id").cast("long"))).head()
      val hi = math.max(if (maxE.isNullAt(0)) -1L else maxE.getLong(0),
        if (maxS.isNullAt(0)) -1L else maxS.getLong(0))
      if (hi >= 0 && hi < graft.leiden.LocalMove.CtBroadcastMax) {
        import spark.implicits._
        val n = hi.toInt + 1
        val src = sources.select(col("id").cast("long")).as[Long].collect()
          .map(_.toInt)
        val packed = DenseKernel.pack(edges).cache()
        val dist = DenseKernel.bfs(packed, n, src, maxDepth)
        packed.unpersist(blocking = false)
        val dB = spark.sparkContext.broadcast(dist)
        val out = PlanUtils.checkpointTruncated(
          spark.range(n).as[Long]
            .mapPartitions(it => it.flatMap { v =>
              val d = dB.value(v.toInt)
              if (d >= 0) Iterator.single((v, d)) else Iterator.empty
            }).toDF("id", "dist"))
        dB.destroy()
        return out
      }
    }
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
