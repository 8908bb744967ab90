package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting on the symmetrized simple graph (mandated by
  * BASELINE.json north_rule; standard public algorithm).
  *
  * Edge-orientation trick: direct every undirected edge from the endpoint
  * with the smaller (degree, id) to the larger. Each triangle then has
  * exactly one wedge u->v, u->w with an oriented closing edge v->w, so the
  * count is one self-join plus one semi-join — the wedge explosion is
  * bounded by sum(min-degree^2) instead of sum(degree^2), which is what
  * makes it survive web-graph hubs.
  */
object Triangles {

  /** Orient the symmetrized edge set by (degree, id). */
  def orient(edges: DataFrame): DataFrame = {
    val simple = edges.filter(col("src") =!= col("dst")).select("src", "dst").distinct()
    val deg = simple.groupBy(col("src").as("id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    simple
      .join(deg.select(col("id").as("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("ddst")), "dst")
      .filter(col("dsrc") < col("ddst") ||
        (col("dsrc") === col("ddst") && col("src") < col("dst")))
      .select("src", "dst")
  }

  /** All triangles as (a, b, c) rows (each triangle exactly once). */
  def triangles(edges: DataFrame): DataFrame = {
    val o = orient(edges).cache()
    val wedges = o.select(col("src").as("a"), col("dst").as("b"))
      .join(o.select(col("src").as("a"), col("dst").as("c")), "a")
      .filter(col("b") < col("c"))
    // closing edge may be oriented either b->c or c->b
    val closed = wedges.join(
      o.select(col("src").as("b"), col("dst").as("c"))
        .union(o.select(col("dst").as("b"), col("src").as("c"))),
      Seq("b", "c"), "left_semi")
    closed.select("a", "b", "c")
  }

  /** Global triangle count. */
  def globalCount(edges: DataFrame): Long = triangles(edges).count()

  /** Per-vertex triangle counts (vertices in no triangle get 0). */
  def perVertex(edges: DataFrame): DataFrame = {
    val t = triangles(edges)
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val corners = t.select(col("a").as("id"))
      .union(t.select(col("b").as("id")))
      .union(t.select(col("c").as("id")))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    verts.join(corners, Seq("id"), "left").na.fill(0L, Seq("triangles"))
  }
}
