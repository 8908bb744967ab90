package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dynamic batch updates (SURVEY.md §2.6 SO1-SO3;
  * `/root/reference/inc/batch.hxx:100-248`): edge insertions/deletions
  * applied as a new edge-table snapshot.
  *
  * Tidy pipeline mirrors the reference (`batch.hxx:154-209`):
  * deletions keep only edges that exist; insertions keep only edges that
  * do NOT exist; both sorted by (src,dst) and deduplicated.
  */
object Batch {

  /** Deletions restricted to existing edges (`batch.hxx:154-161`). */
  def tidyDeletions(deletions: DataFrame, edges: DataFrame): DataFrame =
    deletions.select("src", "dst")
      .join(edges.select("src", "dst"), Seq("src", "dst"), "left_semi")
      .dropDuplicates("src", "dst")
      .sortWithinPartitions("src", "dst")

  /** Insertions restricted to new edges; last write per (src,dst) wins
    * (`batch.hxx:167-209` + `_bitset.hxx:245-262` semantics), using the
    * `seq` column as the write order.
    */
  def tidyInsertions(insertions: DataFrame, edges: DataFrame, seqCol: String = "seq"): DataFrame = {
    val base = if (insertions.columns.contains(seqCol)) insertions
      else insertions.withColumn(seqCol, lit(0L))
    val w = Window.partitionBy("src", "dst").orderBy(col(seqCol).desc, col("w").desc)
    base
      .join(edges.select("src", "dst"), Seq("src", "dst"), "left_anti")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("src", "dst", "w")
      .sortWithinPartitions("src", "dst")
  }

  /** Apply deletions then insertions (`applyBatchUpdateU`,
    * `batch.hxx:223-248`) producing the next snapshot of the edge table.
    * With `symmetric`, both directions of every touched pair are updated.
    */
  def apply(edges: DataFrame, insertions: DataFrame, deletions: DataFrame,
            symmetric: Boolean = false): DataFrame = {
    // Symmetric insertions: resolve conflicting (u,v)/(v,u) rows PER
    // UNORDERED PAIR first (seq desc, w desc — the same last-write-wins
    // rule as EdgeTable.dedupLastSeq), then emit both directions. A plain
    // union+dropDuplicates would keep a partition-order-dependent survivor
    // when a batch carries both directions with different weights.
    def mirrorIns(ins: DataFrame): DataFrame = {
      val base = if (ins.columns.contains("seq")) ins else ins.withColumn("seq", lit(0L))
      val w = Window.partitionBy("lo", "hi").orderBy(col("seq").desc, col("w").desc)
      val canon = base.select(
          least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"),
          col("w"), col("seq"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select("lo", "hi", "w", "seq")
      canon.select(col("lo").as("src"), col("hi").as("dst"), col("w"), col("seq"))
        .unionByName(canon.filter(col("lo") =!= col("hi"))
          .select(col("hi").as("src"), col("lo").as("dst"), col("w"), col("seq")))
    }
    // deletions carry no payload — both directions, exact dedup
    def mirrorDel(df: DataFrame) = {
      val d = df.select("src", "dst")
      d.unionByName(d.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }
    val del = if (symmetric) mirrorDel(deletions) else deletions.select("src", "dst")
    val ins0 = if (symmetric) mirrorIns(insertions) else insertions
    val afterDel = edges.join(tidyDeletions(del, edges), Seq("src", "dst"), "left_anti")
    afterDel.unionByName(tidyInsertions(ins0, afterDel))
  }
}
