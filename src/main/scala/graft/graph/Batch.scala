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
    def mirror(df: DataFrame) = {
      val cols = df.columns
      val rev = df.withColumn("__t", col("src"))
        .withColumn("src", col("dst")).withColumn("dst", col("__t")).drop("__t")
        .select(cols.map(col): _*)
      df.unionByName(rev).dropDuplicates("src", "dst")
    }
    val del = if (symmetric) mirror(deletions.select("src", "dst")) else deletions.select("src", "dst")
    val ins0 = if (symmetric) mirror(insertions) else insertions
    val afterDel = edges.join(tidyDeletions(del, edges), Seq("src", "dst"), "left_anti")
    afterDel.unionByName(tidyInsertions(ins0, afterDel))
  }
}
