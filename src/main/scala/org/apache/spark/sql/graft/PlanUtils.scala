package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Lineage/statistics truncation for iterative superstep algorithms.
  *
  * `Dataset.localCheckpoint` truncates the *lineage* but carries the origin
  * plan's *statistics* into the resulting LogicalRDD. In an iterative join
  * pipeline (Leiden sweeps, label propagation, PageRank) each iteration's
  * sizeInBytes estimate is a product over the previous iteration's, so the
  * BigInt statistics grow to millions of digits within ~10 iterations and
  * join planning (`canBroadcastBySize`) degenerates into minutes of
  * BigInteger arithmetic on the driver.
  *
  * The fix: after checkpointing, rebuild the DataFrame directly from the
  * materialized InternalRow RDD, which resets statistics to the session
  * default. Runtime join planning is unaffected — AQE derives broadcast
  * decisions from actual shuffle sizes, not these logical estimates.
  *
  * Lives under org.apache.spark.sql to reach the private[sql]
  * internalCreateDataFrame (zero row-format conversion, unlike the public
  * createDataFrame(rdd.rdd, schema) which would deserialize + re-encode
  * every row).
  */
object PlanUtils {

  /** Materialize `df` once (local checkpoint) and return a DataFrame with
    * truncated lineage AND fresh statistics.
    */
  def checkpointTruncated(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      ck.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Block until the async listener bus has delivered all posted events —
    * required before reading metrics accumulated by a SparkListener
    * (task-end events post asynchronously). private[spark] on SparkContext,
    * hence surfaced here.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession, timeoutMs: Long = 30000): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** Unpersist the blocks behind a checkpointTruncated DataFrame that is no
    * longer referenced — long iterative loops otherwise accumulate one set
    * of persisted partitions per iteration for the life of the job. Safe on
    * any DataFrame (walks the short post-truncation RDD lineage and
    * unpersists whatever is persisted).
    */
  def release(df: DataFrame): Unit = {
    def walk(r: org.apache.spark.rdd.RDD[_], depth: Int): Unit = {
      if (depth > 8) return
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        r.unpersist(blocking = false)
      r.dependencies.foreach(d => walk(d.rdd, depth + 1))
    }
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => walk(l.rdd, 0)
      case _ => ()
    }
  }
}
