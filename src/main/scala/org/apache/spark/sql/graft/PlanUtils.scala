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
}
