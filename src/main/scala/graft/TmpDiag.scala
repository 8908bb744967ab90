package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic (not committed): g_leiden / g_leiden_lowmem at a
  * given sf, printing phases, pass/iteration counts and a result hash,
  * twice each in one JVM.
  */
object TmpDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val slots = sys.env.getOrElse("SPARK_GRAFT_DIAG_SLOTS", "0").toInt
    val spark = Sessions.local(32, "graft-tmpdiag")
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val r = graft.leiden.Leiden.detect(SparkEntry.copurchaseSym(spark, sfDir),
        graft.leiden.LeidenOptions(maxIterations = 8, maxPasses = 4,
          sketchSlots = slots, minMovedFraction = 1e-3))
      val hist = r.membership.groupBy("comm").agg(count(lit(1)).as("size"))
        .orderBy("comm").collect().map(row => s"${row.getLong(0)}:${row.getLong(1)}").mkString(",")
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"RUN$i secs=${"%.2f".format(secs)} iters=${r.iterations} passes=${r.passes} " +
        s"comms=${r.communities} q=${r.modularity} histMd5=${java.security.MessageDigest.getInstance("MD5").digest(hist.getBytes).map("%02x".format(_)).mkString}")
      println(s"RUN$i phases=${r.phaseMillis.toSeq.sortBy(_._1)}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
