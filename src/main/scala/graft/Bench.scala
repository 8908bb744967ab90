package graft

import graft.graph.EdgeTable
import graft.leiden.LocalMove
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanUtils

/** Per-round benchmark (driver contract; BASELINE.json metric).
  *
  * Headline: Leiden local-move throughput in edges/sec/iteration on the
  * deterministic hub-skewed web fixture (one iteration = the even+odd
  * half-sweep pair over the whole affected frontier). The fixture is a pure
  * function of (vertex id), so every parallelism level sees byte-identical
  * input — the in-sandbox stand-in for the north rule's N vs 4N executor
  * scaling runs (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 and
  * compare.
  *
  * Also times a representative slice of SparkEntry.queries on the given
  * scale-factor directory. Prints ONE JSON line.
  */
object Bench {

  val TimedQueries = Seq(
    "q1_agg", "g_degree", "g_copurchase", "g_triangles", "g_pagerank",
    "g_leiden", "g_leiden_lowmem", "d_token_stats", "d_exact_dup",
    "d_ngram_overlap", "d_minhash_pairs", "d_simhash_pairs",
    "e_ann_topk", "ev_window")

  def leidenSuperstepThroughput(spark: SparkSession, nVerts: Long, iters: Int): (Double, Long, Double) = {
    val edges = EdgeTable.canonicalize(Cli.fixtureEdges(spark, nVerts)).cache()
    val e = edges.count()
    val m = EdgeTable.totalWeight(edges) / 2
    val vtot = PlanUtils.checkpointTruncated(EdgeTable.vertexWeights(edges))
    var state = vtot.select(col("id"), col("id").as("comm"), col("vtot"), lit(true).as("aff"))
    // warmup: one half-sweep primes codegen + the edge cache
    state = LocalMove.sweep(edges, state, m, 1.0, 0).state
    val t0 = System.nanoTime()
    var done = 0
    while (done < iters) {
      state = LocalMove.sweep(edges, state, m, 1.0, 1).state
      state = LocalMove.sweep(edges, state, m, 1.0, 0).state
      done += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    edges.unpersist()
    (e.toDouble * iters / secs, e, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fixtureVerts = sys.env.getOrElse("SPARK_GRAFT_BENCH_VERTS", "200000").toLong
    val spark = Sessions.local(cpus, "graft-bench")

    val queries = SparkEntry.queries
    val timedSet = if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) Seq.empty else TimedQueries
    val results = timedSet.map { name =>
      val t0 = System.nanoTime()
      val n = try queries(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      name -> ((System.nanoTime() - t0) / 1e9, n)
    }

    val (eps, fixtureEdgeCount, supersteps) = leidenSuperstepThroughput(spark, fixtureVerts, iters = 2)

    val qs = results.map { case (k, (s, _)) => s""""$k":${"%.3f".format(s)}""" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""leiden_edges_per_sec_per_iter":${"%.0f".format(eps)},""" +
      s""""fixture_edges":$fixtureEdgeCount,"superstep_secs":${"%.3f".format(supersteps)},"cpus":$cpus}""")
    spark.stop()
  }
}
