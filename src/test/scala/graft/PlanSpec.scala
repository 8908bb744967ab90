package graft

import org.apache.spark.sql.functions._

/** Physical-plan property checks: the scale story rests on these plan
  * shapes, so they are pinned as tests rather than trusted from memory.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q3: the customer dimension broadcasts (no shuffle of orders for the join)") {
    assert(planOf("q3_seg_counts").contains("BroadcastHashJoin"))
  }

  test("d_token_stats: parquet scan prunes to exactly the referenced columns") {
    val plan = planOf("d_token_stats")
    assert(plan.contains("ReadSchema"))
    // the documents table carries more columns (url, lang, ...); the quality
    // scan must read only doc_id + text
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("url") && !read.contains("lang"), read)
  }

  test("q1: filterless agg scan is whole-stage codegen with partial aggregation") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.collect() // execute THIS plan: AQE finalizes codegen spans on execution
    val plan = df.queryExecution.executedPlan.toString
    // the executed plan renders whole-stage codegen spans as "*(n) " prefixes
    assert(plan.contains("*(") && plan.contains("isFinalPlan=true"), plan.take(500))
    // partial + final hash aggregate = map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(500))
  }

  test("q5: every dimension of the 6-way star broadcasts; date and region filters reach the scans") {
    val plan = planOf("q5_region_revenue")
    // customer, supplier, nation, region all join via broadcast — only the
    // lineitem-orders fact join may shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan.take(800))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("EqualTo(r_name,ASIA)"), plan.take(800))
  }

  test("predicate pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet").filter(col("l_quantity") > 40)
      .select("l_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"), plan)
  }

  test("ivf cell assignment is a pure per-row projection — no Exchange of the corpus") {
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.ann.Ann.ivfCentroids(corpus, 8)
    val plan = graft.ann.Ann.ivfAssign(corpus, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("renumber: dense assignment has no single-partition global sort") {
    // the former Window.orderBy("comm") formulation planned an Exchange
    // SinglePartition — a latent one-task bottleneck for any caller that
    // hands renumber a vertex-scale membership
    val mem = spark.range(0, 5000).select(col("id"), (col("id") % 97).as("comm"))
    val out = graft.leiden.Aggregate.renumber(mem)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(1200))
  }

  test("ivf broadcast path: centroid table broadcasts; corpus is never broadcast") {
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    // literalBudget = 0 forces the broadcast-centroid path at any nlist
    val plan = graft.ann.Ann.ivfTopK(queries, corpus, 3, nlist = 1024,
      nprobe = 4, literalBudget = 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(1200))
  }

  test("leiden dst-cache gather: the O(E) side has no Exchange and no Sort") {
    // the zero-E-exchange sweep plan: edges cached hash-partitioned by dst
    // scan in place; only the O(V) membership shuffles (one Exchange), the
    // mover prune broadcasts, and the shuffle-hash hint keeps the E side
    // un-sorted (hint-less SMJ would re-sort all E rows every half-sweep)
    val edges = spark.range(0, 20000).select(
      (col("id") % 997).as("src"), (col("id") % 613).as("dst"),
      lit(1.0).as("w"))
    val edst = edges.repartition(col("dst")).cache()
    edst.count()
    val movers = spark.range(0, 400).select(col("id").as("src"))
    val mdBase = spark.range(0, 997).select(
      col("id").as("dst"), (col("id") % 7).as("cdst"))
    val plan = graft.leiden.LocalMove.dstGather(edst, movers, mdBase, 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
    // exactly ONE join-induced shuffle (ENSURE_REQUIREMENTS): the O(V)
    // membership side. The cache-build REPARTITION_BY_COL exchange inside
    // the InMemoryRelation render doesn't count — it ran once at cache
    // time. If the E side needed an exchange it would be a second
    // ENSURE_REQUIREMENTS here.
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("ENSURE_REQUIREMENTS")) === 1,
      plan.take(1500))
    edst.unpersist()
  }

  test("leiden src-cache gather: candidate stream crosses ZERO exchanges from scan to argmax") {
    // the membership-broadcast sweep plan (V ≤ CtBroadcastMax tier): both
    // gather joins broadcast, so the scan keeps the main cache's src-hash
    // partitioning; groupBy(src,cdst) aggregates in place (src-hash
    // satisfies the clustering); the mover-constants side arrives
    // co-partitioned from the checkpointTruncated state (PlanUtils keeps
    // the materialized partitioning); the final argmax groups by the same
    // src partitioning. NO join- or agg-induced exchange anywhere.
    import org.apache.spark.sql.graft.PlanUtils
    val edges = spark.range(0, 20000).select(
      (col("id") % 997).as("src"), (col("id") % 613).as("dst"),
      lit(1.0).as("w")).repartition(col("src")).cache()
    edges.count()
    // explicit partition count: REPARTITION_BY_NUM is not AQE-coalescible,
    // so the pin tests the mechanism (checkpointTruncated carries the
    // partitioning) rather than AQE's small-data coalescing. In production
    // AQE may coalesce the tiny state and re-expand the O(V/2) mover side —
    // the candidate stream stays exchange-free either way.
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val state = PlanUtils.checkpointTruncated(
      spark.range(0, 997).repartition(shuffleParts, col("id"))
        .select(col("id"), (col("id") % 7).as("comm"), lit(1.0).as("vtot"),
          lit(true).as("aff")))
    val movers = state.filter(col("aff")).select(col("id").as("src"))
    val mdBase = state.select(col("id").as("dst"), col("comm").as("cdst"))
    val moverInfo = state.select(col("id").as("src"), col("comm").as("ccur"))
    val best = graft.leiden.LocalMove.srcGather(edges, movers, mdBase, 0)
      .groupBy("src", "cdst").agg(sum("w").as("wuc"))
      .join(moverInfo.hint("shuffle_hash"), "src")
      .groupBy("src").agg(max("wuc").as("best"))
    val plan = best.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange") && l.contains("ENSURE_REQUIREMENTS")) === 0,
      plan)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    edges.unpersist()
    PlanUtils.release(state)
  }

  test("d_minhash_pairs: the returned plan reads materialized jaccard (no shingle recompute above the filter)") {
    val plan = SparkEntry.queries("d_minhash_pairs")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("array_distinct") && !plan.contains("transform("), plan.take(800))
  }

  test("e_neardup scores each candidate pair exactly once (dedup before cosine)") {
    val df = SparkEntry.queries("e_neardup")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // the distinct (Aggregate on a,b) must sit BELOW the join that brings
    // vectors back, i.e. no 'cosine' computation above which a Distinct runs
    val distinctIdx = plan.indexOf("Aggregate [a")
    val cosineIdx = plan.indexOf("cosine")
    assert(distinctIdx >= 0, plan.take(800))
    assert(cosineIdx >= 0 && cosineIdx < distinctIdx,
      s"cosine must be computed above (before in plan text) the candidate distinct: cosine@$cosineIdx distinct@$distinctIdx")
  }
}
