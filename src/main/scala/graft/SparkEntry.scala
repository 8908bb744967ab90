package graft

import graft.algo.{Bfs, Components, LabelProp, PageRank, Triangles}
import graft.ann.Ann
import graft.graph.EdgeTable
import graft.leiden.{Aggregate, Leiden, LeidenOptions, LocalMove, Modularity, Refine}
import graft.multimodal.Multimodal
import graft.pages.{LinkExtract, Pages}
import graft.text.{NearDup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract (SURVEY.md §7): one query per implemented operator;
  * `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible query (validated side-by-side against DuckDB). Queries
  * without an oracle (iterative fixpoints, engine-specific hashes, floats
  * whose ordering is not reproducible across engines) get a rows-only
  * check; their correctness lives in the ScalaTest golden suites.
  *
  * All oracle-checked outputs are integers, strings, timestamps, or
  * exact-by-construction doubles (integer-valued sums, min/max) so the
  * driver's value-hash compare cannot be tripped by float summation order.
  */
object SparkEntry {

  private def li(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def docs(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String) = s.read.parquet(s"$dir/embeddings.parquet")
  private def ev(s: SparkSession, dir: String) = s.read.parquet(s"$dir/events.parquet")

  /** Bipartite supplier->part graph; +100000 keeps key spaces disjoint.
    *
    * Formulated as union-of-reverse + one distinct — row-identical to the
    * previous symmetrize(distinct(pairs)) shape for ANY input because every
    * weight is the constant 1.0: symmetrize keeps existing rows and adds
    * missing reverses at the same weight, which for a constant weight is
    * exactly distinct(E ∪ reverse(E)). This is also precisely the oracle
    * SQL's own `e AS (SELECT src,dst FROM e0 UNION SELECT dst,src FROM e0)`
    * formulation. Plan: ONE distinct exchange over the doubled pair set vs
    * the old distinct exchange + symmetrize anti-join (two more exchanges) —
    * shared by every bipartite query (g_degree, g_pagerank*, g_bfs, ...).
    */
  private def bipartite(s: SparkSession, dir: String): DataFrame = {
    val p = li(s, dir).select(col("l_suppkey").as("src"),
      (col("l_partkey") + 100000L).as("dst"))
    p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().select(col("src"), col("dst"), lit(1.0).as("w"))
  }

  /** Part co-purchase graph: parts sharing an order; w = co-order count.
    *
    * Formulated as ONE aggregation per order (collect_set ≡ the oracle's
    * DISTINCT (o,p)) followed by in-row ordered-pair generation from the
    * sorted part set (i < j ≡ the oracle's a.p < b.p over sorted parts) and
    * the pair-count aggregation. Row-identical to the previous
    * distinct+self-join+agg shape — same pairs, same counts — but the plan
    * is 2 exchanges (per-order sets with map-side partial aggregation, then
    * pair counts) instead of the self-join's 4, and the per-order part set
    * is bounded (≤ 7 lineitems/order in this schema), so the in-row pair
    * expansion is O(1) per row and skew-free at any scale. This one graph
    * feeds g_copurchase, g_triangles(_v), g_point_lookup, both leiden
    * queries, g_mod_terms and the stream fixtures — the self-join was paid
    * up to twice per query (once per union branch in copurchaseSym).
    */
  private def copurchasePairs(s: SparkSession, dir: String, sym: Boolean): DataFrame = {
    val perOrder = li(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(col("ps"))
    // ordered pairs (ps(i), ps(j)) for i < j (both orientations when sym),
    // expanded by the native codegen'd kernel (graft.catalyst
    // .OrderedPairsExpr — the HOF formulation was CodegenFallback; parity
    // pinned in NativeSpec against copurchasePairsReference's expression)
    perOrder
      .select(explode(org.apache.spark.sql.graft.NativeColumns
        .orderedPairs(col("ps"), sym)).as("pr"))
      .groupBy(col("pr.src").as("src"), col("pr.dst").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** The Column-HOF pair expansion, kept as the independently-derived
    * parity oracle for OrderedPairsExpr (NativeSpec; same device as
    * TextOps.shinglesReference).
    */
  private[graft] def orderedPairsReference(ps: org.apache.spark.sql.Column,
                                           sym: Boolean): org.apache.spark.sql.Column = {
    def pairOf(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(x.as("src"), y.as("dst"))
    flatten(transform(ps, (x, i) =>
      flatten(transform(
        slice(ps, i + lit(2), size(ps) - i - lit(1)),
        y => if (sym) array(pairOf(x, y), pairOf(y, x)) else array(pairOf(x, y))))))
  }

  private def copurchase(s: SparkSession, dir: String): DataFrame =
    copurchasePairs(s, dir, sym = false)

  private[graft] def copurchaseSym(s: SparkSession, dir: String): DataFrame =
    copurchasePairs(s, dir, sym = true)
      .select(col("src"), col("dst"), col("w").cast("double").as("w"))

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Bound on the MemoryStream feed fixtures of the two streaming queries:
    * the fixture is a driver-side collect by MemoryStream's construction,
    * so it must not scale with the sf directory. 200k edge rows ≈ a few MB.
    */
  private val streamFeedCap = 200000

  /** Flagship: Leiden communities of the sf0.001 part co-purchase graph. */
  def entry(spark: SparkSession): DataFrame = {
    val edges = copurchaseSym(spark, "/root/testdata/sf0.001")
    val r = Leiden.detect(edges, LeidenOptions(maxIterations = 5, maxPasses = 3))
    r.membership.groupBy("comm").agg(count(lit(1)).as("size"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational anchors -------------------------------------------
    "q1_agg" -> ((s, dir) =>
      li(s, dir).groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").cast("double").as("sum_qty"), count(lit(1)).as("n"))),
    "q3_seg_counts" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orders"))
    }),
    "q4_top_orders" -> ((s, dir) => { // ranking window (§2.5 top-k)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
    }),
    "q5_region_revenue" -> ((s, dir) => { // 6-way star join: the generic
      // OLAP surface at 100 TB — lineitem/orders are the shuffled facts,
      // every dimension (customer, supplier, nation, region) broadcasts.
      // Revenue is computed in EXACT integer e4 units (prices carry 2
      // decimals, discounts 2): BIGINT sums are order-independent in both
      // engines, so the oracle hash never hits float summation noise.
      val cents = (c: org.apache.spark.sql.Column) => round(c * 100).cast("long")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("rev_e4"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = s.read.parquet(s"$dir/nation.parquet")
      val reg = s.read.parquet(s"$dir/region.parquet").filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum("rev_e4").cast("long").as("revenue_e4"),
          count(lit(1)).as("n_rows"))
    }),
    // --- graph: scans/degrees/weights (S2, P2, A1, A2) ----------------
    "g_degree" -> ((s, dir) => EdgeTable.degrees(bipartite(s, dir))),
    "g_total_weight" -> ((s, dir) =>
      bipartite(s, dir).agg(sum("w").as("total_w"))),
    "g_copurchase" -> ((s, dir) => copurchase(s, dir)),
    // --- graph algorithms ---------------------------------------------
    "g_triangles" -> ((s, dir) => {
      // copurchasePairs(sym=true) is the SAME row set the old
      // copurchase+union-reverse produced (strict i<j pairs plus their
      // reverses — no self-loops, no duplicates), in one aggregation; the
      // simpleInput contract then lets the kernel feed skip its defensive
      // distinct exchange.
      val sym = copurchasePairs(s, dir, sym = true)
        .select(col("src"), col("dst"), lit(1.0).as("w"))
      s.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](
          org.apache.spark.sql.Row(Triangles.globalCount(sym, simpleInput = true))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("triangles",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }),
    "g_triangles_v" -> ((s, dir) => { // oracle: per-vertex triangle counts
      val sym = copurchasePairs(s, dir, sym = true)
        .select(col("src"), col("dst"), lit(1.0).as("w"))
      Triangles.perVertex(sym).select(col("id"), col("triangles"))
    }),
    "g_mod_terms" -> ((s, dir) => {
      val part = s.read.parquet(s"$dir/part.parquet")
      val memb = part.select(col("p_partkey").as("id"), col("p_brand").as("comm"))
      Modularity.communityTerms(copurchaseSym(s, dir), memb)
    }),
    "g_components" -> ((s, dir) => { // oracle: DuckDB recursive-CTE closure
      val e = bipartite(s, dir)
      Components.componentSizes(Components.connectedComponents(e, EdgeTable.vertices(e)))
    }),
    "g_pagerank" -> ((s, dir) => // rows-only: float fixpoint
      PageRank.run(bipartite(s, dir))), // default tol 1e-6 = BASELINE target
    "g_pagerank_dist" -> ((s, dir) => // rows-only twin of g_pagerank PINNED
      // to the distributed plan (localEdgeThreshold = 0): sf0.1's bipartite
      // graph now routes through the driver-local tail under the default
      // threshold, so this row keeps the 100-TB iteration path itself
      // measured by Bench (and its PageRankSpec parity test pins the two
      // paths to identical ranks).
      PageRank.run(bipartite(s, dir), localEdgeThreshold = 0)),
    "g_pagerank_k5" -> ((s, dir) => // oracle: 5 FIXED power iterations; integer
      // nano-ranks (floor(r*1e9+0.5), same rule in the SQL). Cross-engine
      // summation-order noise is ~1e-16 relative (~1e-19 absolute on these
      // ranks), ~1e10x smaller than the 1e-9 grid, so rounding cannot flip.
      // The convergence-driven production path stays g_pagerank (rows-only
      // + the 1e-6 sequential-oracle ScalaTest).
      PageRank.run(bipartite(s, dir), tol = 0.0, maxIters = 5)
        .select(col("id"),
          floor(col("rank") * lit(1e9) + lit(0.5)).cast("long").as("rank_e9"))),
    "g_bfs" -> ((s, dir) => { // oracle: DuckDB recursive-CTE hop distances.
      // maxDepth = 40 is COUPLED to the oracle's `WHERE r.dist < 40`
      // recursion cap (both sides emit distances up to exactly 40): a
      // fixture with eccentricity > 40 from the min-src vertex truncates
      // identically in both engines instead of silently diverging.
      val e = bipartite(s, dir)
      val src = e.agg(min("src").cast("long")).head.getLong(0)
      Bfs.run(e, s.range(1).select(lit(src).as("id")), maxDepth = 40)
        .select(col("id"), col("dist").cast("long").as("dist"))
    }),
    "g_point_lookup" -> ((s, dir) => { // oracle: one-vertex neighborhood (P3)
      val e = copurchase(s, dir)
      val v = e.agg(min("src").cast("long")).head.getLong(0)
      EdgeTable.neighborsOf(e, v)
    }),
    "g_batch_update" -> ((s, dir) => { // oracle: SO1-SO3 dynamic batch —
      // symmetric delete (incl. nonexistent rows the tidy pass must drop)
      // then symmetric insert (incl. edges colliding with survivors and
      // re-inserts of just-deleted pairs), degrees of the next snapshot
      val e = bipartite(s, dir)
      val del = e.filter(col("dst") % 3 === 0).select("src", "dst")
        .unionByName(e.filter(col("dst") % 5 === 0)
          .select(col("src"), (col("dst") + 777777L).as("dst")))
      val ins = li(s, dir).filter(col("l_partkey") % 4 === 0)
        .select(col("l_suppkey").as("src"), (col("l_partkey") + 100000L).as("dst"))
        .unionByName(li(s, dir).filter(col("l_suppkey") % 50 === 0)
          .select(col("l_suppkey").as("src"), (col("l_partkey") + 300000L).as("dst")))
        .distinct().withColumn("w", lit(2.0))
      EdgeTable.degrees(graft.graph.Batch(e, ins, del, symmetric = true))
    }),
    "g_lpa" -> ((s, dir) => // rows-only: iterative fixpoint
      LabelProp.run(copurchaseSym(s, dir)).groupBy("label").agg(count(lit(1)).as("size"))),
    "g_lpa_k2" -> ((s, dir) => // oracle: 2 FIXED rounds of the label-update
      // rule under a plain (src + round) % 2 phase schedule the SQL can
      // replicate (the production schedule stays murmur3 — same twin
      // device as the md5 pipelines). Weights are co-order counts, so
      // every lw sum is exact and every compare (strictly-beaten /
      // tie-to-smaller stability rule) is integer-exact: no float
      // decisions anywhere in this query.
      LabelProp.run(copurchaseSym(s, dir), maxRounds = 2,
          phase = (src, r) => pmod(src + lit(r), lit(2)))
        .select(col("id").cast("long").as("id"), col("label").cast("long").as("label"))),
    "g_leiden" -> ((s, dir) => { // rows-only: flagship algorithm
      val r = Leiden.detect(copurchaseSym(s, dir), // churn stop opted in (library default 0 = reference semantics)
        LeidenOptions(maxIterations = 8, maxPasses = 4, minMovedFraction = 1e-3))
      r.membership.groupBy("comm").agg(count(lit(1)).as("size"))
    }),
    "g_leiden_lowmem" -> ((s, dir) => { // rows-only: MG-sketch variant
      val r = Leiden.detect(copurchaseSym(s, dir),
        LeidenOptions(maxIterations = 8, maxPasses = 4, sketchSlots = 64, minMovedFraction = 1e-3))
      r.membership.groupBy("comm").agg(count(lit(1)).as("size"))
    }),
    "g_leiden_sweep" -> ((s, dir) => { // oracle: ONE synchronous local-move
      // half-sweep (parity 0) from comm = id % 64 blocks — cross-engine
      // checks the flagship delta-Q argmax rule itself (J1 gather, A4 scan,
      // A9 totals, wud term, swap guard, positive-gain gate). All inputs
      // are integer-valued doubles, so m/vtot/ctot/wuc are EXACT in both
      // engines and the identical expression tree makes scores bit-equal;
      // measured sf0.01 decision margins dwarf any residual noise anyway:
      // min |mdq| 1.6e-7, min argmax top-2 gap 3.8e-9, exact ties 0
      // (ties would break deterministically by smallest community id).
      val e = copurchaseSym(s, dir)
      val m = EdgeTable.totalWeight(e) / 2
      val st0 = EdgeTable.vertexWeights(e)
        .select(col("id"), pmod(col("id"), lit(64)).as("comm"), col("vtot"),
          lit(true).as("aff"))
      val moved = LocalMove.sweep(e, st0, m, 1.0, parity = 0).state
        .join(st0.select(col("id"), col("comm").as("c0")), "id")
        .filter(col("comm") =!= col("c0"))
        .select(col("id").cast("long").as("id"), col("comm").cast("long").as("newcomm"))
      moved
    }),
    "g_leiden_agg" -> ((s, dir) => { // oracle: exact coarsening (A10/A11
      // exact path, leiden.hxx:591-645) + dense renumber (A12) from a
      // deliberately SPARSE membership comm = (id % 97)*1000 + 7, so the
      // renumber window genuinely remaps ids (dense 0..96) before the
      // two-membership-join + hash-agg coarsen. Super-edge weights are
      // sums of integer-valued co-order counts — exact in both engines;
      // no float decisions anywhere.
      val e = copurchaseSym(s, dir)
      val mem = e.select(col("src").as("id")).distinct()
        .select(col("id"), (pmod(col("id"), lit(97)) * 1000 + 7).as("comm"))
      Aggregate.coarsen(e, Aggregate.renumber(mem))
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
    }),
    "g_leiden_refine_sweep" -> ((s, dir) => { // oracle: ONE half-sweep of
      // the PRODUCTION refinement rule — LocalMove.sweep with a bound and
      // refineSingletons, exactly as Leiden.detect's phase 2 invokes it
      // (bound = id % 64, singleton init). From singletons the rule
      // degenerates cleanly for SQL: movers are even singletons, scan is
      // same-bound neighbors, the both-singleton swap guard leaves only
      // smaller-id targets, wud = 0 and ctot_d = vtot_u. Integer-valued
      // inputs + identical expression tree keep scores bit-equal; measured
      // sf0.01 margins: min |score| 7.2e-6, the 2 exact top-2 ties break
      // identically in both engines (smallest community id on bit-equal
      // scores).
      val e = copurchaseSym(s, dir)
      val m = EdgeTable.totalWeight(e) / 2
      val st0 = EdgeTable.vertexWeights(e)
        .select(col("id"), col("id").as("comm"), col("vtot"), lit(true).as("aff"))
      val bound = st0.select(col("id"), pmod(col("id"), lit(64)).as("bound"))
      LocalMove.sweep(e, st0, m, 1.0, parity = 0, bound = Some(bound),
          refineSingletons = true).state
        .filter(col("comm") =!= col("id"))
        .select(col("id").cast("long").as("id"), col("comm").cast("long").as("newcomm"))
    }),
    "g_leiden_refine" -> ((s, dir) => { // oracle: the refinement phase —
      // refined sub-communities are the connected components of each
      // community's induced subgraph, labeled by min member vertex id
      // (Refine.scala's distributed formulation of leiden.hxx:734-743).
      // From comm = id % 64 blocks; pure integer set computation, no
      // float decisions — DuckDB replays it as recursive reachability
      // (each community subgraph is tiny, so pair blowup is bounded).
      val e = copurchaseSym(s, dir)
      val mem = e.select(col("src").as("id")).distinct()
        .select(col("id"), pmod(col("id"), lit(64)).as("comm"))
      Refine.refine(e, mem).select(col("id").cast("long").as("id"),
        col("comm").cast("long").as("comm"), col("bound").cast("long").as("bound"))
    }),
    "g_disconnected" -> ((s, dir) => { // oracle: the A16/A17 disconnected-
      // communities check (the reference logs it per run — main.cxx:58,
      // properties.hxx:379-401) over a FIXED membership comm = id % 64:
      // per community, the number of connected components of its induced
      // subgraph via Refine's formulation; a community is disconnected iff
      // parts > 1. Pure integer set computation, no float decisions — the
      // same engine path Leiden.disconnectedCommunities aggregates to its
      // scalar count (the count is sum(parts > 1) over this output).
      val e = copurchaseSym(s, dir)
      val mem = e.select(col("src").as("id")).distinct()
        .select(col("id"), pmod(col("id"), lit(64)).as("comm"))
      Refine.refine(e, mem)
        .groupBy(col("bound").cast("long").as("bound"))
        .agg(countDistinct("comm").as("parts"))
    }),
    "s7_log_etl" -> ((s, dir) => { // oracle: S7 log→CSV ETL (process.js:8
      // analog). Fixture lines are built BYTE-EXACTLY in the reference's
      // printf format from integer string ops keyed by o_orderkey (both
      // engines concat the same strings — no float formatting anywhere),
      // then the 15-group RRESLT regex extracts every record field back.
      val lines = s.read.parquet(s"$dir/orders.parquet")
        .filter(pmod(col("o_orderkey"), lit(13)) === 1)
        .select(col("o_orderkey").cast("long").as("line_id"),
          graft.io.LogEtl.refLogLine(col("o_orderkey").cast("long")).as("line"))
      graft.io.LogEtl.parse(lines)
    }),
    // --- text analysis -------------------------------------------------
    "d_token_stats" -> ((s, dir) =>
      TextOps.quality(docs(s, dir)).select(
        col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_stopwords").cast("long").as("n_stopwords"),
        col("avg_token_len_x100").cast("long").as("avg_token_len_x100"))),
    "d_exact_dup" -> ((s, dir) =>
      TextOps.exactDupGroups(docs(s, dir)).select(col("h"), col("keeper"), col("n"))),
    "d_lang_scores" -> ((s, dir) => {
      val t = TextOps.tokens(lower(col("text")))
      def hits(ms: Seq[String]) = size(filter(t, x => x.isin(ms.map(lit(_)): _*))).cast("long")
      val de = hits(Seq("der", "die", "und", "nicht", "das"))
      val en = hits(Seq("the", "and", "of", "is", "that"))
      val es = hits(Seq("el", "la", "que", "los", "una"))
      val fr = hits(Seq("le", "la", "les", "est", "une"))
      val zh = hits(Seq("的", "是", "了", "在", "我"))
      docs(s, dir).select(col("doc_id"),
        de.as("de_hits"), en.as("en_hits"), es.as("es_hits"),
        fr.as("fr_hits"), zh.as("zh_hits"),
        when(zh > 0 && zh >= fr && zh >= es && zh >= en && zh >= de, "zh")
          .when(fr > 0 && fr >= es && fr >= en && fr >= de, "fr")
          .when(es > 0 && es >= en && es >= de, "es")
          .when(en > 0 && en >= de, "en")
          .when(de > 0, "de")
          .otherwise("und").as("pred"))
    }),
    "d_ngram_overlap" -> ((s, dir) =>
      TextOps.ngramOverlap(docs(s, dir), 3)
        .select(col("a"), col("b"), col("inter"), col("union").as("u"))),
    "d_fingerprint" -> ((s, dir) => // oracle: md5-derived rolling hash
      docs(s, dir).select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),
    "d_subwords" -> ((s, dir) => // oracle: BPE-ish regex subword count
      docs(s, dir).select(col("doc_id"),
        TextOps.subwordCount(col("text")).cast("long").as("n_subwords"))),
    "d_minhash_pairs" -> ((s, dir) => // rows-only: engine-specific hash
      NearDup.minHashLshPairs(docs(s, dir), threshold = 0.2)),
    "d_minhash_pairs_md5" -> ((s, dir) => // oracle: full LSH pipeline, md5-derived
      NearDup.minHashLshPairsMd5(docs(s, dir))),
    "d_simhash_pairs" -> ((s, dir) => // rows-only: engine-specific hash
      NearDup.simHashPairs(docs(s, dir), maxHamming = 3)),
    "d_simhash_pairs_md5" -> ((s, dir) => // oracle: full SimHash pipeline, md5-derived
      NearDup.simHashPairsMd5(docs(s, dir))),
    // --- embeddings / similarity search --------------------------------
    "e_ann_topk" -> ((s, dir) => { // oracle: rank-only output — ranks are
      // integer-exact across engines because both sides score in double and
      // the sf0.01 top-7 adjacent-cosine margins (min 1.9e-5, measured)
      // dwarf any cross-engine rounding; ties break by id on both sides
      val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.bruteForceTopK(queries, corpus, 5)
        .select(col("qid"), col("id"), col("rank").cast("long").as("rank"))
    }),
    "e_ann_lsh" -> ((s, dir) => { // rows-only: approximate
      val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.lshTopK(queries, corpus, 5).drop("cosine")
    }),
    "e_ann_ivf" -> ((s, dir) => { // rows-only: approximate
      val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.ivfTopK(queries, corpus, 5).drop("cosine")
    }),
    "e_ann_lsh_md5" -> ((s, dir) => { // oracle: full LSH top-k pipeline,
      // md5-derived planes, rank-only output (margins in Ann scaladoc)
      val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.lshTopKMd5(queries, corpus, 5)
    }),
    "e_ann_ivf_md5" -> ((s, dir) => { // oracle: full IVF nprobe pipeline,
      // md5-chosen centroids, rank-only output (margins in Ann scaladoc)
      val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.ivfTopKMd5(queries, corpus, 5)
    }),
    "e_neardup" -> ((s, dir) => // rows-only: engine-specific hash planes
      Ann.cosineNearDupPairs(emb(s, dir), 0.4)),
    "e_neardup_md5" -> ((s, dir) => // oracle: full LSH-blocked embedding
      // dedup pipeline, md5-derived planes (margins in Ann scaladoc)
      Ann.cosineNearDupPairsMd5(emb(s, dir))),
    // --- events ---------------------------------------------------------
    "ev_window" -> ((s, dir) =>
      ev(s, dir).groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), min("value").as("vmin"), max("value").as("vmax"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("vmin"), col("vmax"))),
    "ev_user_events" -> ((s, dir) =>
      ev(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n"), countDistinct("event_type").as("n_types"))),
    "ev_sessions" -> ((s, dir) => // batch gap-sessionization (window fns)
      graft.streaming.EventStreams.sessionizeBatch(ev(s, dir))),
    "g_edge_stream" -> ((s, dir) => { // streaming graph maintenance (oracle)
      // The copurchase edges streamed as three deterministic micro-batches
      // (inserts split by (src+dst)%2, then deletions of (src*31+dst)%10==0)
      // through GraphStream.maintain — a real Structured Streaming query
      // folding each batch into a new snapshot. The driver-side collect
      // below is the STREAM FEED FIXTURE (MemoryStream takes local data by
      // construction); the maintenance itself is distributed. The feed is
      // BOUNDED sf-independently at the first 200k edges by (src, dst) —
      // a deterministic total order the oracle SQL replicates — so the
      // fixture collect stays a few MB at any scale factor (at sf<=0.01
      // the cap is above the edge count and a no-op). Output: symmetric
      // degrees of the final maintained edge table.
      import graft.streaming.GraphStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = copurchase(s, dir)
        .orderBy("src", "dst").limit(streamFeedCap)
        .select(col("src"), col("dst"), col("w").cast("double").as("w"),
          ((col("src") + col("dst")) % 2 === 0).as("even"),
          ((col("src") * 31 + col("dst")) % 10 === 0).as("del"))
        .collect()
      def ins(even: Boolean) = rows.filter(_.getBoolean(3) == even)
        .map(r => GraphStream.EdgeOp("I", r.getLong(0), r.getLong(1), r.getDouble(2), 0L)).toSeq
      val dels = rows.filter(_.getBoolean(4))
        .map(r => GraphStream.EdgeOp("D", r.getLong(0), r.getLong(1), 0.0, 0L)).toSeq
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[GraphStream.EdgeOp]
      val root = java.nio.file.Files.createTempDirectory("g_edge_stream").toString
      val q = GraphStream.maintain(ms.toDS(), root, "copurchase")
      try {
        Seq(ins(true), ins(false), dels).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      val fin = GraphStream.current(s, root, "copurchase").get._2
      val sym = fin.unionByName(
        fin.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      sym.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"), sum("w").cast("long").as("wdeg"))
    }),
    "g_stream_communities" -> ((s, dir) => { // rows-only: iterative fixpoint
      // Streaming DYNAMIC community detection: the copurchase graph arrives
      // as two micro-batches; batch 1 re-clusters incrementally, seeded by
      // batch 0's membership with only the new endpoints marked affected.
      // Output: community size histogram of the final maintained state.
      // Correctness pins live in GraphStreamSpec (incremental == from-scratch
      // parity) and the LeidenSpec golden suites. Feed bounded at
      // streamFeedCap edges (same sf-independent device as g_edge_stream).
      import graft.streaming.GraphStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = copurchase(s, dir)
        .orderBy("src", "dst").limit(streamFeedCap)
        .select(col("src"), col("dst"), col("w").cast("double").as("w"),
          ((col("src") + col("dst")) % 2 === 0).as("even"))
        .collect()
      def ins(even: Boolean) = rows.filter(_.getBoolean(3) == even)
        .map(r => GraphStream.EdgeOp("I", r.getLong(0), r.getLong(1), r.getDouble(2), 0L)).toSeq
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[GraphStream.EdgeOp]
      val root = java.nio.file.Files.createTempDirectory("g_stream_comm").toString
      val q = GraphStream.maintainCommunities(ms.toDS(), root, "copurchase",
        LeidenOptions(maxIterations = 8, maxPasses = 3, minMovedFraction = 1e-3))
      try {
        Seq(ins(true), ins(false)).foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      graft.io.Snapshots.read(s, root, "copurchase", 1, GraphStream.MembershipState)
        .groupBy("comm").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_comms"))
    }),
    // --- pages / link extraction / multimodal (synthetic fixtures) ------
    "p_text_digest" -> ((s, dir) => // rows-only: byte-identical invariant
      LinkExtract.textDigests(Pages.synthetic(s, 500))),
    "p_link_edges" -> ((s, dir) => { // rows-only
      val (e, _) = LinkExtract.edges(Pages.synthetic(s, 500))
      EdgeTable.degrees(EdgeTable.symmetrize(e))
    }),
    "mm_image_meta" -> ((s, dir) => // rows-only: real BMP/PPM pixel decode
      Multimodal.decodeImageMeta(Multimodal.syntheticMedia(s, 300)).toDF()),
    "mm_audio_meta" -> ((s, dir) => // rows-only: real WAV PCM chunk walk
      Multimodal.decodeAudioMeta(Multimodal.syntheticMedia(s, 300)).toDF()),
    "mm_video_frames" -> ((s, dir) => // rows-only: real Y4M frame sampling
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, 300), 300).toDF()),
    // --- *_sql twins: the SAME real decoders/extractors over the
    // closed-form fixtures (Multimodal.syntheticMediaSql, Pages.syntheticSql),
    // whose parameters ANSI SQL recomputes without decoding — this puts the
    // decode/extract outputs under the cross-engine oracle hash, same
    // device as d_minhash_pairs_md5. bytes_len is dropped from the image
    // twin (PNG/GIF compressed sizes are codec detail, not formula).
    "mm_image_meta_sql" -> ((s, dir) =>
      Multimodal.decodeImageMeta(Multimodal.syntheticMediaSql(s, 300)).toDF()
        .select("media_id", "format", "width", "height", "channels", "px_sum")),
    "mm_audio_meta_sql" -> ((s, dir) =>
      Multimodal.decodeAudioMeta(Multimodal.syntheticMediaSql(s, 300)).toDF()),
    "mm_video_frames_sql" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.syntheticMediaSql(s, 300), 300).toDF()),
    "p_text_digest_sql" -> ((s, dir) =>
      LinkExtract.textDigests(Pages.syntheticSql(s, 500))),
    "p_link_edges_sql" -> ((s, dir) => {
      val (e, _) = LinkExtract.edges(Pages.syntheticSql(s, 500))
      EdgeTable.degrees(EdgeTable.symmetrize(e))
    }))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_seg_counts" ->
      """SELECT c_mktsegment, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""".stripMargin,
    "q4_top_orders" ->
      """SELECT c_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey AS c_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t WHERE rnk <= 3""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n.n_name AS nation,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |       count(*) AS n_rows
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "g_components" ->
      """WITH RECURSIVE e0 AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |verts AS (SELECT DISTINCT src AS id FROM e),
        |r AS (SELECT id, id AS reach FROM verts
        |      UNION
        |      SELECT r.id, e.dst AS reach FROM r JOIN e ON r.reach = e.src)
        |SELECT comp, count(*) AS size
        |FROM (SELECT id, min(reach) AS comp FROM r GROUP BY id) t GROUP BY comp""".stripMargin,
    "g_triangles_v" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS x, b.p AS y FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c FROM und e1
        |        JOIN und e2 ON e1.y = e2.x JOIN und e3 ON e3.x = e1.x AND e3.y = e2.y),
        |verts AS (SELECT x AS id FROM und UNION SELECT y FROM und),
        |corners AS (SELECT id, count(*) AS t FROM
        |  (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) u
        |  GROUP BY id)
        |SELECT v.id, CAST(coalesce(c.t, 0) AS BIGINT) AS triangles
        |FROM verts v LEFT JOIN corners c ON v.id = c.id""".stripMargin,
    "g_pagerank_k5" ->
      """WITH RECURSIVE e0 AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |ow AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outw FROM e GROUP BY src),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ow),
        |r AS (
        |  SELECT 0 AS it, id, 1.0 / n AS rank FROM ow, nn
        |  UNION ALL
        |  SELECT r0.it + 1, r0.id,
        |    (1 - CAST(0.85 AS DOUBLE)) / nn.n + CAST(0.85 AS DOUBLE) * coalesce(g.gath, CAST(0 AS DOUBLE))
        |  FROM r r0 CROSS JOIN nn
        |  LEFT JOIN (SELECT e.dst AS id, sum(r1.rank / ow.outw) AS gath
        |             FROM r r1 JOIN ow ON r1.id = ow.id JOIN e ON e.src = r1.id
        |             GROUP BY e.dst) g ON g.id = r0.id
        |  WHERE r0.it < 5)
        |SELECT id, CAST(floor(rank * 1000000000 + 0.5) AS BIGINT) AS rank_e9
        |FROM r WHERE it = 5""".stripMargin,
    "g_bfs" ->
      """WITH RECURSIVE e0 AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |src0 AS (SELECT min(src) AS s FROM e),
        |r AS (SELECT s AS id, 0 AS dist FROM src0
        |      UNION
        |      SELECT e.dst AS id, r.dist + 1 AS dist FROM r JOIN e ON r.id = e.src WHERE r.dist < 40)
        |SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM r GROUP BY id""".stripMargin,
    "g_point_lookup" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (SELECT a.p AS src, b.p AS dst, count(*) AS w
        |          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p)
        |SELECT dst, w FROM pairs WHERE src = (SELECT min(src) FROM pairs)""".stripMargin,
    "g_batch_update" ->
      """WITH e0 AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |del0 AS (SELECT src, dst FROM e WHERE dst % 3 = 0
        |         UNION ALL SELECT src, dst + 777777 FROM e WHERE dst % 5 = 0),
        |delm AS (SELECT src, dst FROM del0 UNION SELECT dst, src FROM del0),
        |tdel AS (SELECT d.src, d.dst FROM delm d
        |         WHERE EXISTS (SELECT 1 FROM e WHERE e.src = d.src AND e.dst = d.dst)),
        |afterdel AS (SELECT src, dst FROM e
        |             WHERE NOT EXISTS (SELECT 1 FROM tdel t WHERE t.src = e.src AND t.dst = e.dst)),
        |ins0 AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem WHERE l_partkey % 4 = 0
        |         UNION SELECT DISTINCT l_suppkey, l_partkey + 300000 FROM lineitem WHERE l_suppkey % 50 = 0),
        |insm AS (SELECT src, dst FROM ins0 UNION SELECT dst, src FROM ins0),
        |tins AS (SELECT i.src, i.dst FROM insm i
        |         WHERE NOT EXISTS (SELECT 1 FROM afterdel a WHERE a.src = i.src AND a.dst = i.dst)),
        |final AS (SELECT src, dst FROM afterdel UNION ALL SELECT src, dst FROM tins)
        |SELECT src AS id, count(*) AS degree FROM final GROUP BY src""".stripMargin,
    "g_lpa_k2" -> {
      // 2 rounds x 2 parities = 4 unrolled half-sweeps of the same
      // update rule LabelProp.run executes (argmax by (lw desc, label
      // asc), stability: move only if strictly beaten or tied toward a
      // smaller label, missing current-label weight = 0)
      def half(k: Int, rnd: Int, par: Int): String =
        s"""lw$k AS (SELECT ed.src, l.label, sum(ed.w) AS lw
           |        FROM e ed JOIN l$k l ON ed.dst = l.id
           |        WHERE (ed.src + $rnd) % 2 = $par GROUP BY 1, 2),
           |best$k AS (SELECT src, label AS nl, lw AS nw FROM
           |          (SELECT *, row_number() OVER (PARTITION BY src ORDER BY lw DESC, label ASC) AS rn
           |           FROM lw$k) t WHERE rn = 1),
           |cur$k AS (SELECT w.src, w.lw AS cw FROM lw$k w JOIN l$k l ON w.src = l.id AND w.label = l.label),
           |l${k + 1} AS (SELECT l.id,
           |           CASE WHEN b.nl IS NOT NULL AND (b.nw > coalesce(c.cw, 0)
           |                  OR (b.nw = coalesce(c.cw, 0) AND b.nl < l.label))
           |                THEN b.nl ELSE l.label END AS label
           |         FROM l$k l LEFT JOIN best$k b ON l.id = b.src LEFT JOIN cur$k c ON l.id = c.src)""".stripMargin
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |cp AS (SELECT a.p AS src, b.p AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM cp UNION ALL SELECT dst, src, w FROM cp),
        |l0 AS (SELECT DISTINCT src AS id, src AS label FROM e),
        |""".stripMargin +
        Seq((0, 0), (0, 1), (1, 0), (1, 1)).zipWithIndex
          .map { case ((rnd, par), k) => half(k, rnd, par) }.mkString(",\n") +
        "\nSELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label FROM l4"
    },
    "g_leiden_agg" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |cp AS (SELECT a.p AS src, b.p AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM cp UNION ALL SELECT dst, src, w FROM cp),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |mem AS (SELECT id, (id % 97) * 1000 + 7 AS comm FROM v),
        |dn AS (SELECT comm, dense_rank() OVER (ORDER BY comm) - 1 AS dense
        |       FROM (SELECT DISTINCT comm FROM mem)),
        |m2 AS (SELECT mem.id, dn.dense AS comm FROM mem JOIN dn ON mem.comm = dn.comm),
        |agg AS (SELECT ms.comm AS src, md.comm AS dst, sum(ed.w) AS w
        |        FROM e ed JOIN m2 ms ON ed.src = ms.id JOIN m2 md ON ed.dst = md.id
        |        GROUP BY 1, 2)
        |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
        |       CAST(w AS DOUBLE) AS w FROM agg""".stripMargin,
    "g_leiden_refine_sweep" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |cp AS (SELECT a.p AS src, b.p AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM cp UNION ALL SELECT dst, src, w FROM cp),
        |vt AS (SELECT src AS id, sum(w) AS vtot FROM e GROUP BY 1),
        |mm AS (SELECT sum(w) / 2 AS m FROM e),
        |cand AS (SELECT ed.src, ed.dst AS cdst, sum(ed.w) AS wuc
        |         FROM e ed
        |         WHERE ed.src % 2 = 0 AND ed.src <> ed.dst
        |           AND ed.src % 64 = ed.dst % 64 AND ed.dst < ed.src
        |         GROUP BY 1, 2),
        |scored AS (SELECT c.src, c.cdst,
        |                  c.wuc / mm.m - (vu.vtot * vd.vtot) / (2 * mm.m * mm.m) AS score
        |           FROM cand c JOIN vt vu ON c.src = vu.id JOIN vt vd ON c.cdst = vd.id, mm),
        |pick AS (SELECT src, cdst, score,
        |                row_number() OVER (PARTITION BY src ORDER BY score DESC, cdst ASC) AS rn
        |         FROM scored)
        |SELECT CAST(src AS BIGINT) AS id, CAST(cdst AS BIGINT) AS newcomm
        |FROM pick WHERE rn = 1 AND score > 0""".stripMargin,
    "g_leiden_refine" ->
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |cp AS (SELECT a.p AS src, b.p AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM cp UNION ALL SELECT dst, src, w FROM cp),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |mem AS (SELECT id, id % 64 AS comm FROM v),
        |intra AS (SELECT ed.src, ed.dst FROM e ed
        |          JOIN mem a ON ed.src = a.id JOIN mem b ON ed.dst = b.id
        |          WHERE a.comm = b.comm AND ed.src <> ed.dst),
        |reach AS (SELECT id AS root, id AS node FROM v
        |          UNION
        |          SELECT r.root, i.dst FROM reach r JOIN intra i ON r.node = i.src),
        |comp AS (SELECT root AS id, min(node) AS comp FROM reach GROUP BY root)
        |SELECT CAST(c.id AS BIGINT) AS id, CAST(c.comp AS BIGINT) AS comm,
        |       CAST(m.comm AS BIGINT) AS bound
        |FROM comp c JOIN mem m ON c.id = m.id""".stripMargin,
    "g_disconnected" ->
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |cp AS (SELECT a.p AS src, b.p AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM cp UNION ALL SELECT dst, src, w FROM cp),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |mem AS (SELECT id, id % 64 AS comm FROM v),
        |intra AS (SELECT ed.src, ed.dst FROM e ed
        |          JOIN mem a ON ed.src = a.id JOIN mem b ON ed.dst = b.id
        |          WHERE a.comm = b.comm AND ed.src <> ed.dst),
        |reach AS (SELECT id AS root, id AS node FROM v
        |          UNION
        |          SELECT r.root, i.dst FROM reach r JOIN intra i ON r.node = i.src),
        |comp AS (SELECT root AS id, min(node) AS comp FROM reach GROUP BY root)
        |SELECT CAST(m.comm AS BIGINT) AS bound, count(DISTINCT c.comp) AS parts
        |FROM comp c JOIN mem m ON c.id = m.id GROUP BY 1""".stripMargin,
    "s7_log_etl" -> {
      // fixture generation: the same integer-keyed string build as
      // LogEtl.refLogLine; extraction: the RRESLT regex split in two
      // (DuckDB's RE2 binding caps at 10 capture groups per pattern)
      def ms(mult: Int, off: Int) =
        s"lpad(CAST(((k*$mult+$off) % 100000000) // 10 AS VARCHAR), 7, '0') || '.' || " +
        s"CAST(((k*$mult+$off) % 100000000) % 10 AS VARCHAR)"
      val head = "'^\\{(.+?)ms, (.+?)ms mark, (.+?)ms init, (.+?)ms firstpass, " +
        "(.+?)ms locmove, (.+?)ms refine, (.+?)ms aggr, (.+?)GB memory, '"
      val tail = "'GB memory, (.+?) slots, (.+?) iters, (.+?) passes, " +
        "(.+?) modularity, (.+?)/(.+?) disconnected\\} (.+)$'"
      s"""WITH k AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 13 = 1),
        |lines AS (SELECT k AS line_id,
        |  '{' || ${ms(7, 0)} || 'ms, ' || ${ms(3, 1)} || 'ms mark, ' ||
        |  ${ms(5, 2)} || 'ms init, ' || ${ms(11, 3)} || 'ms firstpass, ' ||
        |  ${ms(13, 4)} || 'ms locmove, ' || ${ms(17, 5)} || 'ms refine, ' ||
        |  ${ms(19, 6)} || 'ms aggr, ' ||
        |  lpad(CAST(((k*23+7) % 100000000) // 10000 AS VARCHAR), 4, '0') || '.' ||
        |  lpad(CAST((k*23+7) % 10000 AS VARCHAR), 4, '0') || 'GB memory, ' ||
        |  CASE k % 3 WHEN 0 THEN '0.000e+00' WHEN 1 THEN '6.400e+01' ELSE '1.000e+00' END ||
        |  ' slots, ' || lpad(CAST(k % 500 AS VARCHAR), 4, '0') || ' iters, ' ||
        |  lpad(CAST(k % 10 AS VARCHAR), 3, '0') || ' passes, 0.' ||
        |  lpad(CAST(k % 1000000000 AS VARCHAR), 9, '0') || ' modularity, ' ||
        |  CAST(k % 7 AS VARCHAR) || '/' || CAST(k % 1000 + 1 AS VARCHAR) ||
        |  ' disconnected} ' ||
        |  CASE k % 2 WHEN 0 THEN 'leidenStaticOmp' ELSE 'leidenLowmemStaticOmpMajorities' END
        |  AS line FROM k)
        |SELECT line_id,
        |  regexp_extract(line, $head, 1) AS total_ms,
        |  regexp_extract(line, $head, 2) AS mark_ms,
        |  regexp_extract(line, $head, 3) AS init_ms,
        |  regexp_extract(line, $head, 4) AS firstpass_ms,
        |  regexp_extract(line, $head, 5) AS locmove_ms,
        |  regexp_extract(line, $head, 6) AS refine_ms,
        |  regexp_extract(line, $head, 7) AS aggr_ms,
        |  regexp_extract(line, $head, 8) AS memory_gb,
        |  regexp_extract(line, $tail, 1) AS slots,
        |  CAST(regexp_extract(line, $tail, 2) AS BIGINT) AS iters,
        |  CAST(regexp_extract(line, $tail, 3) AS BIGINT) AS passes,
        |  regexp_extract(line, $tail, 4) AS modularity,
        |  CAST(regexp_extract(line, $tail, 5) AS BIGINT) AS disconnected,
        |  CAST(regexp_extract(line, $tail, 6) AS BIGINT) AS total_comms,
        |  regexp_extract(line, $tail, 7) AS technique
        |FROM lines""".stripMargin
    },
    "g_leiden_sweep" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |cp AS (SELECT a.p AS src, b.p AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM cp UNION ALL SELECT dst, src, w FROM cp),
        |mm AS (SELECT sum(w) / 2 AS m FROM e),
        |vt AS (SELECT src AS id, sum(w) AS vtot FROM e GROUP BY 1),
        |st AS (SELECT id, id % 64 AS comm, vtot FROM vt),
        |ct AS (SELECT comm, sum(vtot) AS ctot, count(*) AS csize FROM st GROUP BY 1),
        |mover AS (SELECT s.id, s.comm AS ccur, s.vtot AS vtot_u, c.ctot AS ctot_d, c.csize AS csize_d
        |          FROM st s JOIN ct c ON s.comm = c.comm WHERE s.id % 2 = 0),
        |cand AS (SELECT ed.src, sd.comm AS cdst, sum(ed.w) AS wuc
        |         FROM e ed JOIN mover mv ON ed.src = mv.id JOIN st sd ON ed.dst = sd.id
        |         WHERE ed.src <> ed.dst GROUP BY 1, 2),
        |scored AS (SELECT c.src, c.cdst, c.wuc, mv.ccur, mv.vtot_u, mv.ctot_d, mv.csize_d,
        |                  tc.ctot AS ctot_c, tc.csize AS csize_c,
        |                  c.wuc / mm.m - (mv.vtot_u * tc.ctot) / (2 * mm.m * mm.m) AS score
        |           FROM cand c JOIN ct tc ON c.cdst = tc.comm JOIN mover mv ON c.src = mv.id, mm),
        |elig AS (SELECT *, row_number() OVER (PARTITION BY src ORDER BY score DESC, cdst ASC) AS rn
        |         FROM scored WHERE cdst <> ccur AND NOT (csize_c = 1 AND csize_d = 1 AND cdst > ccur)),
        |wudt AS (SELECT src, sum(CASE WHEN cdst = ccur THEN wuc ELSE 0 END) AS wud FROM scored GROUP BY src),
        |pick AS (SELECT el.src, el.cdst AS newcomm, el.score, el.vtot_u, el.ctot_d, coalesce(w.wud, 0) AS wud
        |         FROM elig el LEFT JOIN wudt w ON el.src = w.src WHERE el.rn = 1),
        |fin AS (SELECT p.src, p.newcomm,
        |               p.score - p.wud / mm.m - (p.vtot_u * (p.vtot_u - p.ctot_d)) / (2 * mm.m * mm.m) AS mdq
        |        FROM pick p, mm)
        |SELECT CAST(src AS BIGINT) AS id, CAST(newcomm AS BIGINT) AS newcomm
        |FROM fin WHERE mdq > 0""".stripMargin,
    "g_degree" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem),
        |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)
        |SELECT src AS id, count(*) AS degree FROM sym GROUP BY src""".stripMargin,
    "g_total_weight" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst FROM lineitem),
        |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)
        |SELECT CAST(count(*) AS DOUBLE) AS total_w FROM sym""".stripMargin,
    "g_copurchase" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
        |SELECT a.p AS src, b.p AS dst, count(*) AS w
        |FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p""".stripMargin,
    "g_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |und AS (SELECT DISTINCT a.p AS x, b.p AS y FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)
        |SELECT count(*) AS triangles FROM und e1 JOIN und e2 ON e1.y = e2.x
        |JOIN und e3 ON e3.x = e1.x AND e3.y = e2.y""".stripMargin,
    "g_mod_terms" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (SELECT a.p AS src, b.p AS dst, count(*) AS w FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p),
        |sym AS (SELECT src, dst, w FROM pairs UNION ALL SELECT dst, src, w FROM pairs),
        |memb AS (SELECT p_partkey AS id, p_brand AS comm FROM part)
        |SELECT ms.comm AS comm,
        |  CAST(sum(CASE WHEN ms.comm = md.comm THEN s.w ELSE 0 END) AS DOUBLE) AS cin,
        |  CAST(sum(s.w) AS DOUBLE) AS ctot
        |FROM sym s JOIN memb ms ON s.src = ms.id JOIN memb md ON s.dst = md.id
        |GROUP BY ms.comm""".stripMargin,
    "d_token_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stopwords,
        |CAST(floor(length(replace(text, ' ', '')) * 100 / len(string_split(text, ' '))) AS BIGINT) AS avg_token_len_x100
        |FROM documents""".stripMargin,
    "d_exact_dup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "d_lang_scores" ->
      """WITH s AS (SELECT doc_id,
        |  len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','und','nicht','das'))) AS de_hits,
        |  len(list_filter(string_split(lower(text),' '), x -> x IN ('the','and','of','is','that'))) AS en_hits,
        |  len(list_filter(string_split(lower(text),' '), x -> x IN ('el','la','que','los','una'))) AS es_hits,
        |  len(list_filter(string_split(lower(text),' '), x -> x IN ('le','la','les','est','une'))) AS fr_hits,
        |  len(list_filter(string_split(lower(text),' '), x -> x IN ('的','是','了','在','我'))) AS zh_hits
        |FROM documents)
        |SELECT doc_id, CAST(de_hits AS BIGINT) AS de_hits, CAST(en_hits AS BIGINT) AS en_hits,
        |  CAST(es_hits AS BIGINT) AS es_hits, CAST(fr_hits AS BIGINT) AS fr_hits, CAST(zh_hits AS BIGINT) AS zh_hits,
        |  CASE WHEN zh_hits > 0 AND zh_hits >= fr_hits AND zh_hits >= es_hits AND zh_hits >= en_hits AND zh_hits >= de_hits THEN 'zh'
        |       WHEN fr_hits > 0 AND fr_hits >= es_hits AND fr_hits >= en_hits AND fr_hits >= de_hits THEN 'fr'
        |       WHEN es_hits > 0 AND es_hits >= en_hits AND es_hits >= de_hits THEN 'es'
        |       WHEN en_hits > 0 AND en_hits >= de_hits THEN 'en'
        |       WHEN de_hits > 0 THEN 'de'
        |       ELSE 'und' END AS pred
        |FROM s""".stripMargin,
    "d_ngram_overlap" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
        |       FROM toks, UNNEST(generate_series(1, len(ts)-2)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY x.doc_id, y.doc_id)
        |SELECT i.a, i.b, i.inter, (za.sz + zb.sz - i.inter) AS u
        |FROM inter i JOIN sz za ON i.a = za.doc_id JOIN sz zb ON i.b = zb.doc_id""".stripMargin,
    "d_fingerprint" ->
      """SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |  list_transform(string_split(text, ' '),
        |    t -> CAST('0x' || substr(md5(t), 1, 13) AS BIGINT) % 2147483647)),
        |  (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp
        |FROM documents""".stripMargin,
    "d_minhash_pairs_md5" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
        |       FROM toks, UNNEST(generate_series(1, len(ts)-2)) AS u(i)),
        |sig AS (SELECT doc_id,
        |  min(CAST('0x' || substr(md5(s || '#0'),1,13) AS BIGINT)) AS mh0,
        |  min(CAST('0x' || substr(md5(s || '#1'),1,13) AS BIGINT)) AS mh1,
        |  min(CAST('0x' || substr(md5(s || '#2'),1,13) AS BIGINT)) AS mh2,
        |  min(CAST('0x' || substr(md5(s || '#3'),1,13) AS BIGINT)) AS mh3,
        |  min(CAST('0x' || substr(md5(s || '#4'),1,13) AS BIGINT)) AS mh4,
        |  min(CAST('0x' || substr(md5(s || '#5'),1,13) AS BIGINT)) AS mh5,
        |  min(CAST('0x' || substr(md5(s || '#6'),1,13) AS BIGINT)) AS mh6,
        |  min(CAST('0x' || substr(md5(s || '#7'),1,13) AS BIGINT)) AS mh7
        |  FROM sh GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, CAST(mh0 AS VARCHAR) || ',' || CAST(mh1 AS VARCHAR) AS bv FROM sig
        |  UNION ALL SELECT doc_id, 1, CAST(mh2 AS VARCHAR) || ',' || CAST(mh3 AS VARCHAR) FROM sig
        |  UNION ALL SELECT doc_id, 2, CAST(mh4 AS VARCHAR) || ',' || CAST(mh5 AS VARCHAR) FROM sig
        |  UNION ALL SELECT doc_id, 3, CAST(mh6 AS VARCHAR) || ',' || CAST(mh7 AS VARCHAR) FROM sig),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |         FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT c.a, c.b, count(*) AS inter
        |          FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sa.s = sb.s
        |          GROUP BY c.a, c.b)
        |SELECT i.a, i.b, i.inter, (za.sz + zb.sz - i.inter) AS u
        |FROM inter i JOIN sz za ON i.a = za.doc_id JOIN sz zb ON i.b = zb.doc_id
        |WHERE i.inter * 5 >= (za.sz + zb.sz - i.inter) * 1""".stripMargin,
    "d_simhash_pairs_md5" ->
      """WITH toks AS (SELECT doc_id, list_transform(string_split(text,' '),
        |                t -> CAST('0x' || substr(md5(t),1,12) AS BIGINT)) AS hs FROM documents),
        |votes AS (SELECT doc_id, b,
        |            sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |          FROM toks, UNNEST(hs) AS u(h), UNNEST(generate_series(0,47)) AS g(b)
        |          GROUP BY doc_id, b),
        |sig AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
        |        FROM votes GROUP BY doc_id),
        |chunks AS (SELECT doc_id, sig, c, (sig >> (c*12)) & 4095 AS val
        |           FROM sig, UNNEST(generate_series(0,3)) AS gc(c)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb
        |         FROM chunks x JOIN chunks y ON x.c = y.c AND x.val = y.val AND x.doc_id < y.doc_id)
        |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming FROM cand
        |WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,
    "e_ann_topk" ->
      """WITH corpus AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id < 20),
        |scored AS (SELECT qid, id, list_cosine_similarity(qvec, vec) AS c
        |           FROM q CROSS JOIN corpus WHERE qid <> id)
        |SELECT qid, id, rank FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rank
        |  FROM scored) t WHERE rank <= 5""".stripMargin,
    "e_ann_lsh_md5" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |pl AS (SELECT p, d, (CAST('0x'||substr(md5(CAST(p AS VARCHAR)||'#'||CAST(d AS VARCHAR)),1,12) AS BIGINT) % 2000001 - 1000000)/1000000.0 AS c
        |       FROM UNNEST(generate_series(0,15)) AS gp(p), UNNEST(generate_series(0,63)) AS gd(d)),
        |dots AS (SELECT v.id, pl.p, sum(vec[pl.d+1] * pl.c) AS dot FROM v, pl GROUP BY v.id, pl.p),
        |sig AS (SELECT id, CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << (15-p)) ELSE 0 END) AS BIGINT) AS sig FROM dots GROUP BY id),
        |cb AS (SELECT id, t, (sig >> (t*4)) & 15 AS bk FROM sig, UNNEST(generate_series(0,3)) AS gt(t)),
        |q AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 20),
        |qb AS (SELECT q.qid, cb.t, cb.bk FROM q JOIN cb ON cb.id = q.qid),
        |cand AS (SELECT DISTINCT qb.qid, cb.id FROM qb JOIN cb ON cb.t = qb.t AND cb.bk = qb.bk AND cb.id <> qb.qid),
        |scored AS (SELECT c.qid, c.id, list_cosine_similarity(vq.vec, vc.vec) AS cos
        |           FROM cand c JOIN v vq ON vq.id = c.qid JOIN v vc ON vc.id = c.id)
        |SELECT qid, id, rank FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank FROM scored) t
        |WHERE rank <= 5""".stripMargin,
    "e_ann_ivf_md5" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |cents AS (SELECT id AS cid, vec AS cvec FROM v
        |          ORDER BY CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,12) AS BIGINT), id LIMIT 16),
        |asim AS (SELECT v.id, c.cid, list_cosine_similarity(v.vec, c.cvec) AS sim FROM v CROSS JOIN cents c),
        |assigned AS (SELECT id, cid AS cell FROM (
        |  SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn FROM asim) t WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id < 20),
        |qsim AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS sim FROM q CROSS JOIN cents c),
        |probes AS (SELECT qid, cid AS cell FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM qsim) t WHERE rn <= 4)
        |SELECT qid, id, rank FROM (
        |  SELECT p.qid, a.id, row_number() OVER (PARTITION BY p.qid ORDER BY list_cosine_similarity(q.qvec, v.vec) DESC, a.id) AS rank
        |  FROM probes p JOIN assigned a ON a.cell = p.cell JOIN q ON q.qid = p.qid JOIN v ON v.id = a.id
        |  WHERE a.id <> p.qid) t WHERE rank <= 5""".stripMargin,
    "e_neardup_md5" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |pl AS (SELECT p, d, (CAST('0x'||substr(md5(CAST(p AS VARCHAR)||'#'||CAST(d AS VARCHAR)),1,12) AS BIGINT) % 2000001 - 1000000)/1000000.0 AS c
        |       FROM UNNEST(generate_series(0,15)) AS gp(p), UNNEST(generate_series(0,63)) AS gd(d)),
        |dots AS (SELECT v.id, pl.p, sum(vec[pl.d+1] * pl.c) AS dot FROM v, pl GROUP BY v.id, pl.p),
        |sig AS (SELECT id, CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << (15-p)) ELSE 0 END) AS BIGINT) AS sig
        |        FROM dots GROUP BY id),
        |buckets AS (SELECT id, t, (sig >> (t*4)) & 15 AS bk FROM sig, UNNEST(generate_series(0,3)) AS gt(t)),
        |cand AS (SELECT DISTINCT x.id AS a, y.id AS b
        |         FROM buckets x JOIN buckets y ON x.t = y.t AND x.bk = y.bk AND x.id < y.id)
        |SELECT c.a, c.b FROM cand c JOIN v va ON va.id = c.a JOIN v vb ON vb.id = c.b
        |WHERE list_cosine_similarity(va.vec, vb.vec) >= 0.4""".stripMargin,
    "d_subwords" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> len(x) > 0)) +
        |       len(list_filter(regexp_split_to_array(text, '[A-Za-z0-9\s]+'), x -> len(x) > 0)) AS BIGINT) AS n_subwords
        |FROM documents""".stripMargin,
    "ev_sessions" ->
      """WITH o AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |g AS (SELECT user_id, event_id, es,
        |  CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (SELECT user_id, es,
        |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY es, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM g)
        |SELECT user_id, sid AS session_id, count(*) AS n_events, min(es) AS start_s, max(es) AS end_s
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "ev_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n,
        |min(value) AS vmin, max(value) AS vmax FROM events GROUP BY 1, 2""".stripMargin,
    "ev_user_events" ->
      """SELECT user_id, count(*) AS n, count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id""".stripMargin,
    // the streamed insert/insert/delete batches compose to: the first 200k
    // copurchase edges by (src, dst) — the query's sf-independent feed cap —
    // except (src*31+dst)%10==0 (inserts are disjoint halves, the deletes
    // land after both) — the fold is SQL-expressible even though the engine
    // path is a live Structured Streaming query
    "g_edge_stream" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT a.p AS src, b.p AS dst, count(*) AS w
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p),
        |e AS (SELECT * FROM e0 ORDER BY src, dst LIMIT 200000),
        |kept AS (SELECT * FROM e WHERE (src*31 + dst) % 10 <> 0),
        |sym AS (SELECT src, dst, w FROM kept
        |        UNION ALL SELECT dst, src, w FROM kept)
        |SELECT src AS id, count(*) AS deg, CAST(sum(w) AS BIGINT) AS wdeg
        |FROM sym GROUP BY src""".stripMargin,
    // *_sql twins: the fixtures' closed-form parameter/pixel/word formulas
    // (Multimodal.syntheticMediaSql, Pages.syntheticSql) recomputed in pure
    // SQL over range() — no media decode, no html parse. Matching these
    // hashes proves the engine's REAL decoders/extractors reproduce every
    // dimension, payload checksum, frame time, digest and link degree.
    "mm_image_meta_sql" ->
      """WITH m AS (
        |  SELECT range AS id,
        |         16 + (range*7919) % 64 AS w,
        |         16 + (range*104729) % 64 AS h,
        |         (range//3) % 4 AS enc
        |  FROM range(300) WHERE range % 3 = 0),
        |px AS (
        |  SELECT m.id,
        |         sum(CASE WHEN m.enc = 3 AND i.range < m.w*m.h
        |                  THEN 3 * ((m.id*31 + i.range*7) % 16) * 17
        |                  WHEN m.enc <> 3 AND i.range < m.w*m.h*3
        |                  THEN (m.id*31 + i.range*7) % 256
        |                  ELSE 0 END) AS px_sum
        |  FROM m, range(18723) i GROUP BY m.id)
        |SELECT m.id AS media_id,
        |       CASE m.enc WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' WHEN 2 THEN 'png' ELSE 'gif' END AS format,
        |       CAST(m.w AS INT) AS width, CAST(m.h AS INT) AS height, CAST(3 AS INT) AS channels,
        |       CAST(px.px_sum AS BIGINT) AS px_sum
        |FROM m JOIN px ON m.id = px.id""".stripMargin,
    "mm_audio_meta_sql" ->
      """SELECT range AS media_id,
        |       CAST(1 + range % 2 AS INT) AS channels,
        |       CAST(CASE WHEN (range//3) % 2 = 0 THEN 8000 ELSE 16000 END AS INT) AS sample_rate,
        |       CAST(16 AS INT) AS bits_per_sample, CAST(256 AS INT) AS n_frames
        |FROM range(300) WHERE range % 3 = 1""".stripMargin,
    "mm_video_frames_sql" ->
      """WITH v AS (
        |  SELECT range AS id, 3 + (range*3) % 5 AS nf
        |  FROM range(300) WHERE range % 3 = 2)
        |SELECT v.id AS media_id,
        |       CAST((k.range*300*4)//1000 AS INT) AS frame_idx,
        |       k.range*300 AS ts_ms
        |FROM v, range(6) k WHERE k.range < (v.nf*250 + 299)//300""".stripMargin,
    "p_text_digest_sql" ->
      """WITH p AS (SELECT range AS id FROM range(500)),
        |w AS (SELECT p.id, k.range AS k,
        |       ['data','graph','link','page','crawl','spark','node','edge','rank','query','web','text','hash','batch','scan'][CAST((p.id*7 + k.range*31) % 15 AS INT) + 1] AS word
        |      FROM p, range(80) k WHERE k.range < 20 + (p.id*3) % 60)
        |SELECT 'https://site-' || CAST(id % 50 AS VARCHAR) || '.example/p/' || CAST(id // 50 AS VARCHAR) AS url,
        |       sha256(string_agg(word, ' ' ORDER BY k)) AS sha
        |FROM w GROUP BY id""".stripMargin,
    "p_link_edges_sql" ->
      """WITH p AS (SELECT range AS id FROM range(500)),
        |u AS (SELECT id, 'https://site-' || CAST(id % 50 AS VARCHAR) || '.example/p/' || CAST(id // 50 AS VARCHAR) AS url FROM p),
        |ids AS (SELECT id, row_number() OVER (ORDER BY url) - 1 AS vid FROM u),
        |tl AS (
        |  SELECT p.id AS src_id,
        |         least(499, (((p.id*2654435761 + k.range*40503) % 1000000)
        |                   * ((p.id*2654435761 + k.range*40503) % 1000000)
        |                   * p.id) // 1000000000000 ) AS dst_id
        |  FROM p, range(12) k WHERE k.range < 2 + (p.id*13) % 10),
        |e0 AS (SELECT DISTINCT s.vid AS src, d.vid AS dst
        |       FROM tl JOIN ids s ON tl.src_id = s.id JOIN ids d ON tl.dst_id = d.id
        |       WHERE tl.src_id <> tl.dst_id),
        |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)
        |SELECT src AS id, count(*) AS degree FROM sym GROUP BY src""".stripMargin)
}
