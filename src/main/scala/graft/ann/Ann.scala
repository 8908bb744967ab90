package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Brute-force exact cosine top-k as the correctness baseline; a
  * hyperplane-LSH bucketed variant as the scale path (candidates bounded by
  * bucket joins instead of a full cross product). Dot products are pure
  * column expressions (zip_with + aggregate — codegen, no UDF); all
  * "random" hyperplanes derive from xxhash64 with literal seeds, so
  * signatures are deterministic across runs and cluster sizes.
  */
object Ann {

  /** Dot product of two array<float/double> columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native codegen'd cosine (graft.catalyst.ArrayCosineExpr) — one tight
    * double-accumulation loop per pair, bit-for-bit equal to
    * cosineReference (NativeSpec parity).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeColumns.cosineSim(a, b)

  /** Column-HOF formulation, the parity oracle for the native expression. */
  private[graft] def cosineReference(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k neighbors for each query vector.
    *
    * @param queries (qid, qvec) — expected small (broadcast side)
    * @param corpus  (id, vec)
    * @return (qid, id, rank, cosine), rank 1..k, ties broken by smaller id
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"), cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "id", "rank", "cosine")
  }

  /** Banding contract guard: every signature bit must belong to exactly one
    * band — a non-divisible (planes, tables) pair would silently leave the
    * high `planes % tables` bits uncovered by any band (recall loss).
    */
  private def bandRows(planes: Int, tables: Int): Int = {
    require(planes % tables == 0,
      s"planes ($planes) must be a multiple of tables ($tables): bands of " +
        "planes/tables bits must tile the signature exactly")
    planes / tables
  }

  /** Deterministic hyperplane sign bits: plane p's component d is a
    * pseudo-gaussian-ish value derived from xxhash64(p, d). Signature =
    * `planes` sign bits packed into a long.
    */
  def lshSignature(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => acc * lit(2L) + when(
        aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, d) => v.cast("double") *
            ((pmod(xxhash64(p, d), lit(2000001L)) - lit(1000000L)).cast("double") / 1e6)),
          lit(0.0), (a, x) => a + x) > 0,
        lit(1L)).otherwise(lit(0L)))

  /** LSH-bucketed approximate top-k: vectors sharing any of `tables`
    * signature bands become candidates; exact cosine re-scores candidates.
    * Recall grows with tables; cost stays an equi-join on bucket keys.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 16, tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = bandRows(planes, tables)
    def buckets(df: DataFrame, idc: String, vc: String) =
      df.select(col(idc), col(vc),
          explode(array((0 until tables).map(t =>
            struct(lit(t).as("t"),
              shiftright(lshSignature(col(vc), planes), t * rows)
                .bitwiseAND(lit((1L << rows) - 1)).as("bk"))): _*)).as("b"))
        .select(col(idc), col(vc), col("b.t"), col("b.bk"))
    val qb = buckets(queries, "qid", "qvec")
    val cb = buckets(corpus, "id", "vec")
    val cand = qb.join(cb, Seq("t", "bk"))
      .filter(col("qid") =!= col("id"))
      .select("qid", "qvec", "id", "vec").distinct()
    val scored = cand.select(col("qid"), col("id"),
      cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "id", "rank", "cosine")
  }

  /** Cross-engine LSH top-k twin: identical banded bucket search but with
    * md5-derived hyperplanes (lshSignatureMd5) and rank-only output, so the
    * whole approximate-top-k pipeline is reproducible in ANSI SQL
    * (SparkEntry e_ann_lsh_md5). Measured sf0.01 margins: plane-sign 3.6e-5,
    * rank adjacency 1.9e-5 — far above cross-engine double noise. lshTopK
    * (xxhash64 planes) stays the production path.
    */
  def lshTopKMd5(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                 planes: Int = 16, tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = bandRows(planes, tables)
    def buckets(df: DataFrame, idc: String, vc: String) =
      df.select(col(idc), lshSignatureMd5(col(vc), planes).as("sig"))
        .select(col(idc), explode(array((0 until tables).map(t =>
            struct(lit(t).as("t"),
              shiftright(col("sig"), t * rows)
                .bitwiseAND(lit((1L << rows) - 1)).as("bk"))): _*)).as("b"))
        .select(col(idc), col("b.t"), col("b.bk"))
    val cand = buckets(queries, "qid", "qvec").join(buckets(corpus, "id", "vec"), Seq("t", "bk"))
      .filter(col("qid") =!= col("id"))
      .select("qid", "id").distinct()
    val scored = cand.join(queries, "qid").join(corpus, "id")
      .select(col("qid"), col("id"), cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank").cast("long").as("rank"))
  }

  /** IVF (inverted-file) approximate top-k: the scale path for
    * billion-vector corpora. `nlist` coarse centroids are chosen
    * DETERMINISTICALLY (the corpus vectors with the smallest xxhash64(id) —
    * a seeded uniform sample, no RNG state, identical on every run and
    * cluster size); every corpus vector is assigned to its nearest centroid
    * (one pass, centroids broadcast); a query probes only the `nprobe`
    * nearest cells and re-scores exactly within them.
    *
    * Scale shape: assignment is a pure per-row argmax expression over the
    * centroid literals (ZERO exchanges of the corpus — the cell key is
    * computed in the scan projection); search joins queries to their
    * probed cell ids and then equi-joins on cell id — candidates are
    * bounded by nprobe/nlist of the corpus instead of all of it.
    *
    * @param queries (qid, qvec) — broadcast-sized
    * @param corpus  (id, vec)
    * @return (qid, id, rank, cosine), rank 1..k per query
    */
  /** Literal-expression budget for IVF: up to this nlist the centroids are
    * embedded as plan literals and cell assignment is a ZERO-exchange
    * per-row argmax (below); beyond it the O(nlist) expression tree stops
    * being codegen-friendly (JIT method-size blowup) and assignment/probing
    * switch to a broadcast centroid TABLE join + one argmax aggregation —
    * same semantics (AnnSpec pins parity), one broadcast of the nlist×dim
    * table plus one map-side-combined exchange of the corpus instead of
    * zero, which is the right trade at nlist ≳ 10³ for billion-vector
    * corpora. The broadcast path also never collects centroids to the
    * driver — the centroid table stays a (distributed) DataFrame.
    */
  val IvfLiteralBudget = 64

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              literalBudget: Int = IvfLiteralBudget): DataFrame =
    if (nlist <= literalBudget)
      ivfSearch(queries, corpus, k, nprobe, ivfCentroids(corpus, nlist))
    else
      ivfSearchBroadcast(queries, corpus, k, nprobe, ivfCentroidTable(corpus, nlist))

  /** Cross-engine IVF twin: identical search, but centroids are the nlist
    * corpus vectors with the smallest 48-bit md5(id) (the engine-portable
    * device of the text/embedding md5 twins) and the output is rank-only —
    * every stage reproducible in ANSI SQL (SparkEntry e_ann_ivf_md5).
    * Decision margins measured at sf0.01: cell-assignment top-2 centroid
    * gap 8.4e-5, probe cut gap 7.6e-4, rank gap 1.7e-4 — all ~1e11x above
    * cross-engine double noise. ivfTopK (xxhash64 sampling) stays the
    * production path.
    */
  def ivfTopKMd5(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                 nlist: Int = 16, nprobe: Int = 4): DataFrame =
    ivfSearch(queries, corpus, k, nprobe, ivfCentroids(corpus, nlist, md5Order = true))
      .select(col("qid"), col("id"), col("rank").cast("long").as("rank"))

  private def ivfSearch(queries: DataFrame, corpus: DataFrame, k: Int,
                        nprobe: Int, cents: Array[(Long, Column)]): DataFrame = {
    // assign each corpus vector to its nearest centroid (max cosine, ties
    // to the smallest centroid id — deterministic): a pure per-row argmax
    // expression over the centroid literals — zero exchanges of the corpus
    // (pinned by PlanSpec), vs the former crossJoin+groupBy("id") which
    // re-shuffled every embedding by id
    val assigned = ivfAssign(corpus, cents)
    // each query probes its nprobe nearest cells (desc sim, ties asc cid):
    // same per-row expression, sorted via the negated-sim struct order
    val probes = queries.select(col("qid"), col("qvec"),
        explode(slice(sort_array(array(cents.map { case (cid, cv) =>
          struct((-cosine(col("qvec"), cv)).as("nsim"), lit(cid).as("cid"))
        }: _*)), 1, nprobe)).as("pc"))
      .select(col("qid"), col("qvec"), col("pc.cid").as("cell"))
    ivfRank(probes, assigned, k)
  }

  /** Broadcast-centroid IVF search — the large-nlist path behind
    * `IvfLiteralBudget`. Identical decision rules to the literal path
    * (max cosine, ties to the smaller centroid id; probe cut desc sim,
    * ties asc cid): assignment crossJoins the broadcast centroid table and
    * reduces with ONE argmax aggregation whose map-side combine collapses
    * the nlist copies of each corpus row before the exchange — shuffled
    * bytes are O(corpus), never O(corpus × nlist).
    */
  private def ivfSearchBroadcast(queries: DataFrame, corpus: DataFrame, k: Int,
                                 nprobe: Int, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bcents = broadcast(cents)
    // struct order = (sim, -cid, cell): same deterministic tie-break as the
    // literal path's array_max struct
    val assigned = corpus.crossJoin(bcents)
      .select(col("id"), col("vec"),
        struct(cosine(col("vec"), col("cvec")).as("sim"),
          (-col("cid")).as("tb"), col("cid").as("cell")).as("sc"))
      .groupBy("id")
      .agg(max("sc").getField("cell").as("cell"), first("vec").as("vec"))
    val pw = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    val probes = queries.crossJoin(bcents)
      .select(col("qid"), col("qvec"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("sim"))
      .withColumn("rn", row_number().over(pw)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid").as("cell"))
    ivfRank(probes, assigned, k)
  }

  /** Shared IVF tail: probed-cell equi-join, exact re-score, top-k. */
  private def ivfRank(probes: DataFrame, assigned: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = probes.join(assigned, "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"), cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "id", "rank", "cosine")
  }

  /** The IVF coarse-centroid table as a DataFrame (cid, cvec) — the same
    * deterministic smallest-xxhash64(id) sample as `ivfCentroids`, kept
    * distributed for the broadcast-assignment path (no driver collect; the
    * global top-nlist is a TakeOrderedAndProject, not a full sort).
    */
  private[graft] def ivfCentroidTable(corpus: DataFrame, nlist: Int): DataFrame =
    corpus.select(col("id").as("cid"), col("vec").as("cvec"),
        xxhash64(col("id")).as("h"))
      .orderBy(col("h"), col("cid")).limit(nlist)
      .select(col("cid"), col("cvec"))

  /** Deterministic IVF coarse centroids: the `nlist` corpus vectors with
    * the smallest xxhash64(id) — a seeded uniform sample, no RNG state,
    * identical on every run and cluster size. Collected to the driver BY
    * CONSTRUCTION bounded at nlist rows (the same broadcast-small contract
    * as the query set) and returned as (cid, vector-literal Column) pairs,
    * so cell assignment/probing are pure per-row expressions.
    */
  private[graft] def ivfCentroids(corpus: DataFrame, nlist: Int,
                                  md5Order: Boolean = false): Array[(Long, Column)] = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val floatElems = corpus.schema("vec").dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val h = if (md5Order) // cross-engine ordering for the md5 twin
      conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10).cast("long")
    else xxhash64(col("id"))
    corpus.select(col("id"), col("vec"), h.as("h"))
      .orderBy(col("h"), col("id")).limit(nlist)
      .select(col("id"), col("vec")).collect()
      .map { r =>
        val vlit = if (floatElems) typedlit(r.getSeq[Float](1))
                   else typedlit(r.getSeq[Double](1))
        (r.getLong(0), vlit)
      }
  }

  /** Nearest-centroid cell per corpus row as a single narrow projection:
    * (id, vec, cell). No Exchange anywhere in this plan (PlanSpec pins it).
    */
  private[graft] def ivfAssign(corpus: DataFrame, cents: Array[(Long, Column)]): DataFrame =
    corpus.select(col("id"), col("vec"),
      array_max(array(cents.map { case (cid, cv) =>
        struct(cosine(col("vec"), cv).as("sim"), lit(-cid).as("tb"), lit(cid).as("cell"))
      }: _*)).getField("cell").as("cell"))

  /** Cross-engine hyperplane signature: plane p's component d derives from
    * the 48-bit md5 prefix of "p#d" (the same engine-portable device as the
    * text pipeline's md5 twins) instead of xxhash64, so the whole signature
    * is reproducible in ANSI SQL. Integer plane components are exact in
    * double; the sign fold gives plane p weight 2^(planes-1-p).
    */
  private[graft] def lshSignatureMd5(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => acc * lit(2L) + when(
        aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, d) => v.cast("double") *
            ((pmod(conv(substring(md5(concat(p.cast("string"), lit("#"),
              d.cast("string"))), 1, 12), 16, 10).cast("long"),
              lit(2000001L)) - lit(1000000L)).cast("double") / lit(1000000.0))),
          lit(0.0), (a, x) => a + x) > 0,
        lit(1L)).otherwise(lit(0L)))

  /** The full embedding near-dup pipeline in its cross-engine form:
    * md5-derived hyperplane signatures (lshSignatureMd5), banded bucket
    * join, exact double-cosine verify, integer (a, b) output — every stage
    * reproducible in ANSI SQL (SparkEntry e_neardup_md5). Decision margins
    * measured at sf0.01: min |plane dot| 3.6e-5 and min |cosine-threshold|
    * 1.3e-4, both ~1e11x above cross-engine double-summation noise, so
    * sign bits and the threshold cannot flip between engines. The xxhash64
    * variant (cosineNearDupPairs) is the production path.
    *
    * @return (a, b) with a < b, cosine(a, b) >= threshold
    */
  def cosineNearDupPairsMd5(vecs: DataFrame, threshold: Double = 0.4,
                            planes: Int = 16, tables: Int = 4,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rows = bandRows(planes, tables)
    // signature projected ONCE below the band explode (multi-reference
    // guard keeps the 16x64-md5 expression from inlining per band)
    val b = vecs.select(col(idCol).as("id"),
        lshSignatureMd5(col(vecCol), planes).as("sig"))
      .select(col("id"), explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            shiftright(col("sig"), t * rows)
              .bitwiseAND(lit((1L << rows) - 1)).as("bk"))): _*)).as("bb"))
      .select(col("id"), col("bb.t"), col("bb.bk"))
    val cand = b.as("x").join(b.as("y"),
        col("x.t") === col("y.t") && col("x.bk") === col("y.bk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val va = vecs.select(col(idCol).as("a"), col(vecCol).as("va"))
    val vb = vecs.select(col(idCol).as("b"), col(vecCol).as("vb"))
    cand.join(va, "a").join(vb, "b")
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("a"), col("b"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via LSH
    * blocking + exact verification. (a, b, cosine), a < b.
    */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double,
                         planes: Int = 16, tables: Int = 4,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rows = bandRows(planes, tables)
    // candidate ids only through the bucket join; a pair matching in
    // several tables is deduplicated BEFORE scoring, so each pair's cosine
    // is computed exactly once (and never compared as a float dedup key)
    val b = vecs.select(col(idCol).as("id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            shiftright(lshSignature(col(vecCol), planes), t * rows)
              .bitwiseAND(lit((1L << rows) - 1)).as("bk"))): _*)).as("bb"))
      .select(col("id"), col("bb.t"), col("bb.bk"))
    val cand = b.as("x").join(b.as("y"),
        col("x.t") === col("y.t") && col("x.bk") === col("y.bk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val va = vecs.select(col(idCol).as("a"), col(vecCol).as("va"))
    val vb = vecs.select(col(idCol).as("b"), col(vecCol).as("vb"))
    cand.join(va, "a").join(vb, "b")
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
