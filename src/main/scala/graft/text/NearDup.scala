package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at training-data scale: MinHash+LSH and SimHash.
  * All hashing is derived deterministically from xxhash64 with literal
  * seeds — no RNG state, so any two runs (and any two cluster sizes)
  * produce identical signatures.
  */
object NearDup {

  /** MinHash signature: for hash function i, min over the shingle set of
    * xxhash64(shingle, i). Returns array<long> of length `numHashes`.
    *
    * Native codegen'd expression (graft.catalyst.MinHashSigExpr): one tight
    * loop per row maintaining all minima. Bit-for-bit equal to
    * minHashReference (pinned by NativeSpec).
    */
  def minHash(shingleArr: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.NativeColumns.minhashSig(shingleArr, numHashes)

  /** The Column-HOF formulation, kept as the independently-derived parity
    * oracle for the native expression. Single traversal: one fold over the
    * shingle array maintains all `numHashes` running minima. (The transpose
    * formulation — transform(hashes, i => array_min(transform(arr, ...))) —
    * walks the array numHashes times per row, and worse, it statically
    * references `shingleArr` only once, so CollapseProject happily inlines
    * a whole shingling expression there and recomputes IT numHashes times
    * per row.)
    */
  private[graft] def minHashReference(shingleArr: Column, numHashes: Int): Column =
    aggregate(shingleArr,
      transform(sequence(lit(0), lit(numHashes - 1)), _ => lit(Long.MaxValue)),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (a, i) => least(a, xxhash64(s, i))))

  /** MinHash + banded LSH candidate pairs.
    *
    * Signature of `numHashes` minhashes split into `bands` bands; docs
    * sharing any band signature become candidates (the standard
    * shingle->minhash->band->bucket-join pipeline); candidates are verified
    * with exact shingle-set Jaccard and filtered by `threshold`.
    *
    * Scale shape: the bucket join is an equi-join on (band, bandHash) —
    * shuffle by bucket, no cross join anywhere; giant buckets (boilerplate
    * text) are capped by AQE skew splitting.
    *
    * @return (a, b, jaccard) with a < b, jaccard >= threshold
    */
  def minHashLshPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 16,
                      bands: Int = 4, threshold: Double = 0.7,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // Materialized once and FIXED-WIDTH: only (id, 16 minhash longs) flows
    // into the bucket join — never the shingle arrays, whose size is O(doc)
    // and would dominate the shuffle at corpus scale. Docs with fewer than
    // k tokens have no shingles and are exempt from near-dup.
    val withSig = org.apache.spark.sql.graft.PlanUtils.checkpointTruncated(
      docs.select(col(idCol).as("id"), TextOps.shingles(col(textCol), k).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("id"), minHash(col("sh"), numHashes).as("sig")))
    val buckets = withSig.select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)), lit(b)).as("bh"))): _*))
          .as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bh"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // exact verification on the candidate set only: re-derive each side's
    // shingles from doc storage per pair (candidates are LSH-rare, so the
    // recompute is cheap; shipping per-doc shingle arrays corpus-wide is
    // not). Two guards keep it to ONE shingles() per pair side:
    //   - sa/sb are projected once BELOW the jaccard select and referenced
    //     twice each (intersect + union) — the multi-reference guard stops
    //     CollapseProject from inlining the shingling expression back in;
    //   - the verified pairs are MATERIALIZED before the threshold filter —
    //     otherwise PushDownPredicates inlines the whole jaccard expression
    //     into the Filter and recomputes both shingle sets per row again.
    // PlanSpec pins that the returned plan contains no shingling at all.
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    val verified = org.apache.spark.sql.graft.PlanUtils.checkpointTruncated(
      cand
        .join(txt.select(col("id").as("a"), col("txt").as("ta")), "a")
        .join(txt.select(col("id").as("b"), col("txt").as("tb")), "b")
        .select(col("a"), col("b"),
          TextOps.shingles(col("ta"), k).as("sa"), TextOps.shingles(col("tb"), k).as("sb"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            size(array_union(col("sa"), col("sb")))).as("jaccard")))
    verified.filter(col("jaccard") >= threshold)
  }

  /** Cross-engine MinHash signature: hash i of a shingle is the 52-bit
    * md5-prefix of "<shingle>#<i>" — md5 is identical across engines (the
    * same device as TextOps.fingerprint), so unlike the xxhash64 kernel the
    * whole signature is reproducible in ANSI SQL. One fold over the shingle
    * array maintains all running minima.
    */
  private[graft] def minHashMd5(shingleArr: Column, numHashes: Int): Column =
    aggregate(shingleArr,
      transform(sequence(lit(0), lit(numHashes - 1)), _ => lit(Long.MaxValue)),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (a, i) => least(a, conv(substring(md5(
          concat(s, lit("#"), i.cast("string"))), 1, 13), 16, 10).cast("long"))))

  /** The full MinHash->band->bucket->verify pipeline in its cross-engine
    * form: md5-derived signatures (minHashMd5), band keys that are the
    * band's RAW minhash values joined as a string (no engine-specific band
    * hash), and integer (inter, union) verification — every stage exactly
    * reproducible in ANSI SQL, making the complete LSH dedup pipeline
    * oracle-checkable end to end (SparkEntry d_minhash_pairs_md5). The
    * xxhash64 variant (minHashLshPairs) is the production path — one
    * engine-native hash per (shingle, seed) instead of an md5; this variant
    * trades that speed for a DuckDB-verifiable contract.
    *
    * Pairs pass when inter * thresholdDen >= union * thresholdNum
    * (integer-exact Jaccard threshold — no float compare anywhere).
    *
    * @return (a, b, inter, u) with a < b
    */
  def minHashLshPairsMd5(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
                         bands: Int = 4, thresholdNum: Int = 1, thresholdDen: Int = 5,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val withSig = org.apache.spark.sql.graft.PlanUtils.checkpointTruncated(
      docs.select(col(idCol).as("id"), TextOps.shingles(col(textCol), k).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("id"), minHashMd5(col("sh"), numHashes).as("sig")))
    val buckets = withSig.select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            concat_ws(",", slice(col("sig"), b * rows + 1, rows)).as("bv"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bv"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    val verified = org.apache.spark.sql.graft.PlanUtils.checkpointTruncated(
      cand
        .join(txt.select(col("id").as("a"), col("txt").as("ta")), "a")
        .join(txt.select(col("id").as("b"), col("txt").as("tb")), "b")
        .select(col("a"), col("b"),
          TextOps.shingles(col("ta"), k).as("sa"), TextOps.shingles(col("tb"), k).as("sb"))
        .select(col("a"), col("b"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
          size(array_union(col("sa"), col("sb"))).cast("long").as("u")))
    verified.filter(col("inter") * thresholdDen >= col("u") * thresholdNum)
  }

  /** Bit masks 1L<<0 .. 1L<<63 as an array literal — Spark's shiftright
    * only takes a Scala-Int shift amount, so per-bit work inside lambdas
    * tests against masks instead of shifting by a lambda variable.
    */
  private val BITMASKS = array((0 until 64).map(j => lit(1L << j)): _*)

  /** Cross-engine 48-bit SimHash: the per-token hash is the 48-bit md5
    * prefix (the same engine-portable device as TextOps.fingerprint and
    * minHashMd5), votes and sign-packing are plain integer arithmetic, so
    * the whole signature — unlike the xxhash64 production kernel — is
    * exactly reproducible in ANSI SQL. 48 bits keep every intermediate in
    * an exact BIGINT in both engines; a zero vote sum packs bit 0 (strict
    * `> 0` rule) on both sides.
    */
  private[graft] def simHashMd5(text: Column, bits: Int = 48): Column = {
    val masks = array((0 until bits).map(j => lit(1L << j)): _*)
    val hashes = transform(TextOps.tokens(text),
      t => conv(substring(md5(t), 1, 12), 16, 10).cast("long"))
    val votes = aggregate(hashes,
      transform(sequence(lit(0), lit(bits - 1)), _ => lit(0L)),
      (acc, h) => zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(-1L))))
    aggregate(zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** The full SimHash near-dup pipeline in its cross-engine form:
    * md5-derived 48-bit signatures (simHashMd5), pigeonhole blocking on 4
    * chunks of 12 bits (two signatures within Hamming distance d < 4 share
    * at least one chunk exactly), Hamming verify via bit_count(xor) —
    * every stage integer-exact and reproducible in ANSI SQL, making the
    * complete SimHash dedup pipeline oracle-checkable end to end
    * (SparkEntry d_simhash_pairs_md5). The xxhash64 variant (simHashPairs)
    * is the production path — one native hash per token and 64 signature
    * bits; this variant trades that for a DuckDB-verifiable contract.
    *
    * @return (a, b, hamming) with a < b, hamming <= maxHamming
    */
  def simHashPairsMd5(docs: DataFrame, maxHamming: Int = 3,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes maxHamming < 4")
    val sigs = org.apache.spark.sql.graft.PlanUtils.checkpointTruncated(
      docs.select(col(idCol).as("id"), simHashMd5(col(textCol)).as("sig")))
    val chunks = sigs.select(col("id"), col("sig"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"),
            shiftright(col("sig"), c * 12).bitwiseAND(lit(0xFFFL)).as("v"))): _*)).as("ch"))
      .select(col("id"), col("sig"), col("ch.c"), col("ch.v"))
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming(col("x.sig"), col("y.sig")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit SimHash over whitespace tokens: bit j is the sign of the summed
    * (+1/-1) votes from bit j of each token's xxhash64. Native codegen'd
    * expression (graft.catalyst.SimHash64Expr) — one hash per token, one
    * tight loop per row. Bit-for-bit equal to simHashReference (NativeSpec).
    */
  def simHash(text: Column): Column =
    org.apache.spark.sql.graft.NativeColumns.simhash64(text)

  /** The Column-HOF formulation, kept as the independently-derived parity
    * oracle for the native expression: a per-token 64-long vote vector is
    * folded with zip_with, then sign bits pack through bitwise OR of the
    * masks — O(tokens) hash calls, not O(64 x tokens) as a per-bit-seeded
    * variant would cost.
    */
  private[graft] def simHashReference(text: Column): Column = {
    val votes = aggregate(
      TextOps.tokens(text),
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) => zip_with(acc, BITMASKS, (a, m) =>
        a + when(xxhash64(t).bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, BITMASKS, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxHamming` bits, blocked by 16-bit
    * chunks: two hashes within Hamming distance d < 4 share at least one of
    * their 4 16-bit chunks exactly (pigeonhole), so the candidate join is an
    * equi-join on (chunkIdx, chunkValue) — no cross join.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id",
                   bucketCap: Long = 100000): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes maxHamming < 4")
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"),
            shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("ch"))
      .select(col("id"), col("sig"), col("ch.c"), col("ch.v"))
    // bucket-size cap: a boilerplate-dominated corpus puts ~every doc into
    // the same chunk bucket, making the self-join O(bucket^2). Buckets
    // larger than bucketCap are dropped (pairs whose ONLY shared chunk was
    // a dropped bucket are lost — a recall cap, audited via
    // oversizedBuckets(), never a silent quadratic blowup). Default is far
    // above any fixture's bucket size, so results there are exact.
    val kept = chunks.join(
      chunks.groupBy("c", "v").agg(count(lit(1)).as("bc"))
        .filter(col("bc") <= bucketCap).select("c", "v"),
      Seq("c", "v"), "left_semi")
    kept.as("x").join(kept.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Audit companion for simHashPairs' bucketCap: the (chunk, value, size)
    * buckets the cap drops — callers log these so the cap is never silent.
    */
  def oversizedBuckets(docs: DataFrame, bucketCap: Long,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    sigs.select(col("id"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"),
            shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("ch"))
      .groupBy(col("ch.c").as("c"), col("ch.v").as("v"))
      .agg(count(lit(1)).as("bc"))
      .filter(col("bc") > bucketCap)
  }
}
