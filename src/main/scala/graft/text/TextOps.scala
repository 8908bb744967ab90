package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, shingling, fingerprinting. All
  * pure Column expressions (whole-stage codegen, no UDFs), designed so the
  * scan only reads the columns each query needs.
  */
object TextOps {

  /** Whitespace tokens (single-space split; empty tokens kept — identical
    * semantics to ANSI string_split for oracle parity).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words plus punctuation runs, approximating a
    * byte-pair tokenizer's granularity with a deterministic regex.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > 0)) +
      size(filter(split(text, "[A-Za-z0-9\\s]+"), t => length(t) > 0))

  private val STOPWORDS = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality features (doc_id, n_chars, n_tokens, n_stopwords, avg token
    * length scaled by 100 as integer — integer outputs keep the DuckDB
    * oracle hash-exact).
    */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      size(t).as("n_tokens"),
      size(filter(t, x => x.isin(STOPWORDS.map(lit(_)): _*))).as("n_stopwords"),
      floor(length(regexp_replace(col(textCol), " ", "")) * lit(100) / size(t)).as("avg_token_len_x100"))
  }

  /** Marker-word language ID: count hits of per-language stopword markers,
    * pick the best-scoring language, ties broken alphabetically, zero hits
    * -> "und". Deterministic n-gram-free heuristic (SURVEY.md §2.10 scope).
    */
  private val MARKERS: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "is", "that"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "la", "les", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(text: Column): Column = {
    val t = tokens(lower(text))
    val scored = MARKERS.map { case (lang, ms) =>
      struct(size(filter(t, x => x.isin(ms.map(lit(_)): _*))).as("score"), lit(lang).as("lang"))
    }
    // struct max: score first, ties break to the lexicographically
    // greatest language code (deterministic)
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling polynomial document fingerprint over tokens, mod 2^31-1 (the
    * classic Rabin-Karp document hash). Pure column expression via
    * aggregate(); deterministic across partitionings. Token hash = first 13
    * hex chars of md5 (52 bits) — md5 is identical across engines, so the
    * whole fingerprint is reproducible in ANSI SQL (DuckDB oracle), unlike
    * engine-specific xxhash64.
    */
  def fingerprint(text: Column): Column = {
    // modulus 2^31-1: keeps acc*multiplier within a long under ANSI
    // arithmetic (acc < 2^31, multiplier ~2^20 -> product < 2^52)
    val mod = lit(2147483647L)
    def th(tk: Column) = pmod(conv(substring(md5(tk), 1, 13), 16, 10).cast("long"), mod)
    aggregate(tokens(text), lit(0L),
      (acc, tk) => pmod(acc * lit(1000003L) + th(tk), mod))
  }

  /** Word k-shingles as an array column (distinct, order-insensitive).
    * Documents with fewer than k tokens have NO k-shingles (empty array) —
    * the same semantics as the SQL oracle's generate_series(1, len-k+1),
    * which is empty for short docs; they are exempt from shingle-based
    * dedup rather than matching on their whole text.
    *
    * Native codegen'd expression (graft.catalyst.ShinglesExpr): one byte
    * scan per row, zero-copy shingle substrings. Bit-for-bit equal to
    * [[shinglesReference]] (pinned by NativeSpec) — the HOF formulation was
    * CodegenFallback and re-evaluated the split subtree at every lambda
    * reference (measured 3.8 s over 5000 sf0.1 docs vs ~0.1 s native; it
    * dominated both near-dup bench rows). coalesce keeps the reference
    * semantics for NULL text (empty array, via the `when`'s otherwise).
    */
  def shingles(text: Column, k: Int): Column =
    coalesce(org.apache.spark.sql.graft.NativeColumns.shinglesArr(text, k),
      array().cast("array<string>"))

  /** The Column-HOF formulation, kept as the independently-derived parity
    * oracle for the native expression (same device as
    * NearDup.minHashReference).
    */
  private[graft] def shinglesReference(text: Column, k: Int): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact duplicate groups by content hash: (h, keeper=min id, dups). */
  def exactDupGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n"))

  /** Exact dedup: keep the smallest id per distinct text. */
  def dedupExact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.join(
      exactDupGroups(docs, textCol, idCol)
        .select(col("keeper").as(idCol)), Seq(idCol), "left_semi")

  /** Pairwise n-gram (shingle) overlap for all candidate pairs:
    * (a, b, inter, union) with a < b. Exact integer outputs; Jaccard =
    * inter/union computed by the caller. The shingle inverted index bounds
    * the join to docs sharing at least one shingle.
    *
    * `dfCap` bounds the posting list of any one shingle: a shingle shared
    * by df documents contributes O(df^2) pairs to the self-join, so one
    * boilerplate shingle across 10^6 docs would emit 10^12 rows. Shingles
    * with df > dfCap are DROPPED from the index (their pairs lose that
    * shingle from `inter`; set sizes stay exact, so `union` is exact and
    * jaccard becomes a lower bound). The default cap is far above any
    * fixture's max df — results are exact there; at web scale callers set
    * it to taste and audit the loss with droppedShingles().
    */
  def ngramOverlap(docs: DataFrame, k: Int, textCol: String = "text",
                   idCol: String = "doc_id", dfCap: Long = 100000): DataFrame = {
    // The inverted index feeds FOUR plan branches (sizes, the df-cap
    // aggregation, both sides of the self-join): materialize it once so the
    // explode+distinct scan — the expensive part — never re-executes.
    val sh = org.apache.spark.sql.graft.PlanUtils.checkpointTruncated(
      docs.select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("s"))
        .distinct())
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val kept = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= dfCap).select("s"),
      Seq("s"), "left_semi")
    val inter = kept.as("x").join(kept.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("union"))
  }

  /** Audit companion for ngramOverlap's dfCap: the (shingle, df) rows that
    * the cap drops — callers log/count these so the cap is never silent.
    */
  def droppedShingles(docs: DataFrame, k: Int, dfCap: Long,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("s"))
      .distinct()
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
}
