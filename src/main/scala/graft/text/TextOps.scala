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
    * aggregate(); deterministic across partitionings.
    */
  def fingerprint(text: Column): Column = {
    // modulus 2^31-1: keeps acc*multiplier within a long under ANSI
    // arithmetic (acc < 2^31, multiplier ~2^20 -> product < 2^52)
    val mod = lit(2147483647L)
    aggregate(tokens(text), lit(0L),
      (acc, tk) => pmod(acc * lit(1000003L) + pmod(xxhash64(tk), mod), mod))
  }

  /** Word k-shingles as an array column (distinct, order-insensitive). */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= k,
        transform(sequence(lit(0), size(t) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*)))
        .otherwise(array(text)))
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
    */
  def ngramOverlap(docs: DataFrame, k: Int, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("s"))
      .distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("union"))
  }
}
