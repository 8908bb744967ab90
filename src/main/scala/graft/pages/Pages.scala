package graft.pages

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Common-Crawl-style web-pages table (BASELINE.json input_hint):
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  */
case class Page(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
                text: String, lang: String)

/** Deterministic synthetic pages source (FIXTURES.md F1) + link extraction
  * (SURVEY.md §2.1 S8).
  *
  * Generation is a pure function of the page id (seeded per-row), so the
  * table is byte-identical regardless of partitioning, parallelism, or
  * cluster size — the property the per-url byte-identical-text invariant
  * tests hang off. Link targets follow a preferential-attachment-style
  * skew (quadratic bias toward low page ids) to reproduce web-graph hubs.
  */
object Pages {

  private val WORDS = Array("data", "graph", "link", "page", "crawl", "spark",
    "node", "edge", "rank", "query", "web", "text", "hash", "batch", "scan")

  val LANGS = Array("en", "de", "es", "fr", "zh")

  def urlOf(site: Long, n: Long): String = s"https://site-$site.example/p/$n"

  /** Pure per-page generator — everything derives from (id, seed). */
  def makePage(id: Long, nPages: Long, nSites: Int, seed: Long): Page = {
    val rnd = new scala.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
    val site = id % nSites
    val url = urlOf(site, id / nSites)
    val nWords = 20 + rnd.nextInt(60)
    val text = Seq.fill(nWords)(WORDS(rnd.nextInt(WORDS.length))).mkString(" ")
    val nLinks = 2 + rnd.nextInt(10)
    val targets = Seq.fill(nLinks) {
      val u = rnd.nextDouble()
      val t = math.min(nPages - 1, (u * u * id.toDouble).toLong) // hub skew
      urlOf(t % nSites, t / nSites)
    }.distinct.filterNot(_ == url)
    val anchors = targets.zipWithIndex
      .map { case (t, i) => s"""<a href="$t">link$i</a>""" }.mkString("\n")
    val html =
      s"""<html><head><title>page $id</title></head>
         |<body><p>$text</p>
         |$anchors
         |</body></html>""".stripMargin.getBytes(UTF_8)
    val ts = new java.sql.Timestamp(1600000000000L + (id % 86400) * 1000L)
    Page(url, ts, html, text, LANGS((site % LANGS.length).toInt))
  }

  def synthetic(spark: SparkSession, nPages: Long, nSites: Int = 50,
                seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    spark.range(nPages).as[Long].map(id => makePage(id, nPages, nSites, seed))
  }

  /** SQL-replicable twin of [[synthetic]]: same page/url/html/timestamp
    * shapes, but words and link targets are closed-form modular arithmetic
    * in (id) instead of Random draws, so an ANSI SQL oracle can recompute
    * both the extracted-text digests and the full link graph without
    * parsing html (CORRECTNESS p_*_sql rows). The hub skew keeps the
    * u^2-bias of [[makePage]] in exact integer math: with q uniform in
    * [0, 10^6), t = min(n-1, q*q*id / 10^12) — the same floor(u^2 * id)
    * target law, no cross-engine floating point.
    */
  def syntheticSql(spark: SparkSession, nPages: Long,
                   nSites: Int = 50): Dataset[Page] = {
    import spark.implicits._
    spark.range(nPages).as[Long].map { id =>
      val site = id % nSites
      val url = urlOf(site, id / nSites)
      val nWords = 20 + ((id * 3) % 60).toInt
      val text = (0 until nWords)
        .map(k => WORDS(((id * 7 + k * 31) % WORDS.length).toInt)).mkString(" ")
      val nLinks = 2 + ((id * 13) % 10).toInt
      val targets = (0 until nLinks).map { k =>
        val q = (id * 2654435761L + k * 40503L) % 1000000L
        val t = math.min(nPages - 1, q * q * id / 1000000000000L)
        urlOf(t % nSites, t / nSites)
      }.distinct.filterNot(_ == url)
      val anchors = targets.zipWithIndex
        .map { case (t, i) => s"""<a href="$t">link$i</a>""" }.mkString("\n")
      val html =
        s"""<html><head><title>page $id</title></head>
           |<body><p>$text</p>
           |$anchors
           |</body></html>""".stripMargin.getBytes(UTF_8)
      val ts = new java.sql.Timestamp(1600000000000L + (id % 86400) * 1000L)
      Page(url, ts, html, text, LANGS((site % LANGS.length).toInt))
    }
  }
}

/** Link extraction: pages -> edge table, plus the byte-identical text
  * invariant. Pure Scala functions (locale-independent, no regex engine
  * differences) per the input_hint's "byte-identical extracted text per
  * url" requirement.
  */
object LinkExtract {

  private val Href = """<a href="([^"]+)">""".r

  /** Deterministic href extraction from UTF-8 html bytes. */
  def hrefs(html: Array[Byte]): Seq[String] =
    Href.findAllMatchIn(new String(html, UTF_8)).map(_.group(1)).toSeq

  /** Deterministic text extraction: the contents of <p> blocks joined by a
    * single space — byte-stable for a given html.
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, UTF_8)
    val P = """<p>(.*?)</p>""".r
    P.findAllMatchIn(s).map(_.group(1)).mkString(" ")
  }

  /** pages -> (src_url, dst_url) one row per extracted anchor. */
  def linksByUrl(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => hrefs(p.html).map(h => (p.url, h)))
      .toDF("src_url", "dst_url")
  }

  /** Dense 0..N-1 vertex ids for urls: sort + zipWithIndex (one shuffle;
    * no single-partition window). Deterministic: ids follow url order.
    */
  def urlIds(urls: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    val rdd = urls.select("url").distinct()
      .sort("url").rdd.map(_.getString(0)).zipWithIndex()
    spark.createDataFrame(rdd).toDF("url", "id")
  }

  /** pages -> canonical weighted edge table over dense ids. Dangling links
    * (to urls outside the corpus) are dropped; duplicate (src,dst) anchors
    * collapse to one edge of weight 1 (the reference's dedup-last on
    * unweighted input is weight 1, /root/reference/inc/mtx.hxx:128-134).
    */
  def edges(pages: Dataset[Page]): (DataFrame, DataFrame) = {
    val links = linksByUrl(pages)
    val ids = urlIds(pages.select(col("url")).toDF())
    val e = links
      .join(ids.withColumnRenamed("url", "src_url").withColumnRenamed("id", "src"), "src_url")
      .join(ids.withColumnRenamed("url", "dst_url").withColumnRenamed("id", "dst"), "dst_url")
      .select(col("src"), col("dst"), lit(1.0).as("w"))
      .distinct()
    (e, ids)
  }

  /** Per-url SHA-256 of the text column — the committed golden for the
    * byte-identical invariant.
    */
  def textDigests(pages: Dataset[Page]): DataFrame =
    pages.select(col("url"), sha2(to_binary(col("text"), lit("utf-8")), 256).as("sha"))
}
