package graft.pages

import graft.SparkSpec
import graft.graph.EdgeTable
import org.apache.spark.sql.functions._

class PagesSpec extends SparkSpec {

  lazy val pages = Pages.synthetic(spark, 300).cache()

  test("byte-identical extracted text per url (input_hint invariant)") {
    // extractor over html reproduces the text column byte-for-byte
    val spark2 = spark
    import spark2.implicits._
    val mismatches = pages.map(p =>
      if (LinkExtract.extractText(p.html) == p.text) 0 else 1).reduce(_ + _)
    assert(mismatches === 0)
  }

  test("generation is deterministic across partitionings and runs") {
    val d1 = LinkExtract.textDigests(pages).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val d2 = LinkExtract.textDigests(Pages.synthetic(spark, 300).repartition(13))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d1 === d2)
    assert(d1.size === 300)
  }

  test("link extraction produces a hub-skewed edge table over dense ids") {
    val (edges, ids) = LinkExtract.edges(pages)
    val n = ids.count()
    assert(n === 300L)
    // dense 0..N-1
    val mm = ids.agg(min("id"), max("id"), countDistinct("id")).head
    assert(mm.getLong(0) === 0L && mm.getLong(1) === n - 1 && mm.getLong(2) === n)
    val e = edges.cache()
    assert(e.count() > 300, "expect multiple links per page")
    // no dangling: every endpoint is a known id
    assert(EdgeTable.vertices(e).filter(col("id") >= n || col("id") < 0).count() === 0L)
    // hub skew: max in-degree far above the mean
    val indeg = e.groupBy("dst").count()
    val mx = indeg.agg(max("count")).head.getLong(0)
    val avg = e.count().toDouble / n
    assert(mx > 5 * avg, s"max=$mx avg=$avg")
  }

  test("p_link_edges golden: committed SHA-256 of the 500-page degree table") {
    // the driver's p_link_edges query is rows-only (no SQL oracle over
    // engine-generated pages); this golden pins its full content instead
    val (e, _) = LinkExtract.edges(Pages.synthetic(spark, 500))
    val deg = EdgeTable.degrees(EdgeTable.symmetrize(e))
    val rows = deg.orderBy("id").collect().map(r => s"${r.getLong(0)},${r.getLong(1)}")
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(rows.mkString("\n").getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.length === 500)
    assert(h === "f3fbc44176e85f92d2f68955c49af4948dcf4aaa250c5c64a58d5c945b42cd3a")
  }

  test("north star end-to-end: pages -> link extraction -> Leiden communities, deterministic") {
    val (e, _) = LinkExtract.edges(Pages.synthetic(spark, 400))
    val edges = EdgeTable.symmetrize(EdgeTable.dedup(e)).cache()
    val r = graft.leiden.Leiden.detect(edges,
      graft.leiden.LeidenOptions(maxIterations = 8, maxPasses = 3))
    assert(r.communities > 1, s"communities=${r.communities}")
    assert(r.modularity > 0, s"q=${r.modularity}")
    assert(graft.leiden.Leiden.disconnectedCommunities(edges, r.membership) === 0L)
    // the whole pipeline is a pure function of the page fixture: re-running
    // must reproduce the membership exactly
    val r2 = graft.leiden.Leiden.detect(edges,
      graft.leiden.LeidenOptions(maxIterations = 8, maxPasses = 3))
    assert(r2.modularity === r.modularity)
    assert(r.membership.except(r2.membership).count() === 0L)
    edges.unpersist()
  }

  test("urlIds is deterministic and follows url sort order") {
    val spark2 = spark
    import spark2.implicits._
    val urls = Seq("b", "a", "c").toDF("url")
    val ids = LinkExtract.urlIds(urls).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }
}
