package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  def docsDF = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the hat"),
      (2L, "completely different words entirely here"),
      (3L, "the cat sat on the mat"), // exact dup of 0
      (4L, "le chat est sur le tapis et la table les chaises"))
      .toDF("doc_id", "text")
  }

  test("token stats are exact") {
    val q = TextOps.quality(docsDF).collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // doc 0: 22 chars, 6 tokens, stopword hits {the, the} -> 2
    assert(q(0L) === ((22, 6, 2)))
  }

  test("exact dedup keeps smallest doc_id per text") {
    val kept = TextOps.dedupExact(docsDF).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 2L, 4L))
    val groups = TextOps.exactDupGroups(docsDF).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups(0L) === 2L)
  }

  test("shingles: k=3 over 6 tokens yields 4 shingles") {
    val sh = docsDF.filter(col("doc_id") === 0)
      .select(TextOps.shingles(col("text"), 3).as("s")).head.getSeq[String](0)
    assert(sh.toSet === Set("the cat sat", "cat sat on", "sat on the", "on the mat"))
  }

  test("ngram overlap: near-dup pair shares 3 of 5 shingles") {
    val o = TextOps.ngramOverlap(docsDF, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // doc0 vs doc1 differ in last word: shingles {the cat sat, cat sat on, sat on the} shared
    assert(o((0L, 1L)) === ((3L, 5L)))
    assert(o((0L, 3L)) === ((4L, 4L))) // identical docs
  }

  test("shingles: docs shorter than k tokens have NO shingles (oracle parity)") {
    val spark2 = spark
    import spark2.implicits._
    val short = Seq((0L, "two words"), (1L, "two words"), (2L, "one two three")).toDF("doc_id", "text")
    val sh = short.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(0L).isEmpty && sh(1L).isEmpty)
    assert(sh(2L) === Seq("one two three"))
    // sub-k docs never pair — neither via ngram overlap nor via minhash LSH
    assert(TextOps.ngramOverlap(short, 3).count() === 0L)
    assert(NearDup.minHashLshPairs(short, k = 3, threshold = 0.0).count() === 0L)
  }

  test("ngram df-cap bounds boilerplate posting lists (logged, not silent)") {
    val spark2 = spark
    import spark2.implicits._
    // 20 docs all sharing the planted boilerplate shingle "all rights reserved";
    // each doc otherwise unique. Uncapped: the boilerplate alone creates
    // C(20,2)=190 candidate pairs.
    val docs = (0 until 20).map(i =>
      (i.toLong, s"all rights reserved unique$i text$i body$i")).toDF("doc_id", "text")
    val uncapped = TextOps.ngramOverlap(docs, 3)
    assert(uncapped.count() === 190L)
    // df-cap 10 drops the boilerplate shingles (df=20 > 10); no doc pair
    // shares any other shingle, so the candidate set collapses to zero
    val capped = TextOps.ngramOverlap(docs, 3, dfCap = 10)
    assert(capped.count() === 0L)
    val dropped = TextOps.droppedShingles(docs, 3, dfCap = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped.nonEmpty && dropped.values.forall(_ === 20L))
    assert(dropped.contains("all rights reserved"))
  }

  test("simhash bucket cap bounds giant chunk buckets (logged, not silent)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (0 until 12).map(i => (i.toLong, "same boilerplate text everywhere"))
      .toDF("doc_id", "text")
    // identical docs: every chunk bucket has size 12 -> C(12,2)=66 pairs
    assert(NearDup.simHashPairs(docs, maxHamming = 3).count() === 66L)
    assert(NearDup.simHashPairs(docs, maxHamming = 3, bucketCap = 5).count() === 0L)
    assert(NearDup.oversizedBuckets(docs, bucketCap = 5).count() === 4L)
  }

  test("fingerprint: equal texts equal, different texts differ, stable across partitionings") {
    val fp = docsDF.repartition(7).select(col("doc_id"), TextOps.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === fp(3L))
    assert(fp(0L) !== fp(1L))
    val fp2 = docsDF.coalesce(1).select(col("doc_id"), TextOps.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp === fp2)
  }

  test("langId: french stopwords detected; no markers -> und") {
    val lang = docsDF.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(4L) === "fr")
    assert(lang(2L) === "und")
    assert(lang(0L) === "en")
  }

  test("minhash LSH finds the planted near-dup pair and the exact dup") {
    val pairs = NearDup.minHashLshPairs(docsDF, k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), s"pairs=$pairs") // jaccard 1.0
    // (0,1) jaccard = 3/7 < 0.5 -> excluded even if bucketed together
    assert(!pairs.contains((0L, 2L)))
  }

  test("md5-minhash LSH pipeline: planted pairs found with exact integer jaccard") {
    // thresholdNum/Den = 2/3 (jaccard >= 0.667): (0,3) identical (4/4)
    // passes; (0,1) shares 3 of 5 shingles (0.6 < 2/3) -> excluded even
    // when bucketed together
    val pairs = NearDup.minHashLshPairsMd5(docsDF, thresholdNum = 2, thresholdDen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) === ((4L, 4L)), s"pairs=$pairs")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((0L, 1L)))
    // md5 signature is stable across partitionings (cross-engine contract)
    val sig1 = docsDF.repartition(7)
      .select(col("doc_id"), NearDup.minHashMd5(TextOps.shingles(col("text"), 3), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sig2 = docsDF.coalesce(1)
      .select(col("doc_id"), NearDup.minHashMd5(TextOps.shingles(col("text"), 3), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig1 === sig2)
    assert(sig1(0L) === sig1(3L))
    assert(sig1(0L) !== sig1(2L))
    // every hash is the 52-bit md5 prefix: bounded below 2^52
    assert(sig1.values.flatten.forall(h => h >= 0 && h < (1L << 52)))
  }

  test("simhash: identical texts distance 0, near texts close, far texts far") {
    val sig = docsDF.select(col("doc_id"), NearDup.simHash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) === sig(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(1L)) < ham(sig(0L), sig(2L)),
      s"near=${ham(sig(0L), sig(1L))} far=${ham(sig(0L), sig(2L))}")
  }

  test("md5-simhash pipeline: exact dup at hamming 0, 48-bit signatures stable") {
    // (0,3) are identical texts -> hamming 0, always pigeonholed together
    val pairs = NearDup.simHashPairsMd5(docsDF, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 3L)) === 0L, s"pairs=$pairs")
    assert(!pairs.contains((0L, 2L)))
    // signature is a pure function of the text: stable across partitionings
    // (the cross-engine contract) and bounded to 48 bits
    val s1 = docsDF.repartition(7)
      .select(col("doc_id"), NearDup.simHashMd5(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = docsDF.coalesce(1)
      .select(col("doc_id"), NearDup.simHashMd5(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    assert(s1(0L) === s1(3L))
    assert(s1.values.forall(s => s >= 0 && s < (1L << 48)))
    // 48-bit hand check on a one-token doc: signature == the token's own
    // md5-derived hash (every vote is +1 exactly where the hash bit is set)
    val spark2 = spark
    import spark2.implicits._
    val one = Seq((9L, "cat")).toDF("doc_id", "text")
    val hs = one.select(
        NearDup.simHashMd5(col("text")).as("s"),
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long").as("h"))
      .head()
    assert(hs.getLong(0) === hs.getLong(1))
  }
}
