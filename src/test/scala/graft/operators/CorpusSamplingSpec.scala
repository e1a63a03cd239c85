package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the corpus-shaping operators added for the LLM-pipeline surface:
  * duplicate-span removal ([[TextOps.spanDedup]]), the unigram LM score
  * ([[TextOps.unigramLmScore]]), and temperature-scaled mixture sampling
  * ([[TextOps.temperatureMix]]) — planted inputs with hand-computable
  * outputs, including the boundary each rule turns on. */
class CorpusSamplingSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ spanDedup

  test("spanDedup drops exactly the cross-doc segments and rehashes kept text in order") {
    // segLen=2: doc 1 = [shared legal | unique one], doc 2 = [shared legal |
    // other words], doc 3 fully unique -> the 'shared legal' segment (and
    // only it) appears in 2 distinct docs
    val docs = Seq(
      (1L, "shared legal unique one"),
      (2L, "shared legal other words"),
      (3L, "totally different text here")).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", segLen = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    val m = (s: String) => md5(lit(s).cast("binary"))
    val exp = Seq("unique one", "other words", "totally different text here")
      .map(s => spark.range(1).select(m(s)).as[String].head())
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
    assert(out(0)._4 === exp(0) && out(1)._4 === exp(1))
    // doc 3 keeps both segments -> md5 of the full rejoined text
    assert(out(2)._4 === exp(2))
  }

  test("spanDedup: a doc repeating a segment internally does not self-trigger, and a fully-shared doc hashes empty") {
    val docs = Seq(
      (1L, "a b a b"), // same segment twice WITHIN one doc: doc_freq = 1
      (2L, "c d c d"),
      (3L, "c d x y")).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", segLen = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0)._3 === 0L) // internal repetition alone never drops
    // docs 2 and 3 share 'c d' -> doc 2 drops both copies, keeps nothing
    assert(out(1)._3 === 2L)
    val emptyMd5 = spark.range(1).select(md5(lit("").cast("binary"))).as[String].head()
    assert(out(1)._4 === emptyMd5)
    assert(out(2)._3 === 1L)
  }

  test("spanDedup covers the ragged tail segment") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", segLen = 2, minDocs = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out._2 === 2L) // [a b] + the 1-token tail [c]
  }

  test("spanDedup keeps a null-text doc (as one empty segment) instead of dropping the row") {
    // the keep-the-row contract gopherRules already follows: null text
    // coalesces to '' -> the doc appears with its single empty segment
    val docs = Seq((1L, "c d x"), (2L, "c d y"), (3L, null))
      .toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", segLen = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L), "null-text doc must survive")
    val emptySegMd5 = spark.range(1).select(md5(lit("").cast("binary"))).as[String].head()
    assert(out(2)._2 === 1L && out(2)._3 === 0L && out(2)._4 === emptySegMd5)
  }

  test("bigramLmScore: hand-computed add-one bigram probabilities; short docs keep rows") {
    // doc 1 "x y x y": bigrams (x,y)x2, (y,x)x1; unigrams x:2 y:2 z:1 -> V=3
    // p(y|x) = (2+1)/(2+3), p(x|y) = (1+1)/(2+3)
    // score = (2*r(ln p(y|x)) + 1*r(ln p(x|y))) / 3; doc 2 has no bigrams
    // doc 3 has NULL text: its row survives as (0, 0.0) AND it contributes
    // NOTHING to the unigram/vocab statistics (V stays 3) — coalescing it
    // to '' would inject an '' token and shift every score
    val docs = Seq((1L, "x y x y"), (2L, "z"), (3L, null))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val py = r4(math.log(3.0 / (2 + 3)))
    val px = r4(math.log(2.0 / (2 + 3)))
    val exp = r4((2 * py + px) / 3)
    assert(out(0) === ((1L, 3L, exp)))
    assert(out(1) === ((2L, 0L, 0.0)))
    assert(out(2) === ((3L, 0L, 0.0)))
  }

  // ------------------------------------------------------- unigramLmScore

  test("unigramLmScore: hand-computed add-one probabilities") {
    // corpus: "x x y" + "y" -> N=4 tokens, V=2 vocab, denom = 6
    // p(x) = (2+1)/6 = .5, p(y) = (2+1)/6 = .5 -> every doc scores ln(.5)
    val docs = Seq((1L, "x x y"), (2L, "y")).toDF("doc_id", "text")
    val out = TextOps.unigramLmScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    val lnHalf = math.floor(math.log(0.5) * 10000 + 0.5) / 10000
    assert(out === Array((1L, 3L, lnHalf), (2L, 1L, lnHalf)))
  }

  test("unigramLmScore ranks rare-token docs below common-token docs") {
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "qzx wvu jkl mno")).toDF("doc_id", "text")
    val out = TextOps.unigramLmScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(out(0)._3 > out(1)._3)
  }

  test("spanDedup equals a naive reference on random small-vocab corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = (1L to 40L).map(id =>
      (id, Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val segLen = 2
    val segsOf = (t: String) =>
      t.split(" ").grouped(segLen).map(_.mkString(" ")).toSeq
    val freq = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    val expected = docs.map { case (id, t) =>
      val ss = segsOf(t)
      (id, ss.size.toLong, ss.count(freq(_) >= 2).toLong,
        md5hex(ss.filter(freq(_) < 2).mkString(" ")))
    }.toSet
    val got = TextOps.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
      segLen = segLen, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === expected)
  }

  test("unigramLmScore equals a naive reference on a random corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "w", "v")
    val docs = (1L to 30L).map(id =>
      (id, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val all = docs.flatMap(_._2.split(" "))
    val n = all.size
    val counts = all.groupBy(identity).view.mapValues(_.size).toMap
    val denom = (n + counts.size).toDouble
    def lp(t: String) = math.floor(math.log((counts(t) + 1) / denom) * 10000 + 0.5) / 10000
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ").toSeq
      // BigDecimal accumulation mirrors the operator's exact decimal sum
      val s = toks.map(tok => BigDecimal(lp(tok))).sum
      (id, toks.size.toLong,
        math.floor(s.toDouble / toks.size * 10000 + 0.5) / 10000)
    }.toSet
    val got = TextOps.unigramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
  }

  test("bigramLmScore equals a naive reference on a random corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("x", "y", "z", "w", "v")
    val docs = (1L to 30L).map(id =>
      (id, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val allToks = docs.flatMap(_._2.split(" "))
    val uni = allToks.groupBy(identity).view.mapValues(_.size).toMap
    val vSize = uni.size
    val allBigrams = docs.flatMap(_._2.split(" ").toSeq.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq)
    val bc = allBigrams.groupBy(identity).view.mapValues(_.size).toMap
    def lp(b: (String, String)) = math.floor(
      math.log((bc(b) + 1).toDouble / (uni(b._1) + vSize)) * 10000 + 0.5) / 10000
    val expected = docs.map { case (id, t) =>
      val bgs = t.split(" ").toSeq.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
      if (bgs.isEmpty) (id, 0L, 0.0)
      else {
        val s = bgs.map(b => BigDecimal(lp(b))).sum
        (id, bgs.size.toLong,
          math.floor(s.toDouble / bgs.size * 10000 + 0.5) / 10000)
      }
    }.toSet
    val got = TextOps.bigramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------- temperatureMix

  test("temperatureMix rates follow sqrt weights and membership is the stable hash") {
    // 90/10 split: raw shares .9/.1 -> sqrt weights ~ .7298/.2702 of rate
    // space. The minority stratum's rate must EXCEED its 10% share * 100.
    val docs = (0 until 90).map(i => (i.toLong, "big")) ++
      (100 until 110).map(i => (i.toLong, "small"))
    val df = docs.toDF("doc_id", "lang")
    val rates = TextOps.temperatureMix(df, "doc_id", "lang")
      .select($"lang", $"rate").distinct()
      .as[(String, Long)].collect().toMap
    // sw(90)=9.4868, sw(10)=3.1623, tot=12.6491
    assert(rates("small") === math.floor(3.1623 / 12.6491 * 10000).toLong)
    assert(rates("big") === math.floor(9.4868 / 12.6491 * 10000).toLong)
    assert(rates("small") > 1000L) // up-weighted vs the 10% corpus share
    // kept set = exactly the docs whose stable hash clears the stratum rate
    val kept = TextOps.temperatureMix(df, "doc_id", "lang")
      .select($"doc_id").as[Long].collect().toSet
    val hashOf = df.select($"doc_id",
      conv(substring(md5($"doc_id".cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 10000)
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, lang) =>
      assert(kept.contains(id) === (hashOf(id) < rates(lang)))
    }
  }

  test("temperatureMix halved-rate subset property holds per stratum") {
    // hash membership (not RNG) -> any lower rate keeps a subset
    val df = (0 until 200).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    val h = conv(substring(md5($"doc_id".cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 10000
    val at = (r: Int) => df.filter(h < r).select($"doc_id").as[Long].collect().toSet
    assert(at(5000).subsetOf(at(10000)) && at(2500).subsetOf(at(5000)))
  }
}
