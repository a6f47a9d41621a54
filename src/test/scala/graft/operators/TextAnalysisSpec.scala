package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on a mat", 20L),
    (2L, "zzz qqq xxx", 11L),
    (3L, "the the the the the the the the the the", 39L)
  ).toDF("doc_id", "text", "n_chars")

  test("token counts: whitespace and regex") {
    val m = docs.select(col("doc_id"), TextAnalysis.wsTokenCount(col("text")),
      TextAnalysis.regexTokenCount(col("text"))).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m(1L) == ((6, 6)) && m(2L) == ((3, 3)) && m(3L) == ((10, 10)))
  }

  test("stopwordRatio is an exact integer ratio") {
    val m = docs.select(col("doc_id"), TextAnalysis.stopwordRatio("text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 2.0 / 6 && m(2L) == 0.0 && m(3L) == 1.0)
  }

  test("qualityScore stays in [0,1] and rewards the richer doc") {
    val m = docs.select(col("doc_id"),
        TextAnalysis.qualityScore("text", "n_chars").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m(1L) > m(2L))
  }

  test("scrubPii redacts emails and phones; counts audit the redactions") {
    val d = Seq(
      (1L, "reach me at jo.doe+x@mail.example.org or 415-555-0199 thanks"),
      (2L, "no pii here at all"),
      (3L, "two phones 111-222-3333 and 444-555-6666")
    ).toDF("id", "text")
    val (ne, np) = TextAnalysis.piiCounts(col("text"))
    val out = d.select(col("id"), TextAnalysis.scrubPii(col("text")).as("s"),
        ne.as("ne"), np.as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L)._1 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L) == (("no pii here at all", 0, 0)))
    assert(out(3L)._1 == "two phones <PHONE> and <PHONE>" && out(3L)._3 == 2)
  }

  test("repetitionRatio: 0 for all-distinct bigrams, high for looping text") {
    val d = Seq(
      (1L, "a b c d e"),                  // 4 bigrams, all distinct -> 0
      (2L, "x y x y x y x y"),            // 7 bigrams, 2 distinct -> 5/7
      (3L, "solo")                        // single token -> one 1-gram -> 0
    ).toDF("id", "text")
    val m = d.select(col("id"), TextAnalysis.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 0.0 && m(3L) == 0.0)
    assert(m(2L) == math.floor((1.0 - 2.0 / 7) * 10000 + 0.5) / 10000)
  }

  test("languageId flags stopword-bearing docs as en") {
    val m = docs.select(col("doc_id"), TextAnalysis.languageId("text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "en" && m(2L) == "und" && m(3L) == "en")
  }

  test("fingerprints: 16-hex content + shingle hashes, dups collide") {
    val d2 = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(d2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L)._1 != fps(3L)._1)
    assert(fps(1L)._2 == fps(3L)._2) // same leading 3-token shingle "a b c"
    assert(fps.values.forall(p => p._1.length == 16 && p._2.length == 16))
  }

  test("tfIdfTopTerms: corpus-unique terms outrank ubiquitous ones") {
    val d = Seq(
      (1L, "common rare rare rare"),
      (2L, "common filler words"),
      (3L, "common more filler")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(d, "doc_id", "text", 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 'common' is in every doc: idf = ln(1) = 0 -> score 0
    assert(top("common") == 0.0)
    // 'rare': tf 3, df 1 -> 3·ln(3) ≈ 3.2958, the top term
    assert(math.abs(top("rare") - 3.2958) < 1e-9)
    assert(top.values.max == top("rare"))
  }

  test("chunks: covering overlapped windows, short tail, degenerate text") {
    val d = Seq((1L, "abcdefghij")).toDF("id", "text") // 10 chars
    val c = d.select(TextAnalysis.chunks(col("text"), 4, 3).as("c"))
      .collect().head.getSeq[String](0)
    // starts 1,4,7,10 -> every char covered, 1-char overlap, short tail
    assert(c == Seq("abcd", "defg", "ghij", "j"))
    val empty = Seq((1L, "")).toDF("id", "text")
      .select(TextAnalysis.chunks(col("text"), 4, 3).as("c"))
      .collect().head.getSeq[String](0)
    assert(empty == Seq("")) // empty text yields one empty chunk, not zero rows
    assertThrows[IllegalArgumentException] {
      TextAnalysis.chunks(col("text"), 2, 3) // gap between chunks
    }
  }

  test("bm25Scores: rare-term doc outranks common-term doc; matches hand calc") {
    val docs = Seq(
      (1L, "rare word here"),        // has the rare query term
      (2L, "common common word uh"), // has only the common query term
      (3L, "word uh huh"),           // no query terms at all
      (4L, "common word here uh")
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.bm25Scores(docs, "doc_id", "text",
        Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // idf(rare: df=1) >> idf(common: df=2) over N=4 -> doc 1 wins
    assert(scored(1L) > scored(2L) && scored(2L) > scored(4L),
      scored.toString) // doc 2 has tf=2 of 'common', doc 4 tf=1
    assert(scored(3L) == 0.0, scored.toString)
    // hand-check doc 1: N=4, df=1, tf=1, dl=3, avgdl=(3+4+3+4)/4=3.5
    val idf = math.log(1 + (4 - 1 + 0.5) / 1.5)
    val expected = idf * (1 * (1.2 + 1)) / (1 + 1.2 * (0.25 + 0.75 * 3 / 3.5))
    assert(scored(1L) == math.floor(expected * 10000 + 0.5) / 10000.0,
      s"${scored(1L)} vs $expected")
  }

  test("keywords: rare terms outrank ubiquitous ones per document") {
    // 'the' appears in all 4 docs (idf = ln(1) = 0); each doc also has a
    // private term — that term must rank first with score tf * ln(4)
    val docs = Seq(
      (1L, "the the alpha"), (2L, "the beta beta"),
      (3L, "the gamma"), (4L, "the delta")).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, "doc_id", "text", 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)))
      .toMap
    val ln4 = BigDecimal(math.log(4.0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val twoLn4 = BigDecimal(2 * math.log(4.0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L).head === ("alpha", ln4))
    assert(got(2L).head === ("beta", twoLn4))
    // second keyword is 'the' at score 0.0 everywhere it fits
    assert(got(3L) === Seq(("gamma", ln4), ("the", 0.0)))
    // ranks never exceed k and every doc appears
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_.size <= 2))
  }

  test("cdcChunkRows: chunks tile the text and boundaries are edit-local") {
    // deterministic pseudo-random text long enough for several boundaries
    // (java.util.Random LCG is seed-stable across JVMs)
    def syn(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val base = syn(3, 800)
    val docs = Seq((1L, base, 0L), (2L, base + "XYZ", 0L), (3L, "", 0L),
      (4L, "tiny", 0L)).toDF("doc_id", "text", "n_chars")
    val rows = TextAnalysis.cdcChunkRows(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = rows.groupBy(_._1)
    // chunks tile: lengths sum to the doc length, indices dense from 0
    assert(byDoc(1L).map(_._4).sum == 800)
    assert(byDoc(1L).map(_._2).sorted.toSeq == byDoc(1L).indices.toSeq)
    assert(byDoc(1L).size > 2, s"expected several chunks, got ${byDoc(1L).size}")
    // empty text -> no chunks; short text -> one whole-text chunk
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).map(r => (r._2, r._4)).toSeq == Seq((0, 4)))
    // edit locality: appending to doc 1 leaves every chunk except the
    // last with an identical fingerprint (boundaries are local decisions)
    val h1 = byDoc(1L).sortBy(_._2).map(_._3)
    val h2 = byDoc(2L).sortBy(_._2).map(_._3)
    assert(h1.init.toSeq == h2.take(h1.size - 1).toSeq)
  }

  test("bpeTrain learns merges whose second round sees the first round's symbol") {
    // corpus: "abc" x3, "abd" x2 -> round 1 argmax is (a,b) with c=5;
    // round 2 pairs are then (ab,c) x3 vs (ab,d) x2 -> (ab,c)
    val d = Seq((1L, "abc abc abc abd abd", 19L)).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.bpeTrain(d, "text", iters = 2)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 5L), (2, "ab", "c", 3L)))
  }

  test("bpeSegment applies merges in rank order, one replace-all pass each") {
    val d = Seq((1L, "lower win", 9L)).toDF("doc_id", "text", "n_chars")
    val segs = d.select(TextAnalysis.bpeSegment("text",
      Seq(("e", "r"), ("i", "n"), ("o", "w"))).as("s"))
      .head.getSeq[String](0)
    // lower: l o w e r -> er binds, then ow -> "l ow er"; win: w i n -> "w in"
    assert(segs == Seq("l ow er", "w in"))
    val (nc, nb) = TextAnalysis.bpeTokenCounts("text",
      Seq(("e", "r"), ("i", "n"), ("o", "w")))
    val r = d.select(nc, nb).head
    assert(r.getInt(0) == 8 && r.getInt(1) == 5) // 8 chars -> 3+2 tokens
    // merge ordering matters: (w,e) before (e,r) consumes the e first
    val alt = d.select(TextAnalysis.bpeSegment("text",
      Seq(("w", "e"), ("e", "r"))).as("s")).head.getSeq[String](0)
    assert(alt.head == "l o we r")
  }

  test("bpeMergeCandidates counts adjacent char pairs, skipping 1-char tokens") {
    val d = Seq((1L, "aab ab x aab", 12L)).toDF("doc_id", "text", "n_chars")
    // aab -> aa, ab; ab -> ab; x skipped; aab -> aa, ab  => ab:3, aa:2
    val got = TextAnalysis.bpeMergeCandidates(d, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("ab", 3L), ("aa", 2L)))
  }

  test("classifierScore reproduces the sigmoid of hand-computed features") {
    // doc 1: "the cat sat on a mat" -> nw=6, charsum=15, mwl=2.5,
    // stop=2/6, uniq=1.0
    val z = -2.0 + 0.6 * math.log(6) - 0.4 * 2.5 + 8.0 * (2.0 / 6) + 1.5 * 1.0
    val want = math.floor(1.0 / (1.0 + math.exp(-z)) * 10000 + 0.5) / 10000
    val got = docs.filter(col("doc_id") === 1L)
      .select(TextAnalysis.classifierScore("text", -2.0, 0.6, -0.4, 8.0, 1.5))
      .head.getDouble(0)
    assert(got == want)
    // scores are monotone in stopword weight on an all-stopword doc
    val lo = docs.filter(col("doc_id") === 3L)
      .select(TextAnalysis.classifierScore("text", -2.0, 0.6, -0.4, 0.0, 1.5))
      .head.getDouble(0)
    val hi = docs.filter(col("doc_id") === 3L)
      .select(TextAnalysis.classifierScore("text", -2.0, 0.6, -0.4, 8.0, 1.5))
      .head.getDouble(0)
    assert(lo < hi && hi > 0.99) // stop ratio 1.0 with w=8 saturates
  }

  test("tokenEntropy: 0 for one repeated token, ln(n) for all-distinct") {
    val d = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (4L, 0.0))
    assert(got(2L) == (4L, math.floor(math.log(4) * 1e4) / 1e4))
    // H = ln(4) - (2·ln2 + 2·ln2)/4 = ln 2, through the quantized terms
    val t2 = math.floor(2 * math.log(2) * 1e6)
    val want3 = math.floor((math.log(4) - 2 * t2 / 1e6 / 4) * 1e4) / 1e4
    assert(got(3L)._2 == want3)
    assert(math.abs(got(3L)._2 - math.log(2)) < 1e-3)
  }

  test("cooccurPmi: always-together pair gets PMI ln(N/df), independents 0") {
    // a,b co-occur in every one of their 2 docs (never apart); c appears
    // everywhere, so (a,c) attachment is pure chance: PMI = 0.
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c d"), (4L, "c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.cooccurPmi(d, "doc_id", "text", topM = 10,
        minPairs = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // n_ab = 2, n_a = n_b = 2, N = 4 → PMI = ln(2·4/(2·2)) = ln 2
    assert(got(("a", "b")) ==
      ((2L, BigDecimal(math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // n_ac = 2, n_a = 2, n_c = 4 → ln(2·4/(2·4)) = 0
    assert(got(("a", "c")) == ((2L, 0.0)))
    // d never meets a: pair absent (no zero-count rows materialize)
    assert(!got.contains(("a", "d")))
  }

  test("cooccurPmi caps the pair domain at topM tokens") {
    val d = Seq((1L, "a a b z"), (2L, "a b z"), (3L, "a b"))
      .toDF("doc_id", "text")
    // topM = 2 keeps {a, b} (df 3 each); z (df 2) never enters pairs
    val pairs = TextAnalysis.cooccurPmi(d, "doc_id", "text", topM = 2,
        minPairs = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet == Set(("a", "b")))
  }
}
