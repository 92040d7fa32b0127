package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("stupid-backoff trigram LM: hits score c3/ch3, misses cascade " +
      "through 0.4-damped bigram/unigram levels") {
    // train "a b c a b c": c3(a,b,c)=2 of ch3(a,b)=2 → S=1, nll=0;
    // probe trigram (b,c,d): unseen trigram, unseen bigram (c,d),
    // unseen word d → S = 0.4·0.4·(0+1)/(N=6 + V=3), nll≈4.029806
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val probe = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val got = TextStats.backoffTrigramScore(train, probe, "doc_id", "text")
      .select("doc_id", "n_trigrams", "n_tri_hits", "n_backoffs",
        "sum_nll_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 2L, 1L, 1L, 0L + 4029806L)), s"got $got")
    // mid-cascade stop: probe (d, a, b) — trigram (d,a,b) unseen but
    // bigram (a,b) seen with c2(a,b)=2 of ch2(a)=2 → S = 0.4·1, one
    // backoff, nll = -ln(0.4) ≈ 0.916291
    val probe2 = Seq((20L, "d a b")).toDF("doc_id", "text")
    val got2 = TextStats.backoffTrigramScore(train, probe2, "doc_id", "text")
      .select("n_tri_hits", "n_backoffs", "sum_nll_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got2 == Seq((0L, 1L, 916291L)), s"got $got2")
  }

  test("language-ID heuristic picks the marker-heavy language") {
    assert(one(TextStats.languageIdHeuristic($"text"),
      "the cat and the dog is here") == "en")
    assert(one(TextStats.languageIdHeuristic($"text"),
      "der hund und die katze ist da") == "de")
    assert(one(TextStats.languageIdHeuristic($"text"),
      "xyzzy plugh quux") == "und")
  }

  test("language-ID tie-break: equal scores fall to the larger tag") {
    // "la" scores 1 for both es and fr; the struct comparison breaks
    // the tie toward the lexicographically larger tag ("fr") — the
    // DuckDB oracle's padded-string greatest replicates exactly this.
    assert(one(TextStats.languageIdHeuristic($"text"), "la") == "fr")
    // "de" is an es marker only (not fr): no tie.
    assert(one(TextStats.languageIdHeuristic($"text"), "de") == "es")
  }

  test("BPE-ish token count splits letter runs, digit runs, and symbols") {
    assert(one(TextStats.bpeishTokenCount($"text"), "abc 123 x!y") == 5)
    assert(one(TextStats.bpeishTokenCount($"text"), "hello") == 1)
  }

  test("stopword ratio and quality score are bounded and sane") {
    val r = one(TextStats.stopwordRatio($"text"),
      "the a of and to junk").asInstanceOf[Double]
    assert(math.abs(r - 5.0 / 6.0) < 1e-9)
    val q = one(TextStats.qualityScore($"text"),
      "a perfectly reasonable document with the usual words in it and more")
      .asInstanceOf[Double]
    assert(q >= 0.0 && q <= 1.0)
  }

  test("fingerprint is stable and text-sensitive") {
    val fp1 = one(TextStats.fingerprint($"text"), "alpha beta gamma delta")
    val fp2 = one(TextStats.fingerprint($"text"), "alpha beta gamma delta")
    val fp3 = one(TextStats.fingerprint($"text"), "totally other words here")
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }

  test("tfidfTopTerms ranks discriminative terms first") {
    // N=2; 'a' in both docs → idf 0; 'b'/'c' unique → idf ln 2.
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextStats.tfidfTopTerms(docs, "doc_id", "text", 3)
      .as[(Long, Int, String, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, 1, "b", math.rint(math.log(2.0) / 3 * 1e6) / 1e6),
      (1L, 2, "a", 0.0),
      (2L, 1, "c", math.rint(math.log(2.0) / 2 * 1e6) / 1e6),
      (2L, 2, "a", 0.0)), s"got $rows")
  }

  test("bm25TopK matches the closed-form score and zero-fills non-matches") {
    val docs = Seq((1L, "the the cat"), (2L, "the dog"), (3L, "fish swim"))
      .toDF("doc_id", "text")
    val got = TextStats.bm25TopK(docs, "doc_id", "text", Seq("the"), k = 3)
      .as[(Long, Double)].collect().toSeq
    // N=3, df=2, idf=ln(1+1.5/2.5), avgdl=7/3
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    val avgdl = 7.0 / 3
    def s(tf: Double, dl: Double) =
      idf * tf * (1.2 + 1) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Seq((1L, r6(s(2, 3))), (2L, r6(s(1, 2))), (3L, 0.0)),
      s"got $got")
  }

  test("vocabOovCoverage: top-N by freq with deterministic tie-break") {
    // freqs: a=3, b=2, c=1, d=1 → vocab(3) = {a, b, c} (c beats d on the
    // token tie-break); the only OOV occurrence is s2's 'd'.
    val docs = Seq(("s1", "a a b"), ("s2", "a b c d")).toDF("source", "text")
    val got = TextStats.vocabOovCoverage(docs, "text", "source", 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 3L, 0L, 0.0), ("s2", 4L, 1L, 0.25)), s"got $got")
  }

  test("pmiCollocations matches the closed-form score and min-count gate") {
    // unigrams: x=2 y=2 z=2 w=1, n1=7; bigrams: (x,y)=2 (y,z)=1 (z,w)=1, n2=4.
    val docs = Seq((1L, "x y"), (2L, "x y z"), (3L, "z w")).toDF("doc_id", "text")
    def pmi(c12: Double, c1: Double, c2: Double) =
      math.rint(math.log(c12 * 7.0 * 7.0 / (4.0 * c1 * c2)) * 1e6) / 1e6
    val all = TextStats.pmiCollocations(docs, "text", minCount = 1, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(all == Seq(
      ("x", "y", 2L, pmi(2, 2, 2)),   // ln(98/16) = ln(6.125) — tied, w1 breaks
      ("z", "w", 1L, pmi(1, 2, 1)),   // ln(49/8)  = ln(6.125)
      ("y", "z", 1L, pmi(1, 2, 2))),  // ln(49/16) ≈ 1.119232
      s"got $all")
    // the min-count filter prunes singleton bigrams BEFORE the joins
    val freq = TextStats.pmiCollocations(docs, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(freq == Seq(("x", "y", 2L, pmi(2, 2, 2))), s"got $freq")
  }

  test("unigramLmPieces reproduces the hand-computed hard-EM steps") {
    // Corpus: one doc "ab ab b" → word counts ab:2, b:1.
    // Seed: chars a (occurrences 2), b (2 in 'ab' + 1 in 'b' = 3),
    //   multi 'ab' (2). total = 7; p = a 2/7, b 3/7, ab 2/7.
    // E-step 1: 'ab' best seg [ab] (2/7 ≈ .286 beats [a b] 6/49 ≈
    //   .122); 'b' → [b]. Counts: ab 2, b 1, a 0.
    // M-step 1: chars persist (a 0, b 1), multi ab 2. total = 3.
    //   p1 = a 0, b 1/3, ab 2/3.
    // E-step 2: 'ab' → [ab] (2/3 beats 0·[a b]); 'b' → [b] — a fixed
    //   point. Final: a 0, ab 2, b 1; ppm over total 3:
    //   a 0, ab 666666, b 333333.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val pieces = TextStats.unigramLmPieces(docs, "text")
    assert(pieces == Seq(("a", 0L), ("ab", 2L), ("b", 1L)),
      s"EM fixed point differs: $pieces")
    // and the zero-prob char still lets an unseen arrangement segment:
    // 'ba' has no multi piece, must fall back to [b a] (score 0 — the
    // only candidate), not fail coverage
    val seg = Seq(("ba")).toDF("w")
      .select(graft.functions.UnigramSeg.unigramSeg(col("w"),
        Seq(("a", 0.0), ("ab", 2.0 / 3), ("b", 1.0 / 3))).as("s"))
      .as[Seq[String]].head()
    assert(seg == Seq("b", "a"), s"got $seg")
  }

  test("unigramSeg tie-breaks on (score, n_pieces, lexicographic seg) " +
      "exactly — the oracle's total order") {
    // pieces 'aa' and 'a' with p(aa) = p(a)² would tie scores for
    // 'aaa' between [a aa] and [aa a] (commutative product, 2 pieces
    // each) — the lexicographically smaller joined seg must win.
    val p = Seq(("a", 0.25), ("aa", 0.0625))
    val seg = Seq(("aaa")).toDF("w")
      .select(graft.functions.UnigramSeg.unigramSeg(col("w"), p).as("s"))
      .as[Seq[String]].head()
    // candidates: [a a a] 0.015625 (3 pieces), [a aa] = [aa a] =
    // 0.015625 (2 pieces) — fewer pieces wins, then 'a aa' < 'aa a'
    assert(seg == Seq("a", "aa"), s"got $seg")
  }

  test("unigramEncodeRollup routes over-cap tokens to the byte " +
      "fallback instead of dropping or hanging on them") {
    // 'ab ab b' trains the fixed-point vocab {a:0, ab:2, b:1}; the
    // encode corpus adds a 30-char token (over UniMaxWord=16) whose
    // exhaustive enumeration would be 2^29 paths — it must count as
    // its 30 UTF-8 bytes, not wedge or vanish from the rollup.
    val train = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val pieces = TextStats.unigramLmPieces(train, "text")
    val long = "x" * 30
    val corpus = Seq(("en", s"ab $long b")).toDF("lang", "text")
    val got = TextStats.unigramEncodeRollup(corpus, "text", "lang",
        pieces)
      .select("lang", "n_words", "sum_tokens")
      .as[(String, Long, Long)].collect().toSeq
    // ab → [ab] (1 token), long → 30 bytes, b → [b] (1 token)
    assert(got == Seq(("en", 3L, 32L)), s"got $got")
  }

  test("wordpieceSeg: greedy longest-match-first with ## continuations " +
      "— hand-computed") {
    import graft.functions.WordPieceSeg.wordpieceSeg
    val vocab = Seq("un", "u", "n", "a", "f", "##f", "##a", "##n",
      "##fair", "##air", "fun")
    def seg(w: String) = Seq(w).toDF("w")
      .select(wordpieceSeg(col("w"), vocab).as("s"))
      .as[Seq[String]].head()
    // longest FIRST match wins at every position: 'unfair' takes 'un'
    // (not 'u'), then '##fair' (not '##f'/'##air' piecewise)
    assert(seg("unfair") == Seq("un", "##fair"), s"got ${seg("unfair")}")
    // word-initial piece beats continuation forms: 'fun' is one piece
    assert(seg("fun") == Seq("fun"))
    // a char with no continuation form only works word-initially:
    // 'nu' = [n] then pos 1 needs '##u' — absent → the WHOLE word is
    // one [UNK], not a partial segmentation
    assert(seg("nu") == Seq("[UNK]"))
  }

  test("wordpieceSeg greed disagrees with the unigram path: a dead-end " +
      "where a valid segmentation exists") {
    // vocab {ab, a, ##bc}: greedy on 'abc' takes the LONGEST initial
    // match 'ab', then needs '##c' — absent → [UNK], NO backtracking.
    // The unigram path over the same pieces enumerates all paths and
    // finds [a ##bc]... spelled in its own piece alphabet {ab, a, bc}:
    // [a bc] segments fine. This is the defining behavioral split
    // between the two families.
    import graft.functions.WordPieceSeg.wordpieceSeg
    val wp = Seq("abc").toDF("w")
      .select(wordpieceSeg(col("w"), Seq("ab", "a", "##bc")).as("s"))
      .as[Seq[String]].head()
    assert(wp == Seq("[UNK]"), s"greedy must dead-end, got $wp")
    val uni = Seq("abc").toDF("w")
      .select(graft.functions.UnigramSeg.unigramSeg(col("w"),
        Seq(("ab", 0.4), ("a", 0.3), ("bc", 0.3))).as("s"))
      .as[Seq[String]].head()
    assert(uni == Seq("a", "bc"), s"unigram must segment, got $uni")
  }

  test("vocabFromPieces yields word-initial and ## forms; empty word " +
      "segments to an empty array") {
    import graft.functions.WordPieceSeg
    assert(WordPieceSeg.vocabFromPieces(Seq("a", "b")).sorted ==
      Seq("##a", "##b", "a", "b"))
    val e = Seq("").toDF("w")
      .select(WordPieceSeg.wordpieceSeg(col("w"),
        Seq("a", "##a")).as("s"))
      .as[Seq[String]].head()
    assert(e.isEmpty)
  }

  test("bpeMerges learns the hand-computed merge sequence") {
    // words: aa×3, ab×1 → round 1 merges "a a" (count 3, beating
    // "a b" at 1); round 2 only "a b" remains pairable.
    val docs = Seq("aa ab", "aa aa").toDF("text")
    val got = TextStats.bpeMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a a", "aa", 3L), (2, "a b", "ab", 1L)), s"got $got")
  }

  test("bpeMerges counts overlapping pair positions, then merges left-to-right") {
    // "aaa" → "a a a": pair "a a" counts BOTH positions (cnt 2), and the
    // merge rewrites leftmost-non-overlapping: "aa a", not "a aa".
    val docs = Seq("aaa").toDF("text")
    val got = TextStats.bpeMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a a", "aa", 2L), (2, "aa a", "aaa", 1L)), s"got $got")
  }

  test("bpeEncode applies merges in rank order, leftmost-non-overlapping") {
    // merges: (h,e), (l,l), (he,ll): "hello" → he l l o → he ll o →
    // hell o; "hell" → [hell]; "lll" → ll l (leftmost pass, no rescan).
    val merges = Seq(("h", "e"), ("l", "l"), ("he", "ll"))
    val toks = Seq("hello hell lll").toDF("text")
      .select(graft.functions.BpeEncode.bpeEncode($"text", merges))
      .as[Seq[String]].head()
    assert(toks == Seq("hell", "o", "hell", "ll", "l"), s"got $toks")
  }

  test("bpeEncode is lossless over the documents corpus (concat = text sans spaces)") {
    val docs = Tables.load(spark, sf, "documents")
    val merges = TextStats.bpeMerges(docs, "text", rounds = 3)
      .orderBy("round").select("pair").as[String].collect()
      .map { p => val Array(l, r) = p.split(" ", 2); (l, r) }.toSeq
    val bad = docs.select(
        array_join(graft.functions.BpeEncode.bpeEncode($"text", merges), "")
          .as("rt"),
        regexp_replace($"text", " ", "").as("orig"))
      .filter($"rt" =!= $"orig").count()
    assert(bad == 0, s"$bad documents fail round-trip")
  }

  test("bigramLogprob matches hand-computed add-k scores") {
    // corpus bigrams: (a,b)x2, (b,a)x1; histories a=2, b=1; V=2, k=0.5
    // nll(a,b) = -ln(2.5/3) = 0.182322; nll(b,a) = -ln(1.5/2) = 0.287682
    val docs = Seq((1L, "a b"), (2L, "a b a")).toDF("doc_id", "text")
    val got = TextStats.bigramLogprob(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0.1823),
      (2L, 2L, 0.235)), s"got $got") // (0.182322+0.287682)/2 = 0.235002
  }

  test("winnowFingerprints: shared >= k+w-1 substring shares a fingerprint") {
    val common = "QUICKBROWNFOXJU" // 15 >= k+w-1 = 13
    val docs = Seq(
      (1L, "aaaa" + common + "bbbb"),
      (2L, "zz" + common + "qqqqqq"),
      (3L, "entirely different text here"),
      (4L, "short")) // < 13 chars: no fingerprints at all
    .toDF("doc_id", "text")
    val fps = TextStats.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byDoc.contains(4L), "sub-window doc must yield nothing")
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "winnowing guarantee: shared 15-char substring, no shared fp")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "unrelated docs collide")
    // density: ~2/(w+1) of gram hashes survive, never more than n_grams
    assert(byDoc(1L).size < ("aaaa" + common + "bbbb").length - 7)
  }

  test("bpeMerges never merges across a symbol boundary (suffix trap)") {
    // Round 1 merges (z,a)→'za' (cnt 4). Round 2's argmax (a,b) must
    // NOT touch the 'za b' sequence — a plain single-space replace
    // matches 'a b' inside 'za b' and corrupts the symbol table (the
    // round-6 advisory). With delimiter-owned spacing, round 3 still
    // sees the intact (za,b) pair.
    val docs = Seq("za za za zab ab ab").toDF("text")
    val got = TextStats.bpeMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "z a", "za", 4L),
      (2, "a b", "ab", 2L),
      (3, "za b", "zab", 1L)), s"got $got")
  }

  test("script detection thresholds and tie-break order") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "plain ascii only"),
      (2L, "mixed " + TextStats.CyrSnippet + " " + TextStats.CjkSnippet),
      (3L, "short " + TextStats.GreekSnippet.take(3)), // 3 greek < 4
      (4L, TextStats.CjkSnippet),                      // exactly 4 cjk
    ).toDF("doc_id", "text")
    val cyr = regexp_count($"text", lit(TextStats.CyrillicRe)).cast("long")
    val cjk = regexp_count($"text", lit(TextStats.CjkRe)).cast("long")
    val grk = regexp_count($"text", lit(TextStats.GreekRe)).cast("long")
    val script = when(cyr >= 4 && cyr >= cjk && cyr >= grk, "cyrillic")
      .when(cjk >= 4 && cjk >= grk, "cjk")
      .when(grk >= 4, "greek")
      .otherwise("latin")
    val got = df.select($"doc_id", script.as("s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "latin", 2L -> "cyrillic",
      3L -> "latin", 4L -> "cjk"), got)
  }

  test("RAKE scores degree/frequency and ranks phrases — hand example") {
    // Doc: "red apple of green pear and red apple to x"
    //   phrases: "red apple" (×2), "green pear", "x"
    //   freq: red 2, apple 2, green 1, pear 1, x 1
    //   deg (Σ plen of containing phrases): red 4, apple 4, green 2,
    //     pear 2, x 1
    //   wscore_micro: red/apple 2e6, green/pear 2e6, x 1e6
    //   phrase scores: "red apple" 4e6, "green pear" 4e6, "x" 1e6
    //   tie at 4e6 → phrase string ascending: "green pear" first
    val docs = Seq((7L, "red apple of green pear and red apple to x"))
      .toDF("doc_id", "text")
    val got = TextStats.rakeTopK(docs, 3)
      .select($"rnk", $"phrase", $"plen", $"score_micro")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, "green pear", 2L, 4000000L),
      (2, "red apple", 2L, 4000000L),
      (3, "red apple", 2L, 4000000L)), got)
  }

  test("RAKE favors longer phrases over frequent singletons") {
    // "alpha beta of alpha of alpha": phrases "alpha beta", "alpha",
    // "alpha". freq alpha 3, deg alpha 2+1+1=4; beta freq 1 deg 2.
    // wscore alpha = round(4e6/3) = 1333333, beta = 2e6.
    // "alpha beta" = 1333333 + 2000000 = 3333333 > "alpha" = 1333333.
    val docs = Seq((1L, "alpha beta of alpha of alpha"))
      .toDF("doc_id", "text")
    val got = TextStats.rakeTopK(docs, 1)
      .select($"phrase", $"score_micro")
      .as[(String, Long)].head()
    assert(got == ("alpha beta", 3333333L), got)
  }

  test("ROUGE clips multiset matches and scores the stopword-free " +
      "hypothesis — hand example") {
    // ref = "the cat sat on the mat cat" → hyp = "cat sat on mat cat"
    // R1: m=5 (cat2 sat1 on1 mat1), h=5, r=7 → p1=1, rec1=5/7=.7143
    // R2: hyp bigrams {cat sat, sat on, on mat, mat cat} (4); ref has
    //   all but "on mat" → m=3, h=4, r=6 → p2=.75, rec2=.5, f2=.6
    val docs = Seq((4L, "the cat sat on the mat cat"))
      .toDF("doc_id", "text")
    val got = TextStats.rougeScores(docs)
      .select($"m1", $"h1", $"r1", $"p1", $"rec1",
        $"m2", $"h2", $"r2", $"p2", $"rec2", $"f2")
      .as[(Long, Long, Long, Double, Double,
        Long, Long, Long, Double, Double, Double)].head()
    assert(got == ((5L, 5L, 7L, 1.0, 0.7143, 3L, 4L, 6L, 0.75, 0.5, 0.6)),
      got)
  }

  test("JSD is 0 for identical sources and ln 2 for disjoint ones") {
    // Identical unigram distributions → every term 0; fully disjoint
    // vocabularies → JSD = ln 2 nats (the metric's maximum).
    val docs = Seq(
      ("s1", "a a b"), ("s2", "a a b"), ("s3", "c c d"))
      .toDF("source", "text")
    val got = TextStats.jsdPairs(docs)
      .select($"src_a", $"src_b", $"jsd_nano", $"jsd")
      .as[(String, String, Long, Double)].collect().toSeq
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    assert(byPair(("s1", "s2"))._3 == 0L)
    assert(byPair(("s1", "s2"))._4 == 0.0)
    // 2 · round(0.5·ln2·1e9) = 693147180 → 0.693147
    assert(byPair(("s1", "s3"))._3 == 693147180L, got)
    assert(byPair(("s2", "s3"))._4 == 0.693147)
  }

  test("readability syllable surrogate counts vowel groups") {
    // ea|a|i|i|y (5) + ou (1) + o|e (2) + ou (1) = 9
    assert(one(regexp_count($"text", lit(TextStats.VowelRe)),
      "readability counts vowel groups") == 9)
    assert(one(regexp_count($"text", lit(TextStats.VowelRe)),
      "xyz zz") == 1)
  }
}
