package graft.functions

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Seeded property fuzz over the round-9 native expressions, each
  * pinned to an INDEPENDENT formulation (the relational composition
  * for URL/SimHash; the DuckDB-oracle-style suffix fold for BPE) —
  * the generators aim at the boundary cases a fixture corpus never
  * hits: malformed schemes, '?' inside fragments, empty tokens,
  * multi-space runs, left==right merge chains. */
class NativeExprFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(4242L + i)))

  test("fuzz: canonicalParts == relational canonicalization, 600 URLs") {
    val scheme = Gen.oneOf("http", "HTTPS", "hTTp", "ftp", "h2+x.y-z",
      "a:b", "1http", "", "http")
    val label = Gen.oneOf("Ex", "a", "", "über", "x9")
    val host = Gen.choose(0, 4).flatMap(n =>
      Gen.listOfN(n, label).map(_.mkString(".")))
    val port = Gen.oneOf("", ":80", ":443", ":8080", ":80:80")
    val path = Gen.oneOf("", "/", "/a/b", "/a//b///", "/A B", "//")
    val query = Gen.oneOf("", "?", "?a=1&b=2", "?utm_source=x&z=9&a=1",
      "?&&a=1&a=0", "?z=\u00e9&utm_", "?b&a&c")
    val frag = Gen.oneOf("", "#f", "#f?x=1", "#?")
    val structured = for {
      s <- scheme; h <- host; po <- port; pa <- path; q <- query; f <- frag
    } yield s"$s://$h$po$pa$q$f"
    val garbageChar = Gen.oneOf("a:/?#.&= %\u00e9".toSeq)
    val garbage = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, garbageChar).map(_.mkString))
    val urls = sample(Gen.frequency(3 -> structured, 1 -> garbage), 600)
    val df = urls.toDF("url")
    val mismatches = df.select(
        UrlFunctions.canonicalParts(col("url")).as("n"),
        struct(
          UrlFunctions.relationalCanonicalUrl(col("url")).as("canonical_url"),
          UrlFunctions.registeredDomain(
            UrlFunctions.urlHost(col("url"))).as("reg_domain")).as("r"),
        col("url"))
      .filter(col("n") =!= col("r"))
      .collect()
    assert(mismatches.isEmpty,
      mismatches.take(5).map(_.toString).mkString("; "))
  }

  test("fuzz: SimHashSig == explode+sum aggregate, both hashes, 300 texts") {
    val tok = Gen.oneOf("", "a", "bb", "the", "caf\u00e9", "x1")
    val text = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, tok).map(_.mkString(" ")))
    val docs = sample(text, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((md5v, nBits) <- Seq((false, 64), (true, 60))) {
      val native = docs.select(col("doc_id"),
          Dedup.simhashSig(col("text"), nBits, md5v).as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (md5v) Dedup.md5Hash60 else xxhash64(_)
      val rel = Dedup.simhashWith(docs, "doc_id", "text", hashFn, nBits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native === rel, s"md5Variant=$md5v")
    }
  }

  test("round-9 natives are registered as SQL functions via GraftExtensions") {
    val row = spark.sql(
      """SELECT canonical_url('HTTP://A.Ex.COM:80/p/?b=2&utm_s=x&a=1#f').canonical_url,
        |       canonical_url('https://www.shop.example.com/x').reg_domain,
        |       simhash_sig('a b a', 60, true),
        |       bpe_merge('h e l l o', 'l', 'l'),
        |       size(word_shingle_hashes('a b c', 2))""".stripMargin).head()
    assert(row.getString(0) === "http://a.ex.com/p?a=1&b=2")
    assert(row.getString(1) === "example.com")
    assert(row.getString(3) === "h e ll o")
    assert(row.getInt(4) === 2)
    // the SQL form evaluates the same expression the Column API wraps
    val viaCol = Seq("a b a").toDF("t")
      .select(Dedup.simhashSig(col("t"), 60, md5Variant = true))
      .as[Long].head()
    assert(row.getLong(2) === viaCol)
  }

  test("fuzz: native langId/scores == relational length-replace, 400 texts") {
    import graft.operators.TextAnalysis
    // tokens aimed at the counting boundaries: stopwords from every
    // profile, near-miss substrings (theme/lethal), runs that exercise
    // non-overlapping replace, multi-byte chars, and empty tokens
    val tok = Gen.oneOf("the", "a", "of", "and", "le", "la", "et", "les",
      "der", "die", "und", "das", "el", "los", "y", "una",
      "theme", "lethal", "ción", "caña", "", "th", "sch", "xx")
    val sep = Gen.frequency(6 -> Gen.const(" "), 1 -> Gen.const("  "))
    val text = for {
      n <- Gen.choose(0, 12)
      ts <- Gen.listOfN(n, tok)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    } yield ts.zipAll(ss, "", "").map { case (t, s) => t + s }.mkString
    val texts = sample(text, 400)
    val rows = texts.toDF("text").select(
        TextAnalysis.langIdNative(col("text")).as("nid"),
        TextAnalysis.langId(col("text")).as("rid"),
        TextAnalysis.langIdCharNgramNative(col("text")).as("ngid"),
        TextAnalysis.langIdCharNgram(col("text")).as("rgid"),
        TextAnalysis.langScoreNative(col("text"), "fr").cast("double").as("nsc"),
        TextAnalysis.langScore(col("text"), "fr").as("rsc"),
        col("text"))
      .filter(col("nid") =!= col("rid") || col("ngid") =!= col("rgid") ||
        col("nsc") =!= col("rsc"))
      .collect()
    assert(rows.isEmpty, rows.take(5).map(_.toString).mkString("; "))
  }

  test("lang_id/lang_id_ngram/lang_score are registered as SQL functions") {
    import org.apache.spark.sql.AnalysisException
    val row = spark.sql(
      """SELECT lang_id('the cat and the dog of a house'),
        |       lang_id('qqq zzz'),
        |       lang_id_ngram('the thing he thought was thin'),
        |       lang_score('the cat and the dog', 'en')""".stripMargin).head()
    assert(row.getString(0) === "en")
    assert(row.getString(1) === "und")
    assert(row.getString(2) === "en")
    assert(row.getLong(3) === 3L) // the, and, the
    // unknown language code is an analysis error, not a runtime one
    val bad = intercept[AnalysisException] {
      spark.sql("SELECT lang_score('x', 'xx')").collect()
    }
    assert(bad.getCondition === "NON_FOLDABLE_ARGUMENT")
    // and the SQL form evaluates the same expression the Column wraps
    val viaCol = Seq("le chat et la maison et les toits").toDF("t")
      .select(graft.operators.TextAnalysis.langIdNative(col("t")))
      .as[String].head()
    assert(spark.sql(
      "SELECT lang_id('le chat et la maison et les toits')")
      .head().getString(0) === viaCol)
  }

  test("SQL builders reject bad literal params as AnalysisException") {
    import org.apache.spark.sql.AnalysisException
    // column-valued width: must be an analysis error, not an eval crash
    val colWidth = intercept[AnalysisException] {
      Seq((1, "a b")).toDF("n", "t")
        .selectExpr("simhash_sig(t, n, true)").collect()
    }
    assert(colWidth.getCondition === "NON_FOLDABLE_ARGUMENT")
    // NULL width
    val nullWidth = intercept[AnalysisException] {
      spark.sql("SELECT simhash_sig('a', CAST(NULL AS INT), true)").collect()
    }
    assert(nullWidth.getCondition === "NON_FOLDABLE_ARGUMENT")
    // string-typed variant flag
    val badType = intercept[AnalysisException] {
      spark.sql("SELECT simhash_sig('a', 60, 'yes')").collect()
    }
    assert(badType.getCondition === "NON_FOLDABLE_ARGUMENT")
    // wrong arity
    val badArity = intercept[AnalysisException] {
      spark.sql("SELECT word_shingle_hashes('a b c')").collect()
    }
    assert(badArity.getCondition === "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    // a LONG-typed literal width is accepted (integral Number widening)
    assert(spark.sql("SELECT size(word_shingle_hashes('a b c', 2L))")
      .head().getInt(0) === 2)
  }

  test("fuzz: WordShingleHashes + WordShingleStrings == HOF forms, " +
      "400 texts x 4 widths") {
    import graft.operators.TextAnalysis
    val tok = Gen.oneOf("", "a", "bb", "the", "café", "x1", "a")
    val sep = Gen.frequency(5 -> Gen.const(" "), 1 -> Gen.const("  "))
    val text = for {
      n <- Gen.choose(0, 9)
      ts <- Gen.listOfN(n, tok)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    } yield ts.zipAll(ss, "", "").map { case (t, s) => t + s }.mkString
    val texts = sample(text, 400)
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = texts.toDF("text").select(
          TextAnalysis.wordShingleHashesNative(col("text"), n).as("nh"),
          TextAnalysis.wordShingleHashes(col("text"), n).as("rh"),
          TextAnalysis.wordShinglesNative(col("text"), n).as("ns"),
          TextAnalysis.wordShingles(col("text"), n).as("rs"),
          col("text"))
        .filter(col("nh") =!= col("rh") || col("ns") =!= col("rs"))
        .collect()
      assert(bad.isEmpty, s"n=$n: " + bad.take(3).mkString("; "))
    }
  }

  test("fuzz: PairExplode == the quadratic reference, 300 arrays") {
    val arr = for {
      n <- Gen.choose(0, 12)
      xs <- Gen.listOfN(n, Gen.oneOf(-3L, 0L, 1L, 7L, Long.MaxValue, 42L))
    } yield xs
    val cases = sample(arr, 300)
    val got = cases.zipWithIndex.map { case (xs, i) => (i.toLong, xs) }
      .toDF("id", "xs")
      .select(col("id"), org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.PairExplode(
          org.apache.spark.sql.graft.ColumnShim.expression(col("xs"))))
        .as(Seq("a", "b")))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    cases.zipWithIndex.foreach { case (xs, i) =>
      val want = for {
        a <- xs.indices; b <- (a + 1) until xs.length
      } yield (xs(a), xs(b))
      assert(got.getOrElse(i.toLong, Seq.empty) === want, s"case $i: $xs")
    }
  }

  test("fuzz: JaroWinkler == an independent reimplementation, 600 pairs") {
    // independent formulation: matched-subsequence lists instead of the
    // native's single-pass flag arrays; same DuckDB-pinned rules
    // (window, floor(t/2), 0.7 boost gate, <=4 prefix)
    def jwRef(a: String, b: String): Double = {
      if (a.isEmpty && b.isEmpty) return 1.0
      if (a.isEmpty || b.isEmpty) return 0.0
      val win = math.max(0, math.max(a.length, b.length) / 2 - 1)
      val taken = Array.fill(b.length)(false)
      val amatched = new scala.collection.mutable.ArrayBuffer[Char]()
      for (i <- a.indices) {
        val j = (math.max(0, i - win) to math.min(b.length - 1, i + win))
          .find(j => !taken(j) && b(j) == a(i))
        j.foreach { jj => taken(jj) = true; amatched += a(i) }
      }
      val m = amatched.length
      if (m == 0) return 0.0
      val bmatched = b.indices.filter(taken).map(b(_))
      val t = amatched.zip(bmatched).count { case (x, y) => x != y } / 2
      val jaro = (m.toDouble / a.length + m.toDouble / b.length +
        (m - t).toDouble / m) / 3.0
      if (jaro <= 0.7) jaro
      else {
        val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
        jaro + p * 0.1 * (1.0 - jaro)
      }
    }
    val word = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'é')).map(_.mkString))
    val pair = for { a <- word; b <- word } yield (a, b)
    val cases = sample(pair, 600)
    val got = cases.toDF("a", "b")
      .select(graft.operators.TextAnalysis.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g === jwRef(a, b), s"jw('$a','$b')")
    }
  }

  test("fuzz: CosineSimilarity ~ HOF reference, HyperplaneLshBucket == " +
      "HOF reference bit-exact, 300 vectors") {
    import graft.operators.Similarity
    val f = Gen.frequency(
      6 -> Gen.choose(-1.0f, 1.0f),
      1 -> Gen.oneOf(0.0f, -0.0f, 1e-7f, -1e-7f, 0.5f))
    for (dim <- Seq(4, 8)) {
      val vecPair = for {
        xs <- Gen.listOfN(dim, f)
        ys <- Gen.listOfN(dim, f)
      } yield (xs.toArray, ys.toArray)
      val cases = sample(vecPair, 300)
      val rows = cases.toDF("a", "b").select(
          Similarity.cosine(col("a"), col("b")).as("nc"),
          Similarity.cosineHof(col("a"), col("b")).as("rc"),
          Similarity.lshBucket(col("a"), dim, nPlanes = 12).as("nb"),
          Similarity.lshBucketHof(col("a"), dim, nPlanes = 12).as("rb"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        val (nc, rc) = (r.getDouble(0), r.getDouble(1))
        // zero-norm vectors make both forms NaN — equal by convention
        assert((nc.isNaN && rc.isNaN) || math.abs(nc - rc) < 1e-6,
          s"dim=$dim case $i cosine: native=$nc hof=$rc (${cases(i)})")
        // the bucket is discrete: identical fold order ⇒ bit equality
        assert(r.getLong(2) === r.getLong(3),
          s"dim=$dim case $i bucket: ${cases(i)._1.toSeq}")
      }
    }
  }

  test("fuzz: QuantizeDecimal6 + ScaledDotProduct == exact BigDecimal " +
      "arithmetic, 300 vector pairs") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.graft.{ColumnShim, QuantizeDecimal6, ScaledDotProduct}
    val v = Gen.frequency(
      6 -> Gen.choose(-1.0, 1.0),
      1 -> Gen.oneOf(0.0, -0.0, 0.0000005, -0.0000015, 0.1 + 0.2,
        1.0 / 3.0, 123.456789, -999.999999, 2.5e-7))
    val vecPair = for {
      d <- Gen.choose(1, 8)
      xs <- Gen.listOfN(d, v)
      ys <- Gen.listOfN(d, v)
    } yield (xs, ys)
    val cases = sample(vecPair, 300)
    def q(c: org.apache.spark.sql.Column) =
      ColumnShim.column(QuantizeDecimal6(ColumnShim.expression(c)))
    val rows = cases.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
      .select(col("id"), q(col("x")).as("qx"), q(col("y")).as("qy"))
      .select(col("id"), col("qx"), col("qy"),
        ColumnShim.column(ScaledDotProduct(
          ColumnShim.expression(col("qx")),
          ColumnShim.expression(col("qy")))).as("dot"))
      .collect()
    rows.zip(cases).foreach { case (r, (x, y)) =>
      def ref(d: Double) = JBD.valueOf(d).setScale(6, RoundingMode.HALF_UP)
      val qx = r.getSeq[Long](1)
      val qy = r.getSeq[Long](2)
      x.zipWithIndex.foreach { case (d, i) =>
        assert(qx(i) === ref(d).movePointRight(6).longValueExact(),
          s"quantize($d)")
      }
      val want = x.zip(y).map { case (a, b) => ref(a).multiply(ref(b)) }
        .foldLeft(JBD.ZERO.setScale(12))(_.add(_))
      assert(new JBD(java.math.BigInteger.valueOf(r.getLong(3)), 12)
        .compareTo(want) === 0, s"dot($x,$y)")
    }
  }

  test("fuzz: BpeMerge == the oracle-style suffix fold, 500 sequences") {
    // independent formulation: the DuckDB oracle's list_reduce rule —
    // append WITHOUT a separator iff x is the right symbol and the
    // accumulator's last token is the left symbol
    def foldMerge(sym: String, l: String, r: String): String = {
      val toks = sym.split(" ", -1)
      toks.tail.foldLeft(toks.head) { (acc, x) =>
        if (x == r && (acc == l || acc.endsWith(" " + l))) acc + x
        else acc + " " + x
      }
    }
    val sym = Gen.oneOf("a", "b", "c", "ab", "aa")
    val seqGen = for {
      n <- Gen.choose(1, 10)
      ts <- Gen.listOfN(n, sym)
      l <- sym
      r <- sym
    } yield (ts.mkString(" "), l, r)
    val cases = sample(seqGen, 500)
    val got = cases.toDF("s", "l", "r").select(
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.BpeMerge(
            org.apache.spark.sql.graft.ColumnShim.expression(col("s")),
            org.apache.spark.sql.graft.ColumnShim.expression(col("l")),
            org.apache.spark.sql.graft.ColumnShim.expression(col("r")))))
      .as[String].collect()
    cases.zip(got).foreach { case ((s, l, r), g) =>
      assert(g === foldMerge(s, l, r), s"merge($s | $l,$r)")
    }
  }
}
