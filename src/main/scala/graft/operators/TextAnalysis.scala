package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (BASELINE.json north-star extensions): tokenization, shingling,
  * quality stats, n-gram-heuristic language ID, fingerprinting. All are
  * pure Column expressions over built-ins — codegen'd, shuffle-free,
  * and therefore linear-scan scalable: at 100 TB these run as map-only
  * stages fused into the parquet scan.
  */
object TextAnalysis {

  /** Whitespace tokens (split on single space, the corpus' delimiter). */
  def words(text: Column): Column = split(text, " ")

  /** Single-space-split token count. `size(split(t, " "))` builds the
    * whole word array (regex engine + per-word allocations) just to
    * count it; spaces+1 is the same number (split keeps empty tokens,
    * so every space adds exactly one token — consecutive and edge
    * spaces included), countable in one native byte pass.
    * Value-identical to [[wordCountSplit]], pinned by LangIdSpec. */
  def wordCount(text: Column): Column =
    (org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.MultiPatternHitCount(
        org.apache.spark.sql.graft.ColumnShim.expression(text),
        Seq(" "), pad = false)) + 1).cast("bigint")

  /** The relational reference form of [[wordCount]] (spec diff base). */
  def wordCountSplit(text: Column): Column = size(words(text)).cast("bigint")

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — a cheap proxy for subword tokenizer load
    * factors. ASCII classes only so regex dialects agree. */
  val BpeIshPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIshPattern), lit(0))).cast("bigint")

  /** Distinct word n-gram shingles (dedup/similarity input). Documents
    * shorter than n words yield an empty set. */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), i =>
          concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct 64-bit hashes of the word n-gram shingles, computed by
    * hashing the n words directly (multi-argument xxhash64) — no
    * shingle-string construction. Set cardinality and intersections
    * are identical to [[wordShingles]]' modulo 2⁻⁶⁴ collisions, at a
    * fraction of the per-row cost; this is the form dedup shuffles. */
  def wordShingleHashes(text: Column, n: Int): Column = {
    val ws = words(text)
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), i =>
          xxhash64((0 until n).map(k => element_at(ws, i + k + 1)): _*)))
        .otherwise(array().cast("array<bigint>")))
  }

  /** [[wordShingleHashes]] as a native codegen'd expression — the form
    * the dedup operators actually run. The HOF formulation above
    * re-evaluates `split` inside the interpreted lambda for every
    * window (O(len·windows) regex work per document); the native scan
    * is one pass (see org.apache.spark.sql.graft.WordShingleHashes).
    * Bit-identical output, asserted in WordShingleHashesSpec. */
  def wordShingleHashesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.WordShingleHashes(
        org.apache.spark.sql.graft.ColumnShim.expression(text), n))

  /** [[wordShingles]] as a native codegen'd expression — one fused
    * byte scan instead of the HOF's per-window re-split (same trade as
    * [[wordShingleHashesNative]]; parity in WordShingleStringsSpec).
    * For operators whose OUTPUT is the gram string (boilerplate
    * reports, decontamination audits); dedup shuffles should keep
    * using the hashed form. */
  def wordShinglesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.WordShingleStrings(
        org.apache.spark.sql.graft.ColumnShim.expression(text), n))

  /** Jaro-Winkler similarity (native codegen'd expression, DuckDB-
    * pinned semantics — see org.apache.spark.sql.graft.JaroWinkler).
    * O(|a|·|b|) worst case: block candidates first, same contract as
    * thresholded levenshtein. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.JaroWinkler(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** Count non-overlapping occurrences of ` word ` in the padded text —
    * the classic length-delta trick, identical across engines. */
  def paddedHits(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val pat = s" $word "
    (length(padded) - length(call_function("replace", padded, lit(pat)))) /
      lit(pat.length)
  }

  /** Stopword-profile language scores. Heuristic n-gram language ID:
    * score each language by its stopword hit count, pick the argmax
    * with a fixed precedence tie-break. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "y", "una"))

  def langScore(text: Column, lang: String): Column =
    LangProfiles.toMap.apply(lang)
      .map(w => paddedHits(text, w)).reduce(_ + _)

  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, sc), acc) =>
      when(sc > 0 && sc === best, lit(l)).otherwise(acc)
    }
  }

  /** [[langId]] as a native codegen'd expression — ONE byte pass
    * counting all 16 stopword patterns simultaneously instead of 16
    * `replace` scans each copying the document (the worst shipped
    * linear path at 125×: x30, PERF.md round 9). Bit-identical output
    * pinned by LangIdSpec + NativeExprFuzzSpec; the coalesce matches
    * the relational when-chain's NULL→'und' behavior. This is the form
    * the curation queries run ([[langId]] stays as the relational
    * reference the specs diff against). */
  def langIdNative(text: Column): Column =
    coalesce(
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.LangProfileId(
          org.apache.spark.sql.graft.ColumnShim.expression(text),
          LangProfiles, pad = true)),
      lit("und"))

  /** [[langScore]] as a native one-pass count (exact BIGINT; the
    * relational double is the same value integer-exactly). */
  def langScoreNative(text: Column, lang: String): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.MultiPatternHitCount(
        org.apache.spark.sql.graft.ColumnShim.expression(text),
        LangProfiles.toMap.apply(lang), pad = true))

  /** Count non-overlapping occurrences of an arbitrary substring —
    * length-delta trick without word padding (for char n-grams). */
  def substringHits(text: Column, s: String): Column =
    (length(text) - length(call_function("replace", text, lit(s)))) /
      lit(s.length)

  /** Character-bigram/trigram profiles per language — the classic
    * n-gram language-ID heuristic (cheap, whole-text, no tokenizer). */
  val CharNgramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ing", " a "),
    "fr" -> Seq("le", "ou", "ait", " de "),
    "de" -> Seq("ch", "ei", "sch", " der "),
    "es" -> Seq("os", "ua", "ción", " el "))

  def charNgramScore(text: Column, lang: String): Column =
    CharNgramProfiles.toMap.apply(lang)
      .map(g => substringHits(text, g)).reduce(_ + _)

  /** Argmax over char-n-gram profiles, fixed precedence tie-break;
    * "und" when no profile matches at all. */
  def langIdCharNgram(text: Column): Column = {
    val scores = CharNgramProfiles.map { case (l, _) =>
      l -> charNgramScore(text, l)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, sc), acc) =>
      when(sc > 0 && sc === best, lit(l)).otherwise(acc)
    }
  }

  /** [[langIdCharNgram]] as a native one-pass expression (unpadded
    * substring counting; same argmax/tie semantics — see
    * [[langIdNative]]). */
  def langIdCharNgramNative(text: Column): Column =
    coalesce(
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.LangProfileId(
          org.apache.spark.sql.graft.ColumnShim.expression(text),
          CharNgramProfiles, pad = false)),
      lit("und"))

  /** Quality score in [0,1]: length factor + stopword density, the
    * shape of heuristic doc-quality filters. Deterministic double math
    * (single divisions), rounded for cross-engine stability. */
  def qualityScore(text: Column): Column = {
    val n = wordCount(text)
    val lengthFactor = least(n.cast("double") / lit(100.0), lit(1.0))
    // native one-pass stopword count (integer-exact; the relational
    // double langScore is the same value, so the rounded result is
    // bit-identical — LangIdSpec pins it)
    val stopDensity =
      least(langScoreNative(text, "en").cast("double") /
          (n.cast("double") + lit(1.0)),
        lit(1.0))
    round(lengthFactor * lit(0.6) + stopDensity * lit(0.4), 6)
  }

  /** PII patterns kept RE2-simple (no lookarounds, ASCII classes) so
    * Java and RE2-family engines match identically — the contract a
    * cross-engine scrub audit needs. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails then phones — map-only, codegen'd, the shape of
    * every pre-training PII scrub pass (real deployments swap in their
    * full pattern bank; the engine contract is identical). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  def countPattern(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("bigint")

  /** Normalized-text MD5 fingerprint (stable content address). */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** 64-bit content hash for cheap exact-dup bucketing at scale (not
    * portable across engines — use fingerprintMd5 for differential
    * comparisons). */
  def fingerprint64(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling-hash content fingerprints: hash every character k-gram
    * (the rolling window), keep the distinct hashes ≡ 0 mod p — the
    * classic "0 mod p" document sketch (MOSS-style). Sketch size is
    * ~len/p regardless of edits; two documents' sketch overlap
    * estimates their k-gram resemblance, and local edits only perturb
    * the k-grams they touch. One array expression per row — no
    * shuffle, no per-window recompute. */
  def contentFingerprints(text: Column, k: Int = 8, p: Int = 4): Column = {
    val grams = transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => xxhash64(substring(text, i + 1, lit(k))))
    array_distinct(filter(grams, h => pmod(h, lit(p)) === 0))
  }

  /** Hashed bag-of-words feature bucket — the fasttext-style trick
    * that makes a linear text classifier vocabulary-free: any word
    * maps to one of `buckets` weight slots via a portable content
    * hash (md5-60, so an external engine reproduces the bucketing). */
  def featureBucket(word: Column, buckets: Int): Column =
    pmod(Dedup.md5Hash60(word), lit(buckets.toLong))

  /** Deterministic pseudo-weight for a feature bucket, in integer
    * MILLIS (−1000..1000): stands in for trained classifier weights
    * while keeping partial sums exact and order-independent (BIGINT
    * all the way; one double division at the end of the consumer).
    * The minstd reduction is pmod'd before the multiply, so nothing
    * can overflow under ANSI mode. */
  def weightMilli(feat: Column): Column =
    pmod(pmod(feat, lit(2147483647L)) * 48271L, lit(2147483647L)) % 2001L - 1000L
}
