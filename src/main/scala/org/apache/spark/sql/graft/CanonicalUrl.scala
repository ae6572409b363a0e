package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: one-pass URL canonicalization for
  * web-corpus curation (BlueForty.py's staged-ingest URLs feed the
  * same normalize-then-dedup pass; see `graft.functions.UrlFunctions`
  * for the rule set). Returns a struct
  * `(canonical_url STRING, reg_domain STRING)`.
  *
  * Semantically identical — pinned bit-equal by UrlFunctionsSpec — to
  * the composed-builtins reference formulation
  * [[graft.functions.UrlFunctions.relationalCanonicalUrl]]:
  *
  *  - scheme `^([A-Za-z][A-Za-z0-9+.-]*)://` lowercased ('' when the
  *    string has no valid scheme prefix; since ':' is outside the
  *    scheme char class, the regex can only ever match at the end of
  *    the maximal scheme-char run — no backtracking subtleties);
  *  - host = authority chars up to the first `/?#`, lowercased, with
  *    the scheme's default port (`:80` http, `:443` https) stripped;
  *  - path = from the end of a non-empty authority to the first `?#`,
  *    original case, trailing slashes stripped;
  *  - query = from the FIRST `?` anywhere in the string to the next
  *    `#` (the unanchored-regex semantics of the reference form),
  *    split on `&`, empty and `utm_*` params dropped, the rest sorted
  *    in UTF8String (byte) order and re-joined;
  *  - fragment dropped;
  *  - reg_domain = last two dot-separated labels of the final host
  *    (`([^.]+\.[^.]+)$` semantics: '' unless the host ends in two
  *    non-empty dot-free labels).
  *
  * Why an Expression: the reference formulation scans the URL with
  * five separate compiled regexes plus an interpreted
  * filter/array_sort HOF pair and re-derives scheme+host once per
  * consumer; this is the engine's worst LINEAR path at scale (PERF.md
  * 125× sweep: x26 12.8×, x28 16× — both parse-dominated). One fused
  * byte-level pass with no regex engine cuts the per-row cost while
  * keeping whole-stage codegen (a single static call per row).
  */
case class CanonicalUrl(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("canonical_url", StringType, nullable = false),
    StructField("reg_domain", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    UrlParseUtil.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.UrlParseUtil.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)

  override def prettyName: String = "canonical_url"
}

object UrlParseUtil {

  private val SCHEME_SEP = UTF8String.fromString("://")
  private val QMARK = UTF8String.fromString("?")
  private val HTTP = UTF8String.fromString("http")
  private val HTTPS = UTF8String.fromString("https")
  private val EMPTY = UTF8String.EMPTY_UTF8

  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def isSchemeByte(b: Byte): Boolean =
    isAlpha(b) || (b >= '0' && b <= '9') || b == '+' || b == '.' || b == '-'

  /** One-pass parse; all delimiters are ASCII single bytes and never
    * UTF-8 continuation bytes, so byte scanning is charset-safe.
    * Slices go through `UTF8String.fromBytes` (zero-copy views of the
    * copied byte array), lowercasing through `UTF8String.toLowerCase`
    * (the exact code path of the builtin `lower`). */
  def parse(u: UTF8String): InternalRow = {
    val b = u.getBytes
    val n = b.length

    // scheme run + "://"
    var schemeEnd = -1 // byte index one past the scheme chars
    if (n > 0 && isAlpha(b(0))) {
      var i = 1
      while (i < n && isSchemeByte(b(i))) i += 1
      if (i + 2 < n && b(i) == ':' && b(i + 1) == '/' && b(i + 2) == '/')
        schemeEnd = i
    }
    val scheme =
      if (schemeEnd < 0) EMPTY
      else UTF8String.fromBytes(b, 0, schemeEnd).toLowerCase

    // authority: [schemeEnd+3, first of /?# )
    var authStart = -1
    var authEnd = -1
    if (schemeEnd >= 0) {
      authStart = schemeEnd + 3
      var i = authStart
      while (i < n && b(i) != '/' && b(i) != '?' && b(i) != '#') i += 1
      authEnd = i
    }
    val hasAuth = authStart >= 0 && authEnd > authStart

    // host: lowercase authority, strip the scheme's default port once
    var host = EMPTY
    if (hasAuth) {
      host = UTF8String.fromBytes(b, authStart, authEnd - authStart).toLowerCase
      val isHttp = scheme.equals(HTTP)
      val isHttps = scheme.equals(HTTPS)
      if (isHttp || isHttps) {
        val hb = host.getBytes
        val hn = hb.length
        if (isHttp && hn >= 3 && hb(hn - 3) == ':' && hb(hn - 2) == '8' &&
            hb(hn - 1) == '0')
          host = UTF8String.fromBytes(hb, 0, hn - 3)
        else if (isHttps && hn >= 4 && hb(hn - 4) == ':' && hb(hn - 3) == '4' &&
            hb(hn - 2) == '4' && hb(hn - 1) == '3')
          host = UTF8String.fromBytes(hb, 0, hn - 4)
      }
    }

    // path: [authEnd, first of ?# ), only when the authority is
    // non-empty (the reference regex requires [^/?#]+); trailing
    // slashes stripped
    var path = EMPTY
    if (hasAuth) {
      var i = authEnd
      while (i < n && b(i) != '?' && b(i) != '#') i += 1
      var end = i
      while (end > authEnd && b(end - 1) == '/') end -= 1
      if (end > authEnd) path = UTF8String.fromBytes(b, authEnd, end - authEnd)
    }

    // query: from the FIRST '?' anywhere to the next '#' or end
    var query = EMPTY
    var q = 0
    while (q < n && b(q) != '?') q += 1
    if (q < n) {
      var qEnd = q + 1
      while (qEnd < n && b(qEnd) != '#') qEnd += 1
      // split on '&', drop empty and utm_* params, sort byte-lex, join
      var count = 0
      var i = q + 1
      var start = i
      val params = new java.util.ArrayList[UTF8String](4)
      while (i <= qEnd) {
        if (i == qEnd || b(i) == '&') {
          val len = i - start
          if (len > 0 && !(len >= 4 && b(start) == 'u' && b(start + 1) == 't' &&
              b(start + 2) == 'm' && b(start + 3) == '_')) {
            params.add(UTF8String.fromBytes(b, start, len))
            count += 1
          }
          start = i + 1
        }
        i += 1
      }
      if (count > 0) {
        java.util.Collections.sort(params)
        var joined = params.get(0)
        var j = 1
        while (j < count) {
          joined = UTF8String.concat(joined,
            UTF8String.fromString("&"), params.get(j))
          j += 1
        }
        query = joined
      }
    }

    val canonical =
      if (query.numBytes() == 0) UTF8String.concat(scheme, SCHEME_SEP, host, path)
      else UTF8String.concat(scheme, SCHEME_SEP, host, path, QMARK, query)

    new GenericInternalRow(Array[Any](canonical, registeredDomain(host)))
  }

  /** `([^.]+\.[^.]+)$` on the host: the last two dot-separated labels,
    * both non-empty and dot-free, anchored at the end; '' otherwise. */
  def registeredDomain(host: UTF8String): UTF8String = {
    val hb = host.getBytes
    val hn = hb.length
    var ld = hn - 1
    while (ld >= 0 && hb(ld) != '.') ld -= 1
    if (ld <= 0 || ld == hn - 1) return EMPTY
    var prev = ld - 1
    while (prev >= 0 && hb(prev) != '.') prev -= 1
    if (prev == ld - 1) return EMPTY // consecutive dots: empty middle label
    UTF8String.fromBytes(hb, prev + 1, hn - prev - 1)
  }
}
