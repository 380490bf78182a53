package graft.ext.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URL split (scheme/host/port/path/query/frag) — the native twin
  * of the `graft.ext.Urls` regex chain. The regex form evaluates ~6
  * separate anchored patterns per derived column (each canonical-URL
  * derivation re-parses five of them), ~30 regex machines per row on a
  * crawl-scale scan; this walks the string once and returns all six fields
  * as a struct, callable from whole-stage codegen as one static call.
  *
  * BIT-IDENTICAL to the regex twins by contract (UrlExprSpec asserts it on
  * generated and adversarial inputs), including the regexes' corner
  * semantics, which are mirrored deliberately:
  *  - userinfo strips through the FIRST '@' of the authority;
  *  - the query is everything after the LAST '?' before the first '#'
  *    (the twin's greedy `^[^#]*\?` backtracks to the last '?');
  *  - the port is a digit run at the authority's END preceded by ':';
  *  - host is lowercased via UTF8String (Spark's `lower`) and ALL
  *    trailing dots are stripped (the twin's `rtrim(_, ".")`);
  *  - empty query/fragment/host → NULL.
  * Out of contract (documented in Urls): IPv6 brackets, '\n' inside a URL.
  */
object UrlParse {
  val schema: StructType = StructType(Seq(
    StructField("scheme", StringType), StructField("host", StringType),
    StructField("port", IntegerType), StructField("path", StringType),
    StructField("query", StringType), StructField("frag", StringType)))

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Called from both eval and generated code — one implementation. */
  def parse(input: UTF8String): InternalRow = {
    val s = input.toString
    val out = new Array[Any](6)

    // fragment: after the FIRST '#'; empty → null
    val hi = s.indexOf('#')
    if (hi >= 0 && hi + 1 < s.length)
      out(5) = UTF8String.fromString(s.substring(hi + 1))
    val preFrag = if (hi >= 0) s.substring(0, hi) else s

    // scheme: ^[A-Za-z][A-Za-z0-9+.-]*:  (lowercased)
    var schemeEnd = -1
    if (s.nonEmpty && isAlpha(s.charAt(0))) {
      var i = 1
      while (i < s.length && isSchemeChar(s.charAt(i))) i += 1
      if (i < s.length && s.charAt(i) == ':') schemeEnd = i
    }
    if (schemeEnd > 0)
      out(0) = UTF8String.fromString(s.substring(0, schemeEnd)).toLowerCase

    // authority: requires scheme AND '//' immediately after the ':'
    var auth: String = null
    if (schemeEnd > 0 && s.regionMatches(schemeEnd + 1, "//", 0, 2)) {
      var i = schemeEnd + 3
      val start = i
      while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?' &&
        s.charAt(i) != '#') i += 1
      auth = s.substring(start, i)
    }

    if (auth != null) {
      // host: strip userinfo through the FIRST '@', stop at the first ':',
      // lowercase (UTF8String semantics = Spark lower), strip trailing dots
      val at = auth.indexOf('@')
      val afterUi = if (at >= 0) auth.substring(at + 1) else auth
      val colon = afterUi.indexOf(':')
      val rawHost = if (colon >= 0) afterUi.substring(0, colon) else afterUi
      val lowered = UTF8String.fromString(rawHost).toLowerCase.toString
      var e = lowered.length
      while (e > 0 && lowered.charAt(e - 1) == '.') e -= 1
      if (e > 0) out(1) = UTF8String.fromString(lowered.substring(0, e))

      // port: digit run at the END preceded by ':' (twin: `:([0-9]+)$`);
      // runs longer than 9 digits are absent — the twin's ANSI-safe rule
      var j = auth.length
      while (j > 0 && isDigit(auth.charAt(j - 1))) j -= 1
      if (j > 0 && j < auth.length && auth.charAt(j - 1) == ':' &&
          auth.length - j <= 9)
        out(2) = java.lang.Integer.parseInt(auth.substring(j))
    }

    // path: skip "scheme:" if present, then "//authority" if present
    // (the twin's authority skip does NOT require a scheme), then take
    // everything up to the first '?' or '#'. May be "" — never null.
    var pi = if (schemeEnd > 0) schemeEnd + 1 else 0
    if (pi + 1 < s.length && s.charAt(pi) == '/' && s.charAt(pi + 1) == '/') {
      pi += 2
      while (pi < s.length && s.charAt(pi) != '/' && s.charAt(pi) != '?' &&
        s.charAt(pi) != '#') pi += 1
    }
    val pstart = pi
    while (pi < s.length && s.charAt(pi) != '?' && s.charAt(pi) != '#') pi += 1
    out(3) = UTF8String.fromString(s.substring(pstart, pi))

    // query: after the LAST '?' before the first '#'; empty → null
    val qi = preFrag.lastIndexOf('?')
    if (qi >= 0 && qi + 1 < preFrag.length)
      out(4) = UTF8String.fromString(preFrag.substring(qi + 1))

    new GenericInternalRow(out)
  }
}

/** `url → struct<scheme,host,port,path,query,frag>` in one pass. */
case class UrlPartsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = UrlParse.schema
  override def prettyName: String = "graft_url_parts"

  override protected def nullSafeEval(input: Any): Any =
    UrlParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.expressions.UrlParse.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): UrlPartsExpr =
    copy(child = newChild)
}
