package graft.ext.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `text → struct<n_feats:int, score_fp:bigint>` — the whole fastText-shaped
  * hashed-linear-classifier inference in ONE pass: lowercase + tokenize
  * (the `split(lower(s), " ")` + drop-empties contract, same scan as
  * [[TokenNgrams]]), then for every unigram and adjacent-bigram feature an
  * md5 over the RAW digest bytes (bucket = first 4 bytes as the unsigned
  * 32-bit the SQL twin's `conv(substring(md5_hex, 1, 8), 16, 10)` decodes —
  * no hex string, no substring, no string→decimal conv), the keyed-hash
  * weight, and an exact integer accumulate. The Column-expression twin pays
  * that five-op string chain per feature plus the `aggregate` lambda
  * interpreter; bit-equality with it is pinned in RecipeSamplingSpec.
  * Weights: bucket b → (b·1103515245 + 12345) mod 2001 − 1000 — the seam a
  * trained weight vector (a bucket-indexed array riding the closure)
  * drops into. */
case class HashedLinearScoreExpr(child: Expression, dim: Int, salt: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, s"feature dimension must be positive: $dim")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", IntegerType, nullable = false),
    StructField("score_fp", LongType, nullable = false)))
  override def prettyName: String = "graft_hashed_linear_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedLinearScore.eval(input.asInstanceOf[UTF8String], dim, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.expressions.HashedLinearScore.eval($c, $dim, $saltRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScoreExpr =
    copy(child = newChild)
}

object HashedLinearScore {
  // MessageDigest is stateful — one per task thread, reset per feature
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def eval(input: UTF8String, dim: Int, salt: String): GenericInternalRow = {
    val s = input.toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val md = digest.get()
    val saltBytes = salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var score = 0L
    def weigh(f: String): Unit = {
      md.reset()
      md.update(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(saltBytes)
      val d = md.digest()
      // first 8 hex digits == first 4 digest bytes, unsigned big-endian
      val b = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % dim
      score += (b * 1103515245L + 12345L) % 2001L - 1000L
    }
    val n = toks.length
    i = 0
    while (i < n) { weigh(toks(i)); i += 1 }
    i = 0
    while (i < n - 1) { weigh(toks(i) + "_" + toks(i + 1)); i += 1 }
    val nFeats = if (n >= 2) 2 * n - 1 else n
    new GenericInternalRow(Array[Any](nFeats, score))
  }
}
