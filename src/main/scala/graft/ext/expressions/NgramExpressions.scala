package graft.ext.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `text → array<struct<w1..wN:string>>` (or `array<string>` at n = 1) in
  * ONE pass: lowercase (the same `UTF8String.toLowerCase` Spark's `lower`
  * uses), split on single spaces dropping empties (the `split(lower(s), " ")`
  * + `filter(length > 0)` contract), and emit adjacent n-grams — the fused
  * native twin of `TextStats.adjacentPairs/adjacentTriples(tokens(...))`,
  * whose nested zip_with/slice HOFs pay the lambda interpreter per element
  * and materialize three intermediate arrays. Fewer than n tokens → empty
  * array (explode then drops the row), matching the HOF `when` guard.
  * Bit-equality with the HOF twins pinned in NgramExprSpec. */
case class TokenNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 4, s"n-gram order out of range: $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    if (n == 1) org.apache.spark.sql.types.ArrayType(StringType)
    else org.apache.spark.sql.types.ArrayType(StructType(
      (1 to n).map(i => StructField(s"w$i", StringType))))
  override def prettyName: String = "graft_token_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    TokenNgrams.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.expressions.TokenNgrams.eval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenNgramsExpr =
    copy(child = newChild)
}

object TokenNgrams {
  def eval(input: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toLowerCase.toString
    // maximal runs of non-' ' chars (split(_, " ") + drop empties)
    val toks = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) toks += UTF8String.fromString(s.substring(start, i))
    }
    val m = toks.length - n + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else if (n == 1)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.toArray[Any])
    else {
      val out = new Array[Any](m)
      var k = 0
      while (k < m) {
        val vals = new Array[Any](n)
        var j = 0
        while (j < n) { vals(j) = toks(k + j); j += 1 }
        out(k) = new GenericInternalRow(vals)
        k += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}
