package graft.ext.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `text → array<string>` of BPE tokens under a PINNED merge table — the
  * production tokenizer seam: merges are trained offline and shipped as an
  * artifact (the same contract as the pinned PQ codebooks), so encode is a
  * pure function of (text, table) and restates cross-engine.
  *
  * Semantics (exactly what the DuckDB oracle unrolls): lowercase, split on
  * single spaces dropping empties (the corpus-wide `tokens()` convention),
  * then per word run `rounds` merge rounds; each round finds the
  * LOWEST-RANK table pair present among adjacent symbols and merges ALL its
  * occurrences in one left-to-right scan (after a merge the scan continues
  * AFTER the new symbol — "aaa" + (a,a) → [aa, a]). A round with no table
  * pair present is a no-op, so any `rounds` at or beyond convergence yields
  * the same tokens — fixing `rounds` is what makes the unrolled oracle
  * exact rather than "until fixpoint", which SQL cannot express. A merged
  * symbol is the concatenation `a+b`, never equal to `a` (nonempty `b`), so
  * within a round the left-fold merge equals the scan-skip form.
  *
  * One pass per doc in a native kernel: a Column-HOF twin is impossible
  * here — `rounds` composed iterations each reference the previous symbol
  * array several times, and CollapseProject substitution makes the
  * expression tree exponential in `rounds`. The merge table ships with the
  * plan through the codegen references array (cluster-safe, unlike a static
  * registry executors never populate). */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)],
                         rounds: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(merges.nonEmpty, "BPE merge table must be non-empty")
  require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty },
    "BPE merge sides must be non-empty")
  require(rounds >= 1, s"rounds out of range: $rounds")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_bpe_encode"

  private lazy val mergesArr: Array[Array[String]] =
    merges.map(p => Array(p._1, p._2)).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.eval(input.asInstanceOf[UTF8String], mergesArr, rounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.expressions.BpeEncode.eval($c, $mRef, $rounds);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncode {
  def eval(input: UTF8String, merges: Array[Array[String]],
           rounds: Int): GenericArrayData = {
    val s = input.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) encodeWord(s.substring(start, i), merges, rounds, out)
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(word: String, merges: Array[Array[String]],
                         rounds: Int,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var c = 0
    while (c < word.length) { syms += word.substring(c, c + 1); c += 1 }
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      // lowest-rank pair present (the table is in ascending rank order)
      var best = -1
      var bi = 0
      while (bi < merges.length && best < 0) {
        val a = merges(bi)(0); val b = merges(bi)(1)
        var j = 0
        while (j < syms.length - 1 && best < 0) {
          if (syms(j) == a && syms(j + 1) == b) best = bi
          j += 1
        }
        bi += 1
      }
      if (best < 0) converged = true // further rounds are no-ops
      else {
        val a = merges(best)(0); val b = merges(best)(1); val ab = a + b
        val ns = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            ns += ab; j += 2
          } else { ns += syms(j); j += 1 }
        }
        syms = ns
        r += 1
      }
    }
    syms.foreach(t => out += UTF8String.fromString(t))
  }
}
