package graft.ext.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions with `doGenCode` for the two hot scalar
  * kernels where higher-order-function folds are measurably slower: they
  * compile into the enclosing whole-stage-codegen loop instead of paying the
  * per-element lambda-interpreter cost.
  *
  * Both produce BIT-IDENTICAL results to their Column-expression twins
  * (`TextStats.rollingHash`, `Similarity.dot`): same operation order, same
  * arithmetic — verified by NativeExprSpec — so they can be swapped into any
  * oracle-checked query without changing results.
  *
  * Registration: `GraftFunctions.register(spark)` (idempotent, per-session)
  * or `spark.sql.extensions=graft.ext.expressions.GraftExtensions`.
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // no explicit Seq[AbstractDataType] annotation — that type is private[sql];
  // the inferred type conforms
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  // Iterate CODE POINTS, not UTF-16 units: the HOF twin's substr/ascii and
  // the DuckDB oracle's ord() both see code points, and the two must agree
  // on astral-plane characters (emoji), not just the BMP.
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long ${ev.value}_acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value}_acc = (${ev.value}_acc * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

/** Strict left-to-right dot product over two array<double> columns — the
  * same fold order as `aggregate(zip_with(a,b,_*_), 0.0, _+_)`, so results
  * are bit-identical, minus the lambda interpreter. NULL semantics also
  * mirror the HOF twin exactly: NULL if either side is NULL, if the lengths
  * differ (zip_with pads with null, poisoning the sum), or if any element
  * is null. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr = copy(left = newLeft, right = newRight)
}

/** n-bit SimHash over an array<long> of token hashes in ONE pass: bit i of
  * the result is set iff Σ over tokens of (±1 by hash-bit i) is positive.
  * The Column-expression twin (`Dedup.simhashN`) folds the array once PER
  * BIT — 60 interpreted lambda folds for the wide fingerprint; this computes
  * all bit-sums in a single traversal inside whole-stage codegen.
  *
  * Bit-identical to the twin, including its edge semantics (verified in
  * NativeExprSpec): empty array → 0; any NULL element → 0 (the twin's fold
  * poisons every bit-sum to NULL, so no `when` fires); NULL array → NULL. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 63, s"bits must be in [1,63]: $bits")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0L // twin: a null element zeroes every bit
      val h = arr.getLong(j)
      var i = 0
      while (i < bits) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) {
      if (counts(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val nullSeen = ctx.freshName("nullSeen")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[$bits];
         |boolean $nullSeen = false;
         |for (int $j = 0; $j < $n && !$nullSeen; $j++) {
         |  if ($c.isNullAt($j)) { $nullSeen = true; break; }
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $counts[$i] += ((int) (($h >>> $i) & 1L) << 1) - 1;
         |  }
         |}
         |${ev.value} = 0L;
         |if (!$nullSeen) {
         |  for (int $i = 0; $i < $bits; $i++) {
         |    if ($counts[$i] > 0) { ${ev.value} |= 1L << $i; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object GraftFunctions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head)),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) =>
        // second arg = bit width, must be an integer literal
        SimHashExpr(children(0),
          children(1).eval().asInstanceOf[Number].intValue())))

  /** Idempotent per-session registration (alternative to the extensions
    * config for sessions the library doesn't create). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** For `spark.sql.extensions=graft.ext.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) =>
        SimHashExpr(children(0),
          children(1).eval().asInstanceOf[Number].intValue())))
  }
}
