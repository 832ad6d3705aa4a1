package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the text tier's hottest per-row
  * kernel: equal-run statistics of a SORTED string array — distinct
  * values (`n_types`), values occurring exactly once (`n_hapax`), and
  * the longest equal run (`max_run`) in one pass (SURVEY §2.10 tier
  * (b), the [[DotProductExpr]] extension point).
  *
  * The composed form this replaces — a Catalyst `aggregate` higher-
  * order function folding a 5-field struct per element (the r13 "T6
  * rule" rewrite of t13/t6) — is semantically right but executes
  * INTERPRETED: higher-order functions evaluate their lambda through
  * the expression interpreter for every array element, allocating a
  * fresh struct per step, inside an otherwise codegen'd stage. For a
  * corpus-scale scan that is millions of interpreted lambda steps per
  * partition. This node emits one fused loop (and its `eval` mirrors
  * it exactly for interpreted contexts).
  *
  * Determinism contract: pure integer counting over exact string
  * equality — no floats anywhere, so nothing can diverge across
  * engines; the oracle keeps its per-occurrence GROUP BY form and the
  * two agree cell-for-cell (t13/t6 hash gates). Equal-run semantics
  * replicate the fold it replaces: runs are maximal blocks of equal
  * adjacent elements, `n_types` counts runs, `n_hapax` counts runs of
  * length exactly 1, `max_run` the longest. An EMPTY array yields
  * (0, 0, 0) — the all-zeros contract empty/null documents ride
  * (tokens() coalesces NULL text to []); a NULL array yields NULL. A
  * null ELEMENT (never produced by tokens/ngrams) counts as the empty
  * string rather than poisoning the row.
  *
  * The input MUST be sorted for the counts to be global (the caller
  * composes `array_sort` — equal values must be adjacent); on an
  * unsorted array the result is still deterministic, just run-local.
  */
case class RunStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  // covariant override: AbstractDataType itself is private[sql]
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("n_types", LongType, nullable = false),
    StructField("n_hapax", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var types = 0L
    var hap = 0L
    var maxr = 0L
    var run = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val x = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      if (prev != null && x.equals(prev)) run += 1
      else {
        if (run == 1L) hap += 1
        types += 1
        run = 1L
      }
      if (run > maxr) maxr = run
      prev = x
      i += 1
    }
    if (run == 1L) hap += 1
    new GenericInternalRow(Array[Any](types, hap, maxr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val types = ctx.freshName("types")
      val hap = ctx.freshName("hap")
      val maxr = ctx.freshName("maxr")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev")
      val x = ctx.freshName("x")
      val utf8 = classOf[UTF8String].getName
      val row = classOf[GenericInternalRow].getName
      s"""
         |int $n = $a.numElements();
         |long $types = 0L, $hap = 0L, $maxr = 0L, $run = 0L;
         |$utf8 $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  $utf8 $x = $a.isNullAt($i) ? $utf8.EMPTY_UTF8 : $a.getUTF8String($i);
         |  if ($prev != null && $x.equals($prev)) { $run++; }
         |  else { if ($run == 1L) $hap++; $types++; $run = 1L; }
         |  if ($run > $maxr) $maxr = $run;
         |  $prev = $x;
         |}
         |if ($run == 1L) $hap++;
         |${ev.value} = new $row(new Object[] {$types, $hap, $maxr});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RunStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_runstats"
}

object RunStatsExpr {
  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_runstats"),
    new ExpressionInfo(classOf[RunStatsExpr].getName, "graft_runstats"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"graft_runstats requires exactly 1 argument, got ${children.length}")
      RunStatsExpr(children.head)
    })
}
