package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric-array columns
  * (each side independently FLOAT[] or DOUBLE[] — embeddings are float,
  * hyperplane/centroid literals are double).
  *
  * This is the inner loop of the entire similarity family (brute-force
  * top-k, SRP bucketing, IVF assign/search): the
  * `aggregate`/`zip_with` formulation allocates an intermediate zipped
  * array and evaluates a lambda per element, while this is one fused loop
  * over the two `ArrayData` buffers with no allocation, and `doGenCode`
  * emits the same loop into whole-stage codegen. Accumulation is
  * sequential in double, index 0..n−1 — bit-identical to the HOF
  * formulation (OpsSpec asserts) and to the DuckDB oracle's list
  * comprehension, so swapping it in changes no query result.
  *
  * Null semantics match `aggregate(zip_with(...))`: a length mismatch or
  * a null element nulls the whole result.
  *
  * Registered as SQL function `graft_dot` via [[GraftExtensions]];
  * [[graft.ops.Similarity.dot]] builds it directly (no registry needed).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Nullable even when the children aren't — see null semantics above. */
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lGet = if (elemType(left).contains(FloatType)) "getFloat" else "getDouble"
      val rGet = if (elemType(right).contains(FloatType)) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |boolean $bad = $n != $y.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |  $dot += ((double) $x.$lGet($i)) * ((double) $y.$rGet($i));
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
