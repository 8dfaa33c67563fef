package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(x)` as a native expression — the probe side of a
  * bloom semi-join reduction (see [[graft.operators.Merge.historyDeltaBloom]]).
  * The filter rides into the expression tree by reference (serialized with
  * the plan, so every executor probes a local copy — the standard broadcast
  * shape for a sketch built from the SMALL side of a join). `doGenCode`
  * keeps the probing filter inside whole-stage codegen; a false positive
  * only means a row survives to the exact join behind it, so correctness
  * never depends on the sketch.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint (hash the key first), got ${other.catalogString}")
    }
  }

  def compute(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
