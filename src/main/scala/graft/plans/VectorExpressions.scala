package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity operators.
  *
  * The composable forms (`Similarity.dot`/`cosine` via `zip_with` +
  * `aggregate`) are interpreted per element; at 64 dims × thousands of
  * candidate pairs (and 96 hyperplane projections per row for LSH
  * bucketing) the closure overhead dominates. These run the same arithmetic
  * in the same order (index-ascending double accumulation — bit-identical
  * results) as one JVM loop per row.
  */

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), null on length mismatch. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket ids, one long per table: bit b of table t is
  * sign(vec · plane(t,b)), planes are deterministic ±1 vectors derived from
  * (seed, table, bit, dim) — identical family and bit order to
  * [[graft.functions.Similarity.lshBuckets]].
  */
case class HyperplaneBuckets(child: Expression, dim: Int, tables: Int, bits: Int,
                             seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  // planes[t][b][d] ∈ {+1,-1}, flattened; built once per expression instance
  private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var d = 0
        while (d < dim) {
          val h = scala.util.hashing.MurmurHash3.productHash((seed, t, b, d))
          out(base + d) = if ((h & 1) == 0) 1.0 else -1.0
          d += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getDouble(d) * planes(base + d); d += 1 }
        bucket = bucket * 2 + (if (dot >= 0) 1L else 0L)
        b += 1
      }
      buckets(t) = bucket
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
