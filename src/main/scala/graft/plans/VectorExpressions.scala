package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  *
  * Every expression implements `doGenCode` (NOT `CodegenFallback`): a
  * single `CodegenFallback` expression anywhere in a projection kicks the
  * whole fused stage out of whole-stage codegen (`CollapseCodegenStages`
  * rejects the plan), so the hottest loops of the similarity family would
  * run with interpreted per-row dispatch. The generated code calls the same
  * imperative kernel (`compute`) through an expression reference — the
  * stage stays fused, rows stay unboxed, and eval/codegen share one body.
  */

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), null on length mismatch. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // nullable even over non-null children: length mismatch yields null. The
  // default child-derived nullability would (a) let UnsafeProjection treat
  // the slot as never-null and (b) make nullSafeCodeGen pin isNull to the
  // FalseLiteral, so the mismatch branch's `isNull = true` assignment
  // generates uncompilable Java and the stage silently falls back.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // the composable form (zip_with + aggregate) propagates a null ELEMENT to
  // a null result; getDouble would silently read a null slot as 0.0 and
  // break the bit-identical parity contract. The scan is statically skipped
  // when neither child's array type admits null elements (the hot paths —
  // our own expressions emit containsNull = false).
  private lazy val mayHoldNullElems = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => false
  }

  def anyNullElem(a: ArrayData, b: ArrayData): Boolean = {
    if (!mayHoldNullElems) return false
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() || anyNullElem(a, b)) null
    else compute(a, b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements() || $ref.anyNullElem($a, $b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $ref.compute($a, $b);
      }""")
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
                             seed: Long) extends UnaryExpression {
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

  def compute(input: ArrayData): ArrayData = {
    val v = input
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

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpBuckets", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Bit-interleave of `n` bucket indices into one long — the Z-order
  * (Morton) curve value. Children are pre-bucketed ints in [0, 2^bits);
  * bit j of child i lands at position j·n + i, so sorting by the result
  * clusters rows that are close in EVERY dimension, which is what gives
  * parquet min/max pruning multi-dimensional selectivity (a linear sort
  * only prunes its leading column).
  */
case class InterleaveBits(children: Seq[Expression], bits: Int) extends Expression {
  require(children.nonEmpty && children.size * bits <= 63,
    s"need dims·bits <= 63, got ${children.size}·$bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == IntegerType || c.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires integral buckets")

  def interleave(vals: Array[Long]): Long = {
    val n = vals.length
    var z = 0L
    var i = 0
    while (i < n) {
      val clamped = math.min(math.max(vals(i), 0L), (1L << bits) - 1)
      var j = 0
      while (j < bits) {
        z |= ((clamped >> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    z
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      val raw = children(i).eval(input)
      vals(i) = if (raw == null) 0L else raw match {
        case l: Long => l
        case x: Int => x.toLong
      }
      i += 1
    }
    interleave(vals)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("interleaver", this)
    val gens = children.map(_.genCode(ctx))
    val vals = ctx.freshName("vals")
    val evalChildren = gens.map(_.code.toString).mkString("\n")
    val assigns = gens.zipWithIndex.map { case (g, i) =>
      s"$vals[$i] = ${g.isNull} ? 0L : (long) ${g.value};"
    }.mkString("\n")
    ev.copy(code = code"""
      $evalChildren
      long[] $vals = new long[${children.size}];
      $assigns
      final long ${ev.value} = $ref.interleave($vals);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

/** The `n` nearest centroids of a vector (squared-euclidean, ties to the
  * lower cell index), as array<int> in ascending-distance order — the IVF
  * cell-assignment / probe-list primitive. The composable form
  * (`array_sort` over per-centroid `zip_with`+`aggregate` distance structs)
  * interprets nlist·dim closures per row and sorts all nlist cells; this is
  * one flat loop with an n-slot insertion select, the same arithmetic in
  * the same index order (bit-identical distances).
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= centroids.length, "need 1 <= n <= nlist")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  private lazy val ctrs: Array[Array[Double]] = centroids.map(_.toArray).toArray

  def compute(input: ArrayData): ArrayData = {
    val v = input
    val dists = new Array[Double](ctrs.length)
    var c = 0
    while (c < ctrs.length) {
      val ctr = ctrs(c)
      val dim = math.min(v.numElements(), ctr.length)
      var s = 0.0
      var d = 0
      while (d < dim) { val t = v.getDouble(d) - ctr(d); s += t * t; d += 1 }
      dists(c) = s
      c += 1
    }
    // n-pass selection (n is tiny: 1..nprobe); ties resolve to lower index
    val out = new Array[Any](n)
    val taken = new Array[Boolean](ctrs.length)
    var slot = 0
    while (slot < n) {
      // first untaken cell seeds the selection: a strict `< Double.MaxValue`
      // probe would leave best = -1 (and crash the taken() write) when every
      // remaining distance is NaN or Infinity — one corrupt embedding must
      // degrade to an arbitrary-but-valid cell, not kill the assignment stage
      var best = -1
      var bestD = 0.0
      var i = 0
      while (i < ctrs.length) {
        if (!taken(i) && (best == -1 || dists(i) < bestD)) {
          best = i; bestD = dists(i)
        }
        i += 1
      }
      taken(best) = true
      out(slot) = best
      slot += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** v / ‖v‖₂ (zero vector passes through unchanged) — computed once per row
  * so downstream cosine becomes plain inner product.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  def compute(input: ArrayData): ArrayData = {
    val v = input
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    if (norm == 0.0) while (i < n) { out(i) = v.getDouble(i); i += 1 }
    else while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2norm", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** v − centroids[cell]: the IVF residual a PQ codebook quantizes (FAISS
  * IVFPQ form — residuals are tighter-clustered than raw vectors, so the
  * same code budget buys more accuracy). `left` = array<double> vector,
  * `right` = int cell index.
  */
case class CentroidResidual(left: Expression, right: Expression,
                            centroids: Seq[Seq[Double]]) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_residual"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  private lazy val ctrs: Array[Array[Double]] = centroids.map(_.toArray).toArray

  def compute(v: ArrayData, cell: Int): ArrayData = {
    val ctr = ctrs(cell)
    val n = math.min(v.numElements(), ctr.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = v.getDouble(i) - ctr(i); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidResidual", this)
    defineCodeGen(ctx, ev, (v, c) => s"$ref.compute($v, $c)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}

/** ⟨v, c_i⟩ for every centroid, as array<double> — the per-cell base term
  * of residual-PQ scoring (⟨q, b⟩ = ⟨q, coarse_cell⟩ + ⟨q, residual⟩).
  */
case class CentroidDots(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  private lazy val ctrs: Array[Array[Double]] = centroids.map(_.toArray).toArray

  def compute(input: ArrayData): ArrayData = {
    val v = input
    val out = new Array[Any](ctrs.length)
    var c = 0
    while (c < ctrs.length) {
      val ctr = ctrs(c)
      val n = math.min(v.numElements(), ctr.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * ctr(i); i += 1 }
      out(c) = dot
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidDots", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDots =
    copy(child = newChild)
}

/** Product-quantization codes: the vector is split into `m` contiguous
  * subspaces of `dsub` dims; each subspace is encoded as the index of its
  * nearest codebook centroid (squared euclidean, ties → lower code).
  * `codebooks` is flattened [m][ksub][dsub]. Output: array<int> of length m
  * — the ~32× compressed representation that makes a billion-vector corpus
  * fit executor memory.
  */
case class PQEncode(child: Expression, codebooks: Array[Double], m: Int, ksub: Int,
                    dsub: Int) extends UnaryExpression {
  require(codebooks.length == m * ksub * dsub, "codebook shape mismatch")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  def compute(input: ArrayData): ArrayData = {
    val v = input
    // clamp reads to the actual vector length (ragged rows shorter than the
    // trained dim read as zero-padded, like CentroidResidual) — an unguarded
    // getDouble past the end throws on GenericArrayData and silently reads
    // garbage on UnsafeArrayData
    val len = v.numElements()
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cOff = (s * ksub + j) * dsub
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (off + d < len) v.getDouble(off + d) else 0.0
          val t = x - codebooks(cOff + d)
          d2 += t * t
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[s·ksub + j] = ⟨query_s, centroid_{s,j}⟩,
  * so a candidate's approximate inner product is a pure m-entry table sum
  * ([[PQADC]]) — no vector math per candidate at probe time.
  */
case class PQLut(child: Expression, codebooks: Array[Double], m: Int, ksub: Int,
                 dsub: Int) extends UnaryExpression {
  require(codebooks.length == m * ksub * dsub, "codebook shape mismatch")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  def compute(input: ArrayData): ArrayData = {
    val v = input
    val len = v.numElements() // clamp like PQEncode: short rows zero-pad
    val out = new Array[Any](m * ksub)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var j = 0
      while (j < ksub) {
        val cOff = (s * ksub + j) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          if (off + d < len) dot += v.getDouble(off + d) * codebooks(cOff + d)
          d += 1
        }
        out(s * ksub + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): PQLut =
    copy(child = newChild)
}

/** Asymmetric-distance score: Σ_s lut[s·ksub + codes[s]] ≈ ⟨query, vec⟩. */
case class PQADC(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<double> lut), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  def compute(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    var s = 0
    var sum = 0.0
    while (s < m) { sum += lut.getDouble(s * ksub + codes.getInt(s)); s += 1 }
    sum
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this)
    defineCodeGen(ctx, ev, (c, l) => s"$ref.compute($c, $l)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PQADC =
    copy(left = newLeft, right = newRight)
}

/** Symmetric per-vector int8 scalar quantization stats, one pass:
  * `scale = max|xᵢ|`, `codeᵢ = floor(xᵢ·127/scale + 0.5)` (round-half-up —
  * spelled as floor(+0.5) so the rounding rule is engine-portable, not an
  * implementation's round() tie convention), reconstruction
  * `x̂ᵢ = codeᵢ·scale/127`. Returns struct<scale: double, code_sum: long,
  * mse: double> — the storage-planning numbers for 4× embedding
  * compression (int8 is the standard serving/storage dtype for ANN
  * indexes; mse against the fp32 original is the quality gate).
  *
  * The codes themselves are deliberately NOT returned here: the stats pass
  * is the audit/planning operator (what would quantization cost in
  * fidelity?); an actual encode writes `binary` via a second expression to
  * avoid paying an array<long> per row when only the decision is needed.
  *
  * All arithmetic is index-ascending double accumulation — bit-identical
  * to any engine folding the list in order (the oracle's `list_reduce`).
  * Empty or all-zero vectors: scale 0, codes 0, mse 0.
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("code_sum", LongType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))
  override def prettyName: String = "graft_int8_quant"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  def compute(input: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    val n = input.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(input.getDouble(i))
      if (a > scale) scale = a
      i += 1
    }
    var codeSum = 0L
    var sqErr = 0.0
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val x = input.getDouble(i)
        val code = math.floor(x * 127.0 / scale + 0.5)
        val err = x - code * scale / 127.0
        codeSum += code.toLong
        sqErr += err * err
        i += 1
      }
    }
    row.setDouble(0, scale)
    row.setLong(1, codeSum)
    row.setDouble(2, if (n > 0) sqErr / n else 0.0)
    row
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Quant", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}
