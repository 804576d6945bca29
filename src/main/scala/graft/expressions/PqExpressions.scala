package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoding as ONE native expression.
  *
  * The composed formulation (an `array(...)` of K per-code distance
  * subtrees per subspace, each holding a 16-float literal) is
  * semantically identical but plans as ~M·K expression nodes whose
  * whole-stage codegen compiles in seconds — and codebooks CHANGE every
  * Lloyd round, so training pays that compile cost per iteration. Here
  * the codebook tensor rides along as a codegen reference object (same
  * pattern as [[MultiPatternMatches]] / [[HyperplaneSigs]]) and the
  * argmin loop is a single static method: one compact plan node
  * regardless of M, K, or dim, for both the training argmin and the
  * corpus encode pass.
  *
  * Determinism contract (bit-exact vs the composed form and the DuckDB
  * oracle): per code, the distance is `dot(c,c) − 2·dot(x,c)` with both
  * dots accumulated in double left-to-right (`dot(c,c)` over the FULL
  * subvector, `dot(x,c)` over the overlap, mirroring `slice` + the
  * min-length [[DotProduct]] fold); ties break toward the smaller code
  * via strict `<`.
  */
object PqCodes {

  /** Static entry point for generated code: the M argmin codes of
    * `vec` against `books` (m × k × sub), concatenated subspace layout.
    */
  def codes(vec: ArrayData,
            books: Array[Array[Array[Float]]]): GenericArrayData = {
    val x = vec.toFloatArray()
    val m = books.length
    val out = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cb = books(mi)
      val sub = cb(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var code = 0
      while (code < cb.length) {
        val c = cb(code)
        var dcc = 0.0
        var i = 0
        while (i < c.length) {
          val cv = c(i).toDouble
          dcc += cv * cv
          i += 1
        }
        // overlap length mirrors slice-then-min-length dot semantics
        val lim = math.min(c.length, math.max(0, x.length - off))
        var dxc = 0.0
        i = 0
        while (i < lim) {
          dxc += x(off + i).toDouble * c(i).toDouble
          i += 1
        }
        val d = dcc - 2.0 * dxc
        if (d < bestD) { bestD = d; best = code }
        code += 1
      }
      out(mi) = best
      off += sub
      mi += 1
    }
    new GenericArrayData(out)
  }
}

/** Cosine argmax against a literal centroid matrix as ONE native
  * expression — the Lloyd assignment primitive of
  * [[graft.functions.Clustering]]. The composed form (an `array(...)`
  * of k cosine subtrees) re-copies the vector ONCE PER CENTROID
  * (`toFloatArray` inside every [[CosineSim]] child) and materializes a
  * k-double array per row; here the vector is copied once and the k
  * dot loops run over it in place — identical FLOPs, a fraction of the
  * constant, and one compact plan node regardless of k.
  *
  * Determinism contract (bit-exact vs the composed form and the DuckDB
  * oracle): per centroid, dot/‖x‖²/‖c‖² accumulate in one left-to-right
  * double loop over the min length exactly like [[CosineSim]]; sim =
  * dot / (√‖x‖²·√‖c‖²), 0 when the denominator is 0; ties break toward
  * the smaller cluster index via strict `>`.
  */
object KmeansOps {

  /** Static entry point for generated code: (argmax cluster, its sim)
    * of `vec` against `cents`, first-max tie-breaking.
    */
  def assign(vec: ArrayData,
             cents: Array[Array[Float]]): InternalRow = {
    val x = vec.toFloatArray()
    var best = 0
    var bestSim = Double.NegativeInfinity
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      val n = math.min(x.length, c.length)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val a = x(i).toDouble
        val b = c(i).toDouble
        dot += a * b
        na += a * a
        nb += b * b
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val s = if (denom > 0) dot / denom else 0.0
      if (s > bestSim) { bestSim = s; best = ci }
      ci += 1
    }
    new GenericInternalRow(Array[Any](best, bestSim))
  }
}

/** `struct<cluster:int, sim:double>` of the winning centroid for a
  * float-vector column (see [[KmeansOps.assign]]). The centroid matrix
  * rides as a codegen reference object, so re-planning with updated
  * centroids (every Lloyd round) re-compiles one node.
  */
case class KmeansAssignExpr(child: Expression,
                            cents: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def prettyName: String = "kmeans_assign"

  override def nullSafeEval(input: Any): Any =
    KmeansOps.assign(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ct = ctx.addReferenceObj("cents", cents, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.KmeansOps.assign($c, $ct)")
  }

  override protected def withNewChildInternal(
      c: Expression): KmeansAssignExpr = copy(child = c)
}

/** Cosine over int8-quantized vectors as one native node — the
  * composed `zip_with`/`aggregate` higher-order form allocates
  * intermediate arrays and evaluates a lambda per element per row; this
  * is one fused integer loop. Integer dot/norm sums are exact (order
  * independent); the final `dot / √na / √nb` divides left-to-right in
  * double exactly like the composed form.
  */
object Int8Ops {

  /** One O(n) pre-scan, same contract as DtwDistanceImpl.rejectNulls:
    * `toDoubleArray`/`toIntArray` on an array with null slots reads
    * undefined garbage bits (aggregate-built arrays are
    * nullable-typed even when no element ever is), so a loud error
    * here replaces silently wrong packed bits / distances (ADVICE r8).
    */
  private def rejectNulls(arr: ArrayData, op: String): Unit = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"$op: null element at index $i — toDoubleArray/toIntArray " +
          "on a null slot reads garbage bits; clean the array " +
          "(filter/array_compact) before calling")
      i += 1
    }
  }

  /** Symmetric int8 quantization of a double vector in one loop —
    * bit-identical to the composed form: absMax by a left-to-right
    * `greatest` fold, scale = 127/absMax (1.0 for the zero vector),
    * and Spark's Round-expression semantics per element
    * (`BigDecimal.valueOf(x).setScale(0, HALF_UP)` — shortest-decimal
    * HALF_UP, NOT `Math.round`, which differs on negative halves).
    */
  def quantize(a: ArrayData): GenericArrayData = {
    rejectNulls(a, "int8_quantize")
    val x = a.toDoubleArray()
    var absMax = 0.0
    var i = 0
    while (i < x.length) {
      val v = math.abs(x(i))
      if (v > absMax) absMax = v
      i += 1
    }
    val scale = if (absMax > 0) 127.0 / absMax else 1.0
    val out = new Array[Int](x.length)
    i = 0
    while (i < x.length) {
      out(i) = java.math.BigDecimal.valueOf(x(i) * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-bit pack (static entry point for generated code): bit k of
    * the result is set iff element k is strictly positive, first 64
    * elements only — exact float comparisons, so bit-identical to any
    * per-element formulation.
    */
  def signPack(a: ArrayData): Long = {
    rejectNulls(a, "sign_pack")
    val x = a.toDoubleArray()
    val n = math.min(x.length, 64)
    var bits = 0L
    var i = 0
    while (i < n) {
      if (x(i) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Exact squared euclidean distance of two int8-quantized vectors
    * (static entry point for generated code): Σ (x−y)² over the
    * min-length overlap as a long — integer sums, so the result is
    * identical under any formulation.
    */
  def sqdist(a: ArrayData, b: ArrayData): Long = {
    rejectNulls(a, "int8_sqdist")
    rejectNulls(b, "int8_sqdist")
    val x = a.toIntArray()
    val y = b.toIntArray()
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) {
      val d = (x(i) - y(i)).toLong
      s += d * d
      i += 1
    }
    s
  }

  /** Static entry point for generated code. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    rejectNulls(a, "int8_cosine")
    rejectNulls(b, "int8_cosine")
    val x = a.toIntArray()
    val y = b.toIntArray()
    val n = math.min(x.length, y.length)
    var dot = 0L
    var i = 0
    while (i < n) { dot += (x(i) * y(i)).toLong; i += 1 }
    var na = 0L
    i = 0
    while (i < x.length) { na += (x(i) * x(i)).toLong; i += 1 }
    var nb = 0L
    i = 0
    while (i < y.length) { nb += (y(i) * y(i)).toLong; i += 1 }
    if (na > 0 && nb > 0)
      dot.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
    else 0.0
  }
}

/** `array<int>` int8 quantization of an `array<double>` vector (see
  * [[Int8Ops.quantize]]).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any =
    Int8Ops.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Int8Ops.quantize($c)")

  override protected def withNewChildInternal(
      c: Expression): Int8Quantize = copy(child = c)
}

/** `double` cosine of two `array<int>` int8-quantized vectors (see
  * [[Int8Ops.cosine]]).
  */
case class Int8CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(Int8Ops.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.expressions.Int8Ops.cosine($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Int8CosineSim = copy(l, r)
}

/** `long` exact squared euclidean distance of two `array<int>`
  * int8-quantized vectors (see [[Int8Ops.sqdist]]) — one fused loop
  * replacing the zip_with + aggregate lambda composition on the ANN /
  * k-NN hot paths.
  */
case class Int8SqDist(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int8_sqdist"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(Int8Ops.sqdist(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.expressions.Int8Ops.sqdist($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Int8SqDist = copy(l, r)
}

/** `long` sign-bit binary code of an `array<double>` vector: bit k set
  * iff `x(k) > 0`, k < min(64, length) — the 1-bit quantization the
  * binary-embedding scan (`sim_binary_topk`) keys on. One fused loop
  * (see [[Int8Ops.signPack]]) replacing a zip_with + aggregate lambda
  * composition that allocated an intermediate 64-element array and ran
  * two interpreted lambdas per element per row.
  */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_pack"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Int8Ops.signPack(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Int8Ops.signPack($c)")

  override protected def withNewChildInternal(
      c: Expression): SignPack = copy(child = c)
}

/** `array<int>` of the M PQ codes for a float-vector column — the
  * subspace-argmin encode of [[graft.functions.ProductQuantization]]
  * in one plan node. `books(m)(code)` = subspace-m centroid `code`.
  */
case class PqEncodeCodes(child: Expression,
                         books: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_codes"

  override def nullSafeEval(input: Any): Any =
    PqCodes.codes(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val bk = ctx.addReferenceObj("books", books, "float[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PqCodes.codes($c, $bk)")
  }

  override protected def withNewChildInternal(
      c: Expression): PqEncodeCodes = copy(child = c)
}
