package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native product-quantization kernels (Jégou et al., "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011 — the ADC
 * variant). The first cut composed these from `zip_with`/`aggregate`
 * higher-order functions over per-centroid literal arrays: m·ksub = 128
 * nested HOF aggregates per row, ~1k literal nodes per expression tree.
 * That shape is triply hostile at scale — HOFs evaluate interpreted (a
 * closure call per element), the optimizer re-folds the huge literal
 * tree on every plan, and the generated wrapper code churns the JIT
 * (measured: the encode+score stage swung 2.5 s–52 s across reps at
 * sf0.1). These kernels emit ONE inline loop per row in whole-stage
 * codegen with the codebook as a broadcast-referenced `double[]`, and
 * restore the textbook ADC factorization:
 *
 *  - [[PqEncodeExpr]]  (corpus, once): vec → m nearest-centroid codes;
 *  - [[PqAdcLutExpr]]  (per query, once): vec → the m·ksub lookup table
 *    LUT[j·ksub+c] = dot(q_j, centroid(j,c));
 *  - [[PqAdcScoreExpr]] (per candidate pair, the hot path): approx dot =
 *    Σ_j LUT[j·ksub + codes[j]] — m array gathers, no arithmetic on the
 *    original D floats. This is the 100 TB point of PQ: the pair stage
 *    touches m bytes of codes + m table entries per candidate.
 *
 * All three accumulate doubles in the same index order as the HOF
 * formulation they replace, so results are bit-identical.
 */
object Pq {
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec),
      Codebook.flat(codebooks), codebooks.length, codebooks(0).length,
      codebooks(0)(0).length))

  def pq_adc_lut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcLutExpr(ColumnBridge.expression(vec),
      Codebook.flat(codebooks), codebooks.length, codebooks(0).length,
      codebooks(0)(0).length))

  def pq_adc_score(codes: Column, lut: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcScoreExpr(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut), ksub))
}

private[functions] object Codebook {
  /** Flatten codebooks(j)(c)(d) to one row-major double[] — a single
    * driver-side array the codegen references (not a literal tree). */
  def flat(cb: Array[Array[Array[Double]]]): Array[Double] = {
    val m = cb.length; val ksub = cb(0).length; val dsub = cb(0)(0).length
    val out = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(cb(j)(c), 0, out, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    out
  }
}

/** Shared accessor plumbing for the two codebook-bearing kernels. */
trait PqCodebookExpr extends UnaryExpression {
  def codebook: Array[Double]
  def m: Int
  def ksub: Int
  def dsub: Int
  protected def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  protected def getAsDouble(v: String, i: String): String = elemType match {
    case FloatType   => s"(double) $v.getFloat($i)"
    case DoubleType  => s"$v.getDouble($i)"
    case LongType    => s"(double) $v.getLong($i)"
    case IntegerType => s"(double) $v.getInt($i)"
    case t => throw new IllegalArgumentException(s"bad element type $t")
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"pq kernel needs a numeric array, got $t")
    }
}

/**
 * vec → array<int> of m nearest-centroid codes; per subspace the FIRST
 * index attaining the minimum squared distance wins (the tie-break the
 * HOF form's array_position(min) had). One inline codegen loop.
 */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
                        m: Int, ksub: Int, dsub: Int) extends PqCodebookExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val et = elemType
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var s = 0.0; var d = 0
        val base = (j * ksub + c) * dsub
        while (d < dsub) {
          val t = Sketch.toDoubleAt(v, et, j * dsub + d) - codebook(base + d)
          s += t * t; d += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val t = ctx.freshName("t"); val base = ctx.freshName("base")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $s = 0.0;
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $t = (${getAsDouble(v, s"$j * $dsub + $d")}) - $cb[$base + $d];
         |      $s += $t * $t;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/**
 * Query vec → the ADC lookup table: array<double> of m·ksub entries,
 * LUT[j·ksub+c] = dot(q_j, centroid(j,c)), each inner dot accumulated
 * in ascending dimension order (bit-compatible with the HOF form).
 * Computed ONCE per query row; at any corpus scale this stage is
 * queries-sized, never corpus-sized.
 */
case class PqAdcLutExpr(child: Expression, codebook: Array[Double],
                        m: Int, ksub: Int, dsub: Int) extends PqCodebookExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val et = elemType
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        var s = 0.0; var d = 0
        val base = (j * ksub + c) * dsub
        while (d < dsub) {
          s += codebook(base + d) * Sketch.toDoubleAt(v, et, j * dsub + d)
          d += 1
        }
        lut(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val lut = ctx.freshName("lut")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      s"""
         |double[] $lut = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $s = 0.0;
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $s += $cb[$base + $d] * (${getAsDouble(v, s"$j * $dsub + $d")});
         |    }
         |    $lut[$j * $ksub + $c] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_lut"
}

/**
 * (codes array<int>, lut array<double>) → Σ_j lut[j·ksub + codes[j]]:
 * the per-candidate ADC score — m gathers and m adds, the entire hot
 * path of the pair stage, inline in whole-stage codegen.
 */
case class PqAdcScoreExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0; var j = 0
    while (j < m) { s += lut.getDouble(j * ksub + codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val mm = ctx.freshName("m"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |int $mm = $codes.numElements();
         |double $s = 0.0;
         |for (int $j = 0; $j < $mm; $j++) {
         |  $s += $lut.getDouble($j * $ksub + $codes.getInt($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_score"
}
