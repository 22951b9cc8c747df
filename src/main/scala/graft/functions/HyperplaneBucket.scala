package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: the integer random-hyperplane LSH bucket
  * of an array<float> embedding — bit j set iff
  * sum_d floor(x_d * 1e6) * w[j][d] >= 0 — fused into one codegen'd
  * two-level loop over the vector.
  *
  * Versus the HOF formulation (one zip_with + aggregate fold PER PLANE,
  * interpreted outside whole-stage codegen): a single pass scales each
  * component once and feeds all plane accumulators, no intermediate
  * arrays, plain JIT-friendly primitive loops. All arithmetic is
  * integer (the same floor(x*1e6) grid both engines share), and long
  * addition is associative, so the bucket is BIT-IDENTICAL to the HOF
  * form and to the oracle's SQL mirror — HyperplaneBucketSpec pins the
  * parity. NULL on null input or a length mismatch with the plane
  * dimension (the HOF zip_with null-pads and nulls the fold the same
  * way).
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression {

  private val nPlanes = planes.length
  private val dim = planes.head.length
  require(nPlanes >= 1 && nPlanes <= 63, "plane count must fit a long mask")
  require(planes.forall(_.length == dim), "ragged plane matrix")

  @transient private lazy val flat: Array[Long] =
    planes.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val dots = new Array[Long](nPlanes)
    var d = 0
    while (d < dim) {
      val v = math.floor(a.getFloat(d).toDouble * 1e6).toLong
      var j = 0
      while (j < nPlanes) { dots(j) += v * flat(j * dim + d); j += 1 }
      d += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) { if (dots(j) >= 0L) bucket |= 1L << j; j += 1 }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("planes", flat, "long[]")
      val dots = ctx.freshName("dots")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $dots = new long[$nPlanes];
         |  for (int $d = 0; $d < $dim; $d++) {
         |    long $v = (long) Math.floor(((double) $a.getFloat($d)) * 1.0E6);
         |    for (int $j = 0; $j < $nPlanes; $j++) {
         |      $dots[$j] += $v * $w[$j * $dim + $d];
         |    }
         |  }
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    if ($dots[$j] >= 0L) $bucket |= 1L << $j;
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Column wrapper for the native kernel. */
  def hyperplaneBucket(emb: Column, planes: Seq[Seq[Long]]): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(emb), planes))
}
