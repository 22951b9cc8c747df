package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash of a document's token multiset — the
  * scan-local form of dedup_simhash's signature pass.
  *
  * The declarative formulation explodes one row per token and
  * aggregates SIXTY conditional-sum vote columns per document; this
  * kernel computes the same value in one pass inside whole-stage
  * codegen — no token explode, no 60-column agg shuffle.  Bit-exact
  * twin of the oracle: per token, the first 15 hex chars of md5
  * (60 bits — the widest prefix that stays in signed int64 range in
  * both engines), +1/-1 votes per bit over the token MULTISET, final
  * bit j set iff the vote sum is >= 0.
  *
  * Tokenization is Java split-on-single-space with trailing empties
  * preserved — exactly Spark's split(text, ' ').
  */
object SimHashKernel {
  val Bits = 60

  def simhash60(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val votes = new Array[Int](Bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < toks.length) {
      val dg = md.digest(toks(t)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars big-endian: 7 full bytes + high nibble of
      // the 8th
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dg(i) & 0xffL); i += 1 }
      v = (v << 4) | ((dg(7) & 0xffL) >>> 4)
      var j = 0
      while (j < Bits) {
        if (((v >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column wrapper. */
  def simhash60(text: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(text)))
}

/** text -> 60-bit SimHash (see [[SimHashKernel.simhash60]]). */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash60(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.simhash60($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
