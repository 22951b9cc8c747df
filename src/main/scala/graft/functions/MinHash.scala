package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash substrate: the scan-local form of the dedup
  * pipeline's shingle -> signature computation.
  *
  * The declarative formulation (graft.queries.DedupQueries.shingles)
  * explodes one row per word 3-gram, distincts them with a shuffle,
  * and aggregates 16 mins per document with another shuffle — then the
  * jaccard verify joins the exploded table twice more.  These kernels
  * compute the same values inside whole-stage codegen with ZERO
  * pre-candidate shuffles:
  *
  *  - [[ShingleHashes]]: text -> sorted distinct 31-bit shingle-hash
  *    set (one pass, one md5 per shingle),
  *  - [[MinHashSig]]: hash set -> 16-slot signature (integer mixes of
  *    the shared [[MinHashKernel.AB]] universal-hash family),
  *  - [[SortedIntersect]]: two sorted sets -> |A ∩ B| by linear merge
  *    (the jaccard verify without re-joining an exploded table).
  *
  * Reference semantics: near-duplicate collapse of re-generated
  * narratives (data_generation/generate_narratives_from_data.py:95-96
  * derives per-record output names whose collisions are the only dedup
  * the reference performs); same hash grid as the DuckDB oracle
  * (md5 first-8-hex-chars mod 2^31-1), so results stay bit-identical
  * to the declarative form and the oracle.
  */
object MinHashKernel {
  val P = 2147483647L // 2^31 - 1
  val NumHashes = 16

  /** The universal-hash family (a_k, b_k), identical to the generator
    * the declarative pipeline and the DuckDB oracle interpolate —
    * xorshift from a fixed seed, operands in [1, P-1]. */
  val AB: IndexedSeq[(Long, Long)] = {
    var state = 1234567891011L
    def next(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      math.floorMod(state, P - 1) + 1
    }
    IndexedSeq.fill(NumHashes)((next(), next()))
  }

  private val as: Array[Long] = AB.map(_._1).toArray
  private val bs: Array[Long] = AB.map(_._2).toArray

  /** Sorted distinct word-3-gram hash set of a document.  Tokenization
    * is Java split-on-single-space with trailing empties preserved —
    * exactly Spark's split(text, ' ') — and each shingle is hashed as
    * the UTF-8 bytes of "t1 t2 t3", first 4 md5 bytes as an unsigned
    * 32-bit value mod P (the '0x'||substr(md5,1,8) reduction).
    * Documents with < 3 tokens return an empty array (the declarative
    * filter(n >= 3)). */
  def shingleHashes(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length - 2
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      set.add(v % P)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** 16-slot MinHash signature of a hash set: slot k is
    * min over h of (a_k * h + b_k) mod P.  Empty input -> empty
    * signature (callers filter those rows out first). */
  def minhashSig(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val sig = new Array[Long](NumHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < NumHashes) {
        val m = (as(k) * h + bs(k)) % P
        if (m < sig(k)) sig(k) = m
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** |A ∩ B| of two SORTED long arrays by linear merge. */
  def sortedIntersect(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  // ------------------------------------------------- Column wrappers
  def shingleHashes(text: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text)))
  def minhashSig(hashes: Column): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes)))
  def sortedIntersect(a: Column, b: Column): Column =
    Bridge.column(SortedIntersect(Bridge.expression(a), Bridge.expression(b)))
}

/** text -> sorted distinct 31-bit word-3-gram hash set (see
  * [[MinHashKernel.shingleHashes]]). */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHashes(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.shingleHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<bigint> hash set -> 16-slot MinHash signature (see
  * [[MinHashKernel.minhashSig]]). */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.minhashSig(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.minhashSig($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| of two sorted array<bigint> columns (see
  * [[MinHashKernel.sortedIntersect]]).  Both inputs MUST be sorted
  * ascending (as [[ShingleHashes]] emits); unsorted input silently
  * undercounts. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashKernel.sortedIntersect(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinHashKernel.sortedIntersect($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
