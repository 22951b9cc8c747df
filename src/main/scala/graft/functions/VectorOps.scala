package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math on ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate / transform) —
  * no UDFs, so whole-stage codegen stays unbroken across the scoring
  * pipeline (SURVEY.md §2.8, §4.3).
  *
  * Numerical contract shared with the DuckDB oracle (see the *Sql
  * fragments): float32 components are widened to float64 (exact), products
  * of widened float32 are exact in float64, and every accumulation is a
  * sequential left fold in array order — so Spark and DuckDB produce
  * bit-identical doubles, which is what lets the driver hash-compare
  * scores. The same property makes results reproducible across partition
  * layouts at cluster scale: nothing here depends on row or partition
  * order.
  *
  * Reference: the embedding pipeline of
  * rag_evaluation/RAG-eval-test_model.py:36-117 (mean-pool + normalize +
  * full-corpus cosine ranking).
  */
object VectorOps {

  /** Widen array<float> to array<double> (exact). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold sum of an array<double>. */
  def foldSum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<float> columns, in double. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  /** Sum of squares in double. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity of two array<float> embedding columns.
    * Uses the fused native Catalyst kernel (one codegen'd loop, no
    * intermediate arrays); bit-identical to the HOF formulation
    * [[cosineHof]] — same per-accumulator fold order. */
  def cosine(a: Column, b: Column): Column =
    CosineSimilarity.cosineNative(a, b)

  /** HOF formulation of [[cosine]], kept as the public-API-only
    * fallback and for the parity test against the native kernel.
    * nullif guards the zero-norm case: x/NULL -> NULL instead of an
    * ANSI DIVIDE_BY_ZERO, matching the native kernel's NULL on
    * degenerate vectors (values on non-zero norms are untouched, so
    * the bit-parity claim is preserved). */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(norm2(a)) * sqrt(norm2(b)), lit(0.0))

  /** Mean over components (the reference's mean-pool,
    * RAG-eval-test_model.py:81-83). */
  def meanPool(v: Column): Column = foldSum(asDouble(v)) / size(v)

  /** L2-normalized copy (normalize_embeddings=True,
    * RAG-eval-test_model.py:42,51,59).
    *
    * The norm is materialized into a parallel array (array_repeat) and
    * consumed through zip_with's lambda VARIABLES, never referenced as a
    * subtree inside a lambda BODY: HOF lambdas evaluate interpreted and
    * re-evaluate any embedded expression per element, which turns an
    * inlined sqrt(norm2(v)) into an O(d^2)-per-row fold (measured ~10x
    * on the l2_normalize query; worse once optimizer projection collapse
    * inlines upstream columns). Same values, same fold order — oracle
    * parity unchanged. */
  def l2Normalize(v: Column): Column =
    zip_with(asDouble(v), array_repeat(sqrt(norm2(v)), size(v)), (x, n) => x / n)

  // ------------------------------------------------------------------
  // DuckDB oracle fragments — keep op-for-op identical to the Columns
  // above (same widening, same fold order).
  // ------------------------------------------------------------------

  def foldSumSql(v: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, $v), (acc, x) -> acc + x)"

  def dotSql(a: String, b: String): String =
    foldSumSql(s"list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE)")

  def norm2Sql(a: String): String = dotSql(a, a)

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)})))"

  def meanPoolSql(v: String): String =
    s"(${foldSumSql(s"list_transform($v, x -> x::DOUBLE)")} / len($v))"

  /** Plain-Scala cosine for executor-side state code (the streaming
    * near-dup processor) — the SAME loop as the native kernel's
    * nullSafeEval (CosineSimilarity.scala): one pass, three double
    * accumulators in array order, None on length mismatch or a zero
    * norm. Keeping the op order identical is what lets the streaming
    * verdicts be compared 1:1 against batch kernel scores. */
  def cosineScala(a: Array[Float], b: Array[Float]): Option[Double] = {
    if (a.length != b.length) return None
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    if (aa == 0.0 || bb == 0.0) None
    else Some(ab / (math.sqrt(aa) * math.sqrt(bb)))
  }
}
