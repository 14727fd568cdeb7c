package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns using Spark's
  * higher-order functions — codegen'd, no UDFs, no serialization off
  * the Tungsten row format. Accumulation is sequential in index order
  * (deterministic, engine-portable).
  *
  * Scale note: these are per-row scalar expressions — narrow, fully
  * pipelined, and safe inside whole-stage codegen at any data size.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — a native codegen'd Expression (the higher-order
    * `aggregate(zip_with(...))` formulation is CodegenFallback, i.e.
    * interpreted per element — too slow for the ANN hot loops; see
    * [[graft.functions.expressions.DotProduct]]). Identical semantics
    * and bit-identical results to [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.dotProduct(a, b)

  /** The declarative higher-order formulation — kept as the reference
    * implementation (and the shape the DuckDB oracle mirrors with
    * `list_dot_product`). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = a·b / (‖a‖‖b‖); NULL if either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na =!= 0.0 && nb =!= 0.0, dot(a, b) / (na * nb))
  }

  /** Squared euclidean distance Σ (aᵢ-bᵢ)². */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-bit locality hash over the first `bits` coordinates:
    * concatenated '1'/'0' per sign(vᵢ) — a deterministic, engine-
    * portable LSH family (coordinate hyperplanes). Vectors in the same
    * bucket agree on the signs of their leading coordinates, so
    * bucket-local search only compares plausibly-close vectors. */
  def signBucket(v: Column, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(v, i + 1) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
