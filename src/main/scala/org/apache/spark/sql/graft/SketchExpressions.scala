package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers for Catalyst's Bloom-filter expressions, which Spark
  * builds only through its internal runtime row-level-filtering rule
  * (`InjectRuntimeFilter`) and does not register as SQL functions.
  *
  * The intended shape mirrors that rule: AGGREGATE the small side's
  * join-key hashes into one bounded binary sketch, then PREFILTER the
  * huge side with `might_contain` as a map-side scan predicate —
  * non-candidate rows never reach the shuffle. `might_contain` requires
  * its bloom operand to be a constant (Catalyst rejects a per-row
  * bloom column), so the built sketch rides as a Literal — the same
  * driver-held bounded-artifact contract as the collected k-means
  * centroids (a few MB at any corpus size, set by numBits, NOT by the
  * filtered corpus). */
object SketchExpressions {

  /** Aggregate `hash` (LongType, e.g. xxhash64) into a Bloom filter
    * binary. `numBits` bounds the sketch size (Spark's own runtime
    * filter caps at 67,108,864 bits = 8 MB; callers should stay under
    * that). Returns NULL on empty input — callers must branch. */
  def bloomAgg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hash),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `hash` against a built sketch. False
    * positives possible (rate set by the build's numBits/items), false
    * negatives impossible — ALWAYS verify candidates exactly
    * downstream when the consumer needs exactness. */
  def mightContain(bloom: Array[Byte], hash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), ExpressionUtils.expression(hash)))
}
