package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, LongType, StructField, StructType}

/** Generator: all ordered pairs (a, b) with i < j of a long array —
  * the posting-list → candidate-pairs step of similarity joins
  * (Dedup.coShinglePairs packs (doc_id, setSize) into each long).
  *
  * Why a Generator and not the nested-HOF pair expression
  * (`flatten(transform(sequence…, transform(slice…)))`): higher-order
  * functions evaluate interpreted, paying a lambda frame + slice
  * allocation per element — O(k²) interpreted steps per k-wide
  * posting list, which dominates exact-Jaccard dedup once the hot
  * lists grow (the 20× stress corpus emits ~10⁹ pairs). This emits
  * each pair from one two-index loop, allocating only the row it
  * yields, and streams them through the iterator (never materializing
  * a k²-sized array value per input row the way the HOF form must).
  */
case class PairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) Iterator.empty
    else {
      val xs = value.asInstanceOf[ArrayData].toLongArray()
      val n = xs.length
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = j < n
        override def next(): InternalRow = {
          val row = InternalRow(xs(i), xs(j))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairExplode =
    copy(child = newChild)

  override def prettyName: String = "pair_explode"
}
