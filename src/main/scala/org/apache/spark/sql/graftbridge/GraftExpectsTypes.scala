package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/** Bridge trait: `ExpectsInputTypes.inputTypes` returns the
  * `private[sql]` `AbstractDataType`, so expressions living outside
  * the spark namespace can't override it directly. Implementors
  * declare concrete public `DataType`s via [[expectedTypes]]; the
  * analyzer then inserts implicit widening casts (or rejects with an
  * AnalysisException) instead of letting the interpreted and codegen
  * paths diverge on an unexpected input type.
  */
trait GraftExpectsTypes extends ImplicitCastInputTypes {
  /** Concrete declared input types, one per child. */
  def expectedTypes: Seq[DataType]
  override def inputTypes: Seq[AbstractDataType] = expectedTypes
}
