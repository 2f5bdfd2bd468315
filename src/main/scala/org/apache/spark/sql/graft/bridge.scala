package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion (the
  * Spark 4 replacement for the removed public `new Column(expr)` /
  * `Column.expr`). Lives under `org.apache.spark.sql` solely for access; no
  * Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into Spark's `private[sql]` Arrow machinery: the per-partition
  * Arrow serializer Spark uses for its own Python/R interchange, and the
  * Spark↔Arrow schema mapping. Same access-only rationale as
  * [[ColumnBridge]].
  */
object ArrowBridge {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types.StructType
  import org.apache.spark.sql.util.ArrowUtils

  /** Serialize each partition to Arrow IPC record-batch messages using
    * Spark's internal `ArrowWriter`, which writes straight from
    * `InternalRow`s — rows are never materialized as JVM objects on the way
    * out. Each array is one record-batch message (no schema header; pair
    * with [[toArrowSchema]] to interpret). */
  def toBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].toArrowBatchRdd

  /** Spark's own StructType → Arrow schema mapping (matches what
    * [[toBatchRdd]] emitted: default var-width types, duplicate names
    * rejected). */
  def toArrowSchema(schema: StructType, timeZoneId: String)
      : org.apache.arrow.vector.types.pojo.Schema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
}
