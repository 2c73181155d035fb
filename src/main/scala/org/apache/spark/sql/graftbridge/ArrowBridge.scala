package org.apache.spark.sql.graftbridge

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

/** Spark 4 keeps its Arrow interop (`ArrowUtils`, `ArrowWriter`,
  * `internalCreateDataFrame`) `private[sql]`; this bridge re-exports the
  * minimal surface graft's Arrow IPC source/sink needs, so the IPC files are
  * produced/consumed by Spark's OWN row↔vector converters (type-complete,
  * codegen-tested) rather than a hand-rolled mapping.
  */
object ArrowBridge {

  def toArrowSchema(schema: StructType, timeZoneId: String): org.apache.arrow.vector.types.pojo.Schema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  def fromArrowSchema(schema: org.apache.arrow.vector.types.pojo.Schema): StructType =
    ArrowUtils.fromArrowSchema(schema)

  def newChildAllocator(name: String): BufferAllocator =
    ArrowUtils.rootAllocator.newChildAllocator(name, 0, Long.MaxValue)

  /** InternalRow → Arrow vectors, backed by Spark's own ArrowWriter. */
  final class RowVectorWriter(root: VectorSchemaRoot) {
    private val w = ArrowWriter.create(root)
    def write(row: InternalRow): Unit = w.write(row)
    def finish(): Unit = w.finish()
    def reset(): Unit = w.reset()
  }

  /** Arrow vectors → copied UnsafeRows (safe to buffer downstream). */
  def batchRows(root: VectorSchemaRoot, schema: StructType): Iterator[InternalRow] = {
    val cols: Array[ColumnVector] =
      root.getFieldVectors.toArray(Array.empty[org.apache.arrow.vector.FieldVector])
        .map(v => new ArrowColumnVector(v): ColumnVector)
    val batch = new ColumnarBatch(cols, root.getRowCount)
    val proj = UnsafeProjection.create(schema)
    import scala.jdk.CollectionConverters._
    batch.rowIterator().asScala.map(r => proj(r).copy(): InternalRow)
  }

  def toRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
