package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch}

/**
 * Arrow interchange for grouped rows (≙ Summarizers.arrow,
 * /root/reference/src/main/scala/com/twosigma/flint/timeseries/Summarizers.scala:37-46,
 * whose ArrowSummarizer — timeseries/summarize/summarizer/
 * ArrowSummarizer.scala:38-81 — collects each window's rows into one Arrow
 * record batch for zero-copy hand-off to Python).
 *
 * Spark-native mapping: the group's rows are first gathered with the same
 * `collect_list(struct(...))` shape every other aggregation-mode summarizer
 * uses, then [[ArrowBatchBytes]] serializes the array<struct> to an Arrow
 * IPC *stream* (schema + one record batch) using Spark's own ArrowWriter —
 * the exact wire format `pyarrow.ipc.open_stream` consumes, and the same
 * writer Spark's Pandas-UDF exchange uses. [[ArrowRowsFromBatch]] is the
 * inverse (for JVM-side round-trips and tests).
 *
 * Both expressions run once per GROUP (not per row) on aggregation output,
 * so interpreted evaluation (CodegenFallback) costs one virtual call per
 * batch — the per-value work inside is Spark's vectorized ArrowWriter.
 */
object ArrowColumns {
  /** array<struct<...>> column -> Arrow IPC stream bytes (binary column). */
  def toArrowBatch(rows: Column): Column =
    ExpressionUtils.column(ArrowBatchBytes(ExpressionUtils.expression(rows)))

  /** Arrow IPC stream bytes -> array<struct<...>> with the given schema. */
  def fromArrowBatch(bytes: Column, schema: StructType): Column =
    ExpressionUtils.column(
      ArrowRowsFromBatch(ExpressionUtils.expression(bytes), schema))
}

case class ArrowBatchBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private lazy val structType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StructType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arrow batch input must be array<struct>, got ${other.sql}")
    }

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = structType.length
    val arrowSchema = ArrowUtils.toArrowSchema(structType, "UTC",
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graftArrowBatch", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val writer = ArrowWriter.create(root)
      var i = 0
      while (i < arr.numElements()) {
        writer.write(if (arr.isNullAt(i)) null else arr.getStruct(i, n))
        i += 1
      }
      writer.finish()
      val out = new ByteArrayOutputStream()
      val stream = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      stream.start(); stream.writeBatch(); stream.end()
      out.toByteArray
    } finally {
      root.close()
      allocator.close()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArrowBatchBytes =
    copy(child = newChild)
}

case class ArrowRowsFromBatch(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arrow batch bytes must be binary, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(schema, containsNull = true)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graftArrowRead", 0, Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      while (reader.loadNextBatch()) {
        val root = reader.getVectorSchemaRoot
        val vectors = root.getFieldVectors.toArray.map(v =>
          new ArrowColumnVector(v.asInstanceOf[org.apache.arrow.vector.FieldVector])
            : org.apache.spark.sql.vectorized.ColumnVector)
        val batch = new ColumnarBatch(vectors, root.getRowCount)
        val it = batch.rowIterator()
        while (it.hasNext) out += it.next().copy()
      }
      new GenericArrayData(out.toArray)
    } finally {
      reader.close()
      allocator.close()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArrowRowsFromBatch =
    copy(child = newChild)
}
