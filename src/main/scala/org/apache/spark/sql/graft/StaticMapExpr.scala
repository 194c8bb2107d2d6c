package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StructField, StructType}

/** StaticMap (basic.md#staticmap): apply a one-argument lambda to
  * every member of a struct or tuple; the result keeps the member
  * names, each member's type is the lambda's result type FOR THAT
  * member — the lambda binds once PER MEMBER (heterogeneous members
  * welcome, e.g. the StaticZip doc example's mixed tuples). */
final case class StaticMapExpr(
    argument: Expression,
    function: Expression,
    bound: Seq[Expression] = Nil)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
  with CodegenFallback {

  import org.apache.spark.sql.catalyst.expressions.{LambdaFunction, NamedLambdaVariable}
  import org.apache.spark.sql.types.AbstractDataType

  private def src: StructType =
    argument.dataType match {
      case s: org.apache.spark.sql.types.StructType => s
      case other => throw new IllegalArgumentException(
        s"StaticMap expects a struct argument, got ${other.simpleString}")
    }

  override def arguments: Seq[Expression] = Seq(argument)
  override def argumentTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.AnyDataType)
  override def functions: Seq[Expression] =
    if (bound.nonEmpty) bound else Seq(function)
  override def functionTypes: Seq[AbstractDataType] =
    functions.map(_ => org.apache.spark.sql.types.AnyDataType)

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction)
      : org.apache.spark.sql.catalyst.expressions.HigherOrderFunction =
    copy(bound = src.fields.toSeq.map(fd =>
      f(function, Seq((fd.dataType, fd.nullable)))))

  override def dataType: DataType = StructType(
    src.fields.zip(bound).map { case (fd, b) =>
      StructField(fd.name, b.dataType, b.nullable) })
  override def nullable: Boolean = argument.nullable
  override def prettyName: String = "staticmap"

  override def checkInputDataTypes(): TypeCheckResult =
    argument.dataType match {
      case s: StructType if s.fields.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"StaticMap expects a struct or tuple, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = argument.eval(input)
    if (v == null) return null
    val row = v.asInstanceOf[InternalRow]
    val fe = functionsForEval
    new GenericInternalRow(src.fields.indices.map { i =>
      bound(i).asInstanceOf[LambdaFunction].arguments.head
        .asInstanceOf[NamedLambdaVariable].value
        .set(row.get(i, src.fields(i).dataType))
      fe(i).eval(input)
    }.toArray[Any])
  }

  override def children: Seq[Expression] = arguments ++ functions
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    if (bound.nonEmpty) copy(argument = newChildren.head,
      bound = newChildren.tail)
    else copy(argument = newChildren.head, function = newChildren(1))
}

