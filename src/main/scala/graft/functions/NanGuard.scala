package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** ORDER BY key guard: QL forbids sorting by NaN — evaluation fails
  * with "Comparison with NaN" (cg_routines.cpp ThrowException path;
  * ql_query_ut.cpp OrderBy's EXPECT_THROW_THAT). Identity for every
  * non-floating type, so the emitter wraps every ORDER BY item
  * unconditionally; ordering is unchanged for the values that pass.
  */
case class NanGuard(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  private def isFloating = child.dataType == DoubleType || child.dataType == FloatType

  override def nullSafeEval(v: Any): Any = {
    if (isFloating) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
      }
      if (d.isNaN) throw new IllegalArgumentException("Comparison with NaN")
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val check =
        if (isFloating)
          s"""if (java.lang.Double.isNaN((double) $v)) {
             |  throw new IllegalArgumentException("Comparison with NaN");
             |}""".stripMargin
        else ""
      s"""$check
         |${ev.value} = $v;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
