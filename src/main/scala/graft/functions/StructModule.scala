package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The struct-builtins family (docs yt/docs/en/yql/builtins/struct.md;
  * reference implementation yql/essentials/core/type_ann — struct type
  * operators are ANALYSIS-TIME in the reference, typed against member
  * names known at compile time).
  *
  * Spark-first shape: every function is a Catalyst expression whose
  * result schema derives from the child's resolved StructType at
  * analysis (so errors — missing member, duplicate member, mixed item
  * types — surface as analysis errors, like the reference's type
  * annotator), and whose row work is a field shuffle. Struct-producing
  * results use the reference's canonical member order (lexicographic —
  * YQL's Struct type sorts members by name).
  *
  * AddMember/ExpandStruct/RemoveMember(s) lower in [[YqlSql]] onto
  * Spark's own UpdateFields machinery guarded by [[AssertFieldsExpr]];
  * the schema-reshaping rest lives here.
  */
object StructModule {

  private[functions] def structOf(dt: DataType, fn: String): StructType =
    dt match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"$fn expects a struct argument, got ${other.simpleString}")
    }

  /** Canonical YQL member order: lexicographic by name. */
  private[functions] def sortedFields(s: StructType): Array[(StructField, Int)] =
    s.fields.zipWithIndex.sortBy(_._1.name)
}

/** Zero-cost pass-through asserting member presence (mustExist) or
  * absence (!mustExist) at analysis time — the guard under
  * AddMember/ExpandStruct/RemoveMember(s) duplicate/missing errors. */
final case class AssertFieldsExpr(
    child: Expression,
    names: Seq[String],
    mustExist: Boolean,
    fn: String) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = fn.toLowerCase

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      val have = s.fieldNames.toSet
      val bad = if (mustExist) names.filterNot(have) else names.filter(have)
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$fn: member '${bad.head}' " +
          (if (mustExist) "is not present in " else "already exists in ") +
          s.simpleString)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects a struct argument, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reorder a struct's members into the canonical lexicographic order
  * (YQL Struct member order) — the finishing step of every
  * struct-producing builtin here. */
final case class SortStructExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private lazy val src = StructModule.structOf(child.dataType, "SortStruct")
  private lazy val order = StructModule.sortedFields(src)

  override def dataType: DataType = StructType(order.map(_._1))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sortstruct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"struct builtin expects a struct, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val row = v.asInstanceOf[InternalRow]
    new GenericInternalRow(order.map { case (f, i) =>
      row.get(i, f.dataType) }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CombineMembers (prefixes all empty) / FlattenMembers (struct.md):
  * concatenate the members of N structs into one struct, optionally
  * prefixing each source's member names; duplicate result names are an
  * analysis error. Optional (nullable) struct arguments contribute
  * null members when the value is null. */
final case class CombineMembersExpr(
    children: Seq[Expression],
    prefixes: Seq[String],
    fn: String) extends Expression with CodegenFallback {

  private lazy val parts: Seq[StructType] =
    children.map(c => StructModule.structOf(c.dataType, fn))
  // (childIdx, fieldIdx, resultField) in canonical order
  private lazy val layout: Seq[(Int, Int, StructField)] = {
    val all = parts.zipWithIndex.flatMap { case (s, ci) =>
      s.fields.zipWithIndex.map { case (f, fi) =>
        (ci, fi, f.copy(name = prefixes(ci) + f.name,
          nullable = f.nullable || children(ci).nullable))
      }
    }
    all.sortBy(_._3.name)
  }

  override def dataType: DataType = StructType(layout.map(_._3).toArray)
  override def nullable: Boolean = false
  override def prettyName: String = fn.toLowerCase

  override def checkInputDataTypes(): TypeCheckResult = {
    val notStruct = children.find(!_.dataType.isInstanceOf[StructType])
    if (notStruct.isDefined)
      return TypeCheckResult.TypeCheckFailure(
        s"$fn expects struct arguments, got " +
          notStruct.get.dataType.simpleString)
    val dup = layout.map(_._3.name).groupBy(identity)
      .collectFirst { case (n, g) if g.length > 1 => n }
    dup match {
      case Some(n) => TypeCheckResult.TypeCheckFailure(
        s"$fn: duplicate member '$n' in the combined struct")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val rows = children.map(_.eval(input))
    new GenericInternalRow(layout.map { case (ci, fi, f) =>
      val r = rows(ci)
      if (r == null) null
      else r.asInstanceOf[InternalRow].get(fi, parts(ci).fields(fi).dataType)
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** StructMembers (struct.md#structmembers): the member-name list;
  * `[]` for a null input. */
final case class StructMembersExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private lazy val names: ArrayData = new GenericArrayData(
    StructModule.sortedFields(StructModule.structOf(child.dataType,
      "StructMembers")).map(f => UTF8String.fromString(f._1.name)))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "structmembers"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"StructMembers expects a struct, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any =
    if (child.dataType == NullType || child.eval(input) == null)
      new GenericArrayData(Array.empty[Any])
    else names
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** GatherMembers (struct.md#gathermembers): List<Tuple<String, V>> of
  * (name, value) in canonical member order; member types must agree;
  * `[]` for a null input. Tuples are the engine's canonical
  * `_1`/`_2` positional structs. */
final case class GatherMembersExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private lazy val src = StructModule.structOf(child.dataType, "GatherMembers")
  private lazy val order = StructModule.sortedFields(src)
  private lazy val itemType: DataType = order.head._1.dataType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", StringType, nullable = false),
    StructField("_2", itemType))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gathermembers"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty =>
      val ts = s.fields.map(_.dataType.sql).distinct
      if (ts.length == 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "GatherMembers needs identical member types, got " +
          ts.mkString(", "))
    case _: StructType => TypeCheckResult.TypeCheckFailure(
      "GatherMembers needs a non-empty struct")
    case other => TypeCheckResult.TypeCheckFailure(
      s"GatherMembers expects a struct, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val row = v.asInstanceOf[InternalRow]
    new GenericArrayData(order.map { case (f, i) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(f.name), row.get(i, f.dataType)))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RenameMembers / ForceRenameMembers (struct.md): rename members by a
  * literal (from, to) rule list; a source may fan out to several new
  * names; untouched members carry over; missing sources error in the
  * strict form and are ignored in the Force form. */
final case class RenameMembersExpr(
    child: Expression,
    rules: Seq[(String, String)],
    force: Boolean) extends UnaryExpression with CodegenFallback {

  private def fn = if (force) "ForceRenameMembers" else "RenameMembers"
  private lazy val src = StructModule.structOf(child.dataType, fn)
  private lazy val idx: Map[String, Int] =
    src.fieldNames.zipWithIndex.toMap
  // (resultField, sourceFieldIdx) in canonical order
  private lazy val layout: Seq[(StructField, Int)] = {
    val sources = rules.map(_._1).toSet
    val kept = src.fields.zipWithIndex.toSeq
      .filterNot { case (f, _) => sources(f.name) }
      .map { case (f, i) => (f, i) }
    val renamed = rules.flatMap { case (from, to) =>
      idx.get(from).map(i => (src.fields(i).copy(name = to), i))
    }
    (kept ++ renamed).sortBy(_._1.name)
  }

  override def dataType: DataType = StructType(layout.map(_._1).toArray)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = fn.toLowerCase

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      val missing = rules.map(_._1).filterNot(s.fieldNames.toSet)
      if (!force && missing.nonEmpty)
        TypeCheckResult.TypeCheckFailure(
          s"$fn: member '${missing.head}' is not present in ${s.simpleString}")
      else {
        val dup = layout.map(_._1.name).groupBy(identity)
          .collectFirst { case (n, g) if g.length > 1 => n }
        dup match {
          case Some(n) => TypeCheckResult.TypeCheckFailure(
            s"$fn: duplicate member '$n' after renaming")
          case None => TypeCheckResult.TypeCheckSuccess
        }
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects a struct, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val row = v.asInstanceOf[InternalRow]
    new GenericInternalRow(layout.map { case (f, i) =>
      row.get(i, src.fields(i).dataType) }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SpreadMembers / ForceSpreadMembers (struct.md): build a struct with
  * the given member-name list from a runtime (name, value) tuple list;
  * every member type is the value type made optional; unmentioned
  * members are null; the LAST correction per member wins; a correction
  * naming an unknown member errors in the strict form and is ignored
  * in the Force form. */
final case class SpreadMembersExpr(
    pairs: Expression,
    keys: Seq[String],
    force: Boolean) extends UnaryExpression with CodegenFallback {

  override def child: Expression = pairs
  private def fn = if (force) "ForceSpreadMembers" else "SpreadMembers"
  private lazy val valueType: DataType = pairs.dataType match {
    case ArrayType(s: StructType, _) if s.fields.length == 2 &&
        s.fields(0).dataType == StringType => s.fields(1).dataType
    case other => throw new IllegalArgumentException(
      s"$fn expects List<Tuple<String, T>>, got ${other.simpleString}")
  }
  private lazy val sortedKeys = keys.sorted
  private lazy val keyIdx: Map[String, Int] = sortedKeys.zipWithIndex.toMap

  override def dataType: DataType = StructType(
    sortedKeys.map(k => StructField(k, valueType, nullable = true)).toArray)
  override def nullable: Boolean = pairs.nullable
  override def prettyName: String = fn.toLowerCase

  override def checkInputDataTypes(): TypeCheckResult = pairs.dataType match {
    case ArrayType(s: StructType, _) if s.fields.length == 2 &&
        s.fields(0).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects List<Tuple<String, T>>, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = pairs.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val out = Array.fill[Any](sortedKeys.length)(null)
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getStruct(i, 2)
      val name = t.getUTF8String(0).toString
      keyIdx.get(name) match {
        case Some(j) => out(j) = t.get(1, valueType)
        case None if force => // ignored
        case None => throw new IllegalArgumentException(
          s"$fn: correction names unknown member '$name'")
      }
      i += 1
    }
    new GenericInternalRow(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(pairs = newChild)
}

/** ListUnionAll (list.md#listunionall): concatenate lists of structs;
  * the result struct carries the union of the member names (canonical
  * order), members absent from a source list are null. Same-named
  * members must agree on type (the documented common-type widening is
  * served by the engine's type bijection — mismatches error at
  * analysis). */
final case class ListUnionAllExpr(children: Seq[Expression])
  extends Expression with CodegenFallback {

  private lazy val parts: Seq[StructType] = children.map(_.dataType match {
    case ArrayType(s: StructType, _) => s
    case other => throw new IllegalArgumentException(
      s"ListUnionAll expects lists of structs, got ${other.simpleString}")
  })
  private lazy val fields: Seq[StructField] =
    parts.flatMap(_.fields).groupBy(_.name).toSeq.sortBy(_._1)
      .map { case (n, fs) => StructField(n, fs.head.dataType,
        nullable = true) }
  // per source: result-field index → source-field index (or -1)
  private lazy val mapping: Seq[Array[Int]] = parts.map { s =>
    fields.map(f => s.fieldNames.indexOf(f.name)).toArray
  }

  override def dataType: DataType =
    ArrayType(StructType(fields.toArray), containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "listunionall"

  override def checkInputDataTypes(): TypeCheckResult = {
    val notList = children.find(c => !(c.dataType match {
      case ArrayType(_: StructType, _) => true
      case _ => false
    }))
    if (notList.isDefined)
      return TypeCheckResult.TypeCheckFailure(
        "ListUnionAll expects lists of structs, got " +
          notList.get.dataType.simpleString)
    val clash = parts.flatMap(_.fields).groupBy(_.name).collectFirst {
      case (n, fs) if fs.map(_.dataType.sql).distinct.length > 1 => n
    }
    clash match {
      case Some(n) => TypeCheckResult.TypeCheckFailure(
        s"ListUnionAll: member '$n' has conflicting types across lists")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    children.indices.foreach { ci =>
      val v = children(ci).eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        val src = parts(ci)
        var i = 0
        while (i < arr.numElements()) {
          val row = arr.getStruct(i, src.fields.length)
          out += new GenericInternalRow(mapping(ci).zipWithIndex.map {
            case (si, fi) =>
              if (si < 0 || row == null) null
              else row.get(si, src.fields(si).dataType)
          }.toArray[Any])
          i += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** StaticZip (basic.md#staticzip): merge structs (same member names)
  * or tuples (same length) element-by-element — each result member is
  * the tuple of the inputs' members. */
final case class StaticZipExpr(children: Seq[Expression])
  extends Expression with CodegenFallback {

  private lazy val parts: Seq[StructType] =
    children.map(c => StructModule.structOf(c.dataType, "StaticZip"))
  private lazy val names: Seq[String] = parts.head.fieldNames.toSeq
  // per input: member index aligned to names
  private lazy val align: Seq[Array[Int]] =
    parts.map(p => names.map(n => p.fieldNames.indexOf(n)).toArray)

  override def dataType: DataType = StructType(names.zipWithIndex.map {
    case (n, i) =>
      StructField(n, StructType(parts.zip(align).zipWithIndex.map {
        case ((p, a), pi) =>
          val f = p.fields(a(i))
          StructField(s"_${pi + 1}", f.dataType, f.nullable)
      }.toArray))
  }.toArray)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "staticzip"

  override def checkInputDataTypes(): TypeCheckResult = {
    val notStruct = children.find(!_.dataType.isInstanceOf[StructType])
    if (notStruct.isDefined)
      return TypeCheckResult.TypeCheckFailure(
        "StaticZip expects structs or tuples, got " +
          notStruct.get.dataType.simpleString)
    if (parts.exists(p => p.fieldNames.toSet != names.toSet))
      TypeCheckResult.TypeCheckFailure(
        "StaticZip arguments must share one member set: " +
          parts.map(_.simpleString).mkString(" vs "))
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val rows = children.map(_.eval(input))
    if (rows.exists(_ == null)) return null
    new GenericInternalRow(names.indices.map { i =>
      new GenericInternalRow(parts.indices.map { pi =>
        rows(pi).asInstanceOf[InternalRow]
          .get(align(pi)(i), parts(pi).fields(align(pi)(i)).dataType)
      }.toArray[Any]): Any
    }.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** TryMember (struct.md#trymember): the member's value if the member
  * exists AND is non-null, else the default; member and default types
  * must agree when the member exists. Null struct → null. */
final case class TryMemberExpr(
    struct: Expression,
    name: String,
    default: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(struct, default)
  private lazy val src = StructModule.structOf(struct.dataType, "TryMember")
  private lazy val fieldIdx: Int = src.fieldNames.indexOf(name)

  override def dataType: DataType = default.dataType
  override def nullable: Boolean =
    struct.nullable || default.nullable
  override def prettyName: String = "trymember"

  override def checkInputDataTypes(): TypeCheckResult = struct.dataType match {
    case s: StructType =>
      val i = s.fieldNames.indexOf(name)
      if (i < 0) TypeCheckResult.TypeCheckSuccess // default's job
      else if (s.fields(i).dataType.sql == default.dataType.sql)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"TryMember: member '$name' has type " +
          s"${s.fields(i).dataType.simpleString}, default is " +
          default.dataType.simpleString)
    case other => TypeCheckResult.TypeCheckFailure(
      s"TryMember expects a struct, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = struct.eval(input)
    if (v == null) return null
    if (fieldIdx < 0) return default.eval(input)
    val m = v.asInstanceOf[InternalRow].get(fieldIdx,
      src.fields(fieldIdx).dataType)
    if (m == null) default.eval(input) else m
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(struct = newChildren(0), default = newChildren(1))
}
