package graft.ql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.YtTypes
import QLParser._

/** ExplainQuery (dynamic_table_client.h:110-115; ytlib/query_client/
  * explain.cpp; integration surface test_explain.py): the prepare-time
  * analysis a reference client inspects before running a SelectRows —
  * join key-prefix coordination, group-by/primary-key overlap, ordered
  * scans, and what actually reached the storage scan.
  *
  * Reported fields mirror the reference's response keys:
  *
  *   - `where_expression` — the WHERE predicate as lowered for the
  *     execution engine (Spark SQL text here, where the reference
  *     prints its typed expression tree);
  *   - `is_ordered_scan` — true when the ORDER BY was elided because
  *     its keys form a prefix of the scanned table's declared key
  *     order (OrderByPrimaryKeyPrefix; test_explain.py:155);
  *   - `common_prefix_with_primary_key` — the group-clause/primary-key
  *     overlap per query_preparer.cpp:280-330: walk the declared keys,
  *     a key column counts while it is either a bare GROUP BY
  *     reference or a computed column whose sources are all grouped;
  *     reported ONLY when the walk covers the full primary key
  *     (UseDisjointGroupBy — explain.cpp:141), valued at the number of
  *     GROUPED references inside the walk;
  *   - per-join `foreign_key_prefix` / `common_key_prefix`
  *     (query.h:333-373, test_explain.py:48): the foreign prefix is
  *     the evaluable prefix of the foreign table's declared keys under
  *     the join equations; the common prefix is the evaluable prefix
  *     of the PRIMARY table's keys — capped by the previous join's
  *     common prefix, because a join only preserves the stream's sort
  *     order up to its own common prefix (sorted-merge coordination);
  *   - `pushed_filters` — what Catalyst pushed into the parquet scan
  *     (the Spark analogue of the reference's inferred key `ranges`;
  *     the derived-predicate images of plans/ComputedColumns land here
  *     as partition/pushed filters).
  */
object Explain {

  final case class JoinExplain(
      table: String,
      foreignKeyPrefix: Int,
      commonKeyPrefix: Int)

  final case class ExplainResult(
      whereExpression: Option[String],
      isOrderedScan: Boolean,
      commonPrefixWithPrimaryKey: Option[Int],
      joins: Seq[JoinExplain],
      pushedFilters: Seq[String],
      physicalPlan: String)

  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Declared ascending-key prefix + computed-column source map of a
    * registered table (YtSortOrderKey / YtExprKey field metadata). */
  private def keyInfo(df: DataFrame): (Seq[String], Map[String, Seq[String]]) = {
    val cols = df.schema.fields.map(_.name).toSet
    val keys = df.schema.fields.takeWhile(f =>
      f.metadata.contains(YtTypes.YtSortOrderKey) &&
        f.metadata.getString(YtTypes.YtSortOrderKey) == "ascending")
      .map(_.name).toSeq
    val computed = df.schema.fields.collect {
      case f if f.metadata.contains(YtTypes.YtExprKey) =>
        f.name -> IdentRe.findAllIn(f.metadata.getString(YtTypes.YtExprKey))
          .filter(cols.contains).filterNot(_ == f.name).toSeq.distinct
    }.toMap
    (keys, computed)
  }

  /** Longest declared-key prefix where each column is covered directly
    * or is a computed column whose every source is covered
    * (query_preparer.cpp:280-307 keyPrefix walk). */
  private def evaluablePrefix(keys: Seq[String], covered: Set[String],
      computed: Map[String, Seq[String]]): Int = {
    var i = 0
    var ok = true
    while (ok && i < keys.length) {
      val k = keys(i)
      if (covered(k)) i += 1
      else computed.get(k) match {
        case Some(srcs) if srcs.nonEmpty && srcs.forall(covered) => i += 1
        case _ => ok = false
      }
    }
    i
  }

  private def bareRefs(es: Seq[Expr]): Set[String] =
    es.collect { case Ref(parts) => parts.last }.toSet

  def apply(spark: SparkSession, ql: String,
      catalog: Map[String, DataFrame],
      options: SelectRows.Options = SelectRows.Options()): ExplainResult = {
    val q = QLParser.parse(ql)

    val primary: Option[(Seq[String], Map[String, Seq[String]])] =
      q.from.collect { case TableRef(path, _) => catalog.get(path) }
        .flatten.map(keyInfo)
    val primaryKeys = primary.map(_._1).getOrElse(Nil)
    val primaryComputed = primary.map(_._2).getOrElse(Map.empty)

    // join coordination: foreign prefix per join; common prefix with
    // the running cap (the joined stream stays key-sorted only up to
    // the previous join's common prefix)
    var runningCap = Int.MaxValue
    val joins = q.joins.collect { case j: JoinClause =>
      val (fKeys, fComputed) = catalog.get(j.table.path).map(keyInfo)
        .getOrElse((Seq.empty[String], Map.empty[String, Seq[String]]))
      val (selfSide, foreignSide): (Set[String], Set[String]) = j.on match {
        case Some((l, r)) =>
          // orient by which side's refs resolve against the foreign
          // table (reference allows either spelling)
          val fCols = catalog.get(j.table.path)
            .map(_.schema.fieldNames.toSet).getOrElse(Set.empty)
          val (lr, rr) = (bareRefs(l), bareRefs(r))
          if (rr.subsetOf(fCols) || rr.exists(fCols.contains)) (lr, rr)
          else (rr, lr)
        case None => (j.using.toSet, j.using.toSet)
      }
      val foreignPrefix = evaluablePrefix(fKeys, foreignSide, fComputed)
      val ownCommon = evaluablePrefix(primaryKeys, selfSide, primaryComputed)
      val common = math.min(ownCommon, runningCap)
      runningCap = common
      JoinExplain(j.table.path, foreignPrefix, common)
    }

    // group-clause overlap, reported ONLY under UseDisjointGroupBy
    // (query_preparer.cpp:328-330: the evaluable walk must cover the
    // FULL primary key — "not prefix, because of equal prefixes near
    // borders"; explain.cpp:141 serializes the field only then). The
    // value counts the GROUPED references inside the walk — evaluated
    // computed keys extend the walk but are not group items.
    val groupRefs = bareRefs(q.groupBy.map(_.e))
    val commonPrefixWithPrimaryKey =
      if (q.groupBy.isEmpty || primaryKeys.isEmpty) None
      else {
        val walk = evaluablePrefix(primaryKeys, groupRefs, primaryComputed)
        if (walk == primaryKeys.length)
          Some(primaryKeys.count(groupRefs.contains))
        else None
      }

    // ORDER BY elision = ordered scan (same condition the emitter uses)
    val isOrderedScan = q.orderBy.nonEmpty && q.joins.isEmpty &&
      q.groupBy.isEmpty && primaryKeys.nonEmpty &&
      q.orderBy.length <= primaryKeys.length &&
      q.orderBy.zip(primaryKeys).forall {
        case (OrderItem(Ref(parts), false), k) => parts.last == k
        case _ => false
      }

    val df = SelectRows(spark, ql, catalog, options)
    val scansPushed = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.get("PushedFilters").toSeq
    }.flatten

    ExplainResult(
      whereExpression = q.where.map(QLEmitter.emit),
      isOrderedScan = isOrderedScan,
      commonPrefixWithPrimaryKey = commonPrefixWithPrimaryKey,
      joins = joins,
      pushedFilters = scansPushed,
      physicalPlan = df.queryExecution.executedPlan.toString)
  }
}
