package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.{shims => S}

import scala.jdk.CollectionConverters._

/** Computed key columns + derived-predicate pruning (SURVEY.md §1.3 /
  * §4.1).
  *
  * The reference lets a key column be a QL expression over other
  * columns (`TColumnSchema::Expression`, schema.h:125), evaluates it on
  * write (TColumnEvaluator::EvaluateKeys, column_evaluator.h:12-32) and
  * — critically — *enumerates* its values during range inference so a
  * predicate on the source column prunes tablets keyed by the computed
  * column (range_inferrer.cpp, ql_computed_columns_ut.cpp). The Spark
  * analog: the computed column is the partition column of the table;
  * [[DerivedPredicateRule]] rewrites `WHERE k = v` into
  * `WHERE k = v AND hk = f(v)` so Catalyst's ordinary partition pruning
  * eliminates directories — at 100 TB that's the difference between a
  * full scan and touching one partition.
  *
  * [[Spec]]s are registered per (source, computed) column-name pair;
  * writes go through [[withComputed]] so the stored value always agrees
  * with the rule's fold (same single-definition guarantee the
  * reference's write-path evaluator provides).
  */
object ComputedColumns {

  /** `computed := f(source)`, e.g. `hk := pmod(hash(k), 64)`. */
  final case class Spec(source: String, computed: String, f: Column => Column)

  private val specs = new ConcurrentHashMap[(String, String), Spec]()

  def register(spec: Spec): Unit =
    specs.put((spec.source, spec.computed), spec)

  def clear(): Unit = specs.clear()

  /** Write-path evaluation (column_evaluator.h EvaluateKeys). */
  def withComputed(df: org.apache.spark.sql.DataFrame, spec: Spec): org.apache.spark.sql.DataFrame =
    df.withColumn(spec.computed, spec.f(df(spec.source)))

  /** Install the rule on a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[DerivedPredicateRule.type]))
      spark.experimental.extraOptimizations = existing :+ DerivedPredicateRule
  }

  /** Constant-fold `f(v)` at planning time. Spark 4's `functions._`
    * build unresolved expressions, so run the analyzer over a
    * OneRowRelation projection first — driver-side only, no job. */
  private def derive(f: Column => Column, v: Literal,
      target: org.apache.spark.sql.types.DataType): Option[Literal] =
    try {
      val raw = S.convert(f(S.column(Literal(v.value, v.dataType))))
      val proj = Project(Seq(Alias(raw, "d")()), OneRowRelation())
      val analyzed = SparkSession.active.sessionState.analyzer.execute(proj)
      val e = analyzed.asInstanceOf[Project].projectList.head
        .asInstanceOf[Alias].child
      if (!(e.resolved && e.foldable && e.deterministic)) None
      else {
        val lit = Literal.create(e.eval(null), e.dataType)
        if (lit.dataType == target) Some(lit)
        else {
          // the stored computed column may be narrower (e.g. a parquet
          // partition directory reads back as int) — fold the cast too
          val c = Cast(lit, target)
          if (c.resolved) Some(Literal.create(c.eval(null), target)) else None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Conjoin `computed = f(v)` (or IN-list image) wherever a filter
    * pins the source column and the plan also carries the computed
    * column. */
  object DerivedPredicateRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case f @ Filter(cond, child) =>
        val out = child.outputSet
        val extras = specs.values().asScala.flatMap { spec =>
          val srcAttr = out.find(_.name == spec.source)
          val cmpAttr = out.find(_.name == spec.computed)
          (srcAttr, cmpAttr) match {
            case (Some(src), Some(cmp)) => derivedFor(cond, src, cmp, spec)
            case _ => None
          }
        }.toSeq
        val missing = extras.filterNot(e =>
          splitConjunctive(cond).exists(_.semanticEquals(e)))
        if (missing.isEmpty) f
        else Filter(missing.foldLeft(cond)(And), child)
    }

    private def splitConjunctive(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitConjunctive(l) ++ splitConjunctive(r)
      case other => Seq(other)
    }

    private def derivedFor(cond: Expression, src: Attribute, cmp: Attribute,
        spec: Spec): Option[Expression] = {
      val conj = splitConjunctive(cond)
      conj.collectFirst {
        case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(src) =>
          derive(spec.f, l, cmp.dataType).map(dl => EqualTo(cmp, dl))
        case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(src) =>
          derive(spec.f, l, cmp.dataType).map(dl => EqualTo(cmp, dl))
        case In(a: Attribute, vs) if a.semanticEquals(src) &&
            vs.forall(_.isInstanceOf[Literal]) =>
          val imgs = vs.map(v => derive(spec.f, v.asInstanceOf[Literal], cmp.dataType))
          if (imgs.forall(_.isDefined)) Some(In(cmp, imgs.flatten.distinct))
          else None
      }.flatten
    }
  }
}
