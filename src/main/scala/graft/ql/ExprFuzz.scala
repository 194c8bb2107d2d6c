package graft.ql

/** Seeded differential expression fuzzer: generates random QL
  * expressions over an int64 row (a, b, nullable c) and renders each
  * one twice — as QL text for [[SelectRows]] (exercising the tokenizer,
  * parser and emitter end-to-end) and as ANSI SQL for the DuckDB
  * oracle. The driver's hash compare then checks VALUE equality of
  * every expression on every corpus row: a cross-engine differential
  * test in the style of the reference's randomized evaluate suites
  * (ql_query_ut.cpp GroupByOrderByCoordinated2 and friends), running
  * through the same correctness gate as every other query.
  *
  * Generator discipline keeps the semantics comparable by
  * construction:
  *   - canonical (SQL three-valued) null relations — the QL side runs
  *     with UseCanonicalNullRelations, which both engines share;
  *   - no integer division/modulo (QL raises on zero; rounding of
  *     negatives differs between engines);
  *   - multiplication only by small literals with a tracked magnitude
  *     bound, so int64 arithmetic can never overflow (overflow raises
  *     in QL, wraps in some engines);
  *   - every case is a deterministic function of the seed.
  */
object ExprFuzz {

  /** An expression rendered for both engines, with a magnitude bound
    * and a flag for boolean-typed nodes. */
  final case class FExpr(ql: String, duck: String, bound: Long, isBool: Boolean)

  def exprs(n: Int, seed: Long): Seq[FExpr] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(
      if (rnd.nextInt(3) == 0) genBool(rnd, depth = 0)
      else genNumeric(rnd, depth = 0))
  }

  private val MaxBound = 1L << 40

  private def lit(rnd: scala.util.Random): FExpr = {
    val v = rnd.nextInt(26) - 5 // -5..20
    FExpr(v.toString, v.toString, math.abs(v).toLong, isBool = false)
  }

  private def ref(rnd: scala.util.Random): FExpr = rnd.nextInt(3) match {
    case 0 => FExpr("a", "a", 1L << 20, isBool = false) // o_orderkey scale
    case 1 => FExpr("b", "b", 1L << 20, isBool = false) // o_custkey scale
    case _ => FExpr("c", "c", 100L, isBool = false)     // nullable, 0..99
  }

  private def genNumeric(rnd: scala.util.Random, depth: Int): FExpr = {
    if (depth >= 3 || rnd.nextInt(4) == 0) {
      if (rnd.nextBoolean()) ref(rnd) else lit(rnd)
    } else rnd.nextInt(6) match {
      case 0 => // addition / subtraction
        val l = genNumeric(rnd, depth + 1); val r = genNumeric(rnd, depth + 1)
        val op = if (rnd.nextBoolean()) "+" else "-"
        FExpr(s"(${l.ql} $op ${r.ql})", s"(${l.duck} $op ${r.duck})",
          l.bound + r.bound, isBool = false)
      case 1 => // multiply by a small literal, bound-guarded
        val l = genNumeric(rnd, depth + 1)
        val f = rnd.nextInt(9) + 2 // 2..10
        if (l.bound * f < MaxBound)
          FExpr(s"(${l.ql} * $f)", s"(${l.duck} * $f)", l.bound * f, isBool = false)
        else l
      case 2 => // if(cond, x, y) — QL's `if` is a FUNCTION: a null
        // condition yields null (TIfFunctionCodegen,
        // builtin_function_profiler.cpp:66-74), unlike SQL CASE which
        // falls to ELSE. The first fuzz run caught exactly this
        // divergence; the oracle models the null-propagation.
        val c = genBool(rnd, depth + 1)
        val x = genNumeric(rnd, depth + 1); val y = genNumeric(rnd, depth + 1)
        FExpr(s"if(${c.ql}, ${x.ql}, ${y.ql})",
          s"(CASE WHEN (${c.duck}) IS NULL THEN NULL " +
            s"WHEN ${c.duck} THEN ${x.duck} ELSE ${y.duck} END)",
          math.max(x.bound, y.bound), isBool = false)
      case 3 => // coalesce
        val x = genNumeric(rnd, depth + 1); val y = genNumeric(rnd, depth + 1)
        FExpr(s"coalesce(${x.ql}, ${y.ql})", s"coalesce(${x.duck}, ${y.duck})",
          math.max(x.bound, y.bound), isBool = false)
      case 4 => // unary minus (space-separated: `--` starts a SQL comment)
        val x = genNumeric(rnd, depth + 1)
        FExpr(s"(- ${x.ql})", s"(- ${x.duck})", x.bound, isBool = false)
      case _ => // case searched with two branches
        val c1 = genBool(rnd, depth + 1); val c2 = genBool(rnd, depth + 1)
        val x = genNumeric(rnd, depth + 1); val y = genNumeric(rnd, depth + 1)
        val z = genNumeric(rnd, depth + 1)
        FExpr(
          s"case when ${c1.ql} then ${x.ql} when ${c2.ql} then ${y.ql} else ${z.ql} end",
          s"(CASE WHEN ${c1.duck} THEN ${x.duck} WHEN ${c2.duck} THEN ${y.duck} ELSE ${z.duck} END)",
          Seq(x.bound, y.bound, z.bound).max, isBool = false)
    }
  }

  private def genBool(rnd: scala.util.Random, depth: Int): FExpr = {
    if (depth >= 3) cmp(rnd, depth)
    else rnd.nextInt(6) match {
      case 0 =>
        val l = genBool(rnd, depth + 1); val r = genBool(rnd, depth + 1)
        FExpr(s"(${l.ql} and ${r.ql})", s"(${l.duck} AND ${r.duck})", 1L, isBool = true)
      case 1 =>
        val l = genBool(rnd, depth + 1); val r = genBool(rnd, depth + 1)
        FExpr(s"(${l.ql} or ${r.ql})", s"(${l.duck} OR ${r.duck})", 1L, isBool = true)
      case 2 =>
        val x = genBool(rnd, depth + 1)
        FExpr(s"(not ${x.ql})", s"(NOT ${x.duck})", 1L, isBool = true)
      case 3 => // IN list
        val x = genNumeric(rnd, depth + 1)
        val vals = Seq.fill(3)(rnd.nextInt(26) - 5).distinct.mkString(", ")
        FExpr(s"(${x.ql} in ($vals))", s"(${x.duck} IN ($vals))", 1L, isBool = true)
      case 4 => // BETWEEN
        val x = genNumeric(rnd, depth + 1)
        val lo = rnd.nextInt(20) - 5; val hi = lo + rnd.nextInt(30)
        FExpr(s"(${x.ql} between $lo and $hi)",
          s"(${x.duck} BETWEEN $lo AND $hi)", 1L, isBool = true)
      case _ => cmp(rnd, depth)
    }
  }

  /** String-domain expressions over ASCII columns s (status-like) and
    * t (priority-like): QL's string-only `||` concat, lower(),
    * is_prefix/is_substr, LIKE with literal patterns, lexicographic
    * comparisons and CASE over them. ASCII-only inputs keep
    * byte-length and char-length semantics aligned across engines.
    */
  def stringExprs(n: Int, seed: Long): Seq[FExpr] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(
      if (rnd.nextInt(2) == 0) genStringBool(rnd, depth = 0)
      else genString(rnd, depth = 0))
  }

  private def strLit(rnd: scala.util.Random): FExpr = {
    val v = Seq("F", "O", "P", "1-URGENT", "3-MEDIUM", "x", "")(rnd.nextInt(7))
    FExpr(s"'$v'", s"'$v'", 0L, isBool = false)
  }

  private def strRef(rnd: scala.util.Random): FExpr = rnd.nextInt(3) match {
    case 0 => FExpr("s", "s", 0L, isBool = false)
    case 1 => FExpr("t", "t", 0L, isBool = false)
    case _ => FExpr("u", "u", 0L, isBool = false) // nullable
  }

  private def genString(rnd: scala.util.Random, depth: Int): FExpr = {
    if (depth >= 2 || rnd.nextInt(3) == 0) {
      if (rnd.nextBoolean()) strRef(rnd) else strLit(rnd)
    } else rnd.nextInt(3) match {
      case 0 => // concat (string-only || in QL)
        val l = genString(rnd, depth + 1); val r = genString(rnd, depth + 1)
        FExpr(s"(${l.ql} || ${r.ql})", s"(${l.duck} || ${r.duck})", 0L, isBool = false)
      case 1 =>
        val x = genString(rnd, depth + 1)
        FExpr(s"lower(${x.ql})", s"lower(${x.duck})", 0L, isBool = false)
      case _ => // if over strings (same null-propagating function form)
        val c = genStringBool(rnd, depth + 1)
        val x = genString(rnd, depth + 1); val y = genString(rnd, depth + 1)
        FExpr(s"if(${c.ql}, ${x.ql}, ${y.ql})",
          s"(CASE WHEN (${c.duck}) IS NULL THEN NULL " +
            s"WHEN ${c.duck} THEN ${x.duck} ELSE ${y.duck} END)", 0L, isBool = false)
    }
  }

  private def genStringBool(rnd: scala.util.Random, depth: Int): FExpr = {
    if (depth >= 3) strCmp(rnd, depth)
    else rnd.nextInt(5) match {
      case 0 =>
        val l = genStringBool(rnd, depth + 1); val r = genStringBool(rnd, depth + 1)
        val op = if (rnd.nextBoolean()) ("and", "AND") else ("or", "OR")
        FExpr(s"(${l.ql} ${op._1} ${r.ql})", s"(${l.duck} ${op._2} ${r.duck})", 1L, isBool = true)
      case 1 => // is_prefix / is_substr (needle, haystack)
        val needle = strLit(rnd); val hay = genString(rnd, depth + 1)
        if (rnd.nextBoolean())
          FExpr(s"is_prefix(${needle.ql}, ${hay.ql})",
            s"starts_with(${hay.duck}, ${needle.duck})", 1L, isBool = true)
        else
          FExpr(s"is_substr(${needle.ql}, ${hay.ql})",
            s"contains(${hay.duck}, ${needle.duck})", 1L, isBool = true)
      case 2 => // LIKE with a literal pattern (no escape metacharacters)
        val x = genString(rnd, depth + 1)
        val pat = Seq("F%", "%O%", "_", "%URGENT", "3-%", "%x%")(rnd.nextInt(6))
        FExpr(s"(${x.ql} like '$pat')", s"(${x.duck} LIKE '$pat')", 1L, isBool = true)
      case _ => strCmp(rnd, depth)
    }
  }

  private def strCmp(rnd: scala.util.Random, depth: Int): FExpr = {
    val l = genString(rnd, depth + 1); val r = genString(rnd, depth + 1)
    val op = Seq("<", "<=", "=", "!=", ">", ">=")(rnd.nextInt(6))
    val dop = if (op == "!=") "<>" else op
    FExpr(s"(${l.ql} $op ${r.ql})", s"(${l.duck} $dop ${r.duck})", 1L, isBool = true)
  }

  /** Whole-query cases: randomized clause ASSEMBLY — WHERE, GROUP BY
    * with aggregates, HAVING, ORDER BY + OFFSET/LIMIT — over the
    * numeric fixture. Paging is made deterministic by always ordering
    * by every output column (ties impossible: the trailing key is
    * unique per group), so LIMIT selects the same rows in both
    * engines and the sorted-hash compare stays exact. Exercises the
    * emitter's clause interactions (alias-substituted group keys,
    * having over select aliases, offset/limit binding).
    */
  def queryCases(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val wp: Option[FExpr] =
        if (rnd.nextBoolean()) Some(genBool(rnd, depth = 1)) else None
      val grouped = rnd.nextBoolean()
      val (qlBody, duckBody) =
        if (grouped) {
          val m = 2 + rnd.nextInt(9)
          val x = genNumeric(rnd, depth = 1)
          val hv: Option[(String, String)] =
            if (rnd.nextInt(3) == 0) {
              val t = rnd.nextInt(50)
              (Some((s"having cnt > $t", s"HAVING COUNT(*) > $t")))
            } else None
          val ql = s"$i as tag, g, sum(${x.ql}) as sv, sum(1) as cnt " +
            s"from [//tmp/fq]" +
            wp.map(p => s" where ${p.ql}").getOrElse("") +
            s" group by a % $m as g ${hv.map(_._1).getOrElse("")}"
          val duck = s"SELECT $i AS tag, a % $m AS g, " +
            s"CAST(SUM(${x.duck}) AS BIGINT) AS sv, " +
            s"CAST(SUM(1) AS BIGINT) AS cnt FROM fq" +
            wp.map(p => s" WHERE ${p.duck}").getOrElse("") +
            s" GROUP BY a % $m ${hv.map(_._2).getOrElse("")}"
          (ql, duck)
        } else {
          val x = genNumeric(rnd, depth = 1)
          val lim = 5 + rnd.nextInt(40)
          val off = if (rnd.nextBoolean()) rnd.nextInt(20) else 0
          // deterministic page: order by the expression THEN the
          // unique key a; emit cnt/sv-shaped columns for the union
          val ql = s"$i as tag, a as g, ${x.ql} as sv, 1 as cnt " +
            s"from [//tmp/fq]" +
            wp.map(p => s" where ${p.ql}").getOrElse("") +
            s" order by sv, a" +
            (if (off > 0) s" offset $off" else "") + s" limit $lim"
          // order by the ALIAS, not the re-rendered expression: a
          // constant-folded expr would render as a bare integer
          // literal, which ORDER BY reads as a positional ordinal
          val duck = s"SELECT $i AS tag, a AS g, ${x.duck} AS sv, " +
            s"1 AS cnt FROM fq" +
            wp.map(p => s" WHERE ${p.duck}").getOrElse("") +
            s" ORDER BY sv NULLS FIRST, a LIMIT $lim OFFSET $off"
          (ql, duck)
        }
      (qlBody, duckBody)
    }
  }

  /** Join-domain cases: whole randomized queries — INNER/LEFT joins
    * via USING with optional foreign-side AND-predicates (filtering
    * the foreign table BEFORE a left join, TJoin::Predicate) and
    * optional WHERE over primary columns. Rendered as QL and as SQL
    * with the foreign predicate applied in a subquery, which is the
    * reference's semantics for both join kinds. Output schema is fixed
    * (tag, a, k, r) so cases union.
    */
  def joinCases(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val left = rnd.nextBoolean()
      val qlKind = if (left) "left join" else "join"
      val duckKind = if (left) "LEFT JOIN" else "JOIN"
      // foreign-side predicate over r (0..4) / n (0..24)
      val fp: Option[(String, String)] = rnd.nextInt(3) match {
        case 0 => None
        case 1 =>
          val v = rnd.nextInt(5)
          val op = Seq("<", "<=", "!=", ">=", ">")(rnd.nextInt(5))
          val dop = if (op == "!=") "<>" else op
          Some((s"r $op $v", s"r $dop $v"))
        case _ =>
          val vals = Seq.fill(3)(rnd.nextInt(25)).distinct.mkString(", ")
          Some((s"n in ($vals)", s"n IN ($vals)"))
      }
      // where over primary columns a (orderkey) / k (0..24)
      val wp: Option[(String, String)] = rnd.nextInt(3) match {
        case 0 => None
        case 1 =>
          val v = rnd.nextInt(25)
          Some((s"k != $v", s"k <> $v"))
        case _ =>
          val v = 3 + rnd.nextInt(7)
          Some((s"a % $v = 0", s"a % $v = 0"))
      }
      val ql = s"$i as tag, a, k, r from [//tmp/jl] $qlKind [//tmp/jr] " +
        s"using k${fp.map(p => s" and ${p._1}").getOrElse("")}" +
        wp.map(p => s" where ${p._1}").getOrElse("")
      val foreign = fp match {
        case Some((_, d)) => s"(SELECT * FROM jr WHERE $d)"
        case None => "jr"
      }
      val duck = s"SELECT $i AS tag, a, k, r FROM jl $duckKind $foreign " +
        s"AS jrf USING (k)" + wp.map(p => s" WHERE ${p._2}").getOrElse("")
      (ql, duck)
    }
  }

  /** Tuple-domain cases: lexicographic row comparisons and tuple IN
    * over NON-NULL int64 elements (a, b, literals) — exercising the
    * IsRowInRowset / prefix-range lowering (conjunction chains) against
    * an engine with native row values. Null elements excluded: SQL row
    * comparison with NULLs is engine-divergent by standard.
    */
  def tupleExprs(n: Int, seed: Long): Seq[FExpr] = {
    val rnd = new scala.util.Random(seed)
    def elem: (String, String) = rnd.nextInt(3) match {
      case 0 => ("a", "a")
      case 1 => ("b", "b")
      case _ => { val v = rnd.nextInt(26) - 5; (v.toString, v.toString) }
    }
    Seq.fill(n) {
      val arity = 2 + rnd.nextInt(2)
      val lhs = Seq.fill(arity)(elem)
      val lq = lhs.map(_._1).mkString("(", ", ", ")")
      val ld = lhs.map(_._2).mkString("(", ", ", ")")
      if (rnd.nextInt(3) == 0) { // tuple IN over literal rows
        val rows = Seq.fill(2 + rnd.nextInt(2))(
          Seq.fill(arity)(rnd.nextInt(26) - 5).mkString("(", ", ", ")"))
        val list = rows.mkString("(", ", ", ")")
        FExpr(s"($lq in $list)", s"($ld IN $list)", 1L, isBool = true)
      } else {
        val rhs = Seq.fill(arity)(elem)
        val rq = rhs.map(_._1).mkString("(", ", ", ")")
        val rd = rhs.map(_._2).mkString("(", ", ", ")")
        val op = Seq("<", "<=", "=", "!=", ">", ">=")(rnd.nextInt(6))
        val dop = if (op == "!=") "<>" else op
        FExpr(s"($lq $op $rq)", s"($ld $dop $rd)", 1L, isBool = true)
      }
    }
  }

  /** uint64-domain cases over two schema-tagged u64 columns ua/ub and
    * full-range `Nu` literals: the string surface must route
    * comparisons through the biased u64_* forms and `/`/`%` through
    * unsigned division (functions/Uint64) — compared value-exact
    * against DuckDB's native UBIGINT arithmetic. Divisors/moduli are
    * nonzero literals (QL raises on zero); quotient/remainder outputs
    * stay under 2^63 so they print identically as signed BIGINT.
    */
  def u64Exprs(n: Int, seed: Long): Seq[FExpr] = {
    val rnd = new scala.util.Random(seed)
    def ref: FExpr =
      if (rnd.nextBoolean()) FExpr("ua", "ua", 0L, isBool = false)
      else FExpr("ub", "ub", 0L, isBool = false)
    def ulit: FExpr = {
      val u = java.lang.Long.toUnsignedString(rnd.nextLong())
      FExpr(s"${u}u", s"'$u'::UBIGINT", 0L, isBool = false)
    }
    def operand: FExpr = if (rnd.nextInt(3) == 0) ulit else ref
    Seq.fill(n)(rnd.nextInt(3) match {
      case 0 =>
        val l = operand; val r = operand
        val op = Seq("<", "<=", "=", "!=", ">", ">=")(rnd.nextInt(6))
        val dop = if (op == "!=") "<>" else op
        FExpr(s"(${l.ql} $op ${r.ql})", s"(${l.duck} $dop ${r.duck})", 1L, isBool = true)
      case 1 =>
        val x = operand
        val m = Seq(3L, 7L, 1000L, 123457L)(rnd.nextInt(4))
        FExpr(s"(${x.ql} % ${m}u)",
          s"CAST((${x.duck} % $m) AS BIGINT)", m, isBool = false)
      case _ =>
        val x = operand
        val dv = Seq(1000L, 65536L, 123457L)(rnd.nextInt(3))
        FExpr(s"(${x.ql} / ${dv}u)",
          s"CAST((${x.duck} // $dv) AS BIGINT)", Long.MaxValue / dv, isBool = false)
    })
  }

  /** Aggregate-domain cases: sum/min/max and a count_if-shaped
    * sum(if(...)) over generated numeric expressions — exact int64
    * arithmetic keeps the compare bit-stable. */
  def aggExprs(n: Int, seed: Long): Seq[FExpr] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      rnd.nextInt(4) match {
        case 0 =>
          val x = genNumeric(rnd, depth = 1)
          FExpr(s"sum(${x.ql})", s"CAST(SUM(${x.duck}) AS BIGINT)", 0L, isBool = false)
        case 1 =>
          val x = genNumeric(rnd, depth = 1)
          FExpr(s"min(${x.ql})", s"MIN(${x.duck})", 0L, isBool = false)
        case 2 =>
          val x = genNumeric(rnd, depth = 1)
          FExpr(s"max(${x.ql})", s"MAX(${x.duck})", 0L, isBool = false)
        case _ => // count_if shape with the null-propagating if
          val c = genBool(rnd, depth = 2)
          FExpr(s"sum(if(${c.ql}, 1, 0))",
            s"CAST(SUM(CASE WHEN (${c.duck}) IS NULL THEN NULL " +
              s"WHEN ${c.duck} THEN 1 ELSE 0 END) AS BIGINT)", 0L, isBool = false)
      }
    }
  }

  private def cmp(rnd: scala.util.Random, depth: Int): FExpr = {
    val l = genNumeric(rnd, depth + 1); val r = genNumeric(rnd, depth + 1)
    val op = Seq("<", "<=", "=", "!=", ">", ">=")(rnd.nextInt(6))
    val dop = if (op == "!=") "<>" else op
    FExpr(s"(${l.ql} $op ${r.ql})", s"(${l.duck} $dop ${r.duck})", 1L, isBool = true)
  }

  /** Window-domain cases over a fixture (a unique BIGINT, k small
    * partition key, v BIGINT value): random ranking / analytic /
    * framed-aggregate window columns, rendered once — the texts are
    * ANSI and shared by Spark SQL and DuckDB verbatim. Generator
    * discipline for cross-engine determinism: every ORDER BY ends in
    * the unique key `a` (ties impossible), aggregate inputs are
    * integers (no float summation-order divergence), and frames are
    * explicit wherever the ANSI default would surprise (last_value).
    */
  def windowCases(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val part = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => "PARTITION BY k "
        case _ => s"PARTITION BY k % ${2 + rnd.nextInt(3)} "
      }
      val ord = if (rnd.nextBoolean()) "ORDER BY v, a" else "ORDER BY v DESC, a"
      def frame: String = rnd.nextInt(4) match {
        case 0 => " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        case 1 => s" ROWS BETWEEN ${1 + rnd.nextInt(4)} PRECEDING AND CURRENT ROW"
        case 2 => s" ROWS BETWEEN CURRENT ROW AND ${1 + rnd.nextInt(4)} FOLLOWING"
        case _ => " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
      }
      val core = rnd.nextInt(10) match {
        case 0 => s"ROW_NUMBER() OVER ($part$ord)"
        case 1 => s"RANK() OVER ($part$ord)"
        case 2 => s"DENSE_RANK() OVER ($part$ord)"
        case 3 => s"NTILE(${2 + rnd.nextInt(5)}) OVER ($part$ord)"
        case 4 => s"LAG(v, ${1 + rnd.nextInt(3)}) OVER ($part$ord)"
        case 5 => s"LEAD(v, ${1 + rnd.nextInt(3)}) OVER ($part$ord)"
        case 6 => s"FIRST_VALUE(a) OVER ($part$ord$frame)"
        case 7 => s"LAST_VALUE(a) OVER ($part$ord$frame)"
        case 8 => s"SUM(v) OVER ($part$ord$frame)"
        case _ => s"COUNT(*) OVER ($part$ord$frame)"
      }
      // int-width spellings differ between engines (ROW_NUMBER is int
      // in Spark, bigint in DuckDB) — pin the output type in the text
      s"CAST($core AS BIGINT)"
    }
  }

  /** Set-operation cases: UNION / UNION ALL / INTERSECT [ALL] /
    * EXCEPT [ALL] between two filtered projections of the fixture —
    * ANSI text shared verbatim by both engines, each case wrapped
    * under a tag so all cases union into one result. */
  def setOpCases(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val op = Seq("UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
        "EXCEPT", "EXCEPT ALL")(rnd.nextInt(6))
      val m1 = 2 + rnd.nextInt(5); val r1 = rnd.nextInt(m1)
      val m2 = 2 + rnd.nextInt(5); val r2 = rnd.nextInt(m2)
      val proj = rnd.nextInt(3) match {
        case 0 => "k, v % 100 AS x"
        case 1 => "k % 3 AS k, v % 50 AS x"
        case _ => "k, k + v % 10 AS x"
      }
      s"SELECT $i AS tag, * FROM (" +
        s"(SELECT $proj FROM fw WHERE a % $m1 = $r1) $op " +
        s"(SELECT $proj FROM fw WHERE a % $m2 = $r2))"
    }
  }

  /** YQL-SCRIPT-domain cases: each case is a (script, oracleSql) pair
    * over the `fw` fixture. The script exercises the statement-level
    * surface — named scalar bindings, lambda bindings called AND
    * composed, statement-body lambdas with local bindings, named
    * subselects, DECLARE'd defaults, REDUCE — while the oracle is the
    * hand-expanded plain SQL generated from the SAME random draws, so
    * any divergence in the lowering's substitution semantics (not
    * just its parse) breaks the value compare. Integer-only math, all
    * operands non-negative: every value is exact in both engines. */
  def scriptCases(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val m = 1 + rnd.nextInt(50)
      val c = 2 + rnd.nextInt(8)
      val d = 3 + rnd.nextInt(95)
      val w = 2 + rnd.nextInt(6); val r = rnd.nextInt(w)
      rnd.nextInt(6) match {
        case 0 =>
          // lambda called directly AND composed through a second lambda
          val script =
            "$m = " + m + ";\n" +
            "$f = ($x) -> ($x * " + c + " + $m);\n" +
            "$g = ($x) -> ($f($x) % " + d + ");\n" +
            s"SELECT $i AS tag, a, CAST(" + "$f(v)" + s" AS BIGINT) AS x1, " +
            "CAST($g(k) AS BIGINT) AS x2 " +
            s"FROM fw WHERE v % $w = $r"
          val sql =
            s"SELECT $i AS tag, a, CAST(v * $c + $m AS BIGINT) AS x1, " +
            s"CAST((k * $c + $m) % $d AS BIGINT) AS x2 " +
            s"FROM fw WHERE v % $w = $r"
          (script, sql)
        case 1 =>
          // statement-body lambda: local binding + RETURN
          val script =
            "$m = " + m + ";\n" +
            "$h = ($x) -> {\n  $t = $x + $m;\n  RETURN $t * " + c + "\n};\n" +
            s"SELECT $i AS tag, a, CAST(" + "$h(v)" + s" AS BIGINT) AS x1, " +
            "CAST($h(k) - $m AS BIGINT) AS x2 " +
            s"FROM fw WHERE k % $w = $r"
          val sql =
            s"SELECT $i AS tag, a, CAST((v + $m) * $c AS BIGINT) AS x1, " +
            s"CAST((k + $m) * $c - $m AS BIGINT) AS x2 " +
            s"FROM fw WHERE k % $w = $r"
          (script, sql)
        case 2 =>
          // named subselect + DECLARE'd default in the outer WHERE
          val q = rnd.nextInt(2)
          val script =
            "DECLARE $cut AS Int64 = " + m + ";\n" +
            "$src = (SELECT a, k, v FROM fw WHERE v % " + w + " = " + r + ");\n" +
            s"SELECT $i AS tag, a, CAST(v + " + "$cut" + s" AS BIGINT) AS x1, " +
            s"CAST(k * $c AS BIGINT) AS x2 " +
            "FROM $src WHERE a % " + d + " != " + q
          val sql =
            s"SELECT $i AS tag, a, CAST(v + $m AS BIGINT) AS x1, " +
            s"CAST(k * $c AS BIGINT) AS x2 " +
            s"FROM (SELECT a, k, v FROM fw WHERE v % $w = $r) " +
            s"WHERE a % $d != $q"
          (script, sql)
        case 3 =>
          // REDUCE with a scalar woven into the aggregate items
          val script =
            "$m = " + m + ";\n" +
            "$red = ($key, $vs) -> (AsStruct(" + i + " AS tag, " +
            "$key AS a, " +
            "CAST(SUM($vs) + $m AS BIGINT) AS x1, " +
            "CAST(COUNT($vs) * " + c + " AS BIGINT) AS x2));\n" +
            s"REDUCE fw ON k USING " + "$red(v % " + d + ")" +
            s" WHERE v % $w = $r"
          val sql =
            s"SELECT $i AS tag, k AS a, " +
            s"CAST(SUM(v % $d) + $m AS BIGINT) AS x1, " +
            s"CAST(COUNT(v % $d) * $c AS BIGINT) AS x2 " +
            s"FROM fw WHERE v % $w = $r GROUP BY k"
          (script, sql)
        case 4 =>
          // hint spellings + WITH SCHEMA in one statement: GROUP
          // COMPACT BY / IN COMPACT / ASSUME ORDER BY drop (no sort
          // runs — the compare is order-insensitive), the SCHEMA hint
          // projects/casts; the oracle is the hand-expanded plain form
          val s32 = rnd.nextBoolean()
          val kT = if (s32) "Int32" else "Int64"
          val kC = if (s32) "INT" else "BIGINT"
          val script =
            s"SELECT $i AS tag, a, " +
            s"CAST(SUM(k % $d) + $m AS BIGINT) AS x1, " +
            s"CAST(COUNT(*) * $c AS BIGINT) AS x2 " +
            s"FROM fw WITH SCHEMA (a Int64, k $kT, v Int64) " +
            s"WHERE v % $w = $r AND a % 3 IN COMPACT (0, 1) " +
            "GROUP COMPACT BY a ASSUME ORDER BY a"
          val sql =
            s"SELECT $i AS tag, a, " +
            s"CAST(SUM(k % $d) + $m AS BIGINT) AS x1, " +
            s"CAST(COUNT(*) * $c AS BIGINT) AS x2 " +
            s"FROM (SELECT CAST(a AS BIGINT) AS a, CAST(k AS $kC) AS k, " +
            "CAST(v AS BIGINT) AS v FROM fw) " +
            s"WHERE v % $w = $r AND a % 3 IN (0, 1) GROUP BY a"
          (script, sql)
        case _ =>
          // by-name UNION ALL (select.cpp:2846-2852 UnionAll mode)
          // inside a named subselect: branches with DIFFERENT column
          // orders and one column absent per side — absent columns
          // fill NULL; the oracle is the hand-aligned positional form
          val script =
            "$u = (SELECT a, CAST(v * " + c + " AS BIGINT) AS p, " +
            "CAST(k AS BIGINT) AS lo FROM fw WHERE v % " + w + " = " + r +
            "\n  UNION ALL\n" +
            "  SELECT CAST(v % " + d + " AS BIGINT) AS hi, a, " +
            "CAST(v * " + c + " + 1 AS BIGINT) AS p FROM fw " +
            "WHERE v % " + w + " != " + r + ");\n" +
            s"SELECT $i AS tag, a, " +
            "CAST(p + coalesce(lo, 0) AS BIGINT) AS x1, " +
            "CAST(coalesce(hi, -1) * 3 AS BIGINT) AS x2 FROM $u"
          val sql =
            s"SELECT $i AS tag, a, " +
            "CAST(p + coalesce(lo, 0) AS BIGINT) AS x1, " +
            "CAST(coalesce(hi, -1) * 3 AS BIGINT) AS x2 FROM (" +
            s"SELECT a, CAST(v * $c AS BIGINT) AS p, " +
            s"CAST(k AS BIGINT) AS lo, NULL AS hi FROM fw WHERE v % $w = $r" +
            " UNION ALL " +
            s"SELECT a, CAST(v * $c + 1 AS BIGINT), NULL, " +
            s"CAST(v % $d AS BIGINT) FROM fw WHERE v % $w != $r)"
          (script, sql)
      }
    }
  }

  /** SCRIPT-DML-domain cases: each case is (script, oracleSql,
    * tableName) over the `fw` fixture. The script CREATEs a keyed
    * table, seeds it, then applies 2–4 random UPSERT/REPLACE/DELETE/
    * UPDATE statements (SQLv1.g.in:579,968-969) and SELECTs the final
    * image; the oracle is the HAND-EXPANDED relational algebra of the
    * same draws — full-outer key merges for the write verbs, filters
    * and gated projections for DELETE/UPDATE — nested as derived
    * tables, so any divergence in YqlDml's merge semantics (listed vs
    * unlisted columns, REPLACE nulling, old-row SET evaluation) breaks
    * the value compare. Integer-only; source keys are DISTINCT over a
    * deterministic function of the key, so engine dedup and oracle
    * DISTINCT agree. Callers must dropTableDeep each returned table
    * first. */
  def dmlCases(n: Int, seed: Long, prefix: String = "fuzz_dml")
      : Seq[(String, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val tbl = s"${prefix}_$i"
      val M = 20 + rnd.nextInt(180)
      val c1 = 2 + rnd.nextInt(9); val c2 = rnd.nextInt(50)
      val d1 = 3 + rnd.nextInt(97)
      val seedSel = s"SELECT DISTINCT v % $M AS k, " +
        s"(v % $M) * $c1 + $c2 AS v1, (v % $M) % $d1 AS v2 FROM fw"
      var oracle = s"($seedSel)"
      val ops = scala.collection.mutable.ArrayBuffer.empty[String]
      val nOps = 2 + rnd.nextInt(3)
      (0 until nOps).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 => // UPSERT listed (k, v1): v2 keeps / null for new keys
            val e = 2 + rnd.nextInt(7); val f = rnd.nextInt(40)
            val m2 = 10 + rnd.nextInt(150)
            val w = 2 + rnd.nextInt(5); val r = rnd.nextInt(w)
            val s2 = s"SELECT DISTINCT v % $m2 AS k, (v % $m2) * $e + $f AS v1 " +
              s"FROM fw WHERE (v % $m2) % $w = $r"
            ops += s"UPSERT INTO $tbl (k, v1) $s2"
            oracle = s"(SELECT coalesce(u.k, t.k) AS k, " +
              s"CASE WHEN u.k IS NOT NULL THEN u.v1 ELSE t.v1 END AS v1, " +
              s"t.v2 AS v2 FROM $oracle t FULL OUTER JOIN ($s2) u ON t.k = u.k)"
          case 1 => // full-row UPSERT
            val e = 2 + rnd.nextInt(7); val f = rnd.nextInt(40)
            val g = 1 + rnd.nextInt(60)
            val m2 = 10 + rnd.nextInt(150)
            val w = 2 + rnd.nextInt(5); val r = rnd.nextInt(w)
            val s2 = s"SELECT DISTINCT v % $m2 AS k, (v % $m2) * $e + $f AS v1, " +
              s"(v % $m2) + $g AS v2 FROM fw WHERE (v % $m2) % $w = $r"
            ops += s"UPSERT INTO $tbl $s2"
            oracle = s"(SELECT coalesce(u.k, t.k) AS k, " +
              s"CASE WHEN u.k IS NOT NULL THEN u.v1 ELSE t.v1 END AS v1, " +
              s"CASE WHEN u.k IS NOT NULL THEN u.v2 ELSE t.v2 END AS v2 " +
              s"FROM $oracle t FULL OUTER JOIN ($s2) u ON t.k = u.k)"
          case 2 => // REPLACE listed (k, v2): v1 nulled for written keys
            val g = 1 + rnd.nextInt(60)
            val m2 = 10 + rnd.nextInt(150)
            val w = 2 + rnd.nextInt(5); val r = rnd.nextInt(w)
            val s2 = s"SELECT DISTINCT v % $m2 AS k, (v % $m2) + $g AS v2 " +
              s"FROM fw WHERE (v % $m2) % $w = $r"
            ops += s"REPLACE INTO $tbl (k, v2) $s2"
            oracle = s"(SELECT coalesce(u.k, t.k) AS k, " +
              s"CASE WHEN u.k IS NOT NULL THEN NULL ELSE t.v1 END AS v1, " +
              s"CASE WHEN u.k IS NOT NULL THEN u.v2 ELSE t.v2 END AS v2 " +
              s"FROM $oracle t FULL OUTER JOIN ($s2) u ON t.k = u.k)"
          case 3 => // DELETE by predicate (keys non-null by construction)
            val w = 2 + rnd.nextInt(6); val r = rnd.nextInt(w)
            ops += s"DELETE FROM $tbl WHERE k % $w = $r"
            oracle = s"(SELECT k, v1, v2 FROM $oracle t " +
              s"WHERE NOT (k % $w = $r))"
          case 4 => // UPDATE: SET reads the OLD row, gated by WHERE
            val q = 1 + rnd.nextInt(99)
            val w = 2 + rnd.nextInt(6); val r = rnd.nextInt(w)
            ops += s"UPDATE $tbl SET v1 = v1 + $q, v2 = v2 * 2 + v1 % 7 " +
              s"WHERE k % $w = $r"
            oracle = s"(SELECT k, " +
              s"CASE WHEN k % $w = $r THEN v1 + $q ELSE v1 END AS v1, " +
              s"CASE WHEN k % $w = $r THEN v2 * 2 + v1 % 7 ELSE v2 END AS v2 " +
              s"FROM $oracle t)"
          case _ => // INSERT OR IGNORE: only fresh keys land (old row wins)
            val e = 2 + rnd.nextInt(7); val f = rnd.nextInt(40)
            val g = 1 + rnd.nextInt(60)
            val m2 = 10 + rnd.nextInt(150)
            val w = 2 + rnd.nextInt(5); val r = rnd.nextInt(w)
            val s2 = s"SELECT DISTINCT v % $m2 AS k, (v % $m2) * $e + $f AS v1, " +
              s"(v % $m2) + $g AS v2 FROM fw WHERE (v % $m2) % $w = $r"
            ops += s"INSERT OR IGNORE INTO $tbl $s2"
            oracle = s"(SELECT coalesce(t.k, u.k) AS k, " +
              s"CASE WHEN t.k IS NOT NULL THEN t.v1 ELSE u.v1 END AS v1, " +
              s"CASE WHEN t.k IS NOT NULL THEN t.v2 ELSE u.v2 END AS v2 " +
              s"FROM $oracle t FULL OUTER JOIN ($s2) u ON t.k = u.k)"
        }
      }
      // with p=1/3 an index on v1 is added at a RANDOM point of the
      // chain and the FINAL READ goes through the index table — its
      // content must equal the final state's (k, v1) projection no
      // matter when it was added (backfill + sync maintenance under
      // every later verb are both on the hook)
      val withIndex = rnd.nextInt(3) == 0
      if (withIndex) {
        val pos = rnd.nextInt(ops.length + 1)
        ops.insert(pos, s"ALTER TABLE $tbl ADD INDEX byv GLOBAL ON (v1)")
      }
      val finalRead =
        if (withIndex)
          s"SELECT $i AS tag, k, CAST(v1 AS BIGINT) AS v1, " +
          s"CAST(-999 AS BIGINT) AS v2 FROM ${tbl}__idx_byv"
        else
          s"SELECT $i AS tag, k, CAST(v1 AS BIGINT) AS v1, " +
          s"CAST(v2 AS BIGINT) AS v2 FROM $tbl"
      val finalOracle =
        if (withIndex)
          s"SELECT $i AS tag, k, CAST(v1 AS BIGINT) AS v1, " +
          s"CAST(-999 AS BIGINT) AS v2 FROM $oracle fin"
        else
          s"SELECT $i AS tag, k, CAST(v1 AS BIGINT) AS v1, " +
          s"CAST(v2 AS BIGINT) AS v2 FROM $oracle fin"
      val script =
        s"CREATE TABLE $tbl (k Int64, v1 Int64, v2 Int64, PRIMARY KEY (k));\n" +
        s"INSERT INTO $tbl $seedSel;\n" +
        ops.mkString(";\n") + ";\n" + finalRead
      (script, finalOracle, tbl)
    }
  }

  /** Table-path-function domain: randomized RANGE bounds / LIKE /
    * REGEXP member patterns / EACH-CONCAT subsets over a month-named
    * table directory. The Spark side selects members through the
    * engine's directory listing (functions/YqlTablePaths); the oracle
    * replays the SAME selection computed directly over the known month
    * list as a strftime predicate on the base table — a genuine
    * differential on the selection logic (inclusive lexicographic
    * RANGE, full-match LIKE, unanchored REGEXP).
    *
    * Returns (FROM-expression with a `$DIR` placeholder, DuckDB WHERE
    * clause over `strftime(o_orderdate, '%Y-%m')`).
    */
  def tablePathCases(n: Int, seed: Long,
      months: Seq[String]): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val bounds = ("1995-12" +: months :+ "1996-05").distinct
    def likeMatch(m: String, pat: String): Boolean = {
      val re = pat.flatMap {
        case '%' => ".*"
        case '_' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      }
      m.matches(re)
    }
    def where(sel: Seq[String]): String =
      if (sel.isEmpty) "FALSE"
      else "strftime(o_orderdate, '%Y-%m') IN (" +
        sel.map(m => s"'$m'").mkString(", ") + ")"
    val likePats = Seq("1996-0%", "%-02", "%96%", "1996-0_", "%-0%", "1995%")
    val rePats = Seq("1996-0[12]", "-0[24]$", "^1996", "0[13]$", "9[67]")
    (0 until n).map { _ =>
      rnd.nextInt(4) match {
        case 0 =>
          val lo = if (rnd.nextBoolean()) Some(bounds(rnd.nextInt(bounds.length))) else None
          val hi = lo.flatMap(_ => if (rnd.nextBoolean())
            Some(bounds(rnd.nextInt(bounds.length))) else None)
          val sel = months.filter(m =>
            lo.forall(m >= _) && hi.forall(m <= _))
          val args = Seq(Some("'$DIR'"), lo.map(l => s"'$l'"),
            hi.map(h => s"'$h'")).flatten.mkString(", ")
          (s"RANGE($args)", where(sel))
        case 1 =>
          val pat = likePats(rnd.nextInt(likePats.length))
          (s"LIKE('$$DIR', '$pat')", where(months.filter(likeMatch(_, pat))))
        case 2 =>
          val pat = rePats(rnd.nextInt(rePats.length))
          val re = java.util.regex.Pattern.compile(pat)
          (s"REGEXP('$$DIR', '$pat')",
            where(months.filter(m => re.matcher(m).find())))
        case _ =>
          var sub = months.filter(_ => rnd.nextBoolean())
          if (sub.isEmpty) sub = Seq(months(rnd.nextInt(months.length)))
          val paths = sub.map(m => s"'$$DIR/$m'").mkString(", ")
          val fn = if (rnd.nextBoolean()) s"EACH(AsList($paths))"
            else s"CONCAT($paths)"
          (fn, where(sub))
      }
    }
  }

  /** MATCH_RECOGNIZE domain: randomized FIXED-LENGTH patterns (2-3
    * vars, {1..2} quantifiers, predicates over value thresholds /
    * event_type / PREV navigation) with AFTER MATCH SKIP TO NEXT ROW —
    * fixed length + skip-to-next makes the DuckDB replay a mechanical
    * lead()-chain check at every anchor row (zero NFA ambiguity on the
    * oracle side) while the engine still parses the pattern, compiles
    * DEFINE flags + PREV lag columns and runs the NFA. Undefined vars
    * (always-true, row-existence only) appear with probability ~1/6.
    *
    * Returns (full MATCH_RECOGNIZE SELECT over `events`, DuckDB
    * replay SELECT) — both emit (user_id, a_id, z_id).
    */
  def matchRecognizeCases(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    sealed trait Pred
    case class Gt(c: Int) extends Pred
    case class Lt(c: Int) extends Pred
    case class IsType(t: String) extends Pred
    case object PrevUp extends Pred
    case object AnyRow extends Pred
    val types = Seq("click", "purchase", "view")
    def genPred(): Pred = rnd.nextInt(6) match {
      case 0 | 1 => Gt(50 + rnd.nextInt(350))
      case 2 => Lt(50 + rnd.nextInt(350))
      case 3 => IsType(types(rnd.nextInt(types.length)))
      case 4 => PrevUp
      case _ => AnyRow
    }
    (0 until n).map { ci =>
      val nVars = 2 + rnd.nextInt(2)
      val vars = (0 until nVars).map { vi =>
        val p0 = genPred()
        // keep at least one DEFINE so the clause is never empty
        val p = if (vi == 0 && p0 == AnyRow) Gt(50 + rnd.nextInt(350)) else p0
        (s"V$vi", p, 1 + rnd.nextInt(2)) // (name, pred, {reps})
      }
      val total = vars.map(_._3).sum
      val pattern = vars.map { case (v, _, r) =>
        if (r == 1) v else s"$v{$r}" }.mkString(" ")
      val defines = vars.collect { case (v, p, _) if p != AnyRow =>
        val cond = p match {
          case Gt(c) => s"value > $c"
          case Lt(c) => s"value < $c"
          case IsType(t) => s"event_type = '$t'"
          case PrevUp => "value > PREV(value)"
          case AnyRow => "TRUE"
        }
        s"$v AS $cond"
      }
      val defineClause =
        if (defines.isEmpty) "" else "  DEFINE " + defines.mkString(", ") + "\n"
      val lastVar = vars.last._1
      val spark =
        s"""SELECT user_id, a_id, z_id, CAST($ci AS BIGINT) AS case_id
           |FROM events MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY event_id
           |  MEASURES FIRST(V0.event_id) AS a_id,
           |           LAST($lastVar.event_id) AS z_id
           |  ONE ROW PER MATCH
           |  AFTER MATCH SKIP TO NEXT ROW
           |  PATTERN ($pattern)
           |$defineClause) AS m""".stripMargin
      // replay: per-offset lead() conditions; offset j's PREV is
      // offset j-1 (lag(value) at the anchor for j = 0). Window names
      // are per-case: DuckDB scopes WINDOW clauses across parenthesized
      // UNION branches, so a shared name collides.
      val w = s"w$ci"
      val offsets = vars.flatMap { case (_, p, r) => Seq.fill(r)(p) }
      def v(j: Int) = if (j == 0) "value" else s"lead(value, $j) OVER $w"
      def ty(j: Int) = if (j == 0) "event_type" else s"lead(event_type, $j) OVER $w"
      def pv(j: Int) = if (j == 0) s"lag(value) OVER $w" else v(j - 1)
      val conds = offsets.zipWithIndex.map { case (p, j) =>
        p match {
          case Gt(c) => s"${v(j)} > $c"
          case Lt(c) => s"${v(j)} < $c"
          case IsType(t) => s"${ty(j)} = '$t'"
          case PrevUp => s"${v(j)} > ${pv(j)}"
          case AnyRow => s"lead(event_id, $j) OVER $w IS NOT NULL"
        }
      } :+ s"lead(event_id, ${total - 1}) OVER $w IS NOT NULL"
      val duck =
        s"""SELECT user_id, event_id AS a_id,
           |  ${if (total == 1) "event_id" else s"lead(event_id, ${total - 1}) OVER $w"} AS z_id,
           |  CAST($ci AS BIGINT) AS case_id
           |FROM events
           |WINDOW $w AS (PARTITION BY user_id ORDER BY event_id)
           |QUALIFY ${conds.mkString("\n  AND ")}""".stripMargin
      (spark, duck)
    }
  }

  /** GROUP BY HOP / SessionWindow fuzz over `events`: randomized
    * hop/interval multiples, timeouts, partitioning, and 4-argument
    * lambda sessions with value-dependent timeouts. Each case reduces
    * to an order-free signature (window/session count, Σcnt², Σcnt) so
    * the DuckDB replay — time_bucket+unnest for HOP placement,
    * gaps-and-islands for sessions — compares exactly. Value-dependent
    * thresholds only run per-user ((user_id, ts) is unique there;
    * global ties would make the break order-dependent). */
  def hopSessionCases(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    def sig(ci: Int, inner: String): String =
      s"""SELECT CAST($ci AS BIGINT) AS case_id,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(cnt*cnt) AS BIGINT) AS q,
         |  CAST(SUM(cnt) AS BIGINT) AS t
         |FROM ($inner)""".stripMargin
    // Gap arithmetic must mirror the ENGINE form under replay:
    //  - the 4-arg lambda computes `unix_timestamp(a) - unix_timestamp(b)`
    //    = INTEGER seconds (floored) with a strict `>` — the round-10
    //    sf10 soak caught the fractional replay breaking one session
    //    the floored lambda does not (gap 21600.714 floors to 21600)
    //  - the 2-arg form lowers to Spark's native session_window, which
    //    compares at FULL microsecond precision with half-open windows
    //    (a new event exactly at prev_ts + gap starts a session → >=)
    def islands(ci: Int, byUser: Boolean, thr: String,
        floorSecs: Boolean): String = {
      val pk = if (byUser) "PARTITION BY user_id " else ""
      val gk = if (byUser) "user_id, " else ""
      val gap =
        if (floorSecs)
          s"floor(epoch(ts)) - floor(epoch(lag(ts) OVER (${pk}ORDER BY ts)))"
        else s"epoch(ts) - epoch(lag(ts) OVER (${pk}ORDER BY ts))"
      val cmp = if (floorSecs) ">" else ">="
      sig(ci,
        s"""SELECT count(*) AS cnt FROM (
           |  SELECT user_id, sid FROM (
           |    SELECT user_id, ts, sum(brk) OVER (${pk}ORDER BY ts
           |        ROWS UNBOUNDED PRECEDING) AS sid FROM (
           |      SELECT user_id, ts,
           |        CASE WHEN lag(ts) OVER (${pk}ORDER BY ts) IS NULL
           |          OR $gap $cmp ($thr) THEN 1 ELSE 0 END AS brk
           |      FROM events)))
           |GROUP BY ${gk}sid""".stripMargin)
    }
    (0 until n).map { ci =>
      rnd.nextInt(3) match {
        case 0 => // hopping windows: size = k × hop, epoch-aligned
          val hopH = Seq(1, 2, 3, 6)(rnd.nextInt(4))
          val k = 1 + rnd.nextInt(3)
          val byUser = rnd.nextBoolean()
          val gk = if (byUser) "user_id, " else ""
          val spark = sig(ci,
            s"""SELECT COUNT(*) AS cnt FROM events
               |  GROUP BY ${gk}HOP(ts, 'PT${hopH}H', 'PT${hopH * k}H',
               |    'PT1H')""".stripMargin)
          val buckets = (0 until k).map { j =>
            val b = s"time_bucket(INTERVAL '$hopH hours', ts)"
            if (j == 0) b else s"$b - INTERVAL '${j * hopH} hours'"
          }.mkString("[", ", ", "]")
          val duck = sig(ci,
            s"""SELECT count(*) AS cnt
               |FROM (SELECT ${gk}unnest($buckets) AS ws FROM events)
               |GROUP BY ${gk}ws""".stripMargin)
          (spark, duck)
        case 1 => // 2-arg SessionWindow, fixed timeout
          val tH = Seq(1, 2, 4, 6, 12)(rnd.nextInt(5))
          val byUser = rnd.nextBoolean()
          val gk = if (byUser) "user_id, " else ""
          val spark = sig(ci,
            s"""SELECT COUNT(*) AS cnt FROM events
               |  GROUP BY ${gk}SessionWindow(ts, 'PT${tH}H') AS ss""".stripMargin)
          (spark, islands(ci, byUser, (tH * 3600).toString,
            floorSecs = false))
        case _ => // 4-arg lambda session, value-dependent timeout
          val ty = Seq("click", "purchase", "view")(rnd.nextInt(3))
          val t1 = (1 + rnd.nextInt(4)) * 1800
          val t2 = (2 + rnd.nextInt(6)) * 3600
          val spark =
            s"""$$init = ($$row) -> ($$row.ts);
               |$$update = ($$row, $$state) -> (AsTuple(
               |  unix_timestamp($$row.ts) - unix_timestamp($$state) >
               |    IF($$row.event_type = '$ty', $t1, $t2), $$row.ts));
               |$$calculate = ($$row, $$state) -> ($$state);
               |""".stripMargin + sig(ci,
              s"""SELECT COUNT(*) AS cnt FROM events
                 |  GROUP BY user_id, SessionWindow(ts, $$init, $$update,
                 |    $$calculate) AS ss""".stripMargin)
          (spark, islands(ci, byUser = true,
            s"CASE WHEN event_type = '$ty' THEN $t1 ELSE $t2 END",
            floorSecs = true))
      }
    }
  }

  /** String-formatting/Math-tail domain (round 9): randomized
    * `Module::Fn` calls over the orders text/key columns, each paired
    * with a structural DuckDB replay — escape-family roundtrips with
    * random injected control bytes, width-pinned hex/bin, removeAny
    * char classes, erf roundtrips at random scales, gamma differential
    * at random positive offsets. Items are SELECT fragments for
    * `FROM orders` (both engines). */
  def strFmtItems(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed * 31 + 17)
    val ctrl = Seq(1, 2, 3, 7, 9, 10, 13, 27, 31, 34, 63, 92, 127)
    (0 until n).map { _ =>
      rnd.nextInt(10) match {
        case 0 => // EscapeC/UnescapeC roundtrip with a control byte
          val r = ctrl(rnd.nextInt(ctrl.length))
          (s"String::UnescapeC(String::EscapeC(o_orderpriority || chr($r)))",
           s"o_orderpriority || chr($r)")
        case 1 => // Cgi roundtrip with a random reserved-char suffix
          val s = Seq(" ", "?", "=", "%", "&", "~", "+", "/")
            .take(1 + rnd.nextInt(7)).mkString
          (s"String::CgiUnescape(String::CgiEscape(o_orderpriority || '$s'))",
           s"o_orderpriority || '$s'")
        case 2 => // Html roundtrip with markup-ish suffix
          val s = Seq("<", ">", "&", "a", " b").take(1 + rnd.nextInt(5)).mkString
          (s"String::DecodeHtml(String::EncodeHtml(o_orderpriority || '$s'))",
           s"o_orderpriority || '$s'")
        case 3 => // Collapse over mixed whitespace runs
          val r = Seq(9, 10, 13).apply(rnd.nextInt(3))
          (s"String::Collapse(o_orderpriority || chr($r) || chr($r) || 'x  y')",
           s"regexp_replace(o_orderpriority || chr($r) || chr($r) || 'x  y'," +
             " '\\s+', ' ', 'g')")
        case 4 => // Hex width pin at a random positive scale
          val k1 = 1 + rnd.nextInt(999); val k2 = rnd.nextInt(9999)
          (s"String::Hex(o_orderkey * $k1 + $k2)",
           s"'0x' || lpad(hex(o_orderkey * $k1 + $k2), 16, '0')")
        case 5 => // SHex of a strictly negative value
          val k = 1 + rnd.nextInt(9999)
          (s"String::SHex(0 - (o_orderkey + $k))",
           s"'-0x' || lpad(hex(o_orderkey + $k), 16, '0')")
        case 6 => // RemoveFirst/RemoveLast over a random char class
          val set = rnd.shuffle("E-RUGHNT10 ".toList).take(1 + rnd.nextInt(3))
            .mkString.replace("-", "\\-")
          val plain = set.replace("\\-", "-")
          if (rnd.nextBoolean())
            (s"String::RemoveFirst(o_orderpriority, '$plain')",
             s"regexp_replace(o_orderpriority, '[$set]', '')")
          else
            (s"String::RemoveLast(o_orderpriority, '$plain')",
             s"reverse(regexp_replace(reverse(o_orderpriority), '[$set]', ''))")
        case 7 => // base64 + bytelist identity chains
          (s"String::FromByteList(String::ToByteList(" +
             "String::Base64Decode(String::Base64Encode(o_orderpriority))))",
           "o_orderpriority")
        case 8 => // erf roundtrip at a random modulus/scale
          val m = 500 + rnd.nextInt(2500)
          (s"ROUND(Math::Erf(Math::ErfInv((o_orderkey % $m) / " +
             s"CAST($m AS DOUBLE) * 1.9 - 0.95)), 8)",
           s"ROUND(CAST(o_orderkey % $m AS DOUBLE) / $m * 1.9 - 0.95, 8)")
        case 9 => // gamma differential on a random positive grid
          val m = 100 + rnd.nextInt(300)
          val off = Seq("0.1", "0.25", "0.5", "1.0", "1.5")(rnd.nextInt(5))
          (s"ROUND(Math::Tgamma((o_orderkey % $m) / 100.0 + $off), 6)",
           s"ROUND(gamma((o_orderkey % $m) / 100.0 + $off), 6)")
      }
    }
  }

  /** Yson::Options differential domain (round 10): randomized
    * (carrier node kind × target type × options mode) triples over
    * orders columns. The ENGINE parses a data-built carrier text
    * through the convert.h kernel; the DUCKDB side re-derives the
    * expected value from the SAME base columns by the semantic rules —
    * a true differential, no shared code path. Items are SELECT
    * fragments for `FROM orders` (both engines). */
  def ysonOptItems(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed * 53 + 7)
    // carrier builders: (yql carrier text expr, node kind, duck value expr)
    // kinds: int (value expr v), numstr ("v"), junk (unparseable str),
    // bool, dbl (v.5), entity, list, dict
    def item(): (String, String) = {
      val m = 3 + rnd.nextInt(96)
      val v = s"(o_custkey % $m)" // BIGINT value both engines
      val kind = rnd.nextInt(8)
      val (carrY, carrD) = kind match {
        case 0 => (s"('' || CAST($v AS STRING))", "int")
        case 1 => (s"('\"' || CAST($v AS STRING) || '\"')", "numstr")
        case 2 => ("('\"x' || o_orderstatus || '\"')", "junk")
        case 3 => (s"(CASE WHEN $v % 2 = 0 THEN 'true' ELSE 'false' END)", "bool")
        case 4 => (s"('' || CAST($v AS STRING) || '.5')", "dbl")
        case 5 => ("'null'", "entity")
        case 6 => (s"('[1,' || CAST($v AS STRING) || ']')", "list")
        case _ => (s"('{\"a\":' || CAST($v AS STRING) || '}')", "dict")
      }
      val target = Seq("Int64", "Double", "Bool", "String")(rnd.nextInt(4))
      val auto = rnd.nextBoolean()
      val mode = if (auto) "Yson::Options(true AS AutoConvert)"
        else "Yson::Options(false AS Strict)"
      val y = s"Yson::ConvertTo$target($carrY, $mode)"
      val even = s"($v % 2 = 0)" // the bool carrier's truth value
      // expected value per convert.h, re-derived over base columns
      val d = (carrD, target, auto) match {
        // ——— Int64 ———
        case ("int", "Int64", _) => s"CAST($v AS BIGINT)"
        case ("numstr", "Int64", true) => s"CAST($v AS BIGINT)"
        case ("dbl", "Int64", true) => s"CAST($v AS BIGINT)" // trunc v.5 → v
        case ("bool", "Int64", true) =>
          s"CAST(CASE WHEN $even THEN 1 ELSE 0 END AS BIGINT)"
        case ("junk", "Int64", true) => "CAST(0 AS BIGINT)"
        case (("entity" | "list" | "dict"), "Int64", true) => "CAST(0 AS BIGINT)"
        case (_, "Int64", false) => "CAST(NULL AS BIGINT)"
        // ——— Double: int/dbl nodes always convert ———
        case ("int", "Double", _) => s"CAST($v AS DOUBLE)"
        case ("dbl", "Double", _) => s"CAST($v AS DOUBLE) + 0.5"
        case ("numstr", "Double", true) => s"CAST($v AS DOUBLE)"
        case ("bool", "Double", true) =>
          s"CAST(CASE WHEN $even THEN 1 ELSE 0 END AS DOUBLE)"
        case ("junk", "Double", true) => "CAST(0 AS DOUBLE)"
        case (("entity" | "list" | "dict"), "Double", true) => "CAST(0 AS DOUBLE)"
        case (_, "Double", false) => "CAST(NULL AS DOUBLE)"
        // ——— Bool: only the bool node and 'true'/'false' strings hit ———
        case ("bool", "Bool", _) => even
        case ("int", "Bool", true) => s"$v <> 0"
        case ("dbl", "Bool", true) => "TRUE" // v.5 never zero
        case (("numstr" | "junk"), "Bool", true) => "TRUE" // non-empty str
        case ("entity", "Bool", true) => "FALSE"
        case (("list" | "dict"), "Bool", true) => "TRUE" // non-empty
        case (_, "Bool", false) => "CAST(NULL AS BOOLEAN)"
        // ——— String ———
        case ("numstr", "String", _) => s"CAST($v AS VARCHAR)"
        case ("junk", "String", _) => "'x' || o_orderstatus"
        case ("int", "String", true) => s"CAST($v AS VARCHAR)"
        case ("dbl", "String", true) => s"CAST($v AS VARCHAR) || '.5'"
        case ("bool", "String", true) =>
          s"CASE WHEN $even THEN 'true' ELSE 'false' END"
        case (("entity" | "list" | "dict"), "String", true) => "''"
        case (_, "String", false) => "CAST(NULL AS VARCHAR)"
      }
      (y, d)
    }
    (0 until n).map(_ => item())
  }
}
