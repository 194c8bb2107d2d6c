package graft.ql

/** Seeded differential fuzzer for the PG-syntax frontend
  * (`graft.functions.PgSql`, reference pg_sql.cpp routed by
  * `--!syntax_pg`, translation_settings.cpp:131): generates random
  * queries INSIDE the bound PG subset and renders each expression
  * twice — as PG-dialect text for the engine's translator and as
  * DuckDB SQL for the oracle. DuckDB's own dialect is PG-flavored, so
  * most lexemes ship verbatim (`::` casts, `||`, E'' escape strings,
  * '' doubling, raw backslashes, ~~/~~* LIKE operators, strpos,
  * substring FROM/FOR); the two engines diverge only on the regex
  * operator family, where DuckDB's `~` is a FULL match while PG's is
  * partial — those render as explicit `regexp_matches` on the oracle
  * side. A hash mismatch is therefore a genuine translator or
  * lowering bug, not dialect noise.
  *
  * Generator discipline (same contract as [[ExprFuzz]]):
  *   - tracked magnitude bounds, no division/modulo-by-expression —
  *     int64 arithmetic cannot overflow at any corpus decade;
  *   - regex patterns come from a pool using only constructs with
  *     identical semantics in java.util.regex and DuckDB's RE2
  *     (no backrefs, no lookaround, no class-name escapes);
  *   - every case is a deterministic function of the seed.
  */
object PgFuzz {

  /** One expression rendered for both engines. */
  final case class P(pg: String, duck: String, bound: Long)

  /** The shared fixture: PG and DuckDB parse this text identically
    * (CASE / % / AS), so it prefixes BOTH queries verbatim. */
  val fixtureCte: String =
    """WITH base AS (
      |  SELECT o_orderkey AS id, o_custkey AS a,
      |         CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |              ELSE o_custkey % 100 END AS c,
      |         o_orderstatus AS s, o_orderpriority AS t,
      |         CASE WHEN o_orderkey % 5 = 0 THEN NULL
      |              ELSE o_orderstatus END AS u
      |  FROM orders)""".stripMargin

  /** Render the full differential pair: (PG query text WITH the
    * `--!syntax_pg` marker and `$n` params left in place, param map,
    * DuckDB oracle SQL). The query shape exercises the translator's
    * whole surface: expression projection, a WHERE predicate, `$n`
    * binding, a `""` identifier, ORDER BY + LIMIT/OFFSET. */
  def render(n: Int, seed: Long): (String, Map[String, String], String) = {
    val rnd = new scala.util.Random(seed)
    val es = Seq.fill(n)(rnd.nextInt(3) match {
      case 0 => genStr(rnd, 0)
      case 1 => genInt(rnd, 0)
      case _ => genBool(rnd, 0)
    })
    val pgItems = es.zipWithIndex
      .map { case (e, i) => s"${e.pg} AS x$i" }.mkString(", ")
    val duckItems = es.zipWithIndex
      .map { case (e, i) => s"${e.duck} AS x$i" }.mkString(", ")
    val where = genBool(rnd, 0)
    // $n params bind two literals the WHERE folds in; the oracle
    // inlines the same literal text
    val p1 = s"'${likePool(rnd.nextInt(likePool.length))}'"
    val p2 = (rnd.nextInt(40) + 10).toString
    val pgWhere = s"((${where.pg}) OR t ~~ $$1 OR c = $$2)"
    val duckWhere = s"((${where.duck}) OR t LIKE $p1 OR c = $p2)"
    val pg =
      s"""--!syntax_pg
         |$fixtureCte
         |SELECT base."id" AS id, $pgItems
         |FROM base
         |WHERE $pgWhere
         |ORDER BY base.id
         |LIMIT 200000 OFFSET 3""".stripMargin
    val duck =
      s"""$fixtureCte
         |SELECT base.id AS id, $duckItems
         |FROM base
         |WHERE $duckWhere
         |ORDER BY base.id
         |LIMIT 200000 OFFSET 3""".stripMargin
    (pg, Map("1" -> p1, "2" -> p2), duck)
  }

  /** DISTINCT ON differential: PG keeps the FIRST row per ON-group in
    * ORDER BY order; DuckDB implements the same construct natively,
    * so the oracle text is the translator input minus the marker
    * (with the usual `duck`-side expression renders). The per-group
    * order is made total with the unique `id` tiebreak, so both
    * engines must select the SAME row — any divergence is a bug in
    * the window lowering, not order noise. */
  def renderDistinctOn(seed: Long): (String, String) = {
    val rnd = new scala.util.Random(seed)
    val key = rnd.nextInt(3) match {
      case 0 => "c" // nullable: NULLs form one DISTINCT ON group
      case 1 => "(a % 7)"
      case _ => "s"
    }
    val e1 = genInt(rnd, 1)
    val e2 = genStr(rnd, 1)
    val dir = if (rnd.nextBoolean()) "DESC" else "ASC"
    // PG defaults: ASC sorts NULLs LAST, DESC sorts NULLs FIRST. The
    // PG text leaves them IMPLICIT (exercising the translator's
    // default-null-order injection); the DuckDB oracle — whose own
    // default is NULLS LAST both ways — states them explicitly.
    val dirDuck =
      if (dir == "DESC") "DESC NULLS FIRST" else "ASC NULLS LAST"
    // order by the x1 ALIAS (not its expression text): a constant
    // draw would render as a bare integer — an ORDINAL to PG, DuckDB
    // and Spark alike — and the alias path also exercises the
    // translator's alias→expression substitution inside the window
    val pg =
      s"""--!syntax_pg
         |$fixtureCte
         |SELECT DISTINCT ON ($key) $key AS k, ${e1.pg} AS x1,
         |       ${e2.pg} AS x2, id
         |FROM base
         |ORDER BY $key, x1 $dir, id""".stripMargin
    val duck =
      s"""$fixtureCte
         |SELECT DISTINCT ON ($key) $key AS k, ${e1.duck} AS x1,
         |       ${e2.duck} AS x2, id
         |FROM base
         |ORDER BY $key NULLS LAST, x1 $dirDuck, id""".stripMargin
    (pg, duck)
  }

  // ---- literal pools --------------------------------------------------

  /** Raw PG string literals (shipped verbatim to DuckDB): '' doubling
    * and literal backslashes — standard_conforming_strings=on makes
    * the backslash RAW in both dialects; the translator must
    * re-escape it for Spark. */
  private val rawPool = Seq("'AB'", "'x''y'", "'p\\q'", "'-'", "'URG'", "''")

  /** E'' escape strings — C-style escapes decode identically in PG,
    * DuckDB and the translator. */
  private val ePool = Seq("E'a\\tb'", "E'n\\nn'", "E'q\\\\r'", "E'\\'s'")

  /** Regex patterns with identical java.util.regex / RE2 semantics
    * over the fixture's ASCII columns. */
  private val rePool = Seq(
    "^[0-9]-", "URG|LOW", "H$", "[AEIOU]G", "ME?D", "T{1,2}",
    "^(1|2)-", "S..C", "O|F", "^P", "[^0-9 -]+$", "(EN)+")

  /** LIKE patterns (literal % and _ only). */
  private val likePool = Seq("1-%", "%T", "%IG%", "_-H%", "%E%E%", "O")

  /** Dollar-quoted literals — raw bodies, verbatim in DuckDB. */
  private val dollarPool = Seq(
    "$$p\\q$$", "$$it's$$", "$t$with $$ in$t$", "$x$a-b$x$")

  /** `[NOT] SIMILAR TO` — DuckDB's SIMILAR TO is NOT PG-compatible
    * (no %/_ translation, `.` stays a metachar), so each PG pattern
    * pairs with a HAND-DERIVED full-match regex for the oracle. */
  private val similarPool = Seq(
    ("'[0-9]-%'", "'^(?:[0-9]-.*)$'"),
    ("'%URG%'", "'^(?:.*URG.*)$'"),
    ("'_-(H|M)%'", "'^(?:.-(H|M).*)$'"),
    ("'%E{2}%'", "'^(?:.*E{2}.*)$'"),
    ("'(1|2)-U%'", "'^(?:(1|2)-U.*)$'"),
    ("'%L.W%'", "'^(?:.*L\\.W.*)$'")) // '.' is LITERAL in SIMILAR TO

  private def strLit(rnd: scala.util.Random): P = rnd.nextInt(6) match {
    case 0 | 1 =>
      val e = ePool(rnd.nextInt(ePool.length))
      P(e, e, 0L)
    case 2 =>
      val d = dollarPool(rnd.nextInt(dollarPool.length))
      P(d, d, 0L)
    case _ =>
      val r = rawPool(rnd.nextInt(rawPool.length))
      P(r, r, 0L)
  }

  // ---- string expressions ---------------------------------------------

  private def strRef(rnd: scala.util.Random): P = rnd.nextInt(3) match {
    case 0 => P("s", "s", 0L)
    case 1 => P("t", "t", 0L)
    case _ => P("u", "u", 0L) // nullable
  }

  private def genStr(rnd: scala.util.Random, depth: Int): P = {
    if (depth >= 3 || rnd.nextInt(4) == 0) {
      if (rnd.nextBoolean()) strRef(rnd) else strLit(rnd)
    } else rnd.nextInt(9) match {
      case 0 => // || concat: NULL-poisoning in PG, DuckDB AND Spark
        val l = genStr(rnd, depth + 1); val r = genStr(rnd, depth + 1)
        P(s"(${l.pg} || ${r.pg})", s"(${l.duck} || ${r.duck})", 0L)
      case 1 =>
        val x = genStr(rnd, depth + 1)
        val f = if (rnd.nextBoolean()) "upper" else "lower"
        P(s"$f(${x.pg})", s"$f(${x.duck})", 0L)
      case 2 => // substring FROM/FOR — native syntax in all three
        val x = genStr(rnd, depth + 1)
        val from = rnd.nextInt(4) + 1; val len = rnd.nextInt(5) + 1
        P(s"substring(${x.pg} from $from for $len)",
          s"substring(${x.duck} from $from for $len)", 0L)
      case 3 =>
        val x = genStr(rnd, depth + 1)
        val (a, b) = (rawPool(rnd.nextInt(3)), rawPool(rnd.nextInt(3)))
        P(s"replace(${x.pg}, $a, $b)", s"replace(${x.duck}, $a, $b)", 0L)
      case 4 =>
        val x = genStr(rnd, depth + 1); val y = genStr(rnd, depth + 1)
        P(s"coalesce(${x.pg}, ${y.pg})", s"coalesce(${x.duck}, ${y.duck})", 0L)
      case 5 =>
        val c = genBool(rnd, depth + 1)
        val x = genStr(rnd, depth + 1); val y = genStr(rnd, depth + 1)
        P(s"(CASE WHEN ${c.pg} THEN ${x.pg} ELSE ${y.pg} END)",
          s"(CASE WHEN ${c.duck} THEN ${x.duck} ELSE ${y.duck} END)", 0L)
      case 6 => // int → text cast through the :: rewriter
        val x = genInt(rnd, depth + 1)
        P(s"(${x.pg})::text", s"CAST(${x.duck} AS VARCHAR)", 0L)
      case 7 => // ARRAY literal + 1-based subscript: DuckDB's list
        // indexing is PG-identical for idx ≥ 1 (out-of-range → NULL;
        // negatives wrap in DuckDB but NULL in PG, so never drawn);
        // or array_to_string, which skips NULL elements in both
        val es = Seq.fill(rnd.nextInt(2) + 2)(genStr(rnd, depth + 1))
        if (rnd.nextBoolean()) {
          val k = rnd.nextInt(es.length + 1) + 1 // 1..len+1 (oob possible)
          P(s"(ARRAY[${es.map(_.pg).mkString(", ")}])[$k]",
            s"(ARRAY[${es.map(_.duck).mkString(", ")}])[$k]", 0L)
        } else
          // PG's array_to_string returns '' for an all-NULL (or
          // empty) array — DuckDB returns NULL there, so the oracle
          // coalesces; the engine side (array_join) is PG-exact
          P(s"array_to_string(ARRAY[${es.map(_.pg).mkString(", ")}], '-')",
            s"coalesce(array_to_string(" +
              s"ARRAY[${es.map(_.duck).mkString(", ")}], '-'), '')",
            0L)
      case _ =>
        val x = genStr(rnd, depth + 1)
        P(s"nullif(${x.pg}, 'O')", s"nullif(${x.duck}, 'O')", 0L)
    }
  }

  // ---- integer expressions ----------------------------------------------

  private val MaxBound = 1L << 40

  private def intRef(rnd: scala.util.Random): P = rnd.nextInt(3) match {
    case 0 => P("id", "id", 1L << 32)
    case 1 => P("a", "a", 1L << 32)
    case _ => P("c", "c", 100L) // nullable
  }

  private def genInt(rnd: scala.util.Random, depth: Int): P = {
    if (depth >= 3 || rnd.nextInt(4) == 0) {
      if (rnd.nextBoolean()) intRef(rnd)
      else { val v = rnd.nextInt(26) - 5; P(v.toString, v.toString, math.abs(v).toLong) }
    } else rnd.nextInt(8) match {
      case 0 =>
        val l = genInt(rnd, depth + 1); val r = genInt(rnd, depth + 1)
        val op = if (rnd.nextBoolean()) "+" else "-"
        P(s"(${l.pg} $op ${r.pg})", s"(${l.duck} $op ${r.duck})", l.bound + r.bound)
      case 1 =>
        val l = genInt(rnd, depth + 1)
        val f = rnd.nextInt(9) + 2
        if (l.bound * f < MaxBound)
          P(s"(${l.pg} * $f)", s"(${l.duck} * $f)", l.bound * f)
        else l
      case 2 =>
        val x = genStr(rnd, depth + 1)
        P(s"length(${x.pg})::int8", s"CAST(length(${x.duck}) AS BIGINT)", 1L << 16)
      case 3 => // strpos arg-order swap goes through the translator
        val x = genStr(rnd, depth + 1)
        val sub = rawPool(rnd.nextInt(3))
        P(s"strpos(${x.pg}, $sub)::int8",
          s"CAST(strpos(${x.duck}, $sub) AS BIGINT)", 1L << 16)
      case 4 =>
        val x = genInt(rnd, depth + 1); val y = genInt(rnd, depth + 1)
        P(s"coalesce(${x.pg}, ${y.pg})", s"coalesce(${x.duck}, ${y.duck})",
          math.max(x.bound, y.bound))
      case 5 =>
        val c = genBool(rnd, depth + 1)
        val x = genInt(rnd, depth + 1); val y = genInt(rnd, depth + 1)
        P(s"(CASE WHEN ${c.pg} THEN ${x.pg} ELSE ${y.pg} END)",
          s"(CASE WHEN ${c.duck} THEN ${x.duck} ELSE ${y.duck} END)",
          math.max(x.bound, y.bound))
      case 6 => // ARRAY literal + 1-based subscript (see genStr note)
        val es = Seq.fill(rnd.nextInt(2) + 2)(genInt(rnd, depth + 1))
        val k = rnd.nextInt(es.length + 1) + 1
        P(s"(ARRAY[${es.map(_.pg).mkString(", ")}])[$k]",
          s"(ARRAY[${es.map(_.duck).mkString(", ")}])[$k]",
          es.map(_.bound).max)
      case _ => // int8 identity cast through the :: rewriter
        val x = genInt(rnd, depth + 1)
        P(s"(${x.pg})::int8", s"CAST(${x.duck} AS BIGINT)", x.bound)
    }
  }

  // ---- boolean expressions ----------------------------------------------

  private def genBool(rnd: scala.util.Random, depth: Int): P = {
    if (depth >= 3) cmp(rnd, depth)
    else rnd.nextInt(12) match {
      case 0 =>
        val l = genBool(rnd, depth + 1); val r = genBool(rnd, depth + 1)
        P(s"(${l.pg} AND ${r.pg})", s"(${l.duck} AND ${r.duck})", 1L)
      case 1 =>
        val l = genBool(rnd, depth + 1); val r = genBool(rnd, depth + 1)
        P(s"(${l.pg} OR ${r.pg})", s"(${l.duck} OR ${r.duck})", 1L)
      case 2 =>
        val x = genBool(rnd, depth + 1)
        P(s"(NOT ${x.pg})", s"(NOT ${x.duck})", 1L)
      case 3 => // the regex family — the ONE dialect divergence:
        // PG ~ is a partial match, DuckDB ~ is a full match, and
        // DuckDB has no ~* operator at all → explicit regexp_matches
        val x = strRef(rnd)
        val p = rePool(rnd.nextInt(rePool.length))
        rnd.nextInt(4) match {
          case 0 => P(s"(${x.pg} ~ '$p')",
            s"regexp_matches(${x.duck}, '$p')", 1L)
          case 1 => P(s"(${x.pg} ~* '$p')",
            s"regexp_matches(${x.duck}, '(?i)$p')", 1L)
          case 2 => P(s"(${x.pg} !~ '$p')",
            s"(NOT regexp_matches(${x.duck}, '$p'))", 1L)
          case _ => P(s"(${x.pg} !~* '$p')",
            s"(NOT regexp_matches(${x.duck}, '(?i)$p'))", 1L)
        }
      case 4 => // LIKE operators ship verbatim (~~ family)
        val x = strRef(rnd)
        val p = likePool(rnd.nextInt(likePool.length))
        rnd.nextInt(4) match {
          case 0 => P(s"(${x.pg} ~~ '$p')", s"(${x.duck} LIKE '$p')", 1L)
          case 1 => P(s"(${x.pg} ~~* '$p')", s"(${x.duck} ILIKE '$p')", 1L)
          case 2 => P(s"(${x.pg} !~~ '$p')", s"(${x.duck} NOT LIKE '$p')", 1L)
          case _ => P(s"(${x.pg} !~~* '$p')", s"(${x.duck} NOT ILIKE '$p')", 1L)
        }
      case 5 =>
        val x = if (rnd.nextBoolean()) strRef(rnd) else intRef(rnd)
        val not = if (rnd.nextBoolean()) " NOT" else ""
        P(s"(${x.pg} IS$not NULL)", s"(${x.duck} IS$not NULL)", 1L)
      case 6 =>
        val x = genInt(rnd, depth + 1)
        val lo = rnd.nextInt(20); val hi = lo + rnd.nextInt(50)
        P(s"(${x.pg} BETWEEN $lo AND $hi)",
          s"(${x.duck} BETWEEN $lo AND $hi)", 1L)
      case 7 => // IS [NOT] DISTINCT FROM — verbatim in DuckDB
        val same = rnd.nextBoolean()
        val (l, r) =
          if (same) { val x = strRef(rnd); (x, x) }
          else (if (rnd.nextBoolean()) strRef(rnd) else strLit(rnd),
            if (rnd.nextBoolean()) strRef(rnd) else strLit(rnd))
        val not = if (rnd.nextBoolean()) " NOT" else ""
        P(s"(${l.pg} IS$not DISTINCT FROM ${r.pg})",
          s"(${l.duck} IS$not DISTINCT FROM ${r.duck})", 1L)
      case 8 => // BETWEEN SYMMETRIC: bounds drawn in either order;
        // DuckDB has no SYMMETRIC, so the oracle sorts explicitly
        val x = genInt(rnd, depth + 1)
        val a = rnd.nextInt(60); val b = rnd.nextInt(60)
        P(s"(${x.pg} BETWEEN SYMMETRIC $a AND $b)",
          s"(${x.duck} BETWEEN least($a, $b) AND greatest($a, $b))", 1L)
      case 9 => // [NOT] SIMILAR TO with the hand-paired oracle regex
        val x = strRef(rnd)
        val (pat, reg) = similarPool(rnd.nextInt(similarPool.length))
        if (rnd.nextBoolean())
          P(s"(${x.pg} SIMILAR TO $pat)",
            s"regexp_matches(${x.duck}, $reg)", 1L)
        else
          P(s"(${x.pg} NOT SIMILAR TO $pat)",
            s"(NOT regexp_matches(${x.duck}, $reg))", 1L)
      case 10 => // quantified comparison over an array: the oracle
        // expands to the equivalent OR (ANY) / AND (ALL) chain, whose
        // three-valued logic is the definition of the construct
        val x = genInt(rnd, depth + 1)
        val es = Seq.fill(rnd.nextInt(2) + 2)(genInt(rnd, depth + 1))
        val op = Seq("=", "<>", "<", ">=")(rnd.nextInt(4))
        if (rnd.nextBoolean())
          P(s"(${x.pg} $op ANY(ARRAY[${es.map(_.pg).mkString(", ")}]))",
            "(" + es.map(e => s"(${x.duck}) $op (${e.duck})")
              .mkString(" OR ") + ")", 1L)
        else
          P(s"(${x.pg} $op ALL(ARRAY[${es.map(_.pg).mkString(", ")}]))",
            "(" + es.map(e => s"(${x.duck}) $op (${e.duck})")
              .mkString(" AND ") + ")", 1L)
      case _ => cmp(rnd, depth)
    }
  }

  private def cmp(rnd: scala.util.Random, depth: Int): P = {
    val ops = Seq("=", "<>", "<", "<=", ">", ">=")
    val op = ops(rnd.nextInt(ops.length))
    if (rnd.nextBoolean()) {
      val l = genStr(rnd, math.max(depth + 1, 2))
      val r = if (rnd.nextBoolean()) strLit(rnd) else strRef(rnd)
      P(s"(${l.pg} $op ${r.pg})", s"(${l.duck} $op ${r.duck})", 1L)
    } else {
      val l = genInt(rnd, math.max(depth + 1, 2))
      val r = genInt(rnd, math.max(depth + 1, 2))
      P(s"(${l.pg} $op ${r.pg})", s"(${l.duck} $op ${r.duck})", 1L)
    }
  }
}
