package graft.functions

/** YQL STATEMENT-level constructs, lowered onto Spark SQL text before
  * parsing — the layer in front of `spark.sql` that makes a real YQL
  * query string (as users type it) runnable:
  *
  *   - named expressions `$x = expr;` and named subselects
  *     `$t = (SELECT ...);` (SQLv1.g.in `named_nodes_stmt`,
  *     lowering sql/v1/sql_query.cpp): later `$x` references
  *     substitute the bound text;
  *   - lambda bindings `$f = ($a, $b) -> (expr);` (SQLv1.g.in
  *     `lambda`): call sites `$f(e1, e2)` inline the body with
  *     parameters substituted; a BARE `$f` passed to a higher-order
  *     function lowers to a Spark SQL lambda literal;
  *   - `FLATTEN BY` / `FLATTEN OPTIONAL BY` / `FLATTEN LIST BY` /
  *     `FLATTEN DICT BY` (SQLv1.g.in `flatten_source`) → a derived
  *     table over `LATERAL VIEW explode` (the same unnest the QL
  *     surface's ARRAY JOIN uses — per-element rows stream through
  *     the scan, no driver materialization);
  *   - `SELECT * WITHOUT c1, c2` (SQLv1.g.in `without_column_list`)
  *     → `SELECT * EXCEPT (c1, c2)`;
  *   - `PRAGMA ...;` statements are accepted and recorded (the
  *     reference's pragmas steer its own optimizer/runtime; Catalyst
  *     owns those decisions here).
  *
  * Everything is a source-to-source rewrite: Catalyst still does all
  * parsing, resolution and optimization of the final text, so the
  * whole surface (joins, windows, aggregates) composes with these
  * spellings for free. Scripts evaluate to the LAST select statement.
  */
object YqlScript {

  final case class Lambda(params: Seq[String], body: String)

  /** `discards` are DISCARD statements: analyzed (type-checked) but
    * never a script result — the reference's validation spelling. */
  final case class Lowered(pragmas: Seq[String], selects: Seq[String],
      discards: Seq[String] = Nil)

  /** Lower a YQL script to Spark SQL statement texts (module-call
    * `::` spellings are left for [[YqlSql.rewrite]]). */
  def lower(script: String): Lowered = {
    val stmts = splitStatements(script)
    val scalars = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val lambdas = scala.collection.mutable.LinkedHashMap.empty[String, Lambda]
    val pragmas = scala.collection.mutable.ArrayBuffer.empty[String]
    val selects = scala.collection.mutable.ArrayBuffer.empty[String]
    val discards = scala.collection.mutable.ArrayBuffer.empty[String]
    val unsupported = Set("USE", "IMPORT", "EXPORT", "DEFINE",
      "REDUCE", "DECLARE", "COMMIT", "ROLLBACK")
    stmts.map(_.trim).filter(_.nonEmpty).foreach { st =>
      val firstWord = st.takeWhile(c => c.isLetter).toUpperCase
      if (firstWord == "PRAGMA") pragmas += st.drop("PRAGMA".length).trim
      else if (firstWord == "DISCARD")
        discards += lowerSelect(substitute(st.drop("DISCARD".length).trim,
          scalars, lambdas))
      else if (firstWord == "PROCESS")
        selects += lowerProcess(st, scalars, lambdas)
      else if (unsupported(firstWord)) throw new IllegalArgumentException(
        s"unsupported YQL statement: $firstWord")
      else bindingOf(st) match {
        case Some((name, rhs)) =>
          // bindings resolve at DEFINITION time against earlier ones,
          // so later substitution is a single non-recursive pass; a
          // lambda's own parameters are kept for call-time binding
          parseLambda(rhs.trim, scalars, lambdas) match {
            case Some(Lambda(params, rawBody)) =>
              lambdas(name) = Lambda(params,
                substitute(rawBody, scalars, lambdas, keep = params.toSet))
            case None =>
              val body = lowerSelect(substitute(rhs.trim, scalars, lambdas))
              // wrap unless already ONE balanced group (a subselect)
              scalars(name) =
                if (body.startsWith("(") && matchParen(body, 0) == body.length - 1)
                  body
                else "(" + body + ")"
          }
        case None => selects += lowerSelect(substitute(st, scalars, lambdas))
      }
    }
    if (selects.isEmpty) throw new IllegalArgumentException(
      "YQL script has no SELECT statement")
    Lowered(pragmas.toSeq, selects.toSeq, discards.toSeq)
  }

  /** `PROCESS [STREAM] src [USING $f(TableRows()) [AS a]] [WHERE p]`
    * (SQLv1.g.in process_core): without USING, the documented
    * passthrough (`SELECT *`); with USING, the lambda applies per row —
    * `$p.col` references become column refs, and the body must be
    * `AsStruct(expr AS name, ...)` (the row-building idiom), which
    * lowers to the projection list. REDUCE (grouped streams) stays
    * unsupported. */
  private def lowerProcess(st: String,
      scalars: collection.Map[String, String],
      lambdas: collection.Map[String, Lambda]): String = {
    // top-level USING / WHERE boundaries (quote-aware, depth 0)
    def findKw(kw: String): Int = {
      var i = 0; var quote: Char = 0; var depth = 0
      val up = st.toUpperCase
      while (i < st.length) {
        val c = st.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else c match {
          case '\'' | '"' | '`' => quote = c
          case '(' | '{' => depth += 1
          case ')' | '}' => depth -= 1
          case _ =>
            if (depth == 0 && up.startsWith(kw, i) &&
                (i == 0 || !st.charAt(i - 1).isLetterOrDigit) &&
                (i + kw.length >= st.length ||
                  !st.charAt(i + kw.length).isLetterOrDigit)) return i
        }
        i += 1
      }
      -1
    }
    val usingAt = findKw("USING")
    val whereAt = findKw("WHERE")
    val srcEnd = Seq(usingAt, whereAt, st.length).filter(_ >= 0).min
    var head = st.substring(0, srcEnd).trim
    head = head.substring("PROCESS".length).trim
    if (head.toUpperCase.startsWith("STREAM "))
      head = head.substring("STREAM".length).trim
    val src = substitute(head, scalars, lambdas)
    val where = if (whereAt < 0) ""
      else " WHERE " + substitute(st.substring(whereAt + 5).trim, scalars, lambdas)
    val items =
      if (usingAt < 0) "*"
      else {
        val usingEnd = if (whereAt > usingAt) whereAt else st.length
        val call = st.substring(usingAt + 5, usingEnd).trim
        val m = ("(?i)^\\$([A-Za-z_][A-Za-z0-9_]*)\\s*\\(\\s*TableRows\\s*\\(\\s*\\)\\s*\\)" +
          "(\\s+AS\\s+[A-Za-z_][A-Za-z0-9_]*)?$").r
          .findFirstMatchIn(call).getOrElse(throw new IllegalArgumentException(
            s"PROCESS USING supports `$$lambda(TableRows())`, got: ${call.take(60)}"))
        val lam = lambdas.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"undeclared lambda $$${m.group(1)}"))
        require(lam.params.length == 1,
          "PROCESS lambda takes exactly one row parameter")
        val p = lam.params.head
        // $p.col → col; a bare whole-row $p is out of scope
        val body = ("\\$" + java.util.regex.Pattern.quote(p) + "\\.").r
          .replaceAllIn(lam.body, "")
        if (body.contains("$" + p)) throw new IllegalArgumentException(
          "whole-row lambda references are not supported in PROCESS; " +
          "use $" + p + ".column")
        val asStruct = "(?i)^AsStruct\\s*\\(".r.findFirstMatchIn(body.trim)
          .getOrElse(throw new IllegalArgumentException(
            "PROCESS lambda body must be AsStruct(expr AS name, ...)"))
        val open = body.trim
        val close = matchParen(open, asStruct.end - 1)
        require(close == open.length - 1,
          "PROCESS lambda body must be a single AsStruct(...) call")
        splitTopLevel(open.substring(asStruct.end, close))
          .map(_.trim).filter(_.nonEmpty).mkString(", ")
      }
    lowerSelect(s"SELECT $items FROM $src$where")
  }

  // ——— statement splitting (quote- and comment-aware, ';' at paren
  // depth 0 only) ———
  private[functions] def splitStatements(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0; var depth = 0; var quote: Char = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
        else if (c == '\\' && quote != '`' && i + 1 < n) {
          cur.append(s.charAt(i + 1)); i += 1
        }
        i += 1
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1 // drop -- comments
      } else {
        c match {
          case '\'' | '"' | '`' => quote = c; cur.append(c)
          case '(' | '{' => depth += 1; cur.append(c)
          case ')' | '}' => depth -= 1; cur.append(c)
          case ';' if depth == 0 => out += cur.toString; cur.clear()
          case _ => cur.append(c)
        }
        i += 1
      }
    }
    out += cur.toString
    out.toSeq
  }

  /** `$name = rhs` (single-bind form of `named_nodes_stmt`). */
  private def bindingOf(st: String): Option[(String, String)] = {
    val m = "^\\$([A-Za-z_][A-Za-z0-9_]*)\\s*=([\\s\\S]*)$".r
      .findFirstMatchIn(st)
    if (st.matches("^\\$[A-Za-z_][A-Za-z0-9_]*\\s*,[\\s\\S]*"))
      throw new IllegalArgumentException(
        "multi-target named-expression bindings ($a, $b = ...) are not supported")
    // `==` at the start of the RHS means the statement was a bare
    // comparison expression, not a binding
    m.filter(mm => !mm.group(2).startsWith("="))
      .map(mm => (mm.group(1), mm.group(2)))
  }

  /** `($a, $b) -> ( body )` — the simple-expression lambda form — or
    * the statement-body form `($a) -> { $x = e1; RETURN e2 }`
    * (SQLv1.g.in `lambda_body`): local `$x` bindings resolve in order
    * (parameters and outer bindings visible), and the lambda's body is
    * the fully-substituted RETURN expression. */
  private[functions] def parseLambda(rhs: String,
      outerScalars: collection.Map[String, String] = Map.empty,
      outerLambdas: collection.Map[String, Lambda] = Map.empty): Option[Lambda] = {
    val t = rhs.trim
    val m = "^\\(\\s*((?:\\$[A-Za-z_][A-Za-z0-9_]*\\??\\s*,\\s*)*\\$[A-Za-z_][A-Za-z0-9_]*\\??)?\\s*\\)\\s*->\\s*([({])".r
      .findFirstMatchIn(t).getOrElse(return None)
    val params = Option(m.group(1)).toSeq.flatMap(_.split(",").toSeq)
      .map(_.trim.stripSuffix("?").stripPrefix("$"))
    if (m.group(2) == "(") {
      val bodyStart = m.end
      val bodyEnd = matchParen(t, bodyStart - 1)
      if (bodyEnd != t.length - 1) return None
      Some(Lambda(params, t.substring(bodyStart, bodyEnd).trim))
    } else { // statement body: { stmt; ...; RETURN expr; }
      if (!t.endsWith("}")) return None
      val body = t.substring(m.end, t.length - 1)
      val locals = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var ret: Option[String] = None
      splitStatements(body).map(_.trim).filter(_.nonEmpty).foreach { st =>
        def scope = outerScalars ++ locals // locals shadow outer names
        if (st.take(6).equalsIgnoreCase("RETURN")) {
          require(ret.isEmpty, "lambda body has multiple RETURN statements")
          ret = Some(substitute(st.drop(6).trim, scope,
            outerLambdas, keep = params.toSet))
        } else {
          require(ret.isEmpty, "statements after RETURN in lambda body")
          val (name, r) = bindingOf(st).getOrElse(
            throw new IllegalArgumentException(
              s"unsupported lambda-body statement: ${st.take(60)}"))
          locals(name) = "(" + substitute(r.trim, scope,
            outerLambdas, keep = params.toSet) + ")"
        }
      }
      Some(Lambda(params, ret.getOrElse(throw new IllegalArgumentException(
        "lambda body has no RETURN statement"))))
    }
  }

  /** index of the ')' matching the '(' at `open` (quote-aware). */
  private def matchParen(s: String, open: Int): Int = {
    var i = open; var depth = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        else if (c == '\\' && quote != '`') i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in: ${s.take(80)}")
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var d = 0; var start = 0; var i = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        else if (c == '\\' && quote != '`') i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => d += 1
        case ')' => d -= 1
        case ',' if d == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Expand `$name` references: lambda calls inline their body with
    * arguments substituted; bare lambda refs lower to Spark lambda
    * literals; scalars substitute their bound text. Quote-aware; an
    * unbound `$name` is an error (the reference rejects undeclared
    * named nodes at translation). */
  private[functions] def substitute(text: String,
      scalars: collection.Map[String, String],
      lambdas: collection.Map[String, Lambda],
      keep: Set[String] = Set.empty): String = {
    val out = new StringBuilder
    var i = 0; var quote: Char = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) quote = 0
        else if (c == '\\' && quote != '`' && i + 1 < n) {
          out.append(text.charAt(i + 1)); i += 1
        }
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (c == '$' && i + 1 < n &&
          (text.charAt(i + 1).isLetter || text.charAt(i + 1) == '_')) {
        var j = i + 1
        while (j < n && (text.charAt(j).isLetterOrDigit || text.charAt(j) == '_')) j += 1
        val name = text.substring(i + 1, j)
        var k = j
        while (k < n && text.charAt(k).isWhitespace) k += 1
        val isCall = k < n && text.charAt(k) == '(' && lambdas.contains(name)
        if (keep(name)) {
          out.append(text.substring(i, j)); i = j
        } else if (isCall) {
          val close = matchParen(text, k)
          val args = splitTopLevel(text.substring(k + 1, close)).map(_.trim)
            .filter(_.nonEmpty)
          val lam = lambdas(name)
          require(args.length == lam.params.length,
            s"lambda $$$name expects ${lam.params.length} args, got ${args.length}")
          val bound = lam.params.zip(args).map { case (p, a) =>
            p -> ("(" + a + ")")
          }.toMap
          out.append("(")
            .append(substitute(lam.body, bound, Map.empty[String, Lambda]))
            .append(")")
          i = close + 1
        } else if (lambdas.contains(name)) {
          // bare lambda reference → Spark SQL lambda literal
          val lam = lambdas(name)
          val fresh = lam.params.map(p => p -> s"__la_$p").toMap
          val body = substitute(lam.body, fresh.map { case (k2, v) => k2 -> v },
            Map.empty[String, Lambda])
          val head =
            if (lam.params.length == 1) fresh(lam.params.head)
            else lam.params.map(fresh).mkString("(", ", ", ")")
          out.append(head).append(" -> ").append(body)
          i = j
        } else scalars.get(name) match {
          case Some(repl) => out.append(repl); i = j
          case None => throw new IllegalArgumentException(
            s"undeclared named expression $$$name")
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  // ——— select-level lowerings ———
  private[functions] def lowerSelect(sql: String): String =
    lowerFlatten(lowerWithout(sql))

  /** `* WITHOUT a, b` → `* EXCEPT (a, b)`. */
  def lowerWithout(sql: String): String = {
    val ident = "[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*)?"
    val re = s"(?i)\\*\\s+WITHOUT\\s+(?:IF\\s+EXISTS\\s+)?($ident(?:\\s*,\\s*$ident)*)".r
    re.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      "* EXCEPT (" + m.group(1) + ")"))
  }

  /** `src [AS a] FLATTEN [OPTIONAL|LIST|DICT] BY col [AS alias]` →
    * a derived table over LATERAL VIEW explode. The parenthesized
    * multi-column form `FLATTEN BY (a, b [AS y], ...)` builds the
    * Cartesian product of the flattened columns (the reference's
    * FlattenByColumns list, source.cpp:471) via chained LATERAL
    * VIEWs. */
  def lowerFlatten(sql: String): String = {
    val ident = "[A-Za-z_][A-Za-z0-9_]*"
    val re = ("(?i)\\bFLATTEN\\s+(?:(OPTIONAL|LIST|DICT)\\s+)?BY\\s+" +
      s"(?:($ident)(\\s+AS\\s+($ident))?|\\(([^)]*)\\))").r
    val m = re.findFirstMatchIn(sql).getOrElse(return sql)
    val mode = Option(m.group(1)).map(_.toUpperCase).getOrElse("LIST")
    // one (col, alias) per flattened column: single-ident form or the
    // parenthesized list
    val colSpecs: Seq[(String, Option[String])] =
      if (m.group(2) != null) Seq((m.group(2), Option(m.group(4))))
      else m.group(5).split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
        val asRe = s"(?i)^($ident)(?:\\s+AS\\s+($ident))?$$".r
        asRe.findFirstMatchIn(p) match {
          case Some(mm) => (mm.group(1), Option(mm.group(2)))
          case None => throw new IllegalArgumentException(
            s"unsupported FLATTEN BY item: $p")
        }
      }
    require(colSpecs.nonEmpty, "empty FLATTEN BY list")
    // backward scan over `src [AS a]` — src is an identifier chain or
    // a parenthesized derived table
    var e = m.start - 1
    while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
    def wordEndingAt(p: Int): (String, Int) = {
      var s0 = p
      while (s0 >= 0 && (sql.charAt(s0).isLetterOrDigit ||
        sql.charAt(s0) == '_' || sql.charAt(s0) == '.')) s0 -= 1
      (sql.substring(s0 + 1, p + 1), s0)
    }
    var srcAlias: Option[String] = None
    var srcEnd = e
    if (sql.charAt(e) != ')') {
      val (w, before) = wordEndingAt(e)
      var b = before
      while (b >= 0 && sql.charAt(b).isWhitespace) b -= 1
      if (b >= 1 && sql.substring(b - 1, b + 1).equalsIgnoreCase("AS") &&
          (b < 2 || !(sql.charAt(b - 2).isLetterOrDigit || sql.charAt(b - 2) == '_'))) {
        srcAlias = Some(w)
        srcEnd = b - 2
        while (srcEnd >= 0 && sql.charAt(srcEnd).isWhitespace) srcEnd -= 1
      }
    }
    val srcStart =
      if (sql.charAt(srcEnd) == ')') {
        // match backward to the opening paren of the derived table
        var d = 0; var p = srcEnd; var found = -1
        while (p >= 0 && found < 0) {
          sql.charAt(p) match {
            case ')' => d += 1
            case '(' => d -= 1; if (d == 0) found = p
            case _ =>
          }
          p -= 1
        }
        require(found >= 0, "unbalanced parentheses before FLATTEN BY")
        found
      } else wordEndingAt(srcEnd)._2 + 1
    val src = sql.substring(srcStart, srcEnd + 1)
    val inner = mode match {
      case "OPTIONAL" =>
        val conds = colSpecs.map(_._1).map(c => s"$c IS NOT NULL")
          .mkString(" AND ")
        val aliasSel = colSpecs.collect { case (c, Some(a)) => s", $c AS $a" }
          .mkString
        s"(SELECT *$aliasSel FROM $src WHERE $conds)"
      case _ => // LIST (default) / DICT — chained LATERAL VIEWs build
        // the Cartesian product across the flattened columns
        def ex(c: String): String =
          if (mode == "DICT") s"explode(map_entries($c))" else s"explode($c)"
        val views = colSpecs.zipWithIndex.map { case ((c, _), i) =>
          s" LATERAL VIEW ${ex(c)} __fbv$i AS __fb$i"
        }.mkString
        val except = (colSpecs.collect { case (c, None) => c } ++
          colSpecs.indices.map(i => s"__fb$i")).mkString(", ")
        val sel = colSpecs.zipWithIndex.map { case ((c, a), i) =>
          s"__fb$i AS ${a.getOrElse(c)}"
        }.mkString(", ")
        s"(SELECT * EXCEPT ($except), $sel FROM $src$views)"
    }
    val replaced = sql.substring(0, srcStart) + inner +
      srcAlias.map(a => s" AS $a").getOrElse("") + sql.substring(m.end)
    lowerFlatten(replaced) // additional FLATTEN clauses, to fixpoint
  }
}
