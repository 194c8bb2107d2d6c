package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PostgreSQL-syntax frontend subset — the reference vendors a full
  * PG-compatible SQL parser selected per-query by the translation
  * setting comment `--!syntax_pg`
  * (yql/essentials/sql/settings/translation_settings.cpp:131 →
  * PgParser; the frontend itself is sql/pg/pg_sql.cpp). Every PG
  * query lowers to the same relational operators the v1 dialect
  * reaches, so this frontend is a TRANSLATOR to Spark SQL, not a new
  * execution surface: the scoped subset covers the read-side
  * constructs real PG-dialect users write — SELECT / CTE / set ops,
  * `expr::type` casts with PG type names, `||` concat, LIMIT/OFFSET,
  * positional `$n` parameters, `~ ~* ~~ ~~*` (and `!`-negated) match
  * operators, E'' escape strings, `""` identifiers and `''` doubling.
  *
  * PG semantics faithfully preserved where Spark's defaults differ:
  * - plain `'a\nb'` literals are RAW (standard_conforming_strings=on):
  *   the translator re-escapes backslashes so Spark sees the same
  *   bytes; `E'...'` strings decode C-style escapes.
  * - `"ident"` is a quoted identifier, translated to backticks.
  * - `''` doubling inside literals is the PG escape for a quote.
  *
  * Out-of-subset constructs raise with a named reason (the repo-wide
  * contract for unimplementable/unscoped surface): DML/DDL under PG
  * syntax, dollar-quoted strings, DISTINCT ON.
  */
object PgSql {

  /** Does the query select the PG parser? (translation_settings.cpp:
    * a leading `--!syntax_pg` line.) */
  def isPg(query: String): Boolean =
    query.linesIterator.map(_.trim).find(_.nonEmpty)
      .exists(_.equalsIgnoreCase("--!syntax_pg"))

  def sql(spark: SparkSession, query: String,
      params: Map[String, String] = Map.empty): DataFrame = {
    YqlSql.registerAll(spark)
    spark.sql(translate(query, params))
  }

  /** PG dialect → Spark SQL text. `params` binds positional `$n`
    * (keys "1"/"$1" both accepted; values are SQL literal text). */
  def translate(query: String, params: Map[String, String] = Map.empty)
      : String = {
    val noMarker = query.linesIterator.map { l =>
      if (l.trim.equalsIgnoreCase("--!syntax_pg")) "" else l
    }.mkString("\n")
    val normalized = normalizeLexemes(noMarker, params)
    val statementHead = firstKeyword(normalized)
    if (!Set("SELECT", "WITH", "VALUES", "TABLE").contains(statementHead))
      throw new IllegalArgumentException(
        s"PG-syntax subset covers SELECT/CTE/VALUES queries; '" +
          statementHead + "' statements are not bound under " +
          "--!syntax_pg — use the v1 dialect (pg_sql.cpp parses the " +
          "full statement surface; the scoped subset is read-side)")
    if (YqlScript.maskQuotes(normalized)
        .matches("(?is).*\\bDISTINCT\\s+ON\\s*\\(.*"))
      throw new IllegalArgumentException(
        "PG DISTINCT ON is not in the bound subset — rewrite as " +
          "row_number() OVER (PARTITION BY ... ORDER BY ...) = 1")
    rewriteFunctions(rewriteCasts(rewriteMatchOps(normalized)))
  }

  /** Pass 1 — lexeme-level normalization: PG string literals (raw /
    * E-escape / '' doubling) → Spark literals, `"ident"` → backticks,
    * `$n` → bound literal text. Comments copy through. */
  private def normalizeLexemes(q: String,
      params: Map[String, String]): String = {
    val out = new StringBuilder
    val n = q.length
    var i = 0
    def prevIdentChar: Boolean =
      out.nonEmpty && (out.last.isLetterOrDigit || out.last == '_')
    while (i < n) {
      val c = q.charAt(i)
      val isE = (c == 'E' || c == 'e') && i + 1 < n &&
        q.charAt(i + 1) == '\'' && !prevIdentChar
      if (c == '\'' || isE) {
        var j = if (isE) i + 2 else i + 1
        val body = new StringBuilder
        var closed = false
        while (j < n && !closed) {
          val d = q.charAt(j)
          if (d == '\'') {
            if (j + 1 < n && q.charAt(j + 1) == '\'') {
              body.append('\''); j += 2 // '' doubling
            } else { closed = true; j += 1 }
          } else if (d == '\\' && isE && j + 1 < n) {
            // decode the C-style escapes PG's E'' supports; unknown
            // escapes keep the char (PG: "any other → the char itself")
            q.charAt(j + 1) match {
              case 'n' => body.append('\n')
              case 't' => body.append('\t')
              case 'r' => body.append('\r')
              case 'b' => body.append('\b')
              case 'f' => body.append('\f')
              case '\\' => body.append('\\')
              case '\'' => body.append('\'')
              case other => body.append(other)
            }
            j += 2
          } else { body.append(d); j += 1 }
        }
        if (!closed) throw new IllegalArgumentException(
          s"unterminated string literal at offset $i")
        out.append(sparkStringLiteral(body.toString))
        i = j
      } else if (c == '"') {
        var j = i + 1
        val id = new StringBuilder
        var closed = false
        while (j < n && !closed) {
          val d = q.charAt(j)
          if (d == '"') {
            if (j + 1 < n && q.charAt(j + 1) == '"') { id.append('"'); j += 2 }
            else { closed = true; j += 1 }
          } else { id.append(d); j += 1 }
        }
        if (!closed) throw new IllegalArgumentException(
          s"unterminated quoted identifier at offset $i")
        out.append('`').append(id.toString.replace("`", "``")).append('`')
        i = j
      } else if (c == '$' && i + 1 < n && q.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < n && q.charAt(j).isDigit) j += 1
        val num = q.substring(i + 1, j)
        val bound = params.get(num).orElse(params.get(s"$$$num"))
          .getOrElse(throw new IllegalArgumentException(
            s"PG positional parameter $$$num is not bound — pass it " +
              "in the params map"))
        out.append('(').append(bound).append(')')
        i = j
      } else if (c == '$' && i + 1 < n &&
          (q.charAt(i + 1) == '$' || q.charAt(i + 1).isLetter)) {
        throw new IllegalArgumentException(
          "PG dollar-quoted strings ($$...$$) are not in the bound " +
            "subset — use '...' or E'...' literals")
      } else if (c == '-' && i + 1 < n && q.charAt(i + 1) == '-') {
        val eol = q.indexOf('\n', i)
        val end = if (eol < 0) n else eol
        out.append(q, i, end)
        i = end
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Emit a Spark single-quoted literal for an exact string VALUE
    * (backslashes and quotes re-escaped — Spark's lexer applies
    * backslash escapes that PG's raw literals do not). */
  private def sparkStringLiteral(value: String): String =
    "'" + value.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\u0000' => "\\0"
      case other => other.toString
    } + "'"

  private def firstKeyword(sql: String): String = {
    val masked = YqlScript.maskQuotes(sql)
    val m = "(?is)^\\s*(?:--[^\n]*\n|\\s|\\()*([A-Za-z_]+)".r
      .findFirstMatchIn(masked)
    m.map(_.group(1).toUpperCase).getOrElse("")
  }

  /** PG regex/like operators → Spark predicates. `~` binds like a
    * comparison; its operands are the adjacent primaries, which is
    * what the in-place token substitution preserves. `~*` needs the
    * RHS captured so the (?i) flag can prefix the pattern. */
  private def rewriteMatchOps(sql: String): String = {
    var s = sql
    // longest-first so !~~* is not eaten by !~
    s = replaceTopLevel(s, "!~~\\*", " NOT ILIKE ")
    s = replaceTopLevel(s, "!~~", " NOT LIKE ")
    s = replaceTopLevel(s, "~~\\*", " ILIKE ")
    s = replaceTopLevel(s, "~~", " LIKE ")
    // case-insensitive regex: capture the RHS primary to prefix (?i)
    s = rewriteCiRegex(s, "!~\\*", negate = true)
    s = rewriteCiRegex(s, "~\\*", negate = false)
    s = replaceTopLevel(s, "!~(?![*~])", " NOT RLIKE ")
    // infix ~ only (a prefix ~ is PG bitwise-not; out of subset and
    // left for Spark to reject): require an operand on the left
    val masked = YqlScript.maskQuotes(s)
    val b = new StringBuilder(s)
    var at = masked.length - 1
    while (at >= 0) {
      if (masked.charAt(at) == '~' &&
          (at == 0 || "~!*".indexOf(masked.charAt(at - 1)) < 0) &&
          (at + 1 >= masked.length || "~*".indexOf(masked.charAt(at + 1)) < 0)) {
        var k = at - 1
        while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
        val lhs = k >= 0 && (masked.charAt(k).isLetterOrDigit ||
          "_')`".indexOf(masked.charAt(k)) >= 0)
        if (lhs) b.replace(at, at + 1, " RLIKE ")
      }
      at -= 1
    }
    b.toString
  }

  private def replaceTopLevel(sql: String, opRe: String,
      replacement: String): String = {
    val masked = YqlScript.maskQuotes(sql)
    val re = opRe.r
    val b = new StringBuilder(sql)
    re.findAllMatchIn(masked).toSeq.reverseIterator.foreach { m =>
      b.replace(m.start, m.end, replacement)
    }
    b.toString
  }

  /** `a ~* 'pat'` → `a RLIKE concat('(?i)', ('pat'))`: the RHS primary
    * (literal / identifier / parenthesized expr / function call) is
    * captured by a forward scan. */
  private def rewriteCiRegex(sql: String, opRe: String,
      negate: Boolean): String = {
    val masked = YqlScript.maskQuotes(sql)
    val m = opRe.r.findFirstMatchIn(masked).getOrElse(return sql)
    var j = m.end
    while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
    val rhsEnd = endOfPrimary(sql, masked, j)
    val rhs = sql.substring(j, rhsEnd)
    val op = if (negate) " NOT RLIKE " else " RLIKE "
    val rebuilt = sql.substring(0, m.start) + op +
      s"concat('(?i)', ($rhs))" + sql.substring(rhsEnd)
    rewriteCiRegex(rebuilt, opRe, negate)
  }

  /** Forward scan over one primary expression starting at `at`:
    * identifier/number (with dots), quoted literal, or a name
    * followed by a parenthesized argument list. */
  private def endOfPrimary(sql: String, masked: String, at: Int): Int = {
    var j = at
    val n = sql.length
    if (j < n && (masked.charAt(j) == '\'' || masked.charAt(j) == '`')) {
      val q = masked.charAt(j)
      j += 1
      while (j < n && masked.charAt(j) != q) j += 1
      return j + 1
    }
    while (j < n && (sql.charAt(j).isLetterOrDigit ||
        sql.charAt(j) == '_' || sql.charAt(j) == '.')) j += 1
    if (j < n && sql.charAt(j) == '(') j = YqlScript.matchParen(sql, j) + 1
    math.max(j, at + 1)
  }

  /** `expr::type` → `CAST(expr AS sparktype)`, innermost-first (the
    * rewritten CAST(...) is itself a primary, so chained casts
    * resolve on the next pass). The operand is the immediately
    * preceding primary — `::` binds tighter than any operator. */
  private def rewriteCasts(sql: String): String = {
    val masked = YqlScript.maskQuotes(sql)
    val at = masked.indexOf("::")
    if (at < 0) return sql
    // backward scan over the operand primary
    var s = at - 1
    while (s >= 0 && sql.charAt(s).isWhitespace) s -= 1
    val opEnd = s + 1
    var start =
      if (s >= 0 && (masked.charAt(s) == ')' || masked.charAt(s) == ']')) {
        val close = masked.charAt(s)
        val open = if (close == ')') '(' else '['
        var depth = 0
        var k = s
        while (k >= 0) {
          val c = masked.charAt(k)
          if (c == close) depth += 1
          else if (c == open) { depth -= 1; if (depth == 0) { s = k; k = -1 } }
          if (k >= 0) k -= 1
        }
        // include a function/CAST name directly before the paren
        var k2 = s - 1
        while (k2 >= 0 && (sql.charAt(k2).isLetterOrDigit ||
          sql.charAt(k2) == '_' || sql.charAt(k2) == '.')) k2 -= 1
        k2 + 1
      } else if (s >= 0 && masked.charAt(s) == '\'') {
        var k = s - 1
        while (k >= 0 && masked.charAt(k) != '\'') k -= 1
        k
      } else if (s >= 0 && masked.charAt(s) == '`') {
        var k = s - 1
        while (k >= 0 && masked.charAt(k) != '`') k -= 1
        k
      } else {
        var k = s
        while (k >= 0 && (sql.charAt(k).isLetterOrDigit ||
          sql.charAt(k) == '_' || sql.charAt(k) == '.' ||
          sql.charAt(k) == '$')) k -= 1
        k + 1
      }
    if (start < 0) start = 0
    val operand = sql.substring(start, opEnd)
    if (operand.isEmpty) throw new IllegalArgumentException(
      s"PG cast '::' with no operand near offset $at")
    // forward scan over the type name: idents + spaces (double
    // precision / character varying) + optional (p[,s])
    var j = at + 2
    while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
    val tb = new StringBuilder
    var done = false
    while (j < sql.length && !done) {
      val c = sql.charAt(j)
      if (c.isLetterOrDigit || c == '_') { tb.append(c); j += 1 }
      else if (c == ' ' && j + 1 < sql.length &&
          sql.charAt(j + 1).isLetter &&
          isTwoWordTypePrefix(tb.toString)) { tb.append(' '); j += 1 }
      else done = true
    }
    var args = ""
    if (j < sql.length && sql.charAt(j) == '(') {
      val close = YqlScript.matchParen(sql, j)
      args = sql.substring(j, close + 1)
      j = close + 1
    }
    val sparkType = pgType(tb.toString.trim, args)
    rewriteCasts(sql.substring(0, start) +
      s"CAST($operand AS $sparkType)" + sql.substring(j))
  }

  private def isTwoWordTypePrefix(t: String): Boolean = {
    val l = t.toLowerCase
    l == "double" || l == "character" || l == "timestamp" ||
      l == "timestamp with" || l == "timestamp without" ||
      l == "time" || l == "time with" || l == "time without" ||
      l == "character varying" || l.endsWith(" time") ||
      l.endsWith(" with") || l.endsWith(" without")
  }

  /** PG type name → Spark type (pg_sql.cpp resolves through the PG
    * catalog OIDs; this is the scalar subset). */
  private def pgType(name: String, args: String): String =
    name.toLowerCase match {
      case "int2" | "smallint" => "SMALLINT"
      case "int4" | "int" | "integer" => "INT"
      case "int8" | "bigint" => "BIGINT"
      case "float4" | "real" => "FLOAT"
      case "float8" | "double precision" => "DOUBLE"
      case "numeric" | "decimal" =>
        if (args.nonEmpty) s"DECIMAL$args" else "DECIMAL(38, 18)"
      case "text" | "varchar" | "char" | "bpchar" | "name" |
          "character varying" | "character" => "STRING"
      case "bool" | "boolean" => "BOOLEAN"
      case "date" => "DATE"
      case "timestamp" | "timestamptz" | "timestamp with time zone" |
          "timestamp without time zone" => "TIMESTAMP"
      case "bytea" => "BINARY"
      case "json" | "jsonb" => "STRING"
      case "oid" => "BIGINT"
      case other => throw new IllegalArgumentException(
        s"PG type '$other' is not in the bound cast subset " +
          "(int2/4/8, float4/8, numeric, text/varchar, bool, date, " +
          "timestamp[tz], bytea, json)")
    }

  /** The handful of PG spellings whose Spark builtin differs. */
  private def rewriteFunctions(sql: String): String = {
    var s = sql
    // strpos(str, sub) → position(sub, str): argument order swaps
    val masked = YqlScript.maskQuotes(s)
    "(?i)(?<![A-Za-z0-9_])strpos\\s*\\(".r.findFirstMatchIn(masked)
      .foreach { m =>
        val close = YqlScript.matchParen(s, m.end - 1)
        val args = YqlScript.splitTopLevel(s.substring(m.end, close))
        require(args.length == 2, "strpos takes (string, substring)")
        s = rewriteFunctions(s.substring(0, m.start) +
          s"position(${args(1).trim}, ${args(0).trim})" +
          s.substring(close + 1))
      }
    s = replaceTopLevel(s, "(?i)(?<![A-Za-z0-9_])now\\s*\\(\\s*\\)",
      "current_timestamp()")
    s = rewriteExtractEpoch(s)
    s = rewriteGenerateSeries(s)
    s
  }

  /** `extract(epoch from x)` → seconds-since-epoch as DOUBLE (PG
    * returns a fractional numeric; `unix_micros` keeps sub-second
    * precision). Spark's own EXTRACT covers every other field, so
    * only the `epoch` keyword rewrites; the inner expression is cast
    * to timestamp first (PG accepts date/timestamp alike). */
  private def rewriteExtractEpoch(sql: String): String = {
    var s = sql
    var m = "(?i)(?<![A-Za-z0-9_])extract\\s*\\(\\s*epoch\\s+from\\s".r
      .findFirstMatchIn(YqlScript.maskQuotes(s))
    while (m.isDefined) {
      val open = s.indexOf('(', m.get.start)
      val close = YqlScript.matchParen(s, open)
      val inner = s.substring(m.get.end - 1, close).trim
      s = s.substring(0, m.get.start) +
        s"(CAST(unix_micros(CAST(($inner) AS TIMESTAMP)) AS DOUBLE) / 1000000.0)" +
        s.substring(close + 1)
      m = "(?i)(?<![A-Za-z0-9_])extract\\s*\\(\\s*epoch\\s+from\\s".r
        .findFirstMatchIn(YqlScript.maskQuotes(s))
    }
    s
  }

  /** `FROM generate_series(a, b [, step])` — PG's ubiquitous rowset
    * generator — becomes a Spark lateral-free subquery
    * `(SELECT explode(sequence(a, b [, step])) AS generate_series)`;
    * a following `AS g(i)` column-alias list is Spark-native and
    * passes through. Outside table position (select-list SRFs) the
    * construct raises with a named reason, like the other
    * out-of-subset PG forms. */
  private def rewriteGenerateSeries(sql: String): String = {
    var s = sql
    var found = true
    while (found) {
      val masked = YqlScript.maskQuotes(s)
      "(?i)(?<![A-Za-z0-9_])generate_series\\s*\\(".r
        .findFirstMatchIn(masked) match {
        case None => found = false
        case Some(m) =>
          // table position = preceded (ignoring whitespace) by FROM,
          // JOIN or a comma inside a FROM list; anything else is a
          // select-list set-returning call — out of subset
          val before = masked.substring(0, m.start)
          val afterKw = "(?is).*(\\bfrom|\\bjoin)\\s*$".r
            .pattern.matcher(before).matches()
          // a comma counts as table position only when the current
          // CLAUSE is a FROM list (last FROM after last SELECT at the
          // call's own paren depth — nested subqueries, including
          // already-rewritten generate_series calls, are blanked out)
          val ctx = clauseContext(before).toLowerCase
          val afterComma = "(?s).*,\\s*$".r.pattern.matcher(ctx).matches() &&
            ctx.lastIndexOf("from") > ctx.lastIndexOf("select")
          val tablePos = afterKw || afterComma
          if (!tablePos) throw new IllegalArgumentException(
            "generate_series outside FROM position is a set-returning " +
              "function in the select list — not in the bound PG " +
              "subset; move it to the FROM clause")
          val open = s.indexOf('(', m.start)
          val close = YqlScript.matchParen(s, open)
          val args = YqlScript.splitTopLevel(s.substring(open + 1, close))
          require(args.length == 2 || args.length == 3,
            "generate_series takes (start, stop [, step])")
          s = s.substring(0, m.start) +
            s"(SELECT explode(sequence(${args.map(_.trim).mkString(", ")})) " +
            "AS generate_series)" + s.substring(close + 1)
      }
    }
    s
  }

  /** The text of the CURRENT clause: characters at the same paren
    * depth as the end of `before`, from where that depth was last
    * entered; everything nested deeper (subqueries) or shallower
    * (enclosing query) blanks to spaces. */
  private def clauseContext(before: String): String = {
    val n = before.length
    val atDepth = new Array[Int](n)
    var depth = 0
    var i = 0
    while (i < n) {
      val ch = before.charAt(i)
      if (ch == '(') { atDepth(i) = depth; depth += 1 }
      else if (ch == ')') { depth -= 1; atDepth(i) = depth }
      else atDepth(i) = depth
      i += 1
    }
    var start = 0
    i = 0
    while (i < n) { if (atDepth(i) < depth) start = i + 1; i += 1 }
    val sb = new StringBuilder
    i = start
    while (i < n) {
      val ch = before.charAt(i)
      sb.append(
        if (atDepth(i) == depth && ch != '(' && ch != ')') ch else ' ')
      i += 1
    }
    sb.toString
  }
}
