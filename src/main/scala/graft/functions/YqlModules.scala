package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The YQL common UDF module library (SURVEY.md §2.D,
  * yql/essentials/udfs/common/) — the namespaced function surface
  * (`Digest::`, `Url::`, `String::`, `Math::`, `Unicode::`, `Ip::`)
  * as plain Scala objects over Spark builtins; everything stays in
  * codegen. Only the modules with Spark-native equivalents are bound;
  * hyperscan/pire regex engines map to Spark's `rlike` (Java regex —
  * dialect differences documented at the call sites that care).
  */
object YqlModules {

  object Digest {
    def md5(c: Column): Column = org.apache.spark.sql.functions.md5(c)
    def sha256(c: Column): Column = sha2(c, 256)
    def crc32(c: Column): Column = org.apache.spark.sql.functions.crc32(c)
    def xxh(c: Column): Column = xxhash64(c)
    def murmurHash(c: Column): Column = hash(c).cast("long")
    // ——— round-8 breadth (docs udf/list/digest.md) ———
    def sha1(c: Column): Column = org.apache.spark.sql.functions.sha1(c)
  }

  object Url {
    def getHost(c: Column): Column = parse_url(c, lit("HOST"))
    def getPath(c: Column): Column = parse_url(c, lit("PATH"))
    def getCgiParam(c: Column, name: String): Column =
      parse_url(c, lit("QUERY"), lit(name))
    def getScheme(c: Column): Column = parse_url(c, lit("PROTOCOL"))
    def decode(c: Column): Column = url_decode(c)
    def encode(c: Column): Column = url_encode(c)
    // ——— round-8 breadth (docs udf/list/url.md) ———
    /** Last host label (Url::GetTLD). */
    def getTld(c: Column): Column =
      element_at(split(getHost(c), "\\."), -1)
    /** Last `level` host labels joined (Url::GetDomain). */
    def getDomain(c: Column, level: Int): Column = {
      val labels = split(getHost(c), "\\.")
      when(size(labels) >= level,
        array_join(slice(labels, -level, level), "."))
        .otherwise(getHost(c))
    }
    def getDomainLevel(c: Column): Column =
      size(split(getHost(c), "\\.")).cast("long")
    /** Strip a leading `www.` from a HOST string (Url::CutWWW). */
    def cutWww(c: Column): Column = regexp_replace(c, "^www\\.", "")
    /** Strip the scheme prefix (Url::CutScheme). */
    def cutScheme(c: Column): Column =
      regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    def getFragment(c: Column): Column = parse_url(c, lit("REF"))
    def getHostPort(c: Column): Column = parse_url(c, lit("AUTHORITY"))
    /** Port number; NULL when the URL spells none (Url::GetPort). */
    def getPort(c: Column): Column = {
      val p = regexp_extract(getHostPort(c), ":(\\d+)$", 1)
      when(p =!= "", p.cast("long"))
    }
    def getSchemeHost(c: Column): Column =
      concat(getScheme(c), lit("://"), getHost(c))
    def getSchemeHostPort(c: Column): Column =
      concat(getScheme(c), lit("://"), getHostPort(c))
    /** Everything after the authority (Url::GetTail). */
    def getTail(c: Column): Column =
      regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    /** `a=1&b=2` → map (Url::QueryStringToDict; later keys win). */
    def queryStringToDict(c: Column): Column = str_to_map(c, lit("&"), lit("="))
    def queryStringToList(c: Column): Column = split(c, "&")
  }

  object Str {
    def toUpper(c: Column): Column = upper(c)
    def toLower(c: Column): Column = lower(c)
    def strip(c: Column): Column = trim(c)
    def splitToList(c: Column, sep: String): Column = split(c, java.util.regex.Pattern.quote(sep))
    def joinFromList(c: Column, sep: String): Column = array_join(c, sep)
    def replaceAll(c: Column, from: String, to: String): Column =
      regexp_replace(c, java.util.regex.Pattern.quote(from), java.util.regex.Matcher.quoteReplacement(to))
    def startsWith(c: Column, p: String): Column = c.startsWith(p)
    def endsWith(c: Column, s: String): Column = c.endsWith(s)
    // ——— round-8 breadth (docs udf/list/string.md) ———
    def contains(c: Column, s: String): Column = c.contains(s)
    /** 0-based first index, -1 when absent (String::Find). */
    def find(c: Column, s: String): Column =
      (instr(c, s) - lit(1)).cast("long")
    /** 0-based LAST index, -1 when absent (String::ReverseFind). */
    def reverseFind(c: Column, s: String): Column =
      when(c.contains(s),
        length(c) - instr(org.apache.spark.sql.functions.reverse(c),
          org.apache.spark.sql.functions.reverse(lit(s))) - lit(s.length) +
          lit(1))
        .otherwise(lit(-1)).cast("long")
    /** 0-based Substring(s, pos[, len]). */
    def substring(c: Column, pos: Column, len: Column): Column =
      c.substr(pos + lit(1), len)
    def reverse(c: Column): Column = org.apache.spark.sql.functions.reverse(c)
    def levensteinDistance(a: Column, b: Column): Column =
      levenshtein(a, b).cast("long")
    def leftPad(c: Column, len: Column, pad: String): Column =
      lpad(c, len.cast("int"), lit(pad))
    def rightPad(c: Column, len: Column, pad: String): Column =
      rpad(c, len.cast("int"), lit(pad))
    /** Remove every occurrence of each char in `symbols`. */
    def removeAll(c: Column, symbols: String): Column =
      translate(c, symbols, "")
    /** Replace the FIRST occurrence of a literal substring. */
    def replaceFirst(c: Column, from: String, to: String): Column = {
      val at = instr(c, from)
      when(at > 0, concat(c.substr(lit(1), at - 1), lit(to),
        c.substr(at + lit(from.length), length(c)))).otherwise(c)
    }
    /** Replace the LAST occurrence of a literal substring. */
    def replaceLast(c: Column, from: String, to: String): Column = {
      val revAt = instr(org.apache.spark.sql.functions.reverse(c),
        org.apache.spark.sql.functions.reverse(lit(from)))
      val at = length(c) - revAt - lit(from.length) + lit(2) // 1-based
      when(revAt > 0, concat(c.substr(lit(1), at - 1), lit(to),
        c.substr(at + lit(from.length), length(c)))).otherwise(c)
    }
    /** Collapse consecutive whitespace to one space. */
    def collapse(c: Column): Column = regexp_replace(c, "\\s+", " ")
    def hexEncode(c: Column): Column = hex(c)
    def hexDecode(c: Column): Column = unhex(c).cast("string")
    def isAscii(c: Column): Column = c.rlike("^[\\x00-\\x7F]*$")
    def isAsciiAlpha(c: Column): Column = c.rlike("^[A-Za-z]+$")
    def isAsciiAlnum(c: Column): Column = c.rlike("^[A-Za-z0-9]+$")
    def isAsciiHex(c: Column): Column = c.rlike("^[0-9A-Fa-f]+$")
    def isAsciiLower(c: Column): Column = c.rlike("^[a-z]+$")
    def isAsciiUpper(c: Column): Column = c.rlike("^[A-Z]+$")
    def isAsciiSpace(c: Column): Column = c.rlike("^\\s+$")
  }

  object Math {
    def round(c: Column, digits: Int = 0): Column =
      org.apache.spark.sql.functions.round(c, digits)
    def pow(a: Column, b: Column): Column = org.apache.spark.sql.functions.pow(a, b)
    def sqrt(c: Column): Column = org.apache.spark.sql.functions.sqrt(c)
    def log(c: Column): Column = org.apache.spark.sql.functions.log(c)
    def abs(c: Column): Column = org.apache.spark.sql.functions.abs(c)
    def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))
    // ——— round-8 breadth (docs udf/list/math.md) ———
    def pi(): Column = lit(scala.math.Pi)
    def e(): Column = lit(scala.math.E)
    def eps(): Column = lit(java.lang.Math.ulp(1.0))
    def exp2(c: Column): Column =
      org.apache.spark.sql.functions.pow(lit(2.0), c)
    def log2(c: Column): Column = org.apache.spark.sql.functions.log2(c)
    def log10(c: Column): Column = org.apache.spark.sql.functions.log10(c)
    /** Truncate toward zero (C trunc). */
    def trunc(c: Column): Column = {
      val d = c.cast("double")
      signum(d) * floor(org.apache.spark.sql.functions.abs(d))
    }
    /** Round half to even, as a double (C rint — decimal literals
      * cast first so the result type is double like the reference). */
    def rint(c: Column): Column = bround(c.cast("double"), 0)
    /** C fmod — the % of two doubles keeps the dividend's sign. */
    def fmod(a: Column, b: Column): Column = a % b
    def hypot(a: Column, b: Column): Column =
      org.apache.spark.sql.functions.hypot(a, b)
    def ldexp(x: Column, ex: Column): Column =
      x * org.apache.spark.sql.functions.pow(lit(2.0), ex)
    def cbrt(c: Column): Column = org.apache.spark.sql.functions.cbrt(c)
    def isNaN(c: Column): Column = c.isNaN
    def isInf(c: Column): Column =
      c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)
    def isFinite(c: Column): Column = !c.isNaN && !isInf(c)
    /** |a-b| <= eps (Math::FuzzyEquals; reference default 1e-13). */
    def fuzzyEquals(a: Column, b: Column, eps: Column): Column =
      org.apache.spark.sql.functions.abs(a - b) <= eps
    /** Integer mod/rem with NULL on zero divisor (the Optional
      * contract, lib/round.h:16-33): Mod keeps the DIVISOR's sign,
      * Rem the dividend's (plain C %). */
    def mod(a: Column, b: Column): Column = {
      val d = nullif(b, lit(0))
      val r = a % d
      when((r < 0 && d > 0) || (r > 0 && d < 0), r + d).otherwise(r)
    }
    def rem(a: Column, b: Column): Column = a % nullif(b, lit(0))
  }

  object Unicode {
    def getLength(c: Column): Column = length(c).cast("long")
    def substring(c: Column, from: Column, len: Column): Column = c.substr(from, len)
    def reverse(c: Column): Column = org.apache.spark.sql.functions.reverse(c)
    def normalize(c: Column): Column = c // NFC normalization: Spark strings are UTF-8 pass-through
    // ——— round-8 breadth (docs udf/list/unicode.md) ———
    def toLower(c: Column): Column = lower(c)
    def toUpper(c: Column): Column = upper(c)
    def toTitle(c: Column): Column = initcap(c)
    def strip(c: Column): Column = trim(c)
    /** 0-based first index, -1 when absent (Unicode::Find). */
    def find(c: Column, s: String): Column =
      (instr(c, s) - lit(1)).cast("long")
    def isAlpha(c: Column): Column = c.rlike("^\\p{L}+$")
    def isDigit(c: Column): Column = c.rlike("^\\p{Nd}+$")
    def isAlnum(c: Column): Column = c.rlike("^[\\p{L}\\p{Nd}]+$")
    def isSpace(c: Column): Column = c.rlike("^\\s+$")
    def isLower(c: Column): Column = c.rlike("^\\p{Ll}+$")
    def isUpper(c: Column): Column = c.rlike("^\\p{Lu}+$")
  }

  /** List builtins (yt/docs/en/yql/builtins/list.md) — YQL's lambda
    * surface over list columns maps onto Spark's higher-order
    * functions, which stay inside codegen (no UDF boundary). */
  object Lists {
    def create(): Column = array()
    def asList(cols: Column*): Column = array(cols: _*)
    def length(c: Column): Column = size(c).cast("long")
    def hasItems(c: Column): Column = size(c) > 0
    def listMap(c: Column)(f: Column => Column): Column = transform(c, f)
    def listMapIndexed(c: Column)(f: (Column, Column) => Column): Column =
      transform(c, f)
    def listFilter(c: Column)(f: Column => Column): Column =
      org.apache.spark.sql.functions.filter(c, f)
    def flatMap(c: Column)(f: Column => Column): Column =
      org.apache.spark.sql.functions.flatten(transform(c, f))
    def flatten(c: Column): Column = org.apache.spark.sql.functions.flatten(c)
    def fold(c: Column, zero: Column)(f: (Column, Column) => Column): Column =
      aggregate(c, zero, f)
    def sort(c: Column): Column = array_sort(c)
    def uniq(c: Column): Column = array_distinct(c)
    def reverse(c: Column): Column = org.apache.spark.sql.functions.reverse(c)
    def extend(a: Column, b: Column): Column = concat(a, b)
    def zip(a: Column, b: Column): Column = arrays_zip(a, b)
    def zipWith(a: Column, b: Column)(f: (Column, Column) => Column): Column =
      zip_with(a, b, f)
    /** ListEnumerate: (0-based index, item) pairs, here as "i:item". */
    def enumerate(c: Column): Column =
      zip_with(sequence(lit(0), size(c) - 1), c,
        (i, x) => concat(i.cast("string"), lit(":"), x.cast("string")))
    def take(c: Column, n: Int): Column = slice(c, 1, n)
    def skip(c: Column, n: Column): Column =
      slice(c, n + 1, greatest(size(c) - n, lit(0)))
    /** ListIndexOf: 0-based position or null (array_position is 1-based,
      * 0 = absent). */
    def indexOf(c: Column, v: Column): Column =
      nullif(array_position(c, v), lit(0L)) - 1
    def has(c: Column, v: Column): Column = array_contains(c, v)
    def head(c: Column): Column = element_at(c, 1)
    def last(c: Column): Column = element_at(c, -1)
    def min(c: Column): Column = array_min(c)
    def max(c: Column): Column = array_max(c)
    def sum(c: Column): Column =
      aggregate(c, lit(0L), (acc, x) => acc + x.cast("long"))
    def avg(c: Column): Column =
      aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double")) / size(c)
    def any(c: Column)(f: Column => Column): Column = exists(c, f)
    def all(c: Column)(f: Column => Column): Column = forall(c, f)
    def notNull(c: Column): Column =
      org.apache.spark.sql.functions.filter(c, _.isNotNull)
    def fromRange(a: Column, b: Column): Column = sequence(a, b)
    def replicate(v: Column, n: Column): Column = array_repeat(v, n.cast("int"))
    def concatStr(c: Column, sep: String): Column = array_join(c, sep)
    /** ListTakeWhile: prefix before the first element failing `f`. */
    def takeWhile(c: Column)(f: Column => Column): Column = {
      val firstBad = array_position(transform(c, x => !f(x)), lit(true))
      when(firstBad === 0, c)
        .otherwise(slice(c, lit(1), (firstBad - 1).cast("int")))
    }
    /** ListSkipWhile: suffix from the first element failing `f`. */
    def skipWhile(c: Column)(f: Column => Column): Column = {
      val firstBad = array_position(transform(c, x => !f(x)), lit(true))
      when(firstBad === 0, slice(c, 1, 0))
        .otherwise(slice(c, firstBad.cast("int"), size(c)))
    }
  }

  /** Dict builtins (yt/docs/en/yql/builtins/dict.md) over MapType. */
  object Dict {
    def create(keys: Column, values: Column): Column = map_from_arrays(keys, values)
    def fromEntries(cols: Column*): Column = map(cols: _*)
    def length(c: Column): Column = size(c).cast("long")
    def hasItems(c: Column): Column = size(c) > 0
    def keys(c: Column): Column = map_keys(c)
    def payloads(c: Column): Column = map_values(c)
    def items(c: Column): Column = map_entries(c)
    def lookup(c: Column, k: Column): Column = element_at(c, k)
    def contains(c: Column, k: Column): Column = map_contains_key(c, k)
  }

  /** Set operations (dict.md SetIntersection/SetUnion/SetDifference/
    * SetSymmetricDifference/SetIncludes/SetIsDisjoint) — YQL sets are
    * dicts-as-sets; here: distinct arrays, canonically sorted so the
    * results are deterministic. */
  object SetOps {
    def intersection(a: Column, b: Column): Column = array_sort(array_intersect(a, b))
    def union(a: Column, b: Column): Column = array_sort(array_union(a, b))
    def difference(a: Column, b: Column): Column = array_sort(array_except(a, b))
    def symmetricDifference(a: Column, b: Column): Column =
      array_sort(array_union(array_except(a, b), array_except(b, a)))
    /** SetIncludes(a, b): every element of b is in a. */
    def includes(a: Column, b: Column): Column = size(array_except(b, a)) === 0
    def isDisjoint(a: Column, b: Column): Column = !arrays_overlap(a, b)
  }

  /** DateTime module (yt/docs/en/yql/udf/list/datetime.md: Split, Make,
    * the Get-component family, Update, From, To, StartOf, Shift,
    * Format, Parse). */
  object DateTime {
    def makeDate(y: Column, m: Column, d: Column): Column = make_date(y, m, d)
    def fromSeconds(c: Column): Column = timestamp_seconds(c)
    def toSeconds(c: Column): Column = unix_timestamp(c)
    def getYear(c: Column): Column = year(c).cast("long")
    def getMonth(c: Column): Column = month(c).cast("long")
    def getDayOfMonth(c: Column): Column = dayofmonth(c).cast("long")
    /** ISO day-of-week, Monday=1..Sunday=7 (Spark's dayofweek is
      * Sunday=1 — rebased). */
    def getDayOfWeek(c: Column): Column =
      (((dayofweek(c) + 5) % 7) + 1).cast("long")
    def getHour(c: Column): Column = hour(c).cast("long")
    def getMinute(c: Column): Column = minute(c).cast("long")
    def startOfYear(c: Column): Column = date_trunc("year", c)
    def startOfQuarter(c: Column): Column = date_trunc("quarter", c)
    def startOfMonth(c: Column): Column = date_trunc("month", c)
    def startOfWeek(c: Column): Column = date_trunc("week", c)
    def startOfDay(c: Column): Column = date_trunc("day", c)
    def shiftYears(c: Column, n: Int): Column = add_months(c, 12 * n)
    def shiftMonths(c: Column, n: Int): Column = add_months(c, n)
    def shiftDays(c: Column, n: Int): Column = date_add(c, n)
    def format(c: Column, fmt: String): Column = date_format(c, fmt)
    def parse(c: Column, fmt: String): Column = to_timestamp(c, fmt)
    def intervalDays(a: Column, b: Column): Column = datediff(a, b).cast("long")
    // ——— round-8 breadth (docs udf/list/datetime.md) ———
    def getSecond(c: Column): Column = second(c).cast("long")
    def getDayOfYear(c: Column): Column = dayofyear(c).cast("long")
    /** ISO 8601 week number (the reference's GetWeekOfYearIso;
      * Spark's weekofyear IS ISO). */
    def getWeekOfYearIso(c: Column): Column = weekofyear(c).cast("long")
    def getMonthName(c: Column): Column = date_format(c, "MMMM")
    def getDayOfWeekName(c: Column): Column = date_format(c, "EEEE")
    /** Session timezone is pinned UTC (GraftSession). */
    def getTimezoneName(c: Column): Column = lit("UTC")
    def fromMilliseconds(c: Column): Column = timestamp_millis(c)
    def fromMicroseconds(c: Column): Column = timestamp_micros(c)
    def toMilliseconds(c: Column): Column = unix_millis(c.cast("timestamp"))
    def toMicroseconds(c: Column): Column = unix_micros(c.cast("timestamp"))
    def toDays(c: Column): Column = (unix_timestamp(c) / 86400L).cast("long")
    def toHours(c: Column): Column = (unix_timestamp(c) / 3600L).cast("long")
    def toMinutes(c: Column): Column = (unix_timestamp(c) / 60L).cast("long")
    def makeDatetime(y: Column, mo: Column, d: Column, h: Column,
        mi: Column, se: Column): Column =
      make_timestamp(y, mo, d, h, mi, se)
    def shiftQuarters(c: Column, n: Int): Column = add_months(c, 3 * n)
    def endOfMonth(c: Column): Column = last_day(c)
    def intervalFromDays(c: Column): Column =
      make_dt_interval(c, lit(0), lit(0), lit(0))
    def intervalFromHours(c: Column): Column =
      make_dt_interval(lit(0), c, lit(0), lit(0))
    def intervalFromMinutes(c: Column): Column =
      make_dt_interval(lit(0), lit(0), c, lit(0))
    def intervalFromSeconds(c: Column): Column =
      make_dt_interval(lit(0), lit(0), lit(0), c)
  }

  /** Json2 module + SQL-standard JSON_VALUE/JSON_EXISTS/JSON_QUERY
    * (yt/docs/en/yql/builtins/json.md) over JSON-carrying string
    * columns (our canonical `Any` encoding). */
  object Json {
    // get_json_object semantics via the byte-walker fast path (the
    // real evaluator arbitrates punts) — Spark's expression builds a
    // Jackson parser per row
    private def gj(c: Column, path: String): Column =
      graft.sources.Yson.getJsonFast(c, lit(path))
    def value(c: Column, path: String): Column = gj(c, path)
    def exists(c: Column, path: String): Column = gj(c, path).isNotNull
    def query(c: Column, path: String): Column = gj(c, path)
    def valueInt(c: Column, path: String): Column =
      gj(c, path).cast("long")
    def valueDouble(c: Column, path: String): Column =
      gj(c, path).cast("double")
  }

  /** Pire / Hyperscan regex modules (udfs/common/pire/pire_udf.cpp:72-75,
    * 189, 243; hyperscan/hyperscan_udf.cpp:81-104, 260, 326). Both expose
    * the same surface — Match (whole string), Grep (substring search),
    * MultiMatch/MultiGrep (newline-joined alternatives, one verdict per
    * pattern), Capture (first group, null when unmatched), Replace
    * (global) — differing only in the backing automaton, which on Spark
    * is always the codegen'd native regexp engine. `Hyperscan` aliases
    * `Pire` (incl. the Backtracking* fallback names, which in the
    * reference only select an engine). */
  object Pire {
    /** Whole-string match (Pire::Match). */
    def matches(c: Column, pattern: String): Column =
      regexp_like(c, lit("^(?:" + pattern + ")$"))
    /** Substring search (Pire::Grep). */
    def grep(c: Column, pattern: String): Column = regexp_like(c, lit(pattern))
    /** One bool per newline-separated alternative (Pire::MultiGrep). */
    def multiGrep(c: Column, patterns: Seq[String]): Column =
      array(patterns.map(p => regexp_like(c, lit(p))): _*)
    def multiMatch(c: Column, patterns: Seq[String]): Column =
      array(patterns.map(p => matches(c, p)): _*)
    /** First capture group of the first match; null when the pattern
      * does not occur (the reference returns an empty Optional — Spark's
      * regexp_extract would return "" and conflate no-match with an
      * empty group). */
    def capture(c: Column, pattern: String): Column =
      when(regexp_like(c, lit(pattern)), regexp_extract(c, pattern, 1))
    /** Replace every occurrence (Pire::Replace is global). */
    def replace(c: Column, pattern: String, repl: String): Column =
      regexp_replace(c, pattern, repl)
  }
  /** Hyperscan:: — its own semantics, NOT a Pire alias (round-11
    * differential audit vs hyperscan_udf.cpp):
    *
    * - **Match anchors TEXTUALLY**: the reference builds `^regex$` by
    *   string concatenation WITHOUT grouping (hyperscan_udf.cpp:135
    *   `'^' << regex << '$'`), so `Hyperscan::Match('a|b')` compiles
    *   `^a|b$` — which SCANS for either `^a` or `b$` — and matches
    *   'aX', where Re2::Match / Pire::Match (true full-match) do not.
    *   Reproduced exactly: an unanchored search of `^regex$`.
    * - **Capture returns the WHOLE matched substring** (the first
    *   Scan callback with SOM_LEFTMOST, :260-290), not a capture
    *   group. Adjudicated divergence inside that contract: hyperscan
    *   reports the EARLIEST-ENDING match (event-per-end scan), Java
    *   regex the leftmost-GREEDY one — `Capture('a+')('xaaay')` is
    *   "a" in the reference, "aaa" here. Earliest-end is not
    *   expressible on java.util.regex without an O(n²) end-position
    *   scan; the leftmost-start anchor is shared, only the extent on
    *   variable-length patterns differs (HyperscanDiffSpec pins both
    *   facts).
    * - **Replace is LITERAL** (:344-360 splices the replacement text
    *   verbatim — no $1/\1 group expansion): `$` and `\` are escaped
    *   before the native regexp_replace. Adjudicated divergence: the
    *   reference fires its callback per match EVENT (per end
    *   position), which on overlapping events (`a+` over runs) yields
    *   progressive splices; here each leftmost-greedy match replaces
    *   once — the common non-overlapping case is identical.
    * - Backtracking* select an ENGINE in the reference (PCRE confirm
    *   over a prefilter, :139-151); the JVM engine already
    *   backtracks, so they share Match/Grep semantics — including
    *   backreferences and lookaround, which plain Hyperscan::Match
    *   would reject at compile in the reference (compile errors
    *   surface lazily per-row on the JVM: the cost of an
    *   expression-level binding).
    * - The `(?i)` PREFIX contract (:26-31: strip + CASELESS, ASCII
    *   folding — no HS_FLAG_UCP) matches Java's default ASCII-only
    *   inline `(?i)`.
    */
  object Hyperscan {
    /** Textually anchored match — `^pattern$` UNGROUPED, searched. */
    def matches(c: Column, pattern: String): Column =
      regexp_like(c, lit("^" + pattern + "$"))
    def grep(c: Column, pattern: String): Column =
      regexp_like(c, lit(pattern))
    def multiGrep(c: Column, patterns: Seq[String]): Column =
      array(patterns.map(p => regexp_like(c, lit(p))): _*)
    def multiMatch(c: Column, patterns: Seq[String]): Column =
      array(patterns.map(p => matches(c, p)): _*)
    /** Whole matched substring of the first (leftmost) match; null
      * when unmatched (the reference's empty Optional). */
    def capture(c: Column, pattern: String): Column =
      when(regexp_like(c, lit(pattern)), regexp_extract(c, pattern, 0))
    /** Global replace with a LITERAL replacement. */
    def replace(c: Column, pattern: String, repl: String): Column =
      regexp_replace(c, pattern,
        repl.replace("\\", "\\\\").replace("$", "\\$"))
  }

  /** Re2:: module (udfs/common/re2/re2_udf.cpp; docs udf/list/re2.md).
    * The reference's signatures are CURRIED — `Re2::Grep(pattern)`
    * returns a callable — which the script surface supports through
    * lambda bindings and inline application fusion (YqlScript /
    * YqlSql.rewrite); these are the fused implementations over the
    * codegen'd native regex engine. `Re2::Options` (round 10) folds at
    * parse time: CaseSensitive/DotNl/Literal transform the pattern,
    * Utf8/LogErrors/MaxMem are accepted with no JVM-engine effect, and
    * the automaton-level fields raise when set (YqlSql.re2OptionsSugar). */
  object Re2 {
    /** Partial match (Re2::Grep). */
    def grep(c: Column, pattern: String): Column =
      regexp_like(c, lit(pattern))
    /** Whole-string match (Re2::Match — RE2::FullMatch). */
    def matches(c: Column, pattern: String): Column =
      regexp_like(c, lit("^(?:" + pattern + ")$"))
    /** Count of non-overlapping matches (Re2::Count, Uint32). */
    def count(c: Column, pattern: String): Column =
      size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")
    /** Successive captures (Re2::FindAndConsume): group 1 per match
      * when the pattern captures, else the full match. */
    def findAndConsume(c: Column, pattern: String): Column = {
      val idx = if (countGroups(pattern)._1 > 0) 1 else 0
      regexp_extract_all(c, lit(pattern), lit(idx))
    }
    /** Global replace (RE2::GlobalReplace) — re2 `\\1` group refs
      * translate to the native engine's `$1`. */
    def replace(c: Column, pattern: String, rewrite: String): Column = {
      val translated = rewrite
        .replace("$", "\\$")
        .replaceAll("\\\\(\\d)", "\\$$1")
      regexp_replace(c, pattern, translated)
    }
    /** First-match capture struct (Re2::Capture): one member per
      * capturing group — named groups keep their names, unnamed get
      * `_0, _1, ...` in order INCLUDING the full match as group 0
      * (re2_udf.cpp:465-485). NULL members when the pattern does not
      * match. */
    def capture(c: Column, pattern: String): Column = {
      val (_, names) = countGroups(pattern)
      val p = pattern.replace("(?P<", "(?<") // re2 → java named spelling
      val fields = names.zipWithIndex.flatMap { case (nm, g) =>
        Seq(lit(nm), when(regexp_like(c, lit(p)), regexp_extract(c, p, g)))
      }
      named_struct(fields: _*)
    }
    /** (capturing-group count, member names for groups 0..n) by a
      * quote-aware scan of the pattern text: `(` opens a capturing
      * group unless followed by `?` (except the named forms
      * `(?P<name>` / `(?<name>`). */
    private[functions] def countGroups(pattern: String): (Int, Seq[String]) = {
      val names = scala.collection.mutable.ArrayBuffer[String]("_0")
      var unnamed = 1
      var i = 0
      var inClass = false
      while (i < pattern.length) {
        pattern.charAt(i) match {
          case '\\' => i += 1
          case '[' => inClass = true
          case ']' => inClass = false
          case '(' if !inClass =>
            val rest = pattern.substring(i + 1)
            if (rest.startsWith("?P<") || (rest.startsWith("?<") &&
                !rest.startsWith("?<=") && !rest.startsWith("?<!"))) {
              val from = i + (if (rest.startsWith("?P<")) 4 else 3)
              val end = pattern.indexOf('>', from)
              require(end > from, s"malformed named group in: $pattern")
              names += pattern.substring(from, end)
            } else if (!rest.startsWith("?")) {
              names += s"_$unnamed"; unnamed += 1
            }
          case _ =>
        }
        i += 1
      }
      (names.length - 1, names.toSeq)
    }
  }

  /** Stat:: module (udfs/common/stat/static/stat_udf.h): the TDigest
    * mergeable quantile sketch. Create+AddValue = the aggregate form;
    * Serialize/Deserialize/Merge = the binary sketch column round trip;
    * GetPercentile reads any quantile from stored bytes. */
  object Stat {
    def tdigest(value: Column, delta: Double = TDigestSketch.DefaultDelta,
        k: Double = TDigestSketch.DefaultK): Column =
      TDigestSketch.agg(value, delta, k)
    def tdigestMerge(sketch: Column): Column = TDigestSketch.mergeAgg(sketch)
    def getPercentile(sketch: Column, p: Double): Column =
      TDigestSketch.percentileOf(sketch, lit(p))
    def getRank(sketch: Column, v: Column): Column =
      TDigestSketch.rankOf(sketch, v)
  }

  object Ip {
    /** Dotted-quad IPv4 → uint32 (Ip::FromString for v4). */
    def fromString(c: Column): Column = {
      val parts = split(c, "\\.")
      element_at(parts, 1).cast("long") * 16777216L +
        element_at(parts, 2).cast("long") * 65536L +
        element_at(parts, 3).cast("long") * 256L +
        element_at(parts, 4).cast("long")
    }
    def toString(c: Column): Column =
      concat_ws(".",
        (c / 16777216L).cast("long") % 256L,
        (c / 65536L).cast("long") % 256L,
        (c / 256L).cast("long") % 256L,
        c.cast("long") % 256L)
    def isPrivate(c: Column): Column = {
      val v = fromString(c)
      (v >= 167772160L && v <= 184549375L) ||   // 10/8
        (v >= 2886729728L && v <= 2887778303L) || // 172.16/12
        (v >= 3232235520L && v <= 3232301055L)    // 192.168/16
    }
    // ——— round-8 breadth (docs udf/list/ip.md) ———
    def isIPv4(c: Column): Column =
      c.rlike("^(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)" +
        "(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}$")
    def isIPv6(c: Column): Column =
      c.rlike("^[0-9A-Fa-f:]+(:[0-9.]+)?$") && c.contains(":")
    /** First `bits` of a dotted-quad kept, rest zeroed
      * (Ip::GetSubnet; reference default /24). */
    def getSubnet(c: Column, bits: Int = 24): Column = {
      val mask = if (bits >= 32) -1L >>> 32 else ~((1L << (32 - bits)) - 1) & 0xFFFFFFFFL
      toString(org.apache.spark.sql.functions
        .lit(mask).bitwiseAND(fromString(c)))
    }
    /** v4 → IPv4-mapped IPv6 text (Ip::ConvertToIPv6 observable form). */
    def convertToIPv6(c: Column): Column = concat(lit("::ffff:"), c)
    /** Ip::IsEmbeddedIPv4 — an IPv6 address carrying an IPv4
      * (IPv4-mapped ::ffff:a.b.c.d or IPv4-compatible ::a.b.c.d). */
    def isEmbeddedIPv4(c: Column): Column =
      lower(c).rlike("^::(ffff:)?(\\d{1,3}\\.){3}\\d{1,3}$")
  }
}
