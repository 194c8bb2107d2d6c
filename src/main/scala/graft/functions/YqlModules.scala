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
  }

  object Url {
    def getHost(c: Column): Column = parse_url(c, lit("HOST"))
    def getPath(c: Column): Column = parse_url(c, lit("PATH"))
    def getCgiParam(c: Column, name: String): Column =
      parse_url(c, lit("QUERY"), lit(name))
    def getScheme(c: Column): Column = parse_url(c, lit("PROTOCOL"))
    def decode(c: Column): Column = url_decode(c)
    def encode(c: Column): Column = url_encode(c)
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
  }

  object Math {
    def round(c: Column, digits: Int = 0): Column =
      org.apache.spark.sql.functions.round(c, digits)
    def pow(a: Column, b: Column): Column = org.apache.spark.sql.functions.pow(a, b)
    def sqrt(c: Column): Column = org.apache.spark.sql.functions.sqrt(c)
    def log(c: Column): Column = org.apache.spark.sql.functions.log(c)
    def abs(c: Column): Column = org.apache.spark.sql.functions.abs(c)
    def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))
  }

  object Unicode {
    def getLength(c: Column): Column = length(c).cast("long")
    def substring(c: Column, from: Column, len: Column): Column = c.substr(from, len)
    def reverse(c: Column): Column = org.apache.spark.sql.functions.reverse(c)
    def normalize(c: Column): Column = c // NFC normalization: Spark strings are UTF-8 pass-through
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
  }
}
