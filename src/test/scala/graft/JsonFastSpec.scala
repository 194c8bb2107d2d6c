package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential sweep of the streaming JSON accessor fast path
  * (Yson.JsonWalker) against BOTH of its arbiters: the Jackson tree
  * navigators (jsonGetScalar / jsonGetRaw) and Spark's own
  * GetJsonObject evaluator. The walker is only allowed to answer when
  * its answer provably equals the arbiter's; this spec hammers the
  * punt boundary — escapes, duplicate keys, number canonicalization,
  * malformed input, whitespace, unicode, trailing bytes.
  */
class JsonFastSpec extends AnyFunSuite {
  private def u(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def spark(doc: String, path: String): String = {
    val ev = org.apache.spark.sql.catalyst.expressions.json
      .GetJsonObjectEvaluator(null)
    ev.setJson(u(doc)); ev.setPath(u(path))
    val r = ev.evaluate()
    if (r == null) null else r.toString
  }
  private def fastSpark(doc: String, path: String): String = {
    val r = graft.sources.Yson.getJsonObjectFast(u(doc), u(path))
    if (r == null) null else r.toString
  }
  private def tree(doc: String, path: String): String = {
    val r = graft.sources.Yson.jsonGetScalar(u(doc), u(path))
    if (r == null) null else r.toString
  }
  private def fastTree(doc: String, path: String): String = {
    val r = graft.sources.Yson.jsonGetScalarFast(u(doc), u(path))
    if (r == null) null else r.toString
  }
  private def treeRaw(doc: String, path: String): String = {
    val r = graft.sources.Yson.jsonGetRaw(u(doc), u(path))
    if (r == null) null else r.toString
  }
  private def fastTreeRaw(doc: String, path: String): String = {
    val r = graft.sources.Yson.jsonGetRawFast(u(doc), u(path))
    if (r == null) null else r.toString
  }

  private val edgeDocs = Seq(
    """{"a":1,"b":2}""",
    """{"a":1,"a":2}""",                          // duplicate keys
    """{"a":"x","a":[1,2]}""",                    // dup keys, mixed types
    """{"a":1e3,"b":1.50,"c":0.5,"d":-0,"e":-0.0}""",
    """{"a":12345678901234567890123}""",          // > long
    """{"a": {"b" : [1, 2,{"c":"x"}] } }""",      // whitespace composite
    """{"a":{"b":[1,2,{"c":"x"}]}}""",            // canonical composite
    """{"a":"x\nY","b":"A","c":"\/","d":"\b\f"}""",
    """{"a":7}""",                           // escaped key
    """{"a":null,"b":true,"c":false}""",
    """{"a":"héllo €ütf"}""",
    """[10,20,[30,{"k":"v"}]]""",
    """  {"a":1}  """,                            // padded
    """{"a":1} junk""",                           // trailing junk
    """{"a":1,"b":}""",                           // malformed
    """{"a":01}""",                               // leading zero
    """{"a":+1}""",
    """{"a":NaN}""",
    """{"a":"unterminated""",
    """not json at all""",
    """null""", """true""", """"plain"""", """42""", """4.25""",
    """{"a":[{"x":1},{"x":2},{"x":3}]}""",
    """{"deep":{"deep":{"deep":{"deep":[0,1,{"end":"yes"}]}}}}""",
    """{"a":1.0E-5,"b":1.0E23,"c":12345678.0,"d":2.0E-3}""",
    """{"a":""}""", """{"":"empty key"}""", """{}""", """[]""",
    """{"a":[]}""", """{"a":{}}""")

  private val paths = Seq("$", "$.a", "$.b", "$.c", "$.d", "$.e", "$.a[0]",
    "$.a[1]", "$.a[2]", "$[0]", "$[1]", "$[2]", "$[2][1]", "$[2][1].k",
    "$.a.b", "$.a.b[2]", "$.a.b[2].c", "$.a[1].x",
    "$.deep.deep.deep.deep[2].end", "$.missing", "$.a[9]")

  test("edge grid: fast spark path == GetJsonObjectEvaluator") {
    for (d <- edgeDocs; p <- paths) {
      assert(fastSpark(d, p) == spark(d, p), s"doc=<$d> path=$p")
    }
  }

  test("edge grid: fast tree scalar/raw == Jackson tree navigators") {
    for (d <- edgeDocs; p <- paths) {
      assert(fastTree(d, p) == tree(d, p), s"scalar doc=<$d> path=$p")
      assert(fastTreeRaw(d, p) == treeRaw(d, p), s"raw doc=<$d> path=$p")
    }
  }

  test("randomized differential sweep (3000 docs x 6 paths, all arbiters)") {
    val rnd = new scala.util.Random(20260818L)
    val keys = Array("a", "b", "key", "k2", "a") // dup-prone
    val strs = Array("", "x", "hé €", "with\"quote", "back\\slash",
      "line\nbreak", "tab\there", "ctl", "plain words")
    def value(depth: Int): String = rnd.nextInt(if (depth > 2) 7 else 10) match {
      case 0 => rnd.nextLong().toString
      case 1 => rnd.nextInt(100).toString
      case 2 => Seq("0.5", "1.5", "1e3", "-0", "2.25", "1.50", "3.14159",
        "123456789012345678901234567890")(rnd.nextInt(7))
      case 3 => "null"
      case 4 => "true"
      case 5 => "false"
      case 6 =>
        val s = strs(rnd.nextInt(strs.length))
        "\"" + s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
      case 7 => // array
        val n = rnd.nextInt(4)
        (0 until n).map(_ => value(depth + 1))
          .mkString("[", if (rnd.nextBoolean()) "," else " , ", "]")
      case _ => // object
        val n = rnd.nextInt(4)
        (0 until n).map(_ => "\"" + keys(rnd.nextInt(keys.length)) + "\":" +
          value(depth + 1))
          .mkString("{", if (rnd.nextBoolean()) "," else " ,", "}")
    }
    val somePaths = Seq("$", "$.a", "$.b", "$.key", "$.a[0]", "$.a.b",
      "$[1]", "$.a[1].k2")
    var answered = 0
    for (_ <- 0 until 3000) {
      val d = value(0)
      for (p <- rnd.shuffle(somePaths).take(6)) {
        assert(fastSpark(d, p) == spark(d, p), s"spark doc=<$d> path=$p")
        assert(fastTree(d, p) == tree(d, p), s"tree doc=<$d> path=$p")
        assert(fastTreeRaw(d, p) == treeRaw(d, p), s"raw doc=<$d> path=$p")
        if (fastSpark(d, p) != null) answered += 1
      }
    }
    assert(answered > 1000, s"sweep degenerated: only $answered non-null answers")
  }
}
