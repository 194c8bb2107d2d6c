package graft

import org.apache.spark.sql.functions._

/** The sketch expressions must stay inside whole-stage codegen: with
  * CODEGEN_ONLY factory mode any expression whose doGenCode fails to
  * compile throws instead of silently falling back to interpreted eval.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  test("sketch expressions compile under CODEGEN_ONLY (no interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val docs = Seq((1L, "a b c d e f", Seq(1.0f, 2.0f)),
        (2L, "a b c d e g", Seq(2.0f, 1.0f))).toDF("id", "text", "vec")
      val out = docs.select(
        graft.functions.Sketches.shingleHashes(col("text"), 3).as("sh"),
        graft.functions.Sketches.langId(col("text")).as("lang"),
        graft.functions.Sketches.dotProduct(col("vec"), col("vec")).as("dp"),
        graft.functions.Sketches.cosineSim(col("vec"), col("vec")).as("cos"))
        .select(
          graft.functions.Sketches.minhashSig(col("sh"), 16).as("sig"),
          graft.functions.Sketches.simhash64(col("sh")).as("sim"),
          col("lang"), col("dp"), col("cos"))
        .collect()
      assert(out.length == 2)
      assert(out.forall(_.getAs[Double]("cos") > 0.999))
      assert(out.forall(_.getAs[Seq[Long]]("sig").length == 16))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("Any ordering, repetition and word-gram expressions compile under CODEGEN_ONLY") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val shims = org.apache.spark.sql.graft.shims
      val docs = Seq(("[1,2,3]", "[1,3]", "a b. a b. c d"),
        ("\"x\"", "1", "e f g")).toDF("a", "b", "text")
      val out = docs.select(
        graft.sources.Yson.anyCompare(col("a"), col("b")).as("cmp"),
        graft.sources.Yson.anySortKey(col("a")).as("key"),
        shims.column(graft.functions.Sketches.RepetitionStats(shims.expression(col("text")))).as("rep"),
        shims.column(graft.functions.Sketches.WordGrams(shims.expression(col("text")), 2)).as("grams"))
        .collect()
      assert(out.length == 2)
      assert(out.head.getAs[Int]("cmp") != 0)
      assert(out.forall(_.getAs[Array[Byte]]("key").nonEmpty))
      // the YPath accessor expressions stay codegen'd too
      val yp = Seq(("{\"b\":{\"c\":4}}", "/b/c")).toDF("doc", "p").select(
        shims.column(graft.sources.Yson.JsonGetRaw(
          shims.expression(col("doc")),
          graft.sources.Yson.YPathToJsonPath(shims.expression(col("p"))))).as("raw"),
        shims.column(graft.sources.Yson.JsonArrayFragments(
          shims.expression(lit("[1,\"x\",null]")))).as("frags"))
        .collect()
      assert(yp.head.getString(0) == "4")
      assert(yp.head.getSeq[String](1).toList == List("1", "\"x\"", null))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("HyperplaneSigs is bit-identical to the per-plane signature chain") {
    // the chain form at LSH-auto chunk counts blows the 64 KB codegen
    // method limit (ERROR CodeGenerator + interpreted fallback — the
    // sf10 soak measured 488 s); the compiled expression must produce
    // the SAME bits so recall behavior is unchanged
    val dim = 8
    val vecs = Seq(
      (1L, Seq(0.3f, -1.2f, 0.7f, 2.2f, -0.1f, 0.9f, -0.6f, 1.4f)),
      (2L, Seq(-0.8f, 0.2f, 1.1f, -2.0f, 0.5f, -0.9f, 1.6f, 0.05f)))
      .toDF("id", "vec")
    val chunks = 5; val cb = 9; val seed = 42L
    def planesFor(bits: Int, s: Long): Array[Array[Double]] = {
      val rnd = new java.util.Random(s)
      Array.fill(bits, dim)(rnd.nextGaussian())
    }
    val planes = (0 until chunks).toArray.flatMap(j => planesFor(cb, seed + 7919L * j))
    val both = vecs.select(
      graft.functions.Sketches.hyperplaneSigs(col("vec"), planes, chunks, cb)
        .as("fast"),
      array((0 until chunks).map { j =>
        graft.operators.Similarity.hyperplaneSignature(col("vec"), dim, cb,
          seed + 7919L * j)
      }: _*).as("chain")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
