package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType, StringType}

/** Single-pass sketch expressions for the dedup operators.
  *
  * The declarative forms (`transform`/`aggregate` over 64/128-wide
  * array lambdas) are semantically right but generate enormous Janino
  * codegen units — seconds of compile time per distinct plan and
  * megamorphic interpreted fallbacks. These Catalyst expressions
  * compute the same values in one tight JVM loop per row, and each
  * implements `doGenCode` as a single static call into [[SketchOps]]
  * so the whole-stage codegen span stays unbroken on the dedup/ANN
  * hot paths.
  *
  * Hash identity is preserved exactly: Spark's `xxhash64(x, salt)`
  * folds left from seed 42, i.e. `hashLong(salt, hashLong(x, 42))`
  * (XxHash64.computeHash), so [[MinHashSig]] reuses the already-hashed
  * shingle values and only pays one `hashLong` per (shingle, salt).
  */
object Sketches {

  /** MinHash signature over pre-hashed shingles: element i =
    * min over s of xxhash64(s, salt_i) — identical values to the
    * declarative `array_min(transform(sh, s -> xxhash64(s, salt_i)))`.
    */
  case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    private lazy val salts: Array[Long] = {
      val rnd = new java.util.Random(seed)
      Array.fill(numHashes)(rnd.nextLong())
    }

    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      SketchOps.minhash(input.asInstanceOf[ArrayData], salts)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val saltsRef = ctx.addReferenceObj("salts", salts, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.minhash($c, $saltsRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash over pre-hashed features: bit k set iff
    * #features with bit k set > #features with it clear — identical to
    * the declarative ±1-vote fold. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      SketchOps.simhash(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.simhash($c);")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Word n-gram shingle hashes in one pass: distinct
    * xxhash64("w1 w2 .. wn") over a whitespace split — identical
    * values to hashing `array_join(slice(split(text,' '), i, n), ' ')`.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      SketchOps.shingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.shingles($c, $n);")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** Heuristic language ID (TextAnalysis.langId semantics) in one pass:
    * marker-word hit rate per language over the lowercased whitespace
    * split, CJK-script override, `und` unless some language clears the
    * 0.005 baseline; ties go to the earlier language in the list.
    */
  case class LangId(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      SketchOps.langId(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.langId($c);")
    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
  }

  object LangId {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "for", "with", "was"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
      "es" -> Seq("el", "los", "las", "es", "una", "en", "que", "por", "con", "para"))
    val langs: Array[String] = markers.map(_._1).toArray
    val markerSets: Array[Set[String]] = markers.map(_._2.toSet).toArray
  }

  def langId(text: Column): Column = S.column(LangId(S.expression(text)))

  /** Word n-grams as strings ([[SketchOps.wordGrams]]) — single-pass
    * replacement for the split→sequence→slice→concat_ws HOF tree. */
  case class WordGrams(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      SketchOps.wordGrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.wordGrams($c, $n);")
    override protected def withNewChildInternal(newChild: Expression): WordGrams =
      copy(child = newChild)
  }

  /** Gopher repetition stats ([[SketchOps.repetition]]) — one
    * hash-count pass per row, replacing the declarative
    * sort+fold-over-bigram-arrays form (which spent the whole bench in
    * per-row array_sort and struct-allocating lambdas). */
  /** Gopher §A1.1 rule-set raw counts, one compiled pass per document
    * (see SketchOps.gopher for the pinned cross-engine definitions).
    * Integer outputs only — the threshold rules derive in SQL. */
  case class GopherStats(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq("n_words", "word_len_sum", "n_alpha_words", "n_stop_hits",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_hash",
        "n_ellipsis").map(n =>
        org.apache.spark.sql.types.StructField(n, LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      SketchOps.gopher(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.gopher($c);")
    override protected def withNewChildInternal(newChild: Expression): GopherStats =
      copy(child = newChild)
  }

  case class RepetitionStats(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dup_seg_frac", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_seg_char_frac", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("top_bigram_char_frac", DoubleType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      SketchOps.repetition(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.repetition($c);")
    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
  }

  /** N path extractions from one JSON document with ONE parse — the
    * multi-accessor replacement for chained get_json_object calls
    * (each of which re-parses the document; Spark's json_tuple only
    * reaches top-level keys). Paths are dotted (`meta.pri`); output is
    * array<string> aligned with `paths`.
    */
  case class JsonMultiGet(child: Expression, paths: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    private lazy val pathArr = paths.toArray
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullSafeEval(input: Any): Any =
      SketchOps.jsonMultiGet(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], pathArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("paths", pathArr, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.jsonMultiGet($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): JsonMultiGet =
      copy(child = c)
  }

  def jsonMultiGet(doc: Column, paths: Seq[String]): Column =
    S.column(JsonMultiGet(S.expression(doc), paths))

  /** Σ a_i·b_i in double — same sequential double accumulation as the
    * declarative `aggregate(zip_with(...))` form, without the per-row
    * intermediate arrays (which made all-pairs cosine quadratic in
    * allocations, not just flops). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType, ArrayType)
    override def dataType: DataType = DoubleType
    private lazy val cx = SketchOps.typeCode(left.dataType.asInstanceOf[ArrayType].elementType)
    private lazy val cy = SketchOps.typeCode(right.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], cx, cy)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.SketchOps.dot($a, $b, $cx, $cy);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** cos(a, b) = dot/(|a|·|b|) in one pass over both arrays. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType, ArrayType)
    override def dataType: DataType = DoubleType
    private lazy val cx = SketchOps.typeCode(left.dataType.asInstanceOf[ArrayType].elementType)
    private lazy val cy = SketchOps.typeCode(right.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], cx, cy)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.SketchOps.cosine($a, $b, $cx, $cy);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  def dotProduct(a: Column, b: Column): Column =
    S.column(DotProduct(S.expression(a), S.expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    S.column(CosineSim(S.expression(a), S.expression(b)))

  /** All hyperplane signatures in ONE compiled pass (see
    * SketchOps.hyperplaneSigs): returns `array<long>` of `nSigs`
    * packed sign-bit words, bit-identical to chaining
    * `Similarity.hyperplaneSignature` per signature, without the
    * hundreds of per-plane literal-array expressions that blow the
    * 64 KB codegen method limit at LSH-auto chunk counts. */
  case class HyperplaneSigs(child: Expression, planes: Array[Array[Double]],
      nSigs: Int, bitsPer: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val code =
      SketchOps.typeCode(child.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(input: Any): Any =
      SketchOps.hyperplaneSigs(input.asInstanceOf[ArrayData], code, planes,
        nSigs, bitsPer)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.hyperplaneSigs($c, $code, " +
          s"$pRef, $nSigs, $bitsPer);")
    }
    override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
      copy(child = newChild)
  }

  def hyperplaneSigs(vec: Column, planes: Array[Array[Double]],
      nSigs: Int, bitsPer: Int): Column =
    S.column(HyperplaneSigs(S.expression(vec), planes, nSigs, bitsPer))

  /** One-pass dedup-key text normalization (see SketchOps.normalizeText
    * — byte-identical to the lower/regexp_replace/trim chain at 1/4 the
    * passes and no regex engine). */
  case class NormalizeText(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      SketchOps.normalizeText(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.normalizeText($c);")
    override protected def withNewChildInternal(newChild: Expression): NormalizeText =
      copy(child = newChild)
  }

  def normalizeText(text: Column): Column =
    S.column(NormalizeText(S.expression(text)))

  /** Portable md5 min-k fingerprint (see SketchOps.portableFingerprint)
    * — one pass per document; the declarative HOF form re-evaluates the
    * whitespace split once per gram. */
  case class PortableFingerprint(child: Expression, shingleSize: Int,
      sketchSize: Int) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      SketchOps.portableFingerprint(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        shingleSize, sketchSize)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.portableFingerprint($c, $shingleSize, $sketchSize);")
    override protected def withNewChildInternal(newChild: Expression): PortableFingerprint =
      copy(child = newChild)
  }

  def portableFingerprint(text: Column, shingleSize: Int, sketchSize: Int): Column =
    S.column(PortableFingerprint(S.expression(text), shingleSize, sketchSize))

  /** DSIR scoring pass (SketchOps.dsirScore): struct(score, n_grams)
    * per document in one compiled pass. */
  case class DsirScore(child: Expression, ratios: Array[Double], hexDigits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("n_grams", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      SketchOps.dsirScore(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ratios, hexDigits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ratiosRef = ctx.addReferenceObj("ratios", ratios, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.dsirScore($c, $ratiosRef, $hexDigits);")
    }
    override protected def withNewChildInternal(newChild: Expression): DsirScore =
      copy(child = newChild)
  }

  def dsirScore(text: Column, ratios: Array[Double], hexDigits: Int): Column =
    S.column(DsirScore(S.expression(text), ratios, hexDigits))

  /** DSIR bucket ids (SketchOps.dsirBuckets) for the count pass. */
  case class DsirBuckets(child: Expression, hexDigits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      SketchOps.dsirBuckets(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], hexDigits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.dsirBuckets($c, $hexDigits);")
    override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
      copy(child = newChild)
  }

  def dsirBuckets(text: Column, hexDigits: Int): Column =
    S.column(DsirBuckets(S.expression(text), hexDigits))

  /** Linear score over pre-materialized bucket ids
    * (SketchOps.bucketScore): the per-iteration scoring step of the
    * hashed-feature classifier — weights update every iteration, so
    * they ride as a reference object, not plan literals. */
  case class BucketScore(child: Expression, weights: Array[Double])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      SketchOps.bucketScore(input.asInstanceOf[ArrayData], weights)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("weights", weights, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.bucketScore($c, $wRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): BucketScore =
      copy(child = newChild)
  }

  def bucketScore(buckets: Column, weights: Array[Double]): Column =
    S.column(BucketScore(S.expression(buckets), weights))

  /** SemDeDup assignment as a compiled expression: argmax cosine over
    * the (hyperparameter-sized) centroid table riding into codegen as
    * reference objects — same pattern as [[BucketScore]]'s weights. */
  case class CentroidArgmax(child: Expression, ids: Array[Long],
      cents: Array[Array[Double]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      SketchOps.centroidArgmax(input.asInstanceOf[ArrayData], ids, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
      val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.centroidArgmax($c, $idsRef, $cRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): CentroidArgmax =
      copy(child = newChild)
  }

  def centroidArgmax(vec: Column, ids: Array[Long],
      cents: Array[Array[Double]]): Column =
    S.column(CentroidArgmax(S.expression(vec), ids, cents))

  /** Max cosine against a reference vector table as a compiled
    * expression — the semantic-decontamination kernel (the benchmark
    * embeddings ride into codegen as one reference object). */
  case class MaxCosine(child: Expression, refs: Array[Array[Double]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullSafeEval(input: Any): Any =
      SketchOps.maxCosine(input.asInstanceOf[ArrayData], refs)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rRef = ctx.addReferenceObj("refVecs", refs, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.maxCosine($c, $rRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): MaxCosine =
      copy(child = newChild)
  }

  def maxCosine(vec: Column, refs: Array[Array[Double]]): Column =
    S.column(MaxCosine(S.expression(vec), refs))

  /** Scan-speed membership probe against a pre-built Bloom filter (the
    * filter rides into codegen as one reference object, shipped with
    * the serialized plan like a broadcast variable). False positives
    * possible per the filter's fpp; false negatives never. */
  case class BloomProbe(child: Expression,
      filter: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullSafeEval(input: Any): Any =
      filter.mightContainString(input.toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fRef = ctx.addReferenceObj("bloom", filter,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $fRef.mightContainString($c.toString());")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomProbe =
      copy(child = newChild)
  }

  def bloomProbe(c: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column =
    S.column(BloomProbe(S.expression(c), filter))

  /** [[BloomProbe]] over 64-bit hash columns (the repeated-span /
    * boilerplate-line hot sets probe as longs, not strings). */
  case class BloomProbeLong(child: Expression,
      filter: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(LongType)
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fRef = ctx.addReferenceObj("bloom", filter,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $fRef.mightContainLong($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomProbeLong =
      copy(child = newChild)
  }

  def bloomProbeLong(c: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column =
    S.column(BloomProbeLong(S.expression(c), filter))

  /** Exact-integer pin for the stubbed feature encoder (see
    * SketchOps.rollingHashSum): lets an external oracle verify the float
    * feature vectors through an integer invariant. */
  case class RollingHashSum(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      SketchOps.rollingHashSum(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchOps.rollingHashSum($c);")
    override protected def withNewChildInternal(newChild: Expression): RollingHashSum =
      copy(child = newChild)
  }

  def rollingHashSum(payload: Column): Column =
    S.column(RollingHashSum(S.expression(payload)))

  def minhashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    S.column(MinHashSig(S.expression(shingles), numHashes, seed))
  def simhash64(features: Column): Column =
    S.column(SimHash64(S.expression(features)))
  def shingleHashes(text: Column, n: Int): Column =
    S.column(ShingleHashes(S.expression(text), n))
}
