package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}

/** Single-pass sketch expressions for the dedup operators.
  *
  * The declarative forms (`transform`/`aggregate` over 64/128-wide
  * array lambdas) are semantically right but generate enormous Janino
  * codegen units — seconds of compile time per distinct plan and
  * megamorphic interpreted fallbacks. These Catalyst expressions
  * compute the same values in one tight JVM loop per row.
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
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    private val salts: Array[Long] = {
      val rnd = new java.util.Random(seed)
      Array.fill(numHashes)(rnd.nextLong())
    }

    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      while (j < n) {
        val base = XXH64.hashLong(arr.getLong(j), 42L)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(salts(i), base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash over pre-hashed features: bit k set iff
    * #features with bit k set > #features with it clear — identical to
    * the declarative ±1-vote fold. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var j = 0
      while (j < n) {
        val h = arr.getLong(j)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
        j += 1
      }
      var sig = 0L
      var k = 0
      while (k < 64) {
        if (counts(k) > 0) sig |= (1L << k)
        k += 1
      }
      sig
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Word n-gram shingle hashes in one pass: distinct
    * xxhash64("w1 w2 .. wn") over a whitespace split — identical
    * values to hashing `array_join(slice(split(text,' '), i, n), ' ')`.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val words = input.toString.split(" ", -1)
      if (words.length < n) return new GenericArrayData(Array.empty[Long])
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        seen.add(XXH64.hashUTF8String(utf8, 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** Heuristic language ID (TextAnalysis.langId semantics) in one pass:
    * marker-word hit rate per language over the lowercased whitespace
    * split, CJK-script override, `und` unless some language clears the
    * 0.005 baseline; ties go to the earlier language in the list.
    */
  case class LangId(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    import LangId._
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val text = input.toString
      var cjk = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c >= '一' && c <= '鿿') cjk += 1
        i += 1
      }
      if (text.nonEmpty && cjk.toDouble / text.length > 0.2)
        return org.apache.spark.unsafe.types.UTF8String.fromString("zh")
      val words = text.toLowerCase.split("\\s+")
      val hits = new Array[Int](langs.length)
      var n = 0
      words.foreach { w =>
        if (w.nonEmpty) {
          n += 1
          var l = 0
          while (l < langs.length) {
            if (markerSets(l).contains(w)) hits(l) += 1
            l += 1
          }
        }
      }
      val nWords = math.max(n, 1).toDouble
      var best = "und"; var bestScore = 0.005
      var l = 0
      while (l < langs.length) {
        val s = hits(l) / nWords
        if (s > bestScore) { best = langs(l); bestScore = s }
        l += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(best)
    }
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

  private def numAt(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalArgumentException(other.toString)
  }

  /** Σ a_i·b_i in double — same sequential double accumulation as the
    * declarative `aggregate(zip_with(...))` form, without the per-row
    * intermediate arrays (which made all-pairs cosine quadratic in
    * allocations, not just flops). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType, ArrayType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val et1 = left.dataType.asInstanceOf[ArrayType].elementType
      val et2 = right.dataType.asInstanceOf[ArrayType].elementType
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += numAt(x, et1, i) * numAt(y, et2, i); i += 1 }
      s
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  /** cos(a, b) = dot/(|a|·|b|) in one pass over both arrays. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType, ArrayType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val et1 = left.dataType.asInstanceOf[ArrayType].elementType
      val et2 = right.dataType.asInstanceOf[ArrayType].elementType
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = numAt(x, et1, i); val yv = numAt(y, et2, i)
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  def dotProduct(a: Column, b: Column): Column =
    S.column(DotProduct(S.expression(a), S.expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    S.column(CosineSim(S.expression(a), S.expression(b)))

  def minhashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    S.column(MinHashSig(S.expression(shingles), numHashes, seed))
  def simhash64(features: Column): Column =
    S.column(SimHash64(S.expression(features)))
  def shingleHashes(text: Column, n: Int): Column =
    S.column(ShingleHashes(S.expression(text), n))
}
