package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.plans.TextExpressions._
import graft.plans.CosineSimilarity

/** ScalaCheck properties for the custom Catalyst expressions, evaluated
  * directly (no SparkSession — pure expression eval), per SURVEY.md §5. */
object ExpressionProperties extends Properties("graft.expressions") {

  private def utf8Array(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s): Any).toArray)
  private def floatArray(xs: Seq[Float]): ArrayData =
    new GenericArrayData(xs.map(x => x: Any).toArray)
  private def strLit(s: String) = Literal(UTF8String.fromString(s), StringType)
  private def arrLit(xs: Seq[String]) = Literal(utf8Array(xs), ArrayType(StringType))
  private def vecLit(xs: Seq[Float]) = Literal(floatArray(xs), ArrayType(FloatType))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val words = Gen.listOf(word)
  private val vec = Gen.nonEmptyListOf(Gen.chooseNum(-5.0f, 5.0f)).suchThat(
    v => v.exists(_ != 0.0f))

  property("wordShingles: every shingle has n tokens and appears in the text") =
    forAll(words, Gen.choose(1, 4)) { (ws, n) =>
      val out = WordShingles(strLit(ws.mkString(" ")), n).eval(null)
        .asInstanceOf[ArrayData]
      val shingles = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      shingles.forall(sh => sh.split(" ").length == n &&
        ws.mkString(" ").contains(sh)) &&
        shingles.distinct.length == shingles.length &&
        (ws.length >= n) == shingles.nonEmpty
    }

  property("wordShingles: whitespace normalization invariance") =
    forAll(words) { ws =>
      val a = WordShingles(strLit(ws.mkString(" ")), 2).eval(null)
      val b = WordShingles(strLit("  " + ws.mkString("   ") + " "), 2).eval(null)
      a.asInstanceOf[ArrayData].array.toSeq == b.asInstanceOf[ArrayData].array.toSeq
    }

  property("minhashSig: order-invariant, k components, stable") =
    forAll(Gen.nonEmptyListOf(word), Gen.choose(1, 8)) { (ws, k) =>
      val distinct = ws.distinct
      val a = MinHashSig(arrLit(distinct), k).eval(null).asInstanceOf[ArrayData]
      val b = MinHashSig(arrLit(scala.util.Random.shuffle(distinct)), k)
        .eval(null).asInstanceOf[ArrayData]
      a.numElements() == k &&
        (0 until k).forall(i => a.getUTF8String(i) == b.getUTF8String(i))
    }

  property("minhash component equals min of seeded md5s") =
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      val out = MinHashSig(arrLit(ws.distinct), 1).eval(null).asInstanceOf[ArrayData]
      out.getUTF8String(0).toString == ws.distinct.map(w => md5Hex("0:" + w)).min
    }

  property("minhashSigMix component s = min of (h1 + s*h2) mod 2^32 over md5 words") =
    forAll(Gen.nonEmptyListOf(word), Gen.choose(1, 16)) { (ws, k) =>
      val out = MinHashSigMix(arrLit(ws.distinct), k).eval(null).asInstanceOf[ArrayData]
      val expected = (0 until k).map { s =>
        ws.distinct.map { w =>
          val hex = md5Hex(w)
          val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
          val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
          (h1 + s * h2) % 4294967296L
        }.min
      }
      out.numElements() == k && (0 until k).forall(i => out.getLong(i) == expected(i))
    }

  property("packedPairs: all i<j pairs exactly once, order-invariant") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 4294967295L)).map(_.distinct)) { ids =>
      val lit = Literal(new GenericArrayData(ids.map(x => x: Any).toArray),
        ArrayType(LongType))
      val out = PackedPairs(lit).eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map(out.getLong).toSet
      val want = (for {
        a <- ids; b <- ids if a < b
      } yield (a << 32) | b).toSet
      out.numElements() == ids.length * (ids.length - 1) / 2 && got == want
    }

  property("simhash16: 16 bits, set-invariant") =
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      val a = SimHash16(strLit(ws.mkString(" "))).eval(null).toString
      val b = SimHash16(strLit(scala.util.Random.shuffle(ws ++ ws).mkString(" ")))
        .eval(null).toString
      a.matches("[01]{16}") && a == b
    }

  private val vecPair = for {
    n <- Gen.choose(1, 32)
    a <- Gen.listOfN(n, Gen.chooseNum(-5.0f, 5.0f)).suchThat(_.exists(_ != 0.0f))
    b <- Gen.listOfN(n, Gen.chooseNum(-5.0f, 5.0f)).suchThat(_.exists(_ != 0.0f))
  } yield (a, b)

  property("cosine: symmetric, in [-1,1], self-similarity 1") =
    forAll(vecPair) { case (a, b) =>
      val ab = CosineSimilarity(vecLit(a), vecLit(b)).eval(null).asInstanceOf[Double]
      val ba = CosineSimilarity(vecLit(b), vecLit(a)).eval(null).asInstanceOf[Double]
      val aa = CosineSimilarity(vecLit(a), vecLit(a)).eval(null).asInstanceOf[Double]
      ab == ba && ab >= -1.0000001 && ab <= 1.0000001 && math.abs(aa - 1.0) < 1e-9
    }

  property("cosine: positive-scale invariance") =
    forAll(vec, Gen.chooseNum(0.1f, 10.0f)) { (x, c) =>
      val scaled = x.map(_ * c)
      val s = CosineSimilarity(vecLit(x), vecLit(scaled)).eval(null).asInstanceOf[Double]
      math.abs(s - 1.0) < 1e-6
    }

  property("md5Hex matches reference implementation") =
    forAll(Gen.asciiPrintableStr) { s =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      md5Hex(s) == ref
    }

  property("adjacentPairs: tokens zip tail, multiplicity kept") =
    forAll(words) { ws =>
      val out = AdjacentPairs(strLit(ws.mkString(" "))).eval(null)
        .asInstanceOf[ArrayData]
      val pairs = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      val expected = if (ws.length < 2) Seq.empty
        else ws.zip(ws.tail).map { case (a, b) => s"$a $b" }
      pairs == expected
    }
}
