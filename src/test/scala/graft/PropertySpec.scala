package graft

import graft.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom expression implementations (evaluated
  * directly — the Spark integration is covered by FunctionsSpec/verify).
  */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga).zip(samples(gb)).foreach { case (a, b) => f(a, b) }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit = samples(ga).foreach(f)

  private val word = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)

  private def dl(a: String, b: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    DamerauLevenshtein(Literal(a), Literal(b)).eval(null).asInstanceOf[Long]
  }
  private def jw(a: String, b: String): Double = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    JaroWinklerSimilarity(Literal(a), Literal(b)).eval(null).asInstanceOf[Double]
  }
  private def jac(a: String, b: String): Double = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    JaccardSimilarity(Literal(a), Literal(b)).eval(null).asInstanceOf[Double]
  }

  test("damerau-levenshtein: identity, symmetry, edit bound") {
    forAll(word, word) { (a, b) =>
      assert(dl(a, a) == 0L)
      assert(dl(a, b) == dl(b, a))
      assert(dl(a, b) <= math.max(a.length, b.length))
      if (a != b) assert(dl(a, b) >= 1)
    }
  }

  test("jaro-winkler: bounds and identity") {
    forAll(word, word) { (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(jw(a, a) == 1.0)
      assert(s == jw(b, a) || math.abs(s - jw(b, a)) < 1e-12)
    }
  }

  test("jaccard: bounds, identity, symmetry") {
    forAll(word, word) { (a, b) =>
      val s = jac(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(jac(a, a) == 1.0)
      assert(jac(a, b) == jac(b, a))
    }
  }

  test("gcd/lcm: divisibility and relationship") {
    forAll(Gen.choose(1L, 10000L), Gen.choose(1L, 10000L)) { (a, b) =>
      val g = Gcd.gcd(a, b)
      assert(a % g == 0 && b % g == 0)
      assert(Lcm.lcm(a, b) % a == 0 && Lcm.lcm(a, b) % b == 0)
      assert(g * Lcm.lcm(a, b) == a * b)
    }
  }

  test("even: result is an even integer at least |x| away from zero") {
    forAll(Gen.choose(-1e6, 1e6)) { x =>
      val r = EvenCeil.even(x)
      assert(r % 2 == 0.0)
      assert(math.abs(r) >= math.abs(x) - 1e-9 || (x > 0 && r >= x) || (x < 0 && r <= x))
    }
  }
}
