package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the hash primitives backing q39/q44/q49 — checked
  * against independent BigInt models, so a broken 128-bit multiply or
  * sign-extension bug cannot hide behind fixture luck. */
class HashingPropertySpec extends AnyFunSuite {

  private val Mod = BigInt(2).pow(61) - 1
  private val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("property: rollingHash matches the BigInt polynomial model") {
    check(Prop.forAll(bytesGen) { bytes =>
      val arr = bytes.toArray
      val model = arr.foldLeft(BigInt(0)) { (h, b) =>
        (h * 1000003 + (b & 0xff)) % Mod
      }
      BigInt(Hashing.rollingHash(arr)) == model
    })
  }

  test("property: fnv1a64 matches the BigInt mod-2^64 model") {
    val M64 = BigInt(2).pow(64)
    check(Prop.forAll(bytesGen) { bytes =>
      val arr = bytes.toArray
      val model = arr.foldLeft(BigInt("14695981039346656037")) { (h, b) =>
        ((h ^ BigInt(b & 0xff)) * BigInt("1099511628211")).mod(M64)
      }
      BigInt(Hashing.fnv1a64(arr)).mod(M64) == model
    })
  }

  test("property: rollingHash is prefix-incremental (h(a++b) from h(a))") {
    // The incremental property the '100 TB cheap-to-extend' claim rests on:
    // h(a ++ b) = h(a)·Base^|b| + poly(b)  (mod p).
    check(Prop.forAll(bytesGen, bytesGen) { (a, b) =>
      val ha = BigInt(Hashing.rollingHash(a.toArray))
      val extended = b.foldLeft(ha) { (h, byte) =>
        (h * 1000003 + (byte & 0xff)) % Mod
      }
      BigInt(Hashing.rollingHash((a ++ b).toArray)) == extended
    })
  }
}
