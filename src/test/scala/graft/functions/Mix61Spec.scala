package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The cross-engine contract of the portable hash kernels: the pinned
  * expected values below were computed by DUCKDB running the oracle macros
  * ([[Mix61.oracleMacros]]) — if either side's arithmetic drifts, these
  * fail before the driver gate does.
  */
class Mix61Spec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("mulmod matches BigInt arithmetic over the full 61-bit domain") {
    val gen = Gen.chooseNum(0L, Mix61.M - 1)
    check(Prop.forAll(gen, gen) { (a: Long, b: Long) =>
      Mix61.mulmod(a, b) == (BigInt(a) * BigInt(b) % BigInt(Mix61.M)).toLong
    })
  }

  test("mix pins to the DuckDB macro values (cross-engine bit-identity)") {
    assert(Mix61.mix(0L, 0L) == 1378018242060109957L)
    assert(Mix61.mix(12345L, 7L) == 425147934123586399L)
    assert(Mix61.mix(2305843009213693950L, 211L) == 1862767320382524183L)
    // composed with the rolling shingle hash, as the dedup oracles use it
    val sh = RollingHash.hash("hello world x")
    assert(sh == 1564308343248537152L)
    assert(Mix61.mix(sh, 3L) == 346376871732502640L)
  }

  test("mix is seed-sensitive; outputs stay in [0, 2^61)") {
    val gen = Gen.chooseNum(0L, Mix61.M - 1)
    check(Prop.forAll(gen) { (x: Long) =>
      val h = Mix61.mix(x, 0L)
      h >= 0L && h < (1L << 61) && Mix61.mix(x, 1L) != h
    })
  }
}
