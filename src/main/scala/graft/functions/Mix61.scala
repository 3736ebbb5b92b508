package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Engine-portable 64→61-bit mixing hash: two multiply-mod-(2^61-1) rounds
  * interleaved with xor-shifts (a splitmix64-style avalanche re-based onto
  * the Mersenne prime 2^61-1 so every step is plain integer arithmetic that
  * ANY engine with 128-bit — or Mersenne-trick 64-bit — multiplication can
  * reproduce bit-for-bit). This is what lets the MinHash / SimHash / sign-LSH
  * operators carry exact cross-engine oracles: DuckDB replays the identical
  * arithmetic via HUGEINT (`(a::HUGEINT * b::HUGEINT) % M`, see
  * [[Mix61.oracleMacros]]), where xxhash64/murmur3 — the kernels these
  * replaced — exist only inside Spark.
  *
  * Not a cryptographic hash; used for minhash permutations, LSH bucket
  * signatures, and salt derivation, where seed-stable uniformity is what
  * matters. Inputs must be non-negative (ours are rolling-hash values,
  * array indexes, and prior mix outputs — all in [0, 2^61)).
  *
  * A native Catalyst `BinaryExpression` with whole-stage codegen, same
  * pattern as [[RollingHash]] / [[DotProduct]].
  */
case class Mix61(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix61 expects (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(x: Any, seed: Any): Any =
    Mix61.mix(x.asInstanceOf[Long], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, s) => s"graft.functions.Mix61$$.MODULE$$.mix($x, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Mix61 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "mix61"
}

object Mix61 {
  /** Mersenne prime 2^61 - 1 (same modulus as [[RollingHash]]). */
  final val M: Long = (1L << 61) - 1

  /** Odd multipliers: splitmix64's golden-gamma constants reduced mod M. */
  final val A: Long = 2177342782468422681L // 0x9E3779B97F4A7C15 mod M
  final val B: Long = 2258633747088074174L // 0xBF58476D1CE4E5B9 mod M

  /** (a * b) mod 2^61-1 for a, b in [0, 2^61): full 128-bit product via
    * multiplyHigh, reduced with 2^61 ≡ 1 (so 2^64 ≡ 8): product =
    * hi·2^64 + lo ≡ hi·8 + (lo >>> 61) + (lo & M). Every addend < 2^61,
    * so the sum fits a long; at most two subtractions finish the reduction.
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a, b < 2^62 ⇒ signed == unsigned high
    val lo = a * b // wrapped low 64 bits
    var r = hi * 8 + (lo >>> 61) + (lo & M)
    while (r >= M) r -= M
    r
  }

  /** The portable mix: x folded with the seed, then multiply / xorshift /
    * multiply / xorshift. Result in [0, 2^61). Seeds are small non-negative
    * ints (hash-family index); x any non-negative long.
    */
  def mix(x: Long, seed: Long): Long = {
    var h = (x % M + 1 + seed) % M
    h = mulmod(h, A)
    h ^= (h >>> 31)
    h = mulmod(h, B)
    h ^= (h >>> 33)
    h
  }

  /** Column API (Spark 4: Column↔Expression via the sql-package shim). */
  def mix61(x: Column, seed: Column): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(Mix61(
      graftshim.toExpression(x.cast("long")), graftshim.toExpression(seed.cast("long"))))
  }

  /** DuckDB macro preamble replaying the identical arithmetic — prepended to
    * every oracle whose query uses mix61 (the driver's DuckDB gate executes
    * multi-statement SQL). `rh61` is the [[RollingHash]] recurrence over a
    * string's codepoints (the portable shingle hash); `mix61` is [[mix]].
    */
  val oracleMacros: String =
    """CREATE OR REPLACE MACRO mm61(a, b) AS
      |  CAST((CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) % 2305843009213693951 AS BIGINT);
      |CREATE OR REPLACE MACRO mx2(h) AS xor(h, h >> 31);
      |CREATE OR REPLACE MACRO mx4(h) AS xor(h, h >> 33);
      |CREATE OR REPLACE MACRO mix61(x, s) AS
      |  mx4(mm61(mx2(mm61(((x % 2305843009213693951) + 1 + s) % 2305843009213693951,
      |    2177342782468422681)), 2258633747088074174));
      |CREATE OR REPLACE MACRO rh61(s) AS
      |  CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |    list_transform(range(1, length(s) + 1),
      |      i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
      |    (h, c) -> (h * 31 + c) % 2305843009213693951) AS BIGINT);
      |""".stripMargin
}
