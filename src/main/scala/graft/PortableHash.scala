package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/**
 * The engine's ONE portable deterministic hash family, shared by the
 * seeded clocks (`graft.ts.Sources`), the sampling/packing operators
 * (`graft.llm.Sampling`) and mirrored expression-for-expression by the
 * DuckDB oracle CTEs — a single definition so a change to the mix can
 * never silently diverge between operators or from the oracles.
 *
 * Written with bounded operands only: every intermediate stays below 2^59,
 * so the identical expression evaluates the same in any engine with 64-bit
 * integer arithmetic (DuckDB raises on BIGINT overflow rather than
 * wrapping, so portability requires boundedness, not wrap semantics).
 */
object PortableHash {

  /** Knuth multiplicative constant; also the seed offset of the second
    * hash lane. */
  val HashMult = 2654435761L

  private val M32 = 4294967296L // 2^32
  private val M31 = 2147483648L // 2^31
  private val MixC = 0x45d9f3bL // xorshift-multiply finisher constant

  /** 32-bit avalanche mix (xorshift-multiply finisher). */
  def mix32(v: Column): Column = {
    val x0 = F.pmod(v, F.lit(M32))
    val x1 = F.pmod(x0.bitwiseXOR(F.shiftright(x0, 16)) * MixC, F.lit(M32))
    val x2 = F.pmod(x1.bitwiseXOR(F.shiftright(x1, 16)) * MixC, F.lit(M32))
    x2.bitwiseXOR(F.shiftright(x2, 16))
  }

  /** 63-bit hash of (id, seed): two decorrelated 32-bit mixes concatenated
    * — full-width, so `pmod(_, m)` is near-uniform for any realistic m. */
  def hash63(id: Column, seed: Long): Column =
    F.pmod(mix32(id + seed), F.lit(M31)) * M32 + mix32(id + seed + HashMult)

  /** Deterministic uniform draw in [0, 1) from (id, seed). */
  def hashUnit(id: Column, seed: Long): Column =
    hash63(id, seed) / 9.223372036854776e18 // 2^63
}
