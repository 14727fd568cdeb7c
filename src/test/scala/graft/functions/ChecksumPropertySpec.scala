package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{IbanValid, LuhnValid}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the validated-PII checksum expressions — the
  * guarantees the PII gate's false-positive story rests on, proven on
  * generated inputs rather than the fixture PANs/IBANs:
  *
  *   - Luhn has EXACTLY one valid check digit per base (so random
  *     digit noise passes ~1/10, never more), and detects EVERY
  *     single-digit substitution (its design guarantee).
  *   - IBAN mod-97 uses a PRIME modulus > 36 coprime with 10, so it
  *     detects every single-character SAME-CLASS substitution
  *     (digit→digit and letter→letter — the delta is a single
  *     |Δ| < 97 times a power of 10; a cross-class substitution
  *     changes the two-digit letter expansion's LENGTH and carries no
  *     such guarantee, which the spec documents by construction) —
  *     random bank-shaped noise passes ~1/97.
  *
  * Direct evals against `compute` (the same static methods codegen
  * emits calls to), deterministic scalacheck sampling (fixed seeds,
  * the UpdatesPropertySpec pattern) so failures replay. */
class ChecksumPropertySpec extends SparkSpec {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  private def luhn(s: String): Boolean =
    LuhnValid.compute(UTF8String.fromString(s))
  private def iban(s: String): Boolean =
    IbanValid.compute(UTF8String.fromString(s))

  private val digit = Gen.choose(0, 9).map(d => ('0' + d).toChar)

  test("Luhn: exactly one valid check digit per base, all lengths 12..18") {
    (12 to 18).foreach { baseLen =>
      (1 to 40).foreach { i =>
        val base = sample(Gen.stringOfN(baseLen, digit), baseLen * 1000L + i)
        val valid = (0 to 9).count(d => luhn(base + d))
        assert(valid == 1, s"base $base has $valid valid check digits")
      }
    }
  }

  test("Luhn: every single-digit substitution is detected") {
    (1 to 60).foreach { i =>
      val base = sample(Gen.stringOfN(15, digit), 7000L + i)
      val pan = (0 to 9).map(d => base + d).find(luhn).get
      pan.indices.foreach { pos =>
        ('0' to '9').filter(_ != pan(pos)).foreach { c =>
          val corrupted = pan.updated(pos, c)
          assert(!luhn(corrupted),
            s"substitution at $pos undetected: $pan -> $corrupted")
        }
      }
    }
  }

  test("IBAN: every same-class single-character substitution is detected (prime modulus)") {
    val alnum = Gen.oneOf(('0' to '9') ++ ('A' to 'Z'))
    (1 to 30).foreach { i =>
      val body = sample(Gen.stringOfN(14, alnum), 9000L + i)
      // fix up the check digits the standard way: find the (unique)
      // 2-digit pair that validates GB<cc><body>
      val full = (2 to 98).map(cc => f"GB$cc%02d$body").find(iban)
      assert(full.isDefined, s"no valid check pair for body $body")
      val pan = full.get
      val pairs = (2 to 98).count(cc => iban(f"GB$cc%02d$body"))
      assert(pairs == 1, s"$pairs valid check pairs for $body")
      pan.indices.drop(4).foreach { pos => // corrupt the BBAN
        val sameClass =
          if (pan(pos).isDigit) ('0' to '9') else ('A' to 'Z')
        sameClass.filter(_ != pan(pos)).foreach { c =>
          assert(!iban(pan.updated(pos, c)),
            s"substitution at $pos undetected in $pan")
        }
      }
    }
  }

  test("random shaped noise passes at the checksum rates, not more") {
    val panGen = Gen.stringOfN(16, digit)
    val luhnHits = (1 to 2000).count(i => luhn(sample(panGen, 100000L + i)))
    // binomial(2000, 0.1): mean 200, sd ~13.4 — 6 sd window
    assert(luhnHits > 120 && luhnHits < 280, s"luhn noise rate: $luhnHits/2000")
    val alnum = Gen.oneOf(('0' to '9') ++ ('A' to 'Z'))
    val ibanGen = for {
      cc <- Gen.stringOfN(2, Gen.oneOf('A' to 'Z'))
      dd <- Gen.stringOfN(2, digit)
      bb <- Gen.stringOfN(16, alnum)
    } yield cc + dd + bb
    val ibanHits = (1 to 2000).count(i => iban(sample(ibanGen, 200000L + i)))
    // binomial(2000, 1/97): mean ~20.6, sd ~4.5 — 6 sd window
    assert(ibanHits < 48, s"iban noise rate: $ibanHits/2000")
  }
}
