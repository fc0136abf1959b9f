package graft.fixtures

import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity pin for the transcript generator: the corpus is the input
  * of every extraction-family oracle row AND the flagship extract bench leg
  * times generation + extraction fused, so a generator refactor (the r06
  * micro-optimization: manual zero-padding instead of String.format, char
  * loops instead of Vector.fill) must not move a single byte. Fingerprints
  * were computed from the round-5 generator (tools/GenFingerprint) BEFORE
  * the refactor and pinned here — full-field FNV over every turn. */
class TranscriptGenSpec extends AnyFunSuite {

  test("generated corpus is byte-identical to the pinned r05 fingerprints") {
    assert(graft.tools.GenFingerprint.fingerprint(5) == -9217911858207101434L)
    assert(graft.tools.GenFingerprint.fingerprint(60) == 3955171100520586998L)
    assert(graft.tools.GenFingerprint.fingerprint(150) == -6520474531946532570L)
  }
}
