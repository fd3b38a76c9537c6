package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sizing contract of the memory-bandwidth sentinel (VERDICT r13 #3: the
  * r12 Int-math bug crashed the bench at 16384 MiB and silently disabled
  * the probe at 32768 while still stamping 0.0 readings — the instrument
  * the artifacts' credibility rests on must fail LOUDLY on bad sizes).
  * Pure JVM, no SparkSession: `Mem` sizes and streams a plain long array.
  */
class SentinelsSpec extends AnyFunSuite {

  test("mem sentinel: miB=0 disables the probe (run() = 0.0, no alloc)") {
    val m = new Sentinels.Mem(0, 2)
    assert(m.run() == 0.0)
  }

  test("mem sentinel: negative sizes clamp to disabled, never negative-alloc") {
    val m = new Sentinels.Mem(-5, 2)
    assert(m.run() == 0.0)
  }

  test("mem sentinel: a small probe streams and reports positive seconds") {
    val m = new Sentinels.Mem(1, 2) // 1 MiB = 131072 longs
    val t = m.run()
    assert(t > 0.0 && t < 60.0)
  }

  test("mem sentinel: 16384 MiB rejects loudly (the former Int-overflow crash)") {
    // 16384 * 131072 = 2^31 > Int.MaxValue: pre-fix this was a
    // NegativeArraySizeException at startup; now a sized require message.
    val e = intercept[IllegalArgumentException](new Sentinels.Mem(16384, 2))
    assert(e.getMessage.contains("16384"))
  }

  test("mem sentinel: 32768 MiB rejects loudly (the former silent-zero wrap)") {
    // 32768 * 131072 = 2^32 wrapped to 0 in Int math: the probe silently
    // disabled while the bench stamped 0.0 readings as if measured.
    intercept[IllegalArgumentException](new Sentinels.Mem(32768, 2))
  }
}
