package graft

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory

/** r18 probe #2: pin the exact lifecycle constants and estimate
  * semantics the register-max union kernel must replicate at lgK = 8.
  *  1. LIST→SET and SET→HLL promotion counts (UNION-result mode by
  *     distinct-coupon count).
  *  2. coupon estimate = f(count) regardless of which coupons / layout?
  *  3. coupon → register mapping (slot/value bit split) — synthesized
  *     registers from a SET image must equal the real promoted sketch's.
  *  4. canonical dense header: kxq0/kxq1/curMin/numAtCurMin recompute
  *     rule — synthesize and byte-compare against Union.getResult.
  */
object ProbeHll2 {
  private val LgK = 8
  private val K = 1 << LgK

  private def sk1(x: Long): Array[Byte] = {
    val sk = new HllSketch(LgK, TgtHllType.HLL_8)
    sk.update(x)
    sk.toUpdatableByteArray
  }

  private def unionAll(sks: Seq[Array[Byte]]): Array[Byte] = {
    val u = new Union(LgK)
    sks.foreach(b => u.update(HllSketch.heapify(Memory.wrap(b))))
    u.getResult(TgtHllType.HLL_8).toUpdatableByteArray
  }

  private def est(b: Array[Byte]): Double =
    HllSketch.heapify(Memory.wrap(b)).getEstimate

  private def mode(b: Array[Byte]): Int = b(7) & 3

  // --- my canonical dense serializer (the kernel's eval shape) ---
  private def invPow2(v: Int): Double = java.lang.Double.longBitsToDouble(
    (1023L - v) << 52)
  def synthDense(regs: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](40 + K)
    out(0) = 10; out(1) = 1; out(2) = 7; out(3) = LgK.toByte
    out(4) = 0; out(5) = 0x10 // flags: OUT_OF_ORDER
    var curMin = 64
    var i = 0
    while (i < K) { val v = regs(i) & 0xff; if (v < curMin) curMin = v; i += 1 }
    out(6) = curMin.toByte
    out(7) = 0x0a // curMode=HLL(2) | tgt HLL_8(2)<<2
    var kxq0 = 0.0; var kxq1 = 0.0; var numAtCurMin = 0
    i = 0
    while (i < K) {
      val v = regs(i) & 0xff
      if (v < 32) kxq0 += invPow2(v) else kxq1 += invPow2(v)
      if (v == curMin) numAtCurMin += 1
      i += 1
    }
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(8, 0.0) // hipAccum zeroed when OOO
    bb.putDouble(16, kxq0)
    bb.putDouble(24, kxq1)
    bb.putInt(32, numAtCurMin)
    bb.putInt(36, 0)
    System.arraycopy(regs, 0, out, 40, K)
    out
  }

  def main(args: Array[String]): Unit = {
    // 1. promotion thresholds: union of n distinct single-item sketches
    var prevMode = -1
    for (n <- 1 to 70) {
      val b = unionAll((0 until n).map(i => sk1(i.toLong)))
      if (mode(b) != prevMode) {
        println(s"union-result mode changes to ${mode(b)} at count≈$n (len=${b.length})")
        prevMode = mode(b)
      }
    }
    // NB: distinct items can collide to one coupon; count≈n only approximately.
    // 2. coupon estimate = f(count)? different item sets, same count
    for (n <- Seq(3, 8, 15, 20)) {
      val e1 = est(unionAll((0 until n).map(i => sk1(i.toLong))))
      val e2 = est(unionAll((0 until n).map(i => sk1(1000L + 7L * i))))
      val e3 = est(unionAll((0 until n).map(i => sk1(50000L + 13L * i))))
      println(s"count≈$n ests: $e1 / $e2 / $e3 equal=${e1 == e2 && e2 == e3}")
    }
    // 3. coupon → register mapping: parse a SET image's coupons, place
    // with slot = c & (K-1), value = c >>> 26; compare against the real
    // promoted dense sketch of the same items
    val items = (0 until 20).map(i => 31L * i + 5)
    val setImg = unionAll(items.map(sk1))
    require(mode(setImg) == 1, s"expected SET, got ${mode(setImg)}")
    val bb = java.nio.ByteBuffer.wrap(setImg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val regs = new Array[Byte](K)
    var off = 12
    while (off < setImg.length) {
      val c = bb.getInt(off)
      if (c != 0) {
        val slot = c & (K - 1)
        val v = c >>> 26
        if (v > (regs(slot) & 0xff)) regs(slot) = v.toByte
      }
      off += 4
    }
    // force the same items dense by unioning with a dense carrier of the
    // SAME items only — instead just check against a directly-built dense:
    // promote by adding more items is wrong; instead compare my register
    // placement against HllSketch couponUpdate semantics via a big union
    // of the same 20 items + 50 fillers, minus fillers' slots is messy —
    // so do the cleaner test: synthesize dense from MY regs and compare
    // ESTIMATE against union(setImg, emptyDense)? Simplest: compare my
    // regs against the dense image datasketches produces when FORCED to
    // HLL via Union(lgK).update on a sketch built with the same items
    // streamed into an HLL-mode sketch (lgK=8 stream of 20 items stays
    // SET; force via toUpdatableByteArray of getResult after unioning
    // with itself many times cannot promote either). Fallback: verify
    // mapping indirectly — synthesize dense, ask datasketches for its
    // estimate, then compare against est of a union that crossed the
    // promotion boundary with the same items plus distinct extras whose
    // slots we also place. Done below in test 4b.
    // 4. canonical dense serializer byte-parity on dense unions
    val rnd = new scala.util.Random(11)
    var ok = true
    for (t <- 0 until 30) {
      val parts = (0 until (2 + rnd.nextInt(6))).map { _ =>
        val lo = rnd.nextInt(5000); val ln = 30 + rnd.nextInt(800)
        unionAll((lo until (lo + ln)).map(i => sk1(i.toLong)))
      }
      val real = unionAll(parts)
      if (mode(real) == 2) {
        val regsR = java.util.Arrays.copyOfRange(real, 40, 40 + K)
        val synth = synthDense(regsR)
        if (!java.util.Arrays.equals(real, synth)) {
          ok = false
          println(s"MISMATCH t=$t: real=${real.take(40).map(x => f"$x%02x").mkString} synth=${synth.take(40).map(x => f"$x%02x").mkString}")
        }
      }
    }
    println(s"dense canonical serializer byte-parity over 30 random unions: $ok")
    // 4b. coupon→register mapping check: union(SET-image, dense-image)
    // == union(my-synth-from-SET-coupons, dense-image)?
    val dense = unionAll((2000 until 2600).map(i => sk1(i.toLong)))
    val viaReal = unionAll(Seq(setImg, dense))
    val viaSynth = unionAll(Seq(synthDense(regs), dense))
    println(s"coupon→register mapping parity: ${java.util.Arrays.equals(viaReal, viaSynth)} " +
      s"estReal=${est(viaReal)} estSynth=${est(viaSynth)}")
    // 5. does a mixed union (coupon stream promoting inside the union)
    // produce flags=0 (HIP-valid) results? order matters there?
    val many = (0 until 40).map(i => sk1(i.toLong))
    val m1 = unionAll(many)
    val m2 = unionAll(new scala.util.Random(3).shuffle(many))
    println(s"pure-coupon-promotion result: flags=${m1(5) & 0xff} est=${est(m1)} " +
      s"shuffled flags=${m2(5) & 0xff} est=${est(m2)} bytesEqual=${java.util.Arrays.equals(m1, m2)}")
    val regsM = java.util.Arrays.copyOfRange(m1, 40, 40 + K)
    println(s"  composite(synth from its regs)=${est(synthDense(regsM))}")
  }
}
