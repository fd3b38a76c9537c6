package graft

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory

/** Diagnostic probe (r18 optimization round): pin down the exact
  * datasketches-java union semantics the g_reach_profile /
  * g_harmonic_all loop depends on, before replacing the per-row
  * heapify+merge in `hll_union_agg` with a register-max kernel.
  *
  * Questions this answers empirically (datasketches-java 6.2.0,
  * lgK = 8, HLL_8 — the loop's exact configuration):
  *  1. mode lifecycle: at what cardinality does a sketch serialize as
  *     LIST / SET / HLL, and what do the images look like?
  *  2. order-independence: is Union.getResult(HLL_8).toUpdatableByteArray
  *     bit-identical when the same set of sketches is unioned in a
  *     different order / grouping (the partial-aggregation tree Spark
  *     actually builds varies by partitioning)?
  *  3. estimate regime: does getEstimate on the union result match a
  *     composite (register-only) estimate, i.e. is HIP abandoned?
  *  4. microbench: per-merge cost of heapify+union vs a raw
  *     register-max over the serialized HLL_8 image.
  */
object ProbeHll {
  private val LgK = 8

  private def sketchOf(items: Range): HllSketch = {
    val sk = new HllSketch(LgK, TgtHllType.HLL_8)
    items.foreach(i => sk.update(i.toLong))
    sk
  }

  private def bytes(sk: HllSketch): Array[Byte] = sk.toUpdatableByteArray

  private def unionAll(sks: Seq[Array[Byte]]): Array[Byte] = {
    val u = new Union(LgK)
    sks.foreach(b => u.update(HllSketch.heapify(Memory.wrap(b))))
    u.getResult(TgtHllType.HLL_8).toUpdatableByteArray
  }

  private def hex(b: Array[Byte], n: Int = 48): String =
    b.take(n).map(x => f"$x%02x").mkString("")

  def main(args: Array[String]): Unit = {
    // 1. mode lifecycle
    for (n <- Seq(1, 4, 8, 9, 16, 64, 65, 128, 192, 256, 512, 2000)) {
      val sk = sketchOf(0 until n)
      val b = bytes(sk)
      println(s"n=$n len=${b.length} curMode=${b(7) & 3} est=${sk.getEstimate} " +
        s"hdr=${hex(b, 40)}")
    }
    // 2. order-independence of the union result
    val rnd = new scala.util.Random(7)
    val parts: Seq[Array[Byte]] = (0 until 40).map { i =>
      val lo = rnd.nextInt(3000); val ln = 1 + rnd.nextInt(400)
      bytes(sketchOf(lo until (lo + ln)))
    }
    val r1 = unionAll(parts)
    val r2 = unionAll(rnd.shuffle(parts))
    // grouped like a partial-agg tree: union of unions
    val mid = parts.grouped(7).map(unionAll).toSeq
    val r3 = unionAll(mid)
    println(s"order-independent flat-vs-shuffled: ${java.util.Arrays.equals(r1, r2)}")
    println(s"order-independent flat-vs-tree:     ${java.util.Arrays.equals(r1, r3)}")
    println(s"r1 len=${r1.length} hdr=${hex(r1)}")
    println(s"r3 len=${r3.length} hdr=${hex(r3)}")
    val e1 = HllSketch.heapify(Memory.wrap(r1)).getEstimate
    val e3 = HllSketch.heapify(Memory.wrap(r3)).getEstimate
    println(s"est r1=$e1 r3=$e3")
    // 2b. small unions (coupon regime): order-independence there too
    val small: Seq[Array[Byte]] = (0 until 6).map(i => bytes(sketchOf(i * 3 until (i * 3 + 2))))
    val s1 = unionAll(small)
    val s2 = unionAll(rnd.shuffle(small))
    val s3 = unionAll(small.grouped(2).map(unionAll).toSeq)
    println(s"small flat-vs-shuffled: ${java.util.Arrays.equals(s1, s2)} " +
      s"flat-vs-tree: ${java.util.Arrays.equals(s1, s3)}")
    println(s"s1 len=${s1.length} mode=${s1(7) & 3} " +
      s"est=${HllSketch.heapify(Memory.wrap(s1)).getEstimate}")
    // 2c. does a single-sketch union round-trip to the same bytes?
    for (n <- Seq(1, 5, 40, 100, 500)) {
      val b = bytes(sketchOf(0 until n))
      val u = unionAll(Seq(b))
      println(s"single-roundtrip n=$n identical=${java.util.Arrays.equals(b, u)} " +
        s"inLen=${b.length} outLen=${u.length} inEst=${HllSketch.heapify(Memory.wrap(b)).getEstimate} " +
        s"outEst=${HllSketch.heapify(Memory.wrap(u)).getEstimate}")
    }
    // 3. HIP vs composite on the dense union result: compare getEstimate
    // against a fresh sketch REBUILT from just the registers via unions
    // (prints enough to see which regime the number lands in)
    val dense = unionAll(Seq(bytes(sketchOf(0 until 1500)), bytes(sketchOf(1000 until 2500))))
    val dsk = HllSketch.heapify(Memory.wrap(dense))
    println(s"dense union est=${dsk.getEstimate} comp=${dsk.getCompositeEstimate} " +
      s"len=${dense.length} hdrFlags=${dense(5) & 0xff}")
    val one = HllSketch.heapify(Memory.wrap(bytes(sketchOf(0 until 2500))))
    println(s"stream sketch est=${one.getEstimate} comp=${one.getCompositeEstimate} " +
      s"hdrFlags=${bytes(sketchOf(0 until 2500))(5) & 0xff}")
    // 4. microbench: heapify+union per merge vs register-max over HLL_8 image
    val denseParts = (0 until 64).map(i => bytes(sketchOf(i * 50 until (i * 50 + 600))))
    val reps = 20000
    var t0 = System.nanoTime()
    var u = new Union(LgK)
    var i = 0
    while (i < reps) {
      u.update(HllSketch.heapify(Memory.wrap(denseParts(i % 64))))
      if (i % 4096 == 0) u = new Union(LgK) // bound gadget growth effects
      i += 1
    }
    val heapifyNs = (System.nanoTime() - t0) / reps
    // wrap instead of heapify (no copy)
    t0 = System.nanoTime()
    u = new Union(LgK)
    i = 0
    while (i < reps) {
      u.update(HllSketch.wrap(Memory.wrap(denseParts(i % 64))))
      if (i % 4096 == 0) u = new Union(LgK)
      i += 1
    }
    val wrapNs = (System.nanoTime() - t0) / reps
    t0 = System.nanoTime()
    val regs = new Array[Byte](1 << LgK)
    i = 0
    while (i < reps) {
      val b = denseParts(i % 64)
      var j = 0
      while (j < 256) {
        val v = b(40 + j)
        if (v > regs(j)) regs(j) = v
        j += 1
      }
      i += 1
    }
    val regNs = (System.nanoTime() - t0) / reps
    println(s"per-merge ns: heapify+union=$heapifyNs wrap+union=$wrapNs regmax=$regNs")
  }
}
