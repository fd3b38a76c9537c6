package graft

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory

/** r18 probe #3: reverse the coupon-int → (slot, value) mapping used
  * when datasketches promotes coupons into an lgK=8 HLL_8 register
  * array. Isolate one item's register by diffing dense unions with and
  * without it. */
object ProbeHll3 {
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

  def main(args: Array[String]): Unit = {
    val filler = (100000 until 100040).map(i => sk1(i.toLong))
    val base = unionAll(filler)
    require((base(7) & 3) == 2)
    val baseRegs = java.util.Arrays.copyOfRange(base, 40, 40 + K)
    for (x <- Seq(1L, 2L, 3L, 17L, 999L, 123456L)) {
      val c = java.nio.ByteBuffer.wrap(sk1(x)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(8)
      val withX = unionAll(filler :+ sk1(x))
      val regs = java.util.Arrays.copyOfRange(withX, 40, 40 + K)
      val diffs = (0 until K).filter(i => regs(i) != baseRegs(i))
      val ds = diffs.map(i => s"slot=$i newVal=${regs(i) & 0xff} oldVal=${baseRegs(i) & 0xff}")
      println(f"x=$x%-8d coupon=0x$c%08x low26=0x${c & ((1 << 26) - 1)}%07x " +
        s"c>>>26=${c >>> 26} c&255=${c & 255} (c&0x3ffffff)&255=${(c & 0x3ffffff) & 255} diffs=$ds")
    }
  }
}
