package graft

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory

/** r18 probe #4: why did union(SET-image, dense) differ from
  * union(synth-from-SET-coupons, dense)? Diff the registers. */
object ProbeHll4 {
  private val LgK = 8
  private val K = 1 << LgK

  private def sk1(x: Long): Array[Byte] = {
    val sk = new HllSketch(LgK, TgtHllType.HLL_8)
    sk.update(x); sk.toUpdatableByteArray
  }
  private def unionAll(sks: Seq[Array[Byte]]): Array[Byte] = {
    val u = new Union(LgK)
    sks.foreach(b => u.update(HllSketch.heapify(Memory.wrap(b))))
    u.getResult(TgtHllType.HLL_8).toUpdatableByteArray
  }

  def main(args: Array[String]): Unit = {
    val items = (0 until 20).map(i => 31L * i + 5)
    val setImg = unionAll(items.map(sk1))
    println(s"setImg mode=${setImg(7) & 3} len=${setImg.length} count(byte6)=${setImg(6) & 0xff}")
    val bb = java.nio.ByteBuffer.wrap(setImg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    println(s"count@8=${bb.getInt(8)}")
    // parse coupons from table
    val coupons = (12 until setImg.length by 4).map(bb.getInt).filter(_ != 0)
    println(s"parsed ${coupons.length} coupons: " +
      coupons.map(c => s"(slot=${c & (K - 1)},v=${c >>> 26})").mkString(" "))
    // expected coupons: from the 20 single-item images directly
    val direct = items.map(x => java.nio.ByteBuffer.wrap(sk1(x))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(8))
    println(s"direct coupons:     " +
      direct.sorted.map(c => s"(slot=${c & (K - 1)},v=${c >>> 26})").mkString(" "))
    println(s"coupon sets equal: ${coupons.sorted == direct.sorted.toIndexedSeq}")
    val dense = unionAll((2000 until 2600).map(i => sk1(i.toLong)))
    val viaReal = unionAll(Seq(setImg, dense))
    val regsFromCoupons = new Array[Byte](K)
    coupons.foreach { c =>
      val s = c & (K - 1); val v = c >>> 26
      if (v > (regsFromCoupons(s) & 0xff)) regsFromCoupons(s) = v.toByte
    }
    val denseRegs = java.util.Arrays.copyOfRange(dense, 40, 40 + K)
    val maxRegs = new Array[Byte](K)
    (0 until K).foreach(i => maxRegs(i) =
      math.max(regsFromCoupons(i) & 0xff, denseRegs(i) & 0xff).toByte)
    val realRegs = java.util.Arrays.copyOfRange(viaReal, 40, 40 + K)
    val diffs = (0 until K).filter(i => realRegs(i) != maxRegs(i))
    println(s"register diffs real-vs-mymax: " +
      diffs.map(i => s"slot=$i real=${realRegs(i) & 0xff} mine=${maxRegs(i) & 0xff}").mkString(" "))
    println(s"viaReal flags=${viaReal(5) & 0xff} hip=${java.nio.ByteBuffer.wrap(viaReal).order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble(8)}")
  }
}
