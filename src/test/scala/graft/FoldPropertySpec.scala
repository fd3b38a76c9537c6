package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.{CacheSync, OrderFold}
import graft.streaming.CacheSync.CacheEvent
import graft.streaming.OrderFold.{StatusEvent, StockRequest}

/** Property-based invariants for the transactional folds: the distributed
  * Dataset folds must equal independent plain-Scala replays of the same
  * log, for ANY randomized log — not just the fixtures. */
class FoldPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private val orderLogGen: Gen[List[StockRequest]] = for {
    n <- Gen.choose(1, 60)
    stocks <- Gen.listOfN(3, Gen.choose(10, 60))
    reqs <- Gen.listOfN(n, for {
      pk <- Gen.choose(0, 2)
      qty <- Gen.choose(1, 20)
    } yield (pk, qty))
  } yield reqs.zipWithIndex.map { case ((pk, qty), i) =>
    StockRequest(pk.toLong, i.toLong, 1, qty.toDouble, stocks(pk).toDouble)
  }

  test("place_order fold equals a plain-Scala replay; stock never oversold (random logs)") {
    val s = spark
    import s.implicits._
    samples(orderLogGen, 5).foreach { log =>
      val got = OrderFold.decisionsOf(log.toDS()).collect()
        .sortBy(d => (d.part, d.okey))
      // independent replay
      val want = log.groupBy(_.pk).toSeq.flatMap { case (pk, rs) =>
        var avail = rs.head.stock
        rs.sortBy(_.okey).map { r =>
          val acc = r.qty <= avail
          if (acc) avail -= r.qty
          (pk, r.okey, acc, avail)
        }
      }.sortBy(t => (t._1, t._2))
      assert(got.map(d => (d.part, d.okey, d.accepted, d.stock_after)).toSeq == want)
      // conservation: per part, accepted quantity never exceeds stock
      got.groupBy(_.part).foreach { case (pk, ds) =>
        val stock = log.find(_.pk == pk).get.stock
        val accQty = ds.filter(_.accepted).map(_.qty).sum
        assert(accQty <= stock + 1e-9)
        assert(ds.map(_.stock_after).min >= -1e-9)
      }
    }
  }

  private val statusLogGen: Gen[List[StatusEvent]] = for {
    n <- Gen.choose(1, 30)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 4L)
      st <- Gen.oneOf("O", "P", "F", "C")
    } yield (id, st))
  } yield evs.zipWithIndex.map { case ((id, st), i) => StatusEvent(id, st, i.toLong) }

  test("status fold equals a plain-Scala replay; terminal states absorb (random logs)") {
    val s = spark
    import s.implicits._
    samples(statusLogGen, 5).foreach { log =>
      val got = OrderFold.statusSnapshot(log.toDS()).collect()
        .map(st => st.order_id -> st).toMap
      log.groupBy(_.order_id).foreach { case (id, evs) =>
        var cur = "O"; var app = 0L; var rej = 0L
        evs.sortBy(_.seq).foreach { e =>
          if (cur == "O" || cur == "P") { cur = e.to_status; app += 1 } else rej += 1
        }
        assert(got(id).status == cur && got(id).n_applied == app && got(id).n_rejected == rej)
        // absorption: everything after the first terminal transition is rejected
        assert(got(id).n_applied + got(id).n_rejected == evs.length)
      }
    }
  }

  test("sequence packing equals a plain-Scala greedy fold (random token lists)") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing.{PackDoc, PackedDoc}
    val packGen: Gen[List[PackDoc]] = for {
      n <- Gen.choose(1, 50)
      docs <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "de")
        tok <- Gen.choose(1L, 120L) // some docs alone exceed the budget of 100
      } yield (lang, tok))
    } yield docs.zipWithIndex.map { case ((l, t), i) => PackDoc(l, i % 2, i.toLong, t) }
    samples(packGen, 5).foreach { docs =>
      // reference replay
      val want = docs.groupBy(d => (d.lang, d.shard)).toSeq.flatMap { case (_, ds) =>
        var bin = 1L; var fill = 0L
        ds.sortBy(_.doc_id).map { d =>
          if (fill > 0 && fill + d.tokens > 100L) { bin += 1; fill = 0L }
          fill += d.tokens
          PackedDoc(d.lang, d.shard, d.doc_id, d.tokens, bin, fill)
        }
      }.sortBy(p => (p.lang, p.shard, p.doc_id))
      val packed = graft.operators.Packing.packDocs(docs.toDS(), budget = 100L)
        .collect().sortBy(p => (p.lang, p.shard, p.doc_id)).toSeq
      assert(packed == want)
      // invariant: nothing under-packed — consecutive bins imply the
      // previous bin could not fit the first doc of the next
      packed.groupBy(p => (p.lang, p.shard)).values.foreach { ps =>
        val byBin = ps.groupBy(_.bin_id).toSeq.sortBy(_._1)
        byBin.sliding(2).foreach {
          case Seq((_, prev), (_, next)) =>
            assert(prev.map(_.tokens).sum + next.minBy(_.doc_id).tokens > 100L)
          case _ =>
        }
      }
    }
  }

  test("best-fit packing equals a plain-Scala BFD fold, valid bins, beats greedy on the corpus") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    import graft.operators.Packing.{PackDoc, PackedDoc}
    val packGen: Gen[List[PackDoc]] = for {
      n <- Gen.choose(1, 50)
      docs <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "de")
        tok <- Gen.choose(1L, 120L)
      } yield (lang, tok))
    } yield docs.zipWithIndex.map { case ((l, t), i) => PackDoc(l, i % 2, i.toLong, t) }
    samples(packGen, 5).foreach { docs =>
      // reference replay: size-desc, best-fit = fullest bin that fits
      val want = docs.groupBy(d => (d.lang, d.shard)).toSeq.flatMap { case (_, ds) =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.sortBy(d => (-d.tokens, d.doc_id)).map { d =>
          val fit = fills.zipWithIndex.filter(_._1 + d.tokens <= 100L)
          val best = if (fit.isEmpty) { fills += 0L; fills.length - 1 }
                     else fit.maxBy(f => (f._1, -f._2))._2
          fills(best) += d.tokens
          PackedDoc(d.lang, d.shard, d.doc_id, d.tokens, best + 1L, fills(best))
        }
      }.sortBy(p => (p.lang, p.shard, p.doc_id))
      val packed = Packing.packDocsBestFit(docs.toDS(), budget = 100L)
        .collect().sortBy(p => (p.lang, p.shard, p.doc_id)).toSeq
      assert(packed == want)
      // validity: no bin over budget unless it is a single over-budget doc
      packed.groupBy(p => (p.lang, p.shard, p.bin_id)).values.foreach { bs =>
        val tot = bs.map(_.tokens).sum
        assert(tot <= 100L || bs.length == 1, s"overfull bin: $bs")
      }
    }
    // on the fixed corpus, BFD never needs more bins than arrival greedy
    import org.apache.spark.sql.functions.{max, sum}
    def bins(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"lang", $"shard").agg(max($"bin_id").as("b"))
      .agg(sum($"b")).head.getLong(0)
    val g = bins(Packing.packTokens(spark, sfDir))
    val b = bins(Packing.packTokensBestFit(spark, sfDir))
    assert(b <= g, s"BFD used $b bins vs greedy $g")
  }

  private val cacheLogGen: Gen[List[CacheEvent]] = for {
    n <- Gen.choose(1, 30)
    evs <- Gen.listOfN(n, for {
      key <- Gen.oneOf("a", "b", "c")
      op <- Gen.frequency(6 -> Gen.const("put"), 2 -> Gen.const("evict"), 1 -> Gen.const("clear"))
    } yield (key, op))
  } yield evs.zipWithIndex.map { case ((k, op), i) =>
    CacheEvent(if (op == "clear") "" else k, s"r$i", i.toLong, op)
  }

  test("cache fold: live set equals a plain-Scala replay with global clears (random logs)") {
    val s = spark
    import s.implicits._
    samples(cacheLogGen, 5).foreach { log =>
      val live = CacheSync.liveSnapshot(log.toDF())
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      var ref = Map.empty[String, String]
      log.sortBy(_.seq).foreach { e =>
        e.op match {
          case "put"   => ref += (e.key -> e.response)
          case "evict" => ref -= e.key
          case "clear" => ref = Map.empty
        }
      }
      assert(live == ref, s"log=$log")
    }
  }
}
