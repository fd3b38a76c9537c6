package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps.h64

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata. The container has no image/audio codecs, so the *decode* step
  * is a clearly-marked deterministic stub — the Spark-side shape (schema,
  * typed Dataset, mapPartitions batching, partition-parallel decode) is the
  * real, tested part, and a codec drops into `FakeDecoder` unchanged.
  */
object Multimodal {

  // M1 — binary payload + typed metadata extraction, all in codegen'd
  // expressions (payload synthesized from text; metadata derived via md5
  // so the oracle reproduces it).
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "UTF-8")) // the opaque media column
      .withColumn("kind", when($"doc_id" % 2 === 0, "image").otherwise("audio"))
      .withColumn("byte_len", octet_length($"text").cast("long"))
      .withColumn("width", (h64($"text") % 1280 + 1).cast("long"))
      .withColumn("height", (h64($"text") % 720 + 1).cast("long"))
      .select($"doc_id", $"kind", $"byte_len", $"width", $"height")
      .orderBy($"doc_id")
  }

  // M4 — A/V segment planning: fixed-length segment boundaries per media
  // item from its duration metadata (the step that shards long audio/
  // video for transcription or embedding). Pure arithmetic over typed
  // metadata — no codec involved, so unlike the decode step this is NOT
  // a stub and carries a full oracle. Duration derives from md5 like the
  // other synthesized metadata; the generator runs in-row (sequence +
  // explode), no shuffle beyond the final presentation sort.
  def segmentPlan(s: SparkSession, dir: String, segLen: Int = 30): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("duration_s", (h64($"text") % 600 + 10).cast("long"))
      .withColumn("seg_id",
        explode(expr(s"sequence(0, (duration_s - 1) div $segLen)")))
      .select($"doc_id", $"seg_id".cast("long").as("seg_id"),
        ($"seg_id" * segLen).cast("long").as("start_s"),
        least(($"seg_id" + 1) * segLen, $"duration_s").cast("long").as("end_s"),
        $"duration_s")
      .orderBy($"doc_id", $"seg_id")
  }

  // M5 — resize planning: the aspect-preserving scale-to-shorter-side +
  // center-crop plan every vision preprocessing pipeline computes before
  // decode (resize target here: 224×224 model input). Pure INTEGER
  // arithmetic over the typed (width, height) metadata — half-up rounding
  // via (x·t + m/2) div m so both engines agree exactly; no codec, full
  // oracle. The actual pixel resample belongs inside the decode stub's
  // partition loop; THIS plan is what the scheduler/sharder needs (output
  // dims, crop boxes, scale direction) and it never touches the payload.
  def resizePlan(s: SparkSession, dir: String, target: Int = 224): DataFrame = {
    import s.implicits._
    binaryMeta(s, dir)
      .filter($"kind" === "image")
      .withColumn("m", least($"width", $"height"))
      // integer half-up rounding: (x·t + m div 2) div m — a pure-integer
      // definition both engines evaluate identically (Spark's `/` on
      // integers is a DOUBLE divide; `div` keeps it exact)
      .withColumn("rw", expr(s"(width * $target + m div 2) div m").cast("long"))
      .withColumn("rh", expr(s"(height * $target + m div 2) div m").cast("long"))
      .withColumn("crop_x", expr(s"(rw - $target) div 2").cast("long"))
      .withColumn("crop_y", expr(s"(rh - $target) div 2").cast("long"))
      .withColumn("upscaled", $"m" < target)
      .select($"doc_id", $"width", $"height", $"rw", $"rh",
        $"crop_x", $"crop_y", $"upscaled")
      .orderBy($"doc_id")
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Int, frame_md5: String)

  /** STUB decoder — stands in for an image/video codec (none in this
    * container). Deterministic: "frames" are 100-byte slices, ≤4 per doc.
    * A real decoder replaces only this function; the distributed plumbing
    * around it (typed rows, per-partition batching) stays identical. */
  private[graft] def fakeDecode(m: MediaRow): Iterator[Frame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nFrames = math.min(4, (m.payload.length + 99) / 100)
    (0 until nFrames).iterator.map { k =>
      val slice = m.payload.slice(k * 100, math.min((k + 1) * 100, m.payload.length))
      Frame(m.doc_id, k, k * 100, md.digest(slice).map("%02x".format(_)).mkString)
    }
  }

  final case class Features(doc_id: Long, n_alpha: Long, n_digit: Long,
      n_space: Long, n_other: Long)

  /** Byte-class histogram over the raw payload — REAL feature extraction
    * (the file-type-ID feature family), not a stub: it needs no codec,
    * only the bytes. Runs where a neural feature extractor would: inside
    * the per-partition decode loop, one pass over each payload. */
  private[graft] def extractFeatures(m: MediaRow): Features = {
    var a = 0L; var d = 0L; var sp = 0L; var o = 0L
    var i = 0
    while (i < m.payload.length) {
      val c = m.payload(i).toChar
      if (c.isLetter) a += 1
      else if (c.isDigit) d += 1
      else if (c == ' ') sp += 1
      else o += 1
      i += 1
    }
    Features(m.doc_id, a, d, sp, o)
  }

  // M3 — per-payload feature extraction over the binary column (oracle
  // reproduces the histogram from the source text — the corpus is ASCII,
  // so bytes ≡ chars and the comparison is exact).
  def featureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(rows => rows.map(extractFeatures))
      .toDF()
      .orderBy($"doc_id")
  }

  final case class PHashRow(doc_id: Long, content_h: String,
    ph_lo: Long, ph_hi: Long)

  /** 64-bit average-hash over a binary payload — the aHash family of
    * perceptual image fingerprints, on bytes instead of decoded pixels
    * (a real codec would feed pixel intensities through the SAME
    * function; only the decode stub changes). bit j = (mean of the bytes
    * at positions ≡ j mod 64) > (global mean), compared cross-multiplied
    * in Long so the fingerprint is pure-integer deterministic. Locality:
    * a small payload edit perturbs one bucket sum (plus the global mean
    * by δ/L), so near-identical payloads land within a few Hamming bits
    * while md5-style hashes scatter. Two non-negative 32-bit halves,
    * D3's sign-safe band convention. */
  private[graft] def aHash64(payload: Array[Byte]): (Long, Long) = {
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    val L = payload.length.toLong
    var i = 0
    while (i < payload.length) {
      val v = payload(i) & 0xff
      sums(i % 64) += v; cnts(i % 64) += 1; total += v
      i += 1
    }
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) * L > total * cnts(j)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (lo, hi)
  }

  // M6 — perceptual near-dup over the binary media column: the image-
  // dedup stage of a multimodal corpus pipeline (byte-identical re-crawls
  // PLUS lightly-edited variants — re-encodes, watermark stamps — that
  // content hashing misses). Shape: one typed pass computes (md5,
  // aHash64) per payload; exact byte-dups COLLAPSE on the content hash
  // first (the D-family discipline — clones share fingerprints and would
  // collide in every band as g² self-join rows), then the distinct
  // contents pair via D3's 4×16-bit Hamming bands and survive at
  // Hamming ≤ maxHamming. RECALL BOUND (the D3 banding pigeonhole): a
  // pair within Hamming ≤ floor(64/16)−1 = 3 is GUARANTEED to share a
  // band; pairs at Hamming 4..maxHamming are found only when their
  // differing bits happen to leave one 16-bit band untouched —
  // probabilistic, exactly like the MinHash bands (the default radius 8
  // advertises the filter threshold, not a recall guarantee beyond 3).
  // Output is rep-level pairs with copy counts —
  // linear in distinct contents, never in clone mass. Byte-loop hashing
  // has no SQL twin ⇒ rows-only; the spec pins clone collapse (identical
  // payloads → one rep, hamming 0 to nothing), planted small-edit
  // detection, and scatter for unrelated payloads.
  def phashDedup(s: SparkSession, dir: String, maxHamming: Int = 8): DataFrame =
    phashPairsOn(Tables.documents(s, dir), maxHamming, s"phash-banded:$dir")

  /** M6 core over an arbitrary (doc_id, text) frame. */
  private[graft] def phashPairsOn(docs: DataFrame, maxHamming: Int,
      cacheKey: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val media: Dataset[MediaRow] = docs
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
    val hashed = media.mapPartitions { it =>
      // one digest handle per PARTITION (the fakeDecode convention) —
      // reset per row, no per-row allocation on the corpus-sized pass
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val (lo, hi) = aHash64(m.payload)
        PHashRow(m.doc_id, md.digest(m.payload).map("%02x".format(_)).mkString,
          lo, hi)
      }
    }.toDF()
    val groups = hashed.groupBy($"content_h")
      .agg(min($"doc_id").as("rep"), count(lit(1)).as("n_copies"),
        min($"ph_lo").as("ph_lo"), min($"ph_hi").as("ph_hi"))
    val banded = graft.Caches.cached(cacheKey) { // self-joined
      groups.select($"rep", $"n_copies", $"ph_lo", $"ph_hi",
        explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("bv", expr(
          "CASE WHEN k < 2 THEN (ph_lo div shiftleft(1L, 16*k)) % 65536" +
          " ELSE (ph_hi div shiftleft(1L, 16*(k-2))) % 65536 END"))
    }
    banded.as("a")
      .join(banded.as("b"),
        $"a.k" === $"b.k" && $"a.bv" === $"b.bv" && $"a.rep" < $"b.rep")
      .select($"a.rep".as("doc_a"), $"b.rep".as("doc_b"),
        expr("bit_count(a.ph_lo ^ b.ph_lo) + bit_count(a.ph_hi ^ b.ph_hi)")
          .cast("long").as("hamming"),
        $"a.n_copies".as("n_copies_a"), $"b.n_copies".as("n_copies_b"))
      .distinct() // a pair can share several bands
      .filter($"hamming" <= maxHamming)
      .orderBy($"doc_a", $"doc_b")
  }

  // M2 — frame sampling over binary media via typed mapPartitions: the
  // decoder is instantiated once per partition (how a real codec handle
  // would be held), frames stream out without materializing a partition.
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
    media
      .mapPartitions(rows => rows.flatMap(fakeDecode))
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }
}
