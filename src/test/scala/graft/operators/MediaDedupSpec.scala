package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The image-dedup laws: the hash is an exact integer function of the
  * decoded pixels (8×8 inputs hash with no pooling loss; larger inputs
  * pool by block average first), and the 4-block banded join is lossless
  * at Hamming ≤ 3 by pigeonhole — measured against brute force.
  */
class MediaDedupSpec extends SparkSpec {

  private def png(rows: Seq[(Long, Seq[Double])], side: Int) = {
    val s = spark
    import s.implicits._
    Multimodal.asMedia(
      Multimodal.encodePng(rows.toDF("id", "pixels"), "id", "pixels",
        side = side), "media_id", "media")
  }

  test("averageHash on an 8x8 image is the exact bit rule " +
      "64*p > sum(p), packed MSB-first into 16-bit blocks") {
    // 32 dark pixels (10) then 32 bright ones (200): mean 105, so the
    // hash is 0x0000 0000 FFFF FFFF and n_ones = 32
    val px = Seq.fill(32)(10.0) ++ Seq.fill(32)(200.0)
    val h = MediaDedup.averageHash(png(Seq((1L, px)), side = 8)).head()
    assert(h.getAs[Long]("b0") === 0L)
    assert(h.getAs[Long]("b1") === 0L)
    assert(h.getAs[Long]("b2") === 0xffffL)
    assert(h.getAs[Long]("b3") === 0xffffL)
    assert(h.getAs[Int]("n_ones") === 32)
  }

  test("a single pixel strictly above the mean sets exactly its " +
      "row-major MSB-first bit") {
    // pixel 17 (row 2, col 1) bright, rest uniform: bit 17 lives in
    // block 1 at in-block position 1 → b1 = 1 << (15 - 1)
    val px = Seq.tabulate(64)(i => if (i == 17) 255.0 else 100.0)
    val h = MediaDedup.averageHash(png(Seq((1L, px)), side = 8)).head()
    assert(h.getAs[Long]("b0") === 0L)
    assert(h.getAs[Long]("b1") === (1L << 14))
    assert(h.getAs[Long]("b2") === 0L)
    assert(h.getAs[Long]("b3") === 0L)
    assert(h.getAs[Int]("n_ones") === 1)
  }

  test("larger images pool by exact block average before hashing: a " +
      "16x16 image of 2x2-constant blocks hashes like its 8x8 core") {
    // expand an 8×8 base image 2× in each direction
    val base = Seq.tabulate(64)(i => ((i * 37) % 23) * 11.0)
    val big = Seq.tabulate(256) { i =>
      val y = i / 16; val x = i % 16
      base((y / 2) * 8 + (x / 2))
    }
    // encodePng takes one side per call, so encode the two separately
    val hBig = MediaDedup.averageHash(png(Seq((2L, big)), side = 16))
      .head()
    val hBase = MediaDedup.averageHash(png(Seq((1L, base)), side = 8))
      .head()
    Seq("b0", "b1", "b2", "b3").foreach { c =>
      assert(hBase.getAs[Long](c) === hBig.getAs[Long](c), c)
    }
  }

  test("undecodable bytes are dropped, not hashed") {
    val s = spark
    import s.implicits._
    val junk = Seq((9L, Array[Byte](1, 2, 3), "application/octet-stream"))
      .toDF("media_id", "media", "format")
    assert(MediaDedup.averageHash(junk).count() === 0)
  }

  test("nearDupPairs at maxHamming 3 is lossless vs brute force " +
      "(pigeonhole over 4 blocks) and never misreports a distance") {
    // 40 images: 20 bases + near copies at controlled bit distances
    val rnd = new scala.util.Random(7)
    val bases = Seq.tabulate(20) { k =>
      (k.toLong, Seq.fill(64)(rnd.nextInt(256).toDouble))
    }
    val copies = bases.collect { case (id, px) if id % 2 == 0 =>
      // push a few pixels to the extremes to flip a handful of bits
      (id + 100L, px.zipWithIndex.map { case (p, i) =>
        if (i % 16 == 3 && id % 4 == 0) 255.0 else p
      })
    }
    val media = png(bases ++ copies, side = 8)
    val hashes = MediaDedup.averageHash(media).cache()
    val got = MediaDedup.nearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected hashes
    val hs = hashes.collect().map { r =>
      (r.getAs[Long]("media_id"),
        Seq("b0", "b1", "b2", "b3").map(r.getAs[Long](_)))
    }
    val brute = (for {
      (ia, ba) <- hs; (ib, bb) <- hs if ia < ib
      d = ba.zip(bb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got === brute)
    assert(brute.nonEmpty) // the fixture does contain close pairs
    hashes.unpersist()
  }

  test("audioHash: energy bits land in b0/b1 and zero-crossing bits " +
      "in b2/b3 with the averageHash MSB-first layout; an identical " +
      "asset hashes identically and a quiet-frame flip moves one bit") {
    val s = spark
    import s.implicits._
    // 32 frames: frame 0 loud (energy above mean), others quiet; all
    // frames alternate sign except frame 1 (constant positive) so
    // frame 1's zc sits below the zc mean
    def samples(loudAmp: Int): Seq[Long] = (0 until 64).map { i =>
      val f = i / 2
      val amp = if (f == 0) loudAmp else 100
      val v = if (f == 1) amp.toLong
        else if (i % 2 == 0) amp.toLong else -amp.toLong
      v
    }
    val df = Seq((1L, samples(30000)), (2L, samples(30000)),
      (3L, samples(29000))).toDF("vec_id", "samples")
    val wav = Multimodal.encodeWavPcm16(df, "vec_id", "samples")
    val h = MediaDedup.audioHash(
        Multimodal.audioFrameFeatures(wav, frameLen = 2))
      .collect().map(r => r.getLong(0) -> r).toMap
    // frame 0's energy dominates the mean -> ONLY bit 0 of the energy
    // half is set: b0 = 1000...0b = 0x8000, b1 = 0
    assert(h(1L).getAs[Long]("b0") === 0x8000L)
    assert(h(1L).getAs[Long]("b1") === 0L)
    // zc channel: every frame crosses once except frame 1 (zc 0) and
    // frame 0 shares the common value -> no frame sits ABOVE the mean
    // only if all equal; here frames with zc=1 are above the mean
    // (mean < 1 because frame 1 drags it down) -> bits for all frames
    // except 1 set: b2 = 1011111111111111b, b3 = all 16
    assert(h(1L).getAs[Long]("b2") === 0xBFFFL)
    assert(h(1L).getAs[Long]("b3") === 0xFFFFL)
    // identical asset -> identical hash; near-identical -> hamming 0
    // here (the louder frame is still the only above-mean one)
    assert(h(1L).toSeq.drop(1) === h(2L).toSeq.drop(1))
    val pairs = MediaDedup.nearDupPairs(
        MediaDedup.audioHash(
          Multimodal.audioFrameFeatures(wav, frameLen = 2)),
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("audioHash keys bits on frame_idx itself: a gap in the frame " +
      "set leaves a 0-bit at the missing position instead of shifting " +
      "every later frame's bit") {
    val s = spark
    import s.implicits._
    // media 1: contiguous frames 0..3; media 2: frame 1 pre-filtered
    // away. Bits must land at the frame's OWN index — for media 2
    // that is {0, 2} (e·nf > te: 10·3 > 20 at i=0 and i=2), i.e.
    // 0xA000, NOT the position-shifted 0xC000 a list-indexed fold
    // would produce.
    val frames = Seq(
      (1L, 0, 10L, 1L), (1L, 1, 0L, 0L), (1L, 2, 10L, 1L),
      (1L, 3, 0L, 0L),
      (2L, 0, 10L, 1L), (2L, 2, 10L, 1L), (2L, 3, 0L, 0L))
      .toDF("media_id", "frame_idx", "energy", "zero_crossings")
    val h = MediaDedup.audioHash(frames)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(h(1L).getAs[Long]("b0") === 0xA000L)
    assert(h(2L).getAs[Long]("b0") === 0xA000L)
    assert(h(2L).getAs[Long]("b2") === 0xA000L)
    assert(h(2L).getAs[Long]("b1") === 0L)
  }

  test("differenceHash: constant image hashes to 0 (strict gradient), " +
      "a row ramp sets every non-wrap bit, and the wrap bit compares " +
      "last column to first") {
    val flat = Seq.fill(64)(100.0)
    val hf = MediaDedup.differenceHash(png(Seq((1L, flat)), side = 8))
      .head()
    assert(Seq("b0", "b1", "b2", "b3")
      .forall(c => hf.getAs[Long](c) === 0L))
    assert(hf.getAs[Int]("n_ones") === 0)
    // each row 10,20,...,80: cells 0..6 darker than their right
    // neighbor (bits set); col 7 wraps to col 0 (80 > 10 — not set)
    val ramp = Seq.tabulate(64)(i => (i % 8 + 1) * 10.0)
    val hr = MediaDedup.differenceHash(png(Seq((2L, ramp)), side = 8))
      .head()
    assert(hr.getAs[Int]("n_ones") === 56)
    // block 0 = rows 0-1: per row bits 0..6 set, bit 7 clear →
    // 0xFEFE; all four blocks identical by row periodicity
    assert(Seq("b0", "b1", "b2", "b3")
      .forall(c => hr.getAs[Long](c) === 0xFEFEL))
  }

  test("perceptualHash: deterministic across runs and partitioning, " +
      "DC bit never set, pooling matches the 8x8 core") {
    // NOTE: a constant image's AC coefficients are cancellation-
    // dominated fold residue (~level·1e-15) — deterministic (the
    // oracle replays the identical fold) but NOT scale-invariant,
    // so no constant-image bit pattern is asserted here
    val img = Seq.tabulate(64)(i => ((i * 13) % 31) * 8.0)
    val h1 = MediaDedup.perceptualHash(
      png(Seq((1L, img)), side = 8)).head()
    val h2 = MediaDedup.perceptualHash(
      png(Seq((1L, img), (2L, img.reverse)), side = 8)
        .repartition(3)).collect()
      .find(_.getLong(0) == 1L).get
    Seq("b0", "b1", "b2", "b3").foreach { c =>
      assert(h1.getAs[Long](c) === h2.getAs[Long](c), c)
    }
    assert(h1.getAs[Int]("n_ones") > 0 && h1.getAs[Int]("n_ones") <= 63)
    val base = Seq.tabulate(64)(i => ((i * 37) % 23) * 11.0)
    val big = Seq.tabulate(256) { i =>
      val y = i / 16; val x = i % 16
      base((y / 2) * 8 + (x / 2))
    }
    val hBig = MediaDedup.perceptualHash(png(Seq((2L, big)), side = 16))
      .head()
    val hBase = MediaDedup.perceptualHash(png(Seq((1L, base)), side = 8))
      .head()
    Seq("b0", "b1", "b2", "b3").foreach { c =>
      assert(hBig.getAs[Long](c) === hBase.getAs[Long](c), c)
    }
    // the DC position (bit 0 of b0, MSB) is never set
    assert((hBase.getAs[Long]("b0") & (1L << 15)) === 0L)
    assert(hBase.getAs[Int]("n_ones") > 0)
  }

  test("differenceHash is brightness-shift invariant where " +
      "averageHash is not") {
    val base = Seq.tabulate(64)(i => ((i * 29) % 17) * 10.0 + 30.0)
    // uniform +40 brightness: gradients unchanged, means shift
    val brighter = base.map(p => math.min(p + 40.0, 255.0))
    val m = png(Seq((1L, base), (2L, brighter)), side = 8)
    val d = MediaDedup.differenceHash(m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(d(1L) === d(2L))
    // dHash near-dup finds the pair at Hamming 0
    val pairs = MediaDedup.nearDupPairs(MediaDedup.differenceHash(m), 0)
      .collect()
    assert(pairs.length === 1 &&
      pairs.head.getAs[Int]("hamming") === 0)
  }

  test("decode-once parity: every *FromCells hash over pooledGrids " +
      "is row-for-row identical to its byte-decoding form, and " +
      "undecodable rows drop at the pooling stage") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(12)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(256).toDouble)))
    val m = png(rows, side = 8)
    val cells = MediaDedup.pooledGrids(m)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("media_id").collect().toSeq
    assert(sorted(MediaDedup.averageHashFromCells(cells)) ===
      sorted(MediaDedup.averageHash(m)))
    assert(sorted(MediaDedup.differenceHashFromCells(cells)) ===
      sorted(MediaDedup.differenceHash(m)))
    assert(sorted(MediaDedup.perceptualHashFromCells(cells)) ===
      sorted(MediaDedup.perceptualHash(m)))
    // a corrupt-media row never reaches the grid
    val s = spark
    import s.implicits._
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "media")
    assert(MediaDedup.pooledGrids(bad).count() === 0L)
  }

  test("keep-sharpest election (the q388 rule): the higher-variance-" +
      "of-Laplacian side wins, identical images tie to min id") {
    import org.apache.spark.sql.functions._
    // sharp: a checkerboard-ish raster; soft: a constant
    val sharp = (0 until 64).map(i =>
      if ((i % 8 + i / 8) % 2 == 0) 200.0 else 40.0)
    val flat = Seq.fill(64)(120.0)
    val m = png(Seq((1L, flat), (2L, sharp), (3L, flat)), side = 8)
    val qs = Multimodal.imageQualityStats(m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(qs(2L) > qs(1L), s"sharpness: $qs")
    assert(qs(1L) === qs(3L))
    // election over explicit pairs (the q388 projection)
    val pairs = Seq((1L, 2L), (1L, 3L))
    val elected = pairs.map { case (a, b) =>
      val (sa, sb) = (qs(a), qs(b))
      if (sa > sb) a else if (sb > sa) b else math.min(a, b)
    }
    assert(elected === Seq(2L, 1L))
  }

  test("crossNearDupBest: best match by (hamming, corpus id), radius " +
      "respected, clean probes absent, and probe ids never match " +
      "each other") {
    val s = spark
    import s.implicits._
    // hand-built hash frames (the operator consumes hash rows — no
    // codec needed): corpus 10 = (1,2,3,4); 11 and 12 tie one bit
    // away from probe 3
    val corpus = Seq(
      (10L, 1L, 2L, 3L, 4L),
      (11L, 1L, 2L, 3L, 12L),
      (12L, 1L, 2L, 3L, 12L),
      (13L, 1L, 2L, 3L, 1L << 15)
    ).toDF("media_id", "b0", "b1", "b2", "b3")
    val probe = Seq(
      (1L, 1L, 2L, 3L, 4L),        // exact copy of 10 -> hamming 0
      (2L, 1L, 2L, 3L, 8L),        // 1 bit from 11/12, 2 bits from 10
      (3L, 1L, 2L, 3L, 12L),       // exact copy of 11 AND 12 -> tie
      (4L, 99L, 98L, 97L, 96L)     // far from everything -> clean
    ).toDF("media_id", "b0", "b1", "b2", "b3")
    val out = MediaDedup.crossNearDupBest(probe, corpus, maxHamming = 3)
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("match_id"), r.getAs[Int]("hamming"))).toMap
    assert(out(1L) === ((10L, 0)))
    // probe 2: hamming 1 to 11 and 12 beats hamming 2 to 10; the
    // (hamming, id) min takes the smaller corpus id
    assert(out(2L) === ((11L, 1)))
    // exact tie on hamming 0 -> smaller corpus id
    assert(out(3L) === ((11L, 0)))
    // clean probe emits nothing
    assert(!out.contains(4L))
    // probes never pair with probes (cross form, not self-join)
    assert(out.keySet === Set(1L, 2L, 3L))
  }
}
