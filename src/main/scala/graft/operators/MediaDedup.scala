package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection for IMAGE columns — the multimodal member of
  * the dedup family ([[Dedup.simhashNearDupPairs]] for text, [[Similarity]]
  * for embeddings): a 64-bit average-hash per image computed from the REAL
  * decoded raster (`javax.imageio`, the [[Multimodal.ImageIoCodec]]
  * convention), then the Manku-style block-banded equi-join for pairs
  * within a Hamming radius.
  *
  * Everything is integer arithmetic on decoded samples, so when the image
  * bytes are themselves a deterministic function of table data (the q228
  * lossless-PNG device) the whole decode→hash→join path replays in pure
  * SQL and gates bit-exactly.
  *
  * Scale shape: hashing is one `mapPartitions` pass (decode cost, no
  * shuffle); the pair search is 4 bucket rows per image and an equi-join
  * on `(block_idx, block_value)` — never all-pairs. With 4 blocks of 16
  * bits, any pair at Hamming ≤ 3 shares a block BY PIGEONHOLE, so recall
  * at `maxHamming ≤ 3` is exactly 1 (the [[Dedup.simhashNearDupPairs]]
  * `nTables` law, fixed at the 64-bit/4-block point that suits aHash).
  */
object MediaDedup {

  private val hashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("b0", LongType),
    StructField("b1", LongType),
    StructField("b2", LongType),
    StructField("b3", LongType),
    StructField("n_ones", IntegerType)))

  /** 64-bit average hash (aHash) of each image, emitted as four 16-bit
    * blocks `b0..b3` (row-major bit order, MSB-first inside a block —
    * block `j` covers grid cells `16j .. 16j+15`) plus the popcount.
    *
    * Decode is real ImageIO; the raster pools onto an 8×8 grid by exact
    * integer block sums (the [[Multimodal.resizeImages]] pooling), and
    * cell bit `i` is `cell_mean > image_mean` decided by cross-multiplied
    * integer comparison — `cell_sum * total_cnt > total_sum * cell_cnt` —
    * so no float ever enters the hash and an 8×8 grayscale input hashes
    * as a pure integer function of its pixels. Rows whose bytes don't
    * decode are DROPPED (the resize convention; [[Multimodal
    * .decodeImageMeta]] is where undecodables surface).
    */
  def averageHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(hashSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          hashBytes(r.getAs[Array[Byte]](1)).map { case (blocks, ones) =>
            Row(r.getLong(0), blocks(0), blocks(1), blocks(2),
              blocks(3), ones)
          }
        }
      }(enc)
  }

  /** The shared decode + 8×8 integer pooling stage: per grid cell the
    * exact sample sum and sample count, `None` when the bytes don't
    * decode. Both hash rules ([[hashBytes]]'s cell-vs-image mean,
    * [[dHashBytes]]'s cell-vs-right-neighbor gradient) read these
    * pools, so the decode cost is written once.
    */
  private[graft] def poolCells(bytes: Array[Byte])
      : Option[(Array[Long], Array[Long])] = {
    val side = 8
    // Multimodal.ImageBytes: the one decode entry point (disables
    // ImageIO's per-call temp-FILE stream cache once per JVM — see
    // its scaladoc for the measured 7-16x, variance-heavy cost)
    val img = Multimodal.ImageBytes.decode(bytes)
    if (img == null) None
    else {
      val raster = img.getRaster
      val bands = raster.getNumBands
      val w = img.getWidth; val h = img.getHeight
      val cellSum = new Array[Long](side * side)
      val cellCnt = new Array[Long](side * side)
      var cy = 0
      while (cy < side) {
        val y0 = cy * h / side
        val y1 = math.max(y0 + 1, (cy + 1) * h / side)
        var cx = 0
        while (cx < side) {
          val x0 = cx * w / side
          val x1 = math.max(x0 + 1, (cx + 1) * w / side)
          var sum = 0L; var cnt = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              var bd = 0
              while (bd < bands) {
                sum += raster.getSample(x, y, bd); bd += 1
              }
              cnt += bands
              x += 1
            }
            y += 1
          }
          cellSum(cy * side + cx) = sum
          cellCnt(cy * side + cx) = cnt
          cx += 1
        }
        cy += 1
      }
      Some((cellSum, cellCnt))
    }
  }

  /** The aHash bit rule over pooled cells (see [[hashBytes]]). */
  private[graft] def hashBits(cellSum: Array[Long],
      cellCnt: Array[Long]): (Array[Long], Int) = {
    var totalSum = 0L; var totalCnt = 0L
    var i = 0
    while (i < 64) {
      totalSum += cellSum(i); totalCnt += cellCnt(i); i += 1
    }
    val blocks = new Array[Long](4)
    var ones = 0
    i = 0
    while (i < 64) {
      // cell mean > image mean, exact: cross-multiply the two
      // integer ratios (cells can have unequal pixel counts when
      // the source image is not a multiple of 8 on a side)
      if (cellSum(i) * totalCnt > totalSum * cellCnt(i)) {
        blocks(i / 16) |= 1L << (15 - (i % 16))
        ones += 1
      }
      i += 1
    }
    (blocks, ones)
  }

  /** The aHash core: decode → 8×8 integer pooling → bit rule → 4
    * blocks + popcount; `None` when the bytes don't decode. Shared by
    * the batch [[averageHash]] and the streaming
    * [[graft.streaming.MediaStream]] (which needs to thread event time
    * through the same computation).
    */
  private[graft] def hashBytes(bytes: Array[Byte])
      : Option[(Array[Long], Int)] =
    poolCells(bytes).map { case (cellSum, cellCnt) =>
      hashBits(cellSum, cellCnt)
    }

  /** The dHash core: bit `i` (row r, col c) is set iff cell (r, c) is
    * strictly DARKER than its right neighbor (r, (c+1) mod 8) — the
    * published difference hash's row gradient, made cyclic so an 8×8
    * pooled grid still yields a full 64-bit code (the classic form
    * pools 9 columns; the wrap bit compares last to first instead).
    * Exact cross-multiplied integer comparison, same block layout as
    * [[hashBytes]].
    */
  private[graft] def dHashBits(cellSum: Array[Long],
      cellCnt: Array[Long]): (Array[Long], Int) = {
    val blocks = new Array[Long](4)
    var ones = 0
    var i = 0
    while (i < 64) {
      val j = (i / 8) * 8 + (i % 8 + 1) % 8
      if (cellSum(i) * cellCnt(j) < cellSum(j) * cellCnt(i)) {
        blocks(i / 16) |= 1L << (15 - (i % 16))
        ones += 1
      }
      i += 1
    }
    (blocks, ones)
  }

  private[graft] def dHashBytes(bytes: Array[Byte])
      : Option[(Array[Long], Int)] =
    poolCells(bytes).map { case (cellSum, cellCnt) =>
      dHashBits(cellSum, cellCnt)
    }

  /** 64-bit difference hash (dHash — the gradient member of the
    * perceptual-hash family): brightness-invariant where [[averageHash]]
    * is layout-invariant, so the two catch DIFFERENT perturbation
    * classes and a production dedup runs both
    * (q356 measures their agreement). Same output layout as
    * [[averageHash]], so [[nearDupPairs]] consumes either unchanged.
    */
  def differenceHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(hashSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          dHashBytes(r.getAs[Array[Byte]](1)).map { case (blocks, ones) =>
            Row(r.getLong(0), blocks(0), blocks(1), blocks(2),
              blocks(3), ones)
          }
        }
      }(enc)
  }

  /** The DCT-II cosine table on the 1e-9 grid: `cos((2x+1)·u·π/16)`
    * for `u, x ∈ [0, 8)`, snapped once (the survival-curve 1e-9
    * contract — libm cos agrees within an ulp across engines, and
    * after the snap every product/sum below is fixed IEEE arithmetic
    * on identical operands). The oracle embeds the SAME snapped
    * values as 17-digit literals.
    */
  private[graft] val DctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => graft.functions.Grid.snapD(
      math.cos((2 * x + 1) * u * math.Pi / 16.0), 9))

  /** The pHash core: decode → 8×8 pooling → full 8×8 DCT-II (each
    * coefficient an INDEX-ORDERED fold of `(cos_w[c]·cos_u[r])·v_i` —
    * one fixed association order, mirrored by the oracle) → bit
    * `k ≥ 1` set iff `coeff_k·63 > Σ AC coeffs` (the classic
    * coeff-vs-AC-mean rule; the DC bit is always 0). Frequency-domain
    * where [[hashBytes]] is brightness-layout and [[dHashBytes]] is
    * gradient — robust to smooth global edits the other two flag.
    */
  private[graft] def pHashBits(cellSum: Array[Long],
      cellCnt: Array[Long]): (Array[Long], Int) = {
      val v = Array.tabulate(64)(i =>
        cellSum(i).toDouble / cellCnt(i).toDouble)
      val coeff = new Array[Double](64)
      var k = 0
      while (k < 64) {
        val u = k / 8; val w = k % 8
        var acc = 0.0
        var i = 0
        while (i < 64) {
          acc += (DctCos(w)(i % 8) * DctCos(u)(i / 8)) * v(i)
          i += 1
        }
        coeff(k) = acc
        k += 1
      }
      var sumAc = 0.0
      k = 1
      while (k < 64) { sumAc += coeff(k); k += 1 }
      val blocks = new Array[Long](4)
      var ones = 0
      k = 1
      while (k < 64) {
        if (coeff(k) * 63.0 > sumAc) {
          blocks(k / 16) |= 1L << (15 - (k % 16))
          ones += 1
        }
        k += 1
      }
      (blocks, ones)
  }

  private[graft] def pHashBytes(bytes: Array[Byte])
      : Option[(Array[Long], Int)] =
    poolCells(bytes).map { case (cellSum, cellCnt) =>
      pHashBits(cellSum, cellCnt)
    }

  /** 64-bit DCT perceptual hash (pHash) — same output layout as
    * [[averageHash]], so [[nearDupPairs]] consumes it unchanged.
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(hashSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          pHashBytes(r.getAs[Array[Byte]](1)).map { case (blocks, ones) =>
            Row(r.getLong(0), blocks(0), blocks(1), blocks(2),
              blocks(3), ones)
          }
        }
      }(enc)
  }

  private val cellsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sums", ArrayType(LongType)),
    StructField("cnts", ArrayType(LongType))))

  /** The decode-once stage for MULTI-HASH pipelines (the image
    * counterpart of the tokenize-once contract): one
    * decode + 8×8-pooling `mapPartitions` pass emitting the exact
    * integer cell sums/counts every hash family consumes. An
    * agreement/consensus query (q356/q366/q346) caches THIS frame and
    * feeds the `*FromCells` rules below — at 100 TB the codec pass is
    * the dominant cost and must not run once per hash family.
    * Undecodable rows drop here (the [[averageHash]] convention).
    */
  def pooledGrids(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(cellsSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          poolCells(r.getAs[Array[Byte]](1)).map { case (s, c) =>
            Row(r.getLong(0), s.toSeq, c.toSeq)
          }
        }
      }(enc)
  }

  private def hashFromCells(cells: DataFrame,
      bits: (Array[Long], Array[Long]) => (Array[Long], Int))
      : DataFrame = {
    val enc = RowEncoder.encoderFor(hashSchema)
    cells.select(col("media_id"), col("sums"), col("cnts"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (blocks, ones) = bits(r.getSeq[Long](1).toArray,
            r.getSeq[Long](2).toArray)
          Row(r.getLong(0), blocks(0), blocks(1), blocks(2),
            blocks(3), ones)
        }
      }(enc)
  }

  /** [[averageHash]] from a cached [[pooledGrids]] frame — identical
    * bits, zero decode. */
  def averageHashFromCells(cells: DataFrame): DataFrame =
    hashFromCells(cells, hashBits)

  /** [[differenceHash]] from a cached [[pooledGrids]] frame. */
  def differenceHashFromCells(cells: DataFrame): DataFrame =
    hashFromCells(cells, dHashBits)

  /** [[perceptualHash]] from a cached [[pooledGrids]] frame. */
  def perceptualHashFromCells(cells: DataFrame): DataFrame =
    hashFromCells(cells, pHashBits)

  /** Cross-corpus near-dup probe — the CONTAMINATION form of
    * [[nearDupPairs]] (cross-MODAL leakage: an eval/benchmark IMAGE
    * that is a pixel-level near-copy of a training image, the gap
    * token- and embedding-grain contamination gates never see): each
    * PROBE hash row searches the CORPUS hash table through the same
    * 4-block band equi-join and reports its best match (smallest
    * Hamming, corpus-id tie-break) within `maxHamming`. Lossless at
    * `maxHamming ≤ 3` by the same pigeonhole; one equi-join + one
    * keyed min aggregation — never all-pairs, never a window over
    * the corpus side.
    *
    * Output: (media_id, match_id, hamming) — one row per
    * CONTAMINATED probe image; clean probes don't appear (left-join
    * the output to flag a full eval set).
    */
  def crossNearDupBest(probe: DataFrame, corpus: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0, s"bad maxHamming $maxHamming")
    def banded(h: DataFrame, p: String) =
      h.select(col("media_id").as(p + "id"), col("b0").as(p + "b0"),
          col("b1").as(p + "b1"), col("b2").as(p + "b2"),
          col("b3").as(p + "b3"),
          explode(array(
            struct(lit(0).as("tbl"), col("b0").as("key")),
            struct(lit(1).as("tbl"), col("b1").as("key")),
            struct(lit(2).as("tbl"), col("b2").as("key")),
            struct(lit(3).as("tbl"), col("b3").as("key")))).as("blk"))
        .select(col(p + "id"), col(p + "b0"), col(p + "b1"),
          col(p + "b2"), col(p + "b3"),
          col("blk.tbl").as(p + "tbl"), col("blk.key").as(p + "key"))
    banded(probe, "p_").join(banded(corpus, "c_"),
        col("p_tbl") === col("c_tbl") && col("p_key") === col("c_key"))
      .withColumn("hamming",
        (bit_count(col("p_b0").bitwiseXOR(col("c_b0"))) +
          bit_count(col("p_b1").bitwiseXOR(col("c_b1"))) +
          bit_count(col("p_b2").bitwiseXOR(col("c_b2"))) +
          bit_count(col("p_b3").bitwiseXOR(col("c_b3")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("p_id").as("media_id"))
      .agg(min(struct(col("hamming"), col("c_id"))).as("__best"))
      .select(col("media_id"),
        col("__best").getField("c_id").as("match_id"),
        col("__best").getField("hamming").as("hamming"))
  }

  /** 64-bit two-channel AUDIO perceptual hash over
    * [[graft.operators.Multimodal.audioFrameFeatures]] output — the
    * audio counterpart of [[averageHash]]: the first 32 frames'
    * ENERGY-vs-mean bits fill blocks b0/b1 and their ZERO-CROSSING-
    * vs-mean bits fill b2/b3 (MSB-first inside each 16-bit block, the
    * averageHash layout, so [[nearDupPairs]] consumes either hash
    * unchanged). Each bit is an exact cross-multiplied integer
    * comparison (`sig_i · n_frames > Σ sig`) — no float ever enters
    * the hash, so the oracle recomputes identical bits from the raw
    * samples. Bits are keyed on `frame_idx` ITSELF (bit position =
    * frame_idx, not list position): a frame set with gaps — a caller
    * that pre-filtered frames, or an asset shorter than 32 frames —
    * leaves the missing positions as 0-bits rather than silently
    * shifting every later frame's bit; totals run over the present
    * frames only.
    */
  def audioHash(frames: DataFrame, maxFrames: Int = 32): DataFrame = {
    require(maxFrames >= 1 && maxFrames <= 32, s"bad maxFrames $maxFrames")
    val agg = frames.filter(col("frame_idx") < maxFrames)
      .groupBy(col("media_id"))
      .agg(collect_list(struct(
          col("frame_idx").cast("int").as("i"),
          col("energy").cast("long").as("e"),
          col("zero_crossings").cast("long").as("z"))).as("__fr"),
        count(lit(1)).as("__nf"),
        sum(col("energy")).as("__te"),
        sum(col("zero_crossings").cast("long")).as("__tz"))
    // fold the PRESENT frames of the block's idx range, bit = 15 -
    // (i - off): disjoint bits sum commutatively, so collect_list
    // order is immaterial (no sort needed)
    def block(sig: String, tot: String, off: Int) = expr(
      s"""aggregate(filter(__fr, x -> x.i >= $off AND x.i < $off + 16),
         | CAST(0 AS BIGINT), (acc, x) ->
         | acc + CASE WHEN x.$sig * __nf > $tot
         |  THEN shiftleft(CAST(1 AS BIGINT), 15 - (x.i - $off))
         |  ELSE CAST(0 AS BIGINT) END)""".stripMargin)
    agg
      .withColumn("b0", block("e", "__te", 0))
      .withColumn("b1", block("e", "__te", 16))
      .withColumn("b2", block("z", "__tz", 0))
      .withColumn("b3", block("z", "__tz", 16))
      .select(col("media_id"), col("b0"), col("b1"), col("b2"),
        col("b3"),
        (bit_count(col("b0")) + bit_count(col("b1")) +
          bit_count(col("b2")) + bit_count(col("b3")))
          .cast("int").as("n_ones"))
  }

  /** Near-dup image pairs at Hamming ≤ `maxHamming` over [[averageHash]]
    * output: explode each hash into its 4 `(block_idx, block_value)`
    * bucket rows, equi-join on the bucket, verify the exact distance by
    * XOR-popcount over the blocks, distinct (a close pair can collide in
    * several blocks). `maxHamming ≤ 3` makes the bucket join lossless by
    * pigeonhole; larger radii are accepted but recall becomes the banding
    * heuristic's (mirrors [[Dedup.simhashNearDupPairs]]).
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0, s"bad maxHamming $maxHamming")
    val banded = hashes.select(col("media_id"), col("b0"), col("b1"),
        col("b2"), col("b3"),
        explode(array(
          struct(lit(0).as("tbl"), col("b0").as("key")),
          struct(lit(1).as("tbl"), col("b1").as("key")),
          struct(lit(2).as("tbl"), col("b2").as("key")),
          struct(lit(3).as("tbl"), col("b3").as("key")))).as("blk"))
      .select(col("media_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("blk.tbl").as("tbl"), col("blk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .withColumn("hamming",
        (bit_count(col("a.b0").bitwiseXOR(col("b.b0"))) +
          bit_count(col("a.b1").bitwiseXOR(col("b.b1"))) +
          bit_count(col("a.b2").bitwiseXOR(col("b.b2"))) +
          bit_count(col("a.b3").bitwiseXOR(col("b.b3")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        col("hamming"))
      .distinct()
  }
}
