package graft.multimodal

import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}

/** [EXT] Multimodal columns: opaque binary payloads + typed metadata.
  *
  * The real pipeline shape: `binary` column (image/audio bytes) →
  * `mapPartitions` feature extraction with a typed Encoder → relational
  * post-processing. The media codecs are NOT in this container, so
  * [[FakeCodec.decode]] is a clearly-marked deterministic stand-in; the
  * Spark-side plumbing — binary column, case-class schema, partition-wise
  * batch processing, join-ability of the output — is real and oracle-checked
  * (the fake features are pure arithmetic over bytes, so DuckDB reproduces
  * them from the text column).
  *
  * Scale notes (100 TB): payloads stay OUT of shuffle paths — features are
  * extracted in the scan's partition (narrow), only the small typed feature
  * rows move. Real decoders slot into [[FakeCodec.decode]] unchanged; batch
  * shape (one partition iterator = one codec context) is the production
  * pattern for model/codec reuse.
  */
object Multimodal {

  /** Input: payload is the opaque media blob (here: UTF-8 bytes of `text`). */
  final case class MMRecord(doc_id: Long, payload: Array[Byte])

  /** Extracted features: dimensions + a brightness-like statistic. */
  final case class MMFeatures(
      doc_id: Long, byte_len: Long, width: Long, height: Long, mean8: Double)

  /** STUB CODEC — deterministic fake in place of a real image decoder
    * (no media libraries in this container). Replace `decode` with e.g. a
    * JPEG decode + resize; everything around it is production plumbing. */
  object FakeCodec {
    def decode(r: MMRecord): MMFeatures = {
      val len = r.payload.length.toLong
      val head = r.payload.take(8).map(_.toLong & 0xffL)
      val mean8 = if (head.isEmpty) 0.0 else head.sum.toDouble / 8.0
      MMFeatures(
        doc_id = r.doc_id,
        byte_len = len,
        width = 1L + len % 64L,
        height = 1L + r.doc_id % 48L,
        mean8 = mean8)
    }
  }

  /** One sampled "video frame": payload treated as a sequence of
    * [[FrameBytes]]-byte frames, every [[FrameEvery]]-th one decoded. */
  final case class FrameSample(doc_id: Long, frame_no: Long, frame_mean: Double)

  /** Frame geometry for [[sampleFrames]] — a real pipeline derives these from
    * the container header; fixed here so the oracle can reproduce them. */
  val FrameBytes = 16
  val FrameEvery = 4

  /** Binary-payload decode via typed mapPartitions (one codec per partition). */
  def decodeFeatures(s: SparkSession, dir: String): Dataset[MMFeatures] = {
    import s.implicits._
    T.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        // per-partition codec context would be initialized here
        it.map(FakeCodec.decode)
      }
  }

  /** Frame sampling over the binary payload: one input row → 0..n sampled
    * frames (a flatMap-shaped typed mapPartitions — the video analogue of
    * decodeFeatures). Only COMPLETE frames are decoded; the per-frame stat
    * is sum(bytes)/16 (exact in binary — 16 is a power of two, no rounding
    * grid needed). At 100 TB the payload never shuffles: sampling happens in
    * the scan's partition and only (doc_id, frame_no, stat) rows move. */
  def sampleFrames(s: SparkSession, dir: String): Dataset[FrameSample] = {
    import s.implicits._
    T.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        // per-partition demuxer/codec context would be initialized here
        it.flatMap { r =>
          val nFrames = r.payload.length / FrameBytes
          Iterator.range(0, nFrames, FrameEvery).map { f =>
            val bytes = r.payload.slice(f * FrameBytes, (f + 1) * FrameBytes)
            FrameSample(r.doc_id, f.toLong,
              bytes.map(_.toLong & 0xffL).sum.toDouble / FrameBytes)
          }
        }
      }
  }

  /** Resize output: halved geometry + a stride-2 resample statistic. */
  final case class MMResized(
      doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, resampled_mean: Double)

  /** "Resize" via the stub codec: halve the fake geometry (floor, min 1) and
    * compute a stride-2 byte resample over the first 16 payload bytes — the
    * arithmetic stand-in for a real bilinear downsample, with the real
    * pipeline shape: typed mapPartitions, payload never shuffled, one codec
    * context per partition. */
  def resize(s: SparkSession, dir: String): Dataset[MMResized] = {
    import s.implicits._
    T.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        it.map { r =>
          val f = FakeCodec.decode(r)
          val sampled = r.payload.take(16).zipWithIndex
            .collect { case (b, i) if i % 2 == 0 => b.toLong & 0xffL }
          val mean = if (sampled.isEmpty) 0.0 else sampled.sum.toDouble / 8.0
          MMResized(r.doc_id, f.width, f.height,
            math.max(1L, f.width / 2L), math.max(1L, f.height / 2L), mean)
        }
      }
  }

  /** Patchification output: the ViT patch-grid geometry + the first
    * patch's integer byte sum (exact; the stand-in for a patch embedding). */
  final case class MMPatched(
      doc_id: Long, width: Long, height: Long,
      n_px: Long, n_py: Long, n_patches: Long, patch0_sum: Long)

  val PatchSide = 16L

  /** PATCHIFY — the vision-transformer front door: an image becomes a grid
    * of ⌈w/P⌉ × ⌈h/P⌉ patches, each embedded independently. The stub codec
    * computes the grid from the decoded geometry and an integer byte-sum
    * over the first patch's payload bytes (exact arithmetic, no FP); a real
    * deployment swaps the sum for a patch-embedding matmul and NOTHING
    * else changes — the grid arithmetic, the typed mapPartitions shape,
    * and the payload-never-shuffles rule are the real plumbing. At 100 TB
    * the patch fan-out (n_patches rows per image) happens map-side in the
    * scan partition; only patch METADATA and embeddings move. */
  def patchify(s: SparkSession, dir: String): Dataset[MMPatched] = {
    import s.implicits._
    T.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        it.map { r =>
          val f = FakeCodec.decode(r)
          val npx = (f.width + PatchSide - 1L) / PatchSide
          val npy = (f.height + PatchSide - 1L) / PatchSide
          val p0 = r.payload.take(PatchSide.toInt).map(_.toLong & 0xffL).sum
          MMPatched(r.doc_id, f.width, f.height, npx, npy, npx * npy, p0)
        }
      }
  }

  /** One audio analysis window: overlapping 32-byte windows on a 16-byte
    * hop (the STFT frame layout), energy = Σ byte² / 32 (exact — 32 is a
    * power of two), peak = max byte. */
  final case class AudioWin(doc_id: Long, win_no: Long, energy: Double, peak: Long)

  val AudioWinBytes = 32
  val AudioHop = 16

  /** Windowed "audio" energy via the stub codec: the payload as a PCM-ish
    * sample stream cut into overlapping windows — the shape of every
    * spectral front-end (STFT/MFCC). Swap the energy sum for an FFT and
    * nothing else changes: windows are produced in the scan's partition
    * (flatMap-shaped typed mapPartitions), the payload never shuffles, only
    * (doc_id, win_no, energy, peak) rows move. Short payloads are filtered
    * BEFORE the codec (predicate pushed to the scan). */
  def audioWindows(s: SparkSession, dir: String): Dataset[AudioWin] = {
    import s.implicits._
    T.documents(s, dir)
      .where(length(col("text")) >= AudioWinBytes)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        // per-partition codec/FFT context would be initialized here
        it.flatMap { r =>
          val nWins = (r.payload.length - AudioWinBytes) / AudioHop + 1
          Iterator.range(0, nWins).map { w =>
            val bytes = r.payload.slice(w * AudioHop, w * AudioHop + AudioWinBytes)
              .map(_.toLong & 0xffL)
            AudioWin(r.doc_id, w.toLong,
              bytes.map(b => b * b).sum.toDouble / AudioWinBytes,
              bytes.max)
          }
        }
      }
  }

  /** Perceptual-hash analogue: 16-bit signature over the payload head. */
  final case class PHash(doc_id: Long, phash: Long)

  /** "pHash" via the stub codec: 16 chunks of 4 bytes over the first 64
    * payload bytes; bit i set iff chunk i's byte sum exceeds the head mean
    * (compared as `chunk*16 > total` — exact integers, no division). The
    * real-pipeline stand-in for DCT-based image pHash: same shape (payload
    * → fixed-width signature in the scan partition, only 8-byte hashes ever
    * shuffle), swap the chunk sums for DCT coefficients and nothing else
    * changes. Payloads under 64 bytes have no complete head and are
    * filtered BEFORE the codec (pushed to the scan). */
  def phashes(s: SparkSession, dir: String): Dataset[PHash] = {
    import s.implicits._
    T.documents(s, dir)
      .where(length(col("text")) >= 64)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        // per-partition codec context would be initialized here
        it.map { r =>
          val chunks = (0 until 16).map { i =>
            r.payload.slice(i * 4, i * 4 + 4).map(_.toLong & 0xffL).sum
          }
          val total = chunks.sum
          val h = chunks.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
            if (c * 16L > total) acc | (1L << i) else acc
          }
          PHash(r.doc_id, h)
        }
      }
  }

  val defs: Seq[QDef] = Seq(
    QDef(
      "mm_decode",
      (s, dir) => decodeFeatures(s, dir).toDF().orderBy("doc_id"),
      // Fake-decode arithmetic reproduced over the text column (ASCII ⇒
      // byte i == ascii(char i); sum/8.0 is exact in binary — no rounding).
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS byte_len,
             |  1 + length(text) % 64 AS width,
             |  1 + doc_id % 48 AS height,
             |  CAST(ascii(substr(text,1,1)) + ascii(substr(text,2,1)) + ascii(substr(text,3,1))
             |   + ascii(substr(text,4,1)) + ascii(substr(text,5,1)) + ascii(substr(text,6,1))
             |   + ascii(substr(text,7,1)) + ascii(substr(text,8,1)) AS DOUBLE) / 8.0 AS mean8
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QDef(
      "mm_resize",
      (s, dir) => resize(s, dir).toDF().orderBy("doc_id"),
      // Stride-2 resample = bytes at 0-based even offsets 0,2,…,14 ⇒ 1-based
      // substr positions 1,3,…,15; docs are ≥16 bytes in every fixture, and
      // /8.0 is exact in binary (power of two).
      Some {
        val terms = (0 until 8).map(i => s"ascii(substr(text, ${2 * i + 1}, 1))")
          .mkString(" + ")
        s"""SELECT doc_id,
           |  1 + length(text) % 64 AS width,
           |  1 + doc_id % 48 AS height,
           |  greatest(1, (1 + length(text) % 64) // 2) AS out_w,
           |  greatest(1, (1 + doc_id % 48) // 2) AS out_h,
           |  CAST($terms AS DOUBLE) / 8.0 AS resampled_mean
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    QDef(
      "mm_patchify",
      (s, dir) => patchify(s, dir).toDF().orderBy("doc_id"),
      // Patch grid = ceil-division of the decoded geometry; patch-0 sum =
      // the first 16 payload bytes (docs are ≥16 bytes in every fixture;
      // ASCII ⇒ byte i == ascii(char i)) — pure integer arithmetic.
      Some {
        val terms = (1 to 16).map(i => s"ascii(substr(text, $i, 1))")
          .mkString(" + ")
        s"""SELECT doc_id,
           |  1 + length(text) % 64 AS width,
           |  1 + doc_id % 48 AS height,
           |  (1 + length(text) % 64 + 15) // 16 AS n_px,
           |  (1 + doc_id % 48 + 15) // 16 AS n_py,
           |  ((1 + length(text) % 64 + 15) // 16)
           |    * ((1 + doc_id % 48 + 15) // 16) AS n_patches,
           |  CAST($terms AS BIGINT) AS patch0_sum
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    QDef(
      "mm_framesample",
      (s, dir) => sampleFrames(s, dir).toDF().orderBy("doc_id", "frame_no"),
      // Sampled frame f covers 1-based byte positions [f*16+1, f*16+16];
      // the grid bound (0..63 sampled indices ⇒ frames 0,4,…,252) covers
      // payloads up to 4 KB — fixture max is 577 bytes (verified), and the
      // completeness predicate discards grid rows past the payload.
      Some {
        val terms = (1 to FrameBytes)
          .map(j => s"ascii(substr(text, frame_no * $FrameBytes + $j, 1))")
          .mkString(" + ")
        s"""WITH f AS (
           |  SELECT doc_id, text, $FrameEvery * g.i AS frame_no
           |  FROM documents CROSS JOIN generate_series(0, 63) g(i)
           |  WHERE ($FrameEvery * g.i + 1) * $FrameBytes <= length(text))
           |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
           |  CAST($terms AS DOUBLE) / $FrameBytes.0 AS frame_mean
           |FROM f ORDER BY doc_id, frame_no""".stripMargin
      }),

    QDef(
      "mm_phash",
      (s, dir) => phashes(s, dir).toDF().orderBy("doc_id"),
      // Chunk i covers 1-based byte positions [i*4+1, i*4+4]; bit compare is
      // exact integer arithmetic (chunk*16 vs head total), grid unrolled via
      // generate_series. (1::BIGINT << i) pins the shift to BIGINT.
      Some("""WITH ch AS (
             |  SELECT doc_id, g.i AS i,
             |    ascii(substr(text, g.i * 4 + 1, 1)) + ascii(substr(text, g.i * 4 + 2, 1)) +
             |    ascii(substr(text, g.i * 4 + 3, 1)) + ascii(substr(text, g.i * 4 + 4, 1)) AS cs
             |  FROM documents CROSS JOIN generate_series(0, 15) g(i)
             |  WHERE length(text) >= 64),
             |t AS (
             |  SELECT doc_id, i, cs, sum(cs) OVER (PARTITION BY doc_id) AS total
             |  FROM ch)
             |SELECT doc_id,
             |  CAST(sum(CASE WHEN cs * 16 > total THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS phash
             |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Image near-dup: mm_phash's payload signature fed through the SAME
    // multi-index Hamming blocking as dedup_hamming (16 bits → 6/5/5-bit
    // blocks; pigeonhole — 2 flips can't touch 3 blocks, so every pair
    // within distance 2 agrees exactly on one block and candidates come
    // from equi-joins, never all-pairs over the image corpus). The
    // composition is the point: the media-derived signature from the
    // typed mapPartitions decode drops into the text-dedup search
    // structure unchanged — at 100 TB the raw payloads never join (8-byte
    // signatures do), and production widens the signature (64-bit pHash)
    // and block count, not the algorithm. Signature frame is cached: the
    // three block projections would otherwise each replay the decode.
    QDef(
      "mm_dedup",
      (s, dir) => {
        val sig = phashes(s, dir).toDF().cache()
        val blk = Seq(
          sig.select(col("doc_id"), col("phash"), lit(0L).as("bi"),
            (col("phash") % 64L).as("bv")),
          sig.select(col("doc_id"), col("phash"), lit(1L).as("bi"),
            expr("(phash div 64) % 32").as("bv")),
          sig.select(col("doc_id"), col("phash"), lit(2L).as("bi"),
            expr("phash div 2048").as("bv"))
        ).reduce(_ unionByName _)
        val a = blk.select(col("bi"), col("bv"), col("doc_id").as("d1"), col("phash").as("h1"))
        val b = blk.select(col("bi"), col("bv"), col("doc_id").as("d2"), col("phash").as("h2"))
        a.join(b, Seq("bi", "bv"))
          .where(col("d1") < col("d2"))
          .select("d1", "d2", "h1", "h2").distinct()
          .withColumn("hamming", expr("bit_count(h1 ^ h2)").cast("long"))
          .where(col("hamming") <= 2L)
          .select("d1", "d2", "hamming")
          .orderBy("d1", "d2")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id, g.i AS i,
             |    ascii(substr(text, g.i * 4 + 1, 1)) + ascii(substr(text, g.i * 4 + 2, 1)) +
             |    ascii(substr(text, g.i * 4 + 3, 1)) + ascii(substr(text, g.i * 4 + 4, 1)) AS cs
             |  FROM documents CROSS JOIN generate_series(0, 15) g(i)
             |  WHERE length(text) >= 64),
             |t AS (
             |  SELECT doc_id, i, cs, sum(cs) OVER (PARTITION BY doc_id) AS total
             |  FROM ch),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN cs * 16 > total THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS phash
             |  FROM t GROUP BY doc_id),
             |blk AS (
             |  SELECT doc_id, phash, 0 AS bi, phash % 64 AS bv FROM sig
             |  UNION ALL SELECT doc_id, phash, 1, (phash // 64) % 32 FROM sig
             |  UNION ALL SELECT doc_id, phash, 2, phash // 2048 FROM sig),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
             |    a.phash AS h1, b.phash AS h2
             |  FROM blk a JOIN blk b
             |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
             |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(h1, h2)) <= 2
             |ORDER BY d1, d2""".stripMargin)),

    QDef(
      "mm_audio",
      (s, dir) => audioWindows(s, dir).toDF().orderBy("doc_id", "win_no"),
      // Window w covers 1-based byte positions [w*16+1, w*16+32]; energy is
      // Σ byte² / 32 (exact in binary), peak is a 32-way greatest. The grid
      // bound is DERIVED from the corpus — one scalar subquery over
      // max(length(text)), the oracle analogue of a one-row broadcast — so
      // the oracle stays in lockstep with the payload-length-driven Spark
      // side on any payload length; the completeness predicate discards
      // grid rows past each individual payload.
      Some {
        val terms = (1 to AudioWinBytes)
          .map(j => s"ascii(substr(text, win_no * $AudioHop + $j, 1))")
        s"""WITH g AS (
           |  SELECT unnest(generate_series(0,
           |    (SELECT (max(length(text)) - $AudioWinBytes) // $AudioHop
           |     FROM documents))) AS i),
           |w AS (
           |  SELECT doc_id, text, g.i AS win_no
           |  FROM documents CROSS JOIN g
           |  WHERE length(text) >= $AudioWinBytes
           |    AND g.i * $AudioHop + $AudioWinBytes <= length(text))
           |SELECT doc_id, CAST(win_no AS BIGINT) AS win_no,
           |  CAST(${terms.map(t => s"$t * $t").mkString(" + ")} AS DOUBLE) / $AudioWinBytes.0 AS energy,
           |  CAST(greatest(${terms.mkString(", ")}) AS BIGINT) AS peak
           |FROM w ORDER BY doc_id, win_no""".stripMargin
      }),

    // SCENE-CUT DETECTION [EXT — the temporal-video curation primitive]:
    // adjacent sampled frames whose signature delta exceeds
    // [[graft.GraftConfig.SceneCutDelta]] mark a scene boundary; scenes
    // are the running count of boundaries, rolled up per video (frame
    // count, cut count, longest scene). Scene-level structure is what a
    // video training pipeline samples by — one clip per scene beats k
    // uniformly-spaced frames of the same shot. Signatures are INTEGER
    // byte sums (frame_mean·16 is exact — /16 then ·16 round-trips in
    // binary), so the cut decision is integer-exact, never an FP
    // boundary. Scale: the lag, the running scene id, and BOTH rollups
    // all ride ONE video-key shuffle — the (doc_id, scene) and doc_id
    // groupings are satisfied by the window's existing hash partitioning
    // on doc_id (grouping keys ⊇ partition key ⇒ no further Exchange;
    // PlanShapeSpec pins it), and payloads never shuffle — only the
    // per-frame signature rows the narrow decode emits.
    QDef(
      "mm_scenecut",
      (s, dir) => {
        val byDoc = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("frame_no")
        sampleFrames(s, dir).toDF()
          .withColumn("cs", (col("frame_mean") * FrameBytes).cast("long"))
          .withColumn("cut",
            when(abs(col("cs") - lag("cs", 1).over(byDoc))
              > graft.GraftConfig.SceneCutDelta, 1L).otherwise(0L))
          .withColumn("scene", sum("cut").over(byDoc.rowsBetween(Long.MinValue, 0L)))
          .groupBy("doc_id", "scene")
          .agg(count(lit(1)).as("len"))
          .groupBy("doc_id")
          .agg(sum("len").cast("long").as("n_frames"),
            max("scene").as("n_cuts"),
            max("len").as("max_scene_frames"))
          .orderBy("doc_id")
      },
      Some {
        val terms = (1 to FrameBytes)
          .map(j => s"ascii(substr(text, frame_no * $FrameBytes + $j, 1))")
          .mkString(" + ")
        s"""WITH f AS (
           |  SELECT doc_id, text, $FrameEvery * g.i AS frame_no
           |  FROM documents CROSS JOIN generate_series(0, 63) g(i)
           |  WHERE ($FrameEvery * g.i + 1) * $FrameBytes <= length(text)),
           |cs AS (SELECT doc_id, frame_no, $terms AS cs FROM f),
           |c AS (
           |  SELECT doc_id, frame_no,
           |    CASE WHEN abs(cs - lag(cs) OVER (PARTITION BY doc_id
           |      ORDER BY frame_no)) > ${graft.GraftConfig.SceneCutDelta}
           |      THEN 1 ELSE 0 END AS cut
           |  FROM cs),
           |sc AS (
           |  SELECT doc_id,
           |    CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_no
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS scene
           |  FROM c),
           |g2 AS (SELECT doc_id, scene, count(*) AS len FROM sc GROUP BY 1, 2)
           |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_frames,
           |  CAST(max(scene) AS BIGINT) AS n_cuts,
           |  CAST(max(len) AS BIGINT) AS max_scene_frames
           |FROM g2 GROUP BY doc_id ORDER BY doc_id""".stripMargin
      })
  )
}
