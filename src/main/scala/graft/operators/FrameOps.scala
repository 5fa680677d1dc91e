package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Scans.{freshRunTmpPath, runTmpPath}

/** The FRAME / pixel tier (split out of Scans.scala in round 18 — zero
  * behavior change; binary/FITS ingest and the survey image pipeline:
  * photometry, registration, astrometry, difference imaging, stacking,
  * moments/PSF, transient association, forced photometry, cutouts,
  * alert packets, real-bogus).
  */
object FrameOps {

  /** Executed plan of frame_astrometry's pre-checkpoint voting chain —
    * the localCheckpoint that lets one vote computation feed require +
    * output truncates the declared query's own plan to an ExistingRDD
    * scan, so PlanShapeSpec re-asserts the interesting shape from here
    * (the join_skew_aqe precedent, `Joins.lastSkewAqePlan`). */
  @volatile private[graft] var lastAstrometryPlan: String = ""

  /** Executed plan of frame_forced_photometry's pre-checkpoint forced
    * probe (the declared output is an ExistingRDD scan past its
    * localCheckpoint) — PlanShapeSpec pins the ≤9-cell equi-join +
    * map-side partial aggregation shape from here. */
  @volatile private[graft] var lastForcedPhotPlan: String = ""

  /** The shared transient SCENE for the pipeline/forced-photometry pair:
    * 7 epochs of a 32×32 deterministic field (static hash noise + a
    * per-epoch pedestal) with an injection SCHEDULE — one transient
    * rising across epochs 1/3/5 at (10,10), one fading across 3/5 at
    * (24,20), one single-epoch orphan at 5 (5,25). Returns
    * (injections, difference-image residuals, detections): residuals are
    * epoch − reference with the sky pedestal removed (the mode of the
    * difference), so they are EXACTLY the injected pattern (A at center,
    * A div 2 on the 8 neighbors) and 0 elsewhere — every downstream flux
    * is all-integer. Detections are threshold + strict local max over
    * the bounded ≤9-cell probe, checkpointed once so laws and output
    * share one detection pass. Scale: per-epoch work is frame-local
    * map-side pixel arithmetic; only SPARSE detections shuffle. */
  private def transientScene(s: org.apache.spark.sql.SparkSession)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val grid = 32L
    val thresh = 200L
    val inj = s.range(0L, 6L)
      .select(col("id"),
        expr("element_at(array(1L,3L,5L,3L,5L,5L), cast(id + 1 as int))")
          .as("frame_id"),
        expr("element_at(array(10L,10L,10L,24L,24L,5L), cast(id + 1 as int))")
          .as("tx"),
        expr("element_at(array(10L,10L,10L,20L,20L,25L), cast(id + 1 as int))")
          .as("ty"),
        expr("element_at(array(400L,500L,600L,600L,520L,420L), cast(id + 1 as int))")
          .as("amp"))
      .drop("id")
    val px = s.range(0L, 7L).select(col("id").as("frame_id"))
      .crossJoin(s.range(0L, grid * grid).select(
        expr(s"id % $grid").as("x"), expr(s"id div $grid").as("y")))
      .withColumn("base",
        lit(100L) + (col("x") * 73L + col("y") * 149L) * 2654435761L % 97L)
      .join(inj.withColumnRenamed("frame_id", "ifr"),
        col("frame_id") === col("ifr") &&
          greatest(abs(col("x") - col("tx")), abs(col("y") - col("ty"))) <= 1L,
        "left")
      .groupBy("frame_id", "x", "y", "base")
      .agg(sum(when(col("tx") === col("x") && col("ty") === col("y"),
          col("amp")).otherwise(expr("amp div 2"))).as("tr"))
      .select(col("frame_id"), col("x"), col("y"),
        (col("base") + col("frame_id") * 7L + coalesce(col("tr"), lit(0L)))
          .as("v"))
    val refpx = px.where(col("frame_id") === 0L)
      .select(col("x"), col("y"), col("v").as("v0"))
    val diff = px.where(col("frame_id") > 0L)
      .join(broadcast(refpx), Seq("x", "y"))
      .select(col("frame_id"), col("x"), col("y"),
        (col("v") - col("v0")).as("d"))
    val sky = diff.groupBy("frame_id", "d").agg(count(lit(1)).as("n"))
      .groupBy("frame_id")
      .agg(max(struct(col("n"), (-col("d")).as("nd"))).as("m"))
      .select(col("frame_id"), (-col("m.nd")).as("sky"))
    val resid = diff.join(broadcast(sky), Seq("frame_id"))
      .select(col("frame_id"), col("x"), col("y"),
        (col("d") - col("sky")).as("r"))
    val det = resid.where(col("r") >= thresh)
    val centers = det.select(col("frame_id"), col("x"), col("y"),
        col("r").as("peak"))
      .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
      .join(resid.select(col("frame_id").as("nfr"), col("x").as("nx"),
          col("y").as("ny"), col("r").as("nr")),
        col("nfr") === col("frame_id") &&
          col("nx") === col("x") + col("dcx") &&
          col("ny") === col("y") + col("dcy"))
      .groupBy("frame_id", "x", "y", "peak")
      .agg(sum(when((col("dcx") =!= 0L || col("dcy") =!= 0L) &&
          col("nr") >= col("peak"), 1L).otherwise(0L)).as("n_ge"),
        sum(col("nr")).as("flux"))
      .where(col("n_ge") === 0L)
      .select(col("frame_id"), col("x"), col("y"), col("flux"))
      .localCheckpoint() // detections feed the law joins and association
    (inj, resid, centers)
  }

  val defs: Seq[QDef] = Seq(
    // BINARY-FILE INGEST — `spark.read.format("binaryFile")`: the path a
    // real multimodal corpus enters through (a directory of image/audio
    // blobs becomes (path, length, content) rows; the mm_* family then
    // decodes the content column). The fixture stages one .bin file per
    // document (payload = the text bytes, the same stand-in the stub
    // codec uses), reads them back through the source, and content-
    // addresses each blob with md5 — so a byte lost anywhere between
    // write, the source's content materialization, and the hash would
    // mismatch the oracle's md5-of-text. At 100 TB: binaryFile scans
    // parallelize per-file (each file one row, files split across tasks),
    // pathGlobFilter/recursiveFileLookup prune at the listing, and the
    // content column never shuffles — the mm_* rule that only derived
    // features move.
    QDef(
      "scan_binary",
      (s, dir) => {
        val root = freshRunTmpPath(s, "graft_binary_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
        // Stage a small blob store: one file per first-20 document —
        // EXECUTOR-SIDE (foreachPartition), so rows never materialize on
        // the driver and the doc_id bound can widen to any blob-store
        // size without creating a driver bottleneck (local mode shares
        // the filesystem; on a cluster this writes to the shared store
        // the same way).
        T.documents(s, dir).select(col("doc_id"), col("text"))
          .where(col("doc_id") < 20L).foreachPartition {
            (it: Iterator[org.apache.spark.sql.Row]) =>
              it.foreach { r =>
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(root, f"doc_${r.getLong(0)}%05d.bin"),
                  r.getString(1).getBytes("UTF-8")): Unit
              }
          }
        s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
          .load(root)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
              .cast("long").as("doc_id"),
            col("length").as("byte_len"),
            md5(col("content")).as("content_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
             |  md5(text) AS content_md5
             |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)),

    // REAL-FITS HEADER INGEST — closing the last ingestion gap to the
    // reference's actual input format: `scan_frames` consumes a typed
    // catalog, but the telescope hands you FITS FILES. This query stages a
    // fixture of standards-shaped FITS files (ASCII header of 36 × 80-byte
    // cards per 2880-byte block — SIMPLE/BITPIX/NAXIS/NAXIS1/NAXIS2 plus
    // the frame keywords, integer values right-justified in columns
    // 11–30, END card, blank-card padding; then a BITPIX=8 data unit of
    // NAXIS1×NAXIS2 bytes padded to the block boundary), executor-side
    // like scan_binary's blob store, then parses the headers BACK off the
    // `binaryFile` content column with card-offset arithmetic — substring
    // the first block, explode its 36 cards, keyword-match, pivot — into
    // exactly the typed catalog row scan_frames consumes. The header
    // arithmetic is oracled end to end: DuckDB rebuilds each file's
    // header text AND data payload from the same integer recurrences and
    // must agree on every keyword value, on the FITS size law
    // (file = 2880·(1 + ceil(N1·N2/2880)) — also require'd in-query
    // against the real on-disk length), and on the md5 content address of
    // header‖payload. One divergence from the letter of the standard,
    // chosen deliberately: padding bytes are spaces (not zeros) so the
    // whole file stays ASCII and the content address is reconstructible
    // in SQL; no parser reads padding either way. At 100 TB: headers are
    // KBs of the leading block — the parse never touches the data unit,
    // so cataloging a pixel archive reads ~0.03% of it; the binaryFile
    // scan parallelizes per file and only typed catalog rows shuffle.
    QDef(
      "scan_fits",
      (s, dir) => {
        val root = freshRunTmpPath(s, "graft_fits_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
        val nFrames = 24L
        T.orders(s, dir).select((col("o_orderkey") % nFrames).as("i"))
          .distinct()
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            def card(k: String, v: String): String =
              (k.padTo(8, ' ') + "= " + (" " * (20 - v.length)) + v)
                .padTo(80, ' ')
            it.foreach { r =>
              val i = r.getLong(0)
              val n1 = 64L + (i % 4L) * 32L
              val n2 = 64L + (i % 3L) * 32L
              val band = "ugriz"((i % 5L).toInt).toString
              val hdr = (card("SIMPLE", "T") + card("BITPIX", "8") +
                card("NAXIS", "2") + card("NAXIS1", n1.toString) +
                card("NAXIS2", n2.toString) + card("FRAMEID", i.toString) +
                card("MJDMILLI", (60000000L + i * 1001L).toString) +
                card("FILTER", s"'$band'") +
                card("EXPTIMMS", (30000L + (i % 5L) * 500L).toString) +
                card("ZPMILLI", (25000L + (i * 2654435761L) % 500L).toString) +
                "END".padTo(80, ' ')).padTo(2880, ' ')
              val nData = (n1 * n2).toInt
              val payload = Array.tabulate(nData)(j =>
                (32L + (i * 7L + j) % 64L).toByte)
              val padded = 2880 * ((nData + 2879) / 2880)
              val out = java.nio.ByteBuffer.allocate(2880 + padded)
              out.put(hdr.getBytes("US-ASCII")).put(payload)
                .put(Array.fill(padded - nData)(' '.toByte))
              java.nio.file.Files.write(
                java.nio.file.Paths.get(root, f"frame_$i%05d.fits"),
                out.array()): Unit
            }
          }
        // Parse: first block only, 36 cards of 80, keyword-match, pivot.
        val hdrCards = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.fits").load(root)
          .select(col("length").as("file_len"), col("content"),
            expr("decode(substring(content, 1, 2880), 'UTF-8')").as("hdr"))
          .select(col("file_len"), col("content"),
            explode(sequence(lit(0), lit(35))).as("j"), col("hdr"))
          .select(col("file_len"), col("content"),
            expr("substring(hdr, j * 80 + 1, 80)").as("card"))
          .select(col("file_len"), col("content"),
            trim(expr("substring(card, 1, 8)")).as("kw"),
            trim(expr("substring(card, 11, 70)")).as("v"))
          .where(col("kw").isin("NAXIS1", "NAXIS2", "FRAMEID", "MJDMILLI",
            "FILTER", "EXPTIMMS", "ZPMILLI"))
        def kv(k: String) = max(when(col("kw") === k, col("v")))
        val frames = hdrCards
          .groupBy("file_len", "content")
          .agg(kv("FRAMEID").cast("long").as("frame_id"),
            trim(kv("FILTER"), "'").as("band"),
            kv("MJDMILLI").cast("long").as("mjd_milli"),
            kv("EXPTIMMS").cast("long").as("exptime_ms"),
            kv("ZPMILLI").cast("long").as("zp_milli"),
            kv("NAXIS1").cast("long").as("naxis1"),
            kv("NAXIS2").cast("long").as("naxis2"))
          .withColumn("data_bytes", col("naxis1") * col("naxis2"))
          .withColumn("n_blocks", expr("1 + (data_bytes + 2879) div 2880"))
          // Content address over header + data unit (padding excluded
          // from the hash, but its LENGTH is pinned by the size law).
          .withColumn("content_md5",
            md5(expr("substring(content, 1, 2880 + data_bytes)")))
          .drop("content")
        // The FITS size law against the REAL on-disk byte count.
        require(frames.where(
            col("file_len") =!= col("n_blocks") * 2880L).count() == 0L,
          "a staged FITS file's length violates the block-size law")
        frames.select("frame_id", "band", "mjd_milli", "exptime_ms",
            "zp_milli", "naxis1", "naxis2", "data_bytes", "n_blocks",
            "file_len", "content_md5")
          .orderBy("frame_id")
      },
      Some("""WITH f AS (SELECT i FROM generate_series(0, 23) t(i)),
             |d AS (
             |  SELECT i, 64 + (i % 4) * 32 AS naxis1,
             |    64 + (i % 3) * 32 AS naxis2,
             |    ['u','g','r','i','z'][CAST(i % 5 AS INT) + 1] AS band,
             |    60000000 + i * 1001 AS mjd_milli,
             |    30000 + (i % 5) * 500 AS exptime_ms,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM f),
             |sz AS (
             |  SELECT *, naxis1 * naxis2 AS data_bytes,
             |    1 + (naxis1 * naxis2 + 2879) // 2880 AS n_blocks
             |  FROM d),
             |built AS (
             |  SELECT *,
             |    rpad('SIMPLE  = ' || lpad('T', 20, ' '), 80, ' ')
             |    || rpad('BITPIX  = ' || lpad('8', 20, ' '), 80, ' ')
             |    || rpad('NAXIS   = ' || lpad('2', 20, ' '), 80, ' ')
             |    || rpad('NAXIS1  = ' || lpad(CAST(naxis1 AS VARCHAR), 20, ' '), 80, ' ')
             |    || rpad('NAXIS2  = ' || lpad(CAST(naxis2 AS VARCHAR), 20, ' '), 80, ' ')
             |    || rpad('FRAMEID = ' || lpad(CAST(i AS VARCHAR), 20, ' '), 80, ' ')
             |    || rpad('MJDMILLI= ' || lpad(CAST(mjd_milli AS VARCHAR), 20, ' '), 80, ' ')
             |    || rpad('FILTER  = ' || lpad('''' || band || '''', 20, ' '), 80, ' ')
             |    || rpad('EXPTIMMS= ' || lpad(CAST(exptime_ms AS VARCHAR), 20, ' '), 80, ' ')
             |    || rpad('ZPMILLI = ' || lpad(CAST(zp_milli AS VARCHAR), 20, ' '), 80, ' ')
             |    || rpad('END', 80, ' ') || repeat(' ', 2000) AS hdr
             |  FROM sz),
             |pay AS (
             |  SELECT d.i,
             |    string_agg(chr(CAST(32 + (d.i * 7 + s.j) % 64 AS INT)), ''
             |      ORDER BY s.j) AS payload
             |  FROM sz d JOIN generate_series(0, 20479) s(j)
             |    ON s.j < d.data_bytes
             |  GROUP BY d.i)
             |SELECT b.i AS frame_id, band, mjd_milli, exptime_ms, zp_milli,
             |  naxis1, naxis2, data_bytes, n_blocks,
             |  n_blocks * 2880 AS file_len,
             |  md5(hdr || payload) AS content_md5
             |FROM built b JOIN pay p ON p.i = b.i
             |ORDER BY frame_id""".stripMargin)),

    // APERTURE PHOTOMETRY [PK — the source-extraction step between pixel
    // calibration and the light-curve catalog; with scan_fits (ingest)
    // and lc_ensemble (calibration) this closes the pixel-tier boundary
    // SURVEY §1.1 scopes]: for each catalog position, flux = Σ(5×5
    // aperture) − 25 · mean(annulus ring at Chebyshev radius 4–5) — the
    // classic background-subtracted aperture sum. The pixel tier itself
    // is the stub layer (the container has no FITS pixel codec): frames
    // synthesize as a DETERMINISTIC pixel function — flat background per
    // frame + an integer hash-noise field + flat 3×3 star boxes at
    // catalog positions — so every pixel is exactly reproducible in both
    // engines, while the Spark-side plumbing (pixel explode, per-source
    // neighborhood join, background statistics, map-side partials) is the
    // real distributed shape. Scale: pixels explode map-side from frame
    // metadata (at 100 TB the same plan reads them from scan_binary
    // payloads via the mm codec path); the per-source neighborhood is an
    // EQUI-join on the pixel's (frame, cellx, celly) — each pixel lands
    // in at most 9 source cells via a bounded explode, candidates linear
    // in pixels, never pixels × sources.
    QDef(
      "frame_photometry",
      (s, dir) => {
        val nFrames = 8L
        val grid = 32L // 32×32 pixels per frame
        val cell = 11L // source-cell size ≥ 2·annulusMax+1 → 9-cell probe
        // Star catalog: 3 sources per frame at fixed positions, flux
        // scaling with the star index (flat 3×3 box PSF).
        val stars = s.range(0L, nFrames)
          .select(col("id").as("frame_id"),
            explode(sequence(lit(0L), lit(2L))).as("star"))
          .select(col("frame_id"), col("star"),
            (lit(8L) + col("star") * 8L).as("sx"),
            (lit(9L) + col("star") * 7L).as("sy"),
            (lit(500L) + col("star") * 250L + col("frame_id") * 10L).as("flux_in"))
        // Deterministic pixel field: bg(frame) + hash noise + star boxes.
        val px = s.range(0L, nFrames)
          .select(col("id").as("frame_id"),
            explode(sequence(lit(0L), lit(grid * grid - 1L))).as("p"))
          .select(col("frame_id"), (col("p") % grid).as("x"),
            expr(s"p div $grid").as("y"))
          .join(stars.groupBy("frame_id").agg(
            collect_list(struct(col("sx"), col("sy"), col("flux_in"))).as("cat")),
            Seq("frame_id"))
          .select(col("frame_id"), col("x"), col("y"),
            ((lit(100L) + col("frame_id")) +
              ((col("x") * 73L + col("y") * 149L + col("frame_id") * 31L) *
                2654435761L % 97L).cast("double") / 97.0 +
              aggregate(col("cat"), lit(0L),
                (acc, st) => acc + when(
                  abs(col("x") - st.getField("sx")) <= 1L &&
                    abs(col("y") - st.getField("sy")) <= 1L,
                  st.getField("flux_in")).otherwise(0L)).cast("double"))
              .as("v"))
        // Each pixel probes the ≤9 source cells it can serve; the source
        // joins its own cell — an equi-join, never pixels × sources.
        val probed = px
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .select(col("frame_id"), col("x"), col("y"), col("v"),
            (expr(s"x div $cell") + col("dcx")).as("cx"),
            (expr(s"y div $cell") + col("dcy")).as("cy"))
        val joined = probed.join(stars
            .select(col("frame_id"), col("star"), col("sx"), col("sy"),
              col("flux_in"), expr(s"sx div $cell").as("cx"),
              expr(s"sy div $cell").as("cy")),
          Seq("frame_id", "cx", "cy"))
          .withColumn("cheb", greatest(abs(col("x") - col("sx")),
            abs(col("y") - col("sy"))))
        val ap = joined.where(col("cheb") <= 2L)
          .groupBy("frame_id", "star", "flux_in")
          .agg(sum("v").as("ap_sum"), count(lit(1)).as("n_ap"))
        val ann = joined.where(col("cheb") >= 4L && col("cheb") <= 5L)
          .groupBy("frame_id", "star")
          .agg(avg("v").as("bg"), count(lit(1)).as("n_ann"))
        ap.join(ann, Seq("frame_id", "star"))
          .select(col("frame_id"), col("star"), col("flux_in"),
            col("n_ap"), col("n_ann"),
            rnd(col("ap_sum") - col("n_ap").cast("double") * col("bg"), 6)
              .as("flux"))
          .orderBy("frame_id", "star")
      },
      Some("""WITH f AS (SELECT i AS frame_id FROM generate_series(0, 7) t(i)),
             |stars AS (
             |  SELECT frame_id, s.j AS star, 8 + s.j * 8 AS sx,
             |    9 + s.j * 7 AS sy,
             |    500 + s.j * 250 + frame_id * 10 AS flux_in
             |  FROM f CROSS JOIN generate_series(0, 2) s(j)),
             |px AS (
             |  SELECT f.frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    (100 + f.frame_id) +
             |    CAST(((p.i % 32) * 73 + (p.i // 32) * 149 + f.frame_id * 31)
             |      * 2654435761 % 97 AS DOUBLE) / 97.0 +
             |    CAST((SELECT coalesce(sum(st.flux_in), 0) FROM stars st
             |      WHERE st.frame_id = f.frame_id
             |        AND abs((p.i % 32) - st.sx) <= 1
             |        AND abs((p.i // 32) - st.sy) <= 1) AS DOUBLE) AS v
             |  FROM f CROSS JOIN generate_series(0, 1023) p(i)),
             |joined AS (
             |  SELECT st.frame_id, st.star, st.flux_in, px.v,
             |    greatest(abs(px.x - st.sx), abs(px.y - st.sy)) AS cheb
             |  FROM stars st JOIN px ON px.frame_id = st.frame_id),
             |ap AS (
             |  SELECT frame_id, star, flux_in, sum(v) AS ap_sum,
             |    CAST(count(*) AS BIGINT) AS n_ap
             |  FROM joined WHERE cheb <= 2 GROUP BY 1, 2, 3),
             |ann AS (
             |  SELECT frame_id, star, avg(v) AS bg,
             |    CAST(count(*) AS BIGINT) AS n_ann
             |  FROM joined WHERE cheb >= 4 AND cheb <= 5 GROUP BY 1, 2)
             |SELECT ap.frame_id, ap.star, ap.flux_in, n_ap, n_ann,
             |  floor((ap_sum - CAST(n_ap AS DOUBLE) * bg) * 1e6 + 0.5) / 1e6
             |    AS flux
             |FROM ap JOIN ann ON ap.frame_id = ann.frame_id
             |  AND ap.star = ann.star
             |ORDER BY ap.frame_id, ap.star""".stripMargin)),

    // PHOTOMETRY FROM DECODED BYTES — the pixel tier closed end to end:
    // where frame_photometry explodes its deterministic pixel function
    // from frame METADATA (the documented stub), this QDef stages real
    // FITS files whose BITPIX=16 data unit carries those pixels as
    // big-endian shorts, reads them back through binaryFile, decodes the
    // payload in a typed mapPartitions (the mm codec path's shape,
    // multimodal/Multimodal.scala: media bytes never shuffle, only
    // decoded rows do — no Catalyst expression parses a data unit), and
    // runs the SAME aperture chain on the decoded rows. The oracle
    // reconstructs the pixels from the generator arithmetic alone, so a
    // byte lost or misread anywhere between the writer, the binaryFile
    // materialization, and the short decode hash-mismatches. All-integer
    // pixels (the one FP step is the annulus mean, exact for integer
    // sums < 2^53 in IEEE double under any order). Scale: decode
    // parallelizes per file and emits only (frame, x, y, v) rows; the
    // per-source neighborhood stays frame_photometry's bounded ≤9-cell
    // equi-join probe — candidates linear in pixels, never
    // pixels × sources.
    QDef(
      "frame_photometry_bytes",
      (s, dir) => {
        val root = freshRunTmpPath(s, "graft_fitspx_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
        val nFrames = 8L
        val grid = 32L
        val cell = 11L
        s.range(0L, nFrames).toDF("i")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            def card(k: String, v: String): String =
              (k.padTo(8, ' ') + "= " + (" " * (20 - v.length)) + v)
                .padTo(80, ' ')
            it.foreach { r =>
              val i = r.getLong(0)
              val hdr = (card("SIMPLE", "T") + card("BITPIX", "16") +
                card("NAXIS", "2") + card("NAXIS1", "32") +
                card("NAXIS2", "32") + card("FRAMEID", i.toString) +
                "END".padTo(80, ' ')).padTo(2880, ' ')
              val n = (grid * grid).toInt
              // data unit = 2048 bytes of shorts, zero-padded to one block
              val buf = java.nio.ByteBuffer.allocate(2880 + 2880)
              buf.put(hdr.getBytes("US-ASCII"))
              var j = 0
              while (j < n) {
                val x = j % 32; val y = j / 32
                var v = 100L + i +
                  ((x * 73L + y * 149L + i * 31L) * 2654435761L) % 97L
                var st = 0
                while (st < 3) {
                  if (math.abs(x - (8 + st * 8)) <= 1 &&
                      math.abs(y - (9 + st * 7)) <= 1)
                    v += 500L + st * 250L + i * 10L
                  st += 1
                }
                buf.putShort(v.toShort)
                j += 1
              }
              java.nio.file.Files.write(
                java.nio.file.Paths.get(root, f"frame_$i%05d.fits"),
                buf.array()): Unit
            }
          }
        val bin = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.fits").load(root)
        // The FITS size law against the real on-disk lengths (8 rows).
        require(bin.select("length").collect()
            .forall(_.getLong(0) == 5760L),
          "a staged BITPIX=16 frame violates the FITS block-size law")
        import s.implicits._
        val px = bin.select(col("content")).as[Array[Byte]]
          .mapPartitions { files =>
            files.flatMap { bytes =>
              val hdr = new String(bytes, 0, 2880, "US-ASCII")
              def kv(k: String): Long = {
                val at = hdr.indexOf(k.padTo(8, ' ') + "=")
                require(at >= 0, s"FITS card $k missing")
                hdr.substring(at + 10, at + 30).trim.toLong
              }
              val (fid, n1, n2) = (kv("FRAMEID"), kv("NAXIS1"), kv("NAXIS2"))
              val bb = java.nio.ByteBuffer.wrap(bytes)
              (0L until n1 * n2).iterator.map { j =>
                (fid, j % n1, j / n1,
                  bb.getShort((2880 + 2 * j).toInt).toLong)
              }
            }
          }.toDF("frame_id", "x", "y", "v")
        val stars = s.range(0L, nFrames)
          .select(col("id").as("frame_id"),
            explode(sequence(lit(0L), lit(2L))).as("star"))
          .select(col("frame_id"), col("star"),
            (lit(8L) + col("star") * 8L).as("sx"),
            (lit(9L) + col("star") * 7L).as("sy"),
            (lit(500L) + col("star") * 250L + col("frame_id") * 10L).as("flux_in"))
        val probed = px
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .select(col("frame_id"), col("x"), col("y"), col("v"),
            (expr(s"x div $cell") + col("dcx")).as("cx"),
            (expr(s"y div $cell") + col("dcy")).as("cy"))
        val joined = probed.join(stars
            .select(col("frame_id"), col("star"), col("sx"), col("sy"),
              col("flux_in"), expr(s"sx div $cell").as("cx"),
              expr(s"sy div $cell").as("cy")),
          Seq("frame_id", "cx", "cy"))
          .withColumn("cheb", greatest(abs(col("x") - col("sx")),
            abs(col("y") - col("sy"))))
        val ap = joined.where(col("cheb") <= 2L)
          .groupBy("frame_id", "star", "flux_in")
          .agg(sum("v").as("ap_sum"), count(lit(1)).as("n_ap"))
        val ann = joined.where(col("cheb") >= 4L && col("cheb") <= 5L)
          .groupBy("frame_id", "star")
          .agg(avg("v").as("bg"), count(lit(1)).as("n_ann"))
        ap.join(ann, Seq("frame_id", "star"))
          .select(col("frame_id"), col("star"), col("flux_in"),
            col("ap_sum"), col("n_ap"), col("n_ann"),
            rnd(col("ap_sum") - col("n_ap").cast("double") * col("bg"), 6)
              .as("flux"))
          .orderBy("frame_id", "star")
      },
      Some("""WITH f AS (SELECT i AS frame_id FROM generate_series(0, 7) t(i)),
             |stars AS (
             |  SELECT frame_id, s.j AS star, 8 + s.j * 8 AS sx,
             |    9 + s.j * 7 AS sy,
             |    500 + s.j * 250 + frame_id * 10 AS flux_in
             |  FROM f CROSS JOIN generate_series(0, 2) s(j)),
             |px AS (
             |  SELECT f.frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    (100 + f.frame_id) +
             |    ((p.i % 32) * 73 + (p.i // 32) * 149 + f.frame_id * 31)
             |      * 2654435761 % 97 +
             |    (SELECT coalesce(sum(st.flux_in), 0) FROM stars st
             |      WHERE st.frame_id = f.frame_id
             |        AND abs((p.i % 32) - st.sx) <= 1
             |        AND abs((p.i // 32) - st.sy) <= 1) AS v
             |  FROM f CROSS JOIN generate_series(0, 1023) p(i)),
             |joined AS (
             |  SELECT st.frame_id, st.star, st.flux_in, px.v,
             |    greatest(abs(px.x - st.sx), abs(px.y - st.sy)) AS cheb
             |  FROM stars st JOIN px ON px.frame_id = st.frame_id),
             |ap AS (
             |  SELECT frame_id, star, flux_in,
             |    CAST(sum(v) AS BIGINT) AS ap_sum,
             |    CAST(count(*) AS BIGINT) AS n_ap
             |  FROM joined WHERE cheb <= 2 GROUP BY 1, 2, 3),
             |ann AS (
             |  SELECT frame_id, star, avg(v) AS bg,
             |    CAST(count(*) AS BIGINT) AS n_ann
             |  FROM joined WHERE cheb >= 4 AND cheb <= 5 GROUP BY 1, 2)
             |SELECT ap.frame_id, ap.star, ap.flux_in, ap_sum, n_ap, n_ann,
             |  floor((ap_sum - CAST(n_ap AS DOUBLE) * bg) * 1e6 + 0.5) / 1e6
             |    AS flux
             |FROM ap JOIN ann ON ap.frame_id = ann.frame_id
             |  AND ap.star = ann.star
             |ORDER BY ap.frame_id, ap.star""".stripMargin)),

    // FLOAT PIXELS (BITPIX = −32) — the calibrated-frame tier real survey
    // archives ship (raw integer counts become IEEE float32 after bias/
    // flat calibration), closing the FITS matrix: frame_photometry_bytes
    // decodes integer payloads; this QDef stages BITPIX=−32 data units
    // carrying big-endian float32 pixels, decodes them through the SAME
    // typed mapPartitions codec (media bytes never shuffle), and runs the
    // aperture chain. THE CROSS-ENGINE CONTRACT IS GRID-ROUND AT INGEST:
    // float pixels from different writers/libm stacks can differ in ulps,
    // so a pipeline that hash-compares MUST quantize at the decode
    // boundary — the codec emits milli-unit integers
    // floor(v·1e3 + 0.5) and every downstream step is exact integer
    // arithmetic. The fixture makes the contract itself verifiable to the
    // last bit: pixel values are exact EIGHTHS (3 fractional bits —
    // float32-exact below 2^21), so v·1e3 = 125·(8v) is exact in double
    // and the DuckDB oracle reconstructs the quantized pixels from the
    // integer generator alone, never touching a float: a byte lost, an
    // endianness slip, or a codec that rounds before widening to double
    // hash-mismatches. Laws: the FITS block-size law on the real on-disk
    // lengths (header 2880 + 4096-byte data unit padded to 5760). Scale:
    // identical to frame_photometry_bytes — decode parallelizes per file,
    // only (frame, x, y, milli) rows move, the source probe stays the
    // bounded ≤9-cell equi-join.
    QDef(
      "frame_photometry_f32",
      (s, dir) => {
        val root = freshRunTmpPath(s, "graft_fitsf32_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
        val nFrames = 8L
        val grid = 32L
        val cell = 11L
        s.range(0L, nFrames).toDF("i")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            def card(k: String, v: String): String =
              (k.padTo(8, ' ') + "= " + (" " * (20 - v.length)) + v)
                .padTo(80, ' ')
            it.foreach { r =>
              val i = r.getLong(0)
              val hdr = (card("SIMPLE", "T") + card("BITPIX", "-32") +
                card("NAXIS", "2") + card("NAXIS1", "32") +
                card("NAXIS2", "32") + card("FRAMEID", i.toString) +
                "END".padTo(80, ' ')).padTo(2880, ' ')
              val n = (grid * grid).toInt
              // data unit = 4096 bytes of big-endian float32, zero-padded
              // to two blocks (FITS: data unit length ≡ 0 mod 2880)
              val buf = java.nio.ByteBuffer.allocate(2880 + 5760)
              buf.put(hdr.getBytes("US-ASCII"))
              var j = 0
              while (j < n) {
                val x = j % 32; val y = j / 32
                var v = 100L + i +
                  ((x * 73L + y * 149L + i * 31L) * 2654435761L) % 97L
                var st = 0
                while (st < 3) {
                  if (math.abs(x - (8 + st * 8)) <= 1 &&
                      math.abs(y - (9 + st * 7)) <= 1)
                    v += 500L + st * 250L + i * 10L
                  st += 1
                }
                // exact eighths: calibrated value = counts / gain, gain 8
                buf.putFloat((v / 8.0).toFloat)
                j += 1
              }
              java.nio.file.Files.write(
                java.nio.file.Paths.get(root, f"frame_$i%05d.fits"),
                buf.array()): Unit
            }
          }
        val bin = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.fits").load(root)
        require(bin.select("length").collect()
            .forall(_.getLong(0) == 8640L),
          "a staged BITPIX=-32 frame violates the FITS block-size law")
        import s.implicits._
        val px = bin.select(col("content")).as[Array[Byte]]
          .mapPartitions { files =>
            files.flatMap { bytes =>
              val hdr = new String(bytes, 0, 2880, "US-ASCII")
              def kv(k: String): Long = {
                val at = hdr.indexOf(k.padTo(8, ' ') + "=")
                require(at >= 0, s"FITS card $k missing")
                hdr.substring(at + 10, at + 30).trim.toLong
              }
              require(kv("BITPIX") == -32L,
                "frame_photometry_f32 fed a non-float data unit")
              val (fid, n1, n2) = (kv("FRAMEID"), kv("NAXIS1"), kv("NAXIS2"))
              val bb = java.nio.ByteBuffer.wrap(bytes)
              (0L until n1 * n2).iterator.map { j =>
                // GRID-ROUND AT INGEST: widen float32 → double, quantize
                // to milli-units ONCE at the decode boundary; everything
                // downstream is exact integer arithmetic.
                val v = bb.getFloat((2880 + 4 * j).toInt).toDouble
                (fid, j % n1, j / n1, math.floor(v * 1e3 + 0.5).toLong)
              }
            }
          }.toDF("frame_id", "x", "y", "v")
        val stars = s.range(0L, nFrames)
          .select(col("id").as("frame_id"),
            explode(sequence(lit(0L), lit(2L))).as("star"))
          .select(col("frame_id"), col("star"),
            (lit(8L) + col("star") * 8L).as("sx"),
            (lit(9L) + col("star") * 7L).as("sy"),
            ((lit(500L) + col("star") * 250L + col("frame_id") * 10L) * 125L)
              .as("flux_in_milli"))
        val probed = px
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .select(col("frame_id"), col("x"), col("y"), col("v"),
            (expr(s"x div $cell") + col("dcx")).as("cx"),
            (expr(s"y div $cell") + col("dcy")).as("cy"))
        val joined = probed.join(stars
            .select(col("frame_id"), col("star"), col("sx"), col("sy"),
              col("flux_in_milli"), expr(s"sx div $cell").as("cx"),
              expr(s"sy div $cell").as("cy")),
          Seq("frame_id", "cx", "cy"))
          .withColumn("cheb", greatest(abs(col("x") - col("sx")),
            abs(col("y") - col("sy"))))
        val ap = joined.where(col("cheb") <= 2L)
          .groupBy("frame_id", "star", "flux_in_milli")
          .agg(sum("v").as("ap_sum"), count(lit(1)).as("n_ap"))
        val ann = joined.where(col("cheb") >= 4L && col("cheb") <= 5L)
          .groupBy("frame_id", "star")
          .agg(avg("v").as("bg"), count(lit(1)).as("n_ann"))
        ap.join(ann, Seq("frame_id", "star"))
          .select(col("frame_id"), col("star"), col("flux_in_milli"),
            col("ap_sum"), col("n_ap"), col("n_ann"),
            rnd(col("ap_sum") - col("n_ap").cast("double") * col("bg"), 6)
              .as("flux_milli"))
          .orderBy("frame_id", "star")
      },
      Some("""WITH f AS (SELECT i AS frame_id FROM generate_series(0, 7) t(i)),
             |stars AS (
             |  SELECT frame_id, s.j AS star, 8 + s.j * 8 AS sx,
             |    9 + s.j * 7 AS sy,
             |    (500 + s.j * 250 + frame_id * 10) * 125 AS flux_in_milli
             |  FROM f CROSS JOIN generate_series(0, 2) s(j)),
             |px AS (
             |  SELECT f.frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    ((100 + f.frame_id) +
             |     ((p.i % 32) * 73 + (p.i // 32) * 149 + f.frame_id * 31)
             |       * 2654435761 % 97 +
             |     (SELECT coalesce(sum(st.flux_in_milli), 0) // 125
             |      FROM stars st
             |      WHERE st.frame_id = f.frame_id
             |        AND abs((p.i % 32) - st.sx) <= 1
             |        AND abs((p.i // 32) - st.sy) <= 1)) * 125 AS v
             |  FROM f CROSS JOIN generate_series(0, 1023) p(i)),
             |joined AS (
             |  SELECT st.frame_id, st.star, st.flux_in_milli, px.v,
             |    greatest(abs(px.x - st.sx), abs(px.y - st.sy)) AS cheb
             |  FROM stars st JOIN px ON px.frame_id = st.frame_id),
             |ap AS (
             |  SELECT frame_id, star, flux_in_milli,
             |    CAST(sum(v) AS BIGINT) AS ap_sum,
             |    CAST(count(*) AS BIGINT) AS n_ap
             |  FROM joined WHERE cheb <= 2 GROUP BY 1, 2, 3),
             |ann AS (
             |  SELECT frame_id, star, avg(v) AS bg,
             |    CAST(count(*) AS BIGINT) AS n_ann
             |  FROM joined WHERE cheb >= 4 AND cheb <= 5 GROUP BY 1, 2)
             |SELECT ap.frame_id, ap.star, ap.flux_in_milli, ap_sum, n_ap,
             |  n_ann,
             |  floor((ap_sum - CAST(n_ap AS DOUBLE) * bg) * 1e6 + 0.5) / 1e6
             |    AS flux_milli
             |FROM ap JOIN ann ON ap.frame_id = ann.frame_id
             |  AND ap.star = ann.star
             |ORDER BY ap.frame_id, ap.star""".stripMargin)),

    // FRAME REGISTRATION [PK — the astroalign-style alignment step
    // between raw frames and photometry, reduced to CATALOG space: a
    // survey's nightly frames are translation-dithered, and registration
    // recovers each frame's (dx, dy) against the reference by DELTA
    // VOTING — every magnitude-compatible star pair between the two
    // catalogs votes for its displacement, and the true offset is the
    // mode (full similarity transforms use triangle side-ratio invariants
    // the same way; the translation case is the nightly-dither workload).
    // Robustness is the point: each dithered frame DROPS some reference
    // stars and adds spurious detections, and the vote still lands —
    // recovered == injected is require'd in-query, with inlier counts
    // declared. All-integer positions, magnitudes, and votes → hash-exact
    // in both engines. Scale: candidates come from an EQUI-join on the
    // quantized magnitude (stars only meet within their mag class, never
    // all-pairs across catalogs); the vote is a (pair, dx, dy) count with
    // map-side partials; the winning mode is the determinized max-struct
    // argmax — one narrow shuffle per stage at any catalog size.
    QDef(
      "frame_registration",
      (s, dir) => {
        val nStars = 40L
        def h(seed: org.apache.spark.sql.Column, k: Long): org.apache.spark.sql.Column =
          (seed * 2654435761L + lit(k)) % 1000L
        // Reference catalog: deterministic star field (position + mag).
        val ref = s.range(0L, nStars)
          .select(col("id").as("star"),
            h(col("id") * 7L + 13L, 17L).as("x"),
            h(col("id") * 11L + 5L, 29L).as("y"),
            (col("id") % 8L + 100L).as("magq"))
        // Dithered frames 1..4: injected offsets, 1-in-5 stars dropped,
        // plus 6 spurious detections per frame.
        val frames = s.range(1L, 5L)
          .select(col("id").as("frame_id"),
            (col("id") * 17L - 40L).as("dx_true"),
            (lit(23L) - col("id") * 9L).as("dy_true"))
        val dithered = ref.crossJoin(frames)
          .where((col("star") + col("frame_id")) % 5L =!= 0L)
          .select(col("frame_id"), col("dx_true"), col("dy_true"),
            (col("x") + col("dx_true")).as("bx"),
            (col("y") + col("dy_true")).as("by"), col("magq"))
        val spurious = s.range(0L, 6L).crossJoin(frames)
          .select(col("frame_id"), col("dx_true"), col("dy_true"),
            h(col("id") * 13L + col("frame_id"), 7L).as("bx"),
            h(col("id") * 19L + col("frame_id"), 3L).as("by"),
            (col("id") * 3L % 8L + 100L).as("magq"))
        val detections = dithered.unionAll(spurious)
        // Delta voting: pairs meet ONLY within their magnitude class.
        val votes = detections.join(ref.select(col("x"), col("y"), col("magq")),
            Seq("magq"))
          .groupBy(col("frame_id"), col("dx_true"), col("dy_true"),
            (col("bx") - col("x")).as("dx"), (col("by") - col("y")).as("dy"))
          .agg(count(lit(1)).as("n_votes"))
        val won = votes
          .groupBy("frame_id", "dx_true", "dy_true")
          .agg(max(struct(col("n_votes"), (-col("dx")).as("ndx"),
            (-col("dy")).as("ndy"))).as("m"),
            sum("n_votes").cast("long").as("n_candidates"))
          .select(col("frame_id"),
            (-col("m.ndx")).as("dx"), (-col("m.ndy")).as("dy"),
            col("m.n_votes").as("n_inliers"), col("n_candidates"),
            col("dx_true"), col("dy_true"))
        // The vote must recover every injected dither exactly.
        require(won.where(col("dx") =!= col("dx_true") ||
            col("dy") =!= col("dy_true")).isEmpty,
          "delta voting failed to recover an injected offset")
        won.select("frame_id", "dx", "dy", "n_inliers", "n_candidates")
          .orderBy("frame_id")
      },
      Some("""WITH ref AS (
             |  SELECT i AS star,
             |    ((i * 7 + 13) * 2654435761 + 17) % 1000 AS x,
             |    ((i * 11 + 5) * 2654435761 + 29) % 1000 AS y,
             |    i % 8 + 100 AS magq
             |  FROM generate_series(0, 39) t(i)),
             |frames AS (
             |  SELECT f AS frame_id, f * 17 - 40 AS dx_true, 23 - f * 9 AS dy_true
             |  FROM generate_series(1, 4) t(f)),
             |dithered AS (
             |  SELECT frame_id, x + dx_true AS bx, y + dy_true AS by, magq
             |  FROM ref CROSS JOIN frames
             |  WHERE (star + frame_id) % 5 <> 0),
             |spurious AS (
             |  SELECT frame_id,
             |    ((i * 13 + frame_id) * 2654435761 + 7) % 1000 AS bx,
             |    ((i * 19 + frame_id) * 2654435761 + 3) % 1000 AS by,
             |    i * 3 % 8 + 100 AS magq
             |  FROM generate_series(0, 5) t(i) CROSS JOIN frames),
             |detections AS (
             |  SELECT * FROM dithered UNION ALL SELECT * FROM spurious),
             |votes AS (
             |  SELECT d.frame_id, d.bx - r.x AS dx, d.by - r.y AS dy,
             |    CAST(count(*) AS BIGINT) AS n_votes
             |  FROM detections d JOIN ref r USING (magq)
             |  GROUP BY 1, 2, 3),
             |won AS (
             |  SELECT frame_id, dx, dy, n_votes,
             |    CAST(sum(n_votes) OVER (PARTITION BY frame_id) AS BIGINT)
             |      AS n_candidates,
             |    row_number() OVER (PARTITION BY frame_id
             |      ORDER BY n_votes DESC, dx ASC, dy ASC) AS rn
             |  FROM votes)
             |SELECT frame_id, dx, dy, n_votes AS n_inliers, n_candidates
             |FROM won WHERE rn = 1 ORDER BY frame_id""".stripMargin)),

    // ASTROMETRIC PLATE SOLVE [PK — the astroalign mechanism (Beroiz,
    // Cabral & Sanchez 2020): full SIMILARITY-transform recovery via
    // triangle side-ratio invariants, generalizing frame_registration's
    // translation-only delta voting]. Each frame is related to the
    // reference by x' = a·x − b·y + dx, y' = b·x + a·y + dy with
    // (a, b) = scale·(cos θ, sin θ). Triangles are similarity-COVARIANT:
    // side lengths all scale by the same factor, so the ratios of squared
    // side lengths are exact invariants — and because the injected
    // rotations are Pythagorean-triple rationals (cos, sin) = (p/h, q/h)
    // over a catalog staged on the h-grid, every transformed coordinate,
    // every squared side, and every invariant is an exact INTEGER
    // identical in both engines (floor of equal rationals is equal, so
    // the truncated ratio quantization matches bit-for-bit between the
    // k²-scaled frame triangle and its reference counterpart). Matched
    // triangles vote: the two vertices opposite the longest and middle
    // sides determine (a, b) in milli units via an exact rational
    // division — candidates whose division carries a remainder are
    // dropped BEFORE the vote (the same rows in both engines, keeping
    // truncation semantics out of the result) — then (dx, dy) follow
    // linearly. The mode wins per frame; recovered == injected is
    // require'd with inlier counts declared, under dropped stars AND
    // spurious detections. Scale shape: triangles form within bounded
    // magnitude classes (3 chained equi-joins, candidates linear in
    // class-size³ with bounded classes — spatial cells at survey scale);
    // ref↔frame matching is an EQUI-join on (class, invariant pair),
    // never all-pairs; votes collapse map-side; the winner is the
    // determinized max-struct argmax.
    QDef(
      "frame_astrometry",
      (s, dir) => {
        import org.apache.spark.sql.Column
        val nStars = 32L
        def h(seed: Column, k: Long): Column =
          (seed * 2654435761L + lit(k)) % 200L
        // Reference catalog on the ×5 grid (h = 5 for the 3-4-5 rotations
        // below ⇒ all transformed coordinates are exact integers).
        val ref = s.range(0L, nStars)
          .select(col("id").as("star"),
            (h(col("id") * 7L + 13L, 17L) * 5L).as("x"),
            (h(col("id") * 11L + 5L, 29L) * 5L).as("y"),
            (col("id") % 8L + 100L).as("magq"))
        // Injected similarity transforms, (a, b) in milli units:
        // f1: rot(3/5, 4/5) scale 1; f2: rot(4/5, −3/5) scale 1;
        // f3: identity rotation scale 2; f4: rot(−4/5, 3/5) scale 2.
        val frames = s.range(1L, 5L)
          .select(col("id").as("frame_id"),
            expr("element_at(array(600L, 800L, 2000L, -1600L), cast(id as int))")
              .as("a_true"),
            expr("element_at(array(800L, -600L, 0L, 1200L), cast(id as int))")
              .as("b_true"),
            expr("element_at(array(-23L, 17L, 5L, -8L), cast(id as int))")
              .as("dx_true"),
            expr("element_at(array(31L, -40L, 9L, -15L), cast(id as int))")
              .as("dy_true"))
        val dithered = ref.crossJoin(frames) // 4-row broadcast fan-out
          .where((col("star") + col("frame_id")) % 5L =!= 0L)
          .select(col("frame_id"),
            (expr("(a_true * x - b_true * y) div 1000") + col("dx_true")).as("bx"),
            (expr("(b_true * x + a_true * y) div 1000") + col("dy_true")).as("by"),
            col("magq"))
        val spurious = s.range(0L, 6L).crossJoin(frames)
          .select(col("frame_id"),
            (((col("id") * 13L + col("frame_id")) * 2654435761L + lit(7L)) % 1000L).as("bx"),
            (((col("id") * 19L + col("frame_id")) * 2654435761L + lit(3L)) % 1000L).as("by"),
            (col("id") * 3L % 8L + 100L).as("magq"))
        val det = dithered.unionAll(spurious)
        // All 3-subsets within a class, enumerated by strict lexicographic
        // order on position (classes are bounded ⇒ linear candidates).
        def triangles(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
            px: String, py: String): org.apache.spark.sql.DataFrame = {
          def leg(n: Int) = df.select(
            keys.map(col) :+ col(px).as(s"x$n") :+ col(py).as(s"y$n"): _*)
          def lt(i: Int, j: Int) =
            col(s"x$i") < col(s"x$j") ||
              (col(s"x$i") === col(s"x$j") && col(s"y$i") < col(s"y$j"))
          leg(1).join(leg(2), keys).where(lt(1, 2))
            .join(leg(3), keys).where(lt(2, 3))
        }
        // Canonical vertex labels from the squared sides (s_i is the side
        // OPPOSITE vertex i): V1 faces the longest side, V2 the middle —
        // a labeling every similarity transform preserves exactly.
        // Triangles with tied sides are ambiguous and excluded.
        def canon(t: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
          def sq(i: Int, j: Int) =
            (col(s"x$i") - col(s"x$j")) * (col(s"x$i") - col(s"x$j")) +
              (col(s"y$i") - col(s"y$j")) * (col(s"y$i") - col(s"y$j"))
          def pick(of: String) =
            when(col("s1") > col("s2") && col("s1") > col("s3"), col(s"${of}1"))
              .when(col("s2") > col("s1") && col("s2") > col("s3"), col(s"${of}2"))
              .otherwise(col(s"${of}3"))
          def pickMid(of: String) =
            when((col("s1") > col("s2")) =!= (col("s1") > col("s3")), col(s"${of}1"))
              .when((col("s2") > col("s1")) =!= (col("s2") > col("s3")), col(s"${of}2"))
              .otherwise(col(s"${of}3"))
          t.withColumn("s1", sq(2, 3))
            .withColumn("s2", sq(1, 3))
            .withColumn("s3", sq(1, 2))
            .where(col("s1") =!= col("s2") && col("s1") =!= col("s3") &&
              col("s2") =!= col("s3"))
            .withColumn("v1x", pick("x")).withColumn("v1y", pick("y"))
            .withColumn("v2x", pickMid("x")).withColumn("v2y", pickMid("y"))
            .withColumn("smax", greatest(col("s1"), col("s2"), col("s3")))
            .withColumn("smin", least(col("s1"), col("s2"), col("s3")))
            .withColumn("smid",
              col("s1") + col("s2") + col("s3") - col("smax") - col("smin"))
            .withColumn("r1", expr("(1000 * smid) div smax"))
            .withColumn("r2", expr("(1000 * smin) div smax"))
        }
        val rt = canon(triangles(ref, Seq("magq"), "x", "y"))
          .select("magq", "r1", "r2", "v1x", "v1y", "v2x", "v2y")
        val ft = canon(triangles(det, Seq("frame_id", "magq"), "bx", "by"))
          .select(col("frame_id"), col("magq"), col("r1"), col("r2"),
            col("v1x").as("w1x"), col("v1y").as("w1y"),
            col("v2x").as("w2x"), col("v2y").as("w2y"))
        // Triangles meet ONLY within their invariant class; the exact-
        // division filter keeps the vote integer-identical cross-engine.
        val cand = ft.join(rt, Seq("magq", "r1", "r2"))
          .withColumn("ux", col("v2x") - col("v1x"))
          .withColumn("uy", col("v2y") - col("v1y"))
          .withColumn("vx", col("w2x") - col("w1x"))
          .withColumn("vy", col("w2y") - col("w1y"))
          .withColumn("den", col("ux") * col("ux") + col("uy") * col("uy"))
          .withColumn("dot", col("vx") * col("ux") + col("vy") * col("uy"))
          .withColumn("crs", col("vy") * col("ux") - col("vx") * col("uy"))
          .where(col("dot") * 1000L % col("den") === 0L &&
            col("crs") * 1000L % col("den") === 0L)
          .withColumn("am", expr("(dot * 1000) div den"))
          .withColumn("bm", expr("(crs * 1000) div den"))
          .withColumn("dxm",
            col("w1x") * 1000L - (col("am") * col("v1x") - col("bm") * col("v1y")))
          .withColumn("dym",
            col("w1y") * 1000L - (col("bm") * col("v1x") + col("am") * col("v1y")))
        val votes = cand.groupBy("frame_id", "am", "bm", "dxm", "dym")
          .agg(count(lit(1)).as("n_votes"))
        val won = votes.groupBy("frame_id")
          .agg(max(struct(col("n_votes"), (-col("am")).as("na"),
            (-col("bm")).as("nb"), (-col("dxm")).as("nx"),
            (-col("dym")).as("ny"))).as("m"),
            sum("n_votes").cast("long").as("n_candidates"))
          .select(col("frame_id"), (-col("m.na")).as("am"),
            (-col("m.nb")).as("bm"),
            expr("(-m.nx) div 1000").as("dx"), expr("(-m.ny) div 1000").as("dy"),
            col("m.n_votes").as("n_inliers"), col("n_candidates"))
        // The solve must recover every injected transform exactly.
        val checkedPre = won.join(broadcast(frames), Seq("frame_id"))
        lastAstrometryPlan =
          checkedPre.queryExecution.executedPlan.toString
        val checked = checkedPre
          .localCheckpoint() // one vote computation feeds require + output
        require(checked.count() == 4L,
          "a frame produced no plate-solve candidates at all")
        require(checked.where(col("am") =!= col("a_true") ||
            col("bm") =!= col("b_true") || col("dx") =!= col("dx_true") ||
            col("dy") =!= col("dy_true")).isEmpty,
          "triangle voting failed to recover an injected similarity transform")
        checked.select(col("frame_id"), col("am").as("cos_scale_milli"),
            col("bm").as("sin_scale_milli"),
            expr("(am * am + bm * bm) div 1000").as("scale_sq_milli"),
            col("dx"), col("dy"), col("n_inliers"), col("n_candidates"))
          .orderBy("frame_id")
      },
      Some("""WITH ref AS (
             |  SELECT i AS star,
             |    (((i * 7 + 13) * 2654435761 + 17) % 200) * 5 AS x,
             |    (((i * 11 + 5) * 2654435761 + 29) % 200) * 5 AS y,
             |    i % 8 + 100 AS magq
             |  FROM generate_series(0, 31) t(i)),
             |frames AS (
             |  SELECT f AS frame_id,
             |    [600, 800, 2000, -1600][CAST(f AS INT)] AS a_true,
             |    [800, -600, 0, 1200][CAST(f AS INT)] AS b_true,
             |    [-23, 17, 5, -8][CAST(f AS INT)] AS dx_true,
             |    [31, -40, 9, -15][CAST(f AS INT)] AS dy_true
             |  FROM generate_series(1, 4) t(f)),
             |det AS (
             |  SELECT frame_id,
             |    (a_true * x - b_true * y) // 1000 + dx_true AS bx,
             |    (b_true * x + a_true * y) // 1000 + dy_true AS by, magq
             |  FROM ref CROSS JOIN frames WHERE (star + frame_id) % 5 <> 0
             |  UNION ALL
             |  SELECT frame_id,
             |    ((i * 13 + frame_id) * 2654435761 + 7) % 1000 AS bx,
             |    ((i * 19 + frame_id) * 2654435761 + 3) % 1000 AS by,
             |    i * 3 % 8 + 100 AS magq
             |  FROM generate_series(0, 5) t(i) CROSS JOIN frames),
             |rtri AS (
             |  SELECT a.magq, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2,
             |    c.x AS x3, c.y AS y3
             |  FROM ref a
             |  JOIN ref b ON a.magq = b.magq
             |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
             |  JOIN ref c ON b.magq = c.magq
             |    AND (b.x < c.x OR (b.x = c.x AND b.y < c.y))),
             |rsides AS (
             |  SELECT magq,
             |    (x2-x3)*(x2-x3) + (y2-y3)*(y2-y3) AS s1,
             |    (x1-x3)*(x1-x3) + (y1-y3)*(y1-y3) AS s2,
             |    (x1-x2)*(x1-x2) + (y1-y2)*(y1-y2) AS s3,
             |    x1, y1, x2, y2, x3, y3
             |  FROM rtri),
             |rt AS (
             |  SELECT magq,
             |    (1000 * (s1+s2+s3 - greatest(s1,s2,s3) - least(s1,s2,s3)))
             |      // greatest(s1,s2,s3) AS r1,
             |    (1000 * least(s1,s2,s3)) // greatest(s1,s2,s3) AS r2,
             |    CASE WHEN s1 > s2 AND s1 > s3 THEN x1
             |         WHEN s2 > s1 AND s2 > s3 THEN x2 ELSE x3 END AS v1x,
             |    CASE WHEN s1 > s2 AND s1 > s3 THEN y1
             |         WHEN s2 > s1 AND s2 > s3 THEN y2 ELSE y3 END AS v1y,
             |    CASE WHEN (s1 > s2) <> (s1 > s3) THEN x1
             |         WHEN (s2 > s1) <> (s2 > s3) THEN x2 ELSE x3 END AS v2x,
             |    CASE WHEN (s1 > s2) <> (s1 > s3) THEN y1
             |         WHEN (s2 > s1) <> (s2 > s3) THEN y2 ELSE y3 END AS v2y
             |  FROM rsides WHERE s1 <> s2 AND s1 <> s3 AND s2 <> s3),
             |ftri AS (
             |  SELECT a.frame_id, a.magq, a.bx AS x1, a.by AS y1,
             |    b.bx AS x2, b.by AS y2, c.bx AS x3, c.by AS y3
             |  FROM det a
             |  JOIN det b ON a.frame_id = b.frame_id AND a.magq = b.magq
             |    AND (a.bx < b.bx OR (a.bx = b.bx AND a.by < b.by))
             |  JOIN det c ON b.frame_id = c.frame_id AND b.magq = c.magq
             |    AND (b.bx < c.bx OR (b.bx = c.bx AND b.by < c.by))),
             |fsides AS (
             |  SELECT frame_id, magq,
             |    (x2-x3)*(x2-x3) + (y2-y3)*(y2-y3) AS s1,
             |    (x1-x3)*(x1-x3) + (y1-y3)*(y1-y3) AS s2,
             |    (x1-x2)*(x1-x2) + (y1-y2)*(y1-y2) AS s3,
             |    x1, y1, x2, y2, x3, y3
             |  FROM ftri),
             |ft AS (
             |  SELECT frame_id, magq,
             |    (1000 * (s1+s2+s3 - greatest(s1,s2,s3) - least(s1,s2,s3)))
             |      // greatest(s1,s2,s3) AS r1,
             |    (1000 * least(s1,s2,s3)) // greatest(s1,s2,s3) AS r2,
             |    CASE WHEN s1 > s2 AND s1 > s3 THEN x1
             |         WHEN s2 > s1 AND s2 > s3 THEN x2 ELSE x3 END AS w1x,
             |    CASE WHEN s1 > s2 AND s1 > s3 THEN y1
             |         WHEN s2 > s1 AND s2 > s3 THEN y2 ELSE y3 END AS w1y,
             |    CASE WHEN (s1 > s2) <> (s1 > s3) THEN x1
             |         WHEN (s2 > s1) <> (s2 > s3) THEN x2 ELSE x3 END AS w2x,
             |    CASE WHEN (s1 > s2) <> (s1 > s3) THEN y1
             |         WHEN (s2 > s1) <> (s2 > s3) THEN y2 ELSE y3 END AS w2y
             |  FROM fsides WHERE s1 <> s2 AND s1 <> s3 AND s2 <> s3),
             |cand AS (
             |  SELECT ft.frame_id,
             |    (ft.w2x - ft.w1x) * (rt.v2x - rt.v1x)
             |      + (ft.w2y - ft.w1y) * (rt.v2y - rt.v1y) AS dot,
             |    (ft.w2y - ft.w1y) * (rt.v2x - rt.v1x)
             |      - (ft.w2x - ft.w1x) * (rt.v2y - rt.v1y) AS crs,
             |    (rt.v2x - rt.v1x) * (rt.v2x - rt.v1x)
             |      + (rt.v2y - rt.v1y) * (rt.v2y - rt.v1y) AS den,
             |    rt.v1x, rt.v1y, ft.w1x, ft.w1y
             |  FROM ft JOIN rt ON ft.magq = rt.magq
             |    AND ft.r1 = rt.r1 AND ft.r2 = rt.r2),
             |ex AS (
             |  SELECT frame_id, (dot * 1000) // den AS am,
             |    (crs * 1000) // den AS bm,
             |    w1x, w1y, v1x, v1y
             |  FROM cand
             |  WHERE dot * 1000 % den = 0 AND crs * 1000 % den = 0),
             |votes AS (
             |  SELECT frame_id, am, bm,
             |    w1x * 1000 - (am * v1x - bm * v1y) AS dxm,
             |    w1y * 1000 - (bm * v1x + am * v1y) AS dym,
             |    CAST(count(*) AS BIGINT) AS n_votes
             |  FROM ex GROUP BY 1, 2, 3, 4, 5),
             |won AS (
             |  SELECT frame_id, am, bm, dxm, dym, n_votes,
             |    CAST(sum(n_votes) OVER (PARTITION BY frame_id) AS BIGINT)
             |      AS n_candidates,
             |    row_number() OVER (PARTITION BY frame_id
             |      ORDER BY n_votes DESC, am ASC, bm ASC, dxm ASC, dym ASC)
             |      AS rn
             |  FROM votes)
             |SELECT frame_id, am AS cos_scale_milli, bm AS sin_scale_milli,
             |  (am * am + bm * bm) // 1000 AS scale_sq_milli,
             |  dxm // 1000 AS dx, dym // 1000 AS dy,
             |  n_votes AS n_inliers, n_candidates
             |FROM won WHERE rn = 1 ORDER BY frame_id""".stripMargin)),

    // DIFFERENCE IMAGING [PK — the image-subtraction transient search at
    // the heart of time-domain surveys (ZTF/LSST alert pipelines): science
    // frame minus reference reveals what CHANGED]. Reduced to the repo's
    // deterministic pixel model: a static scene (integer hash background —
    // fixed stars cancel in the difference by construction), a flat
    // per-frame sky offset, and PEAKED transients (amplitude A at the
    // center, A/2 on the 8 neighbors) injected into the odd frames at
    // literal positions. The pipeline re-derives everything the injector
    // knew: per-frame sky = the determinized MODE of the pixel difference
    // (count argmax, ties → smallest value), residual = difference − sky,
    // detections = residual ≥ threshold, and a source CENTER = a detected
    // pixel strictly brighter than all 8 neighbors (the peaked profile
    // makes the max unique — flat profiles are exactly why real pipelines
    // fit PSFs). recovered == injected is require'd (position AND flux =
    // 5A exactly, since flux = A + 8·(A div 2) with A even); frames
    // without transients must yield zero detections. All-integer
    // arithmetic end to end ⇒ hash-exact. Scale shape: the difference is
    // frame-local (at archive scale each aligned frame pair diffs
    // MAP-SIDE — pixels never shuffle across frames); the sky mode
    // collapses into (frame, value) partials before its shuffle; only the
    // SPARSE detections enter the neighbor probe, a bounded ≤9-cell
    // equi-join like frame_photometry's — candidates linear in detections,
    // never pixels × pixels.
    QDef(
      "frame_difference",
      (s, dir) => {
        import org.apache.spark.sql.Column
        val grid = 32L
        val thresh = 200L
        // Injected transients: (frame_id, x, y, amp) — odd frames only,
        // boxes ≥ 4 apart (Chebyshev) so profiles never blend.
        val inj = s.range(0L, 6L)
          .select(col("id"),
            expr("element_at(array(1L, 1L, 3L, 3L, 5L, 5L), cast(id + 1 as int))")
              .as("frame_id"),
            expr("element_at(array(6L, 24L, 9L, 22L, 15L, 27L), cast(id + 1 as int))")
              .as("tx"),
            expr("element_at(array(8L, 19L, 25L, 6L, 14L, 27L), cast(id + 1 as int))")
              .as("ty"),
            (lit(400L) + col("id") % 2L * 150L +
              expr("element_at(array(1L, 1L, 3L, 3L, 5L, 5L), cast(id + 1 as int))")
                * 10L).as("amp"))
          .drop("id")
        // Science frames 0..6: static scene + flat sky(7·i) + transients.
        val px = s.range(0L, 7L).select(col("id").as("frame_id"))
          .crossJoin(s.range(0L, grid * grid).select(
            expr(s"id % $grid").as("x"), expr(s"id div $grid").as("y")))
          .withColumn("base",
            lit(100L) + (col("x") * 73L + col("y") * 149L) * 2654435761L % 97L)
          .join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              greatest(abs(col("x") - col("tx")), abs(col("y") - col("ty"))) <= 1L,
            "left")
          .groupBy("frame_id", "x", "y", "base")
          .agg(sum(when(col("tx") === col("x") && col("ty") === col("y"),
              col("amp")).otherwise(expr("amp div 2"))).as("tr"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("base") + col("frame_id") * 7L + coalesce(col("tr"), lit(0L)))
              .as("v"))
        // Difference vs the reference epoch (frame 0): the static scene
        // cancels pixel-for-pixel; the 1024-row reference side broadcasts.
        val refpx = px.where(col("frame_id") === 0L)
          .select(col("x"), col("y"), col("v").as("v0"))
        val diff = px.where(col("frame_id") > 0L)
          .join(broadcast(refpx), Seq("x", "y"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("v") - col("v0")).as("d"))
        // Per-frame sky = determinized mode of the difference.
        val sky = diff.groupBy("frame_id", "d").agg(count(lit(1)).as("n"))
          .groupBy("frame_id")
          .agg(max(struct(col("n"), (-col("d")).as("nd"))).as("m"))
          .select(col("frame_id"), (-col("m.nd")).as("sky"))
        val resid = diff.join(broadcast(sky), Seq("frame_id"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("d") - col("sky")).as("r"))
        val det = resid.where(col("r") >= thresh)
        // A center is strictly brighter than all 8 neighbors; the probe
        // joins the SPARSE detections back to the residual image.
        val centers = det.select(col("frame_id"), col("x"), col("y"),
            col("r").as("peak"))
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .join(resid.select(col("frame_id").as("nfr"), col("x").as("nx"),
              col("y").as("ny"), col("r").as("nr")),
            col("nfr") === col("frame_id") &&
              col("nx") === col("x") + col("dcx") &&
              col("ny") === col("y") + col("dcy"))
          .groupBy("frame_id", "x", "y", "peak")
          .agg(sum(when(col("dcx") =!= 0L || col("dcy") =!= 0L,
              when(col("nr") >= col("peak"), 1L).otherwise(0L))
            .otherwise(0L)).as("n_ge"),
            sum(col("nr")).as("flux"),
            sum(when(col("nr") >= thresh, 1L).otherwise(0L)).as("n_px"))
          .where(col("n_ge") === 0L)
          .select(col("frame_id"), col("x"), col("y"), col("peak"),
            col("flux"), col("n_px"))
        // The subtraction must recover every injected transient exactly —
        // position, peak amplitude, and total flux 5A — and nothing else.
        val checked = centers
          .join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              col("x") === col("tx") && col("y") === col("ty"), "full")
          .localCheckpoint()
        require(checked.where(col("ifr").isNull || col("peak").isNull).isEmpty,
          "difference imaging missed an injected transient or detected a ghost")
        require(checked.where(col("peak") =!= col("amp") ||
            col("flux") =!= col("amp") * 5L || col("n_px") =!= 9L).isEmpty,
          "a recovered transient's photometry diverged from the injection")
        checked.join(broadcast(sky), Seq("frame_id"))
          .select(col("frame_id"), col("x"), col("y"), col("peak"),
            col("flux"), col("n_px"), col("sky"))
          .orderBy("frame_id", "x")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 6, 8, 410), (1, 24, 19, 560), (3, 9, 25, 430),
             |    (3, 22, 6, 580), (5, 15, 14, 450), (5, 27, 27, 600))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0) AS v
             |  FROM generate_series(0, 6) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |diff AS (
             |  SELECT a.frame_id, a.x, a.y, a.v - b.v AS d
             |  FROM px a JOIN px b ON b.frame_id = 0
             |    AND a.x = b.x AND a.y = b.y
             |  WHERE a.frame_id > 0),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT frame_id, d, row_number() OVER (PARTITION BY frame_id
             |      ORDER BY count(*) DESC, d ASC) AS rn
             |    FROM diff GROUP BY frame_id, d) WHERE rn = 1),
             |resid AS (
             |  SELECT diff.frame_id, x, y, d - sky AS r
             |  FROM diff JOIN sky USING (frame_id)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y, c.r AS peak,
             |    CAST(sum(n.r) AS BIGINT) AS flux,
             |    CAST(sum(CASE WHEN n.r >= 200 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_px
             |  FROM resid c JOIN resid n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.r >= 200
             |  GROUP BY c.frame_id, c.x, c.y, c.r
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.r >= c.r THEN 1 ELSE 0 END) = 0)
             |SELECT c.frame_id, c.x, c.y, c.peak, c.flux, c.n_px, s.sky
             |FROM centers c JOIN sky s USING (frame_id)
             |ORDER BY c.frame_id, c.x""".stripMargin)),

    // MEDIAN COADD [PK — image stacking, the survey's deep-reference
    // builder: N aligned exposures collapse into one image whose per-pixel
    // MEDIAN rejects anything not present in most frames (transients,
    // cosmic rays) — the rejection property IS the operator]. Same pixel
    // model as frame_difference: static scene, flat per-frame sky,
    // peaked transients in the odd frames. Each frame first ALIGNS
    // photometrically (subtract the determinized mode of its difference
    // against the epoch-0 exposure — the same sky estimator), then the
    // stack is the exact element_at(array_sort(collect_list), 4) median
    // of the 7 aligned values per pixel — integer, no FP, no
    // interpolation. The rejection law is require'd pixel-for-pixel:
    // stack == static scene on ALL 1024 pixels (every injected transient
    // lands in exactly one frame per pixel, so 6 of 7 values are clean),
    // while the MEAN coadd provably diverges on exactly the 54 transient
    // pixels — declared per row band as n_hot with the rejected excess
    // flux. Scale shape: alignment reuses the map-side-collapsing mode;
    // the stack itself is ONE groupBy(x, y) over (pixel, frame) rows —
    // at archive scale the shuffle partitions by sky tile and each tile
    // stacks independently; collect_list is bounded by the stack DEPTH
    // (7 here, dozens in practice), never by the corpus.
    QDef(
      "frame_stack",
      (s, dir) => {
        val grid = 32L
        val inj = s.range(0L, 6L)
          .select(col("id"),
            expr("element_at(array(1L, 1L, 3L, 3L, 5L, 5L), cast(id + 1 as int))")
              .as("frame_id"),
            expr("element_at(array(6L, 24L, 9L, 22L, 15L, 27L), cast(id + 1 as int))")
              .as("tx"),
            expr("element_at(array(8L, 19L, 25L, 6L, 14L, 27L), cast(id + 1 as int))")
              .as("ty"),
            (lit(400L) + col("id") % 2L * 150L +
              expr("element_at(array(1L, 1L, 3L, 3L, 5L, 5L), cast(id + 1 as int))")
                * 10L).as("amp"))
          .drop("id")
        val px = s.range(0L, 7L).select(col("id").as("frame_id"))
          .crossJoin(s.range(0L, grid * grid).select(
            expr(s"id % $grid").as("x"), expr(s"id div $grid").as("y")))
          .withColumn("base",
            lit(100L) + (col("x") * 73L + col("y") * 149L) * 2654435761L % 97L)
          .join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              greatest(abs(col("x") - col("tx")), abs(col("y") - col("ty"))) <= 1L,
            "left")
          .groupBy("frame_id", "x", "y", "base")
          .agg(sum(when(col("tx") === col("x") && col("ty") === col("y"),
              col("amp")).otherwise(expr("amp div 2"))).as("tr"))
          .select(col("frame_id"), col("x"), col("y"), col("base"),
            (col("base") + col("frame_id") * 7L + coalesce(col("tr"), lit(0L)))
              .as("v"))
        val refpx = px.where(col("frame_id") === 0L)
          .select(col("x"), col("y"), col("v").as("v0"))
        val sky = px.join(broadcast(refpx), Seq("x", "y"))
          .select(col("frame_id"), (col("v") - col("v0")).as("d"))
          .groupBy("frame_id", "d").agg(count(lit(1)).as("n"))
          .groupBy("frame_id")
          .agg(max(struct(col("n"), (-col("d")).as("nd"))).as("m"))
          .select(col("frame_id"), (-col("m.nd")).as("sky"))
        val aligned = px.join(broadcast(sky), Seq("frame_id"))
          .select(col("frame_id"), col("x"), col("y"), col("base"),
            (col("v") - col("sky")).as("av"))
        val stacked = aligned.groupBy("x", "y", "base")
          .agg(expr("element_at(array_sort(collect_list(av)), 4)").as("stack"),
            sum("av").as("s7"), count(lit(1)).as("nf"))
          .localCheckpoint() // one stack feeds both laws and the rollup
        require(stacked.where(col("nf") =!= 7L).isEmpty,
          "a pixel lost a frame before stacking")
        // The rejection law: the median coadd IS the static scene.
        require(stacked.where(col("stack") =!= col("base")).isEmpty,
          "the median stack failed to reject an injected transient")
        // The mean coadd diverges on exactly the 54 transient pixels.
        require(stacked.where(col("s7") =!= col("stack") * 7L).count() == 54L,
          "the mean-vs-median divergence set is not the injected pixel set")
        stacked.groupBy("y")
          .agg(sum("stack").cast("long").as("sum_stack"),
            sum(when(col("s7") =!= col("stack") * 7L, 1L).otherwise(0L))
              .cast("long").as("n_hot"),
            sum(col("s7") - col("stack") * 7L).cast("long").as("sum_excess"))
          .orderBy("y")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 6, 8, 410), (1, 24, 19, 560), (3, 9, 25, 430),
             |    (3, 22, 6, 580), (5, 15, 14, 450), (5, 27, 27, 600))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      AS base,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0) AS v
             |  FROM generate_series(0, 6) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT a.frame_id, a.v - b.v AS d, row_number() OVER (
             |      PARTITION BY a.frame_id ORDER BY count(*) DESC, a.v - b.v ASC)
             |      AS rn
             |    FROM px a JOIN px b ON b.frame_id = 0 AND a.x = b.x
             |      AND a.y = b.y
             |    GROUP BY a.frame_id, a.v - b.v) WHERE rn = 1),
             |aligned AS (
             |  SELECT x, y, base, v - sky AS av
             |  FROM px JOIN sky USING (frame_id)),
             |stacked AS (
             |  SELECT x, y, base,
             |    CAST(quantile_disc(av, 0.5) AS BIGINT) AS stack,
             |    CAST(sum(av) AS BIGINT) AS s7
             |  FROM aligned GROUP BY x, y, base)
             |SELECT y, CAST(sum(stack) AS BIGINT) AS sum_stack,
             |  CAST(sum(CASE WHEN s7 <> stack * 7 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_hot,
             |  CAST(sum(s7 - stack * 7) AS BIGINT) AS sum_excess
             |FROM stacked GROUP BY y ORDER BY y""".stripMargin)),

    // SOURCE SHAPE MOMENTS [PK — SExtractor's windowed-moment measurement:
    // flux-weighted centroid and second central moments are how a survey
    // measures source position, size, and elongation; the ellipticity
    // moments feed star/galaxy separation and PSF monitoring]. Detection
    // is blind (threshold + strict 8-neighbor local max on the raw image,
    // frame_difference's discipline); per source the 3×3 probe collects
    // pedestal-subtracted pixel weights and ALL moment numerators as
    // integer sums — the two divisions and one square happen ONCE at the
    // end on identical integer operands, so the doubles agree bit-for-bit
    // cross-engine before the single 1e-6 rounding (the lc-family
    // moments discipline). recovered == injected require'd for all 8
    // sources, and each centroid must land within half a pixel of its
    // injected center. Scale: candidates = SPARSE thresholded pixels
    // only; the probe is the bounded ≤9-cell equi-join; moment partials
    // collapse map-side — at survey scale this is a per-tile scan
    // emitting one 8-number row per detected source.
    QDef(
      "frame_moments",
      (s, dir) => {
        val grid = 32L
        val inj = s.range(0L, 8L)
          .select(col("id"),
            expr("element_at(array(0L,0L,1L,1L,2L,2L,3L,3L), cast(id + 1 as int))")
              .as("frame_id"),
            expr("element_at(array(6L,24L,9L,22L,15L,27L,11L,20L), cast(id + 1 as int))")
              .as("tx"),
            expr("element_at(array(8L,19L,25L,6L,14L,27L,11L,26L), cast(id + 1 as int))")
              .as("ty"),
            (lit(400L) + col("id") % 2L * 150L +
              expr("element_at(array(0L,0L,1L,1L,2L,2L,3L,3L), cast(id + 1 as int))")
                * 20L).as("amp"))
          .drop("id")
        val px = s.range(0L, 4L).select(col("id").as("frame_id"))
          .crossJoin(s.range(0L, grid * grid).select(
            expr(s"id % $grid").as("x"), expr(s"id div $grid").as("y")))
          .withColumn("base",
            lit(100L) + (col("x") * 73L + col("y") * 149L) * 2654435761L % 97L)
          .join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              greatest(abs(col("x") - col("tx")), abs(col("y") - col("ty"))) <= 1L,
            "left")
          .groupBy("frame_id", "x", "y", "base")
          .agg(sum(when(col("tx") === col("x") && col("ty") === col("y"),
              col("amp")).otherwise(expr("amp div 2"))).as("tr"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("base") + coalesce(col("tr"), lit(0L))).as("v"))
        val cand = px.where(col("v") >= 250L)
        val probed = cand.select(col("frame_id"), col("x"), col("y"),
            col("v").as("vc"))
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .join(px.select(col("frame_id").as("nfr"), col("x").as("nx"),
              col("y").as("ny"), col("v").as("nv")),
            col("nfr") === col("frame_id") &&
              col("nx") === col("x") + col("dcx") &&
              col("ny") === col("y") + col("dcy"))
        val centers = probed
          .groupBy("frame_id", "x", "y", "vc")
          .agg(sum(when((col("dcx") =!= 0L || col("dcy") =!= 0L) &&
              col("nv") >= col("vc"), 1L).otherwise(0L)).as("n_ge"),
            sum(col("nv") - 100L).as("sw"),
            sum(col("nx") * (col("nv") - 100L)).as("sx"),
            sum(col("ny") * (col("nv") - 100L)).as("sy"),
            sum(col("nx") * col("nx") * (col("nv") - 100L)).as("sxx"),
            sum(col("ny") * col("ny") * (col("nv") - 100L)).as("syy"),
            sum(col("nx") * col("ny") * (col("nv") - 100L)).as("sxy"))
          .where(col("n_ge") === 0L)
        val out = centers.select(col("frame_id"), col("x"), col("y"),
            col("sw").as("flux"),
            rnd(col("sx") / col("sw"), 6).as("cx"),
            rnd(col("sy") / col("sw"), 6).as("cy"),
            rnd(col("sxx") / col("sw")
              - (col("sx") / col("sw")) * (col("sx") / col("sw")), 6).as("mxx"),
            rnd(col("syy") / col("sw")
              - (col("sy") / col("sw")) * (col("sy") / col("sw")), 6).as("myy"),
            rnd(col("sxy") / col("sw")
              - (col("sx") / col("sw")) * (col("sy") / col("sw")), 6).as("mxy"))
          .localCheckpoint() // one detection pass feeds the laws and output
        val chk = out.join(inj.withColumnRenamed("frame_id", "ifr"),
          col("frame_id") === col("ifr") &&
            col("x") === col("tx") && col("y") === col("ty"), "full")
        require(chk.where(col("ifr").isNull || col("flux").isNull).isEmpty,
          "moment measurement missed an injected source or found a ghost")
        require(out.where(abs(col("cx") - col("x").cast("double")) > 0.5 ||
            abs(col("cy") - col("y").cast("double")) > 0.5).isEmpty,
          "a flux-weighted centroid drifted more than half a pixel")
        out.orderBy("frame_id", "x")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (0, 6, 8, 400), (0, 24, 19, 550), (1, 9, 25, 420),
             |    (1, 22, 6, 570), (2, 15, 14, 440), (2, 27, 27, 590),
             |    (3, 11, 11, 460), (3, 20, 26, 610))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 3) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(sum(n.v - 100) AS BIGINT) AS sw,
             |    CAST(sum(n.x * (n.v - 100)) AS BIGINT) AS sx,
             |    CAST(sum(n.y * (n.v - 100)) AS BIGINT) AS sy,
             |    CAST(sum(n.x * n.x * (n.v - 100)) AS BIGINT) AS sxx,
             |    CAST(sum(n.y * n.y * (n.v - 100)) AS BIGINT) AS syy,
             |    CAST(sum(n.x * n.y * (n.v - 100)) AS BIGINT) AS sxy
             |  FROM px c JOIN px n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.v >= 250
             |  GROUP BY c.frame_id, c.x, c.y, c.v
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.v >= c.v THEN 1 ELSE 0 END) = 0)
             |SELECT frame_id, x, y, sw AS flux,
             |  floor((sx / sw) * 1e6 + 0.5) / 1e6 AS cx,
             |  floor((sy / sw) * 1e6 + 0.5) / 1e6 AS cy,
             |  floor((sxx / sw - (sx / sw) * (sx / sw)) * 1e6 + 0.5) / 1e6
             |    AS mxx,
             |  floor((syy / sw - (sy / sw) * (sy / sw)) * 1e6 + 0.5) / 1e6
             |    AS myy,
             |  floor((sxy / sw - (sx / sw) * (sy / sw)) * 1e6 + 0.5) / 1e6
             |    AS mxy
             |FROM centers ORDER BY frame_id, x""".stripMargin)),

    // PSF FITTING FROM MOMENT SUMS [PK — the PSFEx/SExtractor stage real
    // pipelines run after shape moments: the second central moments ARE
    // the elliptical-Gaussian PSF fit in moment form — eigenvalues of the
    // covariance give the major/minor FWHM, the eigenvector the position
    // angle, their ratio the ellipticity; focus monitoring and
    // star/galaxy separation read exactly these numbers]. The scene is a
    // calibration field: flat background + 8 injected anisotropic
    // quadratic stamps A·(B − P·dx² − Q·dy² − R·dx·dy) whose moment
    // numerators are known CLOSED-FORM integers (Σv = A(9B−6P−6Q),
    // Σdx²v = A(6B−6P−4Q), Σdxdyv = −4AR), so recovered == injected is
    // require'd as INTEGER cross-multiplied identities on all four
    // moment sums — no tolerance anywhere. The eigen-decomposition is
    // end-only double arithmetic on identical integer operands: +,−,×,÷,
    // sqrt are IEEE correctly-rounded in both engines, so fwhm/
    // ellipticity agree bit-for-bit before the single grid rounding; the
    // position angle uses atan2 (libm, engine-approximate in the last
    // ulp) rounded onto the 1e-3 grid — the lc_alerts VALUE-level bet,
    // not a structural boundary. Scale: identical to frame_moments —
    // candidates are the sparse thresholded pixels, the probe is the
    // bounded ≤9-cell equi-join, moment partials collapse map-side; one
    // 8-number row per source leaves the tile.
    QDef(
      "frame_psf",
      (s, dir) => {
        val grid = 32L
        val inj = s.range(0L, 8L).select(
          expr("element_at(array(0L,0L,1L,1L,2L,2L,3L,3L), cast(id+1 as int))")
            .as("frame_id"),
          expr("element_at(array(6L,24L,9L,22L,15L,27L,11L,20L), cast(id+1 as int))")
            .as("tx"),
          expr("element_at(array(8L,19L,25L,6L,14L,27L,11L,26L), cast(id+1 as int))")
            .as("ty"),
          expr("element_at(array(40L,50L,45L,55L,60L,42L,48L,52L), cast(id+1 as int))")
            .as("amp"),
          lit(10L).as("pb"),
          expr("element_at(array(2L,1L,3L,2L,2L,1L,3L,2L), cast(id+1 as int))")
            .as("pp"),
          expr("element_at(array(2L,3L,1L,2L,2L,2L,2L,3L), cast(id+1 as int))")
            .as("pq"),
          expr("element_at(array(0L,0L,0L,1L,-1L,1L,-1L,1L), cast(id+1 as int))")
            .as("pr"))
        val px = s.range(0L, 4L).select(col("id").as("frame_id"))
          .crossJoin(s.range(0L, grid * grid).select(
            expr(s"id % $grid").as("x"), expr(s"id div $grid").as("y")))
          .join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              greatest(abs(col("x") - col("tx")), abs(col("y") - col("ty"))) <= 1L,
            "left")
          .select(col("frame_id"), col("x"), col("y"),
            (lit(100L) + coalesce(col("amp") * (col("pb")
              - col("pp") * (col("x") - col("tx")) * (col("x") - col("tx"))
              - col("pq") * (col("y") - col("ty")) * (col("y") - col("ty"))
              - col("pr") * (col("x") - col("tx")) * (col("y") - col("ty"))),
              lit(0L))).as("v"))
        val cand = px.where(col("v") >= 250L)
        val centers = cand.select(col("frame_id"), col("x"), col("y"),
            col("v").as("vc"))
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .join(px.select(col("frame_id").as("nfr"), col("x").as("nx"),
              col("y").as("ny"), col("v").as("nv")),
            col("nfr") === col("frame_id") &&
              col("nx") === col("x") + col("dcx") &&
              col("ny") === col("y") + col("dcy"))
          .groupBy("frame_id", "x", "y", "vc")
          .agg(sum(when((col("dcx") =!= 0L || col("dcy") =!= 0L) &&
              col("nv") >= col("vc"), 1L).otherwise(0L)).as("n_ge"),
            sum(col("nv") - 100L).as("sw"),
            sum(col("nx") * (col("nv") - 100L)).as("sx"),
            sum(col("ny") * (col("nv") - 100L)).as("sy"),
            sum(col("nx") * col("nx") * (col("nv") - 100L)).as("sxx"),
            sum(col("ny") * col("ny") * (col("nv") - 100L)).as("syy"),
            sum(col("nx") * col("ny") * (col("nv") - 100L)).as("sxy"))
          .where(col("n_ge") === 0L)
          .localCheckpoint() // one moment pass feeds the laws and output
        val lawJ = centers.join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              col("x") === col("tx") && col("y") === col("ty"), "full")
          .localCheckpoint()
        require(lawJ.where(col("ifr").isNull || col("sw").isNull).isEmpty,
          "the PSF pass missed an injected source or found a ghost")
        // recovered == injected, cross-multiplied to stay in integers:
        // central numerator (sw·sᵢⱼ − sᵢsⱼ) over sw² must equal the
        // closed-form injected moment over its Σv — with Σv also matched,
        // both reduce to one integer equality per moment.
        val badMoment = lawJ
          .withColumn("isw",
            col("amp") * (lit(9L) * col("pb") - lit(6L) * col("pp")
              - lit(6L) * col("pq")))
          .withColumn("ixx",
            col("amp") * (lit(6L) * col("pb") - lit(6L) * col("pp")
              - lit(4L) * col("pq")))
          .withColumn("iyy",
            col("amp") * (lit(6L) * col("pb") - lit(4L) * col("pp")
              - lit(6L) * col("pq")))
          .withColumn("ixy", lit(-4L) * col("amp") * col("pr"))
          .where(col("sw") =!= col("isw") ||
            col("sw") * col("sxx") - col("sx") * col("sx")
              =!= col("ixx") * col("sw") ||
            col("sw") * col("syy") - col("sy") * col("sy")
              =!= col("iyy") * col("sw") ||
            col("sw") * col("sxy") - col("sx") * col("sy")
              =!= col("ixy") * col("sw"))
        require(badMoment.isEmpty,
          "a recovered second moment diverged from its injected closed form")
        centers
          .withColumn("cmxx",
            (col("sw") * col("sxx") - col("sx") * col("sx")).cast("double")
              / (col("sw") * col("sw")).cast("double"))
          .withColumn("cmyy",
            (col("sw") * col("syy") - col("sy") * col("sy")).cast("double")
              / (col("sw") * col("sw")).cast("double"))
          .withColumn("cmxy",
            (col("sw") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("sw") * col("sw")).cast("double"))
          .withColumn("disc",
            sqrt(((col("cmxx") - col("cmyy")) / lit(2.0))
              * ((col("cmxx") - col("cmyy")) / lit(2.0))
              + col("cmxy") * col("cmxy")))
          .withColumn("lamp",
            (col("cmxx") + col("cmyy")) / lit(2.0) + col("disc"))
          .withColumn("lamm",
            (col("cmxx") + col("cmyy")) / lit(2.0) - col("disc"))
          .select(col("frame_id"), col("x"), col("y"), col("sw").as("flux"),
            rnd(lit(2.354820045) * sqrt(col("lamp")), 6).as("fwhm_major"),
            rnd(lit(2.354820045) * sqrt(col("lamm")), 6).as("fwhm_minor"),
            expr("cast(floor(0.5 * atan2(2.0 * cmxy, cmxx - cmyy) * 1e3 + 0.5) as bigint)")
              .as("theta_milli"),
            expr("cast(floor((1.0 - sqrt(lamm / lamp)) * 1e6 + 0.5) as bigint)")
              .as("ellipticity_ppm"))
          .orderBy("frame_id", "x")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (0, 6, 8, 40, 10, 2, 2, 0), (0, 24, 19, 50, 10, 1, 3, 0),
             |    (1, 9, 25, 45, 10, 3, 1, 0), (1, 22, 6, 55, 10, 2, 2, 1),
             |    (2, 15, 14, 60, 10, 2, 2, -1), (2, 27, 27, 42, 10, 1, 2, 1),
             |    (3, 11, 11, 48, 10, 3, 2, -1), (3, 20, 26, 52, 10, 2, 3, 1))
             |    t(frame_id, tx, ty, amp, pb, pp, pq, pr)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + coalesce(CAST((SELECT sum(j.amp * (j.pb
             |          - j.pp * (p.i % 32 - j.tx) * (p.i % 32 - j.tx)
             |          - j.pq * (p.i // 32 - j.ty) * (p.i // 32 - j.ty)
             |          - j.pr * (p.i % 32 - j.tx) * (p.i // 32 - j.ty)))
             |        FROM inj j WHERE j.frame_id = f.i
             |          AND greatest(abs(p.i % 32 - j.tx),
             |                       abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 3) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(sum(n.v - 100) AS BIGINT) AS sw,
             |    CAST(sum(n.x * (n.v - 100)) AS BIGINT) AS sx,
             |    CAST(sum(n.y * (n.v - 100)) AS BIGINT) AS sy,
             |    CAST(sum(n.x * n.x * (n.v - 100)) AS BIGINT) AS sxx,
             |    CAST(sum(n.y * n.y * (n.v - 100)) AS BIGINT) AS syy,
             |    CAST(sum(n.x * n.y * (n.v - 100)) AS BIGINT) AS sxy
             |  FROM px c JOIN px n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.v >= 250
             |  GROUP BY c.frame_id, c.x, c.y, c.v
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.v >= c.v THEN 1 ELSE 0 END) = 0),
             |m AS (
             |  SELECT frame_id, x, y, sw,
             |    CAST(sw * sxx - sx * sx AS DOUBLE) / CAST(sw * sw AS DOUBLE)
             |      AS cmxx,
             |    CAST(sw * syy - sy * sy AS DOUBLE) / CAST(sw * sw AS DOUBLE)
             |      AS cmyy,
             |    CAST(sw * sxy - sx * sy AS DOUBLE) / CAST(sw * sw AS DOUBLE)
             |      AS cmxy
             |  FROM centers),
             |e AS (
             |  SELECT frame_id, x, y, sw, cmxx, cmyy, cmxy,
             |    (cmxx + cmyy) / 2.0 + sqrt(((cmxx - cmyy) / 2.0)
             |      * ((cmxx - cmyy) / 2.0) + cmxy * cmxy) AS lamp,
             |    (cmxx + cmyy) / 2.0 - sqrt(((cmxx - cmyy) / 2.0)
             |      * ((cmxx - cmyy) / 2.0) + cmxy * cmxy) AS lamm
             |  FROM m)
             |SELECT frame_id, x, y, sw AS flux,
             |  floor(2.354820045 * sqrt(lamp) * 1e6 + 0.5) / 1e6
             |    AS fwhm_major,
             |  floor(2.354820045 * sqrt(lamm) * 1e6 + 0.5) / 1e6
             |    AS fwhm_minor,
             |  CAST(floor(0.5 * atan2(2.0 * cmxy, cmxx - cmyy) * 1e3 + 0.5)
             |    AS BIGINT) AS theta_milli,
             |  CAST(floor((1.0 - sqrt(lamm / lamp)) * 1e6 + 0.5) AS BIGINT)
             |    AS ellipticity_ppm
             |FROM e ORDER BY frame_id, x""".stripMargin)),

    // TRANSIENT PIPELINE [PK — the survey's actual purpose, end to end:
    // difference imaging finds what changed, cross-epoch ASSOCIATION
    // stitches detections at the same position into a transient light
    // curve, and the curve's shape classifies the object (rising
    // candidate → alert; single-epoch orphan → cosmic-ray suspect)].
    // Composes frame_difference's full chain (sky mode, residual
    // threshold, strict local max) over an injection SCHEDULE: one
    // transient rising across three epochs, one fading across two, one
    // single-epoch orphan. Association is ONE groupBy(x, y) over the
    // sparse detections; classification reads consecutive flux deltas
    // from a lag window per candidate (all-integer fluxes — 5A exactly —
    // so rise/fade boundaries cannot float). recovered == injected
    // require'd for every (epoch, flux) pair AND for the classification
    // itself against the injected schedule's expectation. Scale: the
    // per-epoch work is frame-local map-side pixel arithmetic; only
    // sparse detections shuffle — once for the neighbor probe, once on
    // the position key that carries association, the lag window, and the
    // census (grouping keys ⊇ partition key).
    QDef(
      "pipeline_transient",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (inj, _, centers) = transientScene(s)
        // Every (epoch, position, flux=5A) pair must match the schedule.
        val lawJoin = centers.join(
          inj.withColumnRenamed("frame_id", "ifr"),
          col("frame_id") === col("ifr") &&
            col("x") === col("tx") && col("y") === col("ty"), "full")
        require(lawJoin.where(col("ifr").isNull || col("flux").isNull ||
            col("flux") =!= col("amp") * 5L).isEmpty,
          "the transient pipeline missed, invented, or misphotometered an epoch")
        // Association + light-curve classification on ONE position key.
        val w = Window.partitionBy("x", "y").orderBy("frame_id")
        val curve = centers
          .withColumn("dflux", col("flux") - lag("flux", 1).over(w))
        val census = curve.groupBy("x", "y")
          .agg(count(lit(1)).as("n_epochs"),
            min("frame_id").as("first_frame"),
            max("frame_id").as("last_frame"),
            max("flux").as("peak_flux"),
            sum("flux").cast("long").as("total_flux"),
            min("dflux").as("min_d"), max("dflux").as("max_d"))
          .withColumn("class",
            when(col("n_epochs") === 1L, "single")
              .when(col("min_d") > 0L, "rising")
              .when(col("max_d") < 0L, "fading")
              .otherwise("mixed"))
        // The classification itself must match the injected schedule.
        val expected = s.range(0L, 3L).select(
          expr("element_at(array(10L, 24L, 5L), cast(id + 1 as int))").as("ex"),
          expr("element_at(array(10L, 20L, 25L), cast(id + 1 as int))").as("ey"),
          expr("element_at(array('rising', 'fading', 'single'), cast(id + 1 as int))")
            .as("eclass"))
        val checked = census.join(expected,
            col("x") === col("ex") && col("y") === col("ey"), "full")
          .localCheckpoint()
        require(checked.where(col("eclass").isNull || col("class").isNull ||
            col("class") =!= col("eclass")).isEmpty,
          "a transient light curve classified against its injected schedule")
        checked.select(col("x"), col("y"), col("n_epochs"),
            col("first_frame"), col("last_frame"), col("peak_flux"),
            col("total_flux"), col("class"))
          .orderBy("x")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 10, 10, 400), (3, 10, 10, 500), (5, 10, 10, 600),
             |    (3, 24, 20, 600), (5, 24, 20, 520), (5, 5, 25, 420))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 6) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |diff AS (
             |  SELECT a.frame_id, a.x, a.y, a.v - b.v AS d
             |  FROM px a JOIN px b ON b.frame_id = 0
             |    AND a.x = b.x AND a.y = b.y
             |  WHERE a.frame_id > 0),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT frame_id, d, row_number() OVER (PARTITION BY frame_id
             |      ORDER BY count(*) DESC, d ASC) AS rn
             |    FROM diff GROUP BY frame_id, d) WHERE rn = 1),
             |resid AS (
             |  SELECT diff.frame_id, x, y, d - sky AS r
             |  FROM diff JOIN sky USING (frame_id)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(sum(n.r) AS BIGINT) AS flux
             |  FROM resid c JOIN resid n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.r >= 200
             |  GROUP BY c.frame_id, c.x, c.y, c.r
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.r >= c.r THEN 1 ELSE 0 END) = 0),
             |curve AS (
             |  SELECT frame_id, x, y, flux,
             |    flux - lag(flux, 1) OVER (PARTITION BY x, y
             |      ORDER BY frame_id) AS dflux
             |  FROM centers),
             |census AS (
             |  SELECT x, y, count(*) AS n_epochs,
             |    CAST(min(frame_id) AS BIGINT) AS first_frame,
             |    CAST(max(frame_id) AS BIGINT) AS last_frame,
             |    CAST(max(flux) AS BIGINT) AS peak_flux,
             |    CAST(sum(flux) AS BIGINT) AS total_flux,
             |    min(dflux) AS min_d, max(dflux) AS max_d
             |  FROM curve GROUP BY x, y)
             |SELECT x, y, n_epochs, first_frame, last_frame, peak_flux,
             |  total_flux,
             |  CASE WHEN n_epochs = 1 THEN 'single'
             |       WHEN min_d > 0 THEN 'rising'
             |       WHEN max_d < 0 THEN 'fading'
             |       ELSE 'mixed' END AS class
             |FROM census ORDER BY x""".stripMargin)),

    // FORCED PHOTOMETRY [PK — the broker follow-up stage: once a
    // transient candidate exists, go back to EVERY epoch and aperture-sum
    // at the candidate's position whether or not anything was detected
    // there. Non-detections become flux measurements (upper limits), and
    // only with them is the light curve honest: the detected-only curve
    // of a transient that blinks looks monotonically rising, the
    // completed curve shows the dips]. Candidates = the distinct
    // detection positions from pipeline_transient's scene; for each, the
    // SAME 3×3 aperture sum over the difference-image residuals runs at
    // every science epoch. Three exact laws: (1) completeness — every
    // candidate emits exactly one row per epoch; (2) consistency — at a
    // detected epoch the forced aperture equals the detection's flux
    // bit-for-bit (same pixels, same sum); (3) honesty — at least one
    // candidate whose detected-only curve is strictly rising has a
    // non-rising completed curve (the non-detection dips are real
    // measurements, not absences). All fluxes are integers (residuals
    // are exactly the injected pattern), so the completed curves are
    // hash-oracled end to end. Scale: candidates are aggregate-sized and
    // the probe is the bounded ≤9-cell equi-join against the residual
    // tile — cost O(candidates × epochs × 9), never pixels × candidates;
    // the per-epoch residual work stays frame-local map-side. At survey
    // scale this is the plan that re-measures a million candidates over
    // ten years of epochs as one shuffle on the position key.
    QDef(
      "frame_forced_photometry",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (_, resid, centers) = transientScene(s)
        val cand = centers.select(col("x").as("cx"), col("y").as("cy"))
          .distinct()
        val forced = cand
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .join(resid.select(col("frame_id"), col("x").as("nx"),
              col("y").as("ny"), col("r").as("nr")),
            col("nx") === col("cx") + col("dcx") &&
              col("ny") === col("cy") + col("dcy"))
          .groupBy("cx", "cy", "frame_id")
          .agg(sum("nr").as("forced_flux"))
        val outPre = forced.join(
            centers.select(col("frame_id"), col("x").as("cx"),
              col("y").as("cy"), col("flux")),
            Seq("cx", "cy", "frame_id"), "left")
          .select(col("cx").as("x"), col("cy").as("y"), col("frame_id"),
            col("forced_flux"), col("flux"),
            col("flux").isNotNull.as("detected"))
        lastForcedPhotPlan = outPre.queryExecution.executedPlan.toString
        val out =
          outPre.localCheckpoint() // one forced pass feeds all 3 laws + output
        // (1) completeness: one row per candidate per science epoch.
        val nEpochs = 6L
        require(out.groupBy("x", "y").agg(count(lit(1)).as("n"))
            .where(col("n") =!= nEpochs).isEmpty,
          "a forced-photometry curve is missing an epoch or duplicated one")
        // (2) consistency: forced aperture ≡ detection flux where detected.
        require(out.where(col("detected") &&
            col("forced_flux") =!= col("flux")).isEmpty,
          "forced photometry disagreed with the detection at a detected epoch")
        // (3) honesty: a detected-only 'rising' curve stops being rising
        // once the non-detection epochs are measured in.
        val wc = Window.partitionBy("x", "y").orderBy("frame_id")
        def curveClass(df: org.apache.spark.sql.DataFrame, fluxCol: String) =
          df.withColumn("dflux", col(fluxCol) - lag(fluxCol, 1).over(wc))
            .groupBy("x", "y")
            .agg(count(lit(1)).as("n"), min("dflux").as("min_d"))
            .select(col("x"), col("y"),
              (col("n") > 1L && col("min_d") > 0L).as("rising"))
        val detRising = curveClass(
          centers.select(col("x"), col("y"), col("frame_id"), col("flux")),
          "flux")
        val fullRising = curveClass(
          out.select(col("x"), col("y"), col("frame_id"), col("forced_flux")),
          "forced_flux")
        require(!detRising.withColumnRenamed("rising", "det_rising")
            .join(fullRising, Seq("x", "y"))
            .where(col("det_rising") && !col("rising")).isEmpty,
          "no curve demonstrated the detected-only rising bias — fixture broken")
        out.select(col("x"), col("y"), col("frame_id"), col("forced_flux"),
            col("detected"))
          .orderBy("x", "y", "frame_id")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 10, 10, 400), (3, 10, 10, 500), (5, 10, 10, 600),
             |    (3, 24, 20, 600), (5, 24, 20, 520), (5, 5, 25, 420))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 6) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |diff AS (
             |  SELECT a.frame_id, a.x, a.y, a.v - b.v AS d
             |  FROM px a JOIN px b ON b.frame_id = 0
             |    AND a.x = b.x AND a.y = b.y
             |  WHERE a.frame_id > 0),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT frame_id, d, row_number() OVER (PARTITION BY frame_id
             |      ORDER BY count(*) DESC, d ASC) AS rn
             |    FROM diff GROUP BY frame_id, d) WHERE rn = 1),
             |resid AS (
             |  SELECT diff.frame_id, x, y, d - sky AS r
             |  FROM diff JOIN sky USING (frame_id)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(sum(n.r) AS BIGINT) AS flux
             |  FROM resid c JOIN resid n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.r >= 200
             |  GROUP BY c.frame_id, c.x, c.y, c.r
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.r >= c.r THEN 1 ELSE 0 END) = 0),
             |cand AS (SELECT DISTINCT x, y FROM centers),
             |forced AS (
             |  SELECT c.x, c.y, r.frame_id,
             |    CAST(sum(r.r) AS BIGINT) AS forced_flux
             |  FROM cand c JOIN resid r
             |    ON abs(r.x - c.x) <= 1 AND abs(r.y - c.y) <= 1
             |  GROUP BY 1, 2, 3)
             |SELECT f.x, f.y, f.frame_id, f.forced_flux,
             |  d.flux IS NOT NULL AS detected
             |FROM forced f LEFT JOIN centers d
             |  ON d.x = f.x AND d.y = f.y AND d.frame_id = f.frame_id
             |ORDER BY f.x, f.y, f.frame_id""".stripMargin)),

    // ALERT CUTOUTS [PK — every ZTF/LSST alert packet ships a postage
    // stamp: the small pixel window around the detection, cut from the
    // difference image, so a downstream vetter (human or ML real/bogus
    // classifier) can see the detection's shape without touching the
    // archive]. For each detection of the shared transient scene, the
    // 5×5 residual window extracts ROW-MAJOR into one array column via
    // the bounded ≤25-cell equi-join probe (explode of the fixed offset
    // grid — candidates × 25, never candidates × pixels), assembled with
    // sort_array over (dy, dx)-keyed structs so the pixel order is a
    // total integer order in both engines. Exact laws require'd: every
    // stamp has all 25 pixels (the scene pads beyond the grid edge with
    // zeros — the FITS-cutout edge convention); the stamp CENTER equals
    // the detection's residual peak; and the stamp SUM equals the
    // detection's aperture flux (residuals are exactly the injected
    // pattern: A + 8·(A div 2) inside the 3×3, zero in the outer ring).
    // All-integer pixels ⇒ the arrays hash-oracle end to end. Scale:
    // cutout extraction is the same shuffle the detections already make
    // — one bounded probe per candidate; stamps are 25 ints, so a
    // million-alert night moves megabytes, not the image archive.
    QDef(
      "frame_cutouts",
      (s, dir) => {
        val (_, resid, centers) = transientScene(s)
        val half = 2L
        val stamps = centers.select(col("frame_id"), col("x"), col("y"),
            col("flux"))
          .withColumn("dcx", explode(sequence(lit(-half), lit(half))))
          .withColumn("dcy", explode(sequence(lit(-half), lit(half))))
          .join(resid.select(col("frame_id").as("nfr"), col("x").as("nx"),
              col("y").as("ny"), col("r").as("nr")),
            col("nfr") === col("frame_id") &&
              col("nx") === col("x") + col("dcx") &&
              col("ny") === col("y") + col("dcy"), "left")
          .groupBy("frame_id", "x", "y", "flux")
          .agg(count(lit(1)).as("n_px"),
            sort_array(collect_list(struct(
              col("dcy"), col("dcx"),
              coalesce(col("nr"), lit(0L)).as("v")))).as("sp"),
            sum(coalesce(col("nr"), lit(0L))).as("stamp_sum"),
            sum(when(col("dcx") === 0L && col("dcy") === 0L, col("nr")))
              .as("center"))
          .select(col("frame_id"), col("x"), col("y"), col("flux"),
            col("n_px"),
            transform(col("sp"), p => p.getField("v")).as("stamp_arr"),
            col("stamp_sum"), col("center"))
          // Arrays serialize to one canonical string (the
          // agg_collect_sorted convention — oracle-comparable, hashable).
          .withColumn("stamp", concat_ws(",", col("stamp_arr")))
          .localCheckpoint() // one probe feeds the laws and the output
        require(stamps.where(col("n_px") =!= 25L).isEmpty,
          "a cutout is missing pixels — the edge-padding convention broke")
        require(stamps.where(size(col("stamp_arr")) =!= 25).isEmpty,
          "a stamp array did not assemble all 25 pixels")
        require(stamps.where(col("stamp_sum") =!= col("flux")).isEmpty,
          "a stamp's pixel sum diverged from the detection's aperture flux")
        require(stamps.where(
            col("center") =!= expr("element_at(stamp_arr, 13)")).isEmpty,
          "row-major assembly misplaced the central pixel")
        stamps.select(col("frame_id"), col("x"), col("y"), col("flux"),
            col("stamp"), col("center").as("peak"))
          .orderBy("frame_id", "x")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 10, 10, 400), (3, 10, 10, 500), (5, 10, 10, 600),
             |    (3, 24, 20, 600), (5, 24, 20, 520), (5, 5, 25, 420))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 6) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |diff AS (
             |  SELECT a.frame_id, a.x, a.y, a.v - b.v AS d
             |  FROM px a JOIN px b ON b.frame_id = 0
             |    AND a.x = b.x AND a.y = b.y
             |  WHERE a.frame_id > 0),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT frame_id, d, row_number() OVER (PARTITION BY frame_id
             |      ORDER BY count(*) DESC, d ASC) AS rn
             |    FROM diff GROUP BY frame_id, d) WHERE rn = 1),
             |resid AS (
             |  SELECT diff.frame_id, x, y, d - sky AS r
             |  FROM diff JOIN sky USING (frame_id)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(sum(n.r) AS BIGINT) AS flux
             |  FROM resid c JOIN resid n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.r >= 200
             |  GROUP BY c.frame_id, c.x, c.y, c.r
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.r >= c.r THEN 1 ELSE 0 END) = 0),
             |grid AS (
             |  SELECT a.i AS dcy, b.i AS dcx
             |  FROM generate_series(-2, 2) a(i)
             |    CROSS JOIN generate_series(-2, 2) b(i)),
             |cells AS (
             |  SELECT c.frame_id, c.x, c.y, c.flux, g.dcy, g.dcx,
             |    coalesce(CAST(r.r AS BIGINT), 0) AS v
             |  FROM centers c CROSS JOIN grid g
             |  LEFT JOIN resid r ON r.frame_id = c.frame_id
             |    AND r.x = c.x + g.dcx AND r.y = c.y + g.dcy)
             |SELECT frame_id, x, y, flux,
             |  string_agg(v::VARCHAR, ',' ORDER BY dcy, dcx) AS stamp,
             |  CAST(sum(CASE WHEN dcx = 0 AND dcy = 0 THEN v END) AS BIGINT)
             |    AS peak
             |FROM cells GROUP BY frame_id, x, y, flux
             |ORDER BY frame_id, x""".stripMargin)),

    // ALERT PACKET ASSEMBLY [PK — the broker's OUTPUT artifact: every
    // ZTF/LSST detection ships downstream as one self-contained packet
    // carrying the detection, its postage stamp, its PRIOR history at
    // that position (detections AND forced upper limits — the
    // prv_candidates block), and the curve classification; consumers
    // never touch the archive]. Composes the whole transient chain over
    // the shared scene: difference-image detections × 5×5 cutout stamps
    // × forced-photometry history strictly BEFORE the packet's epoch ×
    // the association census class. Exact laws require'd: packet ↔
    // detection bijection (full-outer join, no orphans either way); the
    // prv block is COMPLETE — exactly frame_id−1 entries, one per prior
    // science epoch, upper limits included (the honesty
    // frame_forced_photometry proves, carried into the product); and
    // forced flux ≡ detection flux at every detected epoch. All-integer
    // fluxes and canonical "epoch:flux" strings ⇒ hash-oracled end to
    // end. Scale: everything shuffles on the position key the
    // association already uses; a packet is a few hundred bytes, so the
    // night's alert stream is detections-sized — the archive stays put.
    QDef(
      "pipeline_alert",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (_, resid, centers) = transientScene(s)
        val cand = centers.select(col("x").as("cx"), col("y").as("cy"))
          .distinct()
        val forced = cand
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .join(resid.select(col("frame_id").as("pf"), col("x").as("nx"),
              col("y").as("ny"), col("r").as("nr")),
            col("nx") === col("cx") + col("dcx") &&
              col("ny") === col("cy") + col("dcy"))
          .groupBy("cx", "cy", "pf")
          .agg(sum("nr").as("ff"))
          .localCheckpoint() // feeds prv, the consistency law, and counts
        // Forced ≡ detected at detected epochs (the follow-up-stage law,
        // re-require'd here because the packet embeds both numbers) —
        // built lazily and folded with the two packet laws into ONE
        // violations action below (round-17 fixed-overhead audit: three
        // tiny law jobs → one).
        val forcedLaw = forced.join(centers,
            col("cx") === col("x") && col("cy") === col("y") &&
              col("pf") === col("frame_id"))
          .where(col("ff") =!= col("flux"))
          .select(lit("forced≠detected").as("law"))
        val half = 2L
        val stamps = centers.select(col("frame_id"), col("x"), col("y"))
          .withColumn("dcx", explode(sequence(lit(-half), lit(half))))
          .withColumn("dcy", explode(sequence(lit(-half), lit(half))))
          .join(resid.select(col("frame_id").as("nfr"), col("x").as("nx"),
              col("y").as("ny"), col("r").as("nr")),
            col("nfr") === col("frame_id") &&
              col("nx") === col("x") + col("dcx") &&
              col("ny") === col("y") + col("dcy"), "left")
          .groupBy("frame_id", "x", "y")
          .agg(sort_array(collect_list(struct(col("dcy"), col("dcx"),
            coalesce(col("nr"), lit(0L)).as("v")))).as("sp"))
          .select(col("frame_id"), col("x"), col("y"),
            concat_ws(",", transform(col("sp"), p => p.getField("v")
              .cast("string"))).as("stamp"))
        val wLag = Window.partitionBy("x", "y").orderBy("frame_id")
        val census = centers
          .withColumn("dflux", col("flux") - lag("flux", 1).over(wLag))
          .groupBy("x", "y")
          .agg(count(lit(1)).as("n_det"),
            min("dflux").as("min_d"), max("dflux").as("max_d"))
          .withColumn("class",
            when(col("n_det") === 1L, "single")
              .when(col("min_d") > 0L, "rising")
              .when(col("max_d") < 0L, "fading")
              .otherwise("mixed"))
          .select("x", "y", "n_det", "class")
        val prv = centers.select(col("frame_id"), col("x"), col("y"))
          .join(forced,
            col("cx") === col("x") && col("cy") === col("y") &&
              col("pf") < col("frame_id"), "left")
          .groupBy("frame_id", "x", "y")
          .agg(count(col("pf")).as("n_prv"),
            concat_ws(",", transform(
              sort_array(collect_list(struct(col("pf"), col("ff")))),
              p => concat(p.getField("pf").cast("string"), lit(":"),
                p.getField("ff").cast("string")))).as("prv"))
        val packets = centers
          .join(stamps, Seq("frame_id", "x", "y"))
          .join(prv, Seq("frame_id", "x", "y"))
          .join(census, Seq("x", "y"))
          .select(
            (col("frame_id") * 100000L + col("y") * 32L + col("x"))
              .as("candid"),
            col("frame_id"), col("x"), col("y"), col("flux"),
            col("stamp"), col("prv"), col("n_prv"), col("n_det"),
            col("class"))
          .localCheckpoint() // one assembly feeds the laws and the output
        // Bijection: one packet per detection, no orphans either way.
        val bij = packets.select(col("frame_id").as("bf"), col("x").as("bx"),
            col("y").as("by"))
          .join(centers, col("bf") === col("frame_id") &&
            col("bx") === col("x") && col("by") === col("y"), "full")
          .where(col("bf").isNull || col("frame_id").isNull)
          .select(lit("bijection").as("law"))
        // prv completeness: one entry per prior science epoch, upper
        // limits included — exactly frame_id − 1 entries.
        val prvLaw = packets.where(col("n_prv") =!= col("frame_id") - 1L)
          .select(lit("prv-incomplete").as("law"))
        // ONE action over the union of all three law frames: same
        // violations detected, one job instead of three (every input
        // above a localCheckpoint, so no lineage re-executes).
        val broken = forcedLaw.unionAll(bij).unionAll(prvLaw)
          .groupBy("law").agg(count(lit(1)).as("n")).collect()
        require(broken.isEmpty,
          s"alert-packet laws violated: ${broken.mkString(", ")}")
        packets.orderBy("candid")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 10, 10, 400), (3, 10, 10, 500), (5, 10, 10, 600),
             |    (3, 24, 20, 600), (5, 24, 20, 520), (5, 5, 25, 420))
             |    t(frame_id, tx, ty, amp)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp ELSE j.amp // 2 END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 6) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |diff AS (
             |  SELECT a.frame_id, a.x, a.y, a.v - b.v AS d
             |  FROM px a JOIN px b ON b.frame_id = 0
             |    AND a.x = b.x AND a.y = b.y
             |  WHERE a.frame_id > 0),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT frame_id, d, row_number() OVER (PARTITION BY frame_id
             |      ORDER BY count(*) DESC, d ASC) AS rn
             |    FROM diff GROUP BY frame_id, d) WHERE rn = 1),
             |resid AS (
             |  SELECT diff.frame_id, x, y, d - sky AS r
             |  FROM diff JOIN sky USING (frame_id)),
             |centers AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(sum(n.r) AS BIGINT) AS flux
             |  FROM resid c JOIN resid n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.r >= 200
             |  GROUP BY c.frame_id, c.x, c.y, c.r
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.r >= c.r THEN 1 ELSE 0 END) = 0),
             |cand AS (SELECT DISTINCT x, y FROM centers),
             |forced AS (
             |  SELECT c.x, c.y, r.frame_id AS pf,
             |    CAST(sum(r.r) AS BIGINT) AS ff
             |  FROM cand c JOIN resid r
             |    ON abs(r.x - c.x) <= 1 AND abs(r.y - c.y) <= 1
             |  GROUP BY 1, 2, 3),
             |grid AS (
             |  SELECT a.i AS dcy, b.i AS dcx
             |  FROM generate_series(-2, 2) a(i)
             |    CROSS JOIN generate_series(-2, 2) b(i)),
             |stamps AS (
             |  SELECT frame_id, x, y,
             |    string_agg(v::VARCHAR, ',' ORDER BY dcy, dcx) AS stamp
             |  FROM (
             |    SELECT c.frame_id, c.x, c.y, g.dcy, g.dcx,
             |      coalesce(CAST(r.r AS BIGINT), 0) AS v
             |    FROM centers c CROSS JOIN grid g
             |    LEFT JOIN resid r ON r.frame_id = c.frame_id
             |      AND r.x = c.x + g.dcx AND r.y = c.y + g.dcy)
             |  GROUP BY 1, 2, 3),
             |census AS (
             |  SELECT x, y, count(*) AS n_det,
             |    min(dflux) AS min_d, max(dflux) AS max_d
             |  FROM (SELECT frame_id, x, y, flux,
             |      flux - lag(flux) OVER (PARTITION BY x, y
             |        ORDER BY frame_id) AS dflux
             |    FROM centers)
             |  GROUP BY x, y),
             |prv AS (
             |  SELECT c.frame_id, c.x, c.y,
             |    CAST(count(f.pf) AS BIGINT) AS n_prv,
             |    coalesce(string_agg(f.pf::VARCHAR || ':' || f.ff::VARCHAR,
             |      ',' ORDER BY f.pf), '') AS prv
             |  FROM centers c LEFT JOIN forced f
             |    ON f.x = c.x AND f.y = c.y AND f.pf < c.frame_id
             |  GROUP BY 1, 2, 3)
             |SELECT CAST(c.frame_id * 100000 + c.y * 32 + c.x AS BIGINT)
             |    AS candid,
             |  CAST(c.frame_id AS BIGINT) AS frame_id,
             |  CAST(c.x AS BIGINT) AS x, CAST(c.y AS BIGINT) AS y, c.flux,
             |  s.stamp, p.prv, p.n_prv, ce.n_det,
             |  CASE WHEN ce.n_det = 1 THEN 'single'
             |       WHEN ce.min_d > 0 THEN 'rising'
             |       WHEN ce.max_d < 0 THEN 'fading'
             |       ELSE 'mixed' END AS class
             |FROM centers c
             |JOIN stamps s ON s.frame_id = c.frame_id AND s.x = c.x
             |  AND s.y = c.y
             |JOIN prv p ON p.frame_id = c.frame_id AND p.x = c.x
             |  AND p.y = c.y
             |JOIN census ce ON ce.x = c.x AND ce.y = c.y
             |ORDER BY candid""".stripMargin)),

    // REAL/BOGUS VETTING [PK — the stage between detection and alert:
    // difference imaging fires on cosmic rays, hot pixels, and bad
    // subtractions as readily as on real transients, so every broker
    // runs a vetter (ZTF's braai-style classifier) before shipping
    // packets. Modeled deterministically: the discriminating physics is
    // that a REAL source has a PSF — flux spread over wings — while a
    // cosmic ray deposits in essentially one pixel]. A local scene
    // injects two PSF profiles (A at center, A div 2 on the 8 wings)
    // AND one COSMIC RAY (all flux in one pixel, no wings); detection
    // runs the standard threshold + strict-local-max chain, then two
    // INTEGER features decide: concentration (is more than half the
    // aperture flux in the center pixel? — 2·center > flux, a
    // cross-multiplied rational, never a float) and n_wings (count of
    // nonzero 8-neighbors). bogus ⇔ concentrated OR wingless. Laws
    // require'd: every injection is detected with its exact flux (5A
    // for PSFs, A for the CR), the CR classifies bogus, both PSFs
    // classify real, and no detection is unclassified. All-integer ⇒
    // hash-oracled. Scale: identical to the detection chain it extends
    // — the features come from the SAME bounded ≤9-cell probe the
    // local-max test already pays; vetting adds zero passes.
    QDef(
      "frame_realbogus",
      (s, dir) => {
        val grid = 32L
        val thresh = 200L
        // (frame, x, y, amp, wings): wings=1 → PSF profile, 0 → cosmic ray.
        val inj = s.range(0L, 3L).select(
          expr("element_at(array(1L,1L,2L), cast(id + 1 as int))")
            .as("frame_id"),
          expr("element_at(array(9L,22L,15L), cast(id + 1 as int))")
            .as("tx"),
          expr("element_at(array(11L,24L,6L), cast(id + 1 as int))")
            .as("ty"),
          expr("element_at(array(400L,520L,460L), cast(id + 1 as int))")
            .as("amp"),
          expr("element_at(array(1L,1L,0L), cast(id + 1 as int))")
            .as("wings"))
        val px = s.range(0L, 3L).select(col("id").as("frame_id"))
          .crossJoin(s.range(0L, grid * grid).select(
            expr(s"id % $grid").as("x"), expr(s"id div $grid").as("y")))
          .withColumn("base",
            lit(100L) + (col("x") * 73L + col("y") * 149L) * 2654435761L % 97L)
          .join(inj.withColumnRenamed("frame_id", "ifr"),
            col("frame_id") === col("ifr") &&
              greatest(abs(col("x") - col("tx")), abs(col("y") - col("ty"))) <= 1L,
            "left")
          .groupBy("frame_id", "x", "y", "base")
          .agg(sum(when(col("tx") === col("x") && col("ty") === col("y"),
              col("amp"))
            .otherwise(col("wings") * expr("amp div 2"))).as("tr"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("base") + col("frame_id") * 7L + coalesce(col("tr"), lit(0L)))
              .as("v"))
        val refpx = px.where(col("frame_id") === 0L)
          .select(col("x"), col("y"), col("v").as("v0"))
        val diff = px.where(col("frame_id") > 0L)
          .join(broadcast(refpx), Seq("x", "y"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("v") - col("v0")).as("d"))
        val sky = diff.groupBy("frame_id", "d").agg(count(lit(1)).as("n"))
          .groupBy("frame_id")
          .agg(max(struct(col("n"), (-col("d")).as("nd"))).as("m"))
          .select(col("frame_id"), (-col("m.nd")).as("sky"))
        val resid = diff.join(broadcast(sky), Seq("frame_id"))
          .select(col("frame_id"), col("x"), col("y"),
            (col("d") - col("sky")).as("r"))
        val vetted = resid.where(col("r") >= thresh)
          .select(col("frame_id"), col("x"), col("y"), col("r").as("peak"))
          .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
          .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
          .join(resid.select(col("frame_id").as("nfr"), col("x").as("nx"),
              col("y").as("ny"), col("r").as("nr")),
            col("nfr") === col("frame_id") &&
              col("nx") === col("x") + col("dcx") &&
              col("ny") === col("y") + col("dcy"))
          .groupBy("frame_id", "x", "y", "peak")
          .agg(sum(when((col("dcx") =!= 0L || col("dcy") =!= 0L) &&
              col("nr") >= col("peak"), 1L).otherwise(0L)).as("n_ge"),
            sum(col("nr")).as("flux"),
            sum(when((col("dcx") =!= 0L || col("dcy") =!= 0L) &&
              col("nr") =!= 0L, 1L).otherwise(0L)).as("n_wings"))
          .where(col("n_ge") === 0L)
          .select(col("frame_id"), col("x"), col("y"), col("flux"),
            col("peak"), col("n_wings"),
            (col("peak") * 2L > col("flux") || col("n_wings") === 0L)
              .as("bogus"))
          .localCheckpoint() // one vetting pass feeds the laws + output
        val lawJ = vetted.join(inj.withColumnRenamed("frame_id", "ifr"),
          col("frame_id") === col("ifr") &&
            col("x") === col("tx") && col("y") === col("ty"), "full")
        require(lawJ.where(col("ifr").isNull || col("flux").isNull).isEmpty,
          "the vetter missed an injection or detected a ghost")
        require(lawJ.where(col("wings") === 1L &&
            (col("flux") =!= col("amp") * 5L || col("bogus"))).isEmpty,
          "a PSF injection mis-measured or classified bogus")
        require(lawJ.where(col("wings") === 0L &&
            (col("flux") =!= col("amp") || !col("bogus"))).isEmpty,
          "the cosmic ray mis-measured or classified real")
        vetted.orderBy("frame_id", "x")
      },
      Some("""WITH inj AS (
             |  SELECT * FROM (VALUES
             |    (1, 9, 11, 400, 1), (1, 22, 24, 520, 1), (2, 15, 6, 460, 0))
             |    t(frame_id, tx, ty, amp, wings)),
             |px AS (
             |  SELECT f.i AS frame_id, p.i % 32 AS x, p.i // 32 AS y,
             |    100 + ((p.i % 32) * 73 + (p.i // 32) * 149) * 2654435761 % 97
             |      + f.i * 7
             |      + coalesce(CAST((SELECT sum(CASE WHEN j.tx = p.i % 32
             |            AND j.ty = p.i // 32 THEN j.amp
             |            ELSE j.wings * (j.amp // 2) END)
             |          FROM inj j WHERE j.frame_id = f.i
             |            AND greatest(abs(p.i % 32 - j.tx),
             |                         abs(p.i // 32 - j.ty)) <= 1) AS BIGINT), 0)
             |      AS v
             |  FROM generate_series(0, 2) f(i)
             |    CROSS JOIN generate_series(0, 1023) p(i)),
             |diff AS (
             |  SELECT a.frame_id, a.x, a.y, a.v - b.v AS d
             |  FROM px a JOIN px b ON b.frame_id = 0
             |    AND a.x = b.x AND a.y = b.y
             |  WHERE a.frame_id > 0),
             |sky AS (
             |  SELECT frame_id, d AS sky FROM (
             |    SELECT frame_id, d, row_number() OVER (PARTITION BY frame_id
             |      ORDER BY count(*) DESC, d ASC) AS rn
             |    FROM diff GROUP BY frame_id, d) WHERE rn = 1),
             |resid AS (
             |  SELECT diff.frame_id, x, y, d - sky AS r
             |  FROM diff JOIN sky USING (frame_id))
             |SELECT frame_id, x, y, flux, peak, n_wings,
             |  (peak * 2 > flux OR n_wings = 0) AS bogus
             |FROM (
             |  SELECT c.frame_id, c.x, c.y, c.r AS peak,
             |    CAST(sum(n.r) AS BIGINT) AS flux,
             |    CAST(sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |      AND n.r <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wings
             |  FROM resid c JOIN resid n ON n.frame_id = c.frame_id
             |    AND abs(n.x - c.x) <= 1 AND abs(n.y - c.y) <= 1
             |  WHERE c.r >= 200
             |  GROUP BY c.frame_id, c.x, c.y, c.r
             |  HAVING sum(CASE WHEN (n.x <> c.x OR n.y <> c.y)
             |    AND n.r >= c.r THEN 1 ELSE 0 END) = 0)
             |ORDER BY frame_id, x""".stripMargin))
  )
}
