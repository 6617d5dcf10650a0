package graft.queries

import graft.Tables
import graft.ml.RidgePipeline
import graft.multimodal.BinaryOps
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML, streaming, and multimodal pipeline entry points (SURVEY.md §2.9–2.10
  * + the LLM-pipeline multimodal surface).
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Ridge-regression training run (train_et_model.py analog): features
    // from lineitem, label = extendedprice. Metrics row only — split is
    // seeded but engine-specific, so no SQL oracle (rows-only check);
    // tolerances asserted in MlSpec.
    ("q60_ml_ridge", (s: SparkSession, d: String) => {
      RidgePipeline.train(s, Tables.lineitem(s, d),
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice").metrics
    }, None),

    // Streaming hourly rollup drained with AvailableNow — must equal the
    // batch q27 result, so it shares q27's oracle SQL (stream==batch is the
    // exactly-once invariant).
    ("q61_stream_hourly", (s: SparkSession, d: String) => {
      EventStream.hourlyRollupAvailableNow(s, d)
    }, Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
             event_type, count(*) AS n_events,
             round(sum(value), 2) AS total_value,
             round(avg(value), 2) AS avg_value
      FROM events GROUP BY hour, event_type""")),

    // Streaming dedup (dropDuplicatesWithinWatermark — bounded state) +
    // rollup; must equal the batch count-distinct.
    ("q82_stream_dedup", (s: SparkSession, d: String) => {
      EventStream.dedupCountAvailableNow(s, d)
    }, Some("""
      SELECT event_type, count(DISTINCT event_id) AS n_unique_events
      FROM events GROUP BY event_type""")),

    // Stream-static join: unbounded events joined to a broadcast tier dim,
    // rolled up per tier — must equal the batch CASE-mapping oracle.
    ("q85_stream_static_join", (s: SparkSession, d: String) => {
      EventStream.tieredRollupAvailableNow(s, d)
    }, Some("""
      SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                  WHEN event_type IN ('click', 'view') THEN 'engagement'
                  ELSE 'ops' END AS tier,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events GROUP BY tier""")),

    // Stream-STREAM interval join (funnel attribution): clicks joined to
    // the same user's purchases within the next 30 minutes, watermarks on
    // both sides bounding the join state. The oracle replays the exact
    // truncated-μs comparison in batch.
    ("q97_stream_interval_join", (s: SparkSession, d: String) => {
      EventStream.clickPurchaseFunnelAvailableNow(s, d)
    }, Some("""
      SELECT a.user_id, epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS purchase_us,
             b.value AS purchase_value
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
       AND epoch_us(b.ts) >= epoch_us(a.ts)
       AND epoch_us(b.ts) <= epoch_us(a.ts) + 30 * 60 * 1000000""")),

    // Multimodal metadata extraction over binary payloads via typed
    // mapPartitions; the stub decode derives from byte length only, so the
    // whole pipeline is oracle-able through DuckDB's strlen (byte length).
    ("q62_multimodal_meta", (s: SparkSession, d: String) => {
      BinaryOps.extractMeta(s, Tables.documents(s, d)).toDF()
    }, Some("""
      SELECT doc_id,
             CAST(strlen(text) AS INTEGER) AS n_bytes,
             CAST(64 + strlen(text) % 512 AS INTEGER) AS width,
             CAST(64 + (strlen(text) * 7) % 512 AS INTEGER) AS height,
             CAST(1 + strlen(text) % 30 AS INTEGER) AS n_frames
      FROM documents""")),

    // Resize planning over the stubbed media metadata: fit into a 224-box
    // preserving aspect, never upscaling — exact integer/double arithmetic,
    // so the whole multimodal plan stays oracle-checkable.
    ("q92_resize_plan", (s: SparkSession, d: String) => {
      BinaryOps.resizePlan(BinaryOps.extractMeta(s, Tables.documents(s, d)), 224)
    }, Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(64 + strlen(text) % 512 AS INTEGER) AS width,
               CAST(64 + (strlen(text) * 7) % 512 AS INTEGER) AS height
        FROM documents),
      sc AS (SELECT *, least(1.0, 224.0 / width, 224.0 / height) AS scale FROM m)
      SELECT doc_id, width, height,
             CAST(floor(width * scale) AS INTEGER) AS out_w,
             CAST(floor(height * scale) AS INTEGER) AS out_h
      FROM sc""")),

    // Frame-sampling fan-out (explode) — generator/UDTF surface.
    ("q63_frame_sample", (s: SparkSession, d: String) => {
      BinaryOps.sampleFrames(BinaryOps.extractMeta(s, Tables.documents(s, d)), 5)
    }, Some("""
      SELECT doc_id, CAST(unnest(range(0, 1 + strlen(text) % 30, 5)) AS INTEGER) AS frame_idx
      FROM documents""")),

    // REAL audio decode through the oracle gate: each document gets a
    // deterministic 16-bit PCM WAV (channel count / rate / every sample are
    // integer arithmetic on doc_id), the Spark side SERIALIZES the RIFF
    // container and re-PARSES the bytes (BinaryOps.parseWav — chunk walk,
    // PCM re-centering), the oracle derives the same samples from the
    // formula alone. A hash match proves the byte-level codec, not just
    // the feature math.
    ("q141_audio_features", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.audioFeaturesBinary(s,
          BinaryOps.syntheticWavCorpus(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_channels"),
          col("n_frames"),
          pround(col("mean_amp"), 6).as("mean_amp"),
          pround(col("rms_amp"), 6).as("rms_amp"),
          col("zero_crossings"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
               CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
               CAST(100 + doc_id % 200 AS INTEGER) AS n_frames
        FROM documents),
      s AS (SELECT doc_id, n_channels,
                   unnest(range(0, n_frames * n_channels)) AS j
            FROM p),
      v AS (SELECT doc_id, n_channels, j,
                   (doc_id * 31 + j * 7919) % 65536 - 32768 AS samp
            FROM s),
      agg AS (SELECT doc_id, sum(samp) AS ssum, sum(samp * samp) AS ssq,
                     count(*) AS m
              FROM v GROUP BY doc_id),
      z AS (SELECT doc_id, count(*) AS zc FROM (
              SELECT doc_id,
                     samp * lag(samp) OVER (PARTITION BY doc_id ORDER BY j)
                       AS prod
              FROM v WHERE j % n_channels = 0)
            WHERE prod < 0 GROUP BY doc_id)
      SELECT p.doc_id, p.sample_rate, p.n_channels, p.n_frames,
             round(ssum / m / 32768.0, 6) AS mean_amp,
             round(sqrt(ssq / m) / 32768.0, 6) AS rms_amp,
             CAST(coalesce(z.zc, 0) AS INTEGER) AS zero_crossings
      FROM p JOIN agg USING (doc_id) LEFT JOIN z USING (doc_id)""")),

    // REAL video-container decode through the oracle gate (the q141
    // pattern for MP4): each document gets a deterministic ISO-BMFF file
    // (dimensions / timescale / duration / frame count are integer
    // arithmetic on doc_id), the Spark side serializes the box tree and
    // re-WALKS the bytes (BinaryOps.parseMp4Header — size/largesize
    // arithmetic, container recursion, mvhd/tkhd/stsz extraction, a
    // foreign `free` box skipped mid-file), the oracle derives the same
    // values from the formula. Frame decode stays a codec-requiring
    // stub; the container surface is real.
    ("q143_video_meta", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.videoMetaBinary(s,
          BinaryOps.syntheticMp4Corpus(s, Tables.documents(s, d)))
        .select(col("doc_id"), col("width"), col("height"),
          pround(col("dur_ms"), 3).as("dur_ms"), col("n_frames"))
    }, Some("""
      SELECT doc_id,
             CAST(16 * (10 + doc_id % 20) AS INTEGER) AS width,
             CAST(16 * (6 + doc_id % 15) AS INTEGER) AS height,
             round((600 * (10 + doc_id % 50) + (doc_id % 7) * 100)
                   * 1000.0 / (600 * (1 + doc_id % 3)), 3) AS dur_ms,
             CAST(24 + doc_id % 96 AS BIGINT) AS n_frames
      FROM documents""")),

    // REAL JPEG entropy decode through the oracle gate (the q141 pattern
    // for still images): each document gets a deterministic baseline
    // grayscale JPEG — non-8-aligned dimensions and per-block constants
    // are integer arithmetic on doc_id; with an all-ones quant table a
    // DC-only JPEG is LOSSLESS, so the oracle can predict the decoded
    // pixels. The Spark side genuinely Huffman-ENCODES the entropy stream
    // (canonical DHT tables, DC prediction, magnitude bits, byte
    // stuffing) and re-DECODES it (BinaryOps.decodeJpegPixels — marker
    // walk, Annex-C Huffman build, EXTEND, dequant, full 2-D IDCT, edge
    // crop); the oracle derives the same pixel statistics from the
    // formula alone. A hash match proves the byte-level codec. 4:4:4
    // color is q146, 4:2:0 subsampled color is q147, progressive SOF2
    // is q148.
    ("q145_jpeg_decode", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.imageFeaturesBinary(s,
          BinaryOps.syntheticJpegCorpus(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          pround(col("mean_px"), 6).as("mean_px"),
          pround(col("rms_px"), 6).as("rms_px"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(13 + doc_id % 40 AS INTEGER) AS w,
               CAST(9 + (doc_id * 3) % 40 AS INTEGER) AS h
        FROM documents),
      g AS (SELECT doc_id, w, h,
                   CAST(ceil(w / 8.0) AS INTEGER) AS cols,
                   CAST(ceil(h / 8.0) AS INTEGER) AS rws
            FROM p),
      b AS (SELECT doc_id, w, h, cols,
                   unnest(range(0, cols * rws)) AS bi
            FROM g),
      v AS (SELECT doc_id, w, h,
                   (doc_id * 31 + bi * 17) % 256 AS val,
                   least(8, w - (bi % cols) * 8)
                     * least(8, h - (bi // cols) * 8) AS vis
            FROM b),
      agg AS (SELECT doc_id, w, h, sum(val * vis) AS sv,
                     sum(val * val * vis) AS svv
              FROM v GROUP BY doc_id, w, h)
      SELECT doc_id, w AS width, h AS height,
             round(sv / (w * h) / 255.0, 6) AS mean_px,
             round(sqrt(svv / (w * h)) / 255.0, 6) AS rms_px
      FROM agg""")),

    // The q145 codec in COLOR: 3-component 4:4:4 baseline JPEG with
    // interleaved Y-Cb-Cr MCUs, per-component DC prediction, two
    // DQT/DHT table pairs, and the JFIF color transform on both sides.
    // The encoder's RGB→YCbCr rounding and the decoder's YCbCr→RGB
    // rounding+clamp are exact integer arithmetic the oracle replays,
    // so the hash match proves the full color chain — container,
    // entropy stream, and both color conversions — byte-level.
    // Rounding parity is by construction, not empirical: the `oracles`
    // exporter below rewrites every `round(` in this source to
    // `round(1e-8 + ` before it reaches oracle_sql.json, which is
    // exactly the Scala codec's roundPar(x) = round(x + 1e-8) — so
    // write PLAIN round() here; hand-adding the stabilizer would
    // double-apply it to 2e-8 and open a fresh mismatch band.
    ("q146_jpeg_color", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.colorImageFeaturesBinary(s,
          BinaryOps.syntheticJpegColorCorpus(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          pround(col("mean_r"), 6).as("mean_r"),
          pround(col("mean_g"), 6).as("mean_g"),
          pround(col("mean_b"), 6).as("mean_b"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(11 + doc_id % 36 AS INTEGER) AS w,
               CAST(10 + (doc_id * 5) % 30 AS INTEGER) AS h
        FROM documents),
      g AS (SELECT doc_id, w, h,
                   CAST(ceil(w / 8.0) AS INTEGER) AS cols,
                   CAST(ceil(h / 8.0) AS INTEGER) AS rws
            FROM p),
      b AS (SELECT doc_id, w, h, cols,
                   unnest(range(0, cols * rws)) AS bi
            FROM g),
      rgb AS (SELECT doc_id, w, h, cols, bi,
                     (doc_id * 31 + bi * 17) % 256 AS r,
                     (doc_id * 47 + bi * 29) % 256 AS gg,
                     (doc_id * 59 + bi * 41) % 256 AS bb
              FROM b),
      ycc AS (SELECT doc_id, w, h, cols, bi,
                     least(255, greatest(0,
                       round(0.299 * r + 0.587 * gg + 0.114 * bb))) AS y,
                     least(255, greatest(0,
                       round(128 - 0.168736 * r - 0.331264 * gg + 0.5 * bb))) AS cb,
                     least(255, greatest(0,
                       round(128 + 0.5 * r - 0.418688 * gg - 0.081312 * bb))) AS cr
              FROM rgb),
      dec AS (SELECT doc_id, w, h,
                     least(255, greatest(0,
                       round(y + 1.402 * (cr - 128)))) AS r2,
                     least(255, greatest(0,
                       round(y - 0.344136 * (cb - 128)
                             - 0.714136 * (cr - 128)))) AS g2,
                     least(255, greatest(0,
                       round(y + 1.772 * (cb - 128)))) AS b2,
                     least(8, w - (bi % cols) * 8)
                       * least(8, h - (bi // cols) * 8) AS vis
              FROM ycc),
      agg AS (SELECT doc_id, w, h, sum(r2 * vis) AS sr,
                     sum(g2 * vis) AS sg, sum(b2 * vis) AS sb
              FROM dec GROUP BY doc_id, w, h)
      SELECT doc_id, w AS width, h AS height,
             round(sr / (w * h) / 255.0, 6) AS mean_r,
             round(sg / (w * h) / 255.0, 6) AS mean_g,
             round(sb / (w * h) / 255.0, 6) AS mean_b
      FROM agg""")),

    // The q146 chain in 4:2:0 — the dominant layout of real crawl
    // JPEGs: Y sampled 2×2 with chroma at quarter resolution, 16×16
    // MCUs carrying four interleaved Y blocks then Cb and Cr, each
    // component under its own DC predictor. Constant chroma per
    // macroblock makes the subsampling exactly replayable (any
    // upsampling filter reproduces a constant), so the oracle proves
    // the subsampled MCU geometry byte-level.
    ("q147_jpeg_420", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.colorImageFeaturesBinary(s,
          BinaryOps.syntheticJpeg420Corpus(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          pround(col("mean_r"), 6).as("mean_r"),
          pround(col("mean_g"), 6).as("mean_g"),
          pround(col("mean_b"), 6).as("mean_b"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(9 + doc_id % 40 AS INTEGER) AS w,
               CAST(8 + (doc_id * 7) % 40 AS INTEGER) AS h
        FROM documents),
      g AS (SELECT doc_id, w, h,
                   CAST(ceil(w / 16.0) AS INTEGER) AS cols,
                   CAST(ceil(h / 16.0) AS INTEGER) AS rws
            FROM p),
      b AS (SELECT doc_id, w, h, cols,
                   unnest(range(0, cols * rws)) AS mi
            FROM g),
      rgb AS (SELECT doc_id, w, h, cols, mi,
                     (doc_id * 31 + mi * 17) % 256 AS r,
                     (doc_id * 47 + mi * 29) % 256 AS gg,
                     (doc_id * 59 + mi * 41) % 256 AS bb
              FROM b),
      ycc AS (SELECT doc_id, w, h, cols, mi,
                     least(255, greatest(0,
                       round(0.299 * r + 0.587 * gg + 0.114 * bb))) AS y,
                     least(255, greatest(0,
                       round(128 - 0.168736 * r - 0.331264 * gg + 0.5 * bb))) AS cb,
                     least(255, greatest(0,
                       round(128 + 0.5 * r - 0.418688 * gg - 0.081312 * bb))) AS cr
              FROM rgb),
      dec AS (SELECT doc_id, w, h,
                     least(255, greatest(0,
                       round(y + 1.402 * (cr - 128)))) AS r2,
                     least(255, greatest(0,
                       round(y - 0.344136 * (cb - 128)
                             - 0.714136 * (cr - 128)))) AS g2,
                     least(255, greatest(0,
                       round(y + 1.772 * (cb - 128)))) AS b2,
                     least(16, w - (mi % cols) * 16)
                       * least(16, h - (mi // cols) * 16) AS vis
              FROM ycc),
      agg AS (SELECT doc_id, w, h, sum(r2 * vis) AS sr,
                     sum(g2 * vis) AS sg, sum(b2 * vis) AS sb
              FROM dec GROUP BY doc_id, w, h)
      SELECT doc_id, w AS width, h AS height,
             round(sr / (w * h) / 255.0, 6) AS mean_r,
             round(sg / (w * h) / 255.0, 6) AS mean_g,
             round(sb / (w * h) / 255.0, 6) AS mean_b
      FROM agg""")),

    // PROGRESSIVE JPEG (SOF2) through the oracle gate — the q145
    // discipline extended to the multi-scan decoder: every document's
    // fixture is a REAL four-scan progressive script (DC first at Al=1,
    // the AC band as EOBn runs, the DC refinement bit, an AC refinement
    // pass; every third doc adds restart intervals inside the scans),
    // decoded by the spectral-selection + successive-approximation
    // decoder (BinaryOps.decodeJpegProgressive) and still lossless by
    // construction (DC-only content, DC quant 8), so the closed-form
    // oracle predicts every pixel. The AC-refinement path with LIVE
    // coefficients is covered by the javax.imageio differential on the
    // JDK writer's own scan script (MultimodalSpec).
    ("q148_jpeg_progressive", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.imageFeaturesBinary(s,
          BinaryOps.syntheticJpegProgressiveCorpus(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          pround(col("mean_px"), 6).as("mean_px"),
          pround(col("rms_px"), 6).as("rms_px"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(11 + (doc_id * 7) % 42 AS INTEGER) AS w,
               CAST(10 + (doc_id * 5) % 38 AS INTEGER) AS h
        FROM documents),
      g AS (SELECT doc_id, w, h,
                   CAST(ceil(w / 8.0) AS INTEGER) AS cols,
                   CAST(ceil(h / 8.0) AS INTEGER) AS rws
            FROM p),
      b AS (SELECT doc_id, w, h, cols,
                   unnest(range(0, cols * rws)) AS bi
            FROM g),
      v AS (SELECT doc_id, w, h,
                   (doc_id * 37 + bi * 23) % 256 AS val,
                   least(8, w - (bi % cols) * 8)
                     * least(8, h - (bi // cols) * 8) AS vis
            FROM b),
      agg AS (SELECT doc_id, w, h, sum(val * vis) AS sv,
                     sum(val * val * vis) AS svv
              FROM v GROUP BY doc_id, w, h)
      SELECT doc_id, w AS width, h AS height,
             round(sv / (w * h) / 255.0, 6) AS mean_px,
             round(sqrt(svv / (w * h)) / 255.0, 6) AS rms_px
      FROM agg""")),

    // REAL video FRAME decode through the oracle gate — Motion-JPEG,
    // the one video codec the engine decodes library-free: every
    // document's fixture is a genuine ISO-BMFF file whose video track
    // carries a `jpeg` sample entry and 3–6 DC-only lossless JPEG
    // frames packed two per chunk (stsd/stsz/stsc/stco all real and
    // exercised — odd frame counts force a two-run stsc). The Spark
    // side re-walks the sample table (BinaryOps.parseMp4Samples),
    // slices every SECOND frame (the frame-sampling stride applied at
    // extraction) and entropy-decodes each through the q145 JPEG core;
    // the oracle predicts each sampled frame's mean luma from the
    // block formula. Inter-frame codecs (H.264 etc.) genuinely need a
    // codec library and are dropped by fourcc, not stubbed.
    ("q149_video_frames", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.videoFrameFeaturesBinary(s,
          BinaryOps.syntheticMjpegCorpus(s, Tables.documents(s, d)),
          everyNth = 2)
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), pround(col("mean_px"), 6).as("mean_px"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(8 * (2 + doc_id % 4) AS INTEGER) AS w,
               CAST(8 * (1 + doc_id % 3) AS INTEGER) AS h,
               3 + doc_id % 4 AS nf
        FROM documents),
      f AS (SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS fi FROM p),
      b AS (SELECT doc_id, w, h, fi,
                   unnest(range(0, (w // 8) * (h // 8))) AS bi
            FROM f),
      v AS (SELECT doc_id, w, h, fi,
                   (doc_id * 31 + fi * 97 + (bi % (w // 8)) * 17
                    + (bi // (w // 8)) * 23) % 256 AS val
            FROM b),
      agg AS (SELECT doc_id, fi, w, h, sum(val * 64) AS sv
              FROM v GROUP BY doc_id, fi, w, h)
      SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
             w AS width, h AS height,
             round(sv / (w * h) / 255.0, 6) AS mean_px
      FROM agg""")),

    // REAL GIF decode through the oracle gate — the q145 discipline for
    // the palette format: each document gets a real GIF89a (64-color
    // global table, REAL LZW compression with dictionary growth and
    // width bumps, every fourth document interlaced so the 4-pass
    // reorder is oracle-checked), decoded by the full LZW/interlace/
    // palette chain (BinaryOps.decodeGifPixels). GIF is lossless, so
    // the oracle predicts every pixel from the index formula. With
    // q145-q148 this closes the library-free web image surface:
    // JPEG + PNG + GIF; WEBP/AVIF genuinely need codec libraries.
    ("q151_gif_decode", (s: SparkSession, d: String) => {
      import graft.functions.ColumnFunctions.pround
      BinaryOps.gifFeaturesBinary(s,
          BinaryOps.syntheticGifCorpus(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          pround(col("mean_r"), 6).as("mean_r"),
          pround(col("mean_g"), 6).as("mean_g"),
          pround(col("mean_b"), 6).as("mean_b"))
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(13 + doc_id % 20 AS INTEGER) AS w,
               CAST(11 + (doc_id * 3) % 20 AS INTEGER) AS h
        FROM documents),
      px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM p),
      v AS (SELECT doc_id, w, h,
                   (doc_id + (i % w) * 7 + (i // w) * 31) % 64 AS ci
            FROM px),
      c AS (SELECT doc_id, w, h,
                   (ci * 37 + 11) % 256 AS r,
                   (ci * 73 + 29) % 256 AS g,
                   (ci * 101 + 47) % 256 AS b
            FROM v),
      agg AS (SELECT doc_id, w, h,
                     sum(r) AS sr, sum(g) AS sg, sum(b) AS sb
              FROM c GROUP BY doc_id, w, h)
      SELECT doc_id, w AS width, h AS height,
             round(sr / (w * h * 255.0), 6) AS mean_r,
             round(sg / (w * h * 255.0), 6) AS mean_g,
             round(sb / (w * h * 255.0), 6) AS mean_b
      FROM agg""")),

    // REAL H.264 header parse through the oracle gate (the q143 pattern
    // for the codec a real crawl's MP4s actually carry): each document
    // gets a deterministic avc1 MP4 — profile (Baseline/Main/High
    // cycling, so the high-profile SPS chroma branch is exercised),
    // level, macroblock grid, frame-crop offsets and frame count are
    // integer arithmetic on doc_id. The Spark side serializes the avcC
    // record and the SPS BIT-EXACTLY (Exp-Golomb writer + emulation-
    // prevention bytes) and re-parses its own bytes (BinaryOps
    // .parseH264Meta: BMFF walk → avc1 sample entry → nested avcC → SPS
    // bitstream incl. the §7.4.2.1.1 crop-unit arithmetic; stss sync
    // count); the oracle derives the same values from the formula. Frame
    // DECODE stays the documented codec-requiring stub — this is the
    // metadata surface a curation pipeline's video queries actually run.
    ("q161_h264_meta", (s: SparkSession, d: String) =>
      BinaryOps.h264MetaBinary(s,
        BinaryOps.syntheticAvcCorpus(s, Tables.documents(s, d))),
    Some("""
      SELECT doc_id,
             'avc1' AS codec,
             CAST(CASE doc_id % 3 WHEN 0 THEN 66 WHEN 1 THEN 77
                  ELSE 100 END AS INTEGER) AS profile_idc,
             CAST(CASE doc_id % 3 WHEN 0 THEN 30 WHEN 1 THEN 31
                  ELSE 41 END AS INTEGER) AS level_idc,
             CAST(16 * (1 + doc_id % 8) - 2 * (doc_id % 2) AS INTEGER)
               AS width,
             CAST(16 * (1 + doc_id % 6)
                  - 2 * (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                  AS INTEGER) AS height,
             CAST(10 + doc_id % 20 AS BIGINT) AS n_frames,
             CAST((10 + doc_id % 20 + 4) // 5 AS BIGINT) AS n_keyframes
      FROM documents""")),

    // REAL WebM/Matroska (EBML) header walk through the oracle gate —
    // the q161 pattern for the OTHER container a crawl's video ships
    // in: each document gets a deterministic .webm (RFC 8794 EBML
    // writer; codec V_VP8/V_VP9/V_AV1 cycling, dims/cues/duration from
    // doc_id arithmetic; every 4th doc leads with an Opus AUDIO track so
    // track-type skipping is exercised, every 5th encodes the Segment
    // with the live-muxing unknown-size vint). The Spark side re-parses
    // its own bytes (BinaryOps.parseWebmMeta: EBML walk → DocType, first
    // video track's CodecID + PixelWidth/Height, TimestampScale-scaled
    // Duration, CuePoint count); the oracle derives the same values from
    // the formula. Frame DECODE stays the documented codec-requiring
    // stub.
    ("q168_webm_meta", (s: SparkSession, d: String) =>
      BinaryOps.webmMetaBinary(s,
        BinaryOps.syntheticWebmCorpus(s, Tables.documents(s, d))),
    Some("""
      SELECT doc_id,
             'webm' AS doc_type,
             CASE doc_id % 3 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9'
                  ELSE 'V_AV1' END AS codec,
             CAST(64 + (doc_id % 97) * 2 AS INTEGER) AS width,
             CAST(36 + ((doc_id * 3) % 83) * 2 AS INTEGER) AS height,
             CAST(1000 + doc_id % 500 AS DOUBLE) AS dur_ms,
             CAST(1 + doc_id % 12 AS BIGINT) AS n_cues
      FROM documents""")),

    // WARC ROUND-TRIP (ISO 28500 — the container crawls arrive in):
    // documents serialize into 16 WARC blobs (warcinfo + one HTTP
    // response record each, Content-Length framing), then the binary
    // ingest walks the blobs back to rows. The oracle derives every
    // field from ground truth: URI from the id formula, the WARC
    // record's Content-Length from the HTTP block arithmetic
    // (63 fixed header octets + digits of the body length + body
    // octets), and the payload md5 proves byte-exact body recovery
    // (UTF-8 both sides). Parser correctness under adversarial payloads
    // (bodies containing "WARC/1.0" / header-shaped lines) is pinned in
    // WarcIngestSpec — framing, never delimiter scanning.
    ("q175_warc_roundtrip", (s: SparkSession, d: String) => {
      val files = graft.io.WarcIngest.syntheticWarcFiles(
        s, Tables.documents(s, d), nFiles = 16)
      graft.io.WarcIngest.warcResponsesBinary(s, files)
        .select(col("doc_id"), col("target_uri"), col("http_status"),
          col("content_length"), md5(col("payload")).as("payload_md5"))
    }, Some("""
      SELECT doc_id,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
               '.example.com/d/' || CAST(doc_id AS VARCHAR) AS target_uri,
             CAST(200 AS INTEGER) AS http_status,
             CAST(63 + length(CAST(octet_length(encode(text)) AS VARCHAR))
                  + octet_length(encode(text)) AS BIGINT) AS content_length,
             md5(text) AS payload_md5
      FROM documents""")),

    // CDX INDEX over the WARC blobs — the random-access coordinates a
    // crawl store serves range reads by: SURT key (reversed host labels,
    // so one domain clusters under a sort) plus the record's byte span.
    // Offsets and lengths come from the REAL walk's byte accounting; the
    // oracle re-derives every span from first principles (fixed header
    // octets + digit widths of id/uri/length fields + body octets, and
    // offset = warcinfo length + running sum of earlier records in the
    // file) — one digit-width slip anywhere in serializer or parser and
    // every downstream offset hash-mismatches.
    ("q176_warc_cdx", (s: SparkSession, d: String) => {
      val files = graft.io.WarcIngest.syntheticWarcFiles(
        s, Tables.documents(s, d), nFiles = 16)
      graft.io.WarcIngest.warcCdx(s, files)
        .select(col("doc_id"), col("file_id"), col("surt_key"),
          col("offset"), col("record_length"))
    }, Some("""
      WITH d AS (SELECT doc_id, doc_id % 16 AS file_id,
                        octet_length(encode(text)) AS n FROM documents),
      r AS (SELECT doc_id, file_id,
                   63 + length(CAST(n AS VARCHAR)) + n AS L FROM d),
      l AS (SELECT doc_id, file_id,
                   178 + 2 * length(CAST(doc_id AS VARCHAR)) +
                   length(CAST(doc_id % 13 AS VARCHAR)) +
                   length(CAST(L AS VARCHAR)) + L AS rec_len FROM r),
      o AS (SELECT doc_id, file_id, rec_len,
                   148 + length(CAST(file_id AS VARCHAR)) +
                   COALESCE(sum(rec_len) OVER (PARTITION BY file_id
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS off
            FROM l)
      SELECT doc_id, file_id,
             'com,example,h' || CAST(doc_id % 13 AS VARCHAR) || ')/d/' ||
               CAST(doc_id AS VARCHAR) AS surt_key,
             CAST(off AS BIGINT) AS "offset",
             CAST(rec_len AS BIGINT) AS record_length
      FROM o""")),

    // HTML MAIN-CONTENT EXTRACTION (jusText/boilerpipe/trafilatura
    // stage): each document renders as a full page — head/title/style/
    // script chrome (with '<' inside the code), a nav, the text as main
    // <p> blocks (entity-escaped), a link-farm "related" div at ~0.9
    // link density, a footer — and the extractor walks it back: chrome
    // subtrees dropped, blocks segmented, the link-density gate firing
    // on exactly the related div. Lossless by construction, so the
    // oracle is ground truth: kept blocks = the text's line count, one
    // density-dropped block, md5(main_text) = md5(text) — byte-exact
    // escape/decode round-trip.
    ("q177_html_extract", (s: SparkSession, d: String) => {
      val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(
        s, Tables.documents(s, d))
      graft.operators.HtmlExtract.extractMainContent(s, pages, "doc_id", "html")
        .select(col("doc_id"), col("n_kept_blocks"), col("n_dropped_blocks"),
          md5(col("main_text")).as("main_md5"))
    }, Some("""
      SELECT doc_id,
             CAST(len(string_split(text, chr(10))) AS INTEGER) AS n_kept_blocks,
             CAST(1 AS INTEGER) AS n_dropped_blocks,
             md5(text) AS main_md5
      FROM documents""")),

    // CONTENT-TYPE SNIFFING (the WHATWG magic-number dispatch a crawl
    // runs before any typed decode): a 7-way mixed corpus where every
    // payload is built by the SAME real serializer its dedicated fixture
    // uses (full JPEG/GIF/WAV/avc-MP4/WebM/WARC/HTML bodies, not magic
    // stubs), sniffed back from first bytes alone. Oracle = the class
    // formula.
    ("q178_media_sniff", (s: SparkSession, d: String) =>
      graft.multimodal.Sniff.sniffBinary(s,
        graft.multimodal.Sniff.syntheticMixedCorpus(s, Tables.documents(s, d))),
    Some("""
      SELECT doc_id,
             CASE doc_id % 7 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'gif'
                  WHEN 2 THEN 'wav' WHEN 3 THEN 'mp4' WHEN 4 THEN 'webm'
                  WHEN 5 THEN 'warc' ELSE 'html' END AS format
      FROM documents""")),

    // CRAWL FRONT-END CAPSTONE — the stages chained end to end exactly
    // as a real ingest runs them: render pages (text → entity-escaped
    // HTML with chrome), pack into WARC blobs, walk the blobs back,
    // extract main content through the link-density gate, then the
    // Gopher rule verdict on the EXTRACTED text plus the registrable
    // domain of the WARC target URI. Because every stage is lossless on
    // the main path, the oracle derives it all from ground truth: the
    // md5 proves byte-exact text survival through render → WARC → walk →
    // extract; the Gopher stats replay q170's arithmetic on the raw
    // text; the domain folds the h{id%13} subdomains to one registrable
    // domain.
    ("q179_crawl_extract_pipeline", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(s, docs)
      val files = graft.io.WarcIngest.syntheticWarcFiles(s,
        pages.select(col("doc_id"), col("html").as("text")), nFiles = 16)
      val fetched = graft.io.WarcIngest.warcResponsesBinary(s, files)
      val main = graft.operators.HtmlExtract.extractMainContent(s,
        fetched.select(col("doc_id"), col("payload")), "doc_id", "payload")
      val verdict = graft.operators.QualityGate.gopherRules(
        main.select(col("doc_id"), col("main_text").as("text")),
        "doc_id", "text", minWords = 15, maxWords = 100000, minStopWords = 2)
      val sidecar = main
        .join(fetched.select(col("doc_id"), col("target_uri")), Seq("doc_id"))
        .select(col("doc_id"), md5(col("main_text")).as("main_md5"),
          graft.operators.UrlOps.registrableDomain(
            graft.operators.UrlOps.hostOf(col("target_uri"))).as("domain"))
      verdict.select(col("doc_id"), col("n_words"), col("gopher_pass"))
        .join(sidecar, Seq("doc_id"))
        .select(col("doc_id"), col("domain"), col("n_words"),
          col("gopher_pass"), col("main_md5"))
    }, Some("""
      WITH w AS (SELECT doc_id, text,
                        string_split_regex(text, '\s+') AS w FROM documents),
      s AS (SELECT doc_id, text,
                   CAST(len(w) AS BIGINT) AS n_words,
                   round(list_sum(list_transform(w,
                           x -> CAST(len(x) AS DOUBLE))) / len(w), 4)
                     AS mean_word_len,
                   round(len(list_filter(w,
                           x -> contains(x, '#') OR contains(x, '...')))
                         * 1.0 / len(w), 4) AS symbol_ratio,
                   round(len(list_filter(w,
                           x -> regexp_matches(x, '[A-Za-z]')))
                         * 1.0 / len(w), 4) AS alpha_frac,
                   CAST(len(list_filter(w,
                           x -> x IN ('the','be','to','of','and','that',
                                      'have','with'))) AS BIGINT)
                     AS n_stop_words
            FROM w)
      SELECT doc_id, 'example.com' AS domain, n_words,
             (n_words >= 15 AND n_words <= 100000
              AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
              AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
              AND n_stop_words >= 2) AS gopher_pass,
             md5(text) AS main_md5
      FROM s""")),

    // PAGE METADATA (the head-side complement of q177's body
    // extraction): title (RCDATA, entity-decoded), description meta
    // content through the quote-aware attribute parser, and the page's
    // total link count (chrome included — nav-heavy pages are what the
    // feature flags). The synthesized chrome makes every field a
    // formula: 'Doc N', 'Summary of document N', and 3 nav + 2 related +
    // 1 footer = 6 links.
    ("q180_html_meta", (s: SparkSession, d: String) => {
      val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(
        s, Tables.documents(s, d))
      graft.operators.HtmlExtract.pageMetaContent(s, pages, "doc_id", "html")
    }, Some("""
      SELECT doc_id,
             'Doc ' || CAST(doc_id AS VARCHAR) AS title,
             'Summary of document ' || CAST(doc_id AS VARCHAR) AS meta_desc,
             CAST(6 AS INTEGER) AS n_links
      FROM documents""")),

    // CHARSET DETECTION + DECODE (between the WARC payload's octets and
    // any text operator — crawl pipelines sniff bytes because HTTP
    // headers lie): BOM wins, else strict UTF-8 validation, else the
    // Latin-1 fallback. A three-way mixed-encoding corpus (bare UTF-8,
    // BOM'd UTF-16LE/BE — all lossless) decodes back; the oracle checks
    // the detected class by formula and byte-exact text recovery by md5.
    ("q181_charset_decode", (s: SparkSession, d: String) =>
      graft.io.CharsetDetect.decodeBinary(s,
        graft.io.CharsetDetect.syntheticEncodedCorpus(s, Tables.documents(s, d)))
        .select(col("doc_id"), col("charset"), md5(col("text")).as("text_md5")),
    Some("""
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                  ELSE 'utf-16be' END AS charset,
             md5(text) AS text_md5
      FROM documents""")),

    // ROBOTS.TXT ACCESS EVALUATION (RFC 9309 — the politeness gate ahead
    // of every fetch): one site policy whose rules exercise specific-
    // group selection (graftbot's group vs `*`, never merged), wildcard
    // and `$`-anchored patterns, longest-match precedence with Allow
    // beating Disallow, and the no-match default-allow. ua alternates,
    // the path class cycles over five shapes hitting every rule, so the
    // oracle replays each verdict by formula — a regression anywhere in
    // parse, group choice, match, or precedence flips a verdict class
    // and hash-mismatches.
    ("q182_robots_gate", (s: SparkSession, d: String) =>
      graft.operators.Robots.evalBinary(s,
        graft.operators.Robots.syntheticRobotsCorpus(s, Tables.documents(s, d))),
    Some("""
      SELECT doc_id,
             CASE doc_id % 2 WHEN 0 THEN 'GraftBot' ELSE 'FetchKit' END AS ua,
             CASE doc_id % 5
               WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/pub' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/files/r' || CAST(doc_id AS VARCHAR) || '.pdf'
               WHEN 3 THEN '/tmp/x' || CAST(doc_id AS VARCHAR)
               ELSE '/index' || CAST(doc_id AS VARCHAR) || '.html' END AS path,
             CASE WHEN doc_id % 2 = 0 THEN
               CASE doc_id % 5 WHEN 0 THEN false WHEN 2 THEN false
                    ELSE true END
             ELSE doc_id % 5 <> 3 END AS allowed,
             CASE WHEN doc_id % 2 = 0 THEN
               CASE doc_id % 5 WHEN 0 THEN '/private/'
                    WHEN 1 THEN '/private/pub*' WHEN 2 THEN '/*.pdf$'
                    ELSE '' END
             ELSE CASE doc_id % 5 WHEN 3 THEN '/tmp/' ELSE '/' END
             END AS rule
      FROM documents""")),

    // SITEMAP PARSE (sitemaps.org — the discovery side of the crawl
    // front-end, feeding the URL frontier the robots gate then filters):
    // each doc renders a urlset of 1+doc_id%4 formula entries (locs
    // carrying a query string whose '&' is entity-escaped in the XML, so
    // the hash proves the decode round-trip; lastmod/changefreq/priority
    // cycle by entry index) and the tolerant tag walk explodes it back.
    // The oracle regenerates every exploded row from the same formulas.
    ("q183_sitemap_parse", (s: SparkSession, d: String) =>
      graft.operators.Sitemap.parseBinary(s,
        graft.operators.Sitemap.syntheticSitemapCorpus(s, Tables.documents(s, d))),
    Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS j
                 FROM documents)
      SELECT doc_id, j AS seq, 'url' AS kind,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/d/' ||
               CAST(doc_id AS VARCHAR) || '/p' || CAST(j AS VARCHAR) ||
               '?q=a&r=' || CAST(j AS VARCHAR) AS loc,
             '2024-' || lpad(CAST(1 + j % 12 AS VARCHAR), 2, '0') || '-' ||
               lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS lastmod,
             CASE j % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                  ELSE 'monthly' END AS changefreq,
             (10 - j) / 10.0 AS priority
      FROM e""")),

    // OUT-LINK EXTRACTION (the link-graph feed between HTML ingest and
    // PageRank/anchor retrieval): every synthesized page carries exactly
    // six anchors — 3 nav, 2 related-article, 1 footer — with formula
    // hrefs and anchor texts; the tag walk extracts them in document
    // order and resolves each against the page's WARC-formula base URI
    // (host-relative '/x' paths → the page's host). The oracle
    // regenerates all six resolved rows per doc.
    ("q184_outlinks", (s: SparkSession, d: String) => {
      val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(
        s, Tables.documents(s, d))
        .withColumn("base_uri", concat(lit("https://h"),
          col("doc_id") % 13, lit(".example.com/d/"), col("doc_id")))
      graft.operators.LinkGraph.outLinksBinary(
        s, pages, "doc_id", "html", "base_uri")
    }, Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0, 5)) AS INT) AS seq
                 FROM documents)
      SELECT doc_id, seq,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' ||
               CASE seq WHEN 0 THEN '/' WHEN 1 THEN '/about'
                    WHEN 2 THEN '/contact'
                    WHEN 3 THEN '/p/' || CAST(doc_id AS VARCHAR) || 'a'
                    WHEN 4 THEN '/p/' || CAST(doc_id AS VARCHAR) || 'b'
                    ELSE '/terms' END AS target,
             CASE seq WHEN 0 THEN 'Home' WHEN 1 THEN 'About'
                  WHEN 2 THEN 'Contact'
                  WHEN 3 THEN 'Related article number ' ||
                              CAST(doc_id AS VARCHAR) || ' part one'
                  WHEN 4 THEN 'Related article number ' ||
                              CAST(doc_id AS VARCHAR) || ' part two'
                  ELSE 'Terms' END AS anchor
      FROM e""")),

    // ANCHOR-TEXT INDEX (the retrieval signal built FROM the link graph:
    // per resolved target, in-link count, distinct referring pages,
    // distinct anchor strings, and the lexicographically-first
    // representative anchor). Chrome targets aggregate one row per host
    // shard (all docs with the same doc_id%13), article targets stay
    // singletons — the oracle replays the same GROUP BY over the
    // formula-generated link rows. One corpus-wide hash agg, map-side
    // partials, output targets-sized.
    ("q185_anchor_index", (s: SparkSession, d: String) => {
      val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(
        s, Tables.documents(s, d))
        .withColumn("base_uri", concat(lit("https://h"),
          col("doc_id") % 13, lit(".example.com/d/"), col("doc_id")))
      graft.operators.LinkGraph.anchorIndex(
        graft.operators.LinkGraph.outLinksBinary(
          s, pages, "doc_id", "html", "base_uri"), "doc_id")
    }, Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0, 5)) AS INT) AS seq
                 FROM documents),
      l AS (SELECT doc_id,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' ||
               CASE seq WHEN 0 THEN '/' WHEN 1 THEN '/about'
                    WHEN 2 THEN '/contact'
                    WHEN 3 THEN '/p/' || CAST(doc_id AS VARCHAR) || 'a'
                    WHEN 4 THEN '/p/' || CAST(doc_id AS VARCHAR) || 'b'
                    ELSE '/terms' END AS target,
             CASE seq WHEN 0 THEN 'Home' WHEN 1 THEN 'About'
                  WHEN 2 THEN 'Contact'
                  WHEN 3 THEN 'Related article number ' ||
                              CAST(doc_id AS VARCHAR) || ' part one'
                  WHEN 4 THEN 'Related article number ' ||
                              CAST(doc_id AS VARCHAR) || ' part two'
                  ELSE 'Terms' END AS anchor
            FROM e)
      SELECT target, count(*) AS n_refs,
             count(DISTINCT doc_id) AS n_pages,
             count(DISTINCT anchor) AS n_anchors,
             min(anchor) AS rep_anchor
      FROM l GROUP BY target""")),

    // FRONTIER SCHEDULING (politeness: one fetch per host per 5 s):
    // the sitemap-exploded URLs queue per host ordered by priority
    // descending (URL tie-break), slot k fetches at offset 5k. One
    // shuffle keyed by host — per-host queues are sequential by
    // definition, so the window partitioning IS the semantics. The
    // oracle replays the explode and the same window arithmetic.
    ("q186_frontier_schedule", (s: SparkSession, d: String) =>
      graft.operators.Frontier.schedule(
        graft.operators.Sitemap.parseBinary(s,
          graft.operators.Sitemap.syntheticSitemapCorpus(
            s, Tables.documents(s, d))),
        "loc", "priority", delaySec = 5.0)
        .select(col("doc_id"), col("seq"), col("loc"), col("host"),
          col("slot"), col("offset_sec")),
    Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS j
                 FROM documents),
      l AS (SELECT doc_id, j AS seq,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/d/' ||
               CAST(doc_id AS VARCHAR) || '/p' || CAST(j AS VARCHAR) ||
               '?q=a&r=' || CAST(j AS VARCHAR) AS loc,
             'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' AS host,
             (10 - j) / 10.0 AS priority
            FROM e)
      SELECT doc_id, seq, loc, host,
             CAST(row_number() OVER (PARTITION BY host
               ORDER BY priority DESC, loc) - 1 AS BIGINT) AS slot,
             (row_number() OVER (PARTITION BY host
               ORDER BY priority DESC, loc) - 1) * 5.0 AS offset_sec
      FROM l""")),

    // ADAPTIVE RECRAWL (Cho & Garcia-Molina revisit policy): from a
    // four-fetch history per URL whose content hash flips every
    // 1+doc_id%4 fetches (the corpus spans rate 1 → rate 0), estimate
    // the change rate from consecutive-pair hash diffs and schedule
    // next_interval = 24h/(1+9·rate). One URL-keyed shuffle serves both
    // the lag walk and the aggregation. The oracle replays the hash
    // stream by formula and the same window + groupBy arithmetic.
    ("q187_recrawl_policy", (s: SparkSession, d: String) =>
      graft.operators.Frontier.adaptiveSchedule(
        graft.operators.Frontier.syntheticFetchHistory(Tables.documents(s, d)),
        "url", "fetch_seq", "content_hash", baseHours = 24.0),
    Some("""
      WITH h AS (SELECT doc_id, text,
                        'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
                          '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
                        CAST(unnest(generate_series(0, 3)) AS INT) AS j,
                        CAST(1 + doc_id % 4 AS INT) AS k
                 FROM documents),
      c AS (SELECT url, j,
                   md5(text || '#' || CAST(j // k AS VARCHAR)) AS hash
            FROM h),
      g AS (SELECT url, hash,
                   lag(hash) OVER (PARTITION BY url ORDER BY j) AS prev
            FROM c)
      SELECT url, count(*) AS n_fetches,
             CAST(sum(CASE WHEN prev IS NOT NULL AND hash <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
             round(sum(CASE WHEN prev IS NOT NULL AND hash <> prev
                            THEN 1 ELSE 0 END) * 1.0 / (count(*) - 1), 4)
               AS change_rate,
             round(24.0 / (1.0 + 9.0 *
               sum(CASE WHEN prev IS NOT NULL AND hash <> prev
                        THEN 1 ELSE 0 END) / (count(*) - 1)), 2)
               AS next_interval_hours
      FROM g GROUP BY url""")),

    // REDIRECT-CHAIN RESOLUTION (301/302 fetch rows → final destination
    // by POINTER DOUBLING — ⌈log₂ 32⌉ = 5 self-joins resolve every chain
    // up to 32 hops, never a per-hop loop): each doc owns a chain of
    // 1+doc_id%4 fetch rows, so hop counts span 0..3 and every position
    // resolves to the chain's terminal. The oracle derives (final_url,
    // n_hops) from the position formula — any slip in the doubling
    // composition (hop arithmetic, done propagation, dangling handling)
    // shifts a count or endpoint and hash-mismatches.
    ("q188_redirect_resolve", (s: SparkSession, d: String) =>
      graft.operators.Redirects.resolve(
        graft.operators.Redirects.syntheticFetchLog(s, Tables.documents(s, d)),
        "url", "location"),
    Some("""
      WITH e AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS l,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS p
                 FROM documents)
      SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/r/' ||
               CAST(doc_id AS VARCHAR) || '/' || CAST(p AS VARCHAR) AS url,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/r/' ||
               CAST(doc_id AS VARCHAR) || '/' || CAST(l AS VARCHAR)
               AS final_url,
             CAST(l - p AS BIGINT) AS n_hops,
             true AS terminal
      FROM e""")),

    // STRUCTURED-DATA EXTRACTION (OpenGraph + schema.org JSON-LD — the
    // metadata vocabularies a crawl mines before touching body text):
    // each fixture head carries four og:* metas (plus a DUPLICATE
    // og:title that must lose — first occurrence wins — and a case-mixed
    // property name), a non-LD script that must not be captured, and one
    // JSON-LD Article block. The og side is the tag scan; the JSON side
    // is codegen'd get_json_object, never a hand parser. Oracle = the
    // field formulas.
    ("q189_structured_data", (s: SparkSession, d: String) =>
      graft.operators.StructuredData.structuredBinary(s,
        graft.operators.StructuredData.syntheticSocialCorpus(
          s, Tables.documents(s, d)), "doc_id", "html"),
    Some("""
      SELECT doc_id,
             'Doc ' || CAST(doc_id AS VARCHAR) AS og_title,
             'article' AS og_type,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
               '.example.com/img/' || CAST(doc_id AS VARCHAR) || '.jpg'
               AS og_image,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
               '.example.com/d/' || CAST(doc_id AS VARCHAR) AS og_url,
             'Article' AS ld_type,
             'Doc ' || CAST(doc_id AS VARCHAR) AS ld_headline,
             CAST(100 + doc_id % 50 AS INTEGER) AS ld_word_count
      FROM documents""")),

    // FRONTIER-BUILD CAPSTONE — discovery to schedule, chained as a real
    // crawler runs it: sitemap explode (priority-carrying) UNION the
    // pages' extracted out-links (default priority 0.5, distinct), then
    // the robots policy COMPILED into a codegen'd predicate (graftbot's
    // group disallows /p/ — exactly the link-farm article URLs, which
    // every page contributes two of), then per-host politeness slots.
    // The oracle rebuilds the surviving candidate set from the formulas
    // and replays the window. A slip anywhere — an entity not decoded, a
    // resolution miss, the gate matching /p/ too broadly or narrowly, a
    // tie-break drift — moves a slot and hash-mismatches.
    ("q190_frontier_capstone", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val sm = graft.operators.Sitemap.parseBinary(s,
        graft.operators.Sitemap.syntheticSitemapCorpus(s, docs))
        .select(col("loc").as("url"), col("priority"))
      val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(s, docs)
        .withColumn("base_uri", concat(lit("https://h"), col("doc_id") % 13,
          lit(".example.com/d/"), col("doc_id")))
      val links = graft.operators.LinkGraph.outLinksBinary(
          s, pages, "doc_id", "html", "base_uri")
        .select(col("target").as("url"), lit(0.5).as("priority")).distinct()
      val policy =
        "User-agent: graftbot\nDisallow: /p/\n\nUser-agent: *\nDisallow: /\n"
      val cand = sm.unionByName(links).where(
        graft.operators.Robots.policyFilter(policy, "GraftBot", col("url")))
      graft.operators.Frontier.schedule(cand, "url", "priority", 5.0)
        .select(col("host"), col("url"), col("priority"), col("slot"),
          col("offset_sec"))
    }, Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS j
                 FROM documents),
      sm AS (SELECT
               'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.com/d/' || CAST(doc_id AS VARCHAR) || '/p' ||
                 CAST(j AS VARCHAR) || '?q=a&r=' || CAST(j AS VARCHAR) AS url,
               (10 - j) / 10.0 AS priority,
               'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' AS host
             FROM e),
      ch AS (SELECT DISTINCT
               'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.com' || p.path AS url,
               0.5 AS priority,
               'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com' AS host
             FROM documents,
                  (VALUES ('/'), ('/about'), ('/contact'), ('/terms'))
                    p(path)),
      u AS (SELECT * FROM sm UNION ALL SELECT * FROM ch)
      SELECT host, url, priority,
             CAST(row_number() OVER (PARTITION BY host
               ORDER BY priority DESC, url) - 1 AS BIGINT) AS slot,
             (row_number() OVER (PARTITION BY host
               ORDER BY priority DESC, url) - 1) * 5.0 AS offset_sec
      FROM u""")),

    // CRAWL SNAPSHOT DIFF (the change report between two crawls: ONE
    // full-outer join keyed by URL, verdict a codegen'd CASE over the
    // hash pair): id%5==0 missing from the previous crawl → added,
    // id%5==1 missing from the current → removed, id%3==0 bodies carry a
    // v2 suffix → changed, rest unchanged. The oracle replays both
    // snapshot constructions and the same outer-join classification.
    ("q191_crawl_diff", (s: SparkSession, d: String) => {
      val (prev, cur) = graft.operators.CrawlDiff.syntheticSnapshots(
        s, Tables.documents(s, d))
      graft.operators.CrawlDiff.diff(prev, cur, "url", "content_hash")
    }, Some("""
      WITH b AS (SELECT doc_id, text,
                        'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
                          '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url
                 FROM documents),
      p AS (SELECT url, md5(text) AS prev_hash FROM b WHERE doc_id % 5 <> 0),
      c AS (SELECT url, md5(text || CASE WHEN doc_id % 3 = 0 THEN 'v2'
                                         ELSE '' END) AS cur_hash
            FROM b WHERE doc_id % 5 <> 1)
      SELECT coalesce(p.url, c.url) AS url, prev_hash, cur_hash,
             CASE WHEN prev_hash IS NULL THEN 'added'
                  WHEN cur_hash IS NULL THEN 'removed'
                  WHEN prev_hash = cur_hash THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM p FULL OUTER JOIN c ON p.url = c.url""")),

    // WET CONVERSION ROUND-TRIP (the text-only `.wet` sibling of the
    // response archive — what a curation pipeline actually reads): text
    // rows pack into 16 WET blobs of `WARC-Type: conversion` records
    // (UTF-8 payload, no HTTP block, Refers-To linkage) and the framed
    // walk recovers them. The oracle derives URI and Content-Length from
    // ground truth and the md5 proves byte-exact text survival through
    // serialize → blob → walk.
    ("q192_wet_roundtrip", (s: SparkSession, d: String) =>
      graft.io.WarcIngest.wetRecordsBinary(s,
        graft.io.WarcIngest.syntheticWetFiles(s, Tables.documents(s, d),
          nFiles = 16))
        .select(col("doc_id"), col("target_uri"), col("content_length"),
          md5(col("text")).as("text_md5")),
    Some("""
      SELECT doc_id,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
               '.example.com/d/' || CAST(doc_id AS VARCHAR) AS target_uri,
             CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
             md5(text) AS text_md5
      FROM documents""")),

    // PER-HOST CRAWL-DELAY SCHEDULING (robots Crawl-delay → the
    // scheduler, end to end: each host's policy parses to a delay, the
    // hosts-sized dim BROADCASTS onto the sitemap frontier — the corpus
    // still shuffles exactly once, on host — and slot k fetches at
    // k·delay(host)): host X's policy says Crawl-delay: 1+X%5, so every
    // offset is a joint function of queue position AND policy. The
    // oracle replays the window with the delay formula.
    ("q193_crawl_delay_schedule", (s: SparkSession, d: String) => {
      val hosts = Tables.documents(s, d)
        .select((col("doc_id") % 13).as("x")).distinct()
        .select(concat(lit("h"), col("x"), lit(".example.com")).as("host"),
          concat(lit("User-agent: *\nCrawl-delay: "),
            col("x") % 5 + 1).as("robots_txt"))
      val delays = graft.operators.Robots.crawlDelays(
        s, hosts, "host", "robots_txt", "GraftBot", default = 5.0)
      val sm = graft.operators.Sitemap.parseBinary(s,
        graft.operators.Sitemap.syntheticSitemapCorpus(
          s, Tables.documents(s, d)))
        .select(col("loc").as("url"), col("priority"))
      graft.operators.Frontier.scheduleWithDelays(
        sm, "url", "priority", delays, default = 5.0)
        .select(col("host"), col("url"), col("priority"), col("delay_sec"),
          col("slot"), col("offset_sec"))
    }, Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS j
                 FROM documents),
      l AS (SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
                     '.example.com/d/' || CAST(doc_id AS VARCHAR) || '/p' ||
                     CAST(j AS VARCHAR) || '?q=a&r=' || CAST(j AS VARCHAR)
                     AS url,
                   'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com'
                     AS host,
                   (10 - j) / 10.0 AS priority,
                   CAST(1 + (doc_id % 13) % 5 AS DOUBLE) AS delay_sec
            FROM e)
      SELECT host, url, priority, delay_sec,
             CAST(row_number() OVER (PARTITION BY host
               ORDER BY priority DESC, url) - 1 AS BIGINT) AS slot,
             (row_number() OVER (PARTITION BY host
               ORDER BY priority DESC, url) - 1) * delay_sec AS offset_sec
      FROM l""")),

    // CRAWL-BUDGET ALLOCATION (capacity planning for one fetch window:
    // a host politely absorbs ⌊window/delay⌋+1 fetches; a global budget
    // of 150 allocates greedily in host order, the boundary splitting
    // exactly one host): with window=60 s and per-host delay 1+X%5 s,
    // every politeness cap binds below the queue length and the budget
    // exhausts mid-table — full, partial, and zero allocations all
    // appear. The oracle replays the aggregation, the cap arithmetic,
    // and the running-sum clamp.
    ("q194_crawl_budget", (s: SparkSession, d: String) => {
      val sm = graft.operators.Sitemap.parseBinary(s,
        graft.operators.Sitemap.syntheticSitemapCorpus(
          s, Tables.documents(s, d)))
        .select(col("loc").as("url"), col("priority"))
        .withColumn("host", graft.operators.UrlOps.hostOf(col("url")))
        .withColumn("delay_sec",
          (regexp_extract(col("host"), "^h(\\d+)\\.", 1).cast("long") % 5
            + 1).cast("double"))
      graft.operators.Frontier.budgetAllocate(
        sm, "host", "delay_sec", windowSec = 60.0, budget = 150L)
    }, Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS j
                 FROM documents),
      l AS (SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com'
                     AS host,
                   CAST(1 + (doc_id % 13) % 5 AS DOUBLE) AS delay_sec
            FROM e),
      per AS (SELECT host, count(*) AS queue_len,
                     first(delay_sec) AS delay_sec
              FROM l GROUP BY host),
      c AS (SELECT host, queue_len,
                   least(queue_len,
                     CAST(floor(60.0 / delay_sec) AS BIGINT) + 1) AS cap
            FROM per),
      b AS (SELECT *, coalesce(sum(cap) OVER (ORDER BY host
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS before
            FROM c)
      SELECT host, queue_len, cap,
             CAST(greatest(0, least(cap, 150 - before)) AS BIGINT) AS alloc
      FROM b""")),

    // SITEMAP-INDEX EXPANSION (the two-level fan-out the protocol forces
    // above 50k URLs: index documents name child sitemaps, the child
    // locs RESOLVE against the fetch store by ONE equi-join — the spec
    // caps recursion at depth 2, so this join IS the whole expansion):
    // each doc's index names two children carrying 1+(id+c)%3 entries.
    // The oracle double-explodes the same formulas; a slip in index
    // parsing, the join key, or child ordering moves provenance and
    // hash-mismatches.
    ("q195_sitemap_index_expand", (s: SparkSession, d: String) => {
      val (idx, kids) = graft.operators.Sitemap.syntheticIndexCorpus(
        s, Tables.documents(s, d))
      graft.operators.Sitemap.expandIndex(s, idx, kids)
    }, Some("""
      WITH c AS (SELECT doc_id,
                        CAST(unnest(generate_series(0, 1)) AS INT)
                          AS child_idx
                 FROM documents),
      e AS (SELECT doc_id, child_idx,
                   CAST(unnest(generate_series(0,
                     CAST((doc_id + child_idx) % 3 AS INT))) AS INT) AS j
            FROM c)
      SELECT doc_id, child_idx, j AS seq,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
               '.example.com/d/' || CAST(doc_id AS VARCHAR) || '/' ||
               CAST(child_idx AS VARCHAR) || '/p' || CAST(j AS VARCHAR)
               AS loc
      FROM e""")),

    // ROBOTS-DECLARED SITEMAP DISCOVERY (the bootstrap: robots.txt is
    // the FIRST fetch, its cross-group `Sitemap:` directives seed
    // discovery — RFC 9309 §2.3 binds them to no UA group, which the
    // collector must honor by ignoring group structure): each doc's
    // robots declares its sitemap URL amid group noise, the declared
    // URLs resolve against the fetch store by one equi-join, and the
    // resolved urlsets parse to exactly q183's entry frame — so the two
    // discovery paths (direct fetch vs robots-declared) are oracle-pinned
    // to agree.
    ("q196_robots_sitemap_discovery", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val robots = docs.select(col("doc_id"),
        concat(lit("User-agent: graftbot\nDisallow: /private/\n\nSitemap: "),
          lit("https://h"), col("doc_id") % 13, lit(".example.com/sm/"),
          col("doc_id"), lit(".xml\nUser-agent: *\nDisallow: /\n"))
          .as("robots_txt"))
      val declared = graft.operators.Robots.declaredSitemaps(
        s, robots, "doc_id", "robots_txt")
      val store = graft.operators.Sitemap.syntheticSitemapCorpus(s, docs)
        .select(concat(lit("https://h"), col("doc_id") % 13,
          lit(".example.com/sm/"), col("doc_id"), lit(".xml")).as("url"),
          col("sitemap_xml"))
      graft.operators.Sitemap.parseBinary(s,
        declared.join(store, declared("sitemap_url") === store("url"))
          .select(col("doc_id"), col("sitemap_xml")))
    }, Some("""
      WITH e AS (SELECT doc_id,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS j
                 FROM documents)
      SELECT doc_id, j AS seq, 'url' AS kind,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/d/' ||
               CAST(doc_id AS VARCHAR) || '/p' || CAST(j AS VARCHAR) ||
               '?q=a&r=' || CAST(j AS VARCHAR) AS loc,
             '2024-' || lpad(CAST(1 + j % 12 AS VARCHAR), 2, '0') || '-' ||
               lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS lastmod,
             CASE j % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                  ELSE 'monthly' END AS changefreq,
             (10 - j) / 10.0 AS priority
      FROM e""")),

    // REDIRECTS FROM RAW BYTES (q188's resolution fed by the WARC walk
    // instead of a prepared frame: 301 records carry their pointer in
    // the HTTP `Location` header, which the walk now parses out of the
    // header block — terminal 200s carry null): chains serialize into 16
    // blobs, parse back, and pointer-double to the same (final, hops)
    // formula as q188. A slip in HTTP-header parsing (case, first-wins,
    // the CRLF split) breaks the chain and hash-mismatches.
    ("q197_redirects_from_warc", (s: SparkSession, d: String) => {
      val fetched = graft.io.WarcIngest.warcResponsesBinary(s,
        graft.io.WarcIngest.syntheticRedirectWarcFiles(
          s, Tables.documents(s, d), nFiles = 16))
      graft.operators.Redirects.resolve(
        fetched.select(col("target_uri").as("url"), col("location")),
        "url", "location")
    }, Some("""
      WITH e AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS l,
                        CAST(unnest(generate_series(0,
                          CAST(doc_id % 4 AS INT))) AS INT) AS p
                 FROM documents)
      SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/r/' ||
               CAST(doc_id AS VARCHAR) || '/' || CAST(p AS VARCHAR) AS url,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example.com/r/' ||
               CAST(doc_id AS VARCHAR) || '/' || CAST(l AS VARCHAR)
               AS final_url,
             CAST(l - p AS BIGINT) AS n_hops,
             true AS terminal
      FROM e""")),

    // META-ROBOTS DIRECTIVES (the page-level opt-out a compliant corpus
    // pipeline honors before text or links enter any store: noindex
    // drops the page, nofollow drops its out-links; `none` ≡ both): the
    // fixture cycles all five directive classes with case-mixed
    // attribute values and a script-embedded FAKE robots meta that must
    // not match. Oracle = the class formulas.
    ("q198_meta_robots", (s: SparkSession, d: String) =>
      graft.operators.StructuredData.metaRobotsBinary(s,
        graft.operators.StructuredData.syntheticDirectiveCorpus(
          s, Tables.documents(s, d)), "doc_id", "html"),
    Some("""
      SELECT doc_id,
             doc_id % 5 IN (1, 3, 4) AS noindex,
             doc_id % 5 IN (2, 3, 4) AS nofollow
      FROM documents""")),

    // GZIP WARC ROUND-TRIP (.warc.gz — the wire format every real Common
    // Crawl segment ships in: each record its own gzip member): the SAME
    // record stream as q175, but each record RFC 1952-compressed before
    // concatenation, walked back member-wise (header-field walk, raw
    // Inflater, ISIZE check) through the auto-dispatching parser. The
    // oracle is q175's — URI/status from the id formula, the WARC
    // header's Content-Length from the HTTP block arithmetic, md5 proving
    // byte-exact body recovery THROUGH the compression — so a fault
    // anywhere in member framing, inflation, or the inner walk
    // hash-mismatches. Member-span coordinates (CDX range reads over
    // compressed blobs) are pinned by law in WarcIngestSpec.
    ("q199_warc_gzip_roundtrip", (s: SparkSession, d: String) => {
      val files = graft.io.WarcIngest.syntheticWarcFilesGz(
        s, Tables.documents(s, d), nFiles = 16)
      graft.io.WarcIngest.warcResponsesBinary(s, files)
        .select(col("doc_id"), col("target_uri"), col("http_status"),
          col("content_length"), md5(col("payload")).as("payload_md5"))
    }, Some("""
      SELECT doc_id,
             'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
               '.example.com/d/' || CAST(doc_id AS VARCHAR) AS target_uri,
             CAST(200 AS INTEGER) AS http_status,
             CAST(63 + length(CAST(octet_length(encode(text)) AS VARCHAR))
                  + octet_length(encode(text)) AS BIGINT) AS content_length,
             md5(text) AS payload_md5
      FROM documents""")),

    // HTTP BODY DECODING (the encodings real fetch records carry
    // routinely): every 3rd response body rides Transfer-Encoding:
    // chunked (16-octet chunks — multi-chunk reassembly on every
    // non-trivial doc); content codings by residue — every 20th the
    // LIST "gzip, br" (both codings stacked in wire order, decoded in
    // reverse), else every 5th brotli (REAL RFC 7932 framing through
    // graft.io.Brotli both directions), else every 4th gzip. De-frame
    // THEN decode — the wire nesting. The walk surfaces the encodings it
    // decoded plus the md5 of the recovered text: a fault in chunk
    // framing, any coding, list order, or the nesting order
    // hash-mismatches the affected residue class.
    ("q200_http_body_decode", (s: SparkSession, d: String) => {
      val files = graft.io.WarcIngest.syntheticEncodedWarcFiles(
        s, Tables.documents(s, d), nFiles = 16)
      graft.io.WarcIngest.warcResponsesDecoded(s, files)
        .select(col("doc_id"), col("transfer_encoding"),
          col("content_encoding"), md5(col("payload")).as("payload_md5"))
    }, Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'chunked' ELSE 'identity' END
               AS transfer_encoding,
             CASE WHEN doc_id % 20 = 0 THEN 'gzip, br'
                  WHEN doc_id % 5 = 0 THEN 'br'
                  WHEN doc_id % 4 = 0 THEN 'gzip'
                  ELSE 'identity' END
               AS content_encoding,
             md5(text) AS payload_md5
      FROM documents""")),

    // PERCEPTUAL IMAGE HASH through the oracle gate (the multimodal
    // near-dup bridge: real JPEG entropy decode → grayscale box grid →
    // 64-bit gradient hash): the fixture is 72×64 so the dHash 9×8 grid
    // tiles the 8×8 blocks exactly — a cell average IS its block
    // constant — and every gradient bit replays as integer arithmetic.
    // The hash surfaces as two unsigned 32-bit halves (a set bit 63
    // would overflow the oracle's BIGINT power sum). A fault anywhere in
    // the codec, the luma/box plumbing, or the bit packing flips bits.
    ("q205_image_dhash", (s: SparkSession, d: String) => {
      val imgs = BinaryOps.syntheticHashJpegCorpus(s, Tables.documents(s, d))
      graft.multimodal.ImageHash.imageFingerprints(s, imgs,
          "doc_id", "payload")
        .select(col("doc_id"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"))
    }, Some("""
      WITH k AS (SELECT doc_id, unnest(range(0, 64)) AS k FROM documents),
      b AS (SELECT doc_id, k, ((k // 8) * 9 + (k % 8)) AS li FROM k),
      v AS (SELECT doc_id, k,
                   (doc_id * 31 + li * 17) % 256 AS lv,
                   (doc_id * 31 + (li + 1) * 17) % 256 AS rv
            FROM b)
      SELECT doc_id,
             CAST(sum(CASE WHEN lv < rv AND k >= 32
                           THEN CAST(1 AS BIGINT) << (k - 32)
                           ELSE 0 END) AS BIGINT) AS dhash_hi,
             CAST(sum(CASE WHEN lv < rv AND k < 32
                           THEN CAST(1 AS BIGINT) << k
                           ELSE 0 END) AS BIGINT) AS dhash_lo
      FROM v GROUP BY doc_id""")),

    // IMAGE NEAR-DUP PAIRS (multimodal dedup end-to-end: decode → dHash
    // → banded Hamming join): consecutive ids share a base image, the
    // odd one perturbed by +18 on block 0 — exactly one gradient bit
    // moves, a true near-dup. The base mixes NONLINEARLY into the
    // gradient structure (the ·bi² term), so distinct bases get
    // effectively distinct hashes and the pair set stays linear in the
    // corpus — and the whole mix is still integer arithmetic the oracle
    // replays. The 16-bit-chunk blocking is EXACT for radius 3
    // (pigeonhole), so the emitted pair set equals the oracle's
    // brute-force Hamming scan over the formula-derived hashes.
    ("q206_image_neardup", (s: SparkSession, d: String) => {
      val imgs = BinaryOps.syntheticNearDupJpegCorpusDiverse(s,
        Tables.documents(s, d))
      graft.multimodal.ImageHash.nearDupPairs(s, imgs,
        "doc_id", "payload", maxDist = 3)
    }, Some("""
      WITH k AS (SELECT doc_id, unnest(range(0, 64)) AS k FROM documents),
      b AS (SELECT doc_id, k, ((k // 8) * 9 + (k % 8)) AS li FROM k),
      v AS (SELECT doc_id, k,
                   ((doc_id // 2) * 2654435761 + li * 40503 +
                    ((doc_id // 2) % 911) * li * li +
                    CASE WHEN doc_id % 2 = 1 AND li = 0 THEN 18 ELSE 0 END)
                     % 256 AS lv,
                   ((doc_id // 2) * 2654435761 + (li + 1) * 40503 +
                    ((doc_id // 2) % 911) * (li + 1) * (li + 1)) % 256 AS rv
            FROM b),
      h AS (SELECT doc_id,
                   sum(CASE WHEN lv < rv AND k >= 32
                            THEN CAST(1 AS BIGINT) << (k - 32)
                            ELSE 0 END) AS hi,
                   sum(CASE WHEN lv < rv AND k < 32
                            THEN CAST(1 AS BIGINT) << k
                            ELSE 0 END) AS lo
            FROM v GROUP BY doc_id)
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
             CAST(bit_count(xor(a.hi, b2.hi)) +
                  bit_count(xor(a.lo, b2.lo)) AS INTEGER) AS dist
      FROM h a JOIN h b2 ON a.doc_id < b2.doc_id
      WHERE bit_count(xor(a.hi, b2.hi)) + bit_count(xor(a.lo, b2.lo)) <= 3""")),

    // EXIF PROVENANCE through the oracle gate: each fixture JPEG carries
    // an APP1 whose TIFF block alternates byte order by id parity (both
    // endian walks on the oracle path) with make/model/orientation/
    // timestamp as id arithmetic; the Spark side SERIALIZES the IFD
    // (offset-area ASCII values, inline SHORT, ascending tags) and
    // re-WALKS the bytes (Exif.parseExif — marker scan, byte-order
    // dispatch, bounds-checked entry table). A slip in either direction
    // of either endianness hash-mismatches its parity class.
    ("q207_exif_meta", (s: SparkSession, d: String) =>
      graft.multimodal.Exif.exifMetaBinary(s,
        graft.multimodal.Exif.syntheticExifJpegCorpus(
          s, Tables.documents(s, d))),
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
             'make' || CAST(doc_id % 5 AS VARCHAR) AS make,
             'model' || CAST(doc_id % 7 AS VARCHAR) AS model,
             CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
             lpad(CAST(2000 + doc_id % 24 AS VARCHAR), 4, '0') || ':' ||
               lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || ' ' ||
               lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS date_time
      FROM documents""")),

    // PERCEPTUAL AUDIO FINGERPRINT through the oracle gate (the audio
    // twin of q205: real RIFF/PCM decode → per-window band energies →
    // Haitsma–Kalker band-difference sign bits): each fixture window is
    // a sum of 9 tones at integer DFT bins of the window length, so band
    // orthogonality makes E(w,b) exactly (amplitude·N/2)² and every
    // E(w,b) > E(w,b+1) bit replays as the q205 integer grid formula
    // with the comparison flipped. A fault in the WAV walk, the window
    // framing, the phasor recurrence, or the bit packing flips bits.
    ("q208_audio_fingerprint", (s: SparkSession, d: String) => {
      val wavs = graft.multimodal.AudioHash.syntheticHashWavCorpus(
        s, Tables.documents(s, d))
      graft.multimodal.AudioHash.audioFingerprints(s, wavs,
          "doc_id", "payload")
        .select(col("doc_id"),
          shiftrightunsigned(col("ahash"), 32).as("ahash_hi"),
          col("ahash").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"))
    }, Some("""
      WITH k AS (SELECT doc_id, unnest(range(0, 64)) AS k FROM documents),
      b AS (SELECT doc_id, k, ((k // 8) * 9 + (k % 8)) AS li FROM k),
      v AS (SELECT doc_id, k,
                   (doc_id * 31 + li * 17) % 256 AS lv,
                   (doc_id * 31 + (li + 1) * 17) % 256 AS rv
            FROM b)
      SELECT doc_id,
             CAST(sum(CASE WHEN lv > rv AND k >= 32
                           THEN CAST(1 AS BIGINT) << (k - 32)
                           ELSE 0 END) AS BIGINT) AS ahash_hi,
             CAST(sum(CASE WHEN lv > rv AND k < 32
                           THEN CAST(1 AS BIGINT) << k
                           ELSE 0 END) AS BIGINT) AS ahash_lo
      FROM v GROUP BY doc_id""")),

    // AUDIO NEAR-DUP PAIRS (multimodal dedup, second modality: decode →
    // fingerprint → the SAME chunk-blocked Hamming join as q206):
    // consecutive ids share a base recording, the odd one re-mixed with
    // tone 0 bumped +18 — at most one band-comparison bit moves, a true
    // near-dup. The bi² amplitude mix keeps distinct bases in distinct
    // hash classes at oracle scale, and the ×2 + li%2 parity alternation
    // keeps ADJACENT cells unequal so no comparison bit rides on float
    // residue — the emitted pair set equals the oracle's brute-force
    // Hamming scan over the formula-derived hashes.
    ("q209_audio_neardup", (s: SparkSession, d: String) => {
      val wavs = graft.multimodal.AudioHash.syntheticNearDupWavCorpus(
        s, Tables.documents(s, d))
      graft.multimodal.AudioHash.nearDupPairs(s, wavs,
        "doc_id", "payload", maxDist = 3)
    }, Some("""
      WITH k AS (SELECT doc_id, unnest(range(0, 64)) AS k FROM documents),
      b AS (SELECT doc_id, k, ((k // 8) * 9 + (k % 8)) AS li FROM k),
      v AS (SELECT doc_id, k,
                   2 * (((doc_id // 2) * 2654435761 + li * 40503 +
                         ((doc_id // 2) % 911) * li * li) % 256)
                     + (li % 2)
                     + CASE WHEN doc_id % 2 = 1 AND li = 0 THEN 18 ELSE 0 END
                     AS lv,
                   2 * (((doc_id // 2) * 2654435761 + (li + 1) * 40503 +
                         ((doc_id // 2) % 911) * (li + 1) * (li + 1)) % 256)
                     + ((li + 1) % 2) AS rv
            FROM b),
      h AS (SELECT doc_id,
                   sum(CASE WHEN lv > rv AND k >= 32
                            THEN CAST(1 AS BIGINT) << (k - 32)
                            ELSE 0 END) AS hi,
                   sum(CASE WHEN lv > rv AND k < 32
                            THEN CAST(1 AS BIGINT) << k
                            ELSE 0 END) AS lo
            FROM v GROUP BY doc_id)
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
             CAST(bit_count(xor(a.hi, b2.hi)) +
                  bit_count(xor(a.lo, b2.lo)) AS INTEGER) AS dist
      FROM h a JOIN h b2 ON a.doc_id < b2.doc_id
      WHERE bit_count(xor(a.hi, b2.hi)) + bit_count(xor(a.lo, b2.lo)) <= 3""")),

    // ID3v2 PROVENANCE through the oracle gate (the audio twin of q207
    // EXIF): each fixture file is a real ID3 tag prepending a WAV
    // payload — v2.3 for even ids, v2.4 for odd, so BOTH frame-size
    // wire formats (plain vs syncsafe), BOTH year frames (TYER vs
    // TDRC's leading yyyy), and BOTH text encodings (ISO-8859-1 vs
    // UTF-8) sit on the oracle path, every 7th tag padded, an unknown
    // TXXX frame to walk over in every tag, and every 13th file
    // TRUNCATED mid-frame — the structural-break drop is oracle-checked
    // as an absent row, never a half-read one.
    ("q211_id3_meta", (s: SparkSession, d: String) =>
      graft.multimodal.Id3.id3MetaBinary(s,
        graft.multimodal.Id3.syntheticTaggedAudioCorpus(
          s, Tables.documents(s, d)),
        "doc_id", "payload"),
    Some("""
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS INTEGER)
               AS id3_version,
             't' || CAST(doc_id % 97 AS VARCHAR) AS title,
             'a' || CAST(doc_id % 89 AS VARCHAR) AS artist,
             'al' || CAST(doc_id % 83 AS VARCHAR) AS album,
             CAST(1960 + doc_id % 60 AS INTEGER) AS year,
             CAST(1 + doc_id % 30 AS INTEGER) AS track
      FROM documents WHERE doc_id % 13 <> 0""")),

    // AUDIO QUALITY SIGNALS through the oracle gate (the audio twin of
    // q170's Gopher rules): per-recording silence/clipping/DC/energy
    // statistics as EXACT integer sums over the real RIFF/PCM decode.
    // The fixture injects pathologies at window grain by formula —
    // m = (id·7+w·13) mod 11 picks silent (m=0), clipped (m=1), or a
    // DC-offset square wave — and square waves make every statistic
    // closed-form: peak = A+|D|, Σs = 128·D, Σs² = 128·(D²+A²). A fault
    // in the WAV walk, the channel-0 selection, the window framing, or
    // any accumulator mismatches its formula.
    ("q212_audio_quality", (s: SparkSession, d: String) =>
      graft.multimodal.AudioSignal.audioQualityStats(s,
        graft.multimodal.AudioSignal.syntheticQualityWavCorpus(
          s, Tables.documents(s, d)),
        "doc_id", "payload"),
    Some("""
      WITH w AS (SELECT doc_id, unnest(range(0, 8)) AS w FROM documents),
      c AS (SELECT doc_id, w, (doc_id * 7 + w * 13) % 11 AS m,
                   200 + ((doc_id * 31 + w * 17) % 997) * 29 AS a,
                   (doc_id % 3) * 5 - 5 AS d
            FROM w),
      s AS (SELECT doc_id,
                   CASE WHEN m = 0 THEN 0 WHEN m = 1 THEN 32767
                        ELSE a + abs(d) END AS wpeak,
                   CASE WHEN m = 1 THEN 128 ELSE 0 END AS wclip,
                   CASE WHEN m >= 2 THEN 128 * CAST(d AS BIGINT)
                        ELSE 0 END AS wdc,
                   CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                        WHEN m = 1 THEN 128 * CAST(32767 AS BIGINT) * 32767
                        ELSE 128 * (CAST(d AS BIGINT) * d +
                                    CAST(a AS BIGINT) * a) END AS wsq,
                   CASE WHEN m = 0 THEN 1 ELSE 0 END AS wsilent
            FROM c)
      SELECT doc_id,
             CAST(1024 AS INTEGER) AS n_frames,
             CAST(8000 AS INTEGER) AS sample_rate,
             CAST(1 AS INTEGER) AS n_channels,
             CAST(max(wpeak) AS INTEGER) AS peak,
             CAST(sum(wclip) AS BIGINT) AS clip_count,
             CAST(sum(wdc) AS BIGINT) AS dc_sum,
             CAST(sum(wsq) AS BIGINT) AS sum_sq,
             CAST(sum(wsilent) AS INTEGER) AS silent_windows
      FROM s GROUP BY doc_id""")),

    // MP3 CONTAINER METADATA through the oracle gate (the audio side of
    // q143's MP4 walk): version cycles 1/2/2.5 (both bitrate table
    // groups, all nine sample rates), odd frames padded (the
    // table-driven frame-length walk is exact or the stream desyncs),
    // a Xing VBR block every 4th id behind the version/channel-shaped
    // side-info offset, an ID3v2 prefix every 6th skipped by declared
    // size, every 13th file truncated mid-frame — dropped whole.
    ("q213_mp3_meta", (s: SparkSession, d: String) =>
      graft.multimodal.AudioContainers.mp3MetaBinary(s,
        graft.multimodal.AudioContainers.syntheticMp3Corpus(
          s, Tables.documents(s, d)),
        "doc_id", "payload"),
    Some("""
      WITH f AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN '1' WHEN 1 THEN '2'
                 ELSE '2.5' END AS mpeg_version,
               CAST(CASE WHEN doc_id % 4 = 0
                    THEN greatest(1 + doc_id % 14, 2)
                    ELSE 1 + doc_id % 14 END AS INTEGER) AS bi,
               CAST((doc_id // 3) % 3 AS INTEGER) AS si,
               CAST(4 + doc_id % 5 AS INTEGER) AS nf
        FROM documents WHERE doc_id % 13 <> 0)
      SELECT doc_id, mpeg_version,
             CAST(3 AS INTEGER) AS layer,
             CAST(CASE WHEN mpeg_version = '1'
               THEN ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[bi]
               ELSE ([8,16,24,32,40,48,56,64,80,96,112,128,144,160])[bi]
               END AS INTEGER) AS bitrate_kbps,
             CAST(CASE mpeg_version
               WHEN '1' THEN ([44100,48000,32000])[si + 1]
               WHEN '2' THEN ([22050,24000,16000])[si + 1]
               ELSE ([11025,12000,8000])[si + 1]
               END AS INTEGER) AS sample_rate,
             CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS INTEGER)
               AS channels,
             nf AS n_frames,
             CAST(nf * (CASE WHEN mpeg_version = '1' THEN 1152 ELSE 576
                        END) * 1000
               // (CASE mpeg_version
                   WHEN '1' THEN ([44100,48000,32000])[si + 1]
                   WHEN '2' THEN ([22050,24000,16000])[si + 1]
                   ELSE ([11025,12000,8000])[si + 1] END)
               AS BIGINT) AS duration_ms,
             doc_id % 4 = 0 AS vbr
      FROM f""")),

    // FLAC STREAMINFO through the oracle gate: the 20/3/5/36-bit
    // big-endian pack read back field-exact; every 13th file truncated
    // inside STREAMINFO — dropped whole.
    ("q214_flac_meta", (s: SparkSession, d: String) =>
      graft.multimodal.AudioContainers.flacMetaBinary(s,
        graft.multimodal.AudioContainers.syntheticFlacCorpus(
          s, Tables.documents(s, d)),
        "doc_id", "payload"),
    Some("""
      SELECT doc_id,
             CAST(8000 + (doc_id % 12) * 4000 AS INTEGER) AS sample_rate,
             CAST(1 + doc_id % 8 AS INTEGER) AS channels,
             CAST(8 + doc_id % 25 AS INTEGER) AS bits_per_sample,
             CAST(1000 + (doc_id % 100000) * 37 AS BIGINT) AS total_samples,
             CAST((1000 + (doc_id % 100000) * 37) * 1000
               // (8000 + (doc_id % 12) * 4000) AS BIGINT) AS duration_ms
      FROM documents WHERE doc_id % 13 <> 0""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}
