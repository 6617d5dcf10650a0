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
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}
