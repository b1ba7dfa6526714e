package graft.model

import java.sql.Timestamp

/** Canonical long-format observation (SURVEY.md §1.4; mirrors the
  * materialized GEE `getRegion` table, `calculations/utils.py:9-16`).
  */
final case class Observation(
    id: String,
    longitude: Double,
    latitude: Double,
    time: Timestamp,
    value: Double)

/** Per-pixel PolyTrend output row
  * (`calculations/polytrend.py:291-297`).
  */
final case class PTRow(
    longitude: Double,
    latitude: Double,
    trend_type: Int,
    slope: Double,
    direction: Int,
    significance: Int,
    degree: Int)

/** One (time-bucket, value) sample inside a per-key series. */
final case class TV(t: Double, v: Double)
