package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Geospatial functions replacing the reference's MongoDB 2dsphere
  * queries (`$near`, `$geoWithin` — /root/reference/readme.md:386-398,
  * 500-522).
  *
  * Design: haversine is a *composition of built-in expressions* (sin /
  * cos / asin / radians), so it stays inside whole-stage codegen — no
  * UDF in the hot path. Point-in-polygon ships in two forms:
  * a general ray-casting UDF for arbitrary polygons, and a
  * range-predicate rewrite for axis-aligned boxes (the only polygons
  * the reference actually uses, readme.md:508-514) — the box form is a
  * plain conjunction of comparisons, so Parquet row-group pruning and
  * predicate pushdown apply. At 100 TB that difference is the whole
  * game: the box form prunes at the scan; the UDF form scans everything.
  */
object GeoFunctions {

  /** Mean Earth radius in meters (WGS84 mean, matches MongoDB's
    * spherical model closely enough for the reference's box tolerances —
    * SURVEY.md §7.3). */
  val EarthRadiusMeters: Double = 6371008.8

  /** Miles → meters, the reference's `$maxDistance` unit arithmetic
    * (readme.md:393: `10*1609.344`). */
  val MetersPerMile: Double = 1609.344

  def milesToMeters(miles: Column): Column = miles * lit(MetersPerMile)

  /** Great-circle distance in meters between two (lat, lon) points, in
    * degrees. Pure built-in expression tree → codegen'd, null-safe,
    * usable in SQL and in filters.
    *
    * haversine: 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** `$near` equivalent (readme.md:392-398): distance column + filter +
    * nearest-first sort, as a reusable transform. MongoDB's `$near`
    * returns ascending-distance order bounded by `$maxDistance`.
    */
  def nearest(df: org.apache.spark.sql.DataFrame,
              lat: Column, lon: Column,
              centerLat: Double, centerLon: Double,
              maxDistanceMeters: Double): org.apache.spark.sql.DataFrame =
    df.withColumn("dist_m",
        haversineMeters(lit(centerLat), lit(centerLon), lat, lon))
      .filter(col("dist_m") <= lit(maxDistanceMeters))
      .orderBy(col("dist_m"))

  /** Axis-aligned box containment — the pushdown-friendly `$geoWithin`
    * rewrite for the reference's wa_box/id_box (readme.md:508-514).
    * A plain range conjunction: Parquet min/max stats prune row groups.
    */
  def inBox(lon: Column, lat: Column,
            minLon: Double, minLat: Double,
            maxLon: Double, maxLat: Double): Column =
    lon >= lit(minLon) && lon <= lit(maxLon) &&
      lat >= lit(minLat) && lat <= lit(maxLat)

  /** General point-in-polygon via ray casting (even-odd rule) over a
    * single ring given as interleaved [lon0,lat0, lon1,lat1, ...].
    * Matches MongoDB `$geoWithin` `$geometry` Polygon semantics for
    * simple rings (readme.md:508-517). Points exactly on an edge count
    * as inside on the lower/left edge (standard even-odd asymmetry) —
    * the reference's conservation check (readme.md:522) splits at a
    * longitude line, which we pin down in tests.
    *
    * UDF (not codegen) — acceptable: geo predicates are post-scan
    * residuals; the scan-pruning variant is [[inBox]].
    */
  def pointInPolygon(ring: Array[(Double, Double)]): UserDefinedFunction =
    udf { (lon: Double, lat: Double) =>
      var inside = false
      var j = ring.length - 1
      var i = 0
      while (i < ring.length) {
        val (xi, yi) = ring(i)
        val (xj, yj) = ring(j)
        val intersects = ((yi > lat) != (yj > lat)) &&
          (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)
        if (intersects) inside = !inside
        j = i
        i += 1
      }
      inside
    }

  /** Native-Expression PIP (graft.plans.PointInPolygonExpr): codegen'd,
    * optimizer-visible — with GraftExtensions installed, an
    * axis-aligned ring rewrites to scan-pushable range predicates
    * (PipExpressionSpec pins the PushedFilters). Prefer this over the
    * UDF form; the UDF stays as the API-parity/fallback variant. */
  def pointInPolygonNative(lon: Column, lat: Column,
                           ring: Array[(Double, Double)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.PointInPolygonExpr(
        ColumnBridge.expression(lon.cast("double")),
        ColumnBridge.expression(lat.cast("double")),
        ring.map(_._1).toIndexedSeq, ring.map(_._2).toIndexedSeq))
  }
}
