package graft.geo

import java.lang.Math._

/** Great-circle geometry per the declared spec (SURVEY §5.6), fixing the
  * ambiguity of the reference's un-vendored `turf-crosstrack` dependency
  * (`/root/reference/package.json:26`, used at `addresses.js:76`):
  * cross-track distance with endpoint clamping on a sphere of radius
  * R = 6 371 008.8 m. The DuckDB oracle implements the exact same branch
  * structure in SQL; last-ulp libm differences are absorbed by the
  * integer-meter rounding plus fixture margins (GenGeoFixtures).
  */
object Geo {
  val R = 6371008.8

  private def clamp(x: Double): Double = max(-1.0, min(1.0, x))

  /** Haversine central angle (radians) between two lon/lat points. */
  def angular(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = toRadians(lat1); val p2 = toRadians(lat2)
    val dp = toRadians(lat2 - lat1); val dl = toRadians(lon2 - lon1)
    val h = sin(dp / 2) * sin(dp / 2) + cos(p1) * cos(p2) * sin(dl / 2) * sin(dl / 2)
    2 * asin(sqrt(min(1.0, h)))
  }

  /** Great-circle distance in meters. */
  def haversineM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    R * angular(lon1, lat1, lon2, lat2)

  /** Initial bearing (radians) from point 1 to point 2. */
  def bearing(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = toRadians(lat1); val p2 = toRadians(lat2)
    val dl = toRadians(lon2 - lon1)
    atan2(sin(dl) * cos(p2), cos(p1) * sin(p2) - sin(p1) * cos(p2) * cos(dl))
  }

  /** Cross-track distance (meters) from point P to segment A–B with
    * endpoint clamping: if P's along-track projection falls outside [A,B],
    * the distance is to the nearer endpoint.
    */
  def crosstrackM(px: Double, py: Double,
                  x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val d13 = angular(x1, y1, px, py)
    val d12 = angular(x1, y1, x2, y2)
    if (d12 == 0.0) return R * d13
    val t13 = bearing(x1, y1, px, py)
    val t12 = bearing(x1, y1, x2, y2)
    val dxt = asin(clamp(sin(d13) * sin(t13 - t12)))
    val dat = acos(clamp(cos(d13) / cos(dxt)))
    if (cos(t13 - t12) < 0 || dat > d12)
      R * min(d13, angular(x2, y2, px, py))
    else
      R * abs(dxt)
  }

  /** Reference rounding: `Math.round(km*1000)` = floor(x+0.5)
    * (`addresses.js:76`; SURVEY §5.3 D4). */
  def roundM(m: Double): Long = floor(m + 0.5).toLong
}
