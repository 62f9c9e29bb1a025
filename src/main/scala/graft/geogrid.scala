package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared geo-grid cell-key expressions — the single source of the cell
  * math used by BOTH the grid bucket aggregations (geohash_grid /
  * geotile_grid / geohex_grid, aggs.scala) and the `geo_grid` query
  * (filter docs to one named cell, query.scala). One implementation
  * guarantees the query's cell membership and the aggregation's bucket
  * keys can never disagree. All three are pure codegen'd column math —
  * they evaluate in the scan filter / aggregate key with no UDF and no
  * shuffle of their own.
  */
private[graft] object GeoGrid {

  /** Classic geohash, EXACT integer math end to end: quantize lat/lon to
    * their bit budgets (lon gets the extra bit at odd total widths),
    * interleave with the shift-or spread trick (lon takes the MSB), then
    * map 5-bit groups through the base32 alphabet. Precision 1..12. */
  def geohashKey(point: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be 1..12, got: $precision")
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2 // lon gets the extra bit
    val latBits = totalBits / 2
    // quantize: cell index in [0, 2^bits), top edge clamped into the
    // last cell (lat=90 / lon=180 belong to the final cell, not a
    // phantom one past it)
    def quant(c: Column, lo: Double, span: Double, bits: Int): Column =
      least(floor((c - lit(lo)) / lit(span) * lit((1L << bits).toDouble))
        .cast("long"), lit((1L << bits) - 1))
    // spread bit i to bit 2i (64-bit masks — up to 32 source bits, so
    // the full precision-12 lon width of 30 bits fits)
    def spread(c: Column): Column = {
      val s0 = c.bitwiseOR(shiftleft(c, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x3333333333333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    val lonQ = quant(point.getField("lon"), -180.0, 360.0, lonBits)
    val latQ = quant(point.getField("lat"), -90.0, 180.0, latBits)
    // even total width: lon occupies the odd bit positions (MSB is
    // lon's top bit); odd width: lon occupies the even positions
    val interleaved =
      if (totalBits % 2 == 0) shiftleft(spread(lonQ), 1).bitwiseOR(spread(latQ))
      else spread(lonQ).bitwiseOR(shiftleft(spread(latQ), 1))
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    concat((0 until precision).map { k =>
      val shift = totalBits - 5 * (k + 1)
      lit(alphabet).substr(
        (shiftright(interleaved, shift).bitwiseAND(lit(31L)) + 1).cast("int"),
        lit(1))
    }: _*)
  }

  /** Web-mercator tile key "z/x/y" (ES's geotile format). Latitude clips
    * to ES's mercator bound ±85.05112878 (keeps the math far from the
    * pole singularity); pure double math. Precision 0..29. */
  def geotileKey(point: Column, z: Int): Column = {
    require(z >= 0 && z <= 29, s"geotile precision must be 0..29, got: $z")
    val tiles = lit((1L << z).toDouble)
    val maxMercLat = 85.05112878
    val latClip = greatest(least(point.getField("lat"), lit(maxMercLat)),
      lit(-maxMercLat))
    val latR = radians(latClip)
    val xRaw = floor((point.getField("lon") + lit(180.0)) / lit(360.0) * tiles)
    val yRaw = floor((lit(1.0) -
      log(tan(latR) + lit(1.0) / cos(latR)) / lit(math.Pi)) / lit(2.0) * tiles)
    val xT = least(greatest(xRaw, lit(0.0)), tiles - lit(1.0)).cast("long")
    val yT = least(greatest(yRaw, lit(0.0)), tiles - lit(1.0)).cast("long")
    concat_ws("/", lit(z.toString), xT, yT)
  }

  /** Hex cell key "z/q/r" — this engine's DECLARED H3 divergence: a flat
    * axial pointy-top hex lattice over the lon/lat plane, circumradius
    * 45/2^z degrees, cube rounding via floor(v+0.5) so an external SQL
    * checker reproduces it exactly. Precision 0..15. */
  def geohexKey(point: Column, z: Int): Column = {
    require(z >= 0 && z <= 15, s"geohex precision must be 0..15, got: $z")
    val hexS = 45.0 / math.pow(2.0, z) // exact: 45 / power of two
    val lonH = point.getField("lon")
    val latH = point.getField("lat")
    // pointy-top axial coords, then cube rounding (Red Blob Games'
    // textbook hex-rounding, re-expressed as columns)
    val qf = (sqrt(lit(3.0)) / lit(3.0) * lonH - latH / lit(3.0)) / lit(hexS)
    val rf = latH * lit(2.0) / lit(3.0) / lit(hexS)
    val rx0 = floor(qf + lit(0.5)) // bigint in Spark & oracle
    val rz0 = floor(rf + lit(0.5))
    val ry0 = floor(-qf - rf + lit(0.5))
    val dx = abs(rx0 - qf)
    val dy = abs(ry0 + qf + rf) // |ry0 - (-q-r)|
    val dz = abs(rz0 - rf)
    val fixQ = dx > dy && dx > dz
    val hq = when(fixQ, -ry0 - rz0).otherwise(rx0)
    val hr = when(!fixQ && dz >= dy, -rx0 - ry0).otherwise(rz0)
    concat_ws("/", lit(z.toString), hq, hr)
  }
}
