package graft.examples

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DEBS 2015 taxi-challenge domain functions (reference
  * `examples/taxi/Taxi.hs:83-169`): the lat/long → grid-cell arithmetic,
  * range checks, and exact top-k-by-frequency used by Q1 "frequent routes"
  * and Q2 "profitable cells". All pure `Column` expressions.
  *
  * The grid: coordinate (41.474937, −74.913585) is the CENTRE of cell
  * (1,1); Q1 cells are 0.004491556° × 0.005986°, Q2 cells half that;
  * valid ranges [1,300]² (Q1) / [1,600]² (Q2) (`Taxi.hs:83-118`).
  */
object Taxi {

  val CellLat = 0.004491556
  val CellLon = 0.005986
  val Centre11Lat = 41.474937
  val Centre11Lon = -74.913585
  /** Grid origin = top-left corner of cell (1,1) (`cell11Origin`,
    * `Taxi.hs:94-96`). */
  val OriginLat: Double = Centre11Lat + CellLat / 2
  val OriginLon: Double = Centre11Lon - CellLon / 2

  /** `toCell` (`Taxi.hs:102-105`): cellLat = ⌊(originLat − lat)/side⌋ + 1,
    * cellLon = ⌊(lon − originLon)/side⌋ + 1. */
  def cellLat(lat: Column, sideLat: Double): Column =
    (floor((lit(OriginLat) - lat) / sideLat) + 1).cast("int")
  def cellLon(lon: Column, sideLon: Double): Column =
    (floor((lon - lit(OriginLon)) / sideLon) + 1).cast("int")

  def cellLatQ1(lat: Column): Column = cellLat(lat, CellLat)
  def cellLonQ1(lon: Column): Column = cellLon(lon, CellLon)
  def cellLatQ2(lat: Column): Column = cellLat(lat, CellLat / 2)
  def cellLonQ2(lon: Column): Column = cellLon(lon, CellLon / 2)

  /** `inRange` (`Taxi.hs:98-100`): cell within [1,max]². */
  def inRange(clat: Column, clon: Column, max: Int): Column =
    clat >= 1 && clat <= max && clon >= 1 && clon <= max

  def inRangeQ1(clat: Column, clon: Column): Column = inRange(clat, clon, 300)
  def inRangeQ2(clat: Column, clon: Column): Column = inRange(clat, clon, 600)
}
