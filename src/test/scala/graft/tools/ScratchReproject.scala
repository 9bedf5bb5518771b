package graft.tools

import graft.sources.Reproject
import graft.sources.Reproject._

object ScratchReproject {
  def main(args: Array[String]): Unit = {
    println("parse32S: " + parseSrcCrs("+proj=utm +zone=32S +datum=WGS84"))
    println("inv(-120,30): " + utmToGeodetic(Utm(32, false), -120, 30))
    println("inv(120,-30): " + utmToGeodetic(Utm(32, false), 120, -30))
    println("cdtUtm: " + calculateDefaultTransform(Utm(32, false), 6, 4,
      -120, -30, 120, 30))
    println("merc(0,0): " + geodeticToMercator(0, 0))
    println("merc(0,45): " + geodeticToMercator(0, 45))
    println("merc(0,81): " + geodeticToMercator(0, 81))
    println("cdtGlobal: " + calculateDefaultTransform(Geodetic, 6, 4,
      -180, -90, 180, 90))
  }
}
