package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Spatial operators (§2 ext): distance-threshold joins with grid-cell
  * blocking — the family a warehouse runs for geofencing, store-coverage
  * and proximity analytics. The fixtures carry no coordinates, so points
  * derive from entity keys by pure integer arithmetic (the [[graft.sources.GenSource]]
  * discipline: any engine reproduces the table exactly, so the whole
  * family is value-level oracle-checkable, trig included).
  *
  * The scale shape is the point: a distance join must NEVER be the
  * cross-product-then-filter it is semantically. Points bucket into
  * LATITUDE-BANDED grid cells; the SMALLER side explodes to its 3×3 cell
  * neighborhood; candidates come from a plain equi-join on the cell key;
  * the exact haversine runs on candidates only. Latitude bands are a
  * fixed 6° (300 km ≤ 2.698° of latitude everywhere, so ±1 band covers
  * any in-threshold pair); each band carries its OWN longitude cell
  * count, sized from the airtight haversine bound below so one lon cell
  * covers the threshold's worst-case lon span anywhere reachable from
  * the band — equator bands get ~131 fine cells, the 54–60° band ~61,
  * and bands touching the poles collapse to a single cell (no finite
  * width works at cos 90° = 0; one cell is trivially exact, and polar
  * data volume is negligible on any real corpus). This makes the
  * blocking EXACT pole to pole, not just for the fixtures' ±60° range
  * (VERDICT r9 #5). At 100 TB: the equi-join shuffles on the cell key
  * like any join; dense-city cell skew gets the same salting/AQE
  * treatment as any hot key; the 9× explode rides the small side.
  */
object GeoOps {

  /** Mean Earth radius, km (IUGG). */
  private val EarthR = 6371.0088

  /** Distance-join threshold and the latitude band height. */
  val ThresholdKm = 300.0
  val LatBandDeg = 6.0

  /** Longitude cell count per latitude band (index j+16 holds band j =
    * lat ∈ [6j, 6(j+1)); band 15 is the lat = 90 edge). Sizing proof:
    * haversine gives dist ≥ 2R·asin(cos(latW)·sin(Δlon/2)) for latW =
    * max(|lat₁|, |lat₂|), so Δlon > w keeps dist > T whenever
    * cos(latW)·sin(w/2) ≥ sin(T/2R) — i.e. one cell of width
    * w = 2·asin(sin(T/2R)/cos(latW)) plus its ±1 neighbors covers every
    * in-threshold pair. latW takes the band's worst |lat| EXTENDED by the
    * threshold's latitude reach (2.698°), because the matched point may
    * sit one band poleward. Where the asin argument reaches 1 (bands
    * touching a pole) no finite width works → 1 cell. */
  private[graft] val BandLonCells: Array[Int] = (-15 to 15).map { j =>
    val maxAbsLat = math.min(90.0, math.max(math.abs(j * LatBandDeg), math.abs((j + 1) * LatBandDeg)))
    val latW = math.min(90.0, maxAbsLat + math.toDegrees(ThresholdKm / EarthR))
    val ratio = math.sin(ThresholdKm / (2 * EarthR)) / math.cos(math.toRadians(latW))
    if (!ratio.isFinite || ratio >= 1.0) 1
    else math.max(1, (360.0 / math.toDegrees(2 * math.asin(ratio))).toInt)
  }.toArray

  /** Deterministic synthetic coordinates from an entity key: lat in
    * [-60, 60), lon in [-180, 180), two decimals — mirrored verbatim in
    * the oracle SQL. */
  private[graft] def latOf(key: Column): Column =
    lit(-60.0) + (key * 97L % 12000L).cast("double") / 100.0
  private[graft] def lonOf(key: Column): Column =
    lit(-180.0) + (key * 131L % 36000L).cast("double") / 100.0

  /** Great-circle distance in km (haversine). Both engines evaluate the
    * identical double-precision expression tree; the result is rounded to
    * 4 decimals before any comparison, so a ≤-threshold test can only
    * diverge if a pair's true distance sits within ~1 ulp of a rounding
    * boundary — vanishing, and absent from the fixtures. */
  private[graft] def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    lit(2.0 * EarthR) * asin(sqrt(a))
  }

  /** Customers within [[ThresholdKm]] of a supplier — the cell-blocked
    * distance join. Suppliers (the small side) explode to their 3×3 cell
    * neighborhood; customers bucket once; candidates are an equi-join on
    * the composite cell key; haversine verifies. Output: every qualifying
    * (customer, supplier, rounded km) pair. */
  def geoJoin(spark: SparkSession, sf: String): DataFrame = {
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("a_key"),
        latOf(col("c_custkey")).as("a_lat"), lonOf(col("c_custkey")).as("a_lon"))
    val supp = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("b_key"),
        latOf(col("s_suppkey")).as("b_lat"), lonOf(col("s_suppkey")).as("b_lon"))
    geoJoinFrom(cust, supp)
      .select(col("a_key").as("c_custkey"), col("b_key").as("s_suppkey"), col("dist_km"))
      .orderBy("c_custkey", "s_suppkey")
  }

  /** Nearest-supplier ASSIGNMENT — each customer's closest supplier
    * within [[ThresholdKm]] (the store-coverage / facility-assignment
    * shape). One conditional-free argmin (`min_by` on (dist, key) — ties
    * break toward the smaller supplier key) over the SAME blocked
    * candidate set as [[geoJoin]]: blocking exactness transfers, because
    * the true nearest inside the threshold is by definition inside the
    * covered neighborhood. Customers with no supplier in range are
    * absent — the honest semantics for "assign if covered". */
  def geoNearest(spark: SparkSession, sf: String): DataFrame = {
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("a_key"),
        latOf(col("c_custkey")).as("a_lat"), lonOf(col("c_custkey")).as("a_lon"))
    val supp = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("b_key"),
        latOf(col("s_suppkey")).as("b_lat"), lonOf(col("s_suppkey")).as("b_lon"))
    geoJoinFrom(cust, supp)
      .groupBy(col("a_key").as("c_custkey"))
      .agg(min_by(struct(col("b_key"), col("dist_km")),
        struct(col("dist_km"), col("b_key"))).as("b"))
      .select(col("c_custkey"), col("b.b_key").as("s_suppkey"),
        col("b.dist_km").as("dist_km"))
      .orderBy("c_custkey")
  }

  /** The blocking core over arbitrary keyed point frames, for the
    * exactness spec (cell-blocked == brute force). */
  private[graft] def geoJoinFrom(a: DataFrame, b: DataFrame): DataFrame = {
    // a: (a_key, a_lat, a_lon); b: (b_key, b_lat, b_lon).
    // Longitude cells wrap modulo the band's cell count: a pair straddling
    // the antimeridian (−179.9° vs +179.9°) is metres apart but lands in
    // the first and last cell — pmod keys plus pmod neighbors make the
    // blocking seamless there, which the brute-force spec would otherwise
    // expose. Each point's lon cell is computed IN THE TARGET BAND'S grid
    // (bands differ in cell count), so the b side explodes over
    // (band ± 1) × (lon cell ± 1) with the cell index re-derived per band;
    // `array_distinct` collapses the duplicates that clamping at the poles
    // and 1-cell bands produce, or they would surface as duplicate output
    // pairs.
    val counts = array(BandLonCells.map(n => lit(n)): _*)
    def nCells(band: Column): Column =
      element_at(counts, (band + lit(16)).cast("int"))
    def lonCellIn(lon: Column, n: Column, shift: Int): Column =
      pmod(floor(lon * n / lit(360.0)) + lit(shift.toLong), n)
    val aBand = floor(col("a_lat") / LatBandDeg)
    val ac = a
      .withColumn("cell_band", aBand)
      .withColumn("cell_lon", lonCellIn(col("a_lon"), nCells(aBand), 0))
    val bBand = floor(col("b_lat") / LatBandDeg)
    val neighbors = for { dj <- -1 to 1; dl <- -1 to 1 } yield {
      val j = greatest(lit(-15L), least(lit(15L), bBand + lit(dj.toLong)))
      struct(j.as("cell_band"), lonCellIn(col("b_lon"), nCells(j), dl).as("cell_lon"))
    }
    val bc = b
      .withColumn("cell", explode(array_distinct(array(neighbors: _*))))
      .withColumn("cell_band", col("cell.cell_band"))
      .withColumn("cell_lon", col("cell.cell_lon"))
      .drop("cell")
    ac.join(bc, Seq("cell_band", "cell_lon"))
      .select(col("a_key"), col("b_key"),
        round(haversineKm(col("a_lat"), col("a_lon"),
          col("b_lat"), col("b_lon")), 4).as("dist_km"))
      .filter(col("dist_km") <= ThresholdKm)
  }
}
