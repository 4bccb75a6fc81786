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
  * fixed-size grid cells; the SMALLER side explodes to its 3×3 cell
  * neighborhood; candidates come from a plain equi-join on the cell key;
  * the exact haversine runs on candidates only. Cell size is chosen so
  * the neighborhood provably covers the threshold at the worst latitude
  * in range (±60°: 300 km ≤ 2.7° lat, ≤ 5.4° lon at cos 60° = 0.5 —
  * both under the 6° cell), which makes the blocking EXACT, not
  * approximate. At 100 TB: the equi-join shuffles on the cell key like
  * any join; dense-city cell skew gets the same salting/AQE treatment
  * as any hot key; the 9× explode rides the small side.
  */
object GeoOps {

  /** Mean Earth radius, km (IUGG). */
  private val EarthR = 6371.0088

  /** Distance-join threshold and the provably-covering cell size. */
  val ThresholdKm = 300.0
  val CellDeg = 6.0

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
    // Longitude cells wrap modulo 360: a pair straddling the antimeridian
    // (−179.9° vs +179.9°) is metres apart but lands in the first and last
    // cell — pmod keys plus pmod neighbors make the blocking seamless
    // there, which the brute-force spec would otherwise expose.
    val lonCells = math.round(360.0 / CellDeg)
    val ac = a
      .withColumn("cell_lat", floor(col("a_lat") / CellDeg))
      .withColumn("cell_lon", pmod(floor(col("a_lon") / CellDeg), lit(lonCells)))
    val bc = b
      .withColumn("cell_lat0", floor(col("b_lat") / CellDeg))
      .withColumn("cell_lon0", floor(col("b_lon") / CellDeg))
      .withColumn("cell_lat",
        explode(array((-1 to 1).map(d => col("cell_lat0") + d): _*)))
      .withColumn("cell_lon",
        explode(array((-1 to 1).map(d => pmod(col("cell_lon0") + d, lit(lonCells))): _*)))
    ac.join(bc, Seq("cell_lat", "cell_lon"))
      .select(col("a_key"), col("b_key"),
        round(haversineKm(col("a_lat"), col("a_lon"),
          col("b_lat"), col("b_lon")), 4).as("dist_km"))
      .filter(col("dist_km") <= ThresholdKm)
  }
}
