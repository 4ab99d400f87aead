package graft

import java.sql.Timestamp

/** Port of the reference's TestOHLCVBar (test_core.py:67-131) — constraint
  * validation on the FIXTURES.md A1/A3 fixtures.
  */
class ModelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  val sampleBar: OhlcvBar = OhlcvBar("AAPL", ts("2024-06-15 10:30:00"),
    open = 150.0, high = 155.0, low = 149.0, close = 153.0,
    volume = 1000000L, asset_class = AssetClass.Equity)

  private def lakeCheck(b: OhlcvBar): Boolean = {
    import spark.implicits._
    // the Column-level predicate must agree with the driver-side one
    spark.createDataset(Seq(b)).toDF().filter(model.barValid).count() == 1
  }

  test("valid bar passes both validation layers") {
    assert(lakeCheck(sampleBar))
  }

  test("high < low rejected") {
    val b = sampleBar.copy(open = 100, high = 90, low = 95, close = 92)
    assert(!lakeCheck(b))
  }

  test("open outside [low, high] rejected") {
    val b = sampleBar.copy(open = 200, high = 155, low = 149, close = 150)
    assert(!lakeCheck(b))
  }

  test("close outside [low, high] rejected") {
    val b = sampleBar.copy(open = 150, high = 155, low = 149, close = 200)
    assert(!lakeCheck(b))
  }

  test("negative volume rejected") {
    assert(!lakeCheck(sampleBar.copy(volume = -1)))
  }

  test("null symbol or timestamp rejected: a null date key would hide the row from pruned reads") {
    assert(!lakeCheck(sampleBar.copy(symbol = null)))
    assert(!lakeCheck(sampleBar.copy(timestamp = null)))
  }

  test("all five asset classes accepted") {
    AssetClass.all.foreach { ac =>
      assert(lakeCheck(sampleBar.copy(asset_class = ac)), ac)
    }
  }

  test("unknown asset class rejected") {
    assert(!lakeCheck(sampleBar.copy(asset_class = "bond")))
  }

  test("date partition key is UTC yyyy-MM-dd") {
    assert(model.dateKeyOf(new Timestamp(1718447400000L)) == "2024-06-15")
  }
}
