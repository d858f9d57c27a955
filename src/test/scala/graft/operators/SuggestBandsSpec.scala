package graft.operators

import graft.SparkSpec
import graft.plans.GraftExtensions

/** [[Dedup.suggestBands]] — the step that ACTS on the recall audit: the
  * suggestion must meet the recall floor at the threshold (closed form AND
  * measured on the fixture corpus), must flag the 4×4 default where it
  * undershoots (t = 0.8), must prefer precision among floor-meeting
  * geometries, and must fail loud when no in-budget geometry reaches the
  * floor. */
class SuggestBandsSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("the 4x4 default undershoots a 0.9 floor at t=0.8 and is NOT suggested") {
    GraftExtensions.register(spark)
    // The flag: the shipped default's catch probability at the threshold.
    assert(Dedup.bandRecallAt(0.8, Dedup.Bands, Dedup.RowsPerBand) < 0.9)
    val c = Dedup.suggestBands(docs, threshold = 0.8, recallFloor = 0.9)
    assert((c.bands, c.rowsPerBand) !== ((Dedup.Bands, Dedup.RowsPerBand)))
    assert(c.thresholdRecall >= 0.9)
    // Hand-checked grid optimum: (4 bands × 3 rows) has the lowest
    // sub-threshold catch rate (S(0.4) ≈ 0.232) among floor-meeting
    // geometries within 16 hashes.
    assert((c.bands, c.rowsPerBand) === ((4, 3)))
    assert(c.fpRate < 0.25)
  }

  test("t=0.2 suggestion meets the floor in closed form AND measured on the fixture") {
    GraftExtensions.register(spark)
    val c = Dedup.suggestBands(docs, threshold = 0.2, recallFloor = 0.9)
    // Only r=1 can reach 0.9 at j=0.2 within 16 hashes; 11 bands is the
    // cheapest floor-meeting point (1 − 0.8^11 ≈ 0.914).
    assert((c.bands, c.rowsPerBand) === ((11, 1)))
    assert(c.thresholdRecall >= 0.9)
    // Expected recall over the measured pair mass can only beat the
    // worst-case (at-threshold) figure — S is increasing in j.
    assert(c.weightedRecall >= c.thresholdRecall)
    // SimilaritySpec-style measured floor: banded recall with the
    // SUGGESTED geometry against the complete PPJoin truth set.
    val truth = Dedup.prefixJaccard(docs, 0.2).count()
    val found = Dedup.nearDuplicates(docs, 0.2,
      bands = c.bands, rowsPerBand = c.rowsPerBand).count()
    assert(truth > 0L)
    assert(found.toDouble / truth >= 0.9,
      s"measured recall ${found.toDouble / truth} under the suggested geometry")
  }

  test("no in-budget geometry reaching the floor fails loud") {
    GraftExtensions.register(spark)
    intercept[IllegalArgumentException] {
      Dedup.suggestBands(docs, threshold = 0.2, recallFloor = 0.99,
        maxHashes = 4)
    }
  }
}
