package graft

/** `ml_logreg_train` — in-engine full-batch GD. The oracle proves
  * bit-stability; this proves the training MOVES: 3 rounds must beat
  * the untrained model's log loss (n·ln 2) on the fixture.
  */
class MlTrainSpec extends SparkSpec {

  test("3 GD rounds reduce log loss below the untrained baseline") {
    val row = SparkEntry.queries("ml_logreg_train")(spark, sf("sf0.01"))
      .head()
    val n = row.getAs[Long]("n")
    val loss = row.getAs[Long]("loss_e6")
    assert(n > 0)
    val untrained = n * 693147L // e6-scaled ln 2 per sample at w = 0
    assert(loss < untrained,
      s"loss_e6 $loss did not improve on untrained $untrained")
    // weights moved off the origin
    assert(row.getAs[Long]("w1_e6") != 0L ||
      row.getAs[Long]("w2_e6") != 0L || row.getAs[Long]("w3_e6") != 0L)
  }
}
