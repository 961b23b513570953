package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins on hot keys (the manual complement to AQE
  * skew-join splitting, for engines/pipelines where AQE cannot see the skew
  * — e.g. a first-stage shuffle straight out of a scan).
  *
  * The build (right) side is replicated `saltBuckets` times; the probe
  * (left) side gets a deterministic salt in [0, saltBuckets) derived from a
  * hash of the whole row, so a hot key's rows spread across `saltBuckets`
  * reducers instead of one. Result set is identical to the unsalted join
  * (verified in tests).
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.filterNot(_ == key).toSeq

    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))

    saltedLeft.join(replicatedRight,
        Seq(key, "__salt"), joinType)
      .select((leftCols ++ rightCols).map(col): _*)
  }
}
