package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The salting pattern for skewed joins (SURVEY §4.1 / AQE fallback):
  * when one join key carries most of the rows, a plain hash join lands
  * the hot key on one task. Salting splits the hot partition 16 ways —
  * fact side gets a content-derived salt, dimension side explodes all
  * 16 salt values — at the cost of a 16× dim replication (cheap when
  * the dim is small). Results must be identical to the plain join.
  */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val SALTS = 16

  private def saltedJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame = {
    // deterministic salt from row content (a random salt would do for
    // correctness but breaks retry determinism)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(SALTS)))
    val explodedDim = dim.withColumn("_salt",
      explode(lit((0 until SALTS).toArray)))
    salted.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  test("salted join of a 90%-hot-key fact equals the plain join") {
    val fact = spark.range(0, 100000)
      .select((when($"id" % 10 =!= 0, 1L).otherwise($"id" % 50)).as("k"),
        ($"id" * 3).as("payload"))
    val dim = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
    val salted = saltedJoin(fact, dim, "k")

    assert(salted.count() === plain.count())
    val diff = salted.groupBy($"k").agg(sum($"payload").as("s"))
      .except(plain.groupBy($"k").agg(sum($"payload").as("s")))
    assert(diff.isEmpty)
    // the hot key (k=1, ~90% of rows) really is spread over all salts
    val spread = fact.withColumn("_salt",
        pmod(xxhash64(fact.columns.map(col): _*), lit(SALTS)))
      .where($"k" === 1L).select($"_salt").distinct().count()
    assert(spread === SALTS)
  }
}
