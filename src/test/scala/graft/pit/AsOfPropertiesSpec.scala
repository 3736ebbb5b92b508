package graft.pit

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property suite for the as-of join — strictly stronger than the
  * example-based tests: randomized entity/feature sets (sizes, key
  * cardinalities, ttl, duplicate timestamps all generated) checked against
  * engine-level invariants:
  *
  *   1. zero temporal leakage — a picked feature never postdates its probe;
  *   2. ttl expiry — a picked feature is never older than probe - ttl;
  *   3. left-outer cardinality — exactly one output row per entity row;
  *   4. completeness — if ANY in-window candidate exists, the join must
  *      pick one (never a spurious null);
  *   5. physical-strategy agreement — salted ≡ unsalted ≡ range-join.
  */
class AsOfPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long): Timestamp = new Timestamp(1618185600000L + min * 60000L)

  private val genScenario: Gen[(List[Ent], List[Feat], Long, Int)] = for {
    nKeys <- Gen.choose(1, 6)
    nEnt <- Gen.choose(1, 60)
    nFeat <- Gen.choose(0, 90) // nFeat = 0: the all-null edge case
    ttlMin <- Gen.choose(1L, 300L)
    salt <- Gen.oneOf(1, 4)
    ents <- Gen.listOfN(nEnt, for {
      k <- Gen.choose(0, nKeys - 1); ts <- Gen.choose(0L, 600L)
    } yield (k, ts))
    feats <- Gen.listOfN(nFeat, for {
      k <- Gen.choose(0, nKeys - 1); ts <- Gen.choose(0L, 600L)
      created <- Gen.choose(0L, 50L); v <- Gen.choose(0, 1000000)
    } yield (k, ts, created, v))
  } yield (
    ents.zipWithIndex.map { case ((k, ts), i) => Ent(i.toLong, s"k$k", t(ts)) },
    // per-row unique created millis: no two candidates ever tie on
    // (fts, created), so the expected pick is fully deterministic
    feats.zipWithIndex.map { case ((k, ts, c, v), i) =>
      Feat(s"k$k", t(ts), new Timestamp(t(c).getTime + i), v.toDouble)
    },
    ttlMin * 60L,
    salt)

  test("as-of invariants hold on generated scenarios (leakage, ttl, cardinality, completeness, strategy agreement)") {
    val prop = Prop.forAll(genScenario) { case (ents, feats, ttlSec, salt) =>
      val spec = AsOfSpec(Seq("key"), "ets", "fts", Some("created"), Some(ttlSec), Seq("v"))
      val out = AsOfJoin.windowed(ents.toDF(), feats.toDF(), spec,
        saltBuckets = salt, hotKeys = if (salt > 1) Seq("k0") else Nil)
        .select("eid", "key", "ets", "v").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getTimestamp(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

      val byKey = feats.groupBy(_.key)
      val cardinality = out.size == ents.size
      val perRow = ents.forall { e =>
        val (_, _, got) = out(e.eid)
        val cands = byKey.getOrElse(e.key, Nil).filter(f =>
          f.fts.getTime <= e.ets.getTime &&
            f.fts.getTime >= e.ets.getTime - ttlSec * 1000L)
        got match {
          case None => cands.isEmpty // completeness: no spurious null
          case Some(v) =>
            // the pick must be a real in-window candidate (no leakage, no
            // expired row) and THE max by (fts, created)
            val best = cands.maxBy(f => (f.fts.getTime, f.created.getTime))
            cands.exists(_.v == v) && v == best.v
        }
      }
      // strategy agreement: range join picks identical values
      val range = AsOfJoin.rangeJoin(ents.toDF(), feats.toDF(), spec, rowId = "eid")
        .select("eid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val agree = ents.forall(e => out(e.eid)._3 == range(e.eid))

      cardinality && perRow && agree
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withMaxSize(60), prop)
    assert(result.passed, s"property falsified: ${result.status}")
  }
}
