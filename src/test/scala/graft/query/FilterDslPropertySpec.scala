package graft.query

import java.sql.Timestamp

import graft.{Fixtures, SparkSpec}
import graft.schema.{Provenance, Study}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property: for random filter trees and a random corpus, the
  * Catalyst compilation (Filter.toColumn) selects exactly the records a
  * plain-Scala reference evaluator selects. This pins the translation
  * layer the way the reference's wire-payload tests pin its DSL
  * (SURVEY.md §5 test plan).
  */
class FilterDslPropertySpec extends SparkSpec {

  private val statuses = Seq("created", "updated", "deleted")
  private val urls = Seq("http://a", "http://b", "http://c")

  private def mkStudy(i: Int, status: String, url: String, direct: Boolean,
      updatedSecs: Int): Study =
    Fixtures.minimal.copy(
      _aggregator_identifier = f"p_$i%03d",
      _direct_base_url = url,
      _metadata = Fixtures.meta(status = status,
        updated = f"2021-01-01T00:00:$updatedSecs%02dZ"),
      _provenance = Seq(Fixtures.baseProvenance.copy(
        base_url = url, direct = direct)))

  private val genStudy: Gen[Int => Study] = for {
    st <- Gen.oneOf(statuses)
    url <- Gen.oneOf(urls)
    direct <- Gen.oneOf(true, false)
    secs <- Gen.choose(0, 59)
  } yield (i: Int) => mkStudy(i, st, url, direct, secs)

  private val genLeaf: Gen[Filter] = Gen.oneOf(
    Gen.oneOf(statuses).map(s => Eq("_metadata.status", s)),
    Gen.oneOf(statuses).map(s => Ne("_metadata.status", s)),
    Gen.someOf(urls).map(us => In("_direct_base_url", us.toSeq)),
    Gen.choose(0, 59).map(s =>
      Lt("_metadata.updated", Fixtures.ts(f"2021-01-01T00:00:$s%02dZ"))),
    Gen.choose(0, 59).map(s =>
      Gte("_metadata.updated", Fixtures.ts(f"2021-01-01T00:00:$s%02dZ"))),
    Gen.oneOf(urls).map(u =>
      ElemMatch("_provenance", ElemEq("base_url", u), ElemEq("direct", true))),
    Gen.const(ElemMatch("_provenance", ElemEq("direct", true),
      ElemExists("base_url", exists = true))))

  private val genFilter: Gen[Filter] = for {
    n <- Gen.choose(1, 3)
    leaves <- Gen.listOfN(n, genLeaf)
  } yield if (leaves.size == 1) leaves.head else And(leaves: _*)

  /** Plain-Scala semantics — the spec the Column compilation must match. */
  private def refEval(f: Filter, st: Study): Boolean = f match {
    case Eq("_metadata.status", v)  => st._metadata.status == v
    case Ne("_metadata.status", v)  => st._metadata.status != v
    case In("_direct_base_url", vs) => vs.contains(st._direct_base_url)
    case Lt("_metadata.updated", v: Timestamp) =>
      st._metadata.updated.before(v)
    case Gte("_metadata.updated", v: Timestamp) =>
      !st._metadata.updated.before(v)
    case And(fs @ _*) => fs.forall(refEval(_, st))
    case ElemMatch("_provenance", preds @ _*) =>
      st._provenance.exists(p => preds.forall {
        case ElemEq("base_url", v)        => p.base_url == v
        case ElemEq("direct", v: Boolean) => p.direct == v
        case ElemExists("base_url", b)    => (p.base_url != null) == b
        case other => fail(s"unhandled elem pred $other")
      })
    case other => fail(s"unhandled filter $other")
  }

  test("Catalyst compilation matches reference semantics on random corpora") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(
      Gen.listOfN(12, genStudy), genFilter) { (mks, filter) =>
      val corpus = mks.zipWithIndex.map { case (mk, i) => mk(i) }
      val df = s.createDataset(corpus).toDF()
      val sparkIds = df.filter(filter.toColumn)
        .select("_aggregator_identifier")
        .collect().map(_.getString(0)).toSet
      val refIds = corpus.filter(refEval(filter, _))
        .map(_._aggregator_identifier).toSet
      sparkIds == refIds
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
