package graft.queries

import graft.SparkTestBase

/** Removal-invariant contracts for t19's span dedup that the oracle's
  * hash compare can't articulate: the spliced boilerplate must always be
  * excised, islands must be maximal (never more than the two
  * splice-anchored islands unless a doc is fully covered), and removal
  * can never exceed the doc.
  */
class TextSpanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("t19: every doc excises at least the spliced boilerplate, islands are maximal") {
    val out = Registry.byName("t19_span_dedup").fn(spark, sf)
      .select("doc_id", "n_tokens", "n_spans", "n_removed", "kept_md5").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, spans, removed) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // both 18-token splices are repeated corpus-wide by construction
      assert(removed >= 36, s"doc ${r.getLong(0)} removed only $removed")
      assert(removed <= n)
      // islands anchor at the two splices; a fully-covered duplicate doc
      // merges to one island — nothing else can create a third island
      // (mid-content 16-grams from the synthetic vocab do not repeat
      // unless the whole doc does)
      assert(spans >= 1 && spans <= 2, s"doc ${r.getLong(0)} has $spans islands")
      // fully-covered docs must still emit a well-formed kept hash (md5 of "")
      if (removed == n) assert(r.getString(4) == "d41d8cd98f00b204e9800998ecf8427e")
    }
    // at least one exact-duplicate doc exists in the corpus (d1's raison
    // d'être), so the full-coverage path must be exercised
    assert(out.exists(r => r.getLong(3) == r.getLong(1)),
      "expected at least one fully-covered duplicate doc")
  }
}
