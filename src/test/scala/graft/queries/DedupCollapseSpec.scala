package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions._

/** The identical-content collapse in the SimHash / embedding dedup family
  * must be invisible in the RESULTS: banding + scoring over distinct
  * fingerprints with member expansion has to emit exactly the pairs and
  * clusters the direct per-doc plan emits. These specs run the registry
  * queries on a corpus with REAL exact duplicates (the sf0.001 tables
  * replicated 3x via ScaleUp, so every content appears in 3 key-shifted
  * copies) and compare against independent direct computations.
  */
class DedupCollapseSpec extends SparkTestBase {

  private lazy val dupDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_dupcorpus_").toString
    graft.ScaleUp.scale(spark, "/root/testdata/sf0.001", out, 3)
    out
  }

  private def run(name: String) = Registry.byName(name).fn(spark, dupDir)

  test("the replicated corpus actually contains 3-fold exact duplicates") {
    val copies = run("d1_exact_dedup").agg(max(col("n_copies"))).head.getLong(0)
    assert(copies >= 3, s"expected 3-fold duplicates, max n_copies=$copies")
  }

  test("d4 collapsed pair list == brute-force hamming<=3 pairs") {
    // chunk banding is a LOSSLESS prefilter for hamming<=3 (pigeonhole:
    // <=3 flipped bits leave one 15-bit chunk intact), so the all-pairs
    // join IS the semantic reference for the whole banded+collapsed plan
    val sim = Tables.t(spark, dupDir, "documents")
      .select(col("doc_id"), call_function("graft_simhash60", col("text")).as("simhash"))
    val brute = sim.alias("a").crossJoin(sim.alias("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
    assert(run("d4_simhash_pairs").exceptAll(brute).isEmpty &&
      brute.exceptAll(run("d4_simhash_pairs")).isEmpty)
  }

  test("d6 collapsed pair list == direct per-vector banded plan") {
    // embedding LSH banding is LOSSY (a true near-pair may share no band),
    // so the reference is the direct plan: band every vector, join, score
    val e = Tables.t(spark, dupDir, "embeddings")
      .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
    val bands = e.select(col("vec_id"),
      explode(call_function("graft_lsh_bands", col("q"), lit(4), lit(4), lit(64))).as("band_key"))
    val direct = bands.select(col("band_key"), col("vec_id").as("vec_a"))
      .join(bands.select(col("band_key"), col("vec_id").as("vec_b")), Seq("band_key"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
      .join(e.select(col("vec_id").as("vec_a"), col("q").as("q_a"), col("nrm").as("n_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("q").as("q_b"), col("nrm").as("n_b")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dotQN(col("q_a"), col("q_b")).cast("double") / (col("n_a") * col("n_b"))).as("cosine"))
      .filter(col("cosine") >= 0.4)
    assert(run("d6_embed_neardup").exceptAll(direct).isEmpty &&
      direct.exceptAll(run("d6_embed_neardup")).isEmpty)
  }

  test("d2 collapsed pair list == direct per-doc banded plan") {
    // MinHash banding is lossy like the embedding LSH, so the reference is
    // the direct plan: band every doc, join on band keys, verify Jaccard
    val sh = Tables.t(spark, dupDir, "documents")
      .select(col("doc_id"), call_function("graft_shingle_hashes", col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val bands = sh.select(col("doc_id"),
      explode(call_function("graft_minhash_bands",
        col("sh"), lit(12), lit(4), lit(3))).as("band_key"))
    val jac = (a: String, b: String) => {
      val inter = size(array_intersect(col(a), col(b)))
      inter.cast("double") / (size(col(a)) + size(col(b)) - inter).cast("double")
    }
    val direct = bands.select(col("band_key"), col("doc_id").as("doc_a"))
      .join(bands.select(col("band_key"), col("doc_id").as("doc_b")), Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jac("sh_a", "sh_b").as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    assert(run("d2_minhash_lsh").exceptAll(direct).isEmpty &&
      direct.exceptAll(run("d2_minhash_lsh")).isEmpty)
  }

  test("ds3 pair accounting == d2's verified pair frame (shared definition)") {
    // ds3's n_pairs must sum to exactly d2's row count on the SAME corpus
    // (both dup-free sf0.001 and the 3-fold replicated dup corpus), and
    // every pair must land in a (split_lo <= split_hi) cell — the audit
    // can never disagree with the dedup pass about what a duplicate is
    for (dir <- Seq("/root/testdata/sf0.001", dupDir)) {
      val pairs = Registry.byName("d2_minhash_lsh").fn(spark, dir).count()
      val cells = Registry.byName("ds3_split_leakage").fn(spark, dir).collect()
      assert(cells.map(_.getLong(2)).sum == pairs,
        s"ds3 cell sum != d2 pair count at $dir")
      assert(cells.forall(r => r.getString(0) <= r.getString(1)))
    }
  }

  test("ds3 histogram arithmetic == labeled expansion of d2's pair list") {
    // on the dup corpus ds3 takes the group-histogram branch (no member
    // pair is ever materialized); the semantic reference is the old
    // expansion: label BOTH sides of every d2 pair with the ds2 id-hash
    // split and count per (lo, hi) cell. Per-cell equality here is what
    // lets the sf0.01 oracle (which only sees the dup-free branch) stand
    // in for the branch that actually runs at decade scale.
    def splitOf(id: org.apache.spark.sql.Column) = {
      val b = pmod(
        conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long"),
        lit(100L))
      when(b < 96, "train").when(b < 98, "val").otherwise("test")
    }
    val expanded = run("d2_minhash_lsh")
      .select(splitOf(col("doc_a")).as("sa"), splitOf(col("doc_b")).as("sb"))
      .groupBy(least(col("sa"), col("sb")).as("split_lo"),
        greatest(col("sa"), col("sb")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
    val got = run("ds3_split_leakage")
    assert(got.exceptAll(expanded).isEmpty && expanded.exceptAll(got).isEmpty,
      s"ds3 cells ${got.collect().toSeq} != expansion ${expanded.collect().toSeq}")
  }

  test("d2 adaptive probe: dup-free at sf0.001, dup-heavy on the replicated corpus") {
    assert(!DedupOps.hasDupShingleSets(spark, "/root/testdata/sf0.001"),
      "sf0.001 unexpectedly has duplicate shingle sets — the fast-path " +
        "equivalence test below would silently test the collapse path")
    assert(DedupOps.hasDupShingleSets(spark, dupDir))
  }

  test("d2 fast path (dup-free corpus) == collapse-branch computation") {
    // the probe routes sf0.001 to per-doc banding; recompute what the
    // COLLAPSE branch would emit there and assert set equality, so the
    // two branches can never drift apart on the corpus class where the
    // fast path actually runs
    val sf = "/root/testdata/sf0.001"
    val sh = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), call_function("graft_shingle_hashes", col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val groups = sh.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"))
    val bands = groups.select(col("rep"),
      explode(call_function("graft_minhash_bands",
        col("sh"), lit(12), lit(4), lit(3))).as("band_key"))
    val fpPairs = bands.select(col("band_key"), col("rep").as("rep_a"))
      .join(bands.select(col("band_key"), col("rep").as("rep_b")), Seq("band_key"))
      .filter(col("rep_a") < col("rep_b"))
      .select(col("rep_a"), col("rep_b")).distinct()
    val jac = (a: String, b: String) => {
      val inter = size(array_intersect(col(a), col(b)))
      inter.cast("double") / (size(col(a)) + size(col(b)) - inter).cast("double")
    }
    val cross = fpPairs
      .join(groups.select(col("rep").as("rep_a"), col("sh").as("sh_a"),
        col("members").as("ms_a")), Seq("rep_a"))
      .join(groups.select(col("rep").as("rep_b"), col("sh").as("sh_b"),
        col("members").as("ms_b")), Seq("rep_b"))
      .select(col("ms_a"), col("ms_b"), jac("sh_a", "sh_b").as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .select(explode(col("ms_a")).as("da"), col("ms_b"), col("jaccard"))
      .select(col("da"), explode(col("ms_b")).as("db"), col("jaccard"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
    val intra = groups.filter(size(col("members")) >= 2)
      .withColumn("jaccard", jac("sh", "sh"))
      .filter(col("jaccard") >= 0.5)
      .select(explode(col("members")).as("doc_a"), col("members"), col("jaccard"))
      .select(col("doc_a"), explode(col("members")).as("doc_b"), col("jaccard"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val collapseBranch = cross.unionByName(intra)
    val fast = Registry.byName("d2_minhash_lsh").fn(spark, sf)
    assert(fast.exceptAll(collapseBranch).isEmpty &&
      collapseBranch.exceptAll(fast).isEmpty)
  }

  test("d7 collapsed-graph clusters == components over the full pair list") {
    val direct = graft.exec.ConnectedComponents
      .components(run("d4_simhash_pairs"), "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    assert(run("d7_dup_clusters").exceptAll(direct).isEmpty &&
      direct.exceptAll(run("d7_dup_clusters")).isEmpty)
  }

  test("d12 collapsed-star clusters == components over the d6 pair list") {
    // d12 clusters rep-level edges + rep→member stars; CC over d6's
    // EXPANDED member-pair list is the semantic reference — on the
    // 3x-replicated corpus every cluster carries real duplicate members,
    // so a star/expansion divergence cannot hide
    val direct = graft.exec.ConnectedComponents
      .components(run("d6_embed_neardup").select(col("vec_a"), col("vec_b")),
        "vec_a", "vec_b")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("id"))), ";").as("member_ids"))
      .select(col("label").as("cluster_id"), col("n_members"), col("member_ids"))
    assert(run("d12_semantic_keep_one").exceptAll(direct).isEmpty &&
      direct.exceptAll(run("d12_semantic_keep_one")).isEmpty)
  }

  test("sim6 group-truncated knn == direct per-vector ranked candidates") {
    // the k+2 per-group truncation before member expansion must be
    // invisible: on a corpus where every vector has 2 exact twins, each
    // vector's top-3 is dominated by in-group ties, exercising both the
    // self-exclusion slot and the tie-break ordering the bound relies on
    import org.apache.spark.sql.expressions.Window
    val e = Tables.t(spark, dupDir, "embeddings")
      .select(col("vec_id"), quantizeN(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(dotQN(col("q"), col("q")).cast("double")))
    val bands = e.select(col("vec_id"),
      explode(call_function("graft_lsh_bands", col("q"), lit(4), lit(4), lit(64))).as("band_key"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val direct = bands.select(col("band_key"), col("vec_id"))
      .join(bands.select(col("band_key"), col("vec_id").as("neighbor_id")), Seq("band_key"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id")).distinct()
      .join(e.select(col("vec_id"), col("q").as("q_a"), col("nrm").as("n_a")), Seq("vec_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("q").as("q_b"), col("nrm").as("n_b")),
        Seq("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        (dotQN(col("q_a"), col("q_b")).cast("double") / (col("n_a") * col("n_b"))).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
    assert(run("sim6_knn_graph").exceptAll(direct).isEmpty &&
      direct.exceptAll(run("sim6_knn_graph")).isEmpty)
  }
}
