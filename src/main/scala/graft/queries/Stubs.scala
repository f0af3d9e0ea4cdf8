package graft.queries

object DslOps { def qs: Seq[Q] = Seq.empty }
object TextOps { def qs: Seq[Q] = Seq.empty }
object DedupOps { def qs: Seq[Q] = Seq.empty }
object SimilarityOps { def qs: Seq[Q] = Seq.empty }
object EtlGraphOps { def qs: Seq[Q] = Seq.empty }
