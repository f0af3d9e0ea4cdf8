package graft.queries

object DslOps { def qs: Seq[Q] = Seq.empty }
object EtlGraphOps { def qs: Seq[Q] = Seq.empty }
