package graft

/** `SPARK_GRAFT_ONLY=k1,k2` filters which keys/ops the dev mains run
  * (Bench, Verify, ScaleBench). The driver never sets it, so driver
  * runs always cover everything. One parser shared by all three mains
  * so the knob cannot fork into differently-named variants.
  */
private[graft] object EnvOnly {
  private lazy val only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)

  def keep(name: String): Boolean = only.forall(_.contains(name))
}
