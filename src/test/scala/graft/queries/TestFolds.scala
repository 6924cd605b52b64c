package graft.queries

/** Shared test-side twins of the portable hash machinery, so the specs
  * that pin hash-driven queries from first principles (MixtureSpec,
  * SplitsSpec, CurationCapstoneSpec) agree by construction instead of
  * by three copies staying in sync.
  */
object TestFolds {

  /** Twin of TextFns.hash60 (top 15 hex chars of md5). */
  def md5hash60(s: String): Long = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(dg.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Twin of q89's (and Splits') seeded 100-bucket 80/10/10 split. */
  def splitOf(key: Long): String = {
    val b = md5hash60("sp8" + key) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }
}
