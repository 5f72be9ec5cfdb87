package graft

/** Engine version stamped on every output row — the reference stamps its
  * pom version on every response (DocumentParser.java:69,71-90,101-102).
  * Kept in sync with build.sbt manually (no sbt-buildinfo in the sandbox).
  */
object BuildInfo {
  val version: String = "0.1.0"
}
