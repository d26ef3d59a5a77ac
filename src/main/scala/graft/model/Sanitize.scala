package graft.model

/** Column/key sanitization rules from the reference's key sanitizer
  * (`/root/reference/helpers.php:28-35`): `-`, `_`, ` ` (and runs thereof)
  * normalize to a single `_`. Pure function — applied to DataFrame column
  * names, never to data rows, so it costs nothing at scale.
  */
object Sanitize {
  def key(name: String): String =
    name.replaceAll("[-_ ]+", "_")

  /** Reserved Kissmetrics event fields (`/root/reference/src/Operations/FileImporter.php:97-102`,
    * `/root/reference/src/KissmetricsToDatabase.php:281-311`). */
  object Reserved {
    val Person  = "_p"   // person/identity
    val Alias   = "_p2"  // aliased identity (alias events)
    val Name    = "_n"   // event name, may be empty
    val Time    = "_t"   // unix epoch seconds
    val NewEmail      = "new_email"
    val PreviousEmail = "previous_email"
  }
}
