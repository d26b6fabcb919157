package graft.cli

import java.nio.file.Files
import graft.{Fixtures, SparkSuite}

/** Drives the four CLI subcommands end-to-end (E1–E3 +
  * tripletex-verify) through Main.run — the user-facing surface.
  */
class MainSpec extends SparkSuite {

  private lazy val workDir = Files.createTempDirectory("cli").toString
  private lazy val storeDir = s"$workDir/store"

  private lazy val fixturesFile: String = {
    // flat {url: body} JSON via Jackson (same parser Main uses)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    Fixtures.transportFixtures.foreach { case (k, v) => node.put(k, v) }
    val f = s"$workDir/fixtures.json"
    Files.writeString(java.nio.file.Paths.get(f), mapper.writeValueAsString(node))
    f
  }

  test("shopify-update ingests from a fixture file") {
    Main.run(spark, "shopify-update", Map(
      "store" -> storeDir, "fixtures" -> fixturesFile,
      "base-url" -> Fixtures.base,
      "from-date" -> "2021-05-01", "to-date" -> "2021-05-31"), Nil)
    assert(new graft.store.ShopifyStore(spark, storeDir).read("orders").count() == 3)
  }

  test("tripletex-generate writes the invoice CSV") {
    val out = s"$workDir/invoices.csv"
    Main.run(spark, "tripletex-generate", Map(
      "store" -> storeDir, "from-date" -> "2021-05-01", "to-date" -> "2021-05-31",
      "invoice-start-id" -> "100", "out" -> out),
      Seq("vipps" -> "Vipps", "stripe" -> "Stripe"))
    val lines = Files.readAllLines(java.nio.file.Paths.get(out))
    assert(lines.get(0).split(";").length == 17)
    assert(lines.size() == 8) // header + 7 invoice lines
  }

  test("tripletex-verify re-checks a written CSV") {
    Main.run(spark, "tripletex-verify", Map("in" -> s"$workDir/invoices.csv"),
      Seq("vipps" -> "Vipps", "stripe" -> "Stripe"))
  }

  test("heatmap renders HTML from the store") {
    val out = s"$workDir/heatmap.html"
    Main.run(spark, "heatmap", Map("store" -> storeDir, "out" -> out), Nil)
    assert(Files.readString(java.nio.file.Paths.get(out)).contains("<canvas"))
  }

  test("unknown subcommand fails cleanly") {
    intercept[IllegalArgumentException] {
      Main.run(spark, "bogus", Map.empty, Nil)
    }
  }
}
