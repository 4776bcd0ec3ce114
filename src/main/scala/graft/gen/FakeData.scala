package graft.gen

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.util.Random

/** Deterministic drifting-schema CSV generator (I1/I2 in SURVEY §2;
  * reference `src/utils/fake_data.py:40-218`). Reproduces the reference's
  * input contract — per file: 5 mandatory columns + a random sample of
  * 1..N optional columns from a 70-column universe, 1..records rows,
  * filename `customers-{i}.csv` — but seeded (`scala.util.Random(seed)`)
  * with fixed value tables instead of faker, so tests are reproducible
  * (SURVEY §7.4 risk 3 analog for test data).
  */
object FakeData {

  /** Mandatory columns present in every file (`fake_data.py:11-12`). */
  val MandatoryColumns: Seq[String] =
    Seq("Index", "Customer Id", "First Name", "Last Name", "Subscription Date")

  // Fixed value vocabularies (deterministic stand-ins for faker).
  private val firstNames = Vector("James", "Mary", "Robert", "Patricia",
    "John", "Jennifer", "Michael", "Linda", "David", "Elizabeth", "William",
    "Barbara", "Richard", "Susan", "Joseph", "Jessica")
  private val lastNames = Vector("Smith", "Johnson", "Williams", "Brown",
    "Jones", "Garcia", "Miller", "Davis", "Rodriguez", "Martinez",
    "Hernandez", "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas")
  private val companies = Vector("Acme Corp", "Globex", "Initech",
    "Umbrella LLC", "Stark Industries", "Wayne Enterprises", "Hooli",
    "Pied Piper", "Vandelay", "Wonka Industries")
  private val cities = Vector("Springfield", "Riverton", "Fairview",
    "Kingsport", "Maplewood", "Cedar Falls", "Lakeside", "Brookhaven")
  private val countries = Vector("USA", "Canada", "Mexico", "Brazil",
    "Germany", "France", "Spain", "Italy", "Japan", "Australia")
  private val states = Vector("CA", "NY", "TX", "FL", "WA", "IL", "PA", "OH")
  private val industries = Vector("Software", "Retail", "Finance",
    "Healthcare", "Manufacturing", "Education", "Energy", "Media")
  private val jobTitles = Vector("Engineer", "Manager", "Analyst",
    "Director", "Consultant", "Designer", "Accountant", "Technician")
  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")
  private val languages = Vector("English", "Spanish", "French", "German",
    "Portuguese", "Japanese", "Mandarin", "Hindi")
  private val timeZones = Vector("UTC", "America/New_York",
    "Europe/London", "Asia/Tokyo", "Australia/Sydney", "Europe/Berlin")
  private val userAgents = Vector("Mozilla/5.0 (Windows NT 10.0)",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X)", "Mozilla/5.0 (X11; Linux)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS)")

  private def pick(r: Random, v: Vector[String]): String = v(r.nextInt(v.length))
  private def num(r: Random, lo: Int, hi: Int): String =
    (lo + r.nextInt(hi - lo + 1)).toString
  private def dbl(r: Random, lo: Double, hi: Double): String =
    f"${lo + r.nextDouble() * (hi - lo)}%.2f"
  private def dateStr(r: Random): String =
    f"${2015 + r.nextInt(10)}%04d-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d"
  private def dateTimeStr(r: Random): String =
    s"${dateStr(r)} ${f"${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:${r.nextInt(60)}%02d"}"
  private def uuidish(r: Random, n: Int): String =
    Seq.fill(n)("0123456789abcdef"(r.nextInt(16))).mkString
  private def sentence(r: Random, n: Int): String =
    Seq.fill(n)(pick(r, words)).mkString(" ")

  /** The 70-column optional universe (`fake_data.py:15-32`, value rules
    * `:71-214`; full list in FIXTURES.md §A1). Each generator emits the
    * *source string* — Spark's CSV inference assigns the type.
    */
  val OptionalColumns: Seq[(String, Random => String)] = Seq[(String, Random => String)](
    // ints
    "Revenue" -> (r => num(r, 100000, 10000000)),
    "Loyalty Points" -> (r => num(r, 0, 1000)),
    "Previous Purchases" -> (r => num(r, 0, 100)),
    "Customer Rating" -> (r => num(r, 1, 5)),
    "Support Tickets" -> (r => num(r, 0, 10)),
    "Page Views" -> (r => num(r, 0, 100)),
    "Session Duration" -> (r => num(r, 60, 3600)),
    "Altitude" -> (r => num(r, 0, 8000)),
    // doubles
    "Average Order Value" -> (r => dbl(r, 10, 1000)),
    "Temperature" -> (r => dbl(r, -20, 40)),
    "Humidity" -> (r => dbl(r, 0, 100)),
    "Pressure" -> (r => dbl(r, 900, 1100)),
    "Latitude" -> (r => dbl(r, -90, 90)),
    "Longitude" -> (r => dbl(r, -180, 180)),
    // booleans
    "Marketing Opt-In" -> (r => r.nextBoolean().toString),
    "Newsletter Subscription" -> (r => r.nextBoolean().toString),
    // date-like strings
    "Purchase Date" -> dateStr _,
    "Customer Since" -> dateStr _,
    "Date of Birth" -> dateStr _,
    // datetime-like strings
    "Last Login" -> dateTimeStr _,
    "Last Contacted" -> dateTimeStr _,
    "Next Scheduled Contact" -> dateTimeStr _,
    // free text / identifiers
    "Company" -> (r => pick(r, companies)),
    "City" -> (r => pick(r, cities)),
    "Country" -> (r => pick(r, countries)),
    "Phone" -> (r => s"+1-555-${num(r, 1000000, 9999999)}"),
    "Email" -> (r => s"${pick(r, words)}.${pick(r, words)}@example.com"),
    "Industry" -> (r => pick(r, industries)),
    "Zip Code" -> (r => f"${r.nextInt(100000)}%05d"),
    "Address" -> (r => s"${num(r, 1, 9999)} ${pick(r, words).capitalize} St"),
    "State" -> (r => pick(r, states)),
    "Website" -> (r => s"https://www.${pick(r, words)}.example.com"),
    "Job Title" -> (r => pick(r, jobTitles)),
    "Shipping Address" -> (r => s"${num(r, 1, 9999)} ${pick(r, words).capitalize} Ave"),
    "Billing Address" -> (r => s"${num(r, 1, 9999)} ${pick(r, words).capitalize} Blvd"),
    "Credit Card Number" -> (r => Seq.fill(4)(num(r, 1000, 9999)).mkString("-")),
    "Social Security Number" -> (r => s"${num(r, 100, 999)}-${num(r, 10, 99)}-${num(r, 1000, 9999)}"),
    "IP Address" -> (r => Seq.fill(4)(r.nextInt(256)).mkString(".")),
    "User Agent" -> (r => pick(r, userAgents)),
    "Language" -> (r => pick(r, languages)),
    "Time Zone" -> (r => pick(r, timeZones)),
    "Notes" -> (r => sentence(r, 5)),
    "Comments" -> (r => sentence(r, 8)),
    "Occupation" -> (r => pick(r, jobTitles)),
    "Campaign Name" -> (r => s"${pick(r, words)}_campaign"),
    "Ad Group" -> (r => s"${pick(r, words)}_group"),
    "Keyword" -> (r => pick(r, words)),
    "Order ID" -> (r => s"ORD-${num(r, 100000, 999999)}"),
    "Campaign ID" -> (r => s"CMP-${num(r, 1000, 9999)}"),
    "Click ID" -> (r => uuidish(r, 32)),
    "Location Coordinates" -> (r => s"${dbl(r, -90, 90)}, ${dbl(r, -180, 180)}"),
    "Sensor Data" -> (r => s"${dbl(r, 0, 100)}, ${dbl(r, 0, 100)}"),
    "Acceleration" -> (r => s"${dbl(r, 0, 10)}, ${dbl(r, 0, 10)}, ${dbl(r, 0, 10)}"),
    "Screen Resolution" -> (r => pick(r, Vector("1920x1080", "2560x1440", "1366x768", "3840x2160"))),
    // enums (`fake_data.py` value sets, FIXTURES.md §A1)
    "Department" -> (r => pick(r, Vector("Sales", "Marketing", "Engineering", "Support"))),
    "Product Category" -> (r => pick(r, Vector("Electronics", "Clothing", "Books", "Home Goods"))),
    "Referral Source" -> (r => pick(r, Vector("Google", "Facebook", "Direct", "Referral"))),
    "Membership Level" -> (r => pick(r, Vector("Gold", "Silver", "Bronze"))),
    "Preferred Contact Method" -> (r => pick(r, Vector("Email", "Phone", "Mail"))),
    "Account Status" -> (r => pick(r, Vector("Active", "Inactive", "Pending"))),
    "Gender" -> (r => pick(r, Vector("Male", "Female", "Other"))),
    "Ethnicity" -> (r => pick(r, Vector("Hispanic", "Asian", "Black", "White"))),
    "Marital Status" -> (r => pick(r, Vector("Single", "Married", "Divorced"))),
    "Education Level" -> (r => pick(r, Vector("High School", "Bachelor", "Master", "PhD"))),
    "Hobbies" -> (r => pick(r, Vector("Reading", "Hiking", "Gaming", "Cooking"))),
    "Interests" -> (r => pick(r, Vector("Tech", "Sports", "Music", "Travel"))),
    "Lead Source" -> (r => pick(r, Vector("Web", "Event", "Partner"))),
    "Lead Status" -> (r => pick(r, Vector("New", "Contacted", "Qualified", "Lost"))),
    "Device Type" -> (r => pick(r, Vector("Desktop", "Mobile", "Tablet"))),
    "Operating System" -> (r => pick(r, Vector("Windows", "macOS", "Linux", "iOS", "Android"))),
    "Browser" -> (r => pick(r, Vector("Chrome", "Firefox", "Safari", "Edge")))
  )

  /** Reference text normalization (I2, `fake_data.py:34-38`):
    * collapse whitespace runs, trim.
    */
  def normalizeText(s: String): String = s.replaceAll("\\s+", " ").trim

  /** Deterministic seeded RGB-grid PNG (real, lossless image bytes):
    * dimensions and every pixel are closed-form in (seed, x, y), so an
    * external engine can reproduce the exact per-channel integer sums
    * WITHOUT any image library — the property the `mm_decode_image`
    * oracle exploits. Formula (seed ≥ 0; all values in 0..255):
    *
    *   w = seed % 16 + 4,  h = seed % 12 + 4
    *   r(x,y) = (seed*31 + x*7  + y*13) % 256
    *   g(x,y) = (seed*17 + x*11 + y*3 ) % 256
    *   b(x,y) = (seed*5  + x*3  + y*29) % 256
    */
  def seededPng(seed: Long): Array[Byte] = {
    require(seed >= 0, s"seededPng needs a non-negative seed, got $seed")
    val w = (seed % 16 + 4).toInt
    val h = (seed % 12 + 4).toInt
    graft.operators.Multimodal.ImageCodec.encodePng(w, h, (x, y) => {
      val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
      val g = ((seed * 17 + x * 11 + y * 3) % 256).toInt
      val b = ((seed * 5 + x * 3 + y * 29) % 256).toInt
      (r << 16) | (g << 8) | b
    })
  }

  /** Deterministic seeded WAV (real, lossless RIFF/PCM16 bytes): shape
    * and every sample are closed-form in (seed, frame, channel), so an
    * external engine can reproduce the exact per-channel integer sums
    * WITHOUT any audio library — the property the `mm_decode_audio`
    * oracle exploits. Formula (seed ≥ 0; samples signed, in
    * -2048..2047):
    *
    *   channels = seed % 2 + 1,  frames = seed % 50 + 20
    *   rate     = 8000 + (seed % 4) * 4000
    *   s(i,c)   = (seed*31 + i*7 + c*13) % 4096 - 2048
    */
  def seededWav(seed: Long): Array[Byte] = {
    require(seed >= 0, s"seededWav needs a non-negative seed, got $seed")
    val channels = (seed % 2 + 1).toInt
    val frames = (seed % 50 + 20).toInt
    val rate = (8000 + (seed % 4) * 4000).toInt
    graft.operators.Multimodal.AudioCodec.encodeWavPcm16(rate, channels,
      frames, (i, c) => ((seed * 31 + i * 7 + c * 13) % 4096 - 2048).toShort)
  }

  /** Deterministic seeded MJPEG AVI (real RIFF container, real JPEG
    * frames): solid-gray frames at JPEG quality 1.0 roundtrip
    * BIT-EXACTLY (uniform blocks are DC-only and the q=1.0
    * quantization table is all ones), so shape and per-frame sums stay
    * closed-form in the seed — the property the `mm_decode_video`
    * oracle exploits. Formula (seed ≥ 0):
    *
    *   w = seed % 10 + 4,  h = seed % 7 + 4,  frames = seed % 6 + 2
    *   gray(i) = (seed*37 + i*19) % 256   (all three channels)
    */
  def seededAvi(seed: Long): Array[Byte] = {
    require(seed >= 0, s"seededAvi needs a non-negative seed, got $seed")
    val w = (seed % 10 + 4).toInt
    val h = (seed % 7 + 4).toInt
    val n = (seed % 6 + 2).toInt
    val frames = (0 until n).map(i =>
      graft.operators.Multimodal.VideoCodec.encodeJpegGray(w, h,
        ((seed * 37 + i * 19) % 256).toInt))
    graft.operators.Multimodal.VideoCodec.encodeAviMjpeg(w, h, 10, frames)
  }

  /** Minimal RFC-4180 quoting: quote when the value contains comma,
    * quote, or newline; double embedded quotes.
    */
  private def csvQuote(v: String): String =
    if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** Write one drifting CSV: mandatory columns + a seeded random sample
    * of 1..maxOptional optional columns, 1..maxRecords rows
    * (`fake_data.py:47-55`). Returns the written path.
    */
  def writeCsv(dir: Path, fileIndex: Int, maxRecords: Int, seed: Long,
      maxOptional: Int = OptionalColumns.length): Path = {
    val r = new Random(seed + fileIndex)
    val nOpt = 1 + r.nextInt(maxOptional)
    val optional = r.shuffle(OptionalColumns.toVector).take(nOpt)
    val header = MandatoryColumns ++ optional.map(_._1)
    val nRows = 1 + r.nextInt(maxRecords)
    val rows = (0 until nRows).map { i =>
      val mandatory = Seq(
        (fileIndex * 10 + i).toString,
        uuidish(r, 16),
        pick(r, firstNames),
        pick(r, lastNames),
        dateStr(r))
      val opt = optional.map { case (_, gen) => normalizeText(gen(r)) }
      (mandatory ++ opt).map(csvQuote).mkString(",")
    }
    Files.createDirectories(dir)
    val path = dir.resolve(s"customers-$fileIndex.csv")
    val content = (header.map(csvQuote).mkString(",") +: rows).mkString("\n") + "\n"
    Files.write(path, content.getBytes(StandardCharsets.UTF_8))
    path
  }

  /** Generate files `customers-{start..end}.csv` (reference CLI contract
    * `fake_data.py:221-231`: `--start/--end/--records`).
    */
  def generate(dir: String, start: Int = 1, end: Int = 20,
      records: Int = 10, seed: Long = 42L,
      maxOptional: Int = OptionalColumns.length): Seq[Path] = {
    val d = Paths.get(dir)
    (start to end).map(i => writeCsv(d, i, records, seed, maxOptional))
  }
}
