package graft.training

import graft.functions.PyRandom

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Port of the reference's synthetic-corpus factory
  * (`/root/reference/sensitive_data_generator/generators.py` +
  * `formatters.py` + `config.py`) — the zh_TW PII value generators and the
  * paragraph / medical-record / financial-statement document formatters.
  *
  * Bit-exact with CPython under a shared MT19937 seed: every `random.*`
  * draw (including draws consumed by discarded branches, short-circuited
  * conditions, and placeholder types absent from a template) happens in the
  * reference's exact order, so seeded outputs compare byte-for-byte
  * (SensitiveDataGenSpec golden battery, fixtures from
  * `tools/gen_sensitive.py`). `datetime.now()` is a parameter (`now`) —
  * the reference's only nondeterminism besides the RNG.
  *
  * The vocab constants (locations, streets, surnames, given names,
  * hospitals, specialties) are the SPEC, copied from `config.py` with the
  * reference's ordering — order is load-bearing for `random.choice` parity.
  */
object SensitiveDataGen {

  // ---- config.py vocab (order is part of the contract) --------------------

  val taiwanRegions: IndexedSeq[String] =
    IndexedSeq("北部", "中部", "南部", "東部", "離島")

  val taiwanLocations: Map[String, IndexedSeq[String]] = Map(
    "北部" -> IndexedSeq("台北市", "新北市", "基隆市", "宜蘭縣", "桃園市", "新竹市", "新竹縣"),
    "中部" -> IndexedSeq("苗栗縣", "台中市", "彰化縣", "南投縣", "雲林縣"),
    "南部" -> IndexedSeq("嘉義市", "嘉義縣", "台南市", "高雄市", "屏東縣"),
    "東部" -> IndexedSeq("花蓮縣", "台東縣"),
    "離島" -> IndexedSeq("澎湖縣", "金門縣", "連江縣"))

  val streetNames: IndexedSeq[String] = IndexedSeq(
    "中山", "中正", "忠孝", "仁愛", "信義", "和平", "民族", "民權", "民生",
    "復興", "建國", "成功", "光復", "新生", "羅斯福", "重慶", "南京", "杭州")

  val surnames: IndexedSeq[String] = IndexedSeq(
    "陳", "林", "黃", "張", "李", "王", "吳", "劉", "蔡", "楊",
    "許", "鄭", "謝", "郭", "洪", "邱", "曾", "廖", "賴", "周")

  val givenNames: IndexedSeq[String] = IndexedSeq(
    "怡君", "志明", "雅婷", "建宏", "美玲", "俊傑", "怡如", "冠宇", "雅惠", "宗翰",
    "淑芬", "家豪", "淑惠", "志偉", "雅玲", "俊宏", "怡婷", "志豪", "佳蓉", "彥廷",
    "淑娟", "志強", "靜怡", "建志", "佩珊", "柏翰", "慧君", "承翰", "欣怡", "冠廷")

  val hospitals: IndexedSeq[String] = IndexedSeq(
    "台大醫院", "台北榮總", "長庚紀念醫院", "馬偕醫院", "國泰醫院",
    "新光醫院", "三軍總醫院", "萬芳醫院", "亞東醫院", "慈濟醫院")

  val medicalSpecialties: IndexedSeq[String] = IndexedSeq(
    "內科", "外科", "兒科", "婦產科", "骨科",
    "神經科", "心臟科", "眼科", "耳鼻喉科", "皮膚科")

  // ---- generators.py -------------------------------------------------------

  /** `generate_tw_id` (generators.py:13-40): format-valid Taiwan national
    * ID with the real check-digit rule.
    */
  def twId(r: PyRandom): String = {
    val areaCodes = "ABCDEFGHJKLMNPQRSTUVXYWZ"
    val first = r.choice(areaCodes)
    val gender = r.choice(IndexedSeq("1", "2"))
    val digits = (1 to 7).map(_ => r.randint(0, 9)).mkString
    val firstVal = if (first.toInt > 74) first.toInt - 55 else first.toInt - 64
    val weights = Array(1, 9, 8, 7, 6, 5, 4, 3, 2, 1)
    var total = firstVal * weights(0) + gender.toInt * weights(1)
    digits.zipWithIndex.foreach { case (d, i) => total += (d - '0') * weights(i + 2) }
    val check = (10 - (total % 10)) % 10
    s"$first$gender$digits$check"
  }

  /** `generate_tw_phone` (generators.py:42-53). */
  def twPhone(r: PyRandom): String = {
    val middle = r.randint(10, 99)
    val end = r.randint(100000, 999999)
    if (r.random() > 0.5) f"09$middle%02d-${end / 1000}%03d-${end % 1000}%03d"
    else f"09$middle%02d$end"
  }

  /** `generate_tw_address` (generators.py:55-87) — draw order preserved,
    * including the short-circuited alley/floor draws.
    */
  def twAddress(r: PyRandom): String = {
    val region = r.choice(taiwanRegions)
    val city = r.choice(taiwanLocations(region))
    val streetType = r.choice(IndexedSeq("路", "街", "大道"))
    val streetName = r.choice(streetNames)
    val lane = if (r.random() > 0.7) s"${r.randint(1, 100)}巷" else ""
    val alley =
      if (lane.nonEmpty && r.random() > 0.5) s"${r.randint(1, 20)}弄" else ""
    val number = s"${r.randint(1, 100)}號"
    var floor = ""
    if (r.random() > 0.5) {
      floor = s"${r.randint(1, 25)}樓"
      if (r.random() > 0.7) floor += s"之${r.randint(1, 5)}"
    }
    s"$city$streetName$streetType$lane$alley$number$floor"
  }

  /** `generate_tw_name` (generators.py:89-102). */
  def twName(r: PyRandom): String = {
    val surname = r.choice(surnames)
    var given = r.choice(givenNames)
    if (r.random() > 0.7) {
      var second = r.choice(givenNames)
      while (second == given) second = r.choice(givenNames)
      given += second
    }
    s"$surname$given"
  }

  /** `generate_medical_record` id (generators.py:104-118). */
  def medicalRecordId(r: PyRandom): String = {
    val hospital = r.choice(hospitals)
    val code = hospital.filter(_.isLetter).take(3).toUpperCase
    r.randbelow(4) match {
      case 0 => s"$code-${r.randint(100000, 999999)}"
      case 1 => s"${r.randint(10000000, 99999999)}"
      case 2 => s"MR${r.choice(IndexedSeq("A", "B", "C"))}${r.randint(10000, 99999)}"
      case _ => s"病歷號：${r.randintLong(1000000000L, 9999999999L)}"
    }
  }

  /** `generate_credit_card` (generators.py:120-131) — format-only. */
  def creditCard(r: PyRandom): String = {
    val prefix = r.choice(IndexedSeq("4", "5", "34", "37", "6"))
    val length = if (prefix.length == 1) 16 else 15
    prefix + (1 to (length - prefix.length)).map(_ => r.randint(0, 9)).mkString
  }

  /** `generate_date_of_birth` (generators.py:133-157). */
  def dateOfBirth(r: PyRandom, now: LocalDate, minAge: Int = 18, maxAge: Int = 90): String = {
    val year = now.getYear - r.randint(minAge, maxAge)
    val month = r.randint(1, 12)
    val maxDay = month match {
      case 2 => if ((year % 4 == 0 && year % 100 != 0) || year % 400 == 0) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    val day = r.randint(1, maxDay)
    r.randbelow(3) match {
      case 0 => s"${year}年${month}月${day}日"
      case 1 => f"$year-$month%02d-$day%02d"
      case _ => f"$day/$month/${year % 100}%02d"
    }
  }

  /** `generate_email` (generators.py:159-185). */
  def email(r: PyRandom, name: Option[String] = None): String = {
    val n = name.getOrElse(twName(r)).replace(" ", "")
    val domains = IndexedSeq(
      "gmail.com", "yahoo.com.tw", "hotmail.com", "outlook.com",
      "msn.com", "pchome.com.tw", "hinet.net")
    val prefix = r.randbelow(4) match {
      case 0 => n
      case 1 => s"$n${r.randint(1, 99)}"
      case 2 => s"${n.head}${n.tail}${r.randint(10, 99)}"
      case _ => s"$n.${r.randint(1970, 2023)}"
    }
    val domain = r.choice(domains)
    s"$prefix@$domain".toLowerCase
  }

  /** `generate_passport` (generators.py:187-190). */
  def passport(r: PyRandom): String =
    s"${r.choice("ABCDEFGH")}${r.randint(1000000, 9999999)}"

  /** `generate_license_plate` (generators.py:192-203). */
  def licensePlate(r: PyRandom): String = {
    val upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    if (r.random() > 0.5) {
      val letters = (1 to 3).map(_ => r.choice(upper)).mkString
      val numbers = (1 to 3).map(_ => r.randint(0, 9)).mkString
      s"$letters-$numbers"
    } else {
      val numbers = (1 to 3).map(_ => r.randint(0, 9)).mkString
      val letters = (1 to 3).map(_ => r.choice(upper)).mkString
      s"$numbers-$letters"
    }
  }

  /** `generate_health_insurance` (generators.py:205-208). */
  def healthInsurance(r: PyRandom): String =
    s"${r.randintLong(10000000000L, 99999999999L)}"

  /** `generate_random_pii` (generators.py:210-227): (type, value-thunk). */
  def randomPii(r: PyRandom, now: LocalDate): (String, () => String) = {
    val types = IndexedSeq[(String, () => String)](
      ("TW_ID", () => twId(r)),
      ("PHONE", () => twPhone(r)),
      ("ADDRESS", () => twAddress(r)),
      ("NAME", () => twName(r)),
      ("MEDICAL_RECORD", () => medicalRecordId(r)),
      ("DATE_OF_BIRTH", () => dateOfBirth(r, now)),
      ("EMAIL", () => email(r)),
      ("CREDIT_CARD", () => creditCard(r)),
      ("PASSPORT", () => passport(r)),
      ("LICENSE_PLATE", () => licensePlate(r)),
      ("HEALTH_INSURANCE", () => healthInsurance(r)))
    r.choice(types)
  }

  // ---- formatters.py -------------------------------------------------------

  private val sentenceTemplates: IndexedSeq[String] = IndexedSeq(
    "根據最新報告顯示，{PII} 的情況需要進一步關注。",
    "在 {DATE} 的會議中，我們討論了關於 {NAME} 的提案。",
    "請聯絡 {NAME}，電話號碼是 {PHONE}，地址是 {ADDRESS}。",
    "病患 {NAME}，病歷號碼 {MEDICAL_RECORD}，將於下週進行複診。",
    "信用卡號 {CREDIT_CARD} 將於本月到期，請更新付款資訊。",
    "您的身份證字號 {TW_ID} 需要進行驗證。",
    "寄送地址：{ADDRESS}，收件人：{NAME}。",
    "請於 {DATE} 攜帶身分證 {TW_ID} 至本機構辦理手續。",
    "電子郵件 {EMAIL} 已收到您的諮詢，將盡快回覆。",
    "護照號碼 {PASSPORT} 已通過審核，可至櫃台領取。")

  /** `generate_paragraph` (formatters.py:13-49). Faithful to the quirks:
    * the chosen PII value is generated (consuming draws) even when its
    * placeholder isn't in the template, and `{PII}`/`{DATE}` are never in
    * the generated-type list so they survive to the output.
    */
  def paragraph(
      r: PyRandom, now: LocalDate,
      minSentences: Int = 3, maxSentences: Int = 8,
      piiDensity: Double = 0.3): String = {
    val sb = new StringBuilder
    val numSentences = r.randint(minSentences, maxSentences)
    for (_ <- 1 to numSentences) {
      var template = r.choice(sentenceTemplates)
      var loop = true
      while (loop) {
        val piiCount = template.count(_ == '{')
        if (piiCount == 0 || r.random() > piiDensity) loop = false
        else {
          val (typ, gen) = randomPii(r, now)
          val value = gen()
          val tok = "{" + typ + "}"
          val idx = template.indexOf(tok)
          if (idx >= 0)
            template = template.substring(0, idx) + value +
              template.substring(idx + tok.length)
        }
      }
      sb.append(template)
    }
    sb.toString
  }

  private val ymd = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  /** Python `round(x, 2)`: correctly-rounded half-to-even on the exact
    * binary value of the double.
    */
  private def round2(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** Python `f"{x:,.2f}"`: correct (half-even) rounding of the binary
    * double, then comma grouping — Java's `%,.2f` rounds half-UP, which
    * diverges on exact-tie doubles, so round via BigDecimal first.
    */
  private def fmtMoney(x: Double): String = {
    val bd = new java.math.BigDecimal(x)
      .setScale(2, java.math.RoundingMode.HALF_EVEN)
    val sym = new java.text.DecimalFormatSymbols(Locale.US)
    new java.text.DecimalFormat("#,##0.00", sym).format(bd)
  }

  /** Python `f"{n:,}"` for ints. */
  private def fmtGrouped(n: Long): String =
    String.format(Locale.US, "%,d", Long.box(n))

  /** `generate_medical_record` (formatters.py:51-105) — the full document,
    * indentation and draw order exactly as the reference's f-string.
    */
  def medicalRecord(r: PyRandom, now: LocalDate): String = {
    val name = twName(r)
    val gender = r.choice(IndexedSeq("男", "女"))
    val dob = dateOfBirth(r, now)
    val idNum = twId(r)
    val phone = twPhone(r)
    val address = twAddress(r)
    val recordNum = medicalRecordId(r)

    val visitDate = now.minusDays(r.randint(1, 365)).format(ymd)
    val hospital = r.choice(hospitals)
    val department = r.choice(medicalSpecialties)
    val doctor = "Dr. " + twName(r)

    val diagnosis = r.choice(IndexedSeq("感冒", "流感", "高血壓", "糖尿病", "氣喘", "胃炎", "關節炎", "偏頭痛"))
    val treatment = r.choice(IndexedSeq("藥物治療", "物理治療", "手術", "追蹤觀察", "飲食控制"))
    val medication = r.choice(IndexedSeq("抗生素", "止痛藥", "降血壓藥", "胰島素", "消炎藥"))

    // f-string evaluation order: the two inline paragraph() calls and the
    // two randint draws happen mid-interpolation, in textual order
    val complaint = paragraph(r, now, 1, 2, 0.1)
    val perDay = r.randint(1, 3)
    val perDose = r.randint(1, 3)
    val notes = paragraph(r, now, 1, 2, 0.2)

    s"""
        ====== 醫療記錄 ======
        病歷號: $recordNum
        日期: $visitDate
        醫院: $hospital - $department
        醫師: $doctor

        --- 病患資訊 ---
        姓名: $name
        性別: $gender
        出生日期: $dob
        身分證字號: $idNum
        電話: $phone
        地址: $address

        --- 診斷資訊 ---
        主訴: $complaint
        診斷: $diagnosis
        處置: $treatment
        處方: $medication，每日${perDay}次，每次${perDose}顆

        --- 注意事項 ---
        $notes
        ====================
        """
  }

  /** `generate_financial_document` (formatters.py:107-148). */
  def financialDocument(r: PyRandom, now: LocalDate): String = {
    val clientName = twName(r)
    val clientId = twId(r)
    val clientAddress = twAddress(r)
    val clientPhone = twPhone(r)
    val clientEmail = email(r, Some(clientName))

    val accountNumber = (1 to 14).map(_ => r.randint(0, 9)).mkString
    val card = creditCard(r)

    val merchants = IndexedSeq("百貨公司", "超市", "餐廳", "加油站", "線上購物", "電信繳費")
    val nTx = r.randint(3, 10)
    val transactions = (1 to nTx).map { _ =>
      val date = now.minusDays(r.randint(1, 30)).format(ymd)
      val merchant = r.choice(merchants)
      val amount = round2(r.uniform(100, 10000))
      s"$date | $merchant | NT$$${fmtMoney(amount)}"
    }

    val balance = round2(r.uniform(-5000, 50000))

    s"""
        ====== 帳戶對帳單 ======
        客戶姓名: $clientName
        身份證字號: $clientId
        聯絡地址: $clientAddress
        聯絡電話: $clientPhone
        電子郵件: $clientEmail

        帳戶號碼: $accountNumber
        信用卡號: $card

        --- 近期交易記錄 ---
        ${transactions.mkString("\n")}

        總結餘: NT$$${fmtMoney(balance)}
        =====================
        """
  }

  /** `generate_random_document` (formatters.py:150-159). */
  def randomDocument(r: PyRandom, now: LocalDate): String =
    r.randbelow(3) match {
      case 0 => medicalRecord(r, now)
      case 1 => financialDocument(r, now)
      case _ => paragraph(r, now, 10, 20, 0.4)
    }

  // ---- advanced_formatters.py ---------------------------------------------

  private val ymdCjk = DateTimeFormatter.ofPattern("yyyy'年'MM'月'dd'日'")

  /** `generate_contract_document` (advanced_formatters.py:12-70) — dict
    * literal draw order, then the one inline randint in 第三條.
    */
  def contractDocument(r: PyRandom, now: LocalDate): String = {
    val partyA = twName(r)
    val partyB = twName(r)
    val idA = twId(r)
    val idB = twId(r)
    val addrA = twAddress(r)
    val addrB = twAddress(r)
    val signDate = now.minusDays(r.randint(1, 365)).format(ymdCjk)
    val fee = fmtGrouped(r.randint(100000, 500000))

    s"""
                        合 約 書

        立合約書人：
        甲方：${partyA}（身分證字號：${idA}）
        住址：$addrA

        乙方：${partyB}（身分證字號：${idB}）
        住址：$addrB

        茲因雙方同意訂立本合約，共同遵守下列條款：

        第一條 合約目的
        甲方同意委託乙方進行專案開發，乙方同意接受委託。

        第二條 合約期間
        本合約自簽訂之日起生效，有效期間為一年，至${signDate}止。

        第三條 報酬及支付方式
        甲方應支付乙方總報酬新台幣${fee}元整。
        付款方式：簽約時支付30%，期中支付40%，驗收完成支付30%。

        第四條 保密條款
        雙方同意對本合約內容及執行過程中獲知之他方營業秘密負保密義務。

        第五條 違約處理
        任一方違反本合約條款時，應賠償他方因此所受之損害。

        第六條 管轄法院
        因本合約涉訟時，雙方同意以台灣台北地方法院為第一審管轄法院。

        立合約書人：

        甲方：___________________
        （簽名或蓋章）

        乙方：___________________
        （簽名或蓋章）

        中華民國 $signDate
        """
  }

  /** `generate_medical_report` (advanced_formatters.py:72-139) — patient +
    * test-result dict draws first, then the f-string's inline draws in
    * textual order.
    */
  def medicalReport(r: PyRandom, now: LocalDate): String = {
    val name = twName(r)
    val id = twId(r)
    val dob = dateOfBirth(r, now)
    val phone = twPhone(r)
    val address = twAddress(r)
    val recordNum = medicalRecordId(r)

    val bp = s"${r.randint(110, 140)}/${r.randint(70, 90)} mmHg"
    val hr = s"${r.randint(60, 100)} bpm"
    val glucose = s"${r.randint(70, 200)} mg/dL"
    val chol = s"${r.randint(150, 250)} mg/dL"

    val hospital = r.choice(hospitals)
    val visitDate = now.minusDays(r.randint(1, 30)).format(ymd)
    val doctor = twName(r)
    val dx1 = r.choice(IndexedSeq("上呼吸道感染", "高血壓", "第二型糖尿病", "退化性關節炎"))
    val dx2 = r.choice(IndexedSeq("輕度貧血", "高血脂症", "胃食道逆流"))
    val imaging = r.choice(IndexedSeq("胸部X光: 無明顯異常", "腹部超音波: 輕度脂肪肝", "心電圖: 竇性心律"))
    val rx1 = r.choice(IndexedSeq("Amoxicillin 500mg", "Lisinopril 10mg", "Metformin 500mg"))
    val perDay = r.randint(1, 3)
    val perDose = r.randint(1, 2)
    val rx2 = r.choice(IndexedSeq("維生素D補充劑", "益生菌", "止痛藥"))
    val advice = r.choice(IndexedSeq("建議定期追蹤血壓", "控制飲食與體重", "適度運動"))
    val followUp = now.plusDays(r.randint(14, 60)).format(ymd)

    // unused by the output but part of the reference's draw-free lookups
    val _ = id

    s"""
        ==============================
        $hospital 醫療報告
        ==============================

        病患資訊:
        姓名: $name
        病歷號: $recordNum
        出生日期: $dob
        聯絡電話: $phone
        住址: $address

        就診日期: $visitDate
        主治醫師: $doctor 醫師

        臨床診斷:
        - $dx1
        - $dx2

        檢驗結果:
        1. 血壓: $bp
        2. 心率: $hr
        3. 血糖: $glucose
        4. 膽固醇: $chol

        影像檢查:
        - $imaging

        處方:
        1. $rx1
           每日${perDay}次，每次${perDose}顆
        2. $rx2
           必要時服用

        醫囑:
        - $advice
        - 下次回診日期: $followUp

        [請參閱附件圖表分析]
        ==============================
        """
  }

  /** `generate_financial_statement` (advanced_formatters.py:141-181). */
  def financialStatement(r: PyRandom, now: LocalDate): String = {
    val name = twName(r)
    val id = twId(r)
    val account = (1 to 12).map(_ => r.randint(0, 9)).mkString
    val card = creditCard(r)

    val merchants = IndexedSeq("百貨公司", "超市", "餐廳", "加油站", "線上購物", "電信繳費")
    val transactions = (1 to 10).map { _ =>
      val date = now.minusDays(r.randint(1, 30)).format(ymd)
      val merchant = r.choice(merchants)
      val amount = round2(r.uniform(100, 10000))
      (date, merchant, amount)
    }

    val head = s"""
        客戶財務報表

        客戶資訊:
        姓名: $name
        身分證字號: $id
        帳戶號碼: $account
        信用卡號: $card

        交易記錄:
        日期         | 描述         | 金額 (NT$$)
        ------------|--------------|-----------
        """
    val rows = transactions
      .map { case (d, m, a) => s"$d | $m | ${fmtMoney(a)}\n" }.mkString
    val total = transactions.map(_._3).sum
    val balance = r.uniform(10000, 500000)
    head + rows + s"""
        總支出: NT$$ ${fmtMoney(total)}
        帳戶餘額: NT$$ ${fmtMoney(balance)}

        圖表分析:
        [請參閱附件支出分類圖]
        """
  }
}
