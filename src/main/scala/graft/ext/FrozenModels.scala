package graft.ext

/** Frozen trained models for the oracle-gated APPLY halves (q178/q179 —
  * the q176 BPE pattern applied to ANN): the centroids/codebooks below
  * are the output of the repo's own deterministic trainers
  * ([[Similarity.fitCellCentroids]] nCells=8, [[Similarity.fitPqCodebooks]]
  * subspaces=8 codebookSize=8, both maxTrainRows=2048) over
  * testdata sf0.01 embeddings, quantized to integer ten-thousandths and
  * pinned as data (regenerate with [[FrozenModelGen]]). Training stays
  * rows-only by design (q48/q94); everything DOWNSTREAM of the frozen
  * artifact — cell/code assignment, ADC, exact re-rank — is pure,
  * integer-exact, and hash-gated against the DuckDB oracle, which
  * receives the SAME table via [[ivfCentroidValues]]/[[pqCodebookValues]]
  * (Scala-side constants interpolated into oracle SQL, the house
  * lock-step discipline).
  */
object FrozenModels {
  val ivfCentroids: Array[Array[Long]] = Array(
    Array(205L, 195L, -502L, -28L, 2L, 328L, -241L, -114L, -645L, 51L, 306L, 461L, 578L, -417L, 52L, -420L, -86L, 55L, 133L, -319L, 64L, 186L, -657L, 0L, 430L, 708L, -110L, -32L, 49L, 383L, -105L, -161L, 527L, -103L, -591L, 256L, -127L, -344L, 342L, -921L, 188L, -560L, -519L, -624L, -21L, 324L, -308L, 20L, -67L, -689L, 136L, -365L, -194L, 38L, -380L, -85L, 437L, 132L, 386L, 132L, 318L, 119L, -634L, -206L),
    Array(104L, -60L, 91L, 195L, 109L, 348L, -51L, 1202L, -200L, -354L, 178L, -413L, -183L, -518L, -543L, 63L, 78L, -389L, -214L, 405L, -577L, -280L, 157L, 32L, -412L, 146L, -247L, 68L, 175L, -319L, 391L, 33L, 120L, 41L, 616L, 498L, -645L, 328L, -81L, 706L, -454L, -94L, -62L, 8L, -612L, -95L, -467L, 47L, -106L, 350L, 353L, -245L, -65L, -117L, 211L, -854L, 304L, -82L, -45L, -606L, -331L, -47L, -122L, -352L),
    Array(148L, 45L, 172L, 397L, -171L, 682L, 168L, -233L, -186L, 636L, 292L, 841L, -209L, 366L, 3L, 124L, 478L, 213L, -205L, -353L, -374L, -104L, -28L, -146L, 78L, 82L, 99L, 295L, 482L, -632L, 472L, -330L, -367L, -373L, -131L, 274L, -95L, -416L, 52L, -66L, -24L, 170L, 122L, -111L, 49L, -618L, -12L, 984L, -142L, 249L, -305L, -108L, 268L, -283L, 274L, 595L, -192L, 16L, -417L, -871L, -275L, 28L, -254L, -97L),
    Array(183L, -60L, 38L, 30L, 468L, 71L, -206L, 274L, -34L, 191L, 488L, -67L, -389L, 213L, 229L, 227L, 68L, 339L, -102L, 15L, -7L, -168L, 28L, 573L, -258L, -320L, 26L, 269L, -28L, 288L, -103L, -488L, 188L, 224L, 74L, -129L, -102L, 546L, 115L, 454L, -967L, -39L, -15L, 194L, 62L, -313L, 283L, -88L, 565L, -604L, 701L, 182L, -390L, 95L, -14L, 398L, -147L, 290L, 48L, 340L, 538L, -328L, 35L, 446L),
    Array(-170L, 585L, -131L, -331L, 191L, 49L, -116L, -230L, 287L, -655L, -166L, -273L, -95L, 431L, -46L, -80L, 456L, 158L, -7L, -84L, 401L, -63L, 815L, -920L, 161L, -252L, 133L, 16L, -681L, -57L, -344L, 103L, -144L, -284L, -54L, 31L, 368L, 299L, 294L, -297L, 171L, 452L, -195L, -103L, 3L, 73L, 155L, -135L, -311L, -69L, -297L, -272L, -77L, 204L, 573L, -607L, -184L, 55L, -382L, 200L, -94L, -14L, 750L, -118L),
    Array(-471L, -718L, 88L, -78L, 558L, 235L, -702L, 101L, 170L, 340L, -450L, 81L, -16L, -539L, 241L, 252L, -78L, -386L, 168L, -219L, 301L, 197L, 262L, -394L, -426L, 920L, 297L, -44L, -129L, -527L, 287L, 364L, 253L, -256L, 513L, -981L, -217L, -68L, 223L, -27L, 93L, -196L, 93L, 87L, 132L, 376L, 30L, 268L, -133L, -299L, -344L, 396L, -1L, -112L, -672L, -130L, 190L, 132L, 523L, 253L, -498L, 562L, -22L, -626L),
    Array(41L, -311L, 330L, -110L, 52L, -605L, -113L, 326L, 137L, 242L, -256L, -113L, -31L, -207L, 408L, 182L, -191L, -258L, 428L, 412L, -165L, -367L, -364L, 118L, 281L, -77L, -323L, 494L, 101L, 441L, 216L, 507L, 159L, 243L, -111L, 78L, 290L, -112L, -873L, -205L, 457L, -214L, 208L, 612L, -658L, 174L, 213L, -398L, -398L, 59L, 272L, 355L, 471L, -93L, 237L, 2L, 311L, -414L, -812L, -193L, 206L, -54L, -98L, 123L),
    Array(100L, -123L, 229L, -468L, -490L, -446L, -245L, -659L, 255L, -497L, 73L, -194L, 226L, 788L, -440L, 109L, -533L, 719L, -259L, 212L, 42L, 928L, 87L, 40L, -27L, -2L, 21L, -305L, -8L, 374L, -325L, -485L, -63L, -92L, 141L, 22L, 33L, -518L, -115L, 234L, 542L, -569L, 424L, -197L, 163L, 485L, -27L, -146L, 262L, 248L, 134L, -82L, 700L, -95L, 36L, 398L, -312L, -363L, 469L, -11L, -11L, 260L, 178L, -398L),
  )
  val pqCodebooks: Array[Array[Array[Long]]] = Array(
    Array(
      Array(378L, 243L, -391L, 1075L, 562L, 211L, -563L, -1340L),
      Array(-722L, -224L, -324L, 704L, -487L, 408L, 1310L, 463L),
      Array(832L, -924L, 636L, 621L, 66L, 1194L, -1054L, 569L),
      Array(1076L, -185L, 313L, -1031L, 1099L, 313L, 686L, 132L),
      Array(253L, 822L, -1007L, -610L, -869L, 404L, -563L, 907L),
      Array(-1182L, -807L, -83L, -564L, 915L, 222L, -999L, -106L),
      Array(215L, -287L, 323L, 158L, 429L, -1820L, -276L, 906L),
      Array(-224L, 846L, 1056L, -816L, -695L, -167L, 102L, -705L),
    ),
    Array(
      Array(-692L, 438L, 1394L, 15L, 481L, 56L, -114L, -803L),
      Array(-153L, -603L, -123L, -1725L, -740L, -395L, -873L, -145L),
      Array(-106L, 544L, -312L, 1580L, -800L, -88L, -1281L, 292L),
      Array(-816L, -766L, 1026L, 59L, -513L, 346L, 584L, 1288L),
      Array(517L, -1067L, -153L, -54L, 913L, 753L, -350L, 1082L),
      Array(218L, 204L, -397L, 139L, 539L, -1721L, 698L, -197L),
      Array(-687L, 1182L, -992L, 171L, 689L, 887L, 588L, 304L),
      Array(1080L, -28L, 201L, 100L, -948L, 476L, 655L, -924L),
    ),
    Array(
      Array(-119L, 379L, -365L, 354L, 580L, -133L, -1564L, -100L),
      Array(-840L, -1626L, -1099L, -155L, -274L, 111L, -239L, -180L),
      Array(798L, 115L, 84L, -614L, -147L, 87L, 605L, -1992L),
      Array(1264L, -358L, 335L, -244L, -1025L, -420L, -411L, 1041L),
      Array(707L, 717L, -194L, -1358L, 1071L, 315L, 575L, 732L),
      Array(192L, 517L, -658L, 1414L, 10L, -433L, 764L, -35L),
      Array(-482L, -662L, 1282L, 389L, 421L, -65L, 321L, 441L),
      Array(-846L, 1473L, 368L, -288L, -620L, 769L, 173L, -418L),
    ),
    Array(
      Array(959L, 1146L, -504L, 124L, -115L, 1083L, 190L, 721L),
      Array(455L, -1179L, -283L, 339L, -466L, -833L, 824L, 236L),
      Array(625L, 10L, -384L, 149L, 980L, 485L, 775L, -1570L),
      Array(447L, 76L, 1565L, 440L, 363L, 490L, -636L, 566L),
      Array(-1153L, -476L, 423L, -878L, -472L, 538L, 715L, -510L),
      Array(-123L, 1682L, 237L, -331L, -40L, -1468L, 463L, 221L),
      Array(-1698L, -166L, -713L, 413L, 994L, 208L, -465L, 354L),
      Array(-25L, 224L, -733L, 483L, -940L, -293L, -1325L, -693L),
    ),
    Array(
      Array(113L, -273L, -392L, 355L, -964L, -613L, 1499L, -471L),
      Array(398L, 613L, 585L, 866L, 214L, 111L, 543L, 1261L),
      Array(311L, -1630L, -385L, -27L, 753L, -374L, -430L, 464L),
      Array(840L, 299L, 835L, -732L, -407L, 1407L, 563L, -479L),
      Array(-1726L, -166L, 110L, -220L, 455L, 658L, -131L, -566L),
      Array(24L, -384L, 547L, -1815L, 12L, -1094L, -179L, 17L),
      Array(-219L, -11L, -735L, 186L, -813L, 1022L, -1090L, 356L),
      Array(691L, 826L, 74L, 795L, 340L, -1066L, -729L, -849L),
    ),
    Array(
      Array(160L, -1424L, -783L, 264L, -1116L, 387L, 329L, 409L),
      Array(-970L, -95L, -642L, -1255L, -167L, 25L, -1331L, 509L),
      Array(1380L, -180L, 219L, -1237L, 518L, 235L, 413L, 1114L),
      Array(-1130L, -105L, 173L, 224L, -429L, -1281L, 396L, 322L),
      Array(-27L, 1597L, -890L, -386L, 419L, -484L, 164L, 245L),
      Array(-255L, -917L, 386L, 572L, 1089L, 710L, -30L, 283L),
      Array(205L, 454L, -67L, 877L, -556L, 683L, 724L, -1404L),
      Array(872L, -243L, 1329L, 21L, -741L, 192L, -928L, -598L),
    ),
    Array(
      Array(205L, -1522L, -565L, 132L, 143L, 1124L, -256L, -131L),
      Array(117L, 839L, 1259L, -311L, 125L, 626L, -353L, -516L),
      Array(-185L, 188L, 602L, 967L, 986L, -707L, 604L, 721L),
      Array(-135L, -1410L, 795L, -25L, -461L, -806L, -715L, 204L),
      Array(-233L, 40L, -874L, -763L, -692L, -143L, 1212L, -454L),
      Array(-1418L, 200L, -177L, 1113L, -1044L, 529L, 21L, -484L),
      Array(-678L, 259L, -764L, -510L, 1206L, -786L, -496L, -138L),
      Array(1724L, 164L, -182L, -731L, 119L, 123L, 170L, 301L),
    ),
    Array(
      Array(637L, 442L, 1163L, -3L, 799L, 1097L, -816L, -324L),
      Array(175L, 1203L, 34L, -1279L, -841L, 411L, -1L, -1087L),
      Array(-187L, -570L, -970L, -1333L, 779L, -652L, -21L, -310L),
      Array(357L, 760L, -777L, 419L, 466L, -671L, -801L, 1217L),
      Array(-362L, 169L, -573L, 1080L, 273L, -178L, 1526L, -164L),
      Array(254L, -806L, 411L, 814L, -490L, -402L, -566L, -1206L),
      Array(64L, -829L, -1033L, -111L, -563L, 1430L, 234L, -23L),
      Array(-477L, -24L, 1112L, -339L, -629L, -297L, 476L, 890L),
    ),
  )

  /** DuckDB VALUES rows `(cell, c DOUBLE[])` for [[ivfCentroids]]. */
  def ivfCentroidValues: String =
    ivfCentroids.zipWithIndex.map { case (c, i) =>
      s"(${i}, CAST([${c.mkString(", ")}] AS DOUBLE[]))"
    }.mkString(",\n          ")

  /** DuckDB VALUES rows `(s, j, c DOUBLE[])` for [[pqCodebooks]].
    * `j` is 0-based — the kernel emits 0-based centroid indices as codes.
    */
  def pqCodebookValues: String =
    pqCodebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) =>
        s"(${s}, ${j}, CAST([${c.mkString(", ")}] AS DOUBLE[]))"
      }
    }.mkString(",\n          ")
}
