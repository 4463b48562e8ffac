"""Golden-fixture parity for the preset handler library (raycdc/presets.py).

Expected rows are transcribed from the reference's own tests
(``/root/reference/contrib/handlers/*_test.go``) and the inputs are the
reference's golden fixtures (``contrib/handlers/testdata/*``), staged under
the object names the Go tests use (payment-month presets derive metadata
from the file name).  Every case asserts cell-for-cell equality with the
Go handler output — the ``assertEqual`` harness of ``handlers_test.go:33-75``.
"""

import os
import shutil

import pyarrow as pa
import pytest
import ray

from raycdc.presets import PRESETS
from raycdc.registry import Router
from raycdc.schema import TableSpec

FIX = "/root/reference/contrib/handlers/testdata"


def _run(preset_name: str, fixture: str, staged_name: str, tmp_path) -> list[list[str]]:
    p = str(tmp_path / staged_name)
    shutil.copyfile(os.path.join(FIX, fixture), p)
    ds = PRESETS[preset_name]().records([p])
    t = pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()], promote_options="default"
    )
    cols = sorted(
        (c for c in t.column_names if c[0] in "fc" and c[1:].isdigit()),
        key=lambda c: int(c[1:]),
    )
    return [[t[c][i].as_py() for c in cols] for i in range(t.num_rows)]


def test_sony_bank_statement(ray_session, tmp_path):
    # sony_bank_test.go:15-19
    assert _run(
        "sony_bank_statement", "sony_bank_statement.csv", "sony_bank_statement.csv", tmp_path
    ) == [
        ["2020-12-12", "積み立て定期預金へ振替", "", "", "10000", "661450"],
        ["2020-12-15", "振込 ソニー　タロウ", "", "220000", "", "881450"],
    ]


def test_rakuten_bank_statement(ray_session, tmp_path):
    # rakuten_bank_test.go:16-21 (the dash is U+FF0D, Go x/text's 0x817C)
    assert _run(
        "rakuten_bank_statement",
        "rakuten_bank_statement.csv",
        "rakuten_bank_statement.csv",
        tmp_path,
    ) == [
        ["2020-02-25", "-754", "184655", "ラクテンショウケンカブシキガイシャ （投資信託買付代金）"],
        ["2020-02-28", "8363", "193018", "ラクテンショウケンカブシキガイシャ （自動スイ－プ）"],
        ["2020-03-03", "12033", "205051", "ラクテンショウケンカブシキガイシャ （自動スイ－プ）"],
    ]


def test_smbc_statement_wareki(ray_session, tmp_path):
    # smbc_test.go:55-63
    assert _run(
        "smbc_statement", "smbc_statement.csv", "smbc_statement.csv", tmp_path
    ) == [
        ["2019-12-04", "10389", "", "カ)ビユ-カ-ド", "124001"],
        ["2019-12-21", "", "160000", "振込　スミトモ タロウ", "284001"],
        ["2019-12-26", "80980", "", "ミツイスミトモカ-ド (カ", "203021"],
    ]


def test_smbc_statement_gregorian_unpadded(ray_session, tmp_path):
    # smbc_test.go:78-90: 7-column vintage, unpadded dates like 2020/10/5
    assert _run(
        "smbc_statement", "smbc_statement2.csv", "smbc_statement2.csv", tmp_path
    ) == [
        ["2020-10-12", "-12200", "", "ミツイスミトモカ-ド (カ", "172991", "", ""],
        ["2020-10-05", "-1900", "", "ミツイスミトモカ-ド (カ", "185191", "", ""],
        ["2020-09-28", "-12571", "", "ミツイスミトモカ-ド (カ", "187091", "", ""],
        ["2020-09-28", "-15000", "", "ミツイスミトモカ-ド (カ", "199662", "", ""],
        ["2020-09-28", "-194873", "", "ミツイスミトモカ-ド (カ", "214662", "", ""],
        ["2020-09-17", "", "240000", "振込　スミトモタロウ", "409535", "", ""],
    ]


def test_smbc_card_statement(ray_session, tmp_path):
    # smbc_card_test.go:15-20: line filter (5th char '/'), month from name
    assert _run(
        "smbc_card_statement", "smbc_card_statement.csv", "202012.csv", tmp_path
    ) == [
        ["2020-11-29", "Ａｍａｚｏｎ　Ｄｏｗｎｌｏａｄｓ", "288", "", "", "", "", "2020-12-01"],
        [
            "2020-11-14", "UBER *EATS (HELP.UBER.COM)", "1650", "", "", "",
            "1650.00　JPY　1.0000　11 16", "2020-12-01",
        ],
        ["2020-11-30", "ゴールドカード年会費", "", "", "", "5500", "（うち消費税等５００円）", "2020-12-01"],
    ]


def test_smbc_card_statement2(ray_session, tmp_path):
    # smbc_card_test.go:37-48: multiple per-card blocks in one export
    assert _run(
        "smbc_card_statement", "smbc_card_statement2.csv", "202212.csv", tmp_path
    ) == [
        ["2022-10-31", "インターネットイニシアティブ", "5989", "", "", "", "", "2022-12-01"],
        ["2022-11-01", "ＡＭＡＺＯＮ．ＣＯ．ＪＰ", "17673", "", "", "", "", "2022-12-01"],
        ["2022-11-05", "ＡＭＡＺＯＮ．ＣＯ．ＪＰ", "2490", "", "", "", "", "2022-12-01"],
        ["2022-11-05", "Ａｍａｚｏｎ　Ｄｏｗｎｌｏａｄｓ", "594", "", "", "", "", "2022-12-01"],
        ["2022-11-13", "ＡＭＡＺＯＮ．ＣＯ．ＪＰ", "-500", "", "", "", "返品", "2022-12-01"],
        ["2022-11-13", "ＡＭＡＺＯＮ．ＣＯ．ＪＰ", "-17673", "", "", "", "返品", "2022-12-01"],
        ["2022-11-30", "Ａｍａｚｏｎ　Ｄｏｗｎｌｏａｄｓ", "673", "", "", "", "", "2022-12-01"],
        [
            "2022-11-29", "ABC-COMPANY (SERVICE )", "3507", "", "", "",
            "24.90　USD　140.873　11 30", "2022-12-01",
        ],
    ]


def test_rakuten_card_statement(ray_session, tmp_path):
    # rakuten_card_test.go:16-21: UTF-8 BOM + LazyQuotes + enavi month
    assert _run(
        "rakuten_card_statement", "rakuten_card_statement.csv", "enavi202012(1234).csv", tmp_path
    ) == [
        ["2020-12-03", "foo", "本人", "1回払い", "2750", "0", "2750", "2750", "0", "*", "2020-12-01"],
        ["2020-11-20", "bar", "家族", "1回払い", "9968", "0", "9968", "9968", "0", "*", "2020-12-01"],
        ["2020-11-20", "baz", "本人", "1回払い", "1570", "0", "1570", "1570", "0", "*", "2020-12-01"],
    ]


def test_amex_statement_xls(ray_session, tmp_path):
    # amex_test.go:16-21: legacy OLE2 BIFF8 workbook, date-row filter
    assert _run(
        "amex_statement", "amex_statement.xls", "2022-07.xls", tmp_path
    ) == [
        ["2022-06-19", "2022-06-20", "GOOGLE *DOMAINS", "TARO AMEX", "1760", "", "", "", "2022-07-01"],
        ["2022-05-29", "2022-05-29", "IWANTMYNAME IWANTMYNAME", "TARO AMEX", "129", "1.00 USD", "129", "", "2022-07-01"],
        ["2022-05-29", "2022-05-29", "IWANTMYNAME IWANTMYNAME", "", "-129", "1.00 USD", "129", "", "2022-07-01"],
    ]


def test_amex_statement_csv(ray_session, tmp_path):
    # amex_csv_test.go:16-22: column shift f4<-clean(f5), f5<-f6, f6<-f7
    assert _run(
        "amex_statement_csv", "amex_statement.csv", "2023-08.csv", tmp_path
    ) == [
        ["2023-07-10", "2023-07-10", "前回分口座振替金額", "TARO AMEX", "-4048", "", "", "", "2023-08-01"],
        ["2023-07-08", "2023-07-09", "UBER EATS", "TARO AMEX", "1408", "", "", "", "2023-08-01"],
        ["2023-07-03", "2023-07-04", "GITHUB, INC.", "TARO AMEX", "-1431", "9.68 USD", "147.831", "", "2023-08-01"],
        ["2023-07-02", "2023-07-03", "GITHUB, INC.", "TARO AMEX", "1479", "10.00 USD", "147.9", "", "2023-08-01"],
    ]


def test_sbi_securities_global_banking_statement(ray_session, tmp_path):
    # sbi_securities_test.go:16-21: 6 preamble lines, reorder to 6 columns
    assert _run(
        "sbi_securities_global_banking_statement",
        "sbi_securities_global_banking_statement.csv",
        "sbi_securities_global_banking_statement.csv",
        tmp_path,
    ) == [
        ["2022-12-30", "分配金", "米ドル", "BND 銘柄名:VG TBM", "", "0.64"],
        ["2022-12-28", "出金", "米ドル", "米国株式TECL外国源泉税の過日徴収", "3.58", ""],
        ["2022-11-18", "入金", "米ドル", "米国BND211229配当税還付 税減額日:220311", "", "0.07"],
        ["2022-10-03", "入金", "米ドル", "住信SBIネット銀行から外貨入金", "", "100.00"],
    ]


def test_sbi_securities_global_execution_history(ray_session, tmp_path):
    # sbi_securities_test.go:40-44
    assert _run(
        "sbi_securities_global_execution_history",
        "sbi_securities_global_execution_history.csv",
        "sbi_securities_global_execution_history.csv",
        tmp_path,
    ) == [
        ["2022-12-02", "グローバルＸ SP 500 カバードコール50 ETF", "XYLG", "NYSE Arca",
         "米国株式", "成行", "現買", "特定", "30", "26.4100", "2022-12-06", "796.22"],
        ["2022-01-11", "iシェアーズ コア　米国高配当株 ETF", "HDV", "NYSE Arca",
         "米国株式", "成行", "現売", "特定", "29", "102.4450", "2022-01-13", "2956.21"],
    ]


def test_sbi_sumishin_net_bank_statement(ray_session, tmp_path):
    # sbi_sumishin_net_bank_test.go:16-19
    assert _run(
        "sbi_sumishin_net_bank_statement",
        "sbi_sumishin_net_bank_statement.csv",
        "sbi_sumishin_net_bank_statement.csv",
        tmp_path,
    ) == [
        ["2020-12-25", "普通　円　フィンビーエゴマ", "220", "", "29447", "-"],
        ["2020-12-25", "振込＊キュウヨ．フリコム．ジヤパン（ド", "", "29667", "29667", "-"],
    ]


# ---------------------------------------------------------------------------
# error semantics + registry integration


def test_wrong_object_path_errors(ray_session, tmp_path):
    """Preprocessor parity: a file name without the payment-month group
    fails the load (smbc_card.go:48-51)."""
    p = str(tmp_path / "not-a-month.csv")
    shutil.copyfile(os.path.join(FIX, "smbc_card_statement.csv"), p)
    ds = PRESETS["smbc_card_statement"]().records([p])
    with pytest.raises(Exception, match="wrong object path"):
        ds.materialize()


def test_unparseable_date_errors(ray_session, tmp_path):
    """Projector parity: an unparseable date cell fails the load
    (sony_bank.go:16-19), it is not silently nulled."""
    p = str(tmp_path / "sony_bank_statement.csv")
    body = '"h","s","i","in","out","bal"\n"notadate","x","","1","2","3"\n'
    with open(p, "w", encoding="cp932") as f:
        f.write(body)
    ds = PRESETS["sony_bank_statement"]().records([p])
    with pytest.raises(Exception, match="unparseable date"):
        ds.materialize()


def test_presets_register_with_router(ray_session, tmp_path):
    """MustAddHandlers flow (handlers.go:54-58): presets plug into the
    Router and route by their object-path patterns."""
    router = Router()
    for name in ("sony_bank_statement", "smbc_card_statement"):
        router.add_handler(
            PRESETS[name]().handler(str(tmp_path / name), TableSpec())
        )
    routed = router.route(
        ["in/sony_bank_statement.csv", "in/202012.csv", "in/other.txt"]
    )
    assert routed["sony_bank_statement"] == ["in/sony_bank_statement.csv"]
    assert routed["smbc_card_statement"] == ["in/202012.csv"]


def test_all_presets_constructible():
    seen = set()
    for name, factory in PRESETS.items():
        p = factory()
        assert p.name == name
        assert p.pattern and callable(p.projector)
        seen.add(name)
    assert len(seen) == 10


def test_preset_cli_list_run_and_errors(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    assert main(["preset"]) == 0
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "smbc_card_statement" in listed["presets"]

    src = str(tmp_path / "202012.csv")
    shutil.copyfile(os.path.join(FIX, "smbc_card_statement.csv"), src)
    out_dir = str(tmp_path / "out")
    assert main(["preset", "smbc_card_statement", "--paths", src, "--out", out_dir]) == 0
    import pyarrow.parquet as pq

    t = pq.read_table(out_dir)
    assert t.num_rows == 3 and "f7" in t.column_names

    assert main(["preset", "nope", "--paths", src]) == 2
    assert main(["preset", "smbc_card_statement", "--paths", str(tmp_path / "x.txt")]) == 2
