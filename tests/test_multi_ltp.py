"""SURVEY §7 / r13 VERDICT item 7: per-usage-point LocalTimeParameters
behind ``strict_single_ltp=False``.

Reference parity (lib.rs:42-50) stays the DEFAULT: a file with two LTP
rows errors whole-file.  Under the flag, LTPs resolve per usage-point
href scope (file-global '' fallback), so a multi-utility export with
one tz per usage point processes — each reading shifted by ITS usage
point's offset.
"""

from __future__ import annotations

import pytest

_HEADER = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom" xmlns:espi="http://naesb.org/espi">
  <id>urn:uuid:feed</id>
  <title>MultiLTP</title>
  <updated>2024-01-01T00:00:00Z</updated>
"""

_TS = "2024-01-01T00:00:00Z"
_BASE = "https://synth.example/espi/1_1/resource"

_RT_FIELDS = {
    "accumulationBehaviour": 4, "commodity": 7, "currency": 124,
    "dataQualifier": 12, "flowDirection": 1, "kind": 12,
    "powerOfTenMultiplier": 0, "uom": 72,
}


def _entry(title, self_href, self_type, content, related=()):
    links = [f'<link rel="self" href="{self_href}" type="{self_type}"/>']
    for href, typ in related:
        links.append(f'<link rel="related" href="{href}" type="{typ}"/>')
    return (
        "  <entry>\n"
        f"    <content>{content}</content>\n"
        f"    <id>urn:uuid:{abs(hash(self_href)) % 10**12}</id>\n"
        f"    <title>{title}</title>\n"
        f"    <published>{_TS}</published>\n"
        f"    <updated>{_TS}</updated>\n"
        + "\n".join("    " + ln for ln in links)
        + "\n  </entry>\n"
    )


def _ltp(tz_offset):
    return (
        "<espi:LocalTimeParameters>"
        "<espi:dstEndRule>FFFFFFFF</espi:dstEndRule>"
        "<espi:dstOffset>3600</espi:dstOffset>"
        "<espi:dstStartRule>FFFFFFFF</espi:dstStartRule>"
        f"<espi:tzOffset>{tz_offset}</espi:tzOffset>"
        "</espi:LocalTimeParameters>"
    )


def _series(up: str, mr_id: str, rt_id: str, start: int, value: int) -> str:
    mr = f"{_BASE}/UsagePoint/{up}/MeterReading/{mr_id}"
    rt = f"{_BASE}/ReadingType/{rt_id}"
    block = (
        "<espi:IntervalBlock><espi:interval>"
        "<espi:duration>3600</espi:duration><espi:start>0</espi:start>"
        "</espi:interval>"
        "<espi:IntervalReading>"
        "<espi:timePeriod><espi:duration>3600</espi:duration>"
        f"<espi:start>{start}</espi:start></espi:timePeriod>"
        f"<espi:value>{value}</espi:value>"
        "</espi:IntervalReading></espi:IntervalBlock>"
    )
    rt_xml = (
        "<espi:ReadingType>"
        + "".join(f"<espi:{k}>{v}</espi:{k}>" for k, v in sorted(_RT_FIELDS.items()))
        + "</espi:ReadingType>"
    )
    return (
        _entry("Meter Reading", mr, "espi-entry/MeterReading",
               "<espi:MeterReading/>", related=[(rt, "espi-entry/ReadingType")])
        + _entry("Reading Type", rt, "espi-entry/ReadingType", rt_xml)
        + _entry(f"Usage {up}", f"{mr}/IntervalBlock/IB1",
                 "espi-entry/IntervalBlock", block)
    )


TZ_A, TZ_B, START = 3600, -7200, 1700000000


def _two_up_feed() -> str:
    xml = [_HEADER]
    xml.append(_entry("DST A", f"{_BASE}/UsagePoint/UPA/LocalTimeParameters/001",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_A)))
    xml.append(_entry("DST B", f"{_BASE}/UsagePoint/UPB/LocalTimeParameters/002",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_B)))
    xml.append(_series("UPA", "M1", "RT1", START, 11))
    xml.append(_series("UPB", "M2", "RT2", START, 22))
    xml.append("</feed>\n")
    return "".join(xml)


@pytest.fixture(scope="module")
def two_up_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("multiltp") / "two_up.xml"
    p.write_text(_two_up_feed())
    return str(p)


def test_strict_default_errors_on_two_ltps(spark, two_up_file):
    from greenbuttonengine_spark.espi import timeseries_from_files

    ts, errors = timeseries_from_files(spark, two_up_file)
    assert ts.count() == 0
    errs = errors.collect()
    assert len(errs) == 1
    assert errs[0].error == (
        "Input with multiple LocalTimeParameters is currently unsupported."
    )


def test_flag_resolves_ltp_per_usage_point(spark, two_up_file):
    from greenbuttonengine_spark.espi import timeseries_from_files

    ts, errors = timeseries_from_files(
        spark, two_up_file, strict_single_ltp=False
    )
    assert errors.count() == 0
    rows = {r.title: r for r in ts.collect()}
    assert set(rows) == {"Usage UPA", "Usage UPB"}
    # each reading shifted by ITS usage point's tz (no-DST rules)
    assert rows["Usage UPA"].time_period_start_unix == START + TZ_A
    assert rows["Usage UPB"].time_period_start_unix == START + TZ_B
    assert rows["Usage UPA"].value == 11.0
    assert rows["Usage UPB"].value == 22.0


def test_flag_single_global_ltp_identical_rows(spark, tmp_path):
    """A single file-global LTP (the reference shape, href not under
    any UsagePoint) must produce IDENTICAL rows under both modes —
    the '' scope fallback covers every usage point."""
    xml = [_HEADER]
    xml.append(_entry("DST", f"{_BASE}/LocalTimeParameters/001",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_A)))
    xml.append(_series("UPA", "M1", "RT1", START, 7))
    xml.append(_series("UPB", "M2", "RT2", START + 60, 9))
    xml.append("</feed>\n")
    p = tmp_path / "global.xml"
    p.write_text("".join(xml))

    from greenbuttonengine_spark.espi import timeseries_from_files

    strict_ts, strict_err = timeseries_from_files(spark, str(p))
    flag_ts, flag_err = timeseries_from_files(
        spark, str(p), strict_single_ltp=False
    )
    assert strict_err.count() == 0 and flag_err.count() == 0
    key = lambda r: (r.title, r.time_period_start_unix, r.value)  # noqa: E731
    assert sorted(map(key, strict_ts.collect())) == sorted(
        map(key, flag_ts.collect())
    )


def test_flag_missing_ltp_still_errors(spark, tmp_path):
    """No LTP anywhere: both modes error the file (Missing...)."""
    xml = [_HEADER, _series("UPA", "M1", "RT1", START, 7), "</feed>\n"]
    p = tmp_path / "noltp.xml"
    p.write_text("".join(xml))

    from greenbuttonengine_spark.espi import timeseries_from_files

    for strict in (True, False):
        ts, errors = timeseries_from_files(
            spark, str(p), strict_single_ltp=strict
        )
        assert ts.count() == 0
        assert [e.error for e in errors.collect()] == [
            "Missing LocalTimeParameters."
        ]


def test_flag_same_scope_duplicate_still_errors(spark, tmp_path):
    """Two LTPs in the SAME usage-point scope stay ambiguous under the
    flag — fail the file."""
    xml = [_HEADER]
    xml.append(_entry("DST A", f"{_BASE}/UsagePoint/UPA/LocalTimeParameters/001",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_A)))
    xml.append(_entry("DST A2", f"{_BASE}/UsagePoint/UPA/LocalTimeParameters/002",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_B)))
    xml.append(_series("UPA", "M1", "RT1", START, 7))
    xml.append("</feed>\n")
    p = tmp_path / "dup.xml"
    p.write_text("".join(xml))

    from greenbuttonengine_spark.espi import timeseries_from_files

    ts, errors = timeseries_from_files(spark, str(p), strict_single_ltp=False)
    assert ts.count() == 0
    assert [e.error for e in errors.collect()] == [
        "Multiple LocalTimeParameters in one usage-point scope."
    ]


def test_cli_multi_ltp_flag(spark, two_up_file, tmp_path, capsys):
    """gbcli --multi-ltp converts a two-usage-point export that the
    default (reference-parity) invocation rejects."""
    from greenbuttonengine_spark.cli import main

    out = str(tmp_path / "out.csv")
    # default: reference parity -> the file errors, output is empty
    assert main(["--filetype=csv", f"--out={out}", "--engine=spark",
                 two_up_file]) == 0
    err = capsys.readouterr().err
    assert "multiple LocalTimeParameters" in err
    with open(out) as fh:
        assert len(fh.read().strip().splitlines()) <= 1  # header only

    assert main(["--filetype=csv", f"--out={out}", "--multi-ltp",
                 two_up_file]) == 0
    with open(out) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 3  # header + one reading per usage point
    body = "\n".join(lines[1:])
    assert str(START + TZ_A) in body and str(START + TZ_B) in body


def test_cli_multi_ltp_rejects_local_engine(two_up_file):
    import pytest as _pytest

    from greenbuttonengine_spark.cli import main

    with _pytest.raises(SystemExit, match="multi-ltp needs the Spark"):
        main(["--filetype=csv", "--multi-ltp", "--engine=local", two_up_file])


def test_flag_bare_usage_point_href_scopes_to_its_usage_point(spark, tmp_path):
    """r14 ADVICE item 4: an LTP whose href ends exactly at
    .../UsagePoint/{id} (no child segment) must scope to THAT usage
    point, not file-global.  Discriminating shape: a bare-UPA LTP plus
    a genuine file-global LTP — under the old trailing-slash-only
    regex both landed in the '' scope and the file errored as a
    duplicate; correctly scoped, UPA readings shift by the UPA tz and
    UPB readings fall back to the global tz."""
    xml = [_HEADER]
    xml.append(_entry("DST UPA", f"{_BASE}/UsagePoint/UPA",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_A)))
    xml.append(_entry("DST global", f"{_BASE}/LocalTimeParameters/001",
                      "espi-entry/LocalTimeParameters", _ltp(TZ_B)))
    xml.append(_series("UPA", "M1", "RT1", START, 7))
    xml.append(_series("UPB", "M2", "RT2", START, 9))
    xml.append("</feed>\n")
    p = tmp_path / "bare_up.xml"
    p.write_text("".join(xml))

    from greenbuttonengine_spark.espi import timeseries_from_files

    ts, errors = timeseries_from_files(spark, str(p), strict_single_ltp=False)
    assert errors.count() == 0
    rows = {r.title: r for r in ts.collect()}
    assert set(rows) == {"Usage UPA", "Usage UPB"}
    assert rows["Usage UPA"].time_period_start_unix == START + TZ_A
    assert rows["Usage UPB"].time_period_start_unix == START + TZ_B


def test_cli_multi_ltp_committed_golden(spark, tmp_path, capsys):
    """r14 VERDICT item 6: committed end-to-end golden — a fixture
    with two usage points under DIFFERING tz/DST scopes (UPA:
    tz=-18000 with the real US DST rules 360E2000/B40E2000, UPB:
    tz=+3600 no-DST) byte-checked through the full CLI.  Values
    hand-verified: UPA winter shifts -18000, UPA summer -18000+3600
    (inside the DST window), UPB always +3600.  The strict default
    must keep rejecting the file (reference parity, lib.rs:42-50)."""
    import pathlib

    from greenbuttonengine_spark.cli import main

    here = pathlib.Path(__file__).parent / "goldens"
    fixture = str(here / "multi_ltp_two_scopes.xml")
    golden = (here / "multi_ltp_two_scopes.golden.csv").read_text()

    out = str(tmp_path / "out.csv")
    assert main(["--filetype=csv", f"--out={out}", "--multi-ltp", fixture]) == 0
    assert open(out).read() == golden

    # strict default: whole-file error, header-only output
    assert main(["--filetype=csv", f"--out={out}", "--engine=spark",
                 fixture]) == 0
    assert "multiple LocalTimeParameters" in capsys.readouterr().err
    with open(out) as fh:
        assert len(fh.read().strip().splitlines()) <= 1
