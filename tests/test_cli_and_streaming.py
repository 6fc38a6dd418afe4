"""CLI end-to-end (subprocess-free: main() in-process) and streaming
ingest smoke: drop files -> bronze accumulates -> denormalized whole."""

from __future__ import annotations

import shutil

import pytest

EGD = "/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml"


def test_cli_csv_single_file(tmp_path, spark):
    from greenbuttonengine_spark import cli

    out = tmp_path / "out.csv"
    rc = cli.main(["--filetype", "csv", "--out", str(out), "--sort", EGD])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("title,cost,quality,value")
    assert len(lines) == 21  # header + 20 readings


def test_cli_parquet_requires_out(tmp_path, capsys):
    from greenbuttonengine_spark import cli

    rc = cli.main(["--filetype", "parquet", EGD])
    assert rc == 2
    assert "requires --out" in capsys.readouterr().err


def test_streaming_ingest_accumulates(tmp_path, spark):
    from greenbuttonengine_spark.streaming import (
        read_accumulated_timeseries,
        start_ingest_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    shutil.copy(EGD, drop / "a.xml")
    q = start_ingest_stream(spark, str(drop), bronze, ckpt)
    try:
        q.processAllAvailable()
        ts1 = read_accumulated_timeseries(spark, bronze)
        n1 = ts1.count()
        assert n1 == 20

        # drop a second file -> accumulated whole grows (WASM ingest contract)
        shutil.copy(EGD, drop / "b.xml")
        q.processAllAvailable()
        ts2 = read_accumulated_timeseries(spark, bronze, include_source_file=True)
        assert ts2.count() == 2 * n1
        assert ts2.select("source_file").distinct().count() == 2
    finally:
        q.stop()
