"""EOP/SW updater CLI (reference: utils/eop_data_updater.cpp,
sw_data_updater.cpp — download latest product, regenerate the builtin
snapshot).  Fetchers are mocked: the suite runs with zero egress."""

import numpy as np
import pytest

from heyoka_tpu import eop_sw
from heyoka_tpu.utils import eop_sw_updater as upd


@pytest.fixture
def fake_eop(monkeypatch):
    table = np.array([
        [59000.0, 0.1, 0.01, 0.02, 1e-4, -1e-4],
        [59001.0, 0.11, 0.011, 0.021, 1.1e-4, -1.1e-4],
    ])
    data = eop_sw.EOPData(table, timestamp="2026_08_21_00_00_00",
                          identifier="iers_rapid_finals2000A_all")
    monkeypatch.setattr(eop_sw.EOPData, "fetch_latest_iers_rapid",
                        classmethod(lambda cls: data))
    return data


@pytest.fixture
def fake_sw(monkeypatch):
    table = np.array([
        [59000.0, 15.0, 120.0, 118.0],
        [59001.0, 20.0, 121.0, 118.5],
    ])
    data = eop_sw.SWData(table, timestamp="2026_08_21_00_00_00",
                         identifier="celestrak_long_term")
    monkeypatch.setattr(eop_sw.SWData, "fetch_latest_celestrak",
                        classmethod(lambda cls, long_term=True: data))
    return data


def test_update_eop_writes_snapshot(tmp_path, fake_eop):
    dest = upd.update_eop(outdir=str(tmp_path))
    with np.load(dest) as d:
        np.testing.assert_array_equal(d["table"], fake_eop.table)
        assert str(d["timestamp"]) == fake_eop.timestamp
        assert str(d["identifier"]) == fake_eop.identifier
    # the snapshot round-trips through the data class
    with np.load(dest) as d:
        data2 = eop_sw.EOPData(d["table"], timestamp=str(d["timestamp"]),
                               identifier=str(d["identifier"]))
    assert data2 == fake_eop


def test_update_sw_writes_snapshot(tmp_path, fake_sw):
    dest = upd.update_sw(outdir=str(tmp_path))
    with np.load(dest) as d:
        np.testing.assert_array_equal(d["table"], fake_sw.table)


def test_cli_both(tmp_path, fake_eop, fake_sw, capsys):
    rc = upd.main(["both", "--outdir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eop: 2 rows" in out and "sw: 2 rows" in out
    assert (tmp_path / "eop_builtin.npz").exists()
    assert (tmp_path / "sw_builtin.npz").exists()


def test_cli_failure_is_reported(tmp_path, monkeypatch, capsys):
    def boom(cls):
        raise OSError("no network")
    monkeypatch.setattr(eop_sw.EOPData, "fetch_latest_iers_rapid",
                        classmethod(boom))
    rc = upd.main(["eop", "--outdir", str(tmp_path)])
    assert rc == 1
    assert "update failed" in capsys.readouterr().err


def test_unknown_source_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown EOP source"):
        upd.update_eop(source="nope", outdir=str(tmp_path))
    with pytest.raises(ValueError, match="unknown SW source"):
        upd.update_sw(source="nope", outdir=str(tmp_path))
