"""Golden tests for the IMCCE VSOP2013 ASCII converter.

The reference ingests the original IMCCE distribution files with strict
Fortran fixed-column formats — header ``(9x,3i3,i7)``, term
``(i5,1x,4i3,1x,5i3,1x,4i4,1x,i6,1x,3i3,2(f20.16,1x,i3))`` (see
``/root/reference/tools/vsop2013_converter.ipynb``; runtime behavior anchor
``/root/reference/src/model/vsop2013.cpp:456``).  These tests write
synthetic files in exactly that layout — including records where adjacent
fixed-width integer fields run together with no separating blank — and
verify the converter reproduces the values; plus a round-trip against the
packaged planet-9 tables (the values the reference vendors).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vsop2013_to_npz import (  # noqa: E402
    format_header,
    format_term,
    parse_vsop2013_file,
    tables_to_npz,
)


def _write(tmp_path, lines, name="VSOP2013p9.dat"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_simple_table(tmp_path):
    lines = [
        format_header(9, 5, 0, 2),
        format_term(1, [0] * 17, 0.0, 0, 0.9805810485272897, 1),
        format_term(2, [0] * 13 + [1402, 0, 0, 0],
                    0.1352378405555626, -3, -0.5592775543780039, -4),
    ]
    planet, tables = parse_vsop2013_file(_write(tmp_path, lines))
    assert planet == 9
    assert set(tables) == {(5, 0)}
    idx, S, C = tables[(5, 0)]
    assert idx.shape == (2, 17)
    assert idx[1, 13] == 1402
    np.testing.assert_allclose(C[0], 9.805810485272897, rtol=1e-15)
    np.testing.assert_allclose(S[1], 1.352378405555626e-4, rtol=1e-15)
    np.testing.assert_allclose(C[1], -0.5592775543780039e-4, rtol=1e-15)


def test_parse_negative_fields_run_together(tmp_path):
    # -12 fills an i3 column and -123 fills an i4 column: adjacent fields
    # have NO separating blank — whitespace splitting would mis-parse
    mults = [-12, -12, -12, -12, -99, 99, -99, 99, -99,
             -123, -123, 123, -123, -99999, -12, -12, -12]
    lines = [
        format_header(9, 6, 2, 1),
        format_term(1, mults, -0.9999999999999999, 3, 0.1, -10),
    ]
    rec = lines[1]
    # prove the stress: the four i4 columns really do run together
    assert "-123-123 123-123" in rec
    planet, tables = parse_vsop2013_file(_write(tmp_path, lines))
    idx, S, C = tables[(6, 2)]
    np.testing.assert_array_equal(idx[0], mults)
    np.testing.assert_allclose(S[0], -999.9999999999999, rtol=1e-15)
    np.testing.assert_allclose(C[0], 1e-11, rtol=1e-15)


def test_parse_multiple_tables_and_npz_keys(tmp_path):
    lines = []
    for (iv, alpha, nt) in [(1, 0, 1), (1, 1, 2), (3, 0, 1)]:
        lines.append(format_header(4, iv, alpha, nt))
        for k in range(nt):
            lines.append(format_term(
                k + 1, list(range(17)), 0.5 + k, 0, -0.25, 1 + k))
    planet, tables = parse_vsop2013_file(_write(tmp_path, lines, "VSOP2013p4.dat"))
    assert planet == 4
    assert set(tables) == {(1, 0), (1, 1), (3, 0)}
    out = tables_to_npz(tables)
    assert set(out) >= {"v1_a0_idx", "v1_a1_S", "v3_a0_C"}
    np.testing.assert_allclose(out["v1_a1_S"], [0.5, 1.5])
    np.testing.assert_allclose(out["v1_a1_C"], [-2.5, -25.0])


def test_rank_mismatch_rejected(tmp_path):
    lines = [
        format_header(9, 5, 0, 2),
        format_term(1, [0] * 17, 0.1, 0, 0.1, 0),
        format_term(3, [0] * 17, 0.1, 0, 0.1, 0),  # rank 3 != 2
    ]
    with pytest.raises(ValueError, match="rank"):
        parse_vsop2013_file(_write(tmp_path, lines))


def test_roundtrip_vs_packaged_p9(tmp_path):
    """Format a slice of the packaged planet-9 tables (values the reference
    vendors in src/detail/vsop2013/) into IMCCE layout, re-parse, and
    require agreement to the f20.16 write precision."""
    data = np.load(os.path.join(
        os.path.dirname(__file__), "..", "heyoka_tpu", "data",
        "vsop2013_p9.npz"))
    lines = []
    picks = [(5, 0), (6, 0), (5, 3)]
    want = {}
    for iv, alpha in picks:
        idx = data[f"v{iv}_a{alpha}_idx"][:5]
        S = data[f"v{iv}_a{alpha}_S"][:5]
        C = data[f"v{iv}_a{alpha}_C"][:5]
        want[(iv, alpha)] = (idx, S, C)
        lines.append(format_header(9, iv, alpha, len(S)))
        for k in range(len(S)):
            def dec(v):
                if v == 0.0:
                    return 0.0, 0
                e = int(np.floor(np.log10(abs(v)))) + 1
                return v / 10.0 ** e, e
            sm, se = dec(S[k])
            cm, ce = dec(C[k])
            lines.append(format_term(k + 1, idx[k], sm, se, cm, ce))
    planet, tables = parse_vsop2013_file(_write(tmp_path, lines))
    assert set(tables) == set(picks)
    for key, (idx, S, C) in want.items():
        gidx, gS, gC = tables[key]
        np.testing.assert_array_equal(gidx, idx)
        np.testing.assert_allclose(gS, S, rtol=1e-14)
        np.testing.assert_allclose(gC, C, rtol=1e-14)
