#!/usr/bin/env python
"""Convert original IMCCE VSOP2013 series files into heyoka_tpu npz data.

The full VSOP2013 solution is distributed by IMCCE as ASCII files
``VSOP2013p1`` .. ``VSOP2013p9`` (https://ftp.imcce.fr/pub/ephem/planets/
vsop2013/solution/).  The reference snapshot only vendors the planet-9 q/p
series, so the remaining planets must be converted from the original files:

    python tools/vsop2013_to_npz.py VSOP2013p3.dat -o /path/to/data/
    export HEYOKA_TPU_VSOP2013_DATA=/path/to/data

File format (per the VSOP2013.readme and the reference's own converter,
``/root/reference/tools/vsop2013_converter.ipynb``): a sequence of tables.
Each table starts with a header in Fortran format ``(9x,3i3,i7)`` —
planet index, variable index iv (1-6), time power alpha, number of terms —
followed by one record per term in Fortran format
``(i5,1x,4i3,1x,5i3,1x,4i4,1x,i6,1x,3i3,2(f20.16,1x,i3))``: the term rank,
17 integer argument multipliers, then the sin and cos coefficients as
(mantissa, exponent) pairs.  The records are FIXED-COLUMN: adjacent integer
fields can run together with no separating blank (e.g. a ``-12`` filling an
``i3`` column), so the parser slices by column exactly as the Fortran
formats prescribe — whitespace splitting silently mis-parses real files.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

# Column layout of a term record, from the Fortran format
# (i5,1x,4i3,1x,5i3,1x,4i4,1x,i6,1x,3i3,2(f20.16,1x,i3)).
# 17 multiplier fields: (start, stop) slices.
_MULT_COLS = (
    # 4i3 at offset 6
    [(6 + 3 * j, 9 + 3 * j) for j in range(4)]
    # 5i3 at offset 19
    + [(19 + 3 * j, 22 + 3 * j) for j in range(5)]
    # 4i4 at offset 35
    + [(35 + 4 * j, 39 + 4 * j) for j in range(4)]
    # i6 at offset 52
    + [(52, 58)]
    # 3i3 at offset 59
    + [(59 + 3 * j, 62 + 3 * j) for j in range(3)]
)
_RANK_COL = (0, 5)
_S_MANT, _S_EXP = (68, 88), (89, 92)
_C_MANT, _C_EXP = (92, 112), (113, 116)
_TERM_WIDTH = 116

# header (9x,3i3,i7): planet, iv, alpha, nterms
_HDR_COLS = [(9, 12), (12, 15), (15, 18), (18, 25)]


def _fint(line: str, col) -> int:
    s = line[col[0]:col[1]].strip()
    return int(s) if s else 0


def parse_vsop2013_file(path: str):
    """Parse one IMCCE VSOP2013p<N> file.

    Returns ``(planet, tables)`` where tables maps ``(var, alpha)`` to
    ``(idx (n,17) int32, S (n,), C (n,))`` — the same table layout the
    reference's generated C++ stores (vsop2013_term.hpp; behavior anchor
    /root/reference/src/model/vsop2013.cpp:456)."""
    tables: dict = {}
    planet = None
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0
    n_lines = len(lines)
    while i < n_lines:
        if not lines[i].strip():
            i += 1
            continue
        pl, iv, alpha, nt = (_fint(lines[i], c) for c in _HDR_COLS)
        if planet is None:
            planet = pl
        elif pl != planet:
            raise ValueError(
                f"{path}:{i + 1}: planet index changed {planet} -> {pl}")
        if not (1 <= iv <= 6) or alpha < 0 or nt <= 0:
            raise ValueError(f"{path}:{i + 1}: bad header {lines[i]!r}")
        idx = np.zeros((nt, 17), dtype=np.int32)
        S = np.zeros(nt)
        C = np.zeros(nt)
        for k in range(nt):
            term = lines[i + 1 + k]
            if len(term) < _TERM_WIDTH:
                term = term.ljust(_TERM_WIDTH)
            rank = _fint(term, _RANK_COL)
            if rank != k + 1:
                raise ValueError(
                    f"{path}:{i + 2 + k}: term rank {rank} != {k + 1}")
            for j, col in enumerate(_MULT_COLS):
                idx[k, j] = _fint(term, col)
            S[k] = (float(term[_S_MANT[0]:_S_MANT[1]])
                    * 10.0 ** _fint(term, _S_EXP))
            C[k] = (float(term[_C_MANT[0]:_C_MANT[1]])
                    * 10.0 ** _fint(term, _C_EXP))
        if (iv, alpha) in tables:
            raise ValueError(f"{path}: duplicate table ({iv}, {alpha})")
        tables[(iv, alpha)] = (idx, S, C)
        i += 1 + nt
    if planet is None:
        raise ValueError(f"{path}: no VSOP2013 tables found")
    return planet, tables


def format_term(rank: int, mults, s_mant: float, s_exp: int,
                c_mant: float, c_exp: int) -> str:
    """Format one term record exactly as the IMCCE files lay it out
    (the writer inverse of the parser; used by the golden tests)."""
    parts = [f"{rank:5d}", " "]
    parts += [f"{int(m):3d}" for m in mults[0:4]] + [" "]
    parts += [f"{int(m):3d}" for m in mults[4:9]] + [" "]
    parts += [f"{int(m):4d}" for m in mults[9:13]] + [" "]
    parts += [f"{int(mults[13]):6d}", " "]
    parts += [f"{int(m):3d}" for m in mults[14:17]]
    parts += [f"{s_mant:20.16f}", " ", f"{s_exp:3d}"]
    parts += [f"{c_mant:20.16f}", " ", f"{c_exp:3d}"]
    rec = "".join(parts)
    assert len(rec) == _TERM_WIDTH, len(rec)
    return rec


def format_header(planet: int, iv: int, alpha: int, nt: int) -> str:
    return f" VSOP2013{planet:3d}{iv:3d}{alpha:3d}{nt:7d}"


def tables_to_npz(tables: dict) -> dict:
    out = {}
    for (iv, it), (idx, S, C) in tables.items():
        out[f"v{iv}_a{it}_idx"] = idx
        out[f"v{iv}_a{it}_S"] = S
        out[f"v{iv}_a{it}_C"] = C
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+", help="VSOP2013p<N> ASCII files")
    ap.add_argument("-o", "--outdir", default=".")
    args = ap.parse_args()
    for path in args.files:
        planet, tables = parse_vsop2013_file(path)
        m = re.search(r"p(\d)", os.path.basename(path))
        if m and int(m.group(1)) != planet:
            raise SystemExit(
                f"{path}: file says planet {planet}, name says {m.group(1)}")
        out = tables_to_npz(tables)
        dest = os.path.join(args.outdir, f"vsop2013_p{planet}.npz")
        np.savez_compressed(dest, **out)
        print(f"{path}: {len(tables)} tables -> {dest}")


if __name__ == "__main__":
    main()
