#!/usr/bin/env python
"""Convert original IMCCE VSOP2013 series files into heyoka_tpu npz data.

The full VSOP2013 solution is distributed by IMCCE as ASCII files
``VSOP2013p1`` .. ``VSOP2013p9`` (https://ftp.imcce.fr/pub/ephem/planets/
vsop2013/solution/).  The reference snapshot only vendors the planet-9 q/p
series, so the remaining planets must be converted from the original files:

    python tools/vsop2013_to_npz.py VSOP2013p3 -o /path/to/data/
    export HEYOKA_TPU_VSOP2013_DATA=/path/to/data

File format (per the VSOP2013.readme): the file is a sequence of tables,
each preceded by a header line containing (among others) the planet index,
the variable index iv (1-6), the time power it (alpha) and the number of
terms; each term line carries 17 integer argument multipliers followed by
the sin and cos coefficients, each as a 20-digit mantissa and 3-digit
exponent pair.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def parse_vsop2013_file(path: str):
    """Returns {(var, alpha): (idx (n,17) int32, S (n,), C (n,))}."""
    tables: dict = {}
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        ln = lines[i]
        if "VSOP2013" not in ln:
            i += 1
            continue
        # header: ... planet index, variable iv, time power it, #terms nt
        nums = [int(v) for v in re.findall(r"-?\d+", ln)]
        # the header layout: VSOP2013p<N> then iv, it, nt are the last fields
        iv, it, nt = nums[-3], nums[-2], nums[-1]
        idx = np.zeros((nt, 17), dtype=np.int32)
        S = np.zeros(nt)
        C = np.zeros(nt)
        for k in range(nt):
            term = lines[i + 1 + k]
            # 17 integer multipliers: rank(5) + a1..a17 in fixed columns,
            # then S mantissa/exponent, C mantissa/exponent
            fields = term.split()
            ints = [int(v) for v in fields[1:18]]
            idx[k] = ints
            # coefficients: mantissa and exponent are blank-separated
            sm, se, cm, ce = fields[18], fields[19], fields[20], fields[21]
            S[k] = float(sm) * 10.0 ** int(se)
            C[k] = float(cm) * 10.0 ** int(ce)
        tables[(iv, it)] = (idx, S, C)
        i += 1 + nt
    return tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+", help="VSOP2013p<N> ASCII files")
    ap.add_argument("-o", "--outdir", default=".")
    args = ap.parse_args()
    for path in args.files:
        m = re.search(r"p(\d)", os.path.basename(path))
        pl = int(m.group(1))
        tables = parse_vsop2013_file(path)
        out = {}
        for (iv, it), (idx, S, C) in tables.items():
            out[f"v{iv}_a{it}_idx"] = idx
            out[f"v{iv}_a{it}_S"] = S
            out[f"v{iv}_a{it}_C"] = C
        dest = os.path.join(args.outdir, f"vsop2013_p{pl}.npz")
        np.savez_compressed(dest, **out)
        print(f"{path}: {len(tables)} tables -> {dest}")


if __name__ == "__main__":
    main()
