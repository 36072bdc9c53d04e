"""Builtin EOP/SW snapshot updater CLI.

Reference parity: heyoka ships updater executables that download the latest
Earth-orientation / space-weather products and regenerate the builtin data
snapshots compiled into the library
(``/root/reference/utils/eop_data_updater.cpp``, ``sw_data_updater.cpp``).
The rebuild's builtin snapshots are npz files in ``heyoka_tpu/data``; this
CLI refreshes them in place (or writes to ``--outdir``):

    python -m heyoka_tpu.utils.eop_sw_updater            # both
    python -m heyoka_tpu.utils.eop_sw_updater eop        # EOP only
    python -m heyoka_tpu.utils.eop_sw_updater sw --source celestrak

Sources: EOP from IERS rapid (default, ``finals2000A.all``), IERS long
term, or Celestrak; SW from Celestrak (the reference's only SW source).
Requires network access; the builtin snapshots are used when offline.
"""

from __future__ import annotations

import argparse
import os
import sys


def _data_dir() -> str:
    from importlib import resources

    return str(resources.files("heyoka_tpu.data"))


def _save(outdir: str, name: str, data) -> str:
    import numpy as np

    dest = os.path.join(outdir, name)
    tmp = dest + ".tmp"
    np.savez_compressed(
        tmp, table=data.table, timestamp=data.timestamp,
        identifier=data.identifier,
    )
    # np.savez appends .npz to the tmp name
    os.replace(tmp + ".npz", dest)
    return dest


def update_eop(source: str = "iers_rapid", outdir: str | None = None) -> str:
    """Fetch the latest EOP data and regenerate ``eop_builtin.npz``.
    Returns the written path."""
    from heyoka_tpu.eop_sw import EOPData

    if source == "iers_rapid":
        data = EOPData.fetch_latest_iers_rapid()
    elif source == "iers_long_term":
        data = EOPData.fetch_latest_iers_long_term()
    elif source == "celestrak":
        data = EOPData.fetch_latest_celestrak(long_term=True)
    else:
        raise ValueError(f"unknown EOP source {source!r}")
    return _save(outdir or _data_dir(), "eop_builtin.npz", data)


def update_sw(source: str = "celestrak", outdir: str | None = None) -> str:
    """Fetch the latest space-weather data and regenerate
    ``sw_builtin.npz``.  Returns the written path."""
    from heyoka_tpu.eop_sw import SWData

    if source != "celestrak":
        raise ValueError(f"unknown SW source {source!r}")
    data = SWData.fetch_latest_celestrak(long_term=True)
    return _save(outdir or _data_dir(), "sw_builtin.npz", data)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="heyoka_tpu.utils.eop_sw_updater", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("what", nargs="?", default="both",
                    choices=["both", "eop", "sw"])
    ap.add_argument("--source", default=None,
                    help="eop: iers_rapid (default) | iers_long_term | "
                         "celestrak; sw: celestrak")
    ap.add_argument("--outdir", default=None,
                    help="write snapshots here instead of heyoka_tpu/data")
    args = ap.parse_args(argv)
    rc = 0
    if args.what in ("both", "eop"):
        try:
            dest = update_eop(args.source or "iers_rapid", args.outdir)
            rows = _rows(dest)
            print(f"eop: {rows} rows -> {dest}")
        except Exception as e:  # pragma: no cover - network dependent
            print(f"eop: update failed: {e}", file=sys.stderr)
            rc = 1
    if args.what in ("both", "sw"):
        try:
            dest = update_sw(args.source or "celestrak", args.outdir)
            rows = _rows(dest)
            print(f"sw: {rows} rows -> {dest}")
        except Exception as e:  # pragma: no cover - network dependent
            print(f"sw: update failed: {e}", file=sys.stderr)
            rc = 1
    return rc


def _rows(path: str) -> int:
    import numpy as np

    with np.load(path) as d:
        return int(d["table"].shape[0])


if __name__ == "__main__":
    raise SystemExit(main())
