"""Driver-style correctness sweep: run EVERY queries() entry against
its DuckDB oracle (same canonicalization as tests/test_oracles.py) at
an arbitrary scale factor — the standalone equivalent of the per-round
driver CORRECTNESS harness, without its first-50 window.

Usage (from the repo root; owns its Ray session):

    python tools/sweep_oracles.py                   # sf0.01 (driver SF)
    python tools/sweep_oracles.py /root/testdata/sf0.001
    RAY_GRAFT_CPUS=8 python tools/sweep_oracles.py

Prints one line per entry ('ok' / 'MISMATCH' / 'ERROR ...' / rows-only
for no-oracle entries) and exits non-zero if anything failed.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import ray  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from test_oracles import _canon, _duck, _to_pandas  # noqa: E402

    import __ray_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = _duck(sf_dir)
    fails = []
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        try:
            got = _canon(_to_pandas(fn(sf_dir)))
            if name in oracles:
                want = _canon(con.execute(oracles[name]).fetchdf())
                ok = (list(got.columns) == list(want.columns)
                      and len(got) == len(want) and got.equals(want))
                status = "ok" if ok else "MISMATCH"
                if not ok:
                    fails.append(name)
            else:
                status = f"rows={len(got)} (no_oracle)"
        except Exception as ex:                      # noqa: BLE001
            status = f"ERROR {type(ex).__name__}: {ex}"
            fails.append(name)
        print(f"[{i + 1}/{len(qs)}] {name}: {status}", flush=True)
    print(f"SWEEP_DONE fails={len(fails)} {fails} "
          f"elapsed={time.time() - t0:.0f}s sf={sf_dir}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
