"""Driver-coverage discipline: the correctness harness verifies only
the FIRST 50 ``queries()`` entries per round, so any entry whose
implementation or oracle changed since the last driver run MUST sit
inside the first 50 (the ``_FRONT`` reordering in
``pipelines/queries.py``) — otherwise its regression would be invisible
to the driver.

Mechanism: ``entry_sigs.json`` is a checked-in per-entry hash of the
entry function's source + its oracle SQL, regenerated at the moment a
driver CORRECTNESS file pins the current state:

    python tests/test_front_discipline.py --regen

A hash mismatch (or a new entry) means "changed since last pinned
state" and trips the front-50 assertion.  Changing a shared helper is
not caught by design — the tripwire covers the common case (editing an
entry or its SQL) at zero runtime cost."""

import hashlib
import inspect
import json
import os
import sys

SIG_PATH = os.path.join(os.path.dirname(__file__), "entry_sigs.json")
DRIVER_VERIFIED = 50


def _current_sigs():
    from probly_search_ray.pipelines.queries import ORACLES, QUERIES
    sigs = {}
    for name, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        body = src + "\n--oracle--\n" + ORACLES.get(name, "")
        sigs[name] = hashlib.sha256(body.encode()).hexdigest()[:16]
    return sigs


def test_changed_entries_are_driver_visible():
    from probly_search_ray.pipelines.queries import QUERIES
    with open(SIG_PATH) as f:
        pinned = json.load(f)
    cur = _current_sigs()
    order = list(QUERIES)
    front = set(order[:DRIVER_VERIFIED])
    changed = [n for n, sig in cur.items() if pinned.get(n) != sig]
    stranded = [n for n in changed if n not in front]
    assert not stranded, (
        f"entries changed since the last pinned driver state but NOT in "
        f"the first {DRIVER_VERIFIED} of QUERIES (the driver would never "
        f"re-verify them): {stranded}.  Move them into _FRONT in "
        f"pipelines/queries.py, or — only if a driver CORRECTNESS file "
        f"already pins the current state — regen with "
        f"`python tests/test_front_discipline.py --regen`.")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        with open(SIG_PATH, "w") as f:
            json.dump(_current_sigs(), f, indent=1, sort_keys=True)
        print(f"wrote {SIG_PATH}")
    else:
        print("use --regen to rewrite entry_sigs.json, or run via pytest")
