#!/usr/bin/env python
"""Staleness ledger: VERIFICATION_AGE.json (VERDICT r8 item 8).

Emits key -> last round with a PASSING driver record at the key's
CURRENT check strength (0 = never driver-checked), computed by the
exact function the entry module's verification window sorts on
(``__spark_entry__._last_verified`` — semantics-change round gating
included), so the ledger can never drift from the window order.
Also previews the next round's 50-key window composition.

Usage: python tools/make_verification_age.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entrymod

    merged: dict = {}
    oracle_keys: set[str] = set()
    for mod in entrymod._PLAN_MODULES:
        merged.update(mod.QUERIES)
        oracle_keys.update(mod.ORACLE)
    last = entrymod._last_verified(oracle_keys)
    ages = {k: last.get(k, 0) for k in sorted(merged)}
    by_round = Counter(ages.values())
    order = entrymod._window_order(list(merged), last)
    window = order[: entrymod._NEVER_SLOTS + entrymod._STALE_SLOTS]

    out = {
        "note": (
            "key -> last round whose committed CORRECTNESS_r*.json "
            "records a PASSING driver check at the key's current "
            "check strength (0 = never driver-checked; records older "
            "than a key's _SEMANTICS_CHANGED round do not count). "
            "Computed by __spark_entry__._last_verified — the same "
            "function the driver-window ordering sorts on."
        ),
        "keys": len(ages),
        "never_checked": by_round.get(0, 0),
        "by_round": {str(r): c for r, c in sorted(by_round.items())},
        "next_window_preview": window,
        "last_verified": ages,
    }
    path = os.path.join(REPO, "VERIFICATION_AGE.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"{path}: {out['keys']} keys, {out['never_checked']} never "
        f"checked, by_round={out['by_round']}"
    )


if __name__ == "__main__":
    main()
