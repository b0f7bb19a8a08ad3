#!/usr/bin/env python3
"""Compare two full bench dumps (dev tool). Usage:

    python3 tools/benchcmp.py BENCH_full_r16.json dump_new.json [family_prefix ...]

Prints totals, shared-key aggregate/median ratios, the per-key
regression bar (new/old > 1.5 and new-old > 0.3s), and per-family
subtotals for any prefixes given (e.g. meta_v2_mor meta_v2_changefeed).
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return {k: float(v) for k, v in json.load(f).items()}


def main():
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    prefixes = sys.argv[3:]
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    print(f"old: {len(old)} keys / {sum(old.values()):.1f}s   "
          f"new: {len(new)} keys / {sum(new.values()):.1f}s")
    if shared:
        agg = sum(new[k] for k in shared) / max(sum(old[k] for k in shared), 1e-9)
        med = statistics.median(new[k] / max(old[k], 1e-9) for k in shared)
        print(f"shared {len(shared)}: aggregate {agg:.3f}, median per-key {med:.3f}")
    if added:
        print(f"new keys ({len(added)}): {sum(new[k] for k in added):.1f}s total")
        for k in added:
            print(f"  + {k}: {new[k]:.2f}s")
    bars = [(k, old[k], new[k]) for k in shared
            if new[k] / max(old[k], 1e-9) > 1.5 and new[k] - old[k] > 0.3]
    print(f"regression bar ({len(bars)}):")
    for k, o, n in sorted(bars, key=lambda t: t[1] - t[2]):
        print(f"  ! {k}: {o:.2f} -> {n:.2f} ({n / max(o, 1e-9):.2f}x)")
    for p in prefixes:
        ko = [k for k in old if k.startswith(p)]
        kn = [k for k in new if k.startswith(p)]
        print(f"family {p}: old {sum(old[k] for k in ko):.1f}s/{len(ko)} "
              f"-> new {sum(new[k] for k in kn):.1f}s/{len(kn)}")


if __name__ == "__main__":
    main()
