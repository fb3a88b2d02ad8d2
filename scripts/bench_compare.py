#!/usr/bin/env python3
"""Compare two bench JSON files in box-independent units (the r19
sentinel-unit protocol): per-query `sentinel_units` (min seconds divided
by the adjacent fixed-work probe) where both sides carry them, falling
back to `queries_norm` (divided by the run-level sentinel). Flags
normalized movers beyond the watch threshold (1.3x by default).

Usage: bench_compare.py <before.json> <after.json> [threshold]
"""
import json, sys


def load(p):
    return json.load(open(p))


def main(before_path, after_path, thr=1.3):
    a, b = load(before_path), load(after_path)
    key = "sentinel_units" if "sentinel_units" in a and "sentinel_units" in b \
        else "queries_norm"
    ua, ub = a[key], b[key]
    common = sorted(set(ua) & set(ub))
    # never drop silently: name queries present on only one side, and any
    # zero-valued before entry the ratio loop below cannot rank
    only_a, only_b = sorted(set(ua) - set(ub)), sorted(set(ub) - set(ua))
    if only_a:
        print(f"only in before ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"only in after ({len(only_b)}): {', '.join(only_b)}")
    zeros = [q for q in common if ua[q] <= 0]
    if zeros:
        print(f"before-value <= 0, excluded from ratios ({len(zeros)}): "
              + ", ".join(f"{q} (after={ub[q]:.2f})" for q in zeros))
    print(f"units={key}  queries={len(common)}")
    print(f"before: total={a['value']:.1f}s sentinel={a['sentinel']['sec']:.3f} "
          f"noise={a['noise']:.2f}")
    print(f"after:  total={b['value']:.1f}s sentinel={b['sentinel']['sec']:.3f} "
          f"noise={b['noise']:.2f}")
    tot_a = sum(ua[q] for q in common)
    tot_b = sum(ub[q] for q in common)
    print(f"normalized total ratio (after/before): {tot_b / tot_a:.3f}")
    raw_ratio = b["value"] / a["value"]
    sent_ratio = b["sentinel"]["sec"] / a["sentinel"]["sec"]
    print(f"raw total ratio {raw_ratio:.3f}, sentinel ratio {sent_ratio:.3f}, "
          f"raw/sentinel {raw_ratio / sent_ratio:.3f}")
    movers = sorted(((ub[q] / ua[q], q) for q in common if ua[q] > 0))
    print("\ntop improvements (normalized):")
    for r, q in movers[:15]:
        print(f"  {q:30s} {r:5.2f}  ({ua[q]:8.2f} -> {ub[q]:8.2f})")
    flagged = [(r, q) for r, q in movers if r > thr]
    print(f"\nmovers > {thr}x normalized: {len(flagged)}")
    for r, q in sorted(flagged, reverse=True):
        print(f"  {q:30s} {r:5.2f}  ({ua[q]:8.2f} -> {ub[q]:8.2f})")


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    main(sys.argv[1], sys.argv[2], t)
