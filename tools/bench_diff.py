#!/usr/bin/env python3
"""Compare two bench records (BENCH_r*.json driver artifacts or raw
`graft.Bench` JSON lines): per-query ratios, warm-entry ratios, and a
regression summary.

Usage: python3 tools/bench_diff.py OLD NEW [--threshold 2.0]

Accepts either the driver's wrapper JSON ({"tail": "...{metric line}..."})
or a file whose first '{"metric"' line is the bench output.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "metric" in obj:
            return obj
        if isinstance(obj, dict) and "tail" in obj:
            text = obj["tail"]
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        sys.exit(f"{path}: no bench JSON line found")
    return json.loads(m.group(0))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old, new = load(args[0]), load(args[1])
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] / max(old['value'], 1e-9):.2f}x)")
    for section in ("warm", "queries"):
        o, n = old.get(section, {}), new.get(section, {})
        keys = sorted(set(o) | set(n))
        if not keys:
            continue
        print(f"\n== {section} ==")
        regress = []
        for k in keys:
            ov, nv = o.get(k), n.get(k)
            if ov is None:
                print(f"  {k:28s}      NEW    {nv:8.2f}s")
            elif nv is None:
                print(f"  {k:28s} {ov:8.2f}s  REMOVED")
            else:
                r = nv / max(ov, 1e-9)
                flag = " <-- regression" if r > thr and nv > 1.0 else ""
                if flag:
                    regress.append(k)
                print(f"  {k:28s} {ov:8.2f}s {nv:8.2f}s  {r:6.2f}x{flag}")
        if regress:
            print(f"  ** {len(regress)} over {thr}x (and >1s): "
                  f"{', '.join(regress)}")
    e_old, e_new = old.get("errors", {}), new.get("errors", {})
    if e_old or e_new:
        print(f"\nerrors: old={list(e_old)} new={list(e_new)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass
